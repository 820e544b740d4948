package graft.text

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass kernels for the text-analysis operators. The Column/HOF
 * formulations ([[TextAnalysis]]) re-tokenize per sub-expression in
 * interpreted lambdas; these kernels tokenize once per row inside
 * whole-stage codegen. Semantics are IDENTICAL to the Column versions and
 * to the DuckDB oracles: ASCII `\s` runs delimit tokens, ASCII
 * `[^A-Za-z0-9\s]` counts as punctuation, marker matching is
 * token-equality (or substring containment for CJK profiles).
 */
object TextKernels {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isWsCp(cp: Int): Boolean = cp < 128 && isWs(cp.toChar)

  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextAnalysis.Stopwords.foreach(s.add)
    s
  }

  // (lang, token-equality marker set or null, substring markers or null)
  private val profiles: Array[(String, java.util.HashSet[String], Array[String])] =
    TextAnalysis.LangMarkers.map { case (lang, markers) =>
      if (TextAnalysis.SubstringLangs(lang)) (lang, null, markers.toArray)
      else {
        val s = new java.util.HashSet[String]()
        markers.foreach(s.add)
        (lang, s, null)
      }
    }.toArray

  private val und = UTF8String.fromString("und")
  private val langU: Map[String, UTF8String] =
    TextAnalysis.LangMarkers.map { case (l, _) => l -> UTF8String.fromString(l) }.toMap

  /** Identified language — single tokenize, per-profile hit counts, strict
    * argmax (ties or zero hits → "und"). Matches [[TextAnalysis.langId]]. */
  def langId(text: UTF8String): UTF8String = {
    val lower = text.toString.toLowerCase(java.util.Locale.ROOT)
    val k = profiles.length
    val hits = new Array[Int](k)
    var p = 0
    while (p < k) {
      val (_, tokSet, substr) = profiles(p)
      if (substr != null) {
        var m = 0
        while (m < substr.length) {
          if (lower.contains(substr(m))) hits(p) += 1
          m += 1
        }
      } else {
        var i = 0
        val n = lower.length
        while (i < n) {
          while (i < n && isWs(lower.charAt(i))) i += 1
          val start = i
          while (i < n && !isWs(lower.charAt(i))) i += 1
          if (i > start && tokSet.contains(lower.substring(start, i))) hits(p) += 1
        }
      }
      p += 1
    }
    var best = 0
    p = 0
    while (p < k) { if (hits(p) > best) best = hits(p); p += 1 }
    if (best == 0) return und
    var winner = -1
    p = 0
    while (p < k) {
      if (hits(p) == best) { if (winner >= 0) return und; winner = p }
      p += 1
    }
    langU(profiles(winner)._1)
  }

  val statsType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tok_ws", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tok_bpe", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("mean_tok_len", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("punct_ratio", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("stopword_ratio", DoubleType, nullable = false)))

  /** One-pass document statistics — identical semantics to the Column
    * formulations in [[TextAnalysis]] (whitespace tokens, BPE-ish runs,
    * ASCII punctuation class, lowercase stopword membership). */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val len = s.codePointCount(0, s.length)
    var punct = 0
    var bpe = 0
    var prev = 0 // 0 = other/ws, 1 = letter run, 2 = digit run
    var i = 0
    // iterate per CODEPOINT (codePointAt + charCount), not per UTF-16 char:
    // a non-BMP punctuation codepoint must count once, like `len` above and
    // the oracle's regexp_extract_all — else punct_ratio can exceed 1.0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val letter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val digit = cp >= '0' && cp <= '9'
      if (letter) { if (prev != 1) bpe += 1; prev = 1 }
      else if (digit) { if (prev != 2) bpe += 1; prev = 2 }
      else {
        prev = 0
        if (!isWsCp(cp)) { bpe += 1; punct += 1 }
      }
      i += Character.charCount(cp)
    }
    var ntoks = 0
    var sumLens = 0L
    var nstop = 0
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        ntoks += 1
        sumLens += lower.codePointCount(start, i)
        if (stopwords.contains(lower.substring(start, i))) nstop += 1
      }
    }
    val mtl = if (ntoks == 0) 0.0 else sumLens.toDouble / ntoks
    val pr = if (len == 0) 0.0 else punct.toDouble / len
    val sw = if (ntoks == 0) 0.0 else nstop.toDouble / ntoks
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ntoks, bpe, mtl, pr, sw))
  }

  val gopherType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_words", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("mean_word_len", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("alpha_ratio", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("symbol_ratio", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("n_stop", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("word_count_ok", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("mean_len_ok", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("symbol_ok", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("alpha_ok", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("stop_ok", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("keep", org.apache.spark.sql.types.IntegerType, nullable = false)))

  private val gopherStops: Array[String] = TextAnalysis.GopherStopwords.toArray

  /** One-pass Gopher rule statistics + verdicts — identical arithmetic to
    * [[TextAnalysis.gopherFlagsColumns]] and the text_gopher oracle:
    * `\s+` tokens, per-token lowercase for the stopword set, '#' chars
    * plus greedy-leftmost non-overlapping "..." runs as symbols, one
    * double division per ratio. */
  def gopher(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    // symbol scan over the raw text ('#' and '.' never collide, so the
    // fused pass equals the two independent replace()-diff counts)
    var nHash = 0
    var nEll = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '#') { nHash += 1; i += 1 }
      else if (c == '.' && i + 2 < s.length &&
        s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') { nEll += 1; i += 3 }
      else i += 1
    }
    var ntoks = 0
    var sumLen = 0L
    var nAlpha = 0
    val stopSeen = new Array[Boolean](gopherStops.length)
    i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      var hasAlpha = false
      while (i < n && !isWs(s.charAt(i))) {
        val c = s.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        i += 1
      }
      if (i > start) {
        ntoks += 1
        sumLen += s.codePointCount(start, i)
        if (hasAlpha) nAlpha += 1
        val lowerTok = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        var j = 0
        while (j < gopherStops.length) {
          if (!stopSeen(j) && gopherStops(j) == lowerTok) stopSeen(j) = true
          j += 1
        }
      }
    }
    var nStop = 0
    var j = 0
    while (j < stopSeen.length) { if (stopSeen(j)) nStop += 1; j += 1 }
    val mtl = if (ntoks == 0) 0.0 else sumLen.toDouble / ntoks
    val ar = if (ntoks == 0) 0.0 else nAlpha.toDouble / ntoks
    val sr = if (ntoks == 0) 0.0 else (nHash + nEll).toDouble / ntoks
    val wcOk = if (ntoks >= 50 && ntoks <= 100000) 1 else 0
    val mlOk = if (mtl >= 3.0 && mtl <= 10.0) 1 else 0
    val syOk = if (sr <= 0.1) 1 else 0
    val alOk = if (ar >= 0.8) 1 else 0
    val stOk = if (nStop >= 2) 1 else 0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ntoks.toLong, mtl, ar, sr, nStop.toLong,
        wcOk, mlOk, syOk, alOk, stOk, wcOk * mlOk * syOk * alOk * stOk))
  }

  /** Canonical text normalization — the preprocessing step ahead of
    * hashing/dedup/tokenizing: Unicode NFC (composed forms, identity on
    * ASCII), every `\s+` run collapsed to one space, leading/trailing
    * whitespace dropped. Byte-equal to SQL
    * `trim(regexp_replace(text, '\s+', ' ', 'g'))` on ASCII (Java and RE2
    * agree on the \s class), single pass after the NFC call. */
  def normalize(text: UTF8String): UTF8String = {
    val s0 = text.toString
    val s = java.text.Normalizer.normalize(s0, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Polynomial rolling-hash fingerprint `(acc·31 + cp) mod 10^9+7` over
    * code points, '\n' skipped (the RE2-`.` convention of the oracle's
    * regexp_extract_all). Same fold as the Column/HOF formulation. */
  def fingerprint(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp != '\n'.toInt) acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  val repetitionType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tok", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("distinct_ratio", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("top_token_frac", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("top_bigram_frac", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_bigram_frac", DoubleType, nullable = false)))

  /** Gopher-style repetition signals over lowercase whitespace tokens —
    * the repetitiveness axis of corpus quality filtering (machine-generated
    * and boilerplate text shows high top-n-gram mass and duplicate-n-gram
    * fractions): distinct-token ratio, most-frequent-token fraction,
    * most-frequent-bigram fraction, and the fraction of bigram occurrences
    * whose bigram appears more than once. One tokenize + two hash maps per
    * row; integer counts with a final double division, so the DuckDB
    * list-function oracle is bit-exact. */
  def repetition(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val lower = text.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) toks.add(lower.substring(start, i))
    }
    val nTok = toks.size
    val tokCounts = new java.util.HashMap[String, Int]()
    var t = 0
    while (t < nTok) {
      tokCounts.merge(toks.get(t), 1, (a, b) => a + b)
      t += 1
    }
    var topTok = 0
    val it = tokCounts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > topTok) topTok = c }
    val nBg = math.max(nTok - 1, 0)
    val bgCounts = new java.util.HashMap[String, Int]()
    t = 0
    while (t < nBg) {
      // tokens contain no whitespace, so ' ' is an unambiguous joiner
      bgCounts.merge(toks.get(t) + " " + toks.get(t + 1), 1, (a, b) => a + b)
      t += 1
    }
    var topBg = 0
    var dupBgOcc = 0
    val bit = bgCounts.values().iterator()
    while (bit.hasNext) {
      val c = bit.next()
      if (c > topBg) topBg = c
      if (c > 1) dupBgOcc += c
    }
    val distinctRatio = if (nTok == 0) 0.0 else tokCounts.size.toDouble / nTok
    val topTokFrac = if (nTok == 0) 0.0 else topTok.toDouble / nTok
    val topBgFrac = if (nBg == 0) 0.0 else topBg.toDouble / nBg
    val dupBgFrac = if (nBg == 0) 0.0 else dupBgOcc.toDouble / nBg
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, distinctRatio, topTokFrac, topBgFrac, dupBgFrac))
  }

  /** Composite quality score — same arithmetic tree as
    * [[TextAnalysis.qualityScore]] (and its oracle), one pass. */
  def quality(text: UTF8String): Double = {
    val s = text.toString
    val len = s.codePointCount(0, s.length)
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var punct = 0
    var i = 0
    // per codepoint, matching codePointCount-based `len` (see stats())
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (!alnum && !isWsCp(cp)) punct += 1
      i += Character.charCount(cp)
    }
    var ntoks = 0
    var sumLens = 0L
    var nstop = 0
    i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        ntoks += 1
        sumLens += lower.codePointCount(start, i)
        if (stopwords.contains(lower.substring(start, i))) nstop += 1
      }
    }
    val lenScore = math.min(len.toDouble / 400.0, 1.0)
    val mtl = if (ntoks == 0) 0.0 else sumLens.toDouble / ntoks
    val mtlScore = if (mtl >= 3.0 && mtl <= 10.0) 1.0 else 0.5
    val sw = if (ntoks == 0) 0.0 else nstop.toDouble / ntoks
    val swScore = if (sw >= 0.05) 1.0 else sw * 20.0
    val pr = if (len == 0) 0.0 else punct.toDouble / len
    val punctScore = if (pr <= 0.2) 1.0 else math.max(0.0, 1.0 - (pr - 0.2) * 2.0)
    lenScore * 0.25 + mtlScore * 0.25 + swScore * 0.25 + punctScore * 0.25
  }
}

/** Codegen'd one-pass document statistics (see [[TextKernels.stats]]). */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextKernels.statsType
  override def nullSafeEval(v: Any): Any =
    TextKernels.stats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.stats($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "text_stats"
}

/** Codegen'd one-pass repetition signals (see [[TextKernels.repetition]]). */
case class RepetitionExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextKernels.repetitionType
  override def nullSafeEval(v: Any): Any =
    TextKernels.repetition(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.repetition($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "text_repetition"
}

/** Codegen'd one-pass Gopher rules (see [[TextKernels.gopher]]). */
case class GopherExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextKernels.gopherType
  override def nullSafeEval(v: Any): Any =
    TextKernels.gopher(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.gopher($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "text_gopher"
}

/** Codegen'd canonical normalization (see [[TextKernels.normalize]]). */
case class NormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextKernels.normalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.normalize($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "text_normalize"
}

/** Codegen'd rolling-hash fingerprint (see [[TextKernels.fingerprint]]). */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "fingerprint"
}

/** Codegen'd language identification (see [[TextKernels.langId]]). */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextKernels.langId(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.langId($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "lang_id"
}

/** Codegen'd composite quality score (see [[TextKernels.quality]]). */
case class QualityExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TextKernels.quality(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.quality($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "quality_score"
}

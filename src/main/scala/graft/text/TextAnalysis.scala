package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for corpus curation (the training-data-pipeline
 * extension, BASELINE.json north star): token counting, quality scoring,
 * language identification, document fingerprinting. Everything is built
 * from codegen'd built-in functions with deterministic integer/double
 * arithmetic, so each operator has an exact DuckDB oracle.
 */
object TextAnalysis {

  /** All five document statistics as one struct from a single-pass kernel
    * ([[TextKernels.stats]]); field-select the pieces — whole-stage codegen
    * subexpression elimination evaluates the kernel once per row. */
  def textStats(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(TextStatsExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols — a deterministic proxy for tokenizer load
    * (regexp shared verbatim with the oracle; RE2/Java-compatible). */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Mean whitespace-token length (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  /** Ratio of non-alphanumeric-non-space chars to total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
        length(text))

  /** English-ish stopword ratio over whitespace tokens. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "for", "on", "with", "as", "at", "by", "it")
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(Stopwords.map(lit): _*)))
        .cast("double") / size(toks))
  }

  /**
   * Composite quality score in [0,1] — the heuristic-gauntlet shape of
   * C4/Gopher-style corpus filters: reward moderate length, healthy mean
   * token length, some stopwords; punish punctuation soup. Deterministic
   * double arithmetic, exact oracle.
   */
  def qualityScore(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(QualityExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** Column/HOF formulation of [[qualityScore]] — same arithmetic,
    * interpreted (kept as the semantic cross-check). */
  def qualityScoreColumns(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl >= 3.0 && mtl <= 10.0, 1.0).otherwise(0.5)
    val sw = stopwordRatio(text)
    val swScore = when(sw >= 0.05, 1.0).otherwise(sw * 20.0)
    val punct = punctRatio(text)
    val punctScore = when(punct <= 0.2, 1.0).otherwise(greatest(lit(0.0),
      lit(1.0) - (punct - 0.2) * 2.0))
    (lenScore * 0.25 + mtlScore * 0.25 + swScore * 0.25 + punctScore * 0.25)
  }

  /** Language marker profiles: tiny per-language function-word sets (the
    * n-gram-profile idea of Cavnar-Trenkle reduced to its word-unigram
    * core, deterministic and oracle-expressible). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "por", "una", "con"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "为"))

  /** Languages whose markers are matched by substring containment instead
    * of whitespace tokens — CJK text has no space-delimited words, so a
    * token-equality profile can never fire (round-1 advice). */
  val SubstringLangs: Set[String] = Set("zh")

  /** Marker hits for one language's profile: token equality for
    * space-delimited languages, marker-containment count for CJK. */
  private def markerHits(lang: String, text: Column, markers: Seq[String]): Column =
    if (SubstringLangs(lang))
      markers.map(m => when(contains(lower(text), lit(m)), 1).otherwise(0))
        .reduce(_ + _)
    else {
      val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
      size(filter(toks, t => t.isin(markers.map(lit): _*)))
    }

  /** Identified language: argmax of marker hits, ties → "und"
    * (undetermined) unless one language strictly wins. Single-pass codegen
    * kernel ([[TextKernels.langId]]); [[langIdColumns]] is the equivalent
    * built-in-function formulation (kept as the semantic cross-check). */
  def langId(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(LangIdExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** Column/HOF formulation of [[langId]] — same semantics, interpreted. */
  def langIdColumns(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, markers) =>
      (lang, markerHits(lang, text, markers))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val winners = hits.foldLeft(lit(0)) { case (acc, (_, h)) =>
      acc + when(h === best && best > 0, 1).otherwise(0)
    }
    hits.foldLeft(when(lit(true), lit("und"))) { case (acc, (lang, h)) =>
      when(winners === 1 && h === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Polynomial rolling-hash fingerprint over the document's characters:
    * `h = (h·31 + codepoint) mod (10^9+7)` — order-sensitive, deterministic,
    * exactly reproducible in DuckDB via list_reduce. Single-pass codegen
    * kernel; [[fingerprintColumns]] is the HOF cross-check. */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(FingerprintExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** Column/HOF formulation of [[fingerprint]] (interpreted). */
  def fingerprintColumns(text: Column): Column =
    aggregate(
      regexp_extract_all(text, lit("."), lit(0)),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch), lit(1000000007L)))

  /** Canonical normalization (NFC + `\s+`-collapse + trim) — single-pass
    * codegen kernel; see [[TextKernels.normalize]]. */
  def normalize(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(NormalizeExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** Gopher-style repetition signals as one struct from a single-pass
    * kernel ([[TextKernels.repetition]]): `n_tok`, `distinct_ratio`,
    * `top_token_frac`, `top_bigram_frac`, `dup_bigram_frac` — the
    * repetitiveness filters of corpus curation. */
  def repetitionSignals(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(RepetitionExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** CONTENT-ADDRESSED split bucket in `[0, buckets)`: the fingerprint mod
    * bucket count. The train/heldout assignment a data pipeline needs to
    * be stable across runs, engines, partitionings and corpus growth — a
    * document's split follows its CONTENT, never an RNG or row position
    * (so exact duplicates always land in the same split, and re-ingesting
    * a doc can't migrate it). Deterministic ⇒ oracle-checkable. */
  def contentSplitBucket(text: Column, buckets: Int): Column =
    pmod(fingerprint(text), lit(buckets.toLong))

  /** PII patterns, applied in declaration order. Every pattern is written
    * in the RE2-compatible subset of Java regex (no backrefs, no
    * lookaround) so one literal serves both the codegen'd
    * `regexp_replace` kernel here and the DuckDB oracle verbatim. Order
    * matters where surface forms overlap: the 16-digit card pattern must
    * run before the phone pattern or `4111-1111-1111-1111` would lose its
    * last ten digits to `<PHONE>` first. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{4}[- ]){3}\\d{4}\\b" -> "<CARD>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** Redacted text: every PII surface form replaced by its tag. A chain
    * of five codegen'd `regexp_replace`s over one pass per pattern — the
    * standard corpus-curation scrub step, per-row and shuffle-free, so it
    * composes into any pipeline stage at 100 TB without a plan change. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Total PII matches across all pattern families (the patterns are
    * mutually exclusive on any given span — `\b` anchoring keeps the
    * digit-group families from matching inside each other — so the sum
    * counts each span once). */
  def piiCount(text: Column): Column =
    PiiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0)))
    }.reduce(_ + _)

  /** Whitespace tokens (shared tokenizer of the corpus-level operators). */
  private def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /**
   * Corpus-level collocation mining: adjacent-bigram association strength
   * as the EXACT likelihood ratio `p(ab) / (p(a)·p(b))` (PMI without the
   * final log — log is monotone, so ranking is identical, and the ratio
   * of integer counts divides exactly once in IEEE double, making the
   * score bit-reproducible across engines where `ln` is not).
   *
   * Shape at scale: one explode + two hash aggregations (map-side
   * combined) + two BROADCAST joins of the unigram dictionary (vocab ≪
   * corpus) — no shuffle touches the corpus-sized bigram stream except
   * the count aggregation itself, and the final top-n is
   * `TakeOrderedAndProject`, never a global sort.
   *
   * Returns `[bigram, c_ab, c_a, c_b, lift]`, the `topN` strongest
   * collocations with support ≥ `minCount`, ties broken by bigram text.
   */
  def collocations(df: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Int = 5, topN: Int = 50): org.apache.spark.sql.DataFrame = {
    val toks = wsTokens(col(textCol))
    val base = df.select(toks.as("w")).filter(size(col("w")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = base.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val totals = base.agg(
      sum(size(col("w"))).as("n_uni"),
      sum(greatest(size(col("w")) - 1, lit(0))).as("n_bi"))
    val bigrams = base
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val scored = bigrams
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(broadcast(uni.select(col("t").as("w1"), col("c").as("c_a"))), "w1")
      .join(broadcast(uni.select(col("t").as("w2"), col("c").as("c_b"))), "w2")
      .crossJoin(broadcast(totals))
      // deterministic double arithmetic: every operand is an exact integer
      // cast once, the multiplications/division associate left-to-right in
      // the SAME order as the oracle's expression, and each IEEE op is
      // correctly rounded — bit-identical across engines (unlike ln(),
      // whose libm rounding differs; hence lift, not log-PMI). Products
      // run in double, never BIGINT: c_ab·n_uni² overflows int64 at
      // corpus scale
      .withColumn("lift",
        (col("c_ab").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_bi").cast("double") * col("c_a") * col("c_b")))
      .select("bigram", "c_ab", "c_a", "c_b", "lift")
    graft.util.CacheDiscipline.materializeAndFree(
      scored.orderBy(col("lift").desc, col("bigram")).limit(topN), base)
  }

  /** The Gopher rule-filter stopword set (Rae et al. 2021, §A1.1.2:
    * "contains at least two of the following English words"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style repetition-free quality rules (Rae et al. 2021, Appendix
   * A1.1) as one struct: the per-document statistics each rule reads
   * (word count, mean word length, alphabetic-word ratio, symbol-to-word
   * ratio, distinct-stopword count) plus the five rule verdicts and their
   * conjunction. All arithmetic is integer counts with at most one double
   * division per ratio — exact across engines. Single projection, no
   * shuffle: the 100 TB shape is "one scan, keep the survivors".
   *
   * Rules: 50 ≤ words ≤ 100,000; 3 ≤ mean word length ≤ 10;
   * symbol-to-word ratio (# and …) ≤ 0.1; ≥ 80% of words contain an
   * alphabetic character; ≥ 2 distinct [[GopherStopwords]].
   *
   * Single-pass codegen kernel ([[TextKernels.gopher]]);
   * [[gopherFlagsColumns]] is the equivalent built-in-function
   * formulation (kept as the semantic cross-check).
   */
  def gopherFlags(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(GopherExpr(
      org.apache.spark.sql.graftshim.GraftSql.expression(text)))

  /** Column/HOF formulation of [[gopherFlags]] — same arithmetic,
    * interpreted (kept as the semantic cross-check). */
  def gopherFlagsColumns(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val n = size(toks)
    val meanLen = when(n === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
    val alphaRatio = when(n === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n)
    // '#' chars and literal '...' runs, per word (Gopher's symbol list)
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEllipsis =
      (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3)
    val symbolRatio = when(n === 0, lit(0.0)).otherwise(
      (nHash + nEllipsis).cast("double") / n)
    val nStop = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      array(GopherStopwords.map(lit): _*)))
    val wordCountOk = (n >= 50 && n <= 100000).cast("int")
    val meanLenOk = (meanLen >= 3.0 && meanLen <= 10.0).cast("int")
    val symbolOk = (symbolRatio <= 0.1).cast("int")
    val alphaOk = (alphaRatio >= 0.8).cast("int")
    val stopOk = (nStop >= 2).cast("int")
    struct(
      n.cast("long").as("n_words"), meanLen.as("mean_word_len"),
      alphaRatio.as("alpha_ratio"), symbolRatio.as("symbol_ratio"),
      nStop.cast("long").as("n_stop"),
      wordCountOk.as("word_count_ok"), meanLenOk.as("mean_len_ok"),
      symbolOk.as("symbol_ok"), alphaOk.as("alpha_ok"), stopOk.as("stop_ok"),
      (wordCountOk * meanLenOk * symbolOk * alphaOk * stopOk).as("keep"))
  }

  /**
   * Context-window chunking — shard each document into overlapping
   * `maxTokens`-token windows with `overlap` tokens of context carried
   * across the cut (the training-prep / RAG-ingest sibling of
   * [[graft.operators.Relational.packByBudget]], which PACKS short docs
   * up; this SPLITS long docs down). Chunk `c` covers token positions
   * `[c·stride, c·stride + maxTokens)` with `stride = maxTokens −
   * overlap`; the final chunk may be shorter. Returns `[<idCol>,
   * chunk_id, chunk_text, n_tokens]`; empty/null documents produce no
   * chunks.
   *
   * Pure projection — explode of a computed per-row sequence, no shuffle,
   * no state: at 100 TB this pipelines inside whole-stage codegen between
   * the scan and the sink.
   */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxTokens: Int,
      overlap: Int = 0): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val toks = filter(split(col(textCol), " ", -1), t => length(t) > 0)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), greatest(lit(0),
            ceil((size(col("__toks")) - maxTokens).cast("double") / stride)
              .cast("int"))),
          c => array_join(slice(col("__toks"), c * stride + 1, lit(maxTokens)), " ")))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_tokens",
        size(filter(split(col("chunk_text"), " ", -1), t => length(t) > 0)))
  }
}

package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def oneRow(text: String) = {
    val sp = spark
    import sp.implicits._
    Seq(text).toDF("text")
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = oneRow("hello w0rld, x!").select(
      TextAnalysis.tokenCountWs(col("text")).as("ws"),
      TextAnalysis.tokenCountBpeish(col("text")).as("bpe")).head()
    assert(r.getInt(0) === 3)
    // hello | w | 0 | rld | , | x | ! = 7
    assert(r.getInt(1) === 7)
  }

  test("ratios and mean token length; empty text guarded") {
    val r = oneRow("the cat!!").select(
      TextAnalysis.meanTokenLen(col("text")).as("mtl"),
      TextAnalysis.punctRatio(col("text")).as("pr"),
      TextAnalysis.stopwordRatio(col("text")).as("sw")).head()
    assert(r.getDouble(0) === (3 + 5) / 2.0) // "the"(3), "cat!!"(5)
    assert(r.getDouble(1) === 2.0 / 9)
    assert(r.getDouble(2) === 0.5)
    val z = oneRow("").select(TextAnalysis.meanTokenLen(col("text")),
      TextAnalysis.punctRatio(col("text")),
      TextAnalysis.stopwordRatio(col("text")),
      TextAnalysis.qualityScore(col("text"))).head()
    assert(!z.anyNull)
  }

  test("quality score in [0,1], higher for healthy text than punctuation soup") {
    val r = oneRow("The quick brown fox jumps over the lazy dog and runs far away home")
      .select(TextAnalysis.qualityScore(col("text"))).head().getDouble(0)
    val junk = oneRow("!!! ??? ### $$$ %%% ^^^ &&&")
      .select(TextAnalysis.qualityScore(col("text"))).head().getDouble(0)
    assert(r > junk)
    assert(r >= 0.0 && r <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("langid: marker argmax with deterministic tie -> und") {
    val sp = spark
    import sp.implicits._
    val r = Seq(
      "the cat is on the mat and it is happy",
      "der hund ist nicht mit der katze",
      "le chat est dans la maison pour le moment",
      "xyz qqq zzz").toDF("text")
      .select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(r.toSeq === Seq("en", "de", "fr", "und"))
  }

  test("fingerprint: deterministic, order-sensitive, stable on real docs") {
    val sp = spark
    import sp.implicits._
    val r = Seq("ab", "ba", "ab").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(r(0) === r(2))
    assert(r(0) !== r(1))
    // h("ab") = (0*31+97)*31+98 mod p = 3105
    assert(r(0) === 3105L)
  }

  test("textStats kernel fields match the Column formulations on the corpus") {
    val st = TextAnalysis.textStats(col("text"))
    val diff = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        st.getField("n_tok_ws").as("k1"), TextAnalysis.tokenCountWs(col("text")).as("c1"),
        st.getField("n_tok_bpe").as("k2"), TextAnalysis.tokenCountBpeish(col("text")).as("c2"),
        st.getField("mean_tok_len").as("k3"), TextAnalysis.meanTokenLen(col("text")).as("c3"),
        st.getField("punct_ratio").as("k4"), TextAnalysis.punctRatio(col("text")).as("c4"),
        st.getField("stopword_ratio").as("k5"), TextAnalysis.stopwordRatio(col("text")).as("c5"))
      .filter(col("k1") =!= col("c1") || col("k2") =!= col("c2") ||
        col("k3") =!= col("c3") || col("k4") =!= col("c4") || col("k5") =!= col("c5"))
      .count()
    assert(diff === 0L)
  }

  test("normalize: NFC composition, whitespace collapse, trim") {
    val sp = spark
    import sp.implicits._
    val decomposed = "état" // e + combining acute → NFC 'état'
    val rows = Seq(
      ("  a \t b\n\nc  ", "a b c"),
      (decomposed, "état"),
      ("", ""),
      (" \t\n ", ""),
      ("already clean", "already clean")).toDF("in", "expect")
      .select(TextAnalysis.normalize(col("in")).as("got"), col("expect"))
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("bm25: rare terms outscore common, tf saturates, absent terms score 0") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "rare rare rare common filler filler"),
      (4L, "filler filler filler filler filler filler"),
      (5L, "common common common common filler filler")).toDF("doc_id", "text")
    val scores = Relevance.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 4 has neither term: no row at all
    assert(!scores.contains(4L))
    // 'rare' appears in 2/5 docs, 'common' in 4/5: idf(rare) > idf(common),
    // so the rare-term doc beats the common-only doc at equal tf
    assert(scores(1L) > scores(2L))
    // more rare occurrences (saturating) still rank doc 3 above doc 1
    assert(scores(3L) > scores(1L))
    // tf saturation: 4× common (doc 5) scores < 4× the 1× common doc 2
    assert(scores(5L) < 4 * scores(2L))
    // top-k surface: rank order with id tie-break, bounded size
    val top = Relevance.bm25TopK(docs, "doc_id", "text", Seq("rare", "common"), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(3L, 1L))
  }

  test("repetition signals: hand-computed fractions, guards on empty/1-token docs") {
    val rep = TextAnalysis.repetitionSignals(col("text"))
    val sel = Seq("n_tok", "distinct_ratio", "top_token_frac",
      "top_bigram_frac", "dup_bigram_frac").map(f => rep.getField(f).as(f))
    // "a b a b a": toks = 5, distinct = 2, top tok "a" ×3;
    // bigrams: "a b"×2, "b a"×2 of 4 → top 2/4, all 4 occurrences dup'd
    val r = oneRow("a b A B a").select(sel: _*).head()
    assert(r.getInt(0) === 5)
    assert(r.getDouble(1) === 2.0 / 5)
    assert(r.getDouble(2) === 3.0 / 5)
    assert(r.getDouble(3) === 2.0 / 4)
    assert(r.getDouble(4) === 4.0 / 4)
    // unique tokens: ratios 1.0 / (1/n) / (1/(n-1)) / 0
    val u = oneRow("x y z w").select(sel: _*).head()
    assert(u.getDouble(1) === 1.0 && u.getDouble(2) === 1.0 / 4)
    assert(u.getDouble(3) === 1.0 / 3 && u.getDouble(4) === 0.0)
    // degenerate docs: no NaN/divide-by-zero
    val z = oneRow("").select(sel: _*).head()
    assert(z.getInt(0) === 0 && z.getDouble(1) === 0.0 && z.getDouble(3) === 0.0)
    val one = oneRow("solo").select(sel: _*).head()
    assert(one.getInt(0) === 1 && one.getDouble(2) === 1.0 && one.getDouble(3) === 0.0)
  }

  test("PII redaction: every family tagged, clean text idempotent") {
    val r = oneRow("mail bob.smith+x@corp.example.org tel 415-555-0199 " +
        "ssn 078-05-1120 card 4111-1111-1111-1111 host 192.168.10.250 end")
      .select(TextAnalysis.redactPii(col("text")).as("clean"),
        TextAnalysis.piiCount(col("text")).as("n")).head()
    assert(r.getString(0) ===
      "mail <EMAIL> tel <PHONE> ssn <SSN> card <CARD> host <IP> end")
    assert(r.getInt(1) === 5)
    // idempotent: redacting already-clean text changes nothing
    val again = oneRow(r.getString(0))
      .select(TextAnalysis.redactPii(col("text"))).head().getString(0)
    assert(again === r.getString(0))
    // plain text untouched, digit runs without separators not over-matched
    val plain = "order 12345 of 99 units at 3.5 cost"
    val keep = oneRow(plain).select(TextAnalysis.redactPii(col("text")),
      TextAnalysis.piiCount(col("text"))).head()
    assert(keep.getString(0) === plain && keep.getInt(1) === 0)
  }

  test("collocations: lift ranks a glued pair above independent fillers") {
    val sp = spark
    import sp.implicits._
    // "neural nets" always adjacent; "data" pairs with everything
    val docs = (0 until 40).map { i =>
      s"neural nets data x$i data y${i % 3} data neural nets end$i"
    }.toDF("text")
    val top = TextAnalysis.collocations(docs, "text", minCount = 5, topN = 10)
      .collect()
    assert(top.nonEmpty)
    val byBigram = top.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(byBigram.contains("neural nets"))
    // the glued pair outranks any "data *" bigram present in the top list
    byBigram.filter(_._1.startsWith("data ")).values.foreach { l =>
      assert(byBigram("neural nets") > l)
    }
    // counts are exact: "neural nets" occurs twice per doc
    val row = top.find(_.getString(0) == "neural nets").get
    assert(row.getLong(1) === 80L)
  }

  test("kernel formulations match the Column/HOF cross-checks on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("zh", org.apache.spark.sql.functions.concat(col("text"),
        org.apache.spark.sql.functions.lit(" \u7684\u662f\u5728")))
    val diff = docs.select(
        TextAnalysis.langId(col("text")).as("k1"),
        TextAnalysis.langIdColumns(col("text")).as("c1"),
        TextAnalysis.qualityScore(col("text")).as("k2"),
        TextAnalysis.qualityScoreColumns(col("text")).as("c2"),
        TextAnalysis.langId(col("zh")).as("k3"),
        TextAnalysis.langIdColumns(col("zh")).as("c3"),
        TextAnalysis.fingerprint(col("text")).as("k4"),
        TextAnalysis.fingerprintColumns(col("text")).as("c4"))
      .filter(col("k1") =!= col("c1") || col("k2") =!= col("c2") ||
        col("k3") =!= col("c3") || col("k4") =!= col("c4"))
      .count()
    assert(diff === 0L)
  }

  test("importance weights: hand-computed smoothed lift scores on a toy corpus") {
    val sp = spark
    import sp.implicits._
    // prof: aa c_t=3,c_r=1; bb c_t=1,c_r=1; cc c_t=0,c_r=2 → N_t=4, N_r=4, V=3
    // lift(aa)=(4·7)/(2·7)=2, lift(bb)=1, lift(cc)=(1·7)/(3·7)=1/3
    val docs = Seq(
      (1L, "aa bb", "en"), (2L, "aa bb", "de"),
      (3L, "aa aa", "en"), (4L, "cc cc", "de")).toDF("doc_id", "text", "lang")
    val got = Importance.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) === ((1L, 2L, 3.0)))     // 1·2 + 1·1, same text as doc 2
    assert(got(1) === ((2L, 2L, 3.0)))     // raw doc, identical text ⇒ identical score
    assert(got(2) === ((3L, 2L, 4.0)))     // 2·lift(aa)
    assert(got(3)._3 === 2.0 / 3.0)        // 2·lift(cc): raw-exclusive token scores low
  }

  test("importance weights: bit-identical across repeated runs (ordered fold)") {
    // double addition is order-sensitive; the ascending-token fold must
    // make the score independent of partitioning/aggregation order
    val docs = sf("documents")
    def run() = Importance.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run()
    val b = run()
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("importance weights, hashed profile: fixed width, deterministic, ≈exact sans collisions") {
    val sp = spark
    import sp.implicits._
    // high-distinct-vocabulary corpus: every doc contributes unique noise
    // tokens (the web-scale regime where the exact profile outgrows
    // broadcast limits) plus shared signal tokens
    val docs = (0L until 200L).map { i =>
      val noise = (0 until 20).map(j => s"tok_${i}_$j").mkString(" ")
      val signal = if (i % 2 == 0) "alpha alpha beta" else "gamma delta"
      (i, s"$signal $noise", if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    def run(buckets: Int) = Importance.importanceWeights(docs, "doc_id",
        "text", col("lang") === "en", hashBuckets = buckets)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // small bucket count: one row per doc, finite scores, deterministic
    val h = run(64)
    assert(h.length === 200)
    assert(h.forall { case (_, n, s) => n > 0 && !s.isNaN && !s.isInfinite && s > 0 })
    assert(h === run(64))
    // a bucket space far larger than the vocabulary (~4k distinct tokens,
    // 2^30 buckets → collision-free here, deterministically): bucket stats
    // ≡ token stats and V (distinct terms) is unchanged, so scores match
    // the exact profile up to fold-order float noise (bucket order ≠
    // token order)
    val exact: Map[Long, (Long, Double)] =
      run(0).map { case (id, n, s) => id -> (n, s) }.toMap
    val wide = run(1 << 30)
    assert(wide.forall { case (id, n, s) =>
      val (en, es) = exact(id)
      n == en && math.abs(s - es) <= 1e-9 * math.max(1.0, math.abs(es))
    })
  }

  test("hashed linear quality model: kernel matches a plain-Scala reference; empty -> bias") {
    import graft.text.QualityModel
    import graft.functions.PolyHash
    val sp = spark
    import sp.implicits._
    val w = QualityModel.demoWeights(128)
    val bias = -0.25
    val docs = Seq((1L, "the quick brown fox"), (2L, "a b"), (3L, ""),
      (4L, "   "), (5L, "single"), (6L, "dup dup dup dup")).toDF("id", "t")
    val got = docs.select(col("id"), QualityModel.score(col("t"), w, bias).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // plain-Scala reference (independent of ArrayData/codegen plumbing)
    def ref(text: String): Double = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) return bias
      val feats = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val counts = new Array[Int](w.length)
      feats.foreach(f => counts((PolyHash.hash(f, PolyHash.B1) % w.length).toInt) += 1)
      var z = bias
      counts.indices.foreach(b =>
        if (counts(b) > 0) z += w(b) * (counts(b).toDouble / feats.length))
      z
    }
    Seq(1L -> "the quick brown fox", 2L -> "a b", 3L -> "", 4L -> "   ",
      5L -> "single", 6L -> "dup dup dup dup").foreach { case (id, t) =>
      assert(got(id) === ref(t), s"doc $id")
    }
    assert(got(3L) === bias && got(4L) === bias) // token-free -> bias
    // deterministic fixture weights are stable across calls
    assert(QualityModel.demoWeights(128).toSeq === w.toSeq)
  }

  test("hashed linear quality model: sparse path (large buckets) is bit-identical to dense") {
    import graft.text.QualityModel
    val sp = spark
    import sp.implicits._
    // 16384 buckets exceeds DenseBucketLimit (8192) → open-addressed map
    // path; 8192 exactly hits the dense path. Same weight FORMULA, so the
    // same (bucket, count) pairs hash identically where ids coincide — the
    // assertion is against an independent plain-Scala reference per size.
    val bias = 0.125
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a a a a a b"), (3L, "x"), (4L, ""),
      (5L, (1 to 500).map(i => s"tok$i").mkString(" "))).toDF("id", "t")
    for (buckets <- Seq(8192, 16384, 1 << 20)) {
      val w = QualityModel.demoWeights(buckets)
      val got = texts.select(col("id"), QualityModel.score(col("t"), w, bias).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def ref(text: String): Double = {
        import graft.functions.PolyHash
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) return bias
        val feats = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
        val counts = scala.collection.mutable.Map.empty[Int, Int]
        feats.foreach { f =>
          val b = (PolyHash.hash(f, PolyHash.B1) % buckets).toInt
          counts(b) = counts.getOrElse(b, 0) + 1
        }
        var z = bias
        counts.toSeq.sortBy(_._1).foreach { case (b, c) =>
          z += w(b) * (c.toDouble / feats.length)
        }
        z
      }
      Seq(1L, 2L, 3L, 4L, 5L).foreach { id =>
        val t = Seq("the quick brown fox jumps over the lazy dog",
          "a a a a a b", "x", "", (1 to 500).map(i => s"tok$i").mkString(" "))(id.toInt - 1)
        assert(got(id) === ref(t), s"doc $id at buckets=$buckets")
      }
    }
  }

  test("gopherFlags: rule statistics and verdicts") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    // 60 words, mean length in range, all alphabetic, 2 distinct stopwords
    val good = (Seq.fill(29)("alpha beta").flatMap(_.split(" ")) ++
      Seq("the", "with")).mkString(" ")
    val short = "tiny doc"                       // fails word count
    val symbols = Seq.fill(60)("###").mkString(" ") // fails symbol + alpha
    val df = Seq((1L, good), (2L, short), (3L, symbols)).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.gopherFlags(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
        col("g.alpha_ratio"), col("g.symbol_ratio"), col("g.n_stop"),
        col("g.keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getInt(6))).toMap
    val (n1, ml1, ar1, sr1, st1, keep1) = got(1L)
    assert(n1 === 60L && st1 === 2L && ar1 === 1.0 && sr1 === 0.0)
    assert(ml1 >= 3.0 && ml1 <= 10.0)
    assert(keep1 === 1)
    assert(got(2L)._1 === 2L && got(2L)._6 === 0)   // word count rule
    val (_, _, ar3, sr3, _, keep3) = got(3L)
    assert(ar3 === 0.0 && sr3 === 3.0 && keep3 === 0) // symbol + alpha rules
  }

  test("chunkByTokens: stride windows, overlap carry, short tail") {
    val sp = spark
    import sp.implicits._
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "a b"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "doc_id", "text",
        maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    // stride 3: chunks at 0,3,6 cover all 10 tokens; ceil((10-4)/3)=2 -> 3 chunks
    assert(got.filter(_._1 == 1L).map(c => (c._2, c._3, c._4)).toSeq === Seq(
      (0, "w1 w2 w3 w4", 4), (1, "w4 w5 w6 w7", 4), (2, "w7 w8 w9 w10", 4)))
    // short doc: one short chunk; empty/null docs produce no chunks
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0, "a b", 2)))
    assert(!got.exists(c => c._1 == 3L || c._1 == 4L))
    // every token position is covered by at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
  }

  test("gopherFlags kernel == Columns formulation on the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = sf("documents")
    val a = docs.select(col("doc_id"),
      TextAnalysis.gopherFlags(col("text")).as("g")).orderBy("doc_id").collect()
    val b = docs.select(col("doc_id"),
      TextAnalysis.gopherFlagsColumns(col("text")).as("g")).orderBy("doc_id").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }
}

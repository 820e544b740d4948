package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hybrid BM25 + dense RRF fusion ([[HybridSearch.hybridRrf]]). */
class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark vector search engine"),
    (1L, "vector vector vector quantization"),
    (2L, "the quick brown fox"),
    (3L, "spark spark streaming"),
    (4L, "dup dup dup dup"),
    (5L, "completely unrelated text about cooking"),
    (6L, "vector spark dup search")
  ).toDF("doc_id", "text")

  test("ranks are 1-based, k bounds output, and both-list docs fuse both contributions") {
    val out = HybridSearch.hybridRrf(corpus, "doc_id", "text",
      terms = Seq("vector", "spark", "dup"),
      queryText = "vector spark dup search", k = 5, n = 10)
      .collect()
    assert(out.length == 5)
    // doc 6 matches the query text exactly AND contains every BM25 term:
    // rank 1 dense, present lexically -> the fused winner
    val top = out.head
    assert(top.getLong(0) == 6L)
    assert(top.getInt(2) == 1) // dense_rank
    assert(!top.isNullAt(1))   // lex_rank present
    // fused score equals the sum of the two rank contributions
    val expected = (1.0 / (60 + top.getInt(1)) + 1.0 / (60 + top.getInt(2))).toFloat
    assert(top.getFloat(3) == expected)
    // ordering is by fused score descending
    val scores = out.map(_.getFloat(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("a doc outside one list carries a null rank but still scores the other") {
    val out = HybridSearch.hybridRrf(corpus, "doc_id", "text",
      terms = Seq("cooking"), queryText = "vector quantization", k = 7, n = 3)
      .collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 5 is the only lexical hit; it shares no query token with the
    // dense query, and n=3 keeps it outside the dense list
    val d5 = byId(5L)
    assert(d5.getInt(1) == 1 && d5.isNullAt(2))
    assert(d5.getFloat(3) == (1.0 / 61).toFloat)
    // dense-only docs have null lex_rank
    val denseOnly = out.filter(r => r.isNullAt(1) && !r.isNullAt(2))
    assert(denseOnly.nonEmpty)
  }

  test("rerank: candidates come from BM25 top-n, order follows the pair score") {
    val out = HybridSearch.rerank(corpus, "doc_id", "text",
      terms = Seq("vector", "spark", "dup"),
      queryText = "vector spark dup search", k = 4, n = 10)
      .orderBy("rank").collect()
    assert(out.length == 4)
    // doc 6 is the exact query text: pair score 1.0, rank 1
    assert(out.head.getLong(0) == 6L && out.head.getInt(3) == 1)
    assert(math.abs(out.head.getFloat(2) - 1.0f) < 1e-6f)
    // every survivor carries its recall-stage rank
    assert(out.forall(r => r.getInt(1) >= 1))
    // rerank order is by ce_score descending
    val scores = out.map(_.getFloat(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("deterministic across runs") {
    def run() = HybridSearch.hybridRrf(corpus, "doc_id", "text",
      terms = Seq("vector", "spark"), queryText = "spark vector", k = 6, n = 6)
      .collect().map(r => (r.getLong(0), r.getFloat(3))).toSeq
    assert(run() == run())
  }

  test("batch dense side: Flat-index route matches the windowed-scan route") {
    // the mining-scale escape hatch (denseIndex) must agree with the
    // default scored-stream plan: with the exact Flat index, the same
    // hash-embed cosine ranks the same docs — divergence is possible only
    // on float-tie boundaries, absent from this fixture
    val queries = Seq(
      (0L, Seq("vector", "spark"), "spark vector search"),
      (1L, Seq("dup"), "dup dup text")).toDF("qid", "terms", "qtext")
    def run(idx: Option[String]) = HybridSearch.hybridRrfBatch(
        corpus, "doc_id", "text", queries, "qid", "terms", "qtext",
        k = 5, n = 4, denseIndex = idx)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(if (r.isNullAt(2)) null else r.getInt(2)),
          Option(if (r.isNullAt(3)) null else r.getInt(3)))).toMap
    val windowed = run(None)
    val flat = run(Some("Flat"))
    assert(flat === windowed)
  }

  test("batch auto-route: work thresholds flip the dense side to the index plan, equivalently") {
    val queries = Seq(
      (0L, Seq("vector", "spark"), "spark vector search"),
      (1L, Seq("dup"), "dup dup text"),
      (2L, Seq("fox"), "quick brown fox")).toDF("qid", "terms", "qtext")
    def run(corpusBytes: Long, minQ: Long) = HybridSearch.hybridRrfBatch(
        corpus, "doc_id", "text", queries, "qid", "terms", "qtext",
        k = 5, n = 4, autoIndexCorpusBytes = corpusBytes,
        autoIndexMinQueries = minQ)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(if (r.isNullAt(2)) null else r.getInt(2)),
          Option(if (r.isNullAt(3)) null else r.getInt(3)))).toMap
    // default thresholds: this fixture is curation-scale, windowed route
    val windowed = run(1L << 30, 512L)
    // forced flip: any corpus counts as big, any |Q| crosses — the auto
    // decision takes the Flat index route and must agree result-for-result
    val flipped = run(0L, 0L)
    assert(flipped === windowed)
    // the flip gates on BOTH signals: big corpus alone must not flip
    // (|Q| below the floor keeps the windowed plan, results identical)
    val bigCorpusOnly = run(0L, 512L)
    assert(bigCorpusOnly === windowed)
  }
}

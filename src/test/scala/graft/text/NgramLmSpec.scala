package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {

  private def corpus = {
    val sp = spark
    import sp.implicits._
    Seq(Option("a b a b"), Option("a b c"), None, Option("x"))
      .toDF("text")
  }

  test("bigram LM fit: exact counts, deterministic order, bigram closure") {
    val lm = NgramLm.fit(corpus, "text")
    // unigrams: a=3 b=3 c=1 x=1 → N=8 V=4
    assert(lm.unigramRows.toMap === Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "x" -> 1L))
    assert(lm.n === 8L)
    assert(lm.v === 4L)
    assert(lm.nv === 12.0)
    // bigrams: "a b"=3 (twice in doc1, once in doc2), "b a"=1, "b c"=1
    assert(lm.bigramRows.toMap === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
    // refit is bit-identical (deterministic aggregation + total order)
    val lm2 = NgramLm.fit(corpus, "text")
    assert(lm2.unigramRows === lm.unigramRows)
    assert(lm2.bigramRows === lm.bigramRows)
  }

  test("unigram cap: top-K by (count, gram) and bigram closure drop together") {
    val lm = NgramLm.fit(corpus, "text", maxUnigrams = 2)
    // counts tie-break on token asc: a=3, b=3 survive; c/x capped out
    assert(lm.unigramRows.map(_._1) === Seq("a", "b"))
    // "b c" loses its right endpoint → dropped by closure
    assert(lm.bigramRows.toMap === Map("a b" -> 3L, "b a" -> 1L))
    assert(lm.n === 6L)
    assert(lm.v === 2L)
  }

  test("NLL kernel: hand-computed values, OOV penalty, edge cases") {
    val sp = spark
    import sp.implicits._
    val lm = NgramLm.fit(corpus, "text")
    val docs = Seq(Option("a b"), Option("z q"), Option("x"), Option(""), None)
      .toDF("text")
    val got = docs.select(NgramLm.score(col("text"), lm).as("nll")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // "a b": P(b|a) = 0.75·3/3 + 0.25·(3+1)/12 = 5/6 → nll = −ln(5/6)
    assert(math.abs(got(0).get - (-math.log(5.0 / 6.0))) < 1e-12)
    // "z q": both OOV → P = 0.25·(0+1)/12 = 1/48 → nll = ln 48
    assert(math.abs(got(1).get - math.log(48.0)) < 1e-12)
    // the OOV doc scores (much) higher NLL than the in-domain one
    assert(got(1).get > got(0).get + 1.0)
    // single-token and token-free docs: exactly 0.0; NULL propagates
    assert(got(2) === Some(0.0))
    assert(got(3) === Some(0.0))
    assert(got(4) === None)
  }

  test("accumulation order is ascending position (multi-bigram doc)") {
    val sp = spark
    import sp.implicits._
    val lm = NgramLm.fit(corpus, "text")
    // "a b c": positions P(b|a) = 5/6, P(c|b) = 0.75·1/3 + 0.25·2/12 = 0.29166…
    val p1 = 0.75 * 3.0 / 3.0 + 0.25 * (3.0 + 1.0) / 12.0
    val p2 = 0.75 * 1.0 / 3.0 + 0.25 * (1.0 + 1.0) / 12.0
    val want = -((math.log(p1) + math.log(p2)) / 2.0)
    val got = Seq("a b c").toDF("text")
      .select(NgramLm.score(col("text"), lm)).head().getDouble(0)
    assert(got === want) // exact: same double ops in the same order
  }

  test("corpus scoring on the sf tables: finite, nonnegative-ish, self-fit low") {
    val docs = sf("documents")
    val lm = NgramLm.fit(docs, "text")
    val scored = docs
      .select(col("doc_id"), NgramLm.score(col("text"), lm).as("nll"))
      .where(col("nll").isNotNull)
    val stats = scored.agg(min("nll"), max("nll"), count(lit(1))).head()
    assert(stats.getLong(2) > 0)
    // a self-fit LM on a 50-word synthetic vocabulary: every bigram seen,
    // NLL bounded well under the OOV ceiling ln(N+V)
    assert(stats.getDouble(1) < math.log(lm.nv))
    assert(stats.getDouble(0) > 0.0) // probabilities < 1 ⇒ NLL > 0
  }
}

package graft.search

import graft.SparkSpec

/** Hard-negative mining ([[NegativeMining.hardNegatives]]). */
class NegativeMiningSpec extends SparkSpec {
  import spark.implicits._

  // two labels on a line: label 0 clusters near the query, label 1 behind
  private def items = Seq(
    (0L, Array(1.00f, 0.00f), 0), // the query
    (1L, Array(0.99f, 0.10f), 0), // positive (same label, closest)
    (2L, Array(0.95f, 0.30f), 1), // hardest negative
    (3L, Array(0.80f, 0.60f), 1),
    (4L, Array(0.00f, 1.00f), 1), // easy negative
    (5L, Array(0.90f, 0.40f), 0)  // another positive
  ).toDF("vec_id", "embedding", "label")

  test("positives (incl. self) excluded, negatives kept in retrieval order") {
    val out = NegativeMining.hardNegatives(items,
      items.filter($"vec_id" === 0L), "vec_id", "embedding", "label",
      k = 2, pool = 6)
      .orderBy("neg_rank").collect()
    assert(out.length == 2)
    // neg ids in similarity order: 2 (hardest), then 3; never 0/1/5 (label 0)
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 3L))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(out.forall(_.getInt(3) == 1))
    // sim_val monotonically non-increasing with neg_rank (cos path)
    assert(out(0).getFloat(4) >= out(1).getFloat(4))
  }

  test("pool truncation bounds the negatives considered") {
    // pool=2 only sees items 0 and 1 (both label 0) -> zero negatives
    val out = NegativeMining.hardNegatives(items,
      items.filter($"vec_id" === 0L), "vec_id", "embedding", "label",
      k = 2, pool = 2).collect()
    assert(out.isEmpty)
  }
}

package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.encoders.PassthroughEncoder

/**
 * Hard-negative mining — the contrastive-training data-prep step (DPR,
 * SimCSE, SBERT training recipes) built on the engine's own retrieval
 * path: for each query, retrieve a `pool` of nearest items, drop the ones
 * sharing the query's label (those are positives), and keep the top `k`
 * survivors — the items the model currently confuses with the positives,
 * which is exactly what a contrastive loss needs to see.
 *
 * Shape at scale: one k-NN search with the bounded-heap top-`pool` tail
 * (the flagship search plan — no corpus sort, no shuffle of the corpus),
 * then a broadcast join of the query labels (|Q| rows) and a per-query
 * window over ≤ `pool` hits. The expensive stage is the search; the
 * mining itself touches |Q|·pool rows regardless of corpus size.
 */
object NegativeMining {

  /**
   * `[source_id, neg_rank, neg_id, neg_label, sim_val]`: top-`k` hard
   * negatives per query, `neg_rank` 1-based in retrieval order. `items`
   * and `queries` both need `idCol`, `vecCol`, `labelCol`; a query's own
   * row carries its own label and is excluded with the other positives.
   */
  def hardNegatives(items: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, pool: Int,
      measurement: String = "cos"): DataFrame = {
    require(pool >= k && k >= 1, s"need pool >= k >= 1, got pool=$pool k=$k")
    val model = new SparkSearcher(new PassthroughEncoder(vecCol),
      SearcherParams(itemCol = Some(idCol), idCol = Some(idCol),
        measurement = measurement)).fit(items)
    val hits = model.search(queries, pool, keepRankNo = true,
      queryIdCol = Some(idCol))
    val qLabels = queries.select(col(idCol).as("__qid"),
      col(labelCol).as("__qlabel"))
    // null semantics are EXPLICIT: a null label means "class unknown",
    // which is not evidence the item shares the query's class — so
    // null-labeled neighbors stay eligible as negatives, and a
    // null-labeled query keeps every labeled neighbor (null-safe
    // inequality; plain =!= would silently drop both). Mirrors the
    // oracle's IS DISTINCT FROM.
    val negs = hits.join(broadcast(qLabels), col(idCol) === col("__qid"))
      .filter(!(col(labelCol) <=> col("__qlabel")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("rank_no").asc)
    negs.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col(idCol).as("source_id"), col("neg_rank"),
        col("sim_item").cast("long").as("neg_id"),
        col(labelCol).as("neg_label"), col("sim_val"))
  }
}

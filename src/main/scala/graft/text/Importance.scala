package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Importance weighting for data selection — the DSIR recipe (Xie et al.
 * 2023, "Data Selection for Language Models via Importance Resampling")
 * with exact unigram profiles instead of hashed n-gram buckets: fit a
 * target-distribution profile and a raw-corpus profile over the same
 * vocabulary, then score every document by how much more likely its
 * tokens are under the target than under the raw distribution. High-score
 * documents are the ones importance resampling keeps when curating a
 * pretraining mix toward a target domain.
 *
 * Determinism discipline (this is an oracle-gated operator): the
 * per-token lift is one IEEE division of exactly-integer-valued doubles
 * (add-one smoothed counts × totals — each factor < 2⁵³, so the double
 * conversions are exact and the quotient is correctly rounded), and the
 * per-document sum folds contributions in ASCENDING TOKEN ORDER on both
 * engines (double addition is order-sensitive; an unordered SUM would be
 * partition-racy). Log-ratio scoring is deliberately avoided: `ln` is
 * libm-dependent and breaks bit parity (same reason
 * [[TextAnalysis.collocations]] ranks by lift, not log-PMI) — and since
 * only the per-token factors multiply counts linearly here, lift keeps
 * the same argsort as log-lift per token.
 *
 * Scale shape: one tokenize pass feeds both profiles and the per-doc
 * counts (persisted, freed on return); the profile is vocabulary-sized
 * (≪ corpus) and BROADCAST to the contribution join; the only
 * corpus-sized shuffles are the (doc, token) count aggregation and the
 * final per-doc fold — no corpus-side sort, no driver collection.
 *
 * `hashBuckets > 0` switches to DSIR's actual production shape — hashed
 * buckets: tokens map to `xxhash64(token) mod hashBuckets`, so the
 * broadcast profile is FIXED-WIDTH regardless of vocabulary size. The
 * exact per-token profile (default) is the right tool up to natural-
 * language vocabularies (~10⁷ distinct unigrams); a web-scale corpus full
 * of noisy tokens can push the distinct vocabulary past broadcast limits,
 * and the hashed profile caps it at `hashBuckets` rows by construction
 * (collisions merge token statistics — the paper's accepted trade).
 * Still fully deterministic: xxhash64 is seeded-fixed and the per-doc
 * fold orders by bucket id.
 *
 * Returns `[<idCol>, n_tok, score]`, one row per document with ≥1 token.
 */
object Importance {
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hashBuckets: Int = 0): DataFrame = {
    // the "term" is the token itself (exact mode) or its hash bucket
    // (fixed-width mode); everything downstream is term-agnostic
    val raw = df.select(col(idCol), isTarget.as("__is_t"),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("__tok"))
    val tk = (if (hashBuckets > 0)
        raw.select(col(idCol), col("__is_t"),
          pmod(xxhash64(col("__tok")), lit(hashBuckets.toLong)).as("w"))
      else raw.withColumnRenamed("__tok", "w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prof = tk.groupBy(col("w")).agg(
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("c_t"),
      sum(when(col("__is_t"), 0L).otherwise(1L)).as("c_r"))
    val totals = prof.agg(sum(col("c_t")).as("n_t"), sum(col("c_r")).as("n_r"),
      count(lit(1)).as("v"))
    val docCounts = tk.groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("n_w"))
    // add-one-smoothed likelihood ratio, every factor an exact double
    val lift = ((col("c_t") + lit(1L)).cast("double") * (col("n_r") + col("v")).cast("double")) /
      ((col("c_r") + lit(1L)).cast("double") * (col("n_t") + col("v")).cast("double"))
    val contrib = docCounts
      .join(broadcast(prof), "w")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("w"), col("n_w"),
        (col("n_w").cast("double") * lift).as("c"))
    val scored = contrib.groupBy(col(idCol)).agg(
      sum(col("n_w")).as("n_tok"),
      aggregate(array_sort(collect_list(struct(col("w"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))
    graft.util.CacheDiscipline.materializeAndFree(scored, tk)
  }
}

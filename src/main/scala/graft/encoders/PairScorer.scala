package graft.encoders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/**
 * Pair-interaction scoring — the engine's analog of the reference's
 * cross-encoder `predict` (/root/reference/backend/bert_encoder.py:187-192,
 * fed by the pair generator encoder_utils.py:78-104): score a two-column
 * pair DataFrame. A true cross-encoder runs one forward pass per pair; with
 * embedding encoders the interaction reduces to a vector similarity, so the
 * default scores `dot(encode(a), encode(b))` — same contract, pluggable
 * encoder.
 */
final class PairScorer(encoder: Encoder) extends Serializable {

  /** Append `scoreCol` for each (colA, colB) text pair. */
  def score(pairs: DataFrame, colA: String, colB: String,
      scoreCol: String = "score"): DataFrame = {
    val encA = encoder.encode(pairs, colA, "__vec_a")
    val encB = encoder.encode(encA, colB, "__vec_b")
    encB.withColumn(scoreCol,
      VectorFunctions.vec_dot(col("__vec_a"), col("__vec_b")).cast("float"))
      .drop("__vec_a", "__vec_b")
  }
}

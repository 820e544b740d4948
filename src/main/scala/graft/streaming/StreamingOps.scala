package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions
import graft.search.SearcherModel

/**
 * Structured-Streaming surface of the engine. The reference is batch-only
 * (SURVEY §2.2: its closest stream is the encoder micro-batch generator,
 * encoder_utils.py:58-75), so these are the scale extensions a continuous
 * corpus pipeline needs: watermarked windowed aggregation over an event
 * stream, and continuous similarity scoring of a query stream against a
 * fitted (static, broadcast) index — the "online-ish" variant of
 * faiss_searcher.py:161-169 that stays inside Spark's execution model.
 */
object StreamingOps {

  /** Epoch-nanos long → timestamp (micros), for watermarking data read with
    * nanosAsLong. */
  def nsToTimestamp(ns: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((ns / 1000L).cast("long"))

  /**
   * Watermarked hourly tumbling aggregation per event type — the streaming
   * twin of SparkEntry's `q_events_hourly` (same shape: time bucket ×
   * event_type → count + decimal-exact sum). Late rows beyond the watermark
   * are dropped by Spark's state cleanup.
   */
  def hourlyEventStats(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", nsToTimestamp(col("ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /**
   * Continuous similarity scoring: each arriving vector is scored against
   * the fitted index (stream-static broadcast join, no state) and rows
   * within `threshold` of some indexed item are emitted with the match.
   * Per-query top-k needs a rank over the stream side (unsupported on
   * unbounded input); threshold semantics are the streaming-native form.
   */
  def scoreStream(stream: DataFrame, model: SearcherModel, vecCol: String,
      threshold: Double): DataFrame = {
    val metric = model.searcher.metric
    val index = model.indexedSlim // (row_id, __vec) — small side, broadcast
    val dist = metric.dist(col(vecCol), col("__vec"))
    val keep = if (metric.higherIsCloser) dist >= threshold else dist <= threshold
    stream.crossJoin(broadcast(index))
      .withColumn("sim_val", dist.cast("float"))
      .filter(keep)
      .withColumnRenamed("row_id", "match_row_id")
      .drop("__vec")
  }
}

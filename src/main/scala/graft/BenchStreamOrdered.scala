package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Ordered-replay completeness probe for the stream-stream interval join
 * ([[graft.streaming.StreamingOps.attributeStream]]). The r17 sf100
 * unordered file replay emitted 278k of ~1.48M batch matches — the
 * documented watermark-drop caveat: parquet files arrive in arbitrary
 * event-time order, so rows landing behind the advanced watermark are
 * dropped at ingestion. Production streams (Kafka et al.) arrive in
 * near-event-time order, which is what the watermark contract assumes.
 * This probe REPLAYS IN ARRIVAL ORDER — events range-partitioned by ts
 * into K time-contiguous files, streamed one file per micro-batch — and
 * measures match parity against the batch interval join, closing the
 * caveat with a measurement instead of an argument.
 *
 * File ordering contract: `repartitionByRange(K, ts)` +
 * `sortWithinPartitions(ts)` writes part-00000 = the earliest time
 * range; FileStreamSource breaks equal-mtime ties by path, so
 * maxFilesPerTrigger=1 replays the files — and thus event time —
 * in order, and no input row is ever behind the watermark.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchStreamOrdered [numFiles]   (default 32)
 */
object BenchStreamOrdered {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val numFiles = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // events.ts is TIMESTAMP(NANOS) read as long under nanosAsLong —
    // range-partitionable directly
    val ordered = java.nio.file.Files.createTempDirectory("graft-ord").toString
    val (_, sortSec) = timed {
      events.repartitionByRange(numFiles, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(ordered)
      // FileStreamSource replays in MODIFICATION-TIME order, and parallel
      // write tasks finish in arbitrary order — restamp each part file
      // with a strictly-increasing mtime in partition-index (= time-range)
      // order, so the replay order IS the event-time order the probe is
      // about. (A real deployment gets this for free: files land as time
      // passes, so arrival mtime tracks event time.)
      val parts = new java.io.File(ordered).listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      val t0 = System.currentTimeMillis() - parts.length * 1000L
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(t0 + i * 1000L)
      }
    }

    // ground truth: the batch interval join (identical condition),
    // type-agnostic via epoch nanos (ts may be long nanos or timestamp)
    val bv0 = events.filter(col("event_type") === "view")
    val bv = bv0.select(col("user_id"), col("event_id").as("view_id"),
      graft.util.TimeCols.epochNanos(bv0, "ts").as("view_tns"))
    val bc0 = events.filter(col("event_type") === "click")
    val bc = bc0.select(col("user_id").as("__r_key"),
      col("event_id").as("click_id"),
      graft.util.TimeCols.epochNanos(bc0, "ts").as("click_tns"))
    val lagNs = 240L * 60 * 1000000000L
    val (batchMatches, batchSec) = timed(
      bv.join(bc, col("user_id") === col("__r_key") &&
          col("click_tns") >= col("view_tns") &&
          col("click_tns") <= col("view_tns") + lagNs)
        .count())

    val schema = events.schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(ordered)
    val views = stream().filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val (streamMatches, streamSec, batches, peakRows, peakBytes) = {
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingOps.attributeStream(views, clicks,
          "user_id", "view_ts", "click_ts", maxLagMinutes = 240)
        .select(lit(1).as("one"))
        .writeStream.outputMode("append").format("memory")
        .queryName("ordered_attr_sink")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(3600000)
      val sec = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress
      q.stop()
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        prog.foreach(p => System.err.println(s"[progress] ${p.json}"))
      val rows = spark.table("ordered_attr_sink").count()
      val states = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
      val bytes = prog.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      (rows, sec, prog.count(_.numInputRows > 0),
        if (states.isEmpty) 0L else states.max,
        if (bytes.isEmpty) 0L else bytes.max)
    }

    val parity = streamMatches.toDouble / math.max(1L, batchMatches)
    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"stream_ordered_attribution","sf":"$sfDir","files":$numFiles,"sort_write_sec":$sortSec%.3f,"batch_join_matches":$batchMatches,"batch_join_sec":$batchSec%.3f,"stream_matches":$streamMatches,"stream_sec":$streamSec%.3f,"parity":$parity%.6f,"data_batches":$batches,"peak_state_rows":$peakRows,"peak_state_bytes":$peakBytes,"loadavg":"$load"}""")
    spark.stop()
  }
}

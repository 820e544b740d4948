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
 * Mode `session` (r19) runs the SAME ordered-replay regime through the
 * bounded sessionizer ([[graft.streaming.StreamingOps.sessionizeBounded]])
 * instead: the r17 caveat measured 17.8M of 93.9M sessions emitted under
 * UNORDERED sf100 replay (late files behind the watermark); under ordered
 * arrival the emitted set must equal the batch gaps-and-islands result
 * under the identical closure rule (non-last session, or timer end+gap
 * behind the final watermark). Parity, peak state, and EVICTIONS
 * (numRowsRemoved — the mid-stream state release the operator exists
 * for) are recorded.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchStreamOrdered [numFiles] [mode]   (default 32 attr;
 *   mode ∈ attr|session)
 */
object BenchStreamOrdered {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val numFiles = if (args.nonEmpty) args(0).toInt else 32
    val mode = if (args.length > 1) args(1) else "attr"
    require(Set("attr", "session").contains(mode),
      s"mode must be attr|session, got '$mode'")
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

    if (mode == "session") {
      // batch truth: gaps-and-islands + the operator's closure rule —
      // emit every non-last session, and the last iff its event-time
      // timer (end + gap) trails the FINAL watermark (max ts − delay) —
      // the exact SQL the correctness gate oracles at sf0.01
      import org.apache.spark.sql.expressions.Window
      val gapNs = 30L * 60 * 1000000000L
      val ev = events.select(col("user_id").cast("long").as("user_id"),
        graft.util.TimeCols.epochNanos(events, "ts").as("tns"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tns"))
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      val (batchSessions, batchSec) = timed {
        val grouped = ev
          .withColumn("__brk",
            when(col("tns") - lag(col("tns"), 1).over(w) > gapNs, 1).otherwise(0))
          .withColumn("__grp", sum(col("__brk")).over(run))
          .groupBy(col("user_id"), col("__grp"))
          .agg(min(col("tns")).as("start_ns"), max(col("tns")).as("end_ns"),
            count(lit(1)).as("n_events"))
        val last = grouped.groupBy(col("user_id"))
          .agg(max(col("__grp")).as("__mg"))
        val wm = ev.agg((expr("max(tns) div 1000000") - lit(3600000L)).as("__wm"))
        grouped.join(last, "user_id").crossJoin(broadcast(wm))
          .filter(col("__grp") < col("__mg") ||
            expr("end_ns div 1000000") + lit(1800000L) < col("__wm"))
          .count()
      }

      val schema = events.schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(ordered)
      val sessEvents = src.select(
        col("user_id").cast("long").as("user_id"),
        graft.util.TimeCols.epochNanos(src, "ts").as("ts_ns"),
        col("value").cast("double").as("value"))
        .as[graft.streaming.StreamingOps.SessionEvent](
          org.apache.spark.sql.Encoders.product[
            graft.streaming.StreamingOps.SessionEvent])
      // parquet sink, not memory: ~94M emitted sessions at sf100 would
      // live on the driver heap in a memory sink
      val outDir = java.nio.file.Files.createTempDirectory("graft-ordsess")
      val (streamSessions, streamSec, batches, peakRows, peakBytes, evicted) = {
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamingOps.sessionizeBounded(sessEvents,
            gapMinutes = 30, watermarkDelay = "1 hour")
          .writeStream.outputMode("append").format("parquet")
          .option("path", s"$outDir/data")
          .option("checkpointLocation", s"$outDir/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(3600000)
        val sec = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress
        q.stop()
        val rows = spark.read.parquet(s"$outDir/data").count()
        val states = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
        val bytes = prog.flatMap(_.stateOperators.map(_.memoryUsedBytes))
        val removed = prog.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
        (rows, sec, prog.count(_.numInputRows > 0),
          if (states.isEmpty) 0L else states.max,
          if (bytes.isEmpty) 0L else bytes.max, removed)
      }
      val parity = streamSessions.toDouble / math.max(1L, batchSessions)
      val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      println(f"""{"metric":"stream_ordered_sessionize_bounded","sf":"$sfDir","files":$numFiles,"sort_write_sec":$sortSec%.3f,"batch_sessions":$batchSessions,"batch_sec":$batchSec%.3f,"stream_sessions":$streamSessions,"stream_sec":$streamSec%.3f,"parity":$parity%.6f,"data_batches":$batches,"peak_state_rows":$peakRows,"peak_state_bytes":$peakBytes,"state_rows_evicted":$evicted,"loadavg":"$load"}""")
      spark.stop()
      return
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

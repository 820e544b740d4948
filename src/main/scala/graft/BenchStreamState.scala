package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming STATE-GROWTH probe for the per-key stateful operators — the
 * class that blows up at scale not by wall-clock but by state-store
 * growth. q_stream_hourly's state is bounded by window count (proven at
 * sf100, r16); the per-KEY operators are bounded by key cardinality
 * within their eviction horizon, and this probe measures that directly
 * from the state-store metrics across forced micro-batches:
 *
 *  - sessionize (NoTimeout)      — state = one row per user EVER seen
 *                                  (named hazard: grows with lifetime
 *                                  cardinality, 1.5M at sf100)
 *  - sessionizeBounded           — event-time timers evict at
 *                                  watermark > session end + gap: state
 *                                  bounded by users ACTIVE within
 *                                  (gap + watermark delay) of the head
 *  - standingQueryTopK           — O(k) per standing query forever
 *
 * Prints one JSON line per operator: rows in/out, per-batch max/final
 * state rows + bytes, eviction counts, wall seconds.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   sbt "runMain graft.BenchStreamState [maxFilesPerTrigger]"
 */
object BenchStreamState {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val maxFiles = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")) // state partitions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)
    import spark.implicits._

    def loadavg() = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")

    /** One layout-agnostic file-stream over the events table; callable
      * more than once so two-stream operators (stream-stream joins) can
      * build both sides from the same source. */
    def eventsStream(): org.apache.spark.sql.DataFrame = {
      val src = s"$sfDir/events.parquet"
      val schema = spark.read.parquet(src).schema
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.getFileStatus(srcPath).isDirectory)
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", maxFiles).parquet(src)
      else spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFiles)
        .option("pathGlobFilter", "events.parquet")
        .parquet(srcPath.getParent.toString)
    }

    def runProbe(name: String, build: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.Dataset[_]): Unit =
      runProbeOn(name, () => build(eventsStream()))

    def runProbeOn(name: String, build: () => org.apache.spark.sql.Dataset[_]): Unit = {
      val t0 = System.nanoTime()
      val q = build().writeStream.outputMode("append")
        .format("noop").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(1800000)
      val sec = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress
      q.stop()
      val in = prog.map(_.numInputRows).sum
      val state = prog.flatMap(_.stateOperators)
      val maxRows = if (state.isEmpty) 0L else state.map(_.numRowsTotal).max
      val lastRows = prog.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      val maxBytes = if (state.isEmpty) 0L else state.map(_.memoryUsedBytes).max
      val removed = state.map(_.numRowsRemoved).sum
      val out = prog.flatMap(p => Option(p.sink)).map(_.numOutputRows).sum
      println(f"""{"metric":"stream_state","op":"$name","sf":"$sfDir","batches":${prog.length},"input_rows":$in,"output_rows":$out,"max_state_rows":$maxRows,"final_state_rows":$lastRows,"max_state_bytes":$maxBytes,"evicted_rows":$removed,"sec":$sec%.1f,"loadavg":"${loadavg()}"}""")
    }

    def toSessions(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id").cast("long").as("user_id"),
      graft.util.TimeCols.epochNanos(df, "ts").as("ts_ns"),
      col("value").cast("double").as("value")).as[graft.streaming.StreamingOps.SessionEvent]

    // the hazard case first, then the fix — same input, same batching
    runProbe("sessionize_notimeout", df =>
      graft.streaming.StreamingOps.sessionize(toSessions(df), gapMinutes = 30,
        closeOnIdle = false))
    runProbe("sessionize_bounded", df =>
      graft.streaming.StreamingOps.sessionizeBounded(toSessions(df),
        gapMinutes = 30, watermarkDelay = "1 hour"))

    // ingest dedup (dropDuplicatesWithinWatermark): state = distinct
    // keys within the watermark horizon; user_id at 1.5M lifetime /
    // bounded active cardinality is the interesting key (event_id would
    // be all-distinct and measure nothing but the horizon row count)
    runProbe("dedup_stream", df =>
      graft.streaming.StreamingOps.dedupStream(df, Seq("user_id"),
        watermark = "1 hour"))

    // stream-stream interval join (r17): each side buffers only rows
    // inside the (watermark + lag) eligibility horizon — the probe
    // measures that buffer directly (and its eviction) at 100M events
    runProbeOn("attribution_join", () => {
      def shape(tpe: String, idAs: String, tsAs: String) = {
        val s = eventsStream()
        s.filter(col("event_type") === tpe).select(col("user_id"),
          col("event_id").as(idAs), col("ts").as(tsAs))
      }
      graft.streaming.StreamingOps.attributeStream(
        shape("view", "view_id", "view_ts"),
        shape("click", "click_id", "click_ts"),
        "user_id", "view_ts", "click_ts", maxLagMinutes = 240,
        watermark = "30 minutes")
    })

    // standing-query top-k: state O(k) per query, proven flat across batches
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
    val embSchema = emb.schema
    val embPath = new org.apache.hadoop.fs.Path(s"$sfDir/embeddings.parquet")
    val efs = embPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val estream =
      if (efs.getFileStatus(embPath).isDirectory)
        spark.readStream.schema(embSchema)
          .option("maxFilesPerTrigger", 64).parquet(embPath.toString)
      else spark.readStream.schema(embSchema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(embPath.getParent.toString)
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamingOps.standingQueryTopK(
        estream.select(col("vec_id").cast("long").as("row_id"), col("embedding")),
        queries, "embedding", "vec_id", "embedding", topK = 10,
        metric = graft.functions.VectorFunctions.metric("cos", 2.0))
      .writeStream.outputMode("update").format("noop")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(1800000)
    val sec = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress
    q.stop()
    val state = prog.flatMap(_.stateOperators)
    val maxRows = if (state.isEmpty) 0L else state.map(_.numRowsTotal).max
    println(f"""{"metric":"stream_state","op":"standing_topk_100q","sf":"$sfDir","batches":${prog.length},"input_rows":${prog.map(_.numInputRows).sum},"max_state_rows":$maxRows,"max_state_bytes":${if (state.isEmpty) 0L else state.map(_.memoryUsedBytes).max},"evicted_rows":${state.map(_.numRowsRemoved).sum},"sec":$sec%.1f,"loadavg":"${loadavg()}"}""")
    spark.stop()
  }
}

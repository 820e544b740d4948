package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-micro-batch cost breakdown for the streaming gates: runs the same
  * stream-stream interval join as q_stream_attribution(_ordered) and prints
  * each batch's StreamingQueryProgress.durationMs map (addBatch /
  * queryPlanning / walCommit / commitOffsets / getBatch / latestOffset /
  * triggerExecution) — the evidence for where a micro-batch's wall goes.
  *
  *   sbt "runMain graft.ProbeStreamCost <sfDir> [ordered]"
  */
object ProbeStreamCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ordered = args.length > 1 && args(1) == "ordered"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)
    if (sys.env.contains("PROBE_STREAM_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = System.nanoTime()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
          println(f"[probestage] t=${(System.nanoTime() - t0) / 1e9}%7.2f stage=${si.stageId}%4d tasks=${si.numTasks}%3d wall=${wall.getOrElse(-1L)}%5d ms run=${si.taskMetrics.executorRunTime}%6d ms  ${si.name.take(90)}")
        }
      })
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      def stream() =
        if (ordered) {
          val dir = SparkEntry.orderedReplayDirForProbe(spark, s"$sfDir/events.parquet", "ts", 4)
          spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1").parquet(dir)
        } else
          spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val views = stream().filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val clicks = stream().filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      val q = try {
        spark.conf.set("spark.sql.shuffle.partitions",
          sys.env.getOrElse("PROBE_STREAM_SHUFFLE", "8"))
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          sys.env.getOrElse("PROBE_STREAM_NODATA", "true"))
        graft.streaming.StreamingOps.attributeStream(views, clicks,
            "user_id", "view_ts", "click_ts", maxLagMinutes = 240)
          .writeStream.outputMode("append").format("memory")
          .queryName(s"probe_stream_cost_$rep")
          .trigger(Trigger.AvailableNow()).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      q.awaitTermination(300000)
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"[probestream] rep$rep ordered=$ordered wall=$wall%.2f s, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"[probestream]   batch=${p.batchId} rows=${p.numInputRows} durationMs=$d")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** One-off r16 scale probe: the streaming family's first sf100 reading.
  * Runs the q_stream_hourly shape (file source → hourly windowed agg →
  * complete-mode memory sink, AvailableNow) against the batch twin
  * (q_events_hourly), capturing wall-clock, micro-batch count, input
  * rows, and state-store size — once at the default file batching and
  * once forced multi-batch (maxFilesPerTrigger) so the state commit path
  * is actually exercised across batches. Deleted after its artifact is
  * committed (r15 probe hygiene). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/events.parquet").count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val batchTwin = math.min(
      time(noop(SparkEntry.queries("q_events_hourly")(spark, sfDir))),
      time(noop(SparkEntry.queries("q_events_hourly")(spark, sfDir))))

    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val srcPath = s"$sfDir/events.parquet"
    val srcIsDir = new java.io.File(srcPath).isDirectory
    def runStream(tag: String, maxFiles: Option[Int]): String = {
      val reader0 =
        if (srcIsDir) spark.readStream.schema(schema)
        else spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
      val reader = maxFiles.fold(reader0)(m =>
        reader0.option("maxFilesPerTrigger", m))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      val t0 = System.nanoTime()
      val q =
        try {
          spark.conf.set("spark.sql.shuffle.partitions", "8")
          graft.streaming.StreamingOps.hourlyEventStats(
            reader.parquet(if (srcIsDir) srcPath else sfDir))
            .writeStream.outputMode("complete").format("memory")
            .queryName(s"probe_sink_$tag")
            .trigger(Trigger.AvailableNow()).start()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      q.awaitTermination(1800000)
      val sec = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      val inputRows = progs.map(_.numInputRows).sum
      val st = progs.lastOption.flatMap(_.stateOperators.headOption)
      q.stop()
      val sinkRows = spark.table(s"probe_sink_$tag").count()
      s""""$tag":{"sec":$sec,"batches":${progs.length},""" +
        s""""input_rows":$inputRows,""" +
        s""""state_rows":${st.map(_.numRowsTotal).getOrElse(-1L)},""" +
        s""""state_mem_bytes":${st.map(_.memoryUsedBytes).getOrElse(-1L)},""" +
        s""""sink_rows":$sinkRows}"""
    }
    val dflt = runStream("default", None)
    val forced = runStream("multi8", Some(8))
    println(s"""{"metric":"stream_hourly_probe","sf":"$sfDir",""" +
      s""""batch_twin_sec":$batchTwin,$dflt,$forced}""")
    spark.stop()
  }
}

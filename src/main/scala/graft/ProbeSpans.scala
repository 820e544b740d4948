package graft

// throwaway probe (deleted after use): dedupSpans hot-gram split vs
// fallback on the BoilerGen heavy-hitter corpus (chrome 8-grams df~1000)
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(args.headOption.getOrElse("/tmp/boiler_5m") + "/documents.parquet")
    docs.count()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(tag: String)(f: => Unit): Unit = {
      clear()
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def run(minHotOcc: Long): Unit =
      graft.dedup.Dedup.dedupSpans(docs, "doc_id", "text", w = 8,
          minHotOcc = minHotOcc)
        .write.format("noop").mode("overwrite").save()
    // interleaved to control for JIT/IO warm-up drift between repeats
    time("warm (fallback)") { run(Long.MaxValue) }
    time("split A") { run(0L) }
    time("fallback A") { run(Long.MaxValue) }
    time("split B") { run(0L) }
    time("fallback B") { run(Long.MaxValue) }
    time("split C") { run(0L) }
    spark.stop()
  }
}

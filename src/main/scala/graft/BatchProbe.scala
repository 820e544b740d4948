package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off r16 scale probe: the |Q|~2000 batch-retrieval regime over the
  * exact searcher (single-k batch search and searchMulti's rank-filter
  * derivations), reported against the in-run zero-shuffle scan control
  * (text_bm25, min-of-2, control first — the standing probe protocol).
  * Deleted after its artifact is committed (r15 probe hygiene). */
object BatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val nQ = if (args.nonEmpty) args(0).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("documents", "embeddings").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count())
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(fn: => Unit): Double = {
      clearState()
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(fn: => Unit): Double = math.min(time(fn), time(fn))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val control = minOf2(noop(SparkEntry.queries("text_bm25")(spark, sfDir)))

    import graft.encoders.PassthroughEncoder
    import graft.search.{SearcherParams, SparkSearcher}
    // fit inside the timed block — same contract as the knn gates
    def fitted() = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos"))
      .fit(spark.read.parquet(s"$sfDir/embeddings.parquet"))
    def queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < nQ)

    val single = minOf2 {
      noop(fitted().search(queries, 10, keepRankNo = true,
        queryIdCol = Some("vec_id")))
    }
    val multi = minOf2 {
      val m = fitted().searchMulti(queries, Seq(3, 10), keepRankNo = true,
        queryIdCol = Some("vec_id"))
      m.toSeq.sortBy(_._1).foreach { case (_, df) => noop(df) }
    }
    println(s"""{"metric":"batch_regime","sf":"$sfDir","n_queries":$nQ,""" +
      s""""control_bm25":$control,"search_k10":$single,""" +
      s""""search_multi_3_10":$multi,"ratio_single":${single / control},""" +
      s""""ratio_multi":${multi / control}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe (r19): does the fit-path cache hand-off (persist
  * `indexed`, then unpersist its parent `pre`) leave searches hitting
  * the index cache? Companion to [[ProbeUnionCache]] — the same
  * parent-unpersist hazard, tested on the real searcher. */
object ProbeFitCache {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)
    import graft.search.{SearcherParams, SparkSearcher}
    import graft.encoders.PassthroughEncoder
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    for (param <- Seq("IVF16", "PQ8", "Flat")) {
      val model = new SparkSearcher(new PassthroughEncoder("embedding"),
        SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
          measurement = "cos", indexParam = param)).fit(emb)
      val s1 = model.search(q, 5, queryIdCol = Some("vec_id"))
      val (_, t1) = timed(s1.count())
      val imts1 = "InMemoryTableScan".r
        .findAllIn(s1.queryExecution.executedPlan.toString).size
      val s2 = model.search(q, 5, queryIdCol = Some("vec_id"))
      val (_, t2) = timed(s2.count())
      val imts2 = "InMemoryTableScan".r
        .findAllIn(s2.queryExecution.executedPlan.toString).size
      println(f"$param%-6s search1=$t1%.2f s (IMTS=$imts1) search2=$t2%.2f s (IMTS=$imts2)")
      model.unpersist()
    }
    spark.stop()
  }
}

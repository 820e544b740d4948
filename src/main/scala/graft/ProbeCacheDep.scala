package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe behind the r19 incremental-index cache-hand-off fix
  * (cited by BASELINE.md): times each generation of a
  * persist-union-unpersist chain mirroring SearcherModel.add()'s
  * pre-r19 shape. Companion [[ProbeUnionCache]] pins the mechanism on
  * the plans: unpersisting a parent drops the dependent union-cache's
  * manager entry, so the NEXT generation's plan misses it and replays
  * the lineage (visible here as c2_build ≈ recompute while
  * c1_after_parent_unpersist stays cached). */
object ProbeCacheDep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // expensive "fit": a wide shuffle
    val fit = spark.range(30000000L)
      .select(col("id"), pmod(col("id") * 7, lit(1000000)).as("k"))
      .groupBy("k").agg(sum(col("id")).as("s"))
      .persist()
    val (_, tFit) = timed(fit.count())
    // cheap typed "segment" parts (mapPartitions like buildGraphs)
    import spark.implicits._
    def part(tag: Long) = spark.range(1000L)
      .select((col("id") + lit(tag * 10000000L)).as("k"), col("id").as("s"))
      .as[(Long, Long)].mapPartitions(it => it.map(identity)).toDF("k", "s")
    // add 1: union + persist + count + unpersist parent (pre-r19 shape)
    val c1 = fit.unionByName(part(1)).persist()
    val (_, tC1) = timed(c1.count())
    fit.unpersist()
    val (_, tC1b) = timed(c1.count())   // parent gone: still cached?
    // add 2: same shape on the grown frame
    val c2 = c1.unionByName(part(2)).persist()
    val scans2 = c2.queryExecution.executedPlan.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s
    }.size
    System.err.println(s"c2 InMemoryTableScans in plan: $scans2")
    val (_, tC2) = timed(c2.count())    // does this reuse c1's cache?
    c1.unpersist()
    val (_, tC2b) = timed(c2.count())
    val c3 = c2.unionByName(part(3)).persist()
    val (_, tC3) = timed(c3.count())
    println(f"fit=$tFit%.2f c1_build=$tC1%.2f c1_after_parent_unpersist=$tC1b%.3f " +
      f"c2_build=$tC2%.2f c2_after=$tC2b%.3f c3_build=$tC3%.2f")
    spark.stop()
  }
}

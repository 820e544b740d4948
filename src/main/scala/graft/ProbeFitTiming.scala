package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-side fit timing decomposition: times the pieces of a PQ/OPQ fit
  * (sample collect, per-subspace Lloyd, rotation moments/eig) that the
  * r21 job profile showed as "driver gap" on the code-family gates.
  *
  *   sbt "runMain graft.ProbeFitTiming <sfDir>"
  */
object ProbeFitTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    emb.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probefit] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"[probefit] === rep $rep ===")
      val pre = emb.select(col("vec_id").as("row_id"),
        graft.functions.VectorFunctions.vec_l2_normalize(col("embedding")).as("__vec"))
      val sample = t("sample collect") {
        pre.select(col("__vec")).collect().map(_.getSeq[Float](0).toArray)
      }
      val d = sample(0).length
      val m = 8
      t("PQ fitCodebooks (m=8, 256 cents, 10 it)") {
        graft.search.PqIndex.fitCodebooks(pre, "__vec", m, d, sample.length.toLong)
      }
      t("OPQ fitRotation") {
        graft.search.OpqIndex.fitRotation(pre, "__vec", d, m)
      }
      t("IVF fitCentroids nlist=16") {
        graft.search.IvfIndex.fitCentroids(pre, "__vec", 16, sample.length.toLong)
      }
    }
    spark.stop()
  }
}

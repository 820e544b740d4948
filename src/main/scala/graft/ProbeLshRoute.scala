package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot: what does LSH0 resolve to at the given sf for a batch hint,
  * and which route (buckets/exact) will the r18 resolver serve? */
object ProbeLshRoute {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)
    import graft.search.{SearcherParams, SparkSearcher}
    import graft.encoders.PassthroughEncoder
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (hint <- args.map(_.toInt)) {
      val m = new SparkSearcher(new PassthroughEncoder("embedding"),
        SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
          measurement = "cos", indexParam = "LSH0", lshBatchHint = hint)).fit(emb)
      val row = m.describe.select("lsh_tables", "lsh_bits", "lsh_exact_cheaper",
        "lsh_route").head()
      println(s"""PROBE {"sf":"$sfDir","hint":$hint,"tables":${row.getInt(0)},"bits":${row.getInt(1)},"exact_cheaper":${row.getBoolean(2)},"route":"${row.getString(3)}"}""")
      m.unpersist()
    }
    spark.stop()
  }
}

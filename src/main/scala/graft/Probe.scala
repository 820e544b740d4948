package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.encoders.PassthroughEncoder
import graft.search.{SparkSearcher, SearcherParams}

/** Throwaway stats probe (deleted before round close). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
      measurement = "cos")
    def topPairs(p: SearcherParams): Set[(Long, Long)] = {
      val model = new SparkSearcher(new PassthroughEncoder("embedding"), p).fit(emb)
      val res = model.search(emb.filter(col("vec_id") < 50), 10,
        keepRankNo = true, queryIdCol = Some("vec_id"))
        .select(col("vec_id").cast("long"), col("sim_item").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      model.unpersist()
      res
    }
    val truth = topPairs(base)
    for (ip <- Seq("LSH0", "LSH12", "LSH0x8")) {
      val t0 = System.nanoTime()
      val got = topPairs(base.copy(indexParam = ip))
      val rec = (truth intersect got).size.toDouble / truth.size
      println(f"[probe] $ip recall@10 = $rec%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-probe data generator: replicates the driver's sf0.1 tables `copies`×
 * with referentially-consistent key shifts (copy i adds `i·10⁹` to every
 * key/foreign-key), producing an sf1-equivalent dataset for headroom
 * measurement (BASELINE.md scale table). Deterministic — no RNG:
 *
 *  - dimension tables (region, nation) keep their TPC-H-fixed cardinality;
 *  - documents get a per-copy two-token suffix so copies are neither exact
 *    nor near duplicates (dedup selectivity stays realistic instead of
 *    every doc gaining 9 clones);
 *  - embeddings get a small deterministic per-copy, per-dimension offset
 *    for the same reason (near-dup/ANN density, not 10-way ties).
 *
 * Usage: runMain graft.ScaleGen <srcDir> <outDir> <copies>
 */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val SHIFT = 1000000000L

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dimensions: fixed cardinality at every scale (TPC-H semantics)
    write(read("region"), "region")
    write(read("nation"), "nation")

    def scaled(t: String, keyCols: Seq[String])(extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val base = keyCols.foldLeft(read(t))((d, c) =>
          d.withColumn(c, col(c) + lit(i * SHIFT)))
        extra(base, i)
      }.reduce(_ unionByName _)

    write(scaled("customer", Seq("c_custkey"))(), "customer")
    write(scaled("supplier", Seq("s_suppkey"))(), "supplier")
    write(scaled("part", Seq("p_partkey"))(), "part")
    write(scaled("orders", Seq("o_orderkey", "o_custkey"))(), "orders")
    write(scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))(), "lineitem")
    write(scaled("events", Seq("event_id", "user_id"))(), "events")
    write(scaled("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" zcopy$i zz$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")
    write(scaled("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, pos) =>
          (x + lit(i * 0.0013f) * (pmod(pos, lit(7)) - lit(3)).cast("float"))
            .cast("float")))
    }, "embeddings")
    println(s"[scalegen] wrote $copies x $src -> $out")
    spark.stop()
  }
}

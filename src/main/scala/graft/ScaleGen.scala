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
 *  - documents interleave a copy-specific marker token after every 4th
 *    word (and after the last word, covering short docs), capping
 *    copy-pair shingle Jaccard well below near-dup thresholds — copies
 *    are ordinary distinct documents, not a 10-way clone cluster;
 *  - embeddings add deterministic hash-uniform noise of ~10× the signal
 *    energy per copy for the same reason (cos(copy, original) ≈ 0.3).
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
    // copies must be neither exact nor NEAR duplicates of each other, or
    // the probe measures an every-doc-has-9-clones corpus instead of a
    // bigger one. A 2-token suffix is NOT enough (54-token median docs ⇒
    // copy-pair Jaccard ≈ 0.93 ≫ the 0.5 dedup threshold); interleaving a
    // copy-specific marker after every 4th word caps shared w=3 shingles
    // at the intra-run windows: J ≈ 0.5T / (1.75T) ≈ 0.29 < 0.5
    // the marker also lands after the LAST word: a 1–3-token doc would
    // otherwise get no marker and its copies would stay exact duplicates
    write(scaled("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", array_join(
          transform(split(col("text"), "\\s+"), (w, p) =>
            when(pmod(p, lit(4)) === 3 ||
                 p === size(split(col("text"), "\\s+")) - 1,
              concat(w, lit(s" zc$i"))).otherwise(w)),
          " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")
    // same requirement for vectors: a ±0.001-per-dim offset left
    // cos(copy0, copy9) ≈ 0.98 ≫ the 0.4 near-dup threshold. Add
    // deterministic hash-uniform noise of ~10× the signal energy
    // (unit-norm dim-64 inputs): cos(copy, original) ≈ 0.3, copies are
    // ordinary distinct vectors, not a 10-way clone cluster
    write(scaled("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, pos) =>
          (x + (pmod(hash(col("vec_id"), pos, lit(i)), lit(1000))
            .cast("double") / 1000.0 - 0.5) * 1.4).cast("float")))
    }, "embeddings")
    println(s"[scalegen] wrote $copies x $src -> $out")
    spark.stop()
  }
}

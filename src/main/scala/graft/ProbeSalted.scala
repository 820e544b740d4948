package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Salted-join shape probe: isolates WHERE the combined auto gate's time
 * goes at scale. Variants over the same pre-agg'd big side (lineitem
 * grouped to one row per l_orderkey) joined to orders:
 *
 *  - fixed4_hash    r18 twin replica: saltBuckets=4, hash build, no cache
 *  - b1_hash        structural buckets=1 (one-row-per-key ⇒ uniform),
 *                   hash build, NO cache — zero measurement scans
 *  - b1_hash_cache24  current gate shape: persist the pre-agg (partial
 *                   sums DECIMAL(24,4) — precision > 18 ⇒ BigDecimal-
 *                   backed cache) + measured overload + hash build
 *  - b1_hash_cache18  same but partials DECIMAL(18,4) — long-backed
 *                   cache (per-key partial ≤ ~7·1e5, no overflow; the
 *                   final sum auto-widens, values bit-identical)
 *  - overload_nocache measured overload on the UNPERSISTED pre-agg
 *                   (pre-agg computed twice) + hash build
 *
 * Control (text_bm25) first per the scale-probe protocol.
 */
object ProbeSalted {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions(it => Iterator.single {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      }).collect().sum
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (_, controlSec) = timed(drain(
      graft.text.Relevance.bm25(docs, "doc_id", "text", Seq("vector", "spark", "dup"))))

    def liAgg(prec: Int) = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__cnt"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(prec, 4))).as("__rev"))
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    def finish(j: org.apache.spark.sql.DataFrame) = j
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("__cnt")).as("n"),
        sum(col("__rev")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")

    val variants = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "fixed4_hash" -> (() => finish(graft.operators.Relational.saltedEquiJoin(
        liAgg(24), orders, "l_orderkey", "o_orderkey", 4, buildHash = "big"))),
      "b1_hash" -> (() => finish(graft.operators.Relational.saltedEquiJoin(
        liAgg(24), orders, "l_orderkey", "o_orderkey", 1, buildHash = "big"))),
      "b1_hash_cache24" -> (() => {
        val a = liAgg(24).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b = graft.operators.Relational.resolveSaltBucketsFromPreAgg(a, "__cnt")
        finish(graft.operators.Relational.saltedEquiJoin(
          a, orders, "l_orderkey", "o_orderkey", b, buildHash = "big"))
      }),
      "b1_hash_cache18" -> (() => {
        val a = liAgg(18).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b = graft.operators.Relational.resolveSaltBucketsFromPreAgg(a, "__cnt")
        finish(graft.operators.Relational.saltedEquiJoin(
          a, orders, "l_orderkey", "o_orderkey", b, buildHash = "big"))
      }),
      "overload_nocache" -> (() => {
        val a = liAgg(24)
        val b = graft.operators.Relational.resolveSaltBucketsFromPreAgg(a, "__cnt")
        finish(graft.operators.Relational.saltedEquiJoin(
          a, orders, "l_orderkey", "o_orderkey", b, buildHash = "big"))
      }),
      // the shipped gate itself, exactly as Bench/Verify run it
      "gate_fn" -> (() =>
        SparkEntry.queries("q_salted_join_auto")(spark, sfDir)))
    // INTERLEAVED passes, min per variant (the established A/B protocol:
    // this box swings ±2× on heavy shapes within a window while the
    // control stays flat, so single readings cannot rank variants)
    val passes = 2
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val all = scala.collection.mutable.LinkedHashMap.empty[String,
      scala.collection.mutable.ArrayBuffer[Double]]
    for (_ <- 1 to passes; (name, mk) <- variants) {
      clearState()
      val (_, sec) = timed(drain(mk()))
      mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), sec)
      all.getOrElseUpdate(name,
        scala.collection.mutable.ArrayBuffer.empty[Double]) += sec
    }
    val parts = mins.map { case (name, sec) =>
      f""""$name":{"sec":$sec%.3f,"ratio":${sec / controlSec}%.3f,"runs":[${all(name).map(s => f"$s%.1f").mkString(",")}]}"""
    }
    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"salted_variants","sf":"$sfDir","control_bm25":$controlSec%.3f,${parts.mkString(",")},"loadavg":"$load"}""")
    spark.stop()
  }
}

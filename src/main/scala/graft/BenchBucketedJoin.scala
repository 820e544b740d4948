package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Bucketed-join write/read split probe. The q_bucketed_join gate re-pays
 * the one-time bucketed WRITE on every run, so its headline number
 * conflates write cost with the exchange-free join the gate exists to
 * prove. Production amortizes the write (bucketing is a table layout you
 * pay at ingest); the number that matters at scale is the JOIN-ONLY cost
 * against the already-bucketed tables. This main measures both legs
 * separately — write once, then min-of-N join-only runs — with the
 * standing zero-shuffle control (text_bm25) first per the scale-probe
 * protocol, and prints one JSON line for BASELINE.md.
 *
 * The join leg asserts the exchange-free shape it claims to measure: the
 * physical plan must contain no Exchange (bucketed scan feeds SMJ
 * directly on both sides).
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchBucketedJoin [joinRuns]   (default 3)
 */
object BenchBucketedJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val joinRuns = if (args.nonEmpty) args(0).toInt else 3
    val warehouse = java.nio.file.Files.createTempDirectory("graft-bktwh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", warehouse)
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

    // control FIRST (fresh JVM): all sf100 readings are ratios to this
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (_, controlSec) = timed(drain(
      graft.text.Relevance.bm25(docs, "doc_id", "text", Seq("vector", "spark", "dup"))))

    // leg 1 — the ONE-TIME bucketed write (same shape as the gate:
    // pre-repartition on the bucket key so each task holds one bucket)
    val buckets = math.max(8, spark.sparkContext.defaultParallelism)
    val (_, writeSec) = timed {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .repartition(buckets, col("l_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed_probe")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .repartition(buckets, col("o_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed_probe")
    }

    // leg 2 — join-only, min over N runs against the persisted layout
    def joinOnly = spark.table("li_bucketed_probe").hint("merge")
      .join(spark.table("ord_bucketed_probe"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(20, 2))).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
    // assert the shape the probe claims: zero exchanges BELOW the join —
    // both sides feed the SMJ straight from the bucketed scans. (The
    // final 5-group aggregate above the join keeps its one-row-per-task
    // exchange; that is not what bucketing exists to remove.) Collected
    // off the physical NODES, not plan-string layout (ADVICE r18: the
    // substring scan depended on top-down print order and could
    // false-trip on AQE/ReusedExchange spellings) — same refactor as
    // SearcherSpec's rowIdJoins.
    locally {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.Exchange
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      // the PRE-AQE physical plan (ADVICE r19): with AQE on (the 4.x
      // default — and this query has exchanges above the join),
      // executedPlan is an AdaptiveSparkPlanExec LEAF whose collect sees
      // no children, so the SMJ assertion would false-trip on zero
      // matches. sparkPlan is never wrapped, and bucketed scans feed the
      // SMJ exchange-free in it iff they do in the adaptive final plan
      // (AQE re-optimizes around exchanges; it cannot introduce one
      // below a join whose sides are already co-partitioned by layout)
      val plan = joinOnly.queryExecution.sparkPlan
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      def exchanges(p: SparkPlan): Seq[Exchange] =
        p.collect { case e: Exchange => e }
      require(smjs.nonEmpty &&
          smjs.forall(j => j.children.forall(c => exchanges(c).isEmpty)),
        s"bucketed join sides are not exchange-free:\n$plan")
    }
    val runs = (1 to joinRuns).map(_ => timed(drain(joinOnly))._2)
    val joinSec = runs.min
    val rows = drain(joinOnly)

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"bucketed_join_split","sf":"$sfDir","buckets":$buckets,"control_bm25":$controlSec%.3f,"write_once_sec":$writeSec%.3f,"join_only_sec":$joinSec%.3f,"join_runs":[${runs.map(r => f"$r%.3f").mkString(",")}],"ratio_write":${writeSec / controlSec}%.3f,"ratio_join":${joinSec / controlSec}%.3f,"rows":$rows,"loadavg":"$load"}""")
    spark.stop()
  }
}

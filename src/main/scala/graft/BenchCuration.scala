package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Composed-curation probe: pipeline_curation / pipeline_curation_v2 at
 * scale. Every stage kernel (quality, langid, gopher, span dedup,
 * chunking, exact dedup) is individually measured sub-control at sf100,
 * but the product story for a training-data pipeline is the COMPOSED
 * run — filters feeding dedup feeding chunking in one plan — and no
 * artifact ran that composition at scale before r19. This main runs the
 * standing zero-shuffle control (text_bm25) first per the scale-probe
 * protocol, then each composed pipeline, then the v2 STAGES separately
 * (rule filter alone; + span dedup; + chunking) so any super-linear
 * stage is named by measurement, not guessed.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchCuration
 */
object BenchCuration {
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

    import graft.dedup.Dedup
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    // control FIRST (fresh JVM): all readings are ratios to this
    val (_, controlSec) = timed(drain(
      graft.text.Relevance.bm25(docs, "doc_id", "text", Seq("vector", "spark", "dup"))))

    // composed v1: quality + langid filter -> exact text dedup -> summary
    val (_, v1Sec) = timed(drain {
      val scored = docs.select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langId(col("text")).as("lang"))
        .filter(col("quality") >= 0.5 && col("lang") === "en")
      scored.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
          min(col("quality")).as("quality"))
        .agg(count(lit(1)).as("n_docs"), sum(col("keep_id")).as("sum_keep_id"),
          sum(col("n_copies")).as("n_before_dedup"),
          sum(col("quality").cast(DecimalType(20, 10))).cast("double")
            .as("sum_quality"))
    })

    // v2 stages, measured cumulatively so each increment is attributable:
    // (a) gopher rule filter alone
    def kept = docs.select(col("doc_id"), col("text"),
        TextAnalysis.gopherFlags(col("text")).as("g"))
      .filter(col("g.word_count_ok") === 1 && col("g.mean_len_ok") === 1)
      .select("doc_id", "text")
    val (keptRows, filterSec) = timed(drain(kept))
    // (b) + span-level dedup over the survivors
    val (_, dedupSec) = timed(drain(Dedup.dedupSpans(kept, "doc_id", "text", w = 8)))
    // (c) the full composed v2: filter -> span dedup -> chunking -> summary
    val (_, v2Sec) = timed(drain {
      val cleaned = Dedup.dedupSpans(kept, "doc_id", "text", w = 8)
      TextAnalysis.chunkByTokens(cleaned, "doc_id", "text_dedup",
          maxTokens = 32, overlap = 8)
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"))
    })

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"curation_composed","sf":"$sfDir","n_docs":$nDocs,"control_bm25":$controlSec%.3f,"v1_sec":$v1Sec%.3f,"ratio_v1":${v1Sec / controlSec}%.3f,"v2_filter_sec":$filterSec%.3f,"v2_filter_dedup_sec":$dedupSec%.3f,"v2_full_sec":$v2Sec%.3f,"ratio_v2":${v2Sec / controlSec}%.3f,"kept_rows":$keptRows,"loadavg":"$load"}""")
    spark.stop()
  }
}

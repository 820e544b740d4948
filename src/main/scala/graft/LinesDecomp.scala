package graft

// THROWAWAY decomposition probe for the r15 dedup_lines task — deleted
// after the artifact is committed (the Probe.scala discipline).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSql.{column => toCol, expression => toExpr}
import graft.dedup.{Dedup, LineHashesExpr}

object LinesDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def time(name: String)(f: => Unit): Unit = {
      clearState()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = sec
      System.err.println(f"[decomp] $name%-28s $sec%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the dedup_lines gate's 10-token pseudo-line reshape, verbatim
    def reshaped() = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val toks = filter(split(col("text"), " "), t => length(t) > 0)
      val nl = floor((size(toks) + lit(9)) / lit(10)).cast("int")
      docs.select(col("doc_id"),
        when(col("text").isNull, lit(null).cast("string"))
          .when(size(toks) === 0, lit(""))
          .otherwise(array_join(transform(sequence(lit(0), nl - 1),
            i => array_join(slice(toks, i * 10 + 1, lit(10)), " ")), "\n"))
          .as("text"))
    }

    // control: one bare scan of the text column
    time("scan_only") { noop(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))) }
    // one full pass of the harness reshape
    time("reshape_noop") { noop(reshaped()) }
    // narrow build, no persist: kernel + 250M-row Generate
    def narrowDf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(toCol(LineHashesExpr(toExpr(col("text")), "\n", 8)))
            .as("__plh"))
        .select(col("doc_id"), col("__plh.pos").as("pos"),
          col("__plh.lh").as("lh"))
    time("narrow_noop") { noop(narrowDf(reshaped())) }
    // narrow persist + first-occurrence candidate agg
    time("narrow_persist_cand") {
      val n = narrowDf(reshaped())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = n.groupBy(col("lh"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("__f"),
          count(lit(1)).as("__cnt"))
        .filter(col("__cnt") > 1)
      noop(cand)
      n.unpersist(blocking = false)
    }
    // the input-persist hypothesis: write the reshape once, scan it 3x
    time("in_persist_3_scans") {
      val in = reshaped()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(in); noop(in); noop(in)
      in.unpersist(blocking = false)
    }
    // full operator as shipped (narrow path auto-triggers at this size)
    time("full_dedup_lines") {
      noop(Dedup.dedupLines(reshaped(), "doc_id", "text", minLen = 8))
    }
    val json = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_r15_sf100_linesdecomp.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (s"""{"metric":"lines_decomp","stages":$json,"sf":"$sfDir"}""" + "\n").getBytes("UTF-8"))
    println(s"""{"metric":"lines_decomp","stages":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}

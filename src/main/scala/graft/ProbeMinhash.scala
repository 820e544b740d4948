package graft

// throwaway probe (deleted after use): decompose dedup_minhash's sf100
// cost into kernel pass / banded candidates / full verify
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(args.headOption.getOrElse("/tmp/graft_sf100") + "/documents.parquet")
    docs.count()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(tag: String)(f: => Unit): Unit = {
      clear()
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    import org.apache.spark.sql.graftshim.GraftSql.{column => toCol, expression => toExpr}
    val (coefA, coefB) = graft.dedup.Dedup.minHashCoefficients(64)
    def sigPass(): Unit = docs.select(col("doc_id"),
        toCol(graft.dedup.ShingleStatsExpr(
          toExpr(col("text")), 5, coefA, coefB)).as("st"))
      .select(col("doc_id"), col("st.sz").as("sz"), col("st.sig").as("sig"))
      .filter(col("sz") > 0)
      .write.format("noop").mode("overwrite").save()
    def cands(): Unit = graft.dedup.Dedup.minHashCandidates(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    def full(): Unit = graft.dedup.Dedup.minHashNearDups(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 2) {
      time(s"sig pass only    r$rep") { sigPass() }
      time(s"banded candidates r$rep") { cands() }
      time(s"full near-dups    r$rep") { full() }
    }
    spark.stop()
  }
}

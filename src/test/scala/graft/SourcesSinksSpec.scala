package graft

import org.apache.spark.sql.functions._

/** Source/sink breadth (SURVEY §2.2 scans/sinks): the searcher's tables and
  * results round-trip through parquet, CSV and JSON — the reference's CSV
  * items flow (README.md:30 `pd.read_csv`) replayed on Spark sources. */
class SourcesSinksSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-io").toString

  test("CSV round-trip of an items table feeds the searcher (README.md:30)") {
    val docs = sf("documents").select("text", "doc_id", "lang")
    val dir = tmp()
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(docs.schema).csv(dir)
    assert(back.count() === docs.count())
    val model = new graft.search.SparkSearcher(new graft.encoders.HashEncoder(32),
      graft.search.SearcherParams()).fit(back)
    val res = model.search(back.limit(2), topK = 1, keepRankNo = true)
    assert(res.count() === 2)
    model.unpersist()
  }

  test("JSON sink/source round-trip of search results") {
    val res = SparkEntry.queries("knn_cos_top10")(spark, "/root/testdata/sf0.001")
    val dir = tmp()
    res.write.mode("overwrite").json(dir)
    val back = spark.read.schema(res.schema).json(dir)
    assert(back.orderBy("source_id", "rank_no").collect()
      === res.orderBy("source_id", "rank_no").collect())
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = tmp()
    sf("documents").write.mode("overwrite")
      .partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(one.count() > 0)
  }
}

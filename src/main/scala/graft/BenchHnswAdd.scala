package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * HNSW incremental-`add` vs refit probe. The amortized-serving story
 * (BENCH_r17_sf100_loadedbatch_hnsw: 0.13× control per batch) rests on a
 * 190–250 s one-time graph fit at 2M vectors; the segment-style `add`
 * path (faiss `index.add` semantics, reference faiss_searcher.py:124 —
 * fresh graphs for the appended rows, Lucene segment shape) is the
 * cheap alternative when a corpus GROWS. This probe measures the real
 * trade at scale: fit 90% + save + load + add 10% (the deployment
 * sequence) vs a full refit on 100%, then recall@10 of BOTH indexes
 * against the exact top-k on the union corpus at the SAME auto-resolved
 * beam — so the output is the guidance line: what `add` costs, what it
 * saves, and what recall it gives up by splitting the appended rows
 * into their own segment graphs.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchHnswAdd [addFraction] [nQueries]   (default 0.1 64)
 */
object BenchHnswAdd {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val addFrac = if (args.length > 0) args(0).toDouble else 0.1
    val nQ = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    import graft.search.{SearcherParams, SparkSearcher, SearcherModel}
    import graft.encoders.PassthroughEncoder
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    // split on the id QUANTILE, not n·frac — scale-generated corpora
    // spread vec_id over a sparse range (sf100 max id ≈ 1e12 for 2M
    // rows), so a dense-id cut would select a sliver
    val cut = emb.stat.approxQuantile("vec_id", Array(1.0 - addFrac), 0.0001).head
    val oldRows = emb.filter(col("vec_id") < cut)
    val newRows = emb.filter(col("vec_id") >= cut)
    val (nOld, nNew) = (oldRows.count(), newRows.count())
    def params = SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
      measurement = "cos", indexParam = "HNSW32", efSearch = 0)
    def searcher = new SparkSearcher(new PassthroughEncoder("embedding"), params)

    // deployment sequence: fit the standing 90% once...
    val (m90, fit90Sec) = timed(searcher.fit(oldRows))
    val path = java.nio.file.Files.createTempDirectory("graft-hnswadd").toString
    m90.save(path); m90.unpersist()
    // ...and grow the LOADED index by the new arrivals (segment graphs)
    val (loaded, loadSec) = timed(
      SparkSearcher.load(spark, path, new PassthroughEncoder("embedding")))
    val (grown, addSec) = timed {
      val g = loaded.add(newRows)
      g.search(emb.filter(col("vec_id") < 1), 1, queryIdCol = Some("vec_id"))
        .count() // materialize the union index before the clock stops
      g
    }
    // the alternative: throw the graph away and refit everything
    val (refit, refitSec) = timed {
      val m = searcher.fit(emb)
      m.search(emb.filter(col("vec_id") < 1), 1, queryIdCol = Some("vec_id"))
        .count()
      m
    }

    // recall@10 vs exact on the union corpus, same query sample
    val q = emb.filter(col("vec_id") < nQ)
    val exact = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos")).fit(emb)
    def hits(m: SearcherModel): Map[Long, Set[Long]] = m
      .search(q, 10, keepRankNo = true, queryIdCol = Some("vec_id"))
      .select(col("vec_id").cast("long"), col("sim_item").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val truth = hits(exact)
    def recall(m: SearcherModel): Double = {
      val h = hits(m)
      truth.map { case (k, t) =>
        h.getOrElse(k, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    val (grownRecall, grownSearchSec) = timed(recall(grown))
    val (refitRecall, refitSearchSec) = timed(recall(refit))

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"hnsw_add_vs_refit","sf":"$sfDir","n":$n,"n_old":$nOld,"n_new":$nNew,"add_fraction":$addFrac,"n_queries":$nQ,"fit90_sec":$fit90Sec%.3f,"load_sec":$loadSec%.3f,"add_sec":$addSec%.3f,"refit_sec":$refitSec%.3f,"grown_recall_at10":$grownRecall%.4f,"refit_recall_at10":$refitRecall%.4f,"grown_search_sec":$grownSearchSec%.3f,"refit_search_sec":$refitSearchSec%.3f,"loadavg":"$load"}""")
    spark.stop()
  }
}

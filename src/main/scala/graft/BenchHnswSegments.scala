package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * HNSW segment-DECAY probe: the r18 add-vs-refit artifact measured ONE
 * +10% segment (13.8× cheaper than refit at equal recall); this probe
 * measures what repeated adds do — recall@10 and batched-search latency
 * vs SEGMENT COUNT as a fitted graph grows in `stepFrac`-of-the-corpus
 * increments — and then what `compact()` buys: one graph rebuild
 * back into the fitted layout, with post-compact recall/latency on the
 * same queries. Per-graph beam economics are the mechanism under test:
 * every graph is searched at the full beam, so cost scales with graph
 * count while each appended segment holds only its slice.
 *
 * Reference anchor: faiss index.add semantics (faiss_searcher.py:124);
 * the compaction step is the Lucene forceMerge analog.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchHnswSegments [baseFrac] [stepFrac] [steps] [nQueries]
 *   (defaults 0.5 0.05 10 64)
 */
object BenchHnswSegments {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val baseFrac = if (args.length > 0) args(0).toDouble else 0.5
    val stepFrac = if (args.length > 1) args(1).toDouble else 0.05
    val steps = if (args.length > 2) args(2).toInt else 10
    val nQ = if (args.length > 3) args(3).toInt else 64
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
    // split on id QUANTILES (scale-generated ids are sparse): base corpus
    // then `steps` contiguous increments of stepFrac each
    val fracs = (1 to steps).map(i => baseFrac + i * stepFrac)
      .filter(_ < 1.0).toArray
    val cuts = emb.stat.approxQuantile("vec_id",
      Array(baseFrac) ++ fracs, 0.0001)
    val baseCut = cuts.head
    val base = emb.filter(col("vec_id") < baseCut)
    def sliceAt(i: Int) = { // increment i (1-based): [cuts(i-1), cuts(i))
      val lo = cuts(i - 1)
      if (i < cuts.length) emb.filter(col("vec_id") >= lo && col("vec_id") < cuts(i))
      else emb.filter(col("vec_id") >= lo)
    }
    val params = SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
      measurement = "cos", indexParam = "HNSW32", efSearch = 0)
    val (m0, fitSec) = timed(new SparkSearcher(
      new PassthroughEncoder("embedding"), params).fit(base))
    val nBase = m0.count

    // fixed query sample from the BASE corpus (present at every step)
    val q = emb.filter(col("vec_id") < nQ).persist()
    q.count()
    def hits(m: SearcherModel): Map[Long, Set[Long]] = m
      .search(q, 10, keepRankNo = true, queryIdCol = Some("vec_id"))
      .select(col("vec_id").cast("long"), col("sim_item").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    def recallVs(truth: Map[Long, Set[Long]], m: SearcherModel): Double = {
      val h = hits(m)
      truth.map { case (k, t) =>
        h.getOrElse(k, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    // exact truth over a given corpus prefix (no training — fit = cache)
    def truthOver(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val ex = new SparkSearcher(new PassthroughEncoder("embedding"),
        SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
          measurement = "cos")).fit(df)
      val t = hits(ex); ex.unpersist(); t
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    var model = m0
    var corpus = base
    val nSteps = math.min(steps, cuts.length - 1 + 1) // last slice open-ended
    for (i <- 1 to nSteps) {
      val inc = sliceAt(i)
      val (grown, addSec) = timed {
        val g = model.add(inc)
        g.search(q.limit(1), 1, queryIdCol = Some("vec_id")).count()
        g
      }
      model = grown
      corpus = if (i < cuts.length) emb.filter(col("vec_id") < cuts(i)) else emb
      val truth = truthOver(corpus)
      val (rec, searchSec) = timed(recallVs(truth, model))
      rows += f"""{"step":$i,"n":${model.count},"add_sec":$addSec%.3f,"recall_at10":$rec%.4f,"search_sec":$searchSec%.3f}"""
    }
    // compact: one rebuild back to the fitted layout, same truth/queries
    val finalTruth = truthOver(corpus)
    val (preRec, preSec) = timed(recallVs(finalTruth, model))
    val (compacted, compactSec) = timed {
      val cm = model.compact()
      cm.search(q.limit(1), 1, queryIdCol = Some("vec_id")).count()
      cm
    }
    val (postRec, postSec) = timed(recallVs(finalTruth, compacted))

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"hnsw_segment_decay","sf":"$sfDir","n_base":$nBase,"fit_sec":$fitSec%.3f,"base_frac":$baseFrac,"step_frac":$stepFrac,"n_queries":$nQ,"steps":[${rows.mkString(",")}],"pre_compact":{"recall_at10":$preRec%.4f,"search_sec":$preSec%.3f},"compact_sec":$compactSec%.3f,"post_compact":{"n":${compacted.count},"recall_at10":$postRec%.4f,"search_sec":$postSec%.3f},"loadavg":"$load"}""")
    spark.stop()
  }
}

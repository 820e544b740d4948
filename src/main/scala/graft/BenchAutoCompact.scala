package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Merge-POLICY probe (r20): the r19 segment ladder (BenchHnswSegments)
 * measured what UNBOUNDED add() growth does — batch latency ~linear in
 * graph count (1.15 → 3.26 s over 11× graphs at 2M) — and what a MANUAL
 * `compact()` buys back. This probe runs the same ladder with the
 * opt-in policy (`SearcherParams.autoCompactAtSegmentRatio`) active and
 * measures the operating property the knob exists to buy: per-batch
 * search latency stays BOUNDED across repeated adds because add()
 * compacts inline whenever segment rows reach ratio × fitted rows — the
 * Lucene TieredMergePolicy analog over the partition-local graph index.
 *
 * Per step: add wall (INCLUDING any in-add compact — the policy's cost
 * lands inside the add that trips it), graph count and the
 * compact_recommended flag from `describe()` (which this probe also
 * exercises at scale), and the batch search wall. A final recall@10 vs
 * the exact scan anchors quality. Reference anchor: faiss index.add
 * semantics (faiss_searcher.py:124); Lucene merge policies are policy
 * objects, not warnings — this is the graft analog.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
 *   graft.BenchAutoCompact [baseFrac] [stepFrac] [steps] [nQueries] [ratio]
 *   (defaults 0.5 0.05 10 64 0.25)
 */
object BenchAutoCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val baseFrac = if (args.length > 0) args(0).toDouble else 0.5
    val stepFrac = if (args.length > 1) args(1).toDouble else 0.05
    val steps = if (args.length > 2) args(2).toInt else 10
    val nQ = if (args.length > 3) args(3).toInt else 64
    val ratio = if (args.length > 4) args(4).toDouble else 0.25
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
    // split on id QUANTILES (scale-generated ids are sparse)
    val fracs = (1 to steps).map(i => baseFrac + i * stepFrac)
      .filter(_ < 1.0).toArray
    val cuts = emb.stat.approxQuantile("vec_id",
      Array(baseFrac) ++ fracs, 0.0001)
    val base = emb.filter(col("vec_id") < cuts.head)
    def sliceAt(i: Int) = {
      val lo = cuts(i - 1)
      if (i < cuts.length) emb.filter(col("vec_id") >= lo && col("vec_id") < cuts(i))
      else emb.filter(col("vec_id") >= lo)
    }
    val params = SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
      measurement = "cos", indexParam = "HNSW32", efSearch = 0,
      autoCompactAtSegmentRatio = ratio)
    val (m0, fitSec) = timed(new SparkSearcher(
      new PassthroughEncoder("embedding"), params).fit(base))

    val q = emb.filter(col("vec_id") < nQ).persist()
    q.count()
    def hits(m: SearcherModel): Map[Long, Set[Long]] = m
      .search(q, 10, keepRankNo = true, queryIdCol = Some("vec_id"))
      .select(col("vec_id").cast("long"), col("sim_item").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    var model = m0
    val nSteps = math.min(steps, cuts.length)
    for (i <- 1 to nSteps) {
      val inc = sliceAt(i)
      val (grown, addSec) = timed {
        val g = model.add(inc) // compacts inline when the ratio trips
        g.search(q.limit(1), 1, queryIdCol = Some("vec_id")).count()
        g
      }
      model = grown
      val d = model.describe.head()
      val graphs = d.getAs[Int]("hnsw_graphs")
      val rec = d.getAs[Boolean]("compact_recommended")
      val (_, searchSec) = timed(hits(model))
      rows += f"""{"step":$i,"n":${model.count},"add_sec":$addSec%.3f,"graphs":$graphs,"compact_recommended":$rec,"search_sec":$searchSec%.3f}"""
    }
    // quality anchor: recall@10 vs exact on the final corpus
    val corpus = if (nSteps < cuts.length)
      emb.filter(col("vec_id") < cuts(nSteps)) else emb
    val ex = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos")).fit(corpus)
    val truth = hits(ex); ex.unpersist()
    val h = hits(model)
    val recall = truth.map { case (k, t) =>
      h.getOrElse(k, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    println(f"""{"metric":"hnsw_auto_compact","sf":"$sfDir","ratio":$ratio,"n_base":${m0.count},"fit_sec":$fitSec%.3f,"n_queries":$nQ,"steps":[${rows.mkString(",")}],"final_recall_at10":$recall%.4f,"loadavg":"$load"}""")
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.graftshim.GraftCore
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.encoders.PassthroughEncoder
import graft.search.{SearcherParams, SparkSearcher}

/** Phase decomposition of the save/load serving-lifecycle gates: runs the
  * knn_batch_{ivf,hnsw}_loaded pipeline with per-phase (fit / save / load /
  * serve) wall and job counts, so the "driver gap" ProbeJobs reports on
  * those gates attributes to a concrete phase instead of the whole gate.
  *
  *   sbt "runMain graft.ProbeLoadedPhases <sfDir> [IVF0|HNSW32]"
  */
object ProbeLoadedPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val param = if (args.length > 1) args(1) else "IVF0"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job call sites: DAGScheduler logs "Starting job: <site>" at INFO —
    // the cheapest per-job attribution available to a probe
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler", org.apache.logging.log4j.Level.INFO)
    GraftConf.applySessionDefaults(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val items = spark.read.parquet(s"$sfDir/embeddings.parquet")
    items.count()
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // the result stage's details field carries the full call site; its
        // first graft/engine frame is the attribution we want
        val site = e.stageInfos.lastOption.map { si =>
          val lines = si.details.split('\n')
          lines.find(l => l.contains("graft.") && !l.contains("ProbeLoadedPhases"))
            .orElse(lines.headOption).getOrElse("?")
        }.getOrElse("?")
        println(s"[loadphase]     job ${e.jobId} @ ${si(e)} $site")
      }
      private def si(e: SparkListenerJobStart): String =
        e.stageInfos.lastOption.map(_.name.take(60)).getOrElse("?")
    })
    def phase[A](label: String)(f: => A): A = {
      GraftCore.flushListenerBus(spark.sparkContext)
      val j0 = jobs.get; val t0 = System.nanoTime()
      val r = f
      GraftCore.flushListenerBus(spark.sparkContext)
      println(f"[loadphase] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get - j0}%3d")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[loadphase] === $param rep $rep ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      if (param == "compact") {
        // the knn_hnsw_compact contract gate, phase-decomposed: fit on
        // 3/5 of the corpus, two add()s of 1/5 each, compact, serve
        val fitted = phase("fit") {
          new SparkSearcher(new PassthroughEncoder("embedding"),
            SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
              measurement = "cos", indexParam = "HNSW32",
              efSearch = Int.MaxValue))
            .fit(items.filter(pmod(col("vec_id"), lit(5)) < 3))
        }
        val g1 = phase("add1")(
          fitted.add(items.filter(pmod(col("vec_id"), lit(5)) === 3)))
        val g2 = phase("add2")(
          g1.add(items.filter(pmod(col("vec_id"), lit(5)) === 4)))
        val compacted = phase("compact")(g2.compact())
        phase("serve") {
          compacted.search(items.filter(col("vec_id") < 10), 10,
            keepRankNo = true, queryIdCol = Some("vec_id"))
            .write.format("noop").mode("overwrite").save()
        }
      } else {
        val model = phase("fit") {
          new SparkSearcher(new PassthroughEncoder("embedding"),
            SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
              measurement = "cos", indexParam = param, nprobe = 0,
              efSearch = if (param.startsWith("HNSW")) Int.MaxValue else 16))
            .fit(items)
        }
        val path = java.nio.file.Files.createTempDirectory("graft-lphase").toString
        phase("save")(model.save(path))
        phase("unpersist")(model.unpersist())
        val loaded = phase("load")(
          SparkSearcher.load(spark, path, new PassthroughEncoder("embedding")))
        phase("serve") {
          loaded.search(items.filter(col("vec_id") < 500), 5,
            keepRankNo = true, queryIdCol = Some("vec_id"))
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftshim.GraftCore
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query executed to completion via a
  * noop sink (forces full computation — `count()` would let Catalyst prune
  * whole subtrees), one JSON line on stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup + one scan per table, so the alphabetically-first
    // query doesn't absorb one-time session costs (file listing, footer
    // reads, first-scan codegen) into its number
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // optional arg: comma-separated gate-name filter for local iteration
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    // Hygiene: queries persist/checkpoint intermediates (index fits, dedup
    // shingle tables, CC rounds). In an 81-query single-JVM run those
    // orphaned blocks compound into 4-6× slowdowns on later queries (r3
    // lesson) — so every measured run starts from an empty block manager.
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // Per-task metric accumulator: a machine-state episode (GC storm, memory
    // pressure → spill) should carry its own diagnosis in the artifact
    // instead of costing a cross-machine triage (r7 lesson: sq4/sq8 driver
    // outliers). Listener delivery is async — flush the bus around each
    // snapshot so deltas attribute to the right run.
    val gcAcc = new AtomicLong; val spillAcc = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          gcAcc.addAndGet(m.jvmGCTime)
          spillAcc.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })
    def metricSnapshot(): (Long, Long) = {
      GraftCore.flushListenerBus(spark.sparkContext)
      (gcAcc.get, spillAcc.get)
    }
    // min-of-2 per query: one-off GC pauses / page-cache misses stop moving
    // the official number; repeats run back-to-back for OS-cache locality
    val repeats = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val runs = (1 to repeats).map { _ =>
        clearState()
        val (gc0, sp0) = metricSnapshot()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        val (gc1, sp1) = metricSnapshot()
        (sec, ok, gc1 - gc0, sp1 - sp0)
      }
      // ok only if EVERY repeat succeeded: a flaky query is a bug and must
      // surface as FAILED in the official output, not vanish behind a
      // lucky retry
      val ok = runs.forall(_._2)
      val dt = runs.map(_._1).min
      // diagnosis rides with the SLOWEST repeat — that's the one that needs
      // explaining when min and max disagree
      val slowest = runs.maxBy(_._1)
      System.err.println(f"[bench] $name%-24s $dt%8.2f s" + (if (ok) "" else "  FAILED"))
      (name, dt, ok, slowest._1, slowest._3, slowest._4)
    }
    // a failed query records sentinel -1 (not its time-to-failure: a fast
    // regression must not read as an improvement) and is excluded from total
    val qs = results.map { case (k, v, ok, _, _, _) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val metricsJson = results.map { case (k, _, _, maxSec, gcMs, spill) =>
      f""""$k":{"max_sec":$maxSec%.3f,"gc_ms":$gcMs,"spill_bytes":$spill}"""
    }.mkString("{", ",", "}")
    // noise flag: min/max spread over 3x AND over 0.3 s absolute (sub-second
    // queries jitter multiplicatively without meaning anything)
    val noisy = results.collect {
      case (k, dt, ok, maxSec, _, _) if ok && maxSec > 3 * dt && maxSec - dt > 0.3 =>
        "\"" + k + "\""
    }.mkString("[", ",", "]")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val fullJson = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"noisy":$noisy,"run_metrics":$metricsJson,"sf":"$sfDir"}"""
    // The harness keeps only the last ~2000 chars of stdout and parses a
    // JSON line out of them (r3-r8 lesson: the one-line-per-query format
    // outgrew that window and every driver-side parse came back null). So:
    // the FULL per-query record goes to a file, and stdout's LAST line is a
    // compact summary — total + failures + noise flags + the slowest
    // queries — sized to survive the tail window with room for sbt's
    // trailing "[success]" line.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL_LAST.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullJson + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full per-query record -> $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    val slowest = results.filter(_._3).sortBy(-_._2).take(25)
      .map { case (k, v, _, _, _, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$slowest,"n_queries":${results.size},"n_ok":${results.count(_._3)},"failed":$failed,"noisy":$noisy,"queries_note":"slowest 25 of ${results.size}; full per-query record in $outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}

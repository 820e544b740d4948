package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.graftshim.GraftCore

/** Driver-overhead profiler: runs named SparkEntry gates once through the
  * noop sink while recording every Spark job's wall interval. For each gate
  * prints (wall, #jobs, Σ job time, driver gap = wall − union-of-job
  * intervals). A gate whose wall is dominated by the gap is spending its
  * time on the DRIVER (planning, sequential tiny actions, file IO between
  * jobs), not on executors — the r21 optimization round's first target.
  *
  *   sbt "runMain graft.ProbeJobs <sfDir> gate[,gate,...]"
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("knn_cos_top10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.applySessionDefaults(spark)
    // same warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val starts = mutable.Map[Int, (Long, String)]()
    val spans = mutable.ArrayBuffer[(Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.synchronized {
          // the result stage's details carry the submitting call stack;
          // callSite.short is not propagated into job properties here
          val site = e.stageInfos.lastOption.map { si =>
            si.details.split('\n')
              .find(l => l.contains("graft.") && !l.contains("graft.ProbeJobs"))
              .getOrElse(si.name.take(60))
          }.getOrElse("?")
          starts(e.jobId) = (System.nanoTime(), site)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(e.jobId).foreach { case (t0, site) =>
            spans += ((t0, System.nanoTime(), site))
          }
        }
    })
    def union(ss: Seq[(Long, Long)]): Long = {
      val sorted = ss.sortBy(_._1)
      if (sorted.isEmpty) return 0L
      // seed from the first span (the old -1 sentinel leaked -1 ns into
      // the first interval and returned -1 on an empty list)
      var tot = 0L; var curS = sorted.head._1; var curE = sorted.head._2
      sorted.tail.foreach { case (s, e) =>
        if (s > curE) { tot += curE - curS; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      tot + (curE - curS)
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown gate '$name'"))
      (1 to 2).foreach { rep =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spans.synchronized(spans.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        GraftCore.flushListenerBus(spark.sparkContext)
        val (n, sum, cov, detail) = spans.synchronized {
          (spans.size, spans.map(s => s._2 - s._1).sum / 1e9,
            union(spans.toSeq.map(s => (s._1, s._2))) / 1e9,
            spans.toSeq.sortBy(s => -(s._2 - s._1)).take(12)
              .map(s => f"${(s._2 - s._1) / 1e9}%.2fs ${s._3}"))
        }
        println(f"[probejobs] $name%-36s rep$rep wall=$wall%7.2f s  jobs=$n%4d  sum_job=$sum%7.2f s  job_cov=$cov%7.2f s  driver_gap=${wall - cov}%7.2f s")
        if (rep == 2) detail.foreach(d => println(s"[probejobs]     job $d"))
      }
    }
    spark.stop()
  }
}

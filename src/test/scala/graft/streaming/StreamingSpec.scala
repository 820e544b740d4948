package graft.streaming

import graft.SparkSpec
import graft.encoders.PassthroughEncoder
import graft.search.{SearcherParams, SparkSearcher}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming surface: watermarked windowed agg and stream-static
  * similarity scoring, driven synchronously from parquet batches. */
class StreamingSpec extends SparkSpec {

  test("hourly event stats: streaming result == batch result") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
    // file-stream source needs a directory; glob down to the events file
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val q = StreamingOps.hourlyEventStats(stream)
      .writeStream.outputMode("append").format("memory").queryName("hourly")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; compare those
    val got = spark.table("hourly")
    val batch = StreamingOps.hourlyEventStats(batchEvents)
      // batch run of the same plan ignores the watermark: all windows
    val maxClosed = got.agg(max(col("hour"))).head().getTimestamp(0)
    if (maxClosed != null) {
      val g = got.filter(col("hour") <= maxClosed)
        .orderBy("hour", "event_type").collect()
      val b = batch.filter(col("hour") <= maxClosed)
        .orderBy("hour", "event_type").collect()
      assert(g === b)
    }
    assert(got.count() > 0)
  }

  test("q_stream_hourly reads DIRECTORY-layout event tables (the production shape)") {
    // r16 regression pin: the gate's source used to glob 'events.parquet'
    // against the parent dir — matching only the single-FILE test layout;
    // against a directory of part files (every production writer) the
    // file-stream source listed NOTHING and the query succeeded on zero
    // rows (found by the first sf100 streaming probe).
    val tmp = java.nio.file.Files.createTempDirectory("graft-dirlayout").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(3) // force a multi-part DIRECTORY table
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.SparkEntry.queries("q_stream_hourly")(spark, tmp)
      .collect()
    assert(got.length > 0, "directory-layout stream source read zero rows")
    // same final state as the batch twin over the same directory table
    // (hour columns differ in epoch unit — compare the per-window stats
    // in the shared hour+type order both gates sort by)
    val want = graft.SparkEntry.queries("q_events_hourly")(spark, tmp)
      .collect()
    assert(got.length === want.length)
    assert(got.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ===
      want.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("attributeStream: stream-stream interval join equals the batch interval join") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    def src() = spark.readStream.schema(batch.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    def shape(df: org.apache.spark.sql.DataFrame, tpe: String,
        idAs: String, tsAs: String) =
      df.filter(col("event_type") === tpe).select(col("user_id"),
        col("event_id").as(idAs), col("ts").as(tsAs))
    val q = StreamingOps.attributeStream(
        shape(src(), "view", "view_id", "view_ts"),
        shape(src(), "click", "click_id", "click_ts"),
        "user_id", "view_ts", "click_ts", maxLagMinutes = 10)
      .writeStream.outputMode("append").format("memory").queryName("attr")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "view_id", "click_id")
        .orderBy("user_id", "view_id", "click_id").collect().toSeq
    val got = rows(spark.table("attr"))
    // batch twin: the same operator over batch frames (withWatermark is
    // a no-op in batch) — the inner interval join is batching-independent
    val want = rows(StreamingOps.attributeStream(
      shape(batch, "view", "view_id", "view_ts"),
      shape(batch, "click", "click_id", "click_ts"),
      "user_id", "view_ts", "click_ts", maxLagMinutes = 10))
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("sessionize: custom state via flatMapGroupsWithState closes sessions on gaps") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = sp.sqlContext
    val input = MemoryStream[StreamingOps.SessionEvent]
    val sessions = StreamingOps.sessionize(input.toDS(), gapMinutes = 30,
      closeOnIdle = false) // wall-clock timers never idle the test query
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    val min = 60L * 1000000000L
    // user 1: two sessions separated by a 60-min gap; user 2: one session
    input.addData(
      StreamingOps.SessionEvent(1, 0 * min, 1.0),
      StreamingOps.SessionEvent(1, 10 * min, 2.0),
      StreamingOps.SessionEvent(1, 80 * min, 5.0),
      StreamingOps.SessionEvent(2, 0 * min, 7.0))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[StreamingOps.UserSession].collect()
    // the first user-1 session closed (gap 70min > 30min); open ones held in state
    assert(closed.toSeq === Seq(
      StreamingOps.UserSession(1, 0, 10 * min, 2, 3.0)))
    q.stop()
  }

  test("sessionizeBounded: event-time timers close AND EVICT idle sessions") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = sp.sqlContext
    val input = MemoryStream[StreamingOps.SessionEvent]
    val sessions = StreamingOps.sessionizeBounded(input.toDS(),
      gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions_bounded").start()
    val min = 60L * 1000000000L
    val t0 = 1000 * min // epoch-0 events sit ON the initial watermark (dropped as late)
    // batch 1: user 1 (two events), user 2 (one event)
    input.addData(
      StreamingOps.SessionEvent(1, t0 + 0 * min, 1.0),
      StreamingOps.SessionEvent(1, t0 + 10 * min, 2.0),
      StreamingOps.SessionEvent(2, t0 + 5 * min, 7.0))
    q.processAllAvailable()
    // batch 2: only user 3, far in the future — the watermark advances to
    // t0+190min, passing user 1's (end 10min + gap 30min) and user 2's
    // (5+30) timers: both sessions CLOSE via timeout and their state rows
    // are REMOVED, while user 3's stays open
    input.addData(StreamingOps.SessionEvent(3, t0 + 200 * min, 9.0))
    q.processAllAvailable()
    // one more empty-ish batch so timers registered against the new
    // watermark actually fire
    input.addData(StreamingOps.SessionEvent(3, t0 + 201 * min, 1.0))
    q.processAllAvailable()
    val closed = spark.table("sessions_bounded")
      .as[StreamingOps.UserSession].collect().sortBy(_.user_id)
    assert(closed.map(_.user_id).toSeq === Seq(1L, 2L),
      s"watermark-passed sessions must close via event-time timeout: ${closed.toSeq}")
    assert(closed.find(_.user_id == 1).get ===
      StreamingOps.UserSession(1, t0, t0 + 10 * min, 2, 3.0))
    assert(closed.find(_.user_id == 2).get ===
      StreamingOps.UserSession(2, t0 + 5 * min, t0 + 5 * min, 1, 7.0))
    // eviction is observable in the state-store metrics: rows were removed
    val removed = q.recentProgress
      .flatMap(p => p.stateOperators.map(_.numRowsRemoved)).sum
    assert(removed >= 2, s"state rows must be EVICTED on timeout, removed=$removed")
    // only user 3's open session remains in state
    val lastTotal = q.recentProgress.last.stateOperators.map(_.numRowsTotal).sum
    assert(lastTotal === 1, s"state must hold only the open session, total=$lastTotal")
    q.stop()
  }

  test("sessionizeBounded: in-batch gap splitting matches the unbounded variant") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = sp.sqlContext
    val min = 60L * 1000000000L
    val t0 = 1000 * min
    val events = Seq(
      StreamingOps.SessionEvent(1, t0 + 0 * min, 1.0),
      StreamingOps.SessionEvent(1, t0 + 10 * min, 2.0),
      StreamingOps.SessionEvent(1, t0 + 80 * min, 5.0), // 70min gap > 30 → split
      StreamingOps.SessionEvent(2, t0 + 0 * min, 7.0))
    val input = MemoryStream[StreamingOps.SessionEvent]
    val q = StreamingOps.sessionizeBounded(input.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_bounded_parity").start()
    input.addData(events: _*)
    q.processAllAvailable()
    val got = spark.table("sessions_bounded_parity")
      .as[StreamingOps.UserSession].collect()
    // same in-batch close as sessionize's spec fixture: user 1's first
    // session; open sessions (user 1's second, user 2's) held in state
    assert(got.toSeq === Seq(StreamingOps.UserSession(1, t0, t0 + 10 * min, 2, 3.0)))
    q.stop()
  }

  test("dedupStream: duplicate keys within the watermark are dropped") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    // user_id as the dedup key: one surviving event per user
    val q = StreamingOps.dedupStream(stream, Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup")
    assert(got.count() === got.select("user_id").distinct().count())
    assert(got.count() > 0)
  }

  test("curateStream: streamed survivor set equals the batch filter exactly") {
    val dir = "/root/testdata/sf0.001"
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    // batch-fitted models; thresholds near the medians so BOTH filters bite
    val lm = graft.text.NgramLm.fit(batchDocs, "text")
    val w = graft.text.QualityModel.demoWeights(512)
    val scored = batchDocs.select(
      graft.text.NgramLm.score(col("text"), lm).as("n"),
      graft.text.QualityModel.score(col("text"), w, -0.1).as("q"))
    val med = scored.agg(
      expr("percentile_approx(n, 0.5)"), expr("percentile_approx(q, 0.5)")).head()
    val (maxNll, minLogit) = (med.getDouble(0), med.getDouble(1))
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = StreamingOps.curateStream(stream, "text", lm, maxNll, w, -0.1, minLogit)
      .select("doc_id", "nll", "quality_logit")
      .writeStream.outputMode("append").format("memory").queryName("curate")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("curate").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val want = StreamingOps.curateStream(batchDocs, "text", lm, maxNll, w, -0.1, minLogit)
      .select("doc_id", "nll", "quality_logit").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got === want)
    // both filters actually filtered (thresholds at the medians), and
    // something survived the conjunction
    assert(got.nonEmpty)
    assert(got.size < batchDocs.count())
  }

  test("nearDupDedupStream: one survivor per simhash fingerprint") {
    val dir = "/root/testdata/sf0.001"
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      // synthetic arrival times, offset a day past the epoch: a row AT the
      // initial (epoch) watermark would be dropped as late
      .withColumn("ts", (col("doc_id") + 86400L) * 1000000000L)
    val q = StreamingOps.nearDupDedupStream(stream, "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("neardup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("neardup")
    val batchFps = batchDocs
      .select(graft.dedup.Dedup.simHash62(col("text")).as("fp"))
      .distinct().count()
    assert(got.count() === batchFps) // exactly one survivor per fingerprint
    assert(got.count() < batchDocs.count()) // the corpus does contain dups
  }

  test("searchStream: per-trigger top-k equals the batch search contract") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id")))
      .fit(emb)
    val queries = emb.filter(col("vec_id") < 10)
    val stream = spark.readStream.schema(emb.schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
    val results = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = StreamingOps.searchStream(
        stream.filter(col("vec_id") < 10), model, 5, queryIdCol = "vec_id") {
        (ranked, _) =>
          results ++= ranked
            .select("vec_id", "rank_no", "sim_item", "sim_val")
            .collect().map(_.toSeq)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = model.search(queries, 5, keepRankNo = true,
        queryIdCol = Some("vec_id"))
      .select("vec_id", "rank_no", "sim_item", "sim_val")
      .collect().map(_.toSeq)
    assert(results.toSet === batch.toSet)
    assert(results.size === batch.length)
    model.unpersist()
  }

  test("standingQueryTopK: state after N batches equals batch search over ingested rows") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = sp.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = emb.select(col("vec_id").as("row_id"),
        col("embedding").cast("array<float>").as("vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
    val metric = graft.functions.VectorFunctions.metric("cos")
    val input = MemoryStream[(Long, Array[Float])]
    val emissions = scala.collection.mutable.Map.empty[Long, Array[Seq[Any]]]
    val q = StreamingOps.standingQueryTopK(
        input.toDF().toDF("row_id", "vec"), queries,
        "vec", "vec_id", "embedding", topK = 5, metric)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingOps.StandingTopK], id: Long) =>
        emissions(id) = batch.collect()
          .map(h => Seq[Any](h.query_id, h.rank_no, h.row_id, h.dist))
      }
      .start()
    // ingest the corpus in two arbitrary slices
    val (first, rest) = rows.splitAt(rows.length / 3)
    input.addData(first.toSeq)
    q.processAllAvailable()
    input.addData(rest.toSeq)
    q.processAllAvailable()
    q.stop()
    val lastBatch = emissions(emissions.keys.max)
      // float-round the double dist exactly like the batch result schema
      .map(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Int], s(2).asInstanceOf[Long],
        f"${s(3).asInstanceOf[Double].toFloat.toDouble}%.6f")).toSet
    // batch truth: exact search over the fully-ingested corpus
    val model = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos")).fit(emb)
    val batchTruth = model.search(emb.filter(col("vec_id") < 5), 5,
        keepRankNo = true, queryIdCol = Some("vec_id"))
      .select(col("vec_id"), col("rank_no"), col("sim_item"), col("sim_val"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        f"${r.getFloat(3).toDouble}%.6f")).toSet
    assert(lastBatch === batchTruth)
    model.unpersist()
  }

  test("scoreStream: streamed vectors match themselves against the index") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id")))
      .fit(emb)
    val stream = spark.readStream.schema(emb.schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
    val scored = StreamingOps.scoreStream(
      stream.select(col("vec_id"), col("embedding")), model, "embedding",
      threshold = 0.999)
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("scored").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val hits = spark.table("scored")
    // every vector is its own near-exact match
    assert(hits.filter(col("vec_id") === col("match_row_id")).count() === emb.count())
    model.unpersist()
  }
}

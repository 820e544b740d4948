package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

import graft.search.SearcherModel

/**
 * Structured-Streaming surface of the engine. The reference is batch-only
 * (SURVEY §2.2: its closest stream is the encoder micro-batch generator,
 * encoder_utils.py:58-75), so these are the scale extensions a continuous
 * corpus pipeline needs: watermarked windowed aggregation over an event
 * stream, and continuous similarity scoring of a query stream against a
 * fitted (static, broadcast) index — the "online-ish" variant of
 * faiss_searcher.py:161-169 that stays inside Spark's execution model.
 */
object StreamingOps {

  /** Epoch-nanos long → timestamp (micros), for watermarking data read with
    * nanosAsLong. */
  def nsToTimestamp(ns: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((ns / 1000L).cast("long"))

  /** Event-time column for watermarking, tolerant of the ts column's
    * physical type (epoch-nanos long or timestamp[us] — see
    * [[graft.util.TimeCols]]). */
  private def eventTimeOf(df: DataFrame, tsCol: String) =
    graft.util.TimeCols.eventTime(df, tsCol)

  /**
   * Watermarked hourly tumbling aggregation per event type — the streaming
   * twin of SparkEntry's `q_events_hourly` (same shape: time bucket ×
   * event_type → count + decimal-exact sum). Late rows beyond the watermark
   * are dropped by Spark's state cleanup.
   */
  def hourlyEventStats(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", eventTimeOf(events, "ts"))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(20, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /**
   * Stream-STREAM event attribution — the canonical two-stream interval
   * join (left "view" → right "click" on the same key within a lag
   * window). Both sides are watermarked AND the join carries the
   * event-time range condition, so Spark's symmetric stream-stream hash
   * join can EVICT buffered rows the moment they can no longer match:
   * state ∝ rows inside the (watermark + lag) horizon, not stream
   * length — the bound that matters at 100 TB. Inner join only, so
   * matches emit in append mode as they form; the result set is
   * batching-independent unless input arrives later than the watermark
   * (unordered file replay shares [[sessionizeBounded]]'s documented
   * loss bound; ordered production arrival bounds it by the delay).
   *
   * The two sides must carry DISJOINT column names apart from `keyCol`
   * (project/rename before calling); each side's ts column may be
   * epoch-nanos long or timestamp ([[graft.util.TimeCols]] contract).
   */
  def attributeStream(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxLagMinutes: Int = 10,
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withColumn("__l_time", eventTimeOf(left, leftTs))
      .withWatermark("__l_time", watermark)
    val rr = right.withColumnRenamed(keyCol, "__r_key")
    val r = rr.withColumn("__r_time", eventTimeOf(rr, rightTs))
      .withWatermark("__r_time", watermark)
    l.join(r,
        col(keyCol) === col("__r_key") &&
          col("__r_time") >= col("__l_time") &&
          col("__r_time") <= col("__l_time") +
            expr(s"INTERVAL $maxLagMinutes MINUTES"))
      .drop("__r_key", "__l_time", "__r_time")
  }

  /** Input/output rows for stateful sessionization. */
  case class SessionEvent(user_id: Long, ts_ns: Long, value: Double)
  case class UserSession(user_id: Long, start_ns: Long, end_ns: Long,
      n_events: Long, sum_value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /**
   * Custom-state sessionization via `flatMapGroupsWithState` — the
   * arbitrary-state surface of the engine: per-user sessions close after
   * `gapMinutes` of inactivity (processing-time timeout) and are emitted
   * with their event count and value sum. The state is O(1) per active
   * user regardless of stream length — but "active" is never forgotten
   * here (`NoTimeout` keeps one state row per user EVER seen, and the
   * processing-time timers are wall-clock, not replay-deterministic).
   * For long-lived streams with user churn use [[sessionizeBounded]],
   * whose event-time timers bound state by the watermark horizon.
   */
  def sessionize(events: Dataset[SessionEvent],
      gapMinutes: Int = 30, closeOnIdle: Boolean = true): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapNs = gapMinutes.toLong * 60 * 1000000000L
    // closeOnIdle registers wall-clock timers so a silent user's open
    // session eventually closes — but timers make the query self-trigger
    // (never idle); pass false for drain-and-stop batch-style runs where
    // only event-time gaps close sessions.
    val timeoutConf =
      if (closeOnIdle) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, s.start, s.end, s.n, s.total))
          } else {
            // merge the micro-batch into the open session; close + emit any
            // session whose gap to the next event exceeds gapNs
            val (cur, closed) = mergeSession(state.getOption, rows, gapNs)
            cur.foreach { s =>
              state.update(s)
              if (closeOnIdle) state.setTimeoutDuration(s"$gapMinutes minutes")
            }
            closed.reverseIterator
          }
        })
  }

  /**
   * Event-time-bounded sessionization — the UNBOUNDED-stream variant of
   * [[sessionize]]. The two existing timeout modes both have a scale
   * hazard on a long-lived stream: `NoTimeout` never evicts (state =
   * one entry per user EVER SEEN — 1.5M rows over the sf100 month, and
   * growing with user churn forever), and `ProcessingTimeTimeout` evicts
   * on wall-clock, which is non-deterministic under replay/backfill (a
   * fast replay closes nothing; a paused query closes everything).
   * `EventTimeTimeout` keys eviction to the WATERMARK: a session whose
   * last event trails the watermark by more than the gap can, by the
   * watermark contract, never be extended — it closes and its state is
   * REMOVED. State is bounded by users active within (gap + watermark
   * delay) of the stream head, independent of total stream length or
   * lifetime user cardinality, and replay-deterministic.
   */
  def sessionizeBounded(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): Dataset[UserSession] = {
    val sp = events.sparkSession
    import sp.implicits._
    val gapNs = gapMinutes.toLong * 60 * 1000000000L
    val gapMs = gapMinutes.toLong * 60 * 1000L
    events
      .withColumn("event_time", nsToTimestamp(col("ts_ns")))
      .withWatermark("event_time", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed (last event + gap): no on-time event can
            // extend this session — close it and FREE the state row
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, s.start, s.end, s.n, s.total))
          } else {
            val (cur, closed) = mergeSession(state.getOption, rows, gapNs)
            cur.foreach { s =>
              state.update(s)
              // the eviction clock: fire when the watermark passes the
              // session's end + gap (ms epoch; must sit strictly above
              // the current watermark — a session fed only late-ish data
              // still gets the earliest legal timer)
              state.setTimeoutTimestamp(math.max(
                s.end / 1000000L + gapMs,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.reverseIterator
          }
        })
  }

  /** Shared micro-batch merge for the sessionizers: fold this batch's
    * events (ts-sorted) into the open session; sessions whose gap to the
    * next event exceeds `gapNs` close. Returns (open state, closed
    * sessions newest-first). */
  private def mergeSession(open: Option[SessionState],
      rows: Iterator[SessionEvent], gapNs: Long): (Option[SessionState], List[UserSession]) = {
    val sorted = rows.toArray.sortBy(_.ts_ns)
    var closed = List.empty[UserSession]
    var cur = open
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_ns - s.end > gapNs =>
          closed ::= UserSession(e.user_id, s.start, s.end, s.n, s.total)
          cur = Some(SessionState(e.ts_ns, e.ts_ns, 1, e.value))
        case Some(s) =>
          cur = Some(SessionState(s.start, math.max(s.end, e.ts_ns),
            s.n + 1, s.total + e.value))
        case None =>
          cur = Some(SessionState(e.ts_ns, e.ts_ns, 1, e.value))
      }
    }
    (cur, closed)
  }

  /**
   * Streaming exact deduplication: drop rows whose key was already seen
   * within the watermark horizon (`dropDuplicatesWithinWatermark` keeps
   * state bounded — the streaming twin of the batch hash-agg dedup,
   * [[graft.dedup.Dedup.exact]]). For a corpus-ingest pipeline this is the
   * "don't index the same document twice" guard.
   */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", eventTimeOf(events, "ts"))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Streaming NEAR-dup guard: dedup by the 62-bit SimHash fingerprint of
   * the text (identical and near-identical docs collide on it) within the
   * watermark horizon — the streaming front-door of the batch simhash
   * pipeline ([[graft.dedup.Dedup.simHashNearDups]]): one codegen
   * fingerprint per doc, state O(1) per distinct fingerprint in horizon,
   * no joins. Docs whose fingerprint was already admitted are dropped.
   */
  def nearDupDedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("event_time", eventTimeOf(docs, tsCol))
      .withColumn("__fp", graft.dedup.Dedup.simHash62(col(textCol)))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  /**
   * Streaming curation filter — the CCNet-style quality gate applied AT
   * INGEST: every arriving document is scored by batch-fitted models
   * (interpolated bigram-LM NLL, hashed-linear classifier logit) as
   * STATELESS scalar projections. Both scorers are codegen expressions
   * whose models ride as plan reference objects, so the stream plan is
   * the batch plan — no joins, no state, no watermark — and the
   * batch/stream contract is exact by construction (spec-asserted: the
   * streamed survivor set equals the batch filter's). Scores stay on the
   * emitted rows (`nll`, `quality_logit`) for downstream thresholds.
   */
  def curateStream(docs: DataFrame, textCol: String,
      lm: graft.text.NgramLmModel, maxNll: Double,
      weights: Array[Float], bias: Double, minLogit: Double): DataFrame =
    docs
      .withColumn("nll", graft.text.NgramLm.score(col(textCol), lm))
      .withColumn("quality_logit",
        graft.text.QualityModel.score(col(textCol), weights, bias))
      .filter(col("nll") <= maxNll && col("quality_logit") >= minLogit)

  /**
   * Continuous similarity scoring: each arriving vector is scored against
   * the fitted index (stream-static broadcast join, no state) and rows
   * within `threshold` of some indexed item are emitted with the match.
   * Per-query top-k needs a rank over the stream side (unsupported on
   * unbounded input); threshold semantics are the streaming-native form.
   */
  def scoreStream(stream: DataFrame, model: SearcherModel, vecCol: String,
      threshold: Double): DataFrame = {
    val metric = model.searcher.metric
    val index = model.indexedSlim // (row_id, __vec) — small side, broadcast
    val dist = metric.dist(col(vecCol), col("__vec"))
    val keep = if (metric.higherIsCloser) dist >= threshold else dist <= threshold
    stream.crossJoin(broadcast(index))
      .withColumn("sim_val", dist.cast("float"))
      .filter(keep)
      .withColumnRenamed("row_id", "match_row_id")
      .drop("__vec")
  }

  /** State/output rows for standing-query top-k. */
  case class ScoredHit(query_id: Long, row_id: Long, dist: Double)
  case class TopKState(ids: Array[Long], dists: Array[Double])
  case class StandingTopK(query_id: Long, rank_no: Int, row_id: Long, dist: Double)

  /**
   * STANDING-QUERY top-k: the corpus STREAMS IN (continuous ingest) while
   * the query set stands; each query's running top-k updates as rows
   * arrive — the alerting/monitoring inversion of `searchStream`. Arriving
   * rows are scored against the broadcast standing queries (stream-static,
   * stateless), then `mapGroupsWithState` keyed by query id folds them
   * into a bounded [[graft.search.TopKBuffer]] — state is O(k) per
   * standing query FOREVER, independent of stream length, and each
   * micro-batch emits every updated query's current top-k (update mode).
   * After any prefix of the stream, a query's state equals the batch
   * search over the rows ingested so far (spec-gated).
   */
  def standingQueryTopK(corpusStream: DataFrame, queries: DataFrame,
      vecCol: String, queryIdCol: String, queryVecCol: String, topK: Int,
      metric: graft.functions.VectorFunctions.Metric): Dataset[StandingTopK] = {
    import corpusStream.sparkSession.implicits._
    val scored = corpusStream
      .crossJoin(broadcast(queries.select(
        col(queryIdCol).cast("long").as("query_id"), col(queryVecCol).as("__qv"))))
      .select(col("query_id"), col("row_id").cast("long").as("row_id"),
        metric.dist(col(vecCol), col("__qv")).as("dist"))
      .as[ScoredHit]
    val asc = !metric.higherIsCloser
    val k = topK
    scored.groupByKey(_.query_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (qid: Long, rows: Iterator[ScoredHit], state: GroupState[TopKState]) => {
          val buf = new graft.search.TopKBuffer(k, asc)
          state.getOption.foreach { s =>
            var i = 0
            while (i < s.ids.length) { buf.insert(s.dists(i), s.ids(i)); i += 1 }
          }
          rows.foreach(h => buf.insert(h.dist, h.row_id))
          val best = buf.sorted
          state.update(TopKState(best.map(_._1), best.map(_._2)))
          best.zipWithIndex.toSeq
            .map { case ((id, d), rk) => StandingTopK(qid, rk, id, d) }
        })
      .flatMap(identity)
  }

  /**
   * Per-query TOP-K over a query stream — the streaming surface matching
   * the batch `search` contract exactly. An unbounded per-group rank is
   * unsupported on streams, but every micro-batch IS a bounded query set,
   * so `foreachBatch` runs the full batch search (same heap-aggregate
   * top-k, same payload gather, same result schema) per trigger and hands
   * the ranked result to `sink`. Stream-side state: none — the index is
   * the static side, so this scales with the index exactly like batch
   * search does.
   *
   * Returns the configured writer; callers pick trigger/checkpoint and
   * call `.start()`.
   */
  def searchStream(stream: DataFrame, model: SearcherModel, topK: Int,
      queryIdCol: String, keepRankNo: Boolean = true)(
      sink: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(model.search(batch, topK, keepRankNo = keepRankNo,
        queryIdCol = Some(queryIdCol)), batchId)
    }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event analytics (SURVEY.md §2.2
  * Streaming): the same declarative transforms as graft.operators
  * .EventOps, over an unbounded source with event-time watermarks.
  *
  * Every function takes the events DataFrame (streaming or static —
  * `window`/`session_window` are mode-agnostic, which is what lets the
  * batch twins be DuckDB-oracle-checked while these run under
  * MemoryStream in the ScalaTest suite). State stays bounded through
  * watermarks; `runningTotals` shows the arbitrary-state escape hatch
  * (`mapGroupsWithState`) that the reference's crawl-frontier
  * accumulator (index.py:117-120) would map to in a streaming engine.
  */
object EventStreamOps {

  /** events table schema (TESTDATA.md), for readStream sources that
    * cannot infer it. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded file source over a directory of event parquet drops. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1-hour windows per type; watermark bounds window state. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming windowed ACTIVE USERS — the real-time face of
    * EventOps.dauMau's DAU column: exact distinct users per tumbling
    * window, as the two-stage plan streaming requires (COUNT(DISTINCT)
    * is unsupported over streams because partial distinct sets can't
    * retract): dropDuplicates on (user, window) bounds state to one row
    * per user-window inside the watermark, and the downstream count is
    * a plain windowed agg. State and output are both
    * |active users per window|-bounded — the property that keeps exact
    * stream DAU deployable; beyond memory, the drop-in relaxation is
    * approx_count_distinct (HLL partials merge without retraction). */
  def windowedActiveUsers(events: DataFrame,
                          watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .select(col("user_id"), window(col("ts"), "1 hour").as("win"), col("ts"))
      .dropDuplicates("user_id", "win")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("win.start").as("window_start"), col("active_users"))

  /** Sliding 1-hour/30-minute windows. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"), col("sum_value"))

  /** Per-user session windows, 30-minute inactivity gap. */
  def sessionAggregate(events: DataFrame, watermark: String = "10 minutes",
                       gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming twin of EventOps.quantileSketch's histogram stage: per
    * tumbling window, fixed-grid bin counts over `value`. A streaming
    * job cannot two-pass for min/max, so the grid bounds are pinned up
    * front (from history or config) — the same fixed-grid property that
    * makes the batch sketch deterministic; out-of-range values clamp to
    * the edge bins instead of being dropped, so window mass is
    * conserved. State per window is ≤ nb bin rows regardless of volume,
    * partial histograms merge by bin-wise addition inside the windowed
    * agg (map-side combine) — the mergeable-sketch shape running
    * continuously. Quantile extraction stays the bounded probe of the
    * batch sketch, applied per emitted window downstream. */
  def windowedHistogram(events: DataFrame, lo: Double, hi: Double,
                        nb: Int = 64,
                        watermark: String = "10 minutes"): DataFrame = {
    // a zero-width grid would clamp every event into one edge bin — a
    // structurally valid but meaningless histogram; fail fast instead
    require(nb > 0 && hi > lo, s"need nb > 0 and hi > lo, got nb=$nb [$lo, $hi)")
    events.withWatermark("ts", watermark)
      .filter(col("value").isNotNull)
      .select(col("ts"),
        least(greatest(floor((col("value") - lo) / ((hi - lo) / nb)), lit(0L)),
          lit(nb - 1L)).cast("long").as("bin"))
      .groupBy(window(col("ts"), "1 hour"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("bin"), col("cnt"))
  }

  /** Streaming dedup — the streaming form of reference O7 (`url not in
    * caught_docs`): first event per (user, type) wins; state expires
    * with the watermark instead of growing forever. */
  def dedupFirstPerKey(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  final case class RawEventRow(event_id: Long, ts: java.sql.Timestamp,
                               user_id: Long, event_type: String,
                               value: Double, props: String)
  final case class AttribRow(event_id: Long, ts: java.sql.Timestamp,
                             user_id: Long, event_type: String,
                             value: Double, channel: String)
  final case class ClickState(tsMs: Long, channel: String)
  final case class Attribution(user_id: Long, event_id: Long,
                               ts: java.sql.Timestamp, channel: String,
                               value: Double)
  final case class FunnelState(stage: Int, ts: Long)
  final case class FunnelAdvance(user_id: Long, step: String,
    ts: java.sql.Timestamp)

  /** Streaming form of EventOps.funnel: a per-user monotone state
    * machine view → click → purchase that emits one row each time a
    * user advances a step (strictly-later timestamp required, matching
    * the batch funnel's min-timestamp chain for in-order streams: the
    * first qualifying event after the previous step IS that minimum).
    * State is one (stage, ts) pair per user — bounded by the user
    * population, not the event volume, the property that makes
    * streaming funnels deployable at firehose rates. */
  def funnelAdvances(spark: SparkSession, events: DataFrame,
                     watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val stepOf = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    events.withWatermark("ts", watermark)
      .select("event_id", "ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[FunnelAdvance]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val want = s.stage + 1
            if (want <= 3 && stepOf.get(e.event_type).contains(want) &&
                (s.stage == 0 || e.ts.getTime > s.ts)) {
              s = FunnelState(want, e.ts.getTime)
              out += FunnelAdvance(uid, s"${want}_${e.event_type}", e.ts)
            }
          }
          if (s.stage > 0) state.update(s)
          out.iterator
      }
      .toDF()
  }

  /** Streaming form of EventOps.lastTouchAttribution: each purchase is
    * credited AT ARRIVAL to the user's most recent preceding click
    * within the 3-day lookback (organic otherwise) — the real-time
    * revenue ticker the batch query reconciles nightly. The batch form
    * carries the latest click with a last(ignoreNulls) window; here the
    * SAME cursor is per-user state: ONE (ts, channel) pair per user —
    * bounded by the user population, not event volume, and each
    * purchase emits exactly once (append mode), the same per-event
    * discipline as [[funnelAdvances]]. The channel derivation (campaign
    * key from props.k mod 4) is the batch expression verbatim, so the
    * spec can assert stream-equals-batch on a replay.
    *
    * DELIVERY-ORDER CONTRACT (ADVICE r8): events are sorted by
    * (ts, event_id) only WITHIN each micro-batch, so attributions are
    * exact iff each user's events arrive batch-ordered (a click never
    * lands in a LATER batch than a purchase with a later timestamp).
    * Cross-batch out-of-order delivery finalizes the purchase with the
    * state as-of its batch — append mode emits no retraction; the
    * nightly batch reconciliation (EventOps.lastTouchAttribution) is
    * the correction path, and [[lastTouchAttributionsExact]] is the
    * retraction-free exact spelling (events buffer in state until the
    * watermark passes before emitting — trading the at-arrival latency
    * this ticker exists for). */
  def lastTouchAttributions(spark: SparkSession, events: DataFrame,
                            watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        when(col("event_type") === "click",
          graft.operators.EventOps.clickChannel(col("props"))).as("channel"))
      .as[AttribRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickState, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[AttribRow], state: GroupState[ClickState]) =>
          var s = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer.empty[Attribution]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (e.event_type == "click") {
              s = ClickState(e.ts.getTime, e.channel)
            } else if (e.event_type == "purchase") {
              val ch = if (s != null && e.ts.getTime - s.tsMs <= 3L * 86400000L)
                s.channel else "organic"
              out += Attribution(uid, e.event_id, e.ts, ch, e.value)
            }
          }
          if (s != null) state.update(s)
          out.iterator
      }
      .toDF()
  }

  final case class BufEvent(event_id: Long, tsMs: Long, event_type: String,
                            channel: String, value: Double)
  final case class ExactAttribState(clickTsMs: Long, channel: String,
                                    buf: List[BufEvent])

  /** Retraction-free EXACT form of [[lastTouchAttributions]] — the
    * watermark-buffered variant that closes the delivery-order gap the
    * low-latency ticker documents: instead of finalizing each purchase
    * with the cursor as-of its arrival batch, events BUFFER in per-user
    * state until the watermark passes their event time, then replay in
    * exact (ts, event_id) order — so a click that lands in a LATER
    * micro-batch than a purchase with a later timestamp still wins the
    * attribution, and append mode never needs a retraction. The price
    * is latency (one watermark delay) and state (the buffer holds at
    * most one watermark-window of events per user — watermark-bounded,
    * the same bound every windowed agg in this file lives under).
    *
    * Mechanics: an event-time timer on the earliest buffered timestamp
    * re-invokes the group when the watermark passes it even if the user
    * never sends another event, so buffered purchases drain without new
    * input. Rows older than the watermark are dropped by the stateful
    * operator itself (standard late-data semantics); everything younger
    * is exact. The click cursor that survives draining is the same ONE
    * (ts, channel) pair as the ticker's — buffer and cursor together
    * stay bounded by users × watermark-window, never event volume. */
  def lastTouchAttributionsExact(spark: SparkSession, events: DataFrame,
                                 watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        when(col("event_type") === "click",
          graft.operators.EventOps.clickChannel(col("props"))).as("channel"))
      .as[AttribRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ExactAttribState, Attribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[AttribRow], state: GroupState[ExactAttribState]) =>
          val prev = state.getOption
            .getOrElse(ExactAttribState(Long.MinValue, null, Nil))
          // only the two event types the attribution reads ever buffer
          val incoming = rows
            .filter(e => e.event_type == "click" || e.event_type == "purchase")
            .map(e => BufEvent(e.event_id, e.ts.getTime, e.event_type,
              e.channel, e.value))
            .toList
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = (prev.buf ++ incoming).partition(_.tsMs <= wm)
          var cursorTs = prev.clickTsMs
          var cursorCh = prev.channel
          val out = scala.collection.mutable.ListBuffer.empty[Attribution]
          ripe.sortBy(e => (e.tsMs, e.event_id)).foreach { e =>
            if (e.event_type == "click") {
              cursorTs = e.tsMs; cursorCh = e.channel
            } else {
              val ch = if (cursorCh != null && e.tsMs - cursorTs <= 3L * 86400000L)
                cursorCh else "organic"
              out += Attribution(uid, e.event_id,
                new java.sql.Timestamp(e.tsMs), ch, e.value)
            }
          }
          if (pending.isEmpty && cursorCh == null) state.remove()
          else {
            state.update(ExactAttribState(cursorTs, cursorCh, pending))
            if (pending.nonEmpty)
              // must be strictly past the current watermark; the min
              // pending ts is by construction, but guard the boundary
              state.setTimeoutTimestamp(math.max(pending.map(_.tsMs).min, wm + 1L))
          }
          out.iterator
      }
      .toDF()
  }

  /** Stream-static join: enrich the event stream with a static
    * dimension (broadcastable per micro-batch — the streaming analogue
    * of the relational core's broadcast dim joins). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream inner join: purchases matched to same-user signups
    * within one hour. Both sides carry watermarks and the join
    * condition bounds event-time distance, so each side's state buffer
    * is reclaimable — the two requirements for unbounded stream-stream
    * joins. (Batch analogue: the as-of window in EventOps.) */
  def purchasesAfterSignup(events: DataFrame,
                           watermark: String = "10 minutes",
                           joinType: String = "inner"): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    // joinType "leftOuter" = the attribution-with-misses form: an
    // unmatched purchase emits (s_ts NULL) once the watermark passes the
    // end of its join window and no signup can still arrive — same
    // bounded-state argument, plus a completeness guarantee the inner
    // form cannot give (every purchase appears exactly once)
    purchases.join(signups,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR"),
      joinType)
      .select(col("p_event"), col("p_user").as("user_id"),
        col("p_ts"), col("s_ts"))
  }

  /** Custom sessionization with flatMapGroupsWithState + event-time
    * timeout: sessions accumulate in per-user state and are EMITTED
    * EXACTLY ONCE, when closed — either by a later in-batch event
    * beyond the gap, or by the watermark passing end+gap (the timeout).
    * This is the fully-custom form of [[sessionAggregate]] (use it when
    * session_window's fixed semantics don't fit); state is one record
    * per open session, reclaimed on timeout — bounded like the
    * reference's frontier sets never were (index.py:117-120). */
  def sessionAssembly(spark: SparkSession, events: DataFrame,
                      gapMs: Long = 30L * 60 * 1000,
                      watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.withWatermark("ts", watermark)
      .select("event_id", "ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          def close(s: SessionState) = SessionOut(uid,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end + gapMs),
            s.n, s.total)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close)
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.end <= gapMs =>
                  Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= close(s)
                  Some(SessionState(t, t, 1, e.value))
                case None => Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
      .toDF()
  }

  /** Arbitrary stateful processing: per-user running totals carried
    * across micro-batches via mapGroupsWithState (update mode). The
    * state is one small record per user — the bounded-state version of
    * the reference's in-memory frontier sets. */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { e => n += 1; total += e.value }
          val next = UserTotals(uid, n, total)
          state.update(next)
          next
      }
      .toDF()
  }

  /** Stream-static TIME-TRAVEL enrichment — the streaming face of the
    * batch SCD2 interval lookup (EventOps.scd2Lookup): each arriving
    * fact joins the STATIC versioned dimension on key + interval
    * containment. Stream-static inner joins are STATELESS — no
    * watermark, no join state; every micro-batch just probes the
    * static side (broadcast while the dimension fits, the usual case
    * for a versioned dim) — which is exactly how a warehouse dimension
    * is consumed from a stream at 100 TB: the dim refreshes by
    * re-registration, the stream never rewinds. Expects `facts` with
    * (event_id, user_id, ts_ms) and `dim` with (d_user, dim_version,
    * dim_value, valid_from_ms, valid_to_ms). */
  def scd2EnrichStream(facts: DataFrame, dim: DataFrame): DataFrame =
    facts.join(dim,
      facts("user_id") === dim("d_user") &&
        facts("ts_ms") >= dim("valid_from_ms") &&
        (dim("valid_to_ms").isNull || facts("ts_ms") < dim("valid_to_ms")))
      .select(facts("event_id"), facts("user_id"), facts("ts_ms"),
        dim("dim_version"), dim("dim_value"))

  /** CDC target snapshot schema: one row per key with its newest
    * version (user_id, value, ts_ms, event_id, tombstone). Deleted keys
    * KEEP a tombstone row carrying the delete's (ts, event_id) — the
    * high-water mark that stops a late-arriving older write from
    * resurrecting the key (the standard compacted-log discipline;
    * physically dropping the row would forget when the delete
    * happened). [[cdcLive]] is the live view. The whole CDC path stays
    * in DataFrame space (VERDICT r8 #3): no driver-side collect —
    * the reduce, the merge, and the snapshot are all distributed, so
    * the pattern a user copies into a 100 TB foreachBatch is the
    * scale-safe one. */
  def cdcEmptySnapshot(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = false),
        StructField("ts_ms", LongType, nullable = false),
        StructField("event_id", LongType, nullable = false),
        StructField("tombstone", BooleanType, nullable = false))))

  /** The live (non-tombstone) rows of a CDC target snapshot. */
  def cdcLive(snapshot: DataFrame): DataFrame =
    snapshot.filter(!col("tombstone"))

  /** Per-micro-batch CDC reduction — the streaming face of
    * EventOps.cdcApply's changelog semantics: collapse the batch to
    * each key's LAST write by (ts, event_id), carrying whether that
    * write is a tombstone (event_type 'view', matching the batch op's
    * delete rule). This is the Spark side of a foreachBatch MERGE: the
    * batch shrinks to one row per touched key BEFORE anything reaches
    * the merge, so the merge input is |keys in batch|, never |events|.
    * Stays a DataFrame — never collected to the driver. */
  def cdcBatchLastWrites(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    batch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("value"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"), (col("event_type") === "view").as("tombstone"))
  }

  /** MERGE-shaped last-write-wins upsert of a reduced batch into the
    * target snapshot — a full-outer join on key, keeping per key
    * whichever version is NEWER by (ts_ms, event_id) (replayed batches
    * lose every comparison, which is what makes checkpoint-recovery
    * replays idempotent). A winning tombstone is STORED, not removed:
    * its (ts, event_id) high-water mark must keep outranking
    * late-arriving older writes in FUTURE batches, or a stale update
    * would resurrect the deleted key (streams deliver in arrival
    * order, not event order). This is `MERGE INTO target USING reduced
    * ON key WHEN MATCHED AND newer THEN UPDATE WHEN NOT MATCHED THEN
    * INSERT` spelled as a join — swap the snapshot for a Delta/Iceberg
    * table and the same shape runs against a lakehouse whose deletes
    * compact away only after the late-data horizon. The caller
    * materializes the result per batch (write/localCheckpoint), which
    * is the `MERGE` commit; the join shuffles |keys|-sized narrow rows
    * only, never raw events. */
  def cdcMerge(snapshot: DataFrame, reduced: DataFrame): DataFrame = {
    val pack = (d: DataFrame, as: String) => d.select(col("user_id"),
      struct(col("value"), col("ts_ms"), col("event_id"),
        col("tombstone")).as(as))
    pack(snapshot, "cur").join(pack(reduced, "inc"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("cur").isNull, col("inc"))
          .when(col("inc").isNull, col("cur"))
          .when(col("inc.ts_ms") > col("cur.ts_ms") ||
            (col("inc.ts_ms") === col("cur.ts_ms") &&
              col("inc.event_id") > col("cur.event_id")), col("inc"))
          .otherwise(col("cur")).as("v"))
      .select(col("user_id"), col("v.value").as("value"),
        col("v.ts_ms").as("ts_ms"), col("v.event_id").as("event_id"),
        col("v.tombstone").as("tombstone"))
  }

  /** O22 (rate limiting) — the engine-side form. The reference
    * throttles by sleeping between fetches (index.py:176-178,
    * DOWNLOAD_DELAY): a single-process politeness knob on the
    * ingestion loop. In a distributed engine that knob is SOURCE
    * ADMISSION CONTROL: cap what the unbounded source admits per
    * micro-batch, so a backlog drains at a bounded, predictable rate
    * instead of one giant catch-up batch that floods downstream state
    * (and, for politeness proper, bounds the request rate any
    * fetch-stage `foreachBatch` issues against an origin). The file
    * source's `maxFilesPerTrigger` is that cap; the kafka twin is
    * `maxOffsetsPerTrigger`. Downstream operators are untouched —
    * throttling composes at the source boundary, exactly where the
    * reference put its sleep. */
  def throttledIngest(spark: SparkSession, dir: String, schema: StructType,
                      maxFilesPerTrigger: Int): DataFrame = {
    require(maxFilesPerTrigger > 0, s"cap must be positive: $maxFilesPerTrigger")
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
  }
}

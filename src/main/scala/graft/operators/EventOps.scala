package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.RelationalOps.{money, moneySum}

/** Event-stream analytics over the `events` table (SURVEY.md §2.2
  * Streaming/Windows, EXT). Every query here is the BATCH form of a
  * streaming computation — `window`/`session_window` work identically on
  * static DataFrames, which keeps the DuckDB oracle applicable; the
  * streaming forms (readStream + watermark) live in
  * graft.streaming.EventStreamOps.
  *
  * Scale notes: all aggregations key on (user_id) or (window bucket,
  * type) — high-cardinality enough to parallelize, low enough not to
  * skew. Window functions partition by user_id (~1.5k users/M events):
  * one shuffle, no driver state. Value sums accumulate in exact
  * DECIMAL(12,2) and emit as double (oracle-type parity — see
  * RelationalOps design notes).
  */
object EventOps {

  /** Tumbling 1-hour windows per event type (streaming: groupBy(window)).
    * Epoch-aligned buckets; one small shuffle after map-side combine. */
  def tumblingWindowStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy("window_start", "event_type")

  /** Sliding windows: 1-hour length, 30-minute slide — each event lands
    * in exactly two buckets (Spark expands via a generator; fan-out is
    * bounded = length/slide, map-side). */
  def slidingWindowStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start")
        .as("window_start"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy("window_start")

  /** Session windows per user, 30-minute inactivity gap
    * (streaming: session_window + watermark). session_end follows
    * Spark's definition: last event ts + gap. */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** As-of join: for every purchase, the latest signup at-or-before it
    * for the same user. Expressed as union + cumulative-max window — one
    * shuffle on user_id, no per-row subquery; this is the scalable as-of
    * pattern (sort within partition, single pass). */
  def asofPurchaseSignup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "signup", 0).otherwise(1).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_signup_ts",
        max(when(col("kind") === 0, col("ts"))).over(w))
      .filter(col("kind") === 1)
      .select("event_id", "user_id", "ts", "last_signup_ts")
      .orderBy("event_id")
  }

  /** JSON prop extraction (events.props is a JSON string): parse `$.k`,
    * aggregate per event type. At scale the parse is codegen'd per row —
    * no UDF. */
  def jsonPropsStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Semi-structured props via VARIANT (the Spark 4 open variant
    * encoding — the lakehouse answer to schemaless JSON columns): the
    * JSON string parses ONCE into the binary variant form and every
    * extraction is a typed path read on that, vs [[jsonPropsStats]]'
    * `get_json_object` which re-parses the string per path (the classic
    * N-paths-N-parses tax this type exists to remove). Missing paths
    * read as NULL through `try_variant_get` — counted here as the
    * schema-drift signal an ingest monitor watches. At 100 TB the
    * variant column is what lands in parquet (shredded by the writer),
    * and this row-local decode is the scan-adjacent shape.
    *
    * Plan: one scan, one map-side-combined aggregate — identical
    * exchange budget to the JSON-string twin, so the two queries price
    * the FORMAT, not the plan. */
  def variantProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      // try_parse_json: a malformed props row becomes a NULL variant
      // (every path reads NULL, so the row drops out of the n_with_k /
      // path counters but still counts in n_events) instead of failing
      // the query — the tolerance the json-string twin
      // (get_json_object) and the DuckDB oracle already have
      .withColumn("v", expr("try_parse_json(props)"))
      .select(col("event_type"),
        expr("try_variant_get(v, '$.k', 'long')").as("k"),
        expr("try_variant_get(v, '$.missing', 'long')").as("miss"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("miss")).as("n_missing_path"))
      .orderBy("event_type")

  /** Per-user running total of value over time (cumulative frame window).
    * Explicit ROWS frame + unique (ts, event_id) ordering keeps it
    * deterministic under ties. */
  def userRunningTotals(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("running_value", sum(money(col("value"))).over(w).cast("double"))
      .select("user_id", "event_id", "ts", "running_value")
      .orderBy("user_id", "event_id")
  }

  /** lag(): millisecond gap between consecutive events of a user. */
  def eventGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("gap_ms",
        unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)))
      .select("user_id", "event_id", "gap_ms")
      .orderBy("user_id", "event_id")
  }

  /** RANGE-frame window: per-user rolling 1-hour sum of value, keyed on
    * event-time millis (ties at the same timestamp all join the frame —
    * standard RANGE semantics, deterministic without a row tiebreak). */
  def rolling1hSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    Tables.events(spark, sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("rolling_1h",
        sum(money(col("value"))).over(w).cast("double"))
      .select("user_id", "event_id", "rolling_1h")
      .orderBy("user_id", "event_id")
  }

  /** Typed-Aggregator UDAF: top-3 event ids by value per event type
    * (graft.functions.TopKAggregator — bounded k-row buffers map-side,
    * so the shuffle is k rows per partition per group). */
  def topEventsPerType(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = graft.functions.TopKAggregator.topK(3)
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(topk(col("event_id"), col("value")).as("top_ids"))
      .orderBy("event_type")
  }

  /** Markov transition matrix over event types: count of each
    * (from_type → to_type) step in every user's (ts, event_id)-ordered
    * stream, with the row-conditional probability in exact integer
    * basis points (10000·n div row_total — floor division, no float).
    * The behavioral-model summary a product-analytics pipeline derives
    * before simulating or anomaly-scoring user flows.
    *
    * Scale shape: ONE user-window exchange (shared with every other
    * per-user sequence op), then the corpus collapses to ≤|types|²
    * rows — the per-row share join touches only that bounded table. */
  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // persisted: the ≤|types|² table feeds both the share join and the
    // row-total aggregate — without the pin the second consumer re-runs
    // the full corpus window pass (caller clearCache()s after the action)
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = trans.groupBy("from_type")
      .agg(sum(col("n_transitions")).as("tot"))
    trans.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        call_function("div", lit(10000L) * col("n_transitions"), col("tot"))
          .as("share_bp"))
      .orderBy("from_type", "to_type")
  }

  /** lead(): the next event's type and the seconds until it, per user —
    * the forward-looking companion of [[eventGaps]]. */
  def nextEvent(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("secs_to_next",
        ((unix_millis(lead(col("ts"), 1).over(w)) - unix_millis(col("ts"))) / 1000.0))
      .select("user_id", "event_id", "next_type", "secs_to_next")
      .orderBy("user_id", "event_id")
  }

  /** Boundary-value windows: each user's first, last, and second event
    * type alongside every event — first_value / last_value / nth_value
    * over the FULL partition frame (rows between unbounded preceding
    * and unbounded following; the default last_value frame stops at the
    * current row and would echo each row back at itself). Ordering is
    * (ts, event_id) — the event_id tiebreak makes all three picks
    * deterministic when timestamps collide. One shuffle (the user
    * window); the full-frame functions are evaluated in the same pass
    * as any other window over this partitioning. */
  def firstLastPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy("user_id", "event_id")
  }

  /** CDC changelog apply (Debezium/Delta-CDF shape): reduce a keyed
    * change stream to its current snapshot — LAST write wins per key,
    * tombstones delete. The events table plays the changelog: per
    * user, ops ordered by (ts, event_id); 'view' rows are deletes,
    * everything else upserts its value. One window shuffle on the key;
    * the snapshot is row_number()=1 over the DESCENDING sequence, so
    * each key's state is decided by its latest entry no matter how
    * many precede it — the batch form of mapGroupsWithState's
    * last-value state, and the apply step of [[upsertMerge]] when the
    * changelog carries multiple generations per key. Keys whose final
    * op is a delete vanish from the snapshot (the semantic exact-merge
    * MERGE WHEN MATCHED AND op='D' THEN DELETE). */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("op", when(col("event_type") === "view", "D").otherwise("U"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("user_id"), col("value").as("current_value"), col("n_changes"))
      .orderBy("user_id")
  }

  /** SCD2 history build: turn a keyed change stream into versioned
    * dimension rows — each change opens an interval [valid_from,
    * valid_to) closed by the NEXT change's timestamp; the open
    * (current) version has NULL valid_to. The standard warehouse
    * slowly-changing-dimension type-2 load, and the interval-form twin
    * of [[cdcApply]]'s point-in-time snapshot: joining a fact to this
    * table on key + ts BETWEEN valid_from AND valid_to is time-travel.
    * One window shuffle on the key; intervals derive from lead() so no
    * self-join touches the log. Millis columns for oracle parity. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("valid_from_ms", unix_millis(col("ts")))
      .withColumn("valid_to_ms", unix_millis(lead(col("ts"), 1).over(w)))
      .withColumn("is_current", lead(col("ts"), 1).over(w).isNull)
      .select("user_id", "event_id", "value",
        "valid_from_ms", "valid_to_ms", "is_current")
      .orderBy("user_id", "event_id")
  }

  /** Time-weighted average: each observation holds until the next one,
    * so its weight is its interval's duration — the correct mean for
    * irregularly-sampled gauges (sensor readings, account balances),
    * where the arithmetic mean over-counts bursts. Exact arithmetic:
    * cent-scaled values × millisecond durations accumulate in
    * DECIMAL(38,0) (cents·ms products overflow BIGINT at corpus
    * scale), one division at the end. The last observation per key has
    * no successor and drops out, standard left-closed convention. One
    * window shuffle shared by lead() and the final per-key aggregate's
    * groupBy — same key, so AQE plans one exchange. */
  def timeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("dur_ms",
        unix_millis(lead(col("ts"), 1).over(w)) - unix_millis(col("ts")))
      .filter(col("dur_ms").isNotNull)
      .withColumn("cents", (money(col("value")) * 100).cast(DecimalType(38, 0)))
      .groupBy("user_id")
      .agg(
        (sum(col("cents") * col("dur_ms")).cast(DecimalType(38, 0)).cast("double") /
          sum(col("dur_ms")).cast("double") / 100.0).as("tw_avg"),
        sum(col("dur_ms")).as("total_ms"))
      .orderBy("user_id")
  }

  /** Per-key 2σ anomaly flags in EXACT integer arithmetic: |x−μ| > 2σ
    * rewritten scale-free as (n·x−S)² > 4·(n·Sxx−S²) over cent-scaled
    * values, so no mean, variance, or square root is ever computed in
    * floating point — the flags are bit-identical across engines and
    * fold orders, where the float z-score would waver for points near
    * the boundary. Sums accumulate in DECIMAL(38,0) (the products
    * overflow BIGINT once a key holds ~1e9 rows of 5-digit cents).
    * One window shuffle on the key carries count, sum, and
    * sum-of-squares together; the comparison is row-local. The same
    * shape serves any sigma multiple — the literal 4 is (2σ)². */
  def anomalyFlags2Sigma(spark: SparkSession, sfDir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val d38 = DecimalType(38, 0)
    Tables.events(spark, sfDir)
      .withColumn("c", (money(col("value")) * 100).cast(d38))
      .withColumn("n", count(lit(1)).over(wu).cast(d38))
      .withColumn("s", sum(col("c")).over(wu).cast(d38))
      .withColumn("sxx", sum(col("c") * col("c")).over(wu).cast(d38))
      .withColumn("dev", col("n") * col("c") - col("s"))
      .select(col("user_id"), col("event_id"),
        (col("dev") * col("dev") >
          lit(4) * (col("n") * col("sxx") - col("s") * col("s")))
          .as("is_anomaly"))
      .orderBy("user_id", "event_id")
  }

  /** Deterministic dedup: earliest event per (user_id, event_type) — the
    * batch analogue of streaming dropDuplicatesWithinWatermark (O7). */
  def earliestEventPerUserType(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(min(col("event_id")).as("first_event_id"),
           min(col("ts")).as("first_ts"),
           count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")

  /** Skew-mitigation shape: two-phase salted aggregation. Phase 1
    * splits every group key across 8 salt buckets (hot keys fan out
    * over 8 reducers instead of one); phase 2 merges the partial
    * aggregates. Results are exactly the direct aggregation (decimal
    * partials re-summed exactly), which is what the oracle checks —
    * the point of the query is the plan shape under a skewed key. */
  def saltedUserTotals(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("user_id", "salt")
      .agg(sum(money(col("value"))).as("psum"), count(lit(1)).as("pn"))
      .groupBy("user_id")
      .agg(sum(col("psum")).cast("double").as("total_value"),
           sum(col("pn")).as("n"))
      .orderBy("user_id")

  /** Histogram binning: event values into width-10 buckets (floor
    * division — portable, handles negatives identically on both
    * engines). The one-pass distributed histogram shape. */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(floor(col("value") / 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("value")).as("sum_value"))
      .orderBy("bucket")

  /** Pivot: per-user counts by event type (fixed value list so the plan
    * is a single agg, no extra distinct pass). */
  def userTypePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy("user_id")

  /** Funnel analysis view → click → purchase: users advance a step only
    * with a strictly-later event of the next type (min-timestamp per
    * step — the standard ordered-funnel semantics). Each step is one
    * user_id-keyed join + hash aggregate, so the funnel runs in
    * #steps shuffles on the same key — co-partitioned end-to-end under
    * bucketing on user_id (SURVEY §8.1), never a per-user sort. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    t1.agg(lit("1_view").as("step"), count(lit(1)).as("users"))
      .unionAll(t2.agg(lit("2_click").as("step"), count(lit(1)).as("users")))
      .unionAll(t3.agg(lit("3_purchase").as("step"), count(lit(1)).as("users")))
      .orderBy("step")
  }

  /** Funnel TIME-TO-CONVERT: per-transition latency statistics for the
    * view→click→purchase funnel — the "how long does each step take"
    * companion of [[funnel]]'s "how many make it". Reuses the funnel's
    * strictly-later step timestamps (first qualifying event per step
    * per user), emits per-transition user counts with exact integer
    * millisecond latencies: min / max / the 3-MAD-free median via the
    * exact percentile (parity pinned by rel_median_price) / the exact
    * integer mean in floored ms. All three step tables are user-keyed
    * aggregates of the same scan; the final stats collapse to 2 rows.
    * At 100 TB the per-user step tables are the only |users|-sized
    * state, identical to the funnel itself. */
  def funnelLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"), min(col("t1")).as("t1m"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2.select("user_id", "t2"), "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"), min(col("t2")).as("t2m"))
    def stats(df: DataFrame, from: org.apache.spark.sql.Column,
              to: org.apache.spark.sql.Column, name: String) = {
      val lat = (unix_millis(to) - unix_millis(from)).as("lat_ms")
      df.select(lat).agg(
        lit(name).as("transition"),
        count(lit(1)).as("n_users"),
        min(col("lat_ms")).as("min_ms"),
        percentile(col("lat_ms"), lit(0.5)).as("median_ms"),
        max(col("lat_ms")).as("max_ms"),
        floor(sum(col("lat_ms")) / count(lit(1))).cast("long").as("mean_ms_floor"))
    }
    stats(t2, col("t1m"), col("t2"), "1_view_to_click")
      .unionAll(stats(t3, col("t2m"), col("t3"), "2_click_to_purchase"))
      .orderBy("transition")
  }

  /** Cohort retention: users grouped by the week of their first event,
    * counted as active in every week they appear — the engagement
    * matrix every product-analytics stack computes. Two aggregates
    * (first-week per user; distinct user-weeks) and one join, all keyed
    * on user_id; week arithmetic is exact integer day math on
    * week-truncated timestamps (both engines truncate to Monday, the
    * session is pinned UTC). */
  /** Hourly gap-fill (the "date spine" pattern): every (hour, type)
    * cell of the full observation range gets a row, zero-filled where no
    * events landed — what downstream time-series models and dashboards
    * need (a missing bucket and an empty bucket are different facts).
    * The spine derives from the data's own min/max hour: a 2-value
    * aggregate explodes into the hour sequence (spine length = range
    * hours, independent of event count), cross-joins the distinct type
    * dimension, and LEFT-joins the pre-aggregated counts — the fact
    * table is aggregated BEFORE the join, so the spine join touches
    * (hours × types) rows, never raw events. */
  def hourlyGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val spine = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("hr"))
    val types = ev.select("event_type").distinct()
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
    spine.crossJoin(types)
      .join(counts, Seq("hr", "event_type"), "left")
      .select(col("hr"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("hr", "event_type")
  }

  /** KMV (k-minimum-values) distinct sketch next to its exact answer —
    * the MERGEABLE distinct estimator (Bar-Yossef 2002, public; the
    * theta-sketch family): keep the k smallest hash values of the key
    * domain; the kth smallest h_k estimates distinct ≈ (k-1)·M/h_k for
    * hash space [0, M). Unlike RNG-seeded sampling the sketch is
    * DETERMINISTIC — the k minima of the portable polynomial hash are
    * the same values on any engine, any partitioning, any cluster size
    * — so this one is oracle-checkable where engine-native HLL is
    * spec-only (the approx-distinct spec keeps covering that).
    *
    * Scale shape: the k-minima aggregate is bounded state per partition
    * (TakeOrdered: each partition surfaces at most k candidates, k rows
    * cross the exchange) and UNIONS of sketches are sketches of unions —
    * the property that lets a 100 TB scan sketch per-partition and merge
    * on the driver-free path. Estimate arithmetic is BIGINT floor ops. */
  def kmvDistinct(spark: SparkSession, sfDir: String, k: Int = 64): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    // the 16-char constant SUFFIX is what makes the polynomial hash
    // usable as a KMV key: ids hash left-to-right, so the salt applies
    // a further x -> 31^16·x + K mod M to every id's partial hash —
    // 31^16 ≈ 3e23 wraps the modulus ~1e8 times, spreading the short
    // near-consecutive id strings (whose raw hashes are tiny and
    // clustered, uselessly biasing the k-th minimum) into an
    // equidistributed sequence over [0, M)
    val hashes = ev
      .select(graft.operators.TextOps.polyHash(
        concat(col("user_id").cast("string"), lit("-kmv-sketch-salt"))).as("h"))
      .distinct()
    val exact = ev.agg(countDistinct(col("user_id")).as("n_exact"))
    hashes.orderBy("h").limit(k)
      .agg(count(lit(1)).cast("long").as("k_seen"), max(col("h")).as("kth_hash"))
      .crossJoin(broadcast(exact))
      .select(col("n_exact"), col("k_seen"), col("kth_hash"),
        // fewer than k distinct values = the sketch holds them ALL and
        // knows the count exactly (standard KMV small-cardinality case)
        when(col("k_seen") < k, col("k_seen"))
          .otherwise(
            expr(s"CAST(${(k - 1).toLong * TextOps.HashMod} DIV kth_hash AS BIGINT)"))
          .as("est_kmv"))
  }

  /** Mergeable fixed-grid quantile sketch over event values — the
    * histogram member of the sketch family (alongside CMS terms and KMV
    * distinct): p50/p90/p95/p99 estimated from a 1024-bin equi-width
    * histogram with linear interpolation inside the quantile's bin.
    *
    * Like KMV (and unlike t-digest/KLL, whose centroid placement is
    * order-dependent), the sketch is DETERMINISTIC: the grid is fixed
    * by (min, max, 1024), so the bin counts — and therefore the
    * estimates — are identical on any engine and any partitioning,
    * which is what makes it oracle-checkable.
    *
    * Scale shape: one scalar agg (min/max/count, broadcast back), then
    * one map-side-combined agg into ≤1024 bins — partial histograms
    * merge by bin-wise addition, so each partition ships at most 1024
    * rows. The cumulative window and the quantile probe join run over
    * the BOUNDED bin table (≤1024 rows), never data rows; the probe
    * side is 4 literal quantiles. Two passes over the data, constant
    * sketch state — the classic scalable approx-quantile. */
  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    // null values carry no quantile information and their bin would sort
    // differently across engines — excluded symmetrically on both sides
    val ev = Tables.events(spark, sfDir).select(col("value"))
      .filter(col("value").isNotNull)
    fixedGridQuantiles(ev, 1024, Seq(0.5, 0.9, 0.95, 0.99)).orderBy("p")
  }

  /** The ONE definition of the global fixed-grid histogram quantile
    * estimator (shared by [[quantileSketch]] and [[winsorize]]; the
    * grouped per-key variant lives in [[quantileSketchByType]]):
    * pin the grid from (min, max, nb), histogram `value` into ≤nb bins
    * (degenerate single-value distributions take bin 0 — width would
    * be 0), cumulate over the bounded bin table (single partition by
    * construction), and probe each requested quantile with linear
    * interpolation inside its bin. Returns (p, est) rows. */
  private def fixedGridQuantiles(ev: DataFrame, nb: Int,
                                 qs: Seq[Double]): DataFrame = {
    val spark = ev.sparkSession
    val stats = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"),
      count(lit(1)).as("n"))
    val bins = ev.crossJoin(broadcast(stats))
      .select(when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(floor((col("value") - col("mn")) /
          ((col("mx") - col("mn")) / nb)).cast("long"), lit(nb - 1L)))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val wb = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bins.withColumn("cum", sum(col("cnt")).over(wb))
    import spark.implicits._
    val ps = qs.toDF("p")
    ps.crossJoin(cum).crossJoin(broadcast(stats))
      .filter(col("cum") >= col("p") * col("n") &&
        col("cum") - col("cnt") < col("p") * col("n"))
      .select(col("p"),
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") +
            ((col("mx") - col("mn")) / nb) * (col("bin") +
              (col("p") * col("n") - (col("cum") - col("cnt"))) / col("cnt")))
          .as("est"))
  }

  /** Winsorization — the robust-statistics companion of the anomaly
    * flags: clamp the value distribution to its sketch-estimated
    * [p05, p95] so a handful of extreme rows cannot dominate a sum or
    * mean (the standard pre-aggregation defense for metrics fed by
    * untrusted events). Bounds come from the SAME deterministic
    * fixed-grid histogram as [[quantileSketch]] (identical doubles on
    * both engines), then get FLOORED TO CENTS so the clamp and the
    * winsorized total run in exact BIGINT arithmetic — a float
    * winsorized sum would be partition-fold-order-dependent and could
    * never hash-gate. Two scans of events (sketch pass + clamp pass),
    * both map-side combined; every intermediate table is ≤1024 rows. */
  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("value"))
      .filter(col("value").isNotNull)
    val bounds = fixedGridQuantiles(ev, 1024, Seq(0.05, 0.95))
      .groupBy()
      .agg(floor(min(when(col("p") === 0.05, col("est"))) * 100).cast("long").as("lo_cents"),
        floor(min(when(col("p") === 0.95, col("est"))) * 100).cast("long").as("hi_cents"))
    Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select((money(col("value")) * 100).cast("long").as("cents"))
      .crossJoin(broadcast(bounds))
      .select(col("lo_cents"), col("hi_cents"), col("cents"),
        least(greatest(col("cents"), col("lo_cents")), col("hi_cents")).as("w"))
      .groupBy("lo_cents", "hi_cents")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L)).as("n_clipped_hi"),
        sum(col("w")).as("sum_winsorized_cents"),
        sum(col("cents")).as("sum_raw_cents"))
  }

  /** GROUPED fixed-grid quantile sketch: p50/p95 per event type — the
    * per-key face of [[quantileSketch]], proving the sketch's
    * mergeability composes with grouping. Each key pins its OWN grid
    * from its (min, max): the stats table is |types| rows and joins
    * back as a broadcast; bin histograms are map-side-combined into
    * ≤|types|·256 rows; the cumulative window partitions BY KEY over
    * that bounded table (never data rows). Same two-pass, constant
    * per-key state at any volume — the GROUP BY approx_percentile
    * replacement that stays deterministic and hash-gateable. */
  def quantileSketchByType(spark: SparkSession, sfDir: String): DataFrame = {
    val nb = 256
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val stats = ev.groupBy("event_type").agg(min(col("value")).as("mn"),
      max(col("value")).as("mx"), count(lit(1)).as("n"))
    val bins = ev.join(broadcast(stats), "event_type")
      .select(col("event_type"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("value") - col("mn")) /
            ((col("mx") - col("mn")) / nb)).cast("long"), lit(nb - 1L)))
          .as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins.withColumn("cum", sum(col("cnt")).over(wb))
    import spark.implicits._
    val ps = Seq(0.5, 0.95).toDF("p")
    ps.crossJoin(cum).join(broadcast(stats), "event_type")
      .filter(col("cum") >= col("p") * col("n") &&
        col("cum") - col("cnt") < col("p") * col("n"))
      .select(col("event_type"), col("p"),
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") +
            ((col("mx") - col("mn")) / nb) * (col("bin") +
              (col("p") * col("n") - (col("cum") - col("cnt"))) / col("cnt")))
          .as("est"))
      .orderBy("event_type", "p")
  }

  /** Gap-based sessionization in the PORTABLE windowed spelling:
    * new-session flag (gap > 30 min by lag()) + running sum = session
    * ordinal, then per-session bounds — the classic two-window pattern
    * every SQL warehouse runs, and the cross-engine twin of
    * [[sessionWindows]]'s built-in session_window (identical session
    * boundaries at the same gap; the spec asserts the equivalence).
    * The lag and the running sum share one (user) window exchange; the
    * per-(user, session) agg adds the second and final one. */
  def sessionizeByGap(spark: SparkSession, sfDir: String,
                      gapMinutes: Long = 30L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull ||
          col("ts_ms") - col("prev_ms") > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_nb",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_nb")
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_nb")
  }

  /** Session path analysis — the top N three-step event-type paths
    * inside gap-sessionized visits ("view>click>purchase"), the
    * navigation-mining report a product warehouse builds from raw
    * events. Paths never cross a session boundary.
    *
    * ONE user-keyed window pass does everything: the gap flags and the
    * running session number ([[sessionizeByGap]]'s spelling), then the
    * two event-type leads AND a 2-ahead lead of the session number over
    * the SAME (user, (ts,event_id)) window — a triple is in-session iff
    * lead(session_nb, 2) equals the current session_nb (session numbers
    * are monotone within a user), so no re-partition by (user, session)
    * is ever needed: the corpus crosses one exchange, every window
    * shares its sort. Path counting is a map-side-combined agg over
    * ≤|event_type|³ groups; TakeOrdered ends it. */
  def pathAnalysis(spark: SparkSession, sfDir: String,
                   gapMinutes: Long = 30L, topN: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull ||
          col("ts_ms") - col("prev_ms") > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("sn",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .withColumn("sn3", lead(col("sn"), 2).over(w))
      .filter(col("sn3") === col("sn"))
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(topN)
  }

  /** Seasonal-naive forecast evaluation — the baseline every revenue
    * forecast is judged against (forecast(d) = actual(d − 7), the
    * weekly-seasonal random walk): per day-of-week, how far off is the
    * naive model in absolute cents? A model that can't beat this table
    * isn't a model. All integers end to end: daily revenue in DECIMAL
    * cents, absolute errors summed in BIGINT, day-of-week = day-index
    * mod 7 (calendar-free, identical both engines); the only double is
    * the final MAE division, one correctly-rounded op.
    *
    * Scale shape: the corpus collapses to ≤ one row per day in a single
    * map-side-combined aggregate; the lag-7 alignment is a self-join of
    * that day table with itself (day-range-bounded — never a data-row
    * window), and the report is a 7-row aggregate. */
  def seasonalNaiveEval(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(expr("unix_millis(ts) DIV 86400000").as("day"))
      .agg(sum((money(col("value")) * 100).cast("long")).as("cents"))
    val prev = daily.select((col("day") + 7).as("day"),
      col("cents").as("forecast_cents"))
    daily.join(prev, "day")
      .select((col("day") % 7).as("dow"),
        abs(col("cents") - col("forecast_cents")).as("abs_err"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        sum(col("abs_err")).as("total_abs_err_cents"))
      .select(col("dow"), col("n_days"), col("total_abs_err_cents"),
        (col("total_abs_err_cents").cast("double") / col("n_days"))
          .as("mae_cents"))
      .orderBy("dow")
  }

  /** Binned interval-overlap join — sessions × promo windows, the
    * "which visits happened during which campaign" report, and the
    * demonstration of the standard DISTRIBUTED range-join technique: a
    * pure interval-overlap theta-join has no equi key, so the naive
    * plan is a cartesian (broadcast-nested-loop) — instead both
    * interval sets explode into the HOUR BINS they cover, the bin is
    * the equi-join key (bins bound the candidates: a pair meets only
    * in a shared hour), duplicates from multi-bin spans collapse in
    * one distinct, and the EXACT overlap predicate verifies — the
    * bin-then-verify shape every dedup candidate generator here uses,
    * applied to time. Bin width trades fan-out (≤ span/width rows per
    * interval) against candidate precision, the knob a 100 TB interval
    * join tunes.
    *
    * Promo windows are synthesized deterministically off the corpus min
    * timestamp (12 windows, one day long, every other day), so both
    * engines build the identical calendar. Sessions are inclusive
    * [start, end] point sets (a single-event session is a 1 ms point);
    * promos are [ps, pe) — overlap_ms = min(e, pe−1) − max(s, ps) + 1. */
  def promoSessionOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val BIN = 3600000L
    val sess = sessionizeByGap(spark, sfDir)
      .select(col("user_id"), col("session_nb"), col("start_ms"), col("end_ms"))
    val lo = Tables.events(spark, sfDir)
      .agg(min(unix_millis(col("ts"))).as("lo"))
    val promos = lo.select(explode(sequence(lit(0L), lit(11L))).as("promo_id"),
        col("lo"))
      .select(col("promo_id"),
        (col("lo") + col("promo_id") * (2L * 86400000L)).as("ps"))
      .withColumn("pe", col("ps") + 86400000L)
    val sbins = sess.select(col("user_id"), col("session_nb"),
      col("start_ms"), col("end_ms"),
      explode(expr(s"sequence(start_ms DIV $BIN, end_ms DIV $BIN)")).as("bin"))
    val pbins = promos.select(col("promo_id"), col("ps"), col("pe"),
      explode(expr(s"sequence(ps DIV $BIN, (pe - 1) DIV $BIN)")).as("bin"))
    sbins.join(pbins, "bin")
      .filter(col("start_ms") <= col("pe") - 1 && col("ps") <= col("end_ms"))
      .select("user_id", "session_nb", "promo_id",
        "start_ms", "end_ms", "ps", "pe")
      .distinct()
      .select(col("user_id"), col("session_nb"), col("promo_id"),
        (least(col("end_ms"), col("pe") - 1) -
          greatest(col("start_ms"), col("ps")) + 1).as("overlap_ms"))
      .orderBy("user_id", "session_nb", "promo_id")
  }

  /** TIME-TRAVEL lookup against a versioned dimension — the join the
    * SCD2 history exists for: each purchase fact finds the signup
    * version whose [valid_from, valid_to) interval covers its
    * timestamp. Dimension versions are disjoint per key by
    * construction (lead() tiling, the [[scd2History]] shape), so every
    * fact matches AT MOST one version — no dedup pass after the join.
    * The plan is an equi-join on the key with the interval bounds as
    * residual: co-partitioned on user at any scale, never a per-row
    * subquery; facts before the first version drop out (inner join),
    * the warehouse convention. The spec proves the result equals the
    * as-of window spelling ([[asofPurchaseSignup]]) — interval join
    * and cumulative-max window are the same operator in two plans. */
  def scd2Lookup(spark: SparkSession, sfDir: String): DataFrame = {
    val wd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .withColumn("valid_from_ms", unix_millis(col("ts")))
      .withColumn("valid_to_ms", unix_millis(lead(col("ts"), 1).over(wd)))
      .select(col("user_id").as("d_user"), col("event_id").as("dim_version"),
        col("value").as("dim_value"), col("valid_from_ms"), col("valid_to_ms"))
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .join(dim, col("user_id") === col("d_user") &&
        col("ts_ms") >= col("valid_from_ms") &&
        (col("valid_to_ms").isNull || col("ts_ms") < col("valid_to_ms")))
      .select("event_id", "user_id", "ts_ms", "dim_version", "dim_value",
        "valid_from_ms")
      .orderBy("event_id")
  }

  /** Week-over-week change: weekly event counts with the previous
    * week's count and the delta in floored basis points. The lag
    * window is GLOBAL but runs over the weekly aggregate — bounded by
    * the corpus's time span (hundreds of rows for years of data), not
    * its volume, so the single-task window is safe at any scale; the
    * only data-volume exchange is the week aggregation itself. */
  def weeklyChange(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("wk")
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(unix_millis(col("wk")).as("week_ms"), col("n"), col("prev_n"),
        when(col("prev_n").isNotNull,
          floor(lit(10000.0) * (col("n") - col("prev_n")) / col("prev_n"))
            .cast("long")).as("delta_bp"))
      .orderBy("week_ms")
  }

  /** ROBUST outlier detection: flag values more than 3 MADs (median
    * absolute deviations) from their type's median — the
    * heavy-tail-safe twin of [[anomalyFlags2Sigma]]: one extreme value
    * shifts a mean/σ gate but leaves medians untouched, so MAD gates
    * survive the contamination that breaks moment-based ones. Two
    * aggregate passes (median, then MAD of deviations), each a
    * |types|-row table broadcast back; comparisons are plain IEEE
    * doubles identical in both engines (exact-percentile parity is
    * pinned by rel_median_price). Exact per-key percentiles hold group
    * values in memory — the correctness reference; at 100 TB the SAME
    * dataflow runs on [[quantileSketchByType]]'s bounded-bin estimates
    * instead. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
      .filter(col("value").isNotNull)
    val med = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(3.0) * col("mad"))
      .select("event_id", "event_type", "value", "med", "adev", "mad")
      .orderBy("event_id")
  }

  /** Per-user EWMA (α = 1/2) of event values in exact integer cents —
    * time-series smoothing whose recursion s_i = (s_{i-1} + c_i) DIV 2
    * is NOT window-expressible (each step divides the previous state, so
    * no prefix-sum decomposition exists): the per-key sequential fold
    * runs over the user's (ts, event_id)-sorted event list inside one
    * aggregate — the same one-exchange, state-∝-per-key-events shape as
    * the sessionization ops, with the fold in expression space instead
    * of JVM state. Integer floor halving (values are non-negative
    * cents) makes the smoothed value bit-identical across engines —
    * the float EWMA could never be hash-gated. The α = 1/2 special
    * case is the classic "binary exponential smoothing" a monitoring
    * pipeline uses precisely because it stays in integers. */
  def ewmaSmoothing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), struct(col("ts"), col("event_id"),
        (money(col("value")) * 100).cast("long").as("cents")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        size(col("es")).cast("long").as("n_events"),
        expr("es[size(es) - 1].cents").as("last_cents"),
        expr("aggregate(slice(es, 2, size(es) - 1), es[0].cents, " +
          "(acc, x) -> (acc + x.cents) DIV 2)").as("ewma_cents"))
      .orderBy("user_id")

  /** GROUPED KMV distinct sketches — one deterministic theta-family
    * sketch PER event type, built through the bounded TopK aggregator
    * (score = −hash, so the retained top-32 are the 32 MINIMUM salted
    * hashes): partial k-minima fold map-side and merge by re-ranking,
    * which is exactly the KMV merge law — so each group's sketch
    * crosses the exchange as ≤32 rows regardless of group size, where
    * the rank-window spelling would shuffle every distinct hash into
    * per-group sort groups. Exact distincts ride alongside for the
    * accuracy report, same layout as the global [[kmvDistinct]]. */
  def kmvByType(spark: SparkSession, sfDir: String, k: Int = 32): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hashes = ev
      .select(col("event_type"), graft.operators.TextOps.polyHash(
        concat(col("user_id").cast("string"), lit("-kmv-sketch-salt"))).as("h"))
      .distinct()
    val top = graft.functions.TopKAggregator.topKPairs(k)
    val sk = hashes
      .groupBy("event_type")
      .agg(top(col("h"), -col("h").cast("double")).as("mins"))
      .select(col("event_type"),
        size(col("mins")).cast("long").as("k_seen"),
        expr("mins[size(mins) - 1].id").as("kth_hash"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(sk, "event_type")
      .select(col("event_type"), col("n_exact"), col("k_seen"), col("kth_hash"),
        when(col("k_seen") < k, col("k_seen"))
          .otherwise(
            expr(s"CAST(${(k - 1).toLong * TextOps.HashMod} DIV kth_hash AS BIGINT)"))
          .as("est_kmv"))
      .orderBy("event_type")
  }

  /** Campaign channel of a click: props.k mod 4 prefixed 'ch'; clicks
    * whose props LACK a k key fall back to 'chx' rather than NULL (a
    * NULL channel inside a non-null click struct would silently
    * out-vote the organic fallback with a NULL group). ONE definition
    * shared by the batch attribution, its oracle spelling, and the
    * streaming twin — the stream-equals-batch contract rides on the
    * three staying identical. */
  private[graft] def clickChannel(props: Column): Column =
    concat(lit("ch"), coalesce(
      (get_json_object(props, "$.k").cast("long") % 4).cast("string"),
      lit("x")))

  /** LAST-TOUCH marketing attribution — the revenue-accounting pass an
    * event warehouse runs nightly: each `purchase` is credited to the
    * user's most recent preceding `click` (channel = the click's
    * campaign key, props.k mod 4), but only when that click happened
    * within a 3-day lookback; purchases with no qualifying click are
    * `organic`. Mirrors the reference's counter discipline (index.py
    * keeps per-outcome counts; this is the same bookkeeping with a
    * provenance join).
    *
    * The "most recent preceding click" is NOT a join: a purchase⋈click
    * theta-join on (same user, click.ts <= purchase.ts) is quadratic in
    * a user's event count and then needs a per-purchase argmax anyway.
    * Instead ONE pass over the unified event sequence — `last(click
    * struct, ignoreNulls)` over a rows-unbounded-preceding window keyed
    * by user — carries the latest click forward to every later row of
    * the same user. One shuffle on user_id, state = one struct per
    * partition cursor, no self-join. The lookback check and the organic
    * fallback are row-local; revenue accumulates in exact DECIMAL(12,2)
    * (engine-portable — see RelationalOps design notes).
    *
    * Scale shape: user event sequences are short (~70 events/user at
    * any SF — the table grows in users, not per-user depth), so the
    * per-user sort inside the window never spills; the final channel
    * rollup is a 5-row aggregate after map-side combine. */
  def lastTouchAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val click = when(col("event_type") === "click",
      struct(col("ts").as("cts"), clickChannel(col("props")).as("ch")))
    ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"), click.as("c"))
      .withColumn("lastc", last(col("c"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("value"),
        when(col("lastc").isNotNull &&
            unix_millis(col("ts")) - unix_millis(col("lastc.cts")) <=
              lit(3L * 86400000L),
          col("lastc.ch")).otherwise(lit("organic")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        moneySum(col("value")).as("revenue"))
      .orderBy("channel")
  }

  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cohort = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    val active = ev.select(col("user_id"),
      date_trunc("week", col("ts")).as("w")).distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cw").as("cohort_week"),
        expr("datediff(w, cw) DIV 7").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** KMV sketch SET ALGEBRA — pairwise audience-overlap estimates
    * between event types from their k-minimum-value sketches (the
    * theta-sketch intersection of Dasgupta et al., public): theta =
    * min of the two sketches' thresholds, n_common = shared hashes
    * below theta, estimate = n_common · M DIV theta, all exact BIGINT.
    * This is why a warehouse keeps sketches per segment instead of raw
    * audiences: ANY pairwise (or n-way) overlap query is then answered
    * from k-row summaries without re-touching the event log — the
    * "intersection of audiences" question that exact COUNT(DISTINCT)
    * needs a user-level self-join to answer.
    *
    * Scale shape: the event log is scanned ONCE (distinct type/hash
    * projection feeding the same bounded TopK-as-KMV aggregator as
    * [[kmvByType]] — ≤k rows per type cross the exchange). Everything
    * downstream — the theta pair table (types²), the shared-hash
    * equi-join over ≤k·|types| sketch rows — is bounded by sketch
    * size, independent of event volume. The exact self-join rides
    * along ONLY as the accuracy report (the spec's subject); a 100 TB
    * deployment drops it — that being the point of the sketch. */
  def kmvOverlap(spark: SparkSession, sfDir: String, k: Int = 32): DataFrame =
    kmvOverlapOf(Tables.events(spark, sfDir), k)

  /** Injectable form of [[kmvOverlap]]: overlap sketches of an arbitrary
    * (event_type, user_id) log — what the spec drives with constructed
    * audiences of known intersection. */
  private[graft] def kmvOverlapOf(ev: DataFrame, k: Int): DataFrame = {
    // ONE event-log scan + distinct shared by both arms (r15, guide
    // §2.4): the sketch arm previously ran its own full-log
    // distinct(type, h) next to the exact arm's distinct(type, user) —
    // two scans, two corpus-sized exchanges. h is a pure function of
    // user_id, so distinct(type, h) derived FROM the distinct (type,
    // user) rows is the identical set (hash collisions collapse in the
    // second, |tu|-sized distinct exactly as they did in the log-sized
    // one). The log now crosses one exchange once.
    val tu = ev.select("event_type", "user_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hashes = tu
      .select(col("event_type"), graft.operators.TextOps.polyHash(
        concat(col("user_id").cast("string"), lit("-kmv-sketch-salt"))).as("h"))
      .distinct()
    val top = graft.functions.TopKAggregator.topKPairs(k)
    val sk = hashes
      .groupBy("event_type")
      .agg(top(col("h"), -col("h").cast("double")).as("mins"))
      .select(col("event_type"),
        expr("transform(mins, m -> m.id)").as("hs"),
        size(col("mins")).cast("long").as("k_seen"),
        expr("mins[size(mins) - 1].id").as("kth"))
      .withColumn("theta",
        when(col("k_seen") < k, lit(TextOps.HashMod)).otherwise(col("kth")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the types² pair table with the combined threshold — a broadcast
    // product of two |types|-row aggregates, never data rows
    val pairBase = sk.select(col("event_type").as("type_a"), col("theta").as("th_a"))
      .crossJoin(sk.select(col("event_type").as("type_b"), col("theta").as("th_b")))
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        least(col("th_a"), col("th_b")).as("theta"))
    // shared sketch hashes below theta: equi-join on h over ≤k·|types|
    // exploded sketch rows
    val minsRows = sk.select(col("event_type"), explode(col("hs")).as("h"))
    val nCommon = minsRows.as("x").join(minsRows.as("y"),
        col("x.h") === col("y.h") && col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"), col("x.h").as("h"))
      .join(pairBase, Seq("type_a", "type_b"))
      .filter(col("h") < col("theta"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_common"))
    val exact = tu.as("p").join(tu.as("q"),
        col("p.user_id") === col("q.user_id") &&
          col("p.event_type") < col("q.event_type"))
      .groupBy(col("p.event_type").as("type_a"),
        col("q.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_exact"))
    pairBase
      .join(exact, Seq("type_a", "type_b"), "left")
      .join(nCommon, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        col("theta"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("est_kmv",
        expr(s"CAST(n_common * ${TextOps.HashMod} DIV theta AS BIGINT)"))
      .orderBy("type_a", "type_b")
  }

  /** DAU / rolling-28-day MAU / stickiness — the engagement dashboard
    * every event warehouse serves. The naive MAU is a rolling
    * COUNT(DISTINCT user) over a 28-day window — per-day distinct sets,
    * the classic scale trap. Instead each user's activity is reduced to
    * DISTINCT (user, day) rows once, and each row CONTRIBUTES to the
    * MAU of days [day, day+27] — truncated at the user's next active
    * day (lead − 1), so the per-user emitted (user, target_day) rows
    * are disjoint BY CONSTRUCTION and MAU is a plain COUNT, no distinct
    * anywhere downstream. Per active day a user emits ≤ 28 narrow
    * integer rows; one count agg (map-side combined) finishes it.
    * The day spine comes from the 1-row min/max aggregate exploded
    * row-locally — days with no activity still get their MAU row.
    * Stickiness is DAU·10000 DIV MAU basis points — exact integers. */
  def dauMau(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val pairs = ev.select(col("user_id"),
        expr("unix_millis(ts) DIV 86400000").as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val contrib = pairs
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .select(col("user_id"), explode(sequence(col("day"),
        least(col("day") + 27, coalesce(col("nxt") - 1, col("day") + 27))))
        .as("day"))
    val mau = contrib.groupBy("day").agg(count(lit(1)).as("mau"))
    val spine = pairs.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(mau, Seq("day"), "left")
      .join(dau, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
      .withColumn("stickiness_bp",
        when(col("mau") > 0, expr("dau * 10000 DIV mau")).otherwise(lit(0L)))
      .orderBy("day")
  }

  /** Kaplan–Meier time-to-conversion curve — survival analysis over
    * "days from a user's first event to their first PURCHASE": users
    * who never purchase are CENSORED at their last observed day (the
    * defining subtlety K-M handles and a naive "avg days-to-convert"
    * botches — dropping non-converters biases the estimate optimistic;
    * counting them as converts-at-last-day biases it pessimistic). At
    * each conversion time t: n_risk = users still unconverted and under
    * observation at t, d = conversions at exactly t, and
    * S(t) = Π_{t'≤t} (1 − d/n_risk) — the probability of remaining
    * unconverted past t.
    *
    * Scale + parity shape: the corpus collapses to per-user (duration,
    * censored) rows in ONE aggregate, then to the per-duration event
    * table — bounded by the DAY RANGE, not the user count, so the
    * cumulative windows over it are codebook-sized, never a data
    * window. Each factor is one IEEE division; S(t) is a cumulative
    * PRODUCT — no window primitive in either engine — computed as an
    * ordered fold over the running collect_list (ascending t, seed 1.0,
    * one multiply per step), which DuckDB mirrors with list() +
    * list_reduce in the same order ⇒ bit-identical doubles. */
  def survivalCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val day = expr("unix_millis(ts) DIV 86400000")
    val users = ev.groupBy("user_id")
      .agg(min(day).as("d0"), max(day).as("d1"),
        min(when(col("event_type") === "purchase", day)).as("p0"))
      .select(
        when(col("p0").isNotNull, col("p0") - col("d0"))
          .otherwise(col("d1") - col("d0")).as("dur"),
        when(col("p0").isNotNull, lit(1L)).otherwise(lit(0L)).as("churned"))
    val total = users.agg(count(lit(1)).as("n"))
    val byT = users.groupBy("dur")
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d"))
    val wBefore = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wProd = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n") - coalesce(sum(col("n_at")).over(wBefore), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("factor",
        (col("n_risk") - col("d")).cast("double") / col("n_risk"))
      .withColumn("survival",
        aggregate(collect_list(col("factor")).over(wProd), lit(1.0),
          (a, v) => a * v))
      .select(col("dur").as("t_days"), col("n_risk"),
        col("d").as("n_events"), col("survival"))
      .orderBy("t_days")
  }

  /** A/B experiment readout — the two-proportion report every
    * experimentation platform serves: users are deterministically
    * assigned to variants by the multiplicative user-id hash (no RNG —
    * the same assignment on every engine, every rerun, every scale: the
    * property a reproducible experiment system needs), and the readout
    * is per-variant users / converters / revenue, conversion rates and
    * lift in exact basis points, and the two-proportion z² statistic
    * (z² ≥ 3.84 ⇔ p < 0.05) — computed as the IDENTICAL IEEE expression
    * tree from exact integer counts on both engines, so even the float
    * is bit-stable and oracle-gated.
    *
    * Conversion is the PREMIUM purchase (value > 95 — roughly the top
    * value band), not any purchase: on this corpus every user purchases
    * eventually, and a 100%/100% experiment is degenerate — pooled
    * p ∈ {0, 1} zeroes the z² denominator, which Spark's ANSI mode
    * turns into a runtime error while DuckDB yields NaN. The degenerate
    * case is still guarded explicitly (z² defined as 0.0 when pooled
    * conversion is 0 or 1, identical CASE both engines).
    *
    * ONE conditional aggregate over the events scan (the distinct-user
    * counts ride Spark's Expand with map-side combine); output is a
    * single row — nothing downstream of the scan is data-sized. */
  def abTest(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"),
        (money(col("value")) * 100).cast("long").as("cents"),
        expr("CASE WHEN (user_id * 2654435761) % 1000000007 % 2 = 0 " +
          "THEN 'A' ELSE 'B' END").as("variant"))
    val isA = col("variant") === "A"
    val isBuy = col("event_type") === "purchase"
    val isConv = isBuy && col("value") > 95.0
    val one = a.agg(
      count_distinct(when(isA, col("user_id"))).as("users_a"),
      count_distinct(when(!isA, col("user_id"))).as("users_b"),
      count_distinct(when(isA && isConv, col("user_id"))).as("conv_a"),
      count_distinct(when(!isA && isConv, col("user_id"))).as("conv_b"),
      // revenue is ALL purchases — the premium gate defines conversion,
      // not the money
      coalesce(sum(when(isA && isBuy, col("cents"))), lit(0L)).as("rev_a_cents"),
      coalesce(sum(when(!isA && isBuy, col("cents"))), lit(0L)).as("rev_b_cents"))
    val p1 = col("conv_a").cast("double") / col("users_a")
    val p2 = col("conv_b").cast("double") / col("users_b")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("users_a") + col("users_b"))
    one.select(col("users_a"), col("users_b"), col("conv_a"), col("conv_b"),
      col("rev_a_cents"), col("rev_b_cents"),
      expr("conv_a * 10000 DIV users_a").as("conv_a_bp"),
      expr("conv_b * 10000 DIV users_b").as("conv_b_bp"),
      (expr("conv_b * 10000 DIV users_b") -
        expr("conv_a * 10000 DIV users_a")).as("lift_bp"),
      when(col("conv_a") + col("conv_b") === 0L ||
          col("conv_a") + col("conv_b") === col("users_a") + col("users_b"),
        lit(0.0))
        .otherwise(((p1 - p2) * (p1 - p2)) /
          (p * (lit(1.0) - p) *
            (lit(1.0) / col("users_a") + lit(1.0) / col("users_b"))))
        .as("z2"))
  }

  /** Revenue concentration (Pareto / Lorenz table) — "what share of
    * revenue do the top-spending users produce": users are ranked by
    * lifetime spend and grouped into spend deciles; each decile reports
    * its user count, exact revenue cents, share of total revenue and
    * CUMULATIVE share from the top — the 80/20 readout a monetization
    * review starts with, all in integer basis points (one total-cents
    * denominator, floor division — no FP anywhere).
    *
    * The global spend rank reuses the [[rfmSegments]] / curriculum
    * two-level numbering — range-bucket by cents DIV 10000 (monotone),
    * number within buckets in parallel, add broadcast offsets — so no
    * ntile global sort ever sees the user population; the decile table
    * (≤10 rows) then takes one tiny cumulative window. */
  def paretoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      // coalesce: a user whose every purchase value is NULL must rank at
      // the bottom as 0 cents, not vanish (the TwoLevelRank bucket join
      // is NULL-dropping while n_users would still count the user — the
      // rfmSegments contract; the oracle coalesces too)
      .agg(coalesce(sum((money(col("value")) * 100).cast("long")), lit(0L))
        .as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = perUser.agg(count(lit(1)).as("n_users"),
      sum(col("cents")).as("total_cents"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TwoLevelRank.withRank(
        perUser.withColumn("vb", expr("cents DIV 10000")),
        Seq.empty, asc = false, col("cents").desc, col("user_id"))
      .crossJoin(broadcast(totals))
      .withColumn("decile", expr("((rnk - 1) * 10) DIV n_users + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users_d"),
        sum(col("cents")).as("cents_d"),
        max(col("total_cents")).as("tc"))
      .withColumn("cum_cents", sum(col("cents_d")).over(wCum))
      .select(col("decile"), col("n_users_d"), col("cents_d"),
        expr("cents_d * 10000 DIV tc").as("share_bp"),
        expr("cum_cents * 10000 DIV tc").as("cum_share_bp"))
      .orderBy("decile")
  }

  /** RFM segmentation — the classic customer-value cube (recency /
    * frequency / monetary quintiles, Hughes 1994): each user's three
    * metrics are quintiled over the user population and concatenated to
    * the 111..555 segment code a marketing warehouse slices by. All
    * three metrics are EXACT integers (days since last event vs the
    * corpus max timestamp; event count; lifetime value in DECIMAL
    * cents), so ranking needs no FP discipline at all.
    *
    * Quintiles need each user's global rank per metric — the textbook
    * ntile spelling is a single-task global sort at 100 TB. Instead the
    * three metrics are UNPIVOTED to (user, metric, value) rows and ranked
    * by ONE two-level numbering (the [[graft.operators.TextOps
    * .curriculumMixture]] pattern, shared across all three metrics
    * instead of three copies of the machinery): range-bucket by
    * value DIV step (monotone, so bucket order is rank order), number
    * within (metric, bucket) in parallel, add the broadcast running
    * offset of earlier buckets. q = ((rank−1)·5) DIV n + 1 — the exact
    * formula the oracle's row_number() spelling reproduces. The only
    * serial work is the O(#buckets) offset scan; every data-sized stage
    * is partition-parallel: per-user agg (one shuffle), melt (row-local
    * ×3), rank window (keyed on (metric, bucket)), re-pivot (one
    * shuffle on user). */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val maxTs = ev.agg(max(unix_millis(col("ts"))).as("mx"))
    val perUser = ev
      .groupBy("user_id")
      .agg(max(unix_millis(col("ts"))).as("last_ms"),
        count(lit(1)).as("freq"),
        // coalesce: a user whose every value is NULL must rank at the
        // bottom as 0 cents, not vanish through a NULL bucket key (the
        // TwoLevelRank join is NULL-dropping; the oracle coalesces too)
        coalesce(sum((money(col("value")) * 100).cast("long")), lit(0L))
          .as("cents"))
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        expr("(mx - last_ms) DIV 86400000").as("r"),
        col("freq").as("f"), col("cents").as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // melt to (user_id, metric, v); bucket widths keep #buckets bounded
    // by the VALUE RANGE / step, independent of user count
    val melted = perUser.select(col("user_id"), explode(array(
        struct(lit("r").as("metric"), col("r").as("vb"), col("r").as("v")),
        struct(lit("f").as("metric"), col("f").as("vb"), col("f").as("v")),
        struct(lit("m").as("metric"),
          expr("m DIV 10000").as("vb"), col("m").as("v")))).as("x"))
      .select(col("user_id"), col("x.metric").as("metric"),
        col("x.vb").as("vb"), col("x.v").as("v"))
    val total = perUser.agg(count(lit(1)).as("n_users"))
    TwoLevelRank.withRank(melted, Seq("metric"), asc = true,
        col("v"), col("user_id"))
      .crossJoin(broadcast(total))
      .withColumn("q", expr("((rnk - 1) * 5) DIV n_users + 1"))
      .groupBy("user_id")
      .agg(max(when(col("metric") === "r", col("q"))).as("r_q"),
        max(when(col("metric") === "f", col("q"))).as("f_q"),
        max(when(col("metric") === "m", col("q"))).as("m_q"))
      .select(col("user_id"), col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm_code"))
      .orderBy("user_id")
  }

  /** Cohort LTV curve — cumulative revenue per signup cohort by account
    * age, the lifetime-value readout every subscription/commerce
    * warehouse plots next to [[cohortRetention]]: users are cohorted by
    * the WEEK of their FIRST event (retention's granularity — the
    * events table spans weeks), every purchase lands at its week-offset
    * from that cohort, and revenue accumulates along the age axis so
    * the curve answers "how much has the week-1 cohort earned per user
    * by week 3". Week offsets are [[cohortRetention]]'s exact integer
    * datediff-div-7; revenue is exact BIGINT cents; the per-user
    * normalization is integer division — both engines bit-agree.
    *
    * Scale shape: one per-user min() agg (shuffle on user_id) builds
    * the cohort map; purchases join it ON user_id — at 100 TB both
    * sides co-partition on user_id (the map is users-sized, AQE
    * broadcasts while it fits); the (cohort, age) aggregate is
    * weeks²-bounded, so the cumulative window runs over a tiny table
    * partitioned BY cohort (no global sort). */
  def ltvCohortCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cohort = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"))
    val perAge = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        (money(col("value")) * 100).cast("long").as("cents"))
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(date_trunc('week', ts), cohort_week) DIV 7")
          .cast("long").as("age_wk"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("buyers"),
        coalesce(sum(col("cents")), lit(0L)).as("rev_cents"))
    val wCum = Window.partitionBy("cohort_week").orderBy("age_wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perAge.join(broadcast(sizes), "cohort_week")
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .select(col("cohort_week"), col("age_wk"), col("n_users"),
        col("n_purchases"), col("buyers"), col("rev_cents"),
        col("cum_rev_cents"),
        expr("cum_rev_cents DIV n_users").as("ltv_cents_per_user"))
      .orderBy("cohort_week", "age_wk")
  }

  /** U-shaped (position-based) multi-touch attribution — the
    * complement of [[lastTouchAttribution]]'s winner-take-all: each
    * purchase's credit is SPLIT over every qualifying click in the
    * 3-day lookback, 40% to the first touch, 40% to the last, the
    * middle 20% divided evenly among interior touches (the standard
    * position-based scheme). Credit is integer BASIS POINTS so the
    * split is exact and engine-portable: k=1 → 10000; k=2 → 5000/5000;
    * k≥3 → 4000 / floor(2000/(k−2)) each middle / 4000 + the floor
    * remainder folded into the LAST touch (credits always sum to
    * exactly 10000 per purchase). Purchases with no qualifying click
    * credit `organic` in full.
    *
    * Scale shape: purchases join clicks on user_id with the lookback
    * range predicate — per-user fan-out is bounded by the 3-day window,
    * the same bound [[lastTouchAttribution]] rides; position rank and
    * touch count are ONE window pass partitioned by purchase; the final
    * channel rollup is channels-sized. No global sort, no driver state. */
  def positionAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"), (money(col("value")) * 100).cast("long").as("cents"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        col("event_id").as("cid"), clickChannel(col("props")).as("channel"))
    val joined = p.join(c,
      p("user_id") === c("user_id") && col("cts") <= col("pts") &&
        unix_millis(col("pts")) - unix_millis(col("cts")) <= lit(3L * 86400000L),
      "left")
    val w = Window.partitionBy("pid").orderBy("cts", "cid")
    val credited = joined
      .withColumn("pos", when(col("cid").isNotNull, row_number().over(w)))
      .withColumn("k", count(col("cid")).over(Window.partitionBy("pid")))
      .withColumn("mid_bp", when(col("k") >= 3, expr("2000 DIV (k - 2)")))
      .withColumn("credit_bp",
        when(col("k") === 0, lit(10000L))
          .when(col("k") === 1, lit(10000L))
          .when(col("k") === 2, lit(5000L))
          .when(col("pos") === 1, lit(4000L))
          .when(col("pos") === col("k"),
            lit(4000L) + lit(2000L) - (col("k") - 2) * col("mid_bp"))
          .otherwise(col("mid_bp")))
      .select(coalesce(col("channel"), lit("organic")).as("channel"),
        col("pid"), col("cents"), col("credit_bp"))
    credited.groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_bp")).as("credit_bp_sum"),
        sum(col("cents") * col("credit_bp")).as("rev_cents_bp"))
      .select(col("channel"), col("n_credits"), col("credit_bp_sum"),
        col("rev_cents_bp"),
        expr("rev_cents_bp DIV 10000").as("rev_cents"))
      .orderBy("channel")
  }

  /** Markov removal-effect attribution (first-order chain; Anderl et
    * al. 2014, public) — the data-driven alternative to positional
    * heuristics: model each user's click journey as a Markov chain
    * (start → channel⁺ → conv|null), then score a channel by how much
    * the chain's conversion probability DROPS when every transition
    * into that channel is redirected to `null` (the removal effect).
    * Journeys truncate at the first purchase; users with no purchase
    * end at `null`.
    *
    * Engine parity: transition probabilities are integer PARTS PER
    * MILLION (cnt·1e6 div out-degree); the K=6-step absorption sweep
    * floors each edge contribution (p·t div 1e6) before summing, so
    * every intermediate is an exact BIGINT both engines reproduce —
    * float matrix powers would drift. Absorbing states carry a 1e6
    * self-loop. K=6 bounds the horizon identically on both sides
    * (journeys here are short; the truncation shows up as base-chain
    * conversion mass p_base_ppm below the chain's untruncated value —
    * the reported column to sanity-check K against). A scenario whose
    * chain never reaches `conv` at all (a purchase-free slice) emits
    * NO row, matching the oracle's empty conv table; a zero total
    * removal effect yields NULL shares on both sides (NULLIF guard).
    *
    * Scale shape: the corpus collapses ONCE to the transition count
    * table (≤ (channels+3)² rows) via a per-user sequence window; that
    * table is a constant-size MODEL — like a k-means codebook — so it
    * is collected to the driver (metadata-scale, ≤ ~50 rows regardless
    * of corpus size) and the K-step absorption sweep runs as plain
    * Scala integer arithmetic: zero per-step jobs, zero checkpoints,
    * event rows touched exactly once. The removal scenarios
    * (1 + channels) ride the SAME local sweep as a scenario key. */
  def markovAttribution(spark: SparkSession, sfDir: String,
                        steps: Int = 6): DataFrame =
    markovAttributionOn(spark, Tables.events(spark, sfDir), steps)

  /** The chain over an arbitrary events frame — split out so the
    * empty-conversion contract (purchase-free slice ⇒ zero rows, the
    * oracle's empty conv table) is testable on synthetic frames. */
  private[graft] def markovAttributionOn(spark: SparkSession, ev: DataFrame,
                                         steps: Int = 6): DataFrame = {
    val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // per-user click/purchase sequence, truncated at the first purchase
    val seqq = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(clickChannel(col("props"))).as("state"))
      .withColumn("conv_before", count(when(col("state") === "conv", lit(1)))
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("conv_before") === 0) // truncate after first conversion
      .withColumn("prev", lag(col("state"), 1, "start").over(wSeq))
      .withColumn("is_last", lead(col("state"), 1).over(wSeq).isNull)
    // transitions: every consecutive pair, plus terminal → null for
    // journeys that never convert
    val trans0 = seqq.select(col("prev").as("src"), col("state").as("dst"))
      .union(seqq.filter(col("is_last") && col("state") =!= "conv")
        .select(col("state").as("src"), lit("null").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val outDeg = trans0.groupBy("src").agg(sum(col("cnt")).as("deg"))
    val tppm = trans0.join(outDeg, "src")
      .select(col("src"), col("dst"),
        expr("cnt * 1000000 DIV deg").as("t_ppm"))
    // the model is constant-size (≤ (channels+3)² transitions, ~50
    // rows at ANY corpus scale) — collect it and sweep on the driver,
    // the same contract as broadcasting a k-means codebook
    val tRows = tppm.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = tRows.flatMap(t => Seq(t._1, t._2))
      .filterNot(Set("start", "conv", "null")).distinct.sorted
    // scenario sweep: 'none' (full chain) + one removal per channel;
    // removal redirects edges INTO the channel to null. Redirection can
    // alias two edges onto (src, null): merge them so the per-edge
    // floor below runs over a UNIQUE-keyed edge table — the oracle
    // replicates the same merge.
    // a scenario contributes a row only if its chain REACHES conv
    // (key present, even at floored mass 0) — the oracle's conv CTE
    // has exactly that membership, so a purchase-free slice is empty
    // on both sides instead of fabricating zero rows here
    val results = ("none" +: channels.toSeq).flatMap { removed =>
      val redirected = tRows.map { case (src, dst, t) =>
        ((src, if (dst == removed) "null" else dst), t) } ++
        Seq((("conv", "conv"), 1000000L), (("null", "null"), 1000000L))
      val edges = redirected.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq
        .map { case ((src, dst), t) => (src, dst, t) }
      var p = Map("start" -> 1000000L)
      for (_ <- 1 to steps) {
        p = edges.flatMap { case (src, dst, t) =>
          p.get(src).map(pp => dst -> pp * t / 1000000L) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
      p.get("conv").map(removed -> _)
    }
    val pBaseOpt = results.find(_._1 == "none").map(_._2)
    val eff = pBaseOpt.toSeq.flatMap { pBase =>
      results.filter(_._1 != "none")
        .map { case (ch, pc) => (ch, pc, pBase, pBase - pc) } }
    val totRemoval = eff.map(_._4).sum
    import spark.implicits._
    val shareExpr = if (totRemoval == 0) lit(null).cast("long")
      else expr(s"removal_ppm * 10000 DIV $totRemoval")
    eff.toDF("channel", "p_conv_ppm", "p_base_ppm", "removal_ppm")
      .select(col("channel"), col("p_conv_ppm"), col("p_base_ppm"),
        col("removal_ppm"), shareExpr.as("share_bp"))
      .orderBy("channel")
  }

  /** Sequence-pattern matching over per-user journeys — the
    * MATCH_RECOGNIZE problem (SQL:2016, public) in its scalable
    * compiled-to-regex form: each user's event history collapses to a
    * compact symbol string (one char per event, time-ordered), declared
    * patterns compile to regexes over that alphabet, and every pattern
    * is evaluated against every journey in ONE row-local pass. The
    * funnel/path queries answer "how many did A then B"; this answers
    * arbitrary ordered patterns (immediacy, repetition, prefix anchors)
    * without a per-pattern query.
    *
    * Engine parity: symbols are single chars, patterns stay in the
    * Java-regex ∩ RE2 common subset (literals, `.`, `*`, `+`, anchors
    * — the BpeTokenRe discipline), and the journey string is built
    * with an ORDER-PINNED sort on (ts, event_id) so ties collapse
    * identically in both engines.
    *
    * Scale shape: one groupBy(user) shuffle builds the journey strings
    * (map-side combined collect_list of 1-char structs; per-user state
    * is journey-length-bounded, the sessionization contract); ALL
    * patterns then evaluate as fused row-local regexes on the SAME
    * pass — adding a pattern is a new conditional agg, not a new scan
    * — and the report is pattern-count-sized. */
  def sequenceMatch(spark: SparkSession, sfDir: String): DataFrame =
    sequenceMatchOn(Tables.events(spark, sfDir))

  /** [[sequenceMatch]] with the events frame injected — spec seam for
    * the empty-corpus ANSI contract (n_users=0 → share_bp NULL). */
  private[graft] def sequenceMatchOn(events: DataFrame): DataFrame = {
    val patterns = Seq(
      "funnel_view_click_purchase" -> "V.*C.*P",
      "impulse_click_purchase"     -> "CP",
      "error_then_purchase"        -> "E.*P",
      "starts_with_signup"         -> "^S",
      "repeat_purchaser"           -> "P.*P")
    val code = when(col("event_type") === "view", "V")
      .when(col("event_type") === "click", "C")
      .when(col("event_type") === "purchase", "P")
      .when(col("event_type") === "signup", "S")
      .when(col("event_type") === "error", "E").otherwise("O")
    val journeys = events
      .select(col("user_id"), col("ts"), col("event_id"), code.as("c"))
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("c")))), x => x.getField("c")), "").as("journey"))
    val aggs = count(lit(1)).as("n_users") +:
      patterns.map { case (name, re) =>
        count(when(col("journey").rlike(re), 1)).as(s"m_$name") }
    val one = journeys.agg(aggs.head, aggs.tail: _*)
    val stackArgs = patterns.map { case (name, _) =>
      s"'$name', m_$name" }.mkString(", ")
    one.select(col("n_users"),
        expr(s"stack(${patterns.size}, $stackArgs) AS (pattern, n_matched)"))
      .select(col("pattern"), col("n_matched"), col("n_users"),
        // ANSI guard: an empty events table yields n_users=0; DuckDB's
        // `// 0` is NULL while unguarded Spark DIV throws — same
        // discipline as the gopherRules ratio guards.
        when(col("n_users") > 0, expr("n_matched * 10000 DIV n_users"))
          .as("share_bp"))
      .orderBy("pattern")
  }

  /** Holt linear (double-exponential) smoothing over the daily event
    * series — the trend-aware forecast next to [[seasonalNaive]] and
    * [[ewmaDaily]] (Holt 1957, public): level and trend states update
    * recursively with α=0.3, β=0.2, all in MILLI-scaled BIGINTs
    * (y·1000) with truncating division, so both engines walk the
    * identical integer recurrence (float exponential smoothing drifts;
    * and Scala `/`, Spark DIV and DuckDB `//` all truncate toward
    * zero, so the occasional NEGATIVE trend state divides identically
    * too). Emits per day the observed count, level, trend, and the
    * one-step-ahead forecast that day's states imply.
    *
    * Scale shape: the corpus collapses to ONE daily-count row per day
    * (map-side combined groupBy) — a ~year-sized series at any corpus
    * scale — and the inherently-sequential recurrence then runs on the
    * driver over that metadata-scale table (the [[markovAttribution]]
    * model contract: collect ≤365 rows, never event rows). A window
    * spelling would serialize the same computation through one
    * partition with none of the clarity. */
  def holtLinear(spark: SparkSession, sfDir: String): DataFrame =
    holtLinearOn(Tables.events(spark, sfDir))

  /** [[holtLinear]] with the events frame injected — spec seam for the
    * degenerate-series contract (0/1 days → empty frame, not throw). */
  private[graft] def holtLinearOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val daily = events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))
      .orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import spark.implicits._
    // Degenerate-data contract: the recursive oracle's base case joins
    // i2.i = 2, so a 0- or 1-day corpus yields an EMPTY result there —
    // return the same empty frame (declared schema) instead of throwing.
    if (daily.length < 2)
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("day", "y", "level_milli", "trend_milli", "forecast_milli")
    val out = Array.newBuilder[(String, Long, Long, Long, Long)]
    var l = daily(0)._2 * 1000L
    var b = (daily(1)._2 - daily(0)._2) * 1000L
    out += ((daily(0)._1, daily(0)._2, l, b, l + b))
    for (i <- 1 until daily.length) {
      val y = daily(i)._2
      val lNew = (300L * y * 1000L + 700L * (l + b)) / 1000L
      val bNew = (200L * (lNew - l) + 800L * b) / 1000L
      l = lNew; b = bNew
      out += ((daily(i)._1, y, l, b, l + b))
    }
    out.result().toSeq
      .toDF("day", "y", "level_milli", "trend_milli", "forecast_milli")
      .orderBy("day")
  }
}

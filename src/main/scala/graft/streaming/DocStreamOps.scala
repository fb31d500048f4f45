package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the corpus-curation pipeline (the LLM-pipeline
  * analogue of TextOps.curateCorpus, and the streaming restatement of
  * reference O7's `caught_docs` dedup, index.py:162-163): documents
  * arrive as an unbounded stream tagged with an ingest timestamp; each
  * micro-batch is exact-deduplicated against watermark-bounded state by
  * content hash, then gated on the same cheap quality signals the batch
  * pipeline uses.
  *
  * Scale shape: the dedup state is one 16-byte md5 per surviving doc
  * within the watermark horizon — reclaimed as event time advances, so
  * a perpetual 100 TB/day ingest holds state proportional to the
  * horizon, not the corpus. Everything else is a narrow projection.
  * (Cross-horizon dedup at rest remains the batch `dd_exact` /
  * `dd_minhash_lsh` sweep — stream dedup dedups the firehose, batch
  * dedup dedups the lake; production runs both.)
  */
object DocStreamOps {

  final case class DocRow(doc_id: Long, ingest_ts: java.sql.Timestamp,
    source: String, text: String)

  /** Content-hash dedup within the watermark + quality gate.
    * Emits (doc_id, source, n_tokens, text_md5) for accepted docs. */
  def curateDocStream(docs: DataFrame, watermark: String = "10 minutes",
                      minTokens: Int = 3): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .withColumn("text_md5", md5(col("text").cast("binary")))
      .dropDuplicatesWithinWatermark("text_md5")
      .withColumn("n_tokens",
        size(filter(split(lower(col("text")), " "), t => length(t) > 0)))
      .filter(col("n_tokens") >= minTokens)
      .select("doc_id", "source", "n_tokens", "text_md5")

  /** Streaming restatement of the exact path of
    * [[graft.operators.DedupOps.incrementalDedup]]: the doc firehose is
    * anti-joined per micro-batch against the STATIC snapshot hash table
    * — only docs the lake has never seen pass. Stream-static joins are
    * stateless on the stream side (no watermark state; the static side
    * is broadcast or re-scanned per batch), so this composes with
    * [[curateDocStream]]: `dropDuplicatesWithinWatermark` dedups the
    * stream against itself inside the horizon, this join dedups it
    * against the corpus at rest. At 100 TB the snapshot side is the
    * narrow (md5, id) projection of the lake — a bucketed lookup table,
    * never the text. */
  def novelAgainstSnapshot(docs: DataFrame, snapshotMd5: DataFrame): DataFrame =
    docs.withColumn("text_md5", md5(col("text").cast("binary")))
      .join(snapshotMd5.select("text_md5"), Seq("text_md5"), "left_anti")
      .select("doc_id", "source", "text_md5")

  /** Streaming NEAR-dup admission filter — the MinHash twin of
    * [[novelAgainstSnapshot]]'s exact path: each incoming doc's LSH
    * band keys (the same 8-permutation banding as the batch
    * `dd_minhash_lsh`, via DedupOps.bandsOf) probe the STATIC band
    * table of the corpus at rest; a band match names the snapshot doc
    * the newcomer likely duplicates. Stream-static and STATELESS — no
    * watermark state; at 100 TB the snapshot side is the narrow
    * (band-key, doc_id) index of the lake, bucketed on band-key, and
    * each micro-batch is a lookup join against it.
    *
    * Emits one row per matching (doc, snapshot doc, band): candidate
    * multiplicity (≤ #bands per pair) is left to the downstream
    * verify/dedup stage exactly as in the batch pipeline — a streaming
    * `distinct` here would grow unbounded state for no semantic gain. */
  def nearDupCandidates(docs: DataFrame, snapshot: DataFrame): DataFrame = {
    val snapBands = graft.operators.DedupOps.bandsOf(
        snapshot.select(col("doc_id"), col("text")))
      .select(col("doc_id").as("snap_id"), col("bkey"))
    graft.operators.DedupOps.bandsOf(
        docs.select(col("doc_id"), col("text")))
      .join(snapBands, "bkey")
      .select(col("doc_id"), col("snap_id"), col("bkey"))
  }

  /** Streaming PERCEPTUAL near-dup admission — the dHash twin of
    * [[nearDupCandidates]] for binary payloads (the multimodal
    * corpus's image tier): each incoming payload's 4×14-bit dhash56
    * band keys (identical layout to the batch `mm_dhash_pairs`) probe
    * the STATIC band table of the corpus at rest. Unlike the minhash
    * path, the full 56-bit signature rides BOTH sides of the band
    * join, so the hamming verify (bit_count(xor) ≤ maxHamming) runs
    * INLINE in the same stateless lookup — admitted rows are verified
    * near-dups, with no downstream verify stage. Stream-static,
    * stateless, no watermark state; at 100 TB the snapshot side is
    * the (band, bv, dhash, doc_id) index of the lake bucketed on the
    * band key, and each micro-batch is a lookup join against it.
    *
    * Emits each admitted (doc, snapshot doc) pair exactly ONCE — an
    * exact copy matches all 4 bands, and a consumer counting
    * admissions must not see it 4×. The dedup costs NO state: both
    * full signatures ride the join, so "is this the LOWEST matching
    * band for the pair" is row-local arithmetic (recompute the band
    * equality for every lower band from dh/sh) — where a streaming
    * `dropDuplicates` would grow unbounded state or need a watermark,
    * this stays a pure filter. `band` in the output is that lowest
    * matching band. */
  def dhashAdmission(docs: DataFrame, snapshot: DataFrame,
                     maxHamming: Int = 6): DataFrame = {
    def bands(df: DataFrame, idCol: String, hCol: String): DataFrame =
      df.select(col("doc_id").as(idCol), expr("dhash56(text)").as(hCol))
        .select(col(idCol), col(hCol),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bv", expr(s"shiftright($hCol, band * 14) & 16383"))
    def bandEq(b: Int) =
      expr(s"(shiftright(dh, ${b * 14}) & 16383) = (shiftright(sh, ${b * 14}) & 16383)")
    val firstMatch = (0 to 3).map { b =>
      (col("band") === b) &&
        (0 until b).map(j => !bandEq(j)).foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    bands(docs, "doc_id", "dh")
      .join(bands(snapshot, "snap_id", "sh"), Seq("band", "bv"))
      .filter(firstMatch)
      .withColumn("hamming", expr("bit_count(dh ^ sh)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_id", "snap_id", "band", "hamming")
  }

  /** Trending terms on the firehose — windowed term frequencies with a
    * watermark, the streaming face of the batch term-statistics family
    * (TF-IDF / term drift / CMS): each tumbling window's counts emit
    * once, when the watermark passes the window end (append mode), so a
    * downstream batch rank or drift check reads complete windows only.
    *
    * Scale shape: tokenize is row-local; state is one counter per live
    * (window, term) — vocabulary-bounded, reclaimed as event time
    * advances. The explode happens BEFORE the shuffle but each shuffled
    * row is a (term, window) pair with a partial count (map-side
    * combine), never the text. */
  def trendingTerms(docs: DataFrame, watermark: String = "10 minutes",
                    windowLen: String = "10 minutes"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"),
        explode(filter(split(lower(col("text")), " "),
          t => length(t) > 0)).as("term"))
      .groupBy(window(col("ingest_ts"), windowLen), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("term"), col("n"))

  final case class FetchRequest(url: String, domain: String,
    ts: java.sql.Timestamp)
  final case class ScheduledFetch(url: String, domain: String, ts_ms: Long,
    scheduled_ms: Long, delayed: Boolean)

  /** O22 PER-ORIGIN politeness pacing — the reference's ACTUAL
    * semantics (index.py:176-178 sleeps 1-5 s between requests so no
    * target host sees a burst), engine-side: a single-token bucket that
    * refills every `minDelayMs`, KEYED ON DOMAIN via
    * `flatMapGroupsWithState`. A distributed engine cannot sleep a
    * task (that stalls an executor core for the whole cluster); it
    * SCHEDULES — each request is assigned the earliest slot at or
    * after its arrival that respects the per-domain spacing, and a
    * downstream fetch stage executes at `scheduled_ms` (the fetch
    * itself stays out-of-engine, the O2 boundary). Distinct from
    * [[graft.streaming.EventStreamOps.throttledIngest]], which caps
    * GLOBAL admission per micro-batch: admission control bounds the
    * engine's intake; this bounds each ORIGIN's request rate — the
    * politeness contract proper.
    *
    * Determinism: requests are ordered (ts, url) within each
    * micro-batch per domain; the state is ONE long per domain (next
    * free slot), so replays reproduce schedules exactly.
    *
    * Scale shape: state is 8 bytes per live domain — bounded by the
    * origin population, not request volume; each micro-batch shuffles
    * narrow (url, domain, ts) rows once on domain. A production pass
    * adds a state TTL (GroupStateTimeout) for domains gone cold;
    * elided here so replay determinism stays byte-exact in the spec. */
  def perOriginPacing(spark: org.apache.spark.sql.SparkSession,
                      requests: DataFrame, minDelayMs: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(minDelayMs > 0, s"politeness spacing must be positive: $minDelayMs")
    requests.select("url", "domain", "ts").as[FetchRequest]
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Long, ScheduledFetch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (domain: String, rows: Iterator[FetchRequest], state: GroupState[Long]) =>
          var nextFree = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.url)).map { r =>
            val t = r.ts.getTime
            val sched = math.max(t, nextFree)
            nextFree = sched + minDelayMs
            ScheduledFetch(r.url, domain, t, sched, sched > t)
          }
          state.update(nextFree)
          out.iterator
      }
      .toDF()
  }

  final case class BudgetedDoc(source: String, doc_id: Long, n_tokens: Long,
    ingest_ts: java.sql.Timestamp)
  /** kind = "doc" (per-document admit/reject decision, spent_after =
    * window consumption after it) or "summary" (timer-fired window
    * close: doc_id = admitted count, n_tokens = tokens consumed). */
  final case class GateOut(source: String, kind: String, doc_id: Long,
    window_id: Long, n_tokens: Long, spent_after: Long, admitted: Boolean)
  // NOT private: the MapState value encoder generates public-access
  // constructor calls against this class
  final case class WinAcct(spent: Long, nAdmitted: Long)

  /** Per-source ingestion budget gate on `transformWithState` — the
    * Spark 4 arbitrary-state API (SPARK-46815 line, public), exercised
    * end-to-end: MULTIPLE named state variables (a [[org.apache.spark
    * .sql.streaming.MapState]] of per-window accounts), EVENT-TIME
    * TIMERS (each window registers one at its end; the expiry callback
    * emits the window summary and frees the account), and
    * watermark-late drop inside the processor. The LLM-crawl semantics:
    * every source gets `budget` tokens per tumbling window — a hot
    * domain is throttled the moment its window budget is spent, cold
    * domains flow untouched; the summary row per (source, window) is
    * the admission ledger the crawl dashboard reads. Complements
    * [[perOriginPacing]] (request SPACING) with volume capping.
    *
    * Scale shape: state is one (spent, admitted) pair per OPEN window
    * per source — freed by its timer, so perpetual ingest holds
    * O(sources · open windows), never history; per-batch work per key
    * is a sort of that key's batch slice (bounded by the trigger), and
    * rows older than the watermark are dropped, not re-opened.
    * Admission decisions within a key are event-time ordered and
    * therefore replay-deterministic. */
  def budgetGate(docs: org.apache.spark.sql.Dataset[BudgetedDoc],
                 budget: Long, windowMs: Long,
                 watermark: String = "10 seconds")
      : org.apache.spark.sql.Dataset[GateOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.withWatermark("ingest_ts", watermark)
      .groupByKey(_.source)
      .transformWithState(new BudgetGateProcessor(budget, windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The [[budgetGate]] processor. One MapState: window_id → account.
    * A window's timer fires when the WATERMARK passes its end — the
    * summary is emitted exactly once, then the account is freed. */
  private[graft] class BudgetGateProcessor(budget: Long, windowMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, BudgetedDoc, GateOut] {
    import org.apache.spark.sql.{Encoders => E}
    @transient private var acct
      : org.apache.spark.sql.streaming.MapState[Long, WinAcct] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      acct = getHandle.getMapState[Long, WinAcct]("acct",
        E.scalaLong, E.product[WinAcct],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BudgetedDoc],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[GateOut] = {
      val wm = timers.getCurrentWatermarkInMs
      // event-time order inside the batch slice = replay determinism
      val sorted = rows.toSeq.sortBy(r => (r.ingest_ts.getTime, r.doc_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[GateOut]
      sorted.foreach { r =>
        val t = r.ingest_ts.getTime
        if (t >= wm) { // watermark-late rows never re-open a closed window
          val w = t / windowMs
          val cur =
            if (acct.containsKey(w)) acct.getValue(w)
            else {
              // first doc of the window: arm the close timer at its end
              getHandle.registerTimer((w + 1) * windowMs)
              WinAcct(0L, 0L)
            }
          val admit = cur.spent + r.n_tokens <= budget
          val next = if (admit) WinAcct(cur.spent + r.n_tokens,
            cur.nAdmitted + 1) else cur
          acct.updateValue(w, next)
          out += GateOut(key, "doc", r.doc_id, w, r.n_tokens,
            next.spent, admit)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[GateOut] = {
      val w = expired.getExpiryTimeInMs / windowMs - 1
      if (acct.containsKey(w)) {
        val a = acct.getValue(w)
        acct.removeKey(w) // the account is freed — state never grows
        Iterator.single(GateOut(key, "summary", a.nAdmitted, w, a.spent,
          a.spent, admitted = true))
      } else Iterator.empty
    }
  }
}

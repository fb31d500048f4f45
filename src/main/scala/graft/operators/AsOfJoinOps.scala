package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed sort-merge AS-OF join (SURVEY.md §2.2 joins: the
  * operator Spark lacks natively). For every left row, find the latest
  * right row with the same key and ts ≤ left.ts.
  *
  * The window formulation (EventOps.asofPurchaseSignup: union + running
  * max) answers the single-table case; this operator is the general
  * two-table form, built the way a native engine builds it:
  *
  *  1. hash-repartition BOTH inputs on the key with the SAME
  *     partitioner (co-partitioning — one shuffle per side, like a
  *     shuffled-hash join),
  *  2. sort within partitions by (key, ts),
  *  3. zip the partition pairs and run a streaming two-iterator merge —
  *     O(n+m) per partition, constant memory beyond one buffered row.
  *
  * This is the sanctioned per-partition-imperative case (genuine merge
  * algorithm; no driver collect, no state larger than one row).
  * Verified against the SAME DuckDB oracle as the window form — both
  * must produce identical output. */
object AsOfJoinOps {

  final case class LeftRow(event_id: Long, user_id: Long, tsMicros: Long)
  final case class RightRow(user_id: Long, tsMicros: Long)
  final case class AsOfOut(event_id: Long, user_id: Long, tsMicros: Long,
    asofMicros: Option[Long])

  /** Partition a key the way Spark's HashPartitioning does for a single
    * LongType clustering column: murmur3(long, seed 42) pmod n. Used by
    * the runtime alignment guard below; if a Spark upgrade ever changes
    * the exchange this stops matching and the guard FAILS LOUDLY,
    * instead of the merge silently pairing misaligned partitions. */
  private[graft] def expectedPartition(key: Long, n: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(key, 42)
    val m = h % n
    if (m < 0) m + n else m
  }

  /** Generic as-of: left rows get the latest right tsMicros ≤ their own,
    * per user_id. Both inputs any partitioning; output is a Dataset of
    * AsOfOut.
    *
    * Correctness of the zipped merge rests on an UNCONTRACTED Spark
    * invariant (ADVICE r03): identical `repartition(n, col)` calls on
    * both inputs yield identically-assigned hash partitions. That holds
    * for HashPartitioning today, but zipPartitions only validates
    * partition COUNTS — so every row is cheaply re-hashed in the closure
    * and asserted to belong to the partition it arrived in; drift fails
    * the job with a diagnostic instead of emitting wrong as-of matches.
    * (The planner-enforced form below, [[asofJoinExec]], needs no guard:
    * requiredChildDistribution makes Spark itself own the invariant.) */
  def asofJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
               partitions: Int): DataFrame = {
    import spark.implicits._
    val l = left
      .repartition(partitions, col("user_id"))
      .sortWithinPartitions("user_id", "tsMicros", "event_id")
      .as[LeftRow]
    val r = right
      .repartition(partitions, col("user_id"))
      .sortWithinPartitions("user_id", "tsMicros")
      .as[RightRow]
    // identical HashPartitioning expressions => co-partitioned RDDs
    val merged = l.rdd.zipPartitions(r.rdd) { (li, ri) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      def aligned(key: Long): Long = {
        val exp = expectedPartition(key, partitions)
        if (exp != pid) throw new IllegalStateException(
          s"as-of co-partitioning drifted: key $key hashes to partition " +
            s"$exp but arrived in $pid of $partitions — Spark's exchange " +
            "no longer matches HashPartitioning(murmur3); use asofJoinExec")
        key
      }
      val rBuf = ri.buffered
      var curUser = Long.MinValue
      var lastTs = Option.empty[Long]
      li.map { e =>
        if (e.user_id != curUser) { curUser = aligned(e.user_id); lastTs = None }
        // advance the right side through all rows at-or-before e
        while (rBuf.hasNext && (rBuf.head.user_id < curUser ||
            (rBuf.head.user_id == curUser && rBuf.head.tsMicros <= e.tsMicros))) {
          val rr = rBuf.next()
          if (aligned(rr.user_id) == curUser) lastTs = Some(rr.tsMicros)
        }
        AsOfOut(e.event_id, e.user_id, e.tsMicros, lastTs)
      }
    }
    spark.createDataset(merged).toDF()
  }

  /** General as-of through the custom physical operator
    * (graft.plans.AsOfMergeExec): builds the logical AsOfJoinNode over
    * the analyzed inputs and lets the injected strategy plan it. The
    * planner enforces co-partitioning + per-partition (key, ts) order
    * via requiredChildDistribution/Ordering — the invariant the RDD
    * formulation above could only assume (ADVICE r02). Right columns
    * are re-aliased so both sides carry distinct attribute ids. */
  def asofJoinExec(spark: SparkSession, left: DataFrame, right: DataFrame,
                   keyCol: String = "user_id", tsCol: String = "tsMicros"): DataFrame = {
    val r = right.select(col(keyCol).as("r_key"), col(tsCol).as("r_ts"))
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, keyCol), attr(lPlan, tsCol),
      attr(rPlan, "r_key"), attr(rPlan, "r_ts"),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "asofMicros", org.apache.spark.sql.types.LongType, nullable = true)())
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }

  /** The purchase←signup as-of via the custom merge operator, shaped to
    * match EventOps.asofPurchaseSignup's oracle exactly. */
  def purchaseSignupMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tsMicros"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
    asofJoinExec(spark, purchases, signups)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("tsMicros")).as("ts"),
        timestamp_micros(col("asofMicros")).as("last_signup_ts"))
      .orderBy("event_id")
  }
}

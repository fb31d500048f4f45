package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level global ranking — the ONE spelling of "exact global rank
  * without a global sort" shared by every quantile/decile operator
  * ([[TextOps.curriculumMixture]], [[EventOps.rfmSegments]],
  * [[EventOps.paretoRevenue]]): a textbook `row_number() OVER (ORDER BY
  * …)` funnels the whole dataset through ONE task at 100 TB, so instead
  * rows are range-bucketed by a caller-provided MONOTONE key (`vb`,
  * monotone in the same direction as the rank order — bucket order IS
  * rank order), numbered within buckets in parallel, and each bucket
  * adds the running count of the buckets ranked before it. The only
  * serial work is the O(#buckets) offset scan, and the offset table
  * broadcasts; every data-sized stage stays partition-parallel.
  *
  * Contract: `df` already carries the bucket column `vb` — NON-NULL
  * (the rank join is an equi-join on `vb`, and SQL equi-joins drop NULL
  * keys: callers coalesce nullable metrics BEFORE bucketing), bounded
  * distinct values (a value range divided by a step, never an id) — and
  * `order`'s leading key is consistent with `vb`'s direction (`asc`).
  * `part` ranks independently per group (e.g. one rank per RFM metric);
  * empty ranks globally. Adds `rnk` (1-based) and drops nothing else. */
private[graft] object TwoLevelRank {
  def withRank(df: DataFrame, part: Seq[String], asc: Boolean,
               order: Column*): DataFrame = {
    val vb = col("vb")
    val partCols = part.map(col)
    val wIn = Window.partitionBy(partCols :+ vb: _*).orderBy(order: _*)
    val vbOrd = if (asc) vb.asc else vb.desc
    val offBase =
      if (part.isEmpty) Window.orderBy(vbOrd)
      else Window.partitionBy(partCols: _*).orderBy(vbOrd)
    val offsets = df.groupBy(partCols :+ vb: _*)
      .agg(count(lit(1)).as("bn"))
      .withColumn("offset", coalesce(sum(col("bn")).over(
        offBase.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(partCols :+ vb :+ col("offset"): _*)
    df.join(broadcast(offsets), part :+ "vb")
      .withColumn("rnk", col("offset") + row_number().over(wIn))
      .drop("offset")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational core over the TPC-H-ish tables (SURVEY.md §2.2 EXT).
  *
  * Design notes for oracle parity + 100 TB scale:
  *  - Money doubles are cast to DECIMAL(12,2) BEFORE any aggregation, so
  *    sums are exact and independent of accumulation order — a parallel
  *    sum over 1000 executors equals DuckDB's serial one. The FINAL
  *    projection casts each exact sum to double (and the oracle does the
  *    same), because the driver's comparator is representation-sensitive:
  *    a DECIMAL '138014.00' and a float 138014.0 hash differently even
  *    though they are numerically equal (ADVICE.md r01). Converting the
  *    identical exact value to IEEE754 on both engines is deterministic,
  *    so the doubles are bitwise equal.
  *  - Every query ends in orderBy over a key prefix: deterministic output.
  *  - Dim tables (region/nation/supplier ≤ a few thousand rows at any SF)
  *    are broadcast-joined: no shuffle of the fact side.
  *  - Aggregations are partial+final automatically (hash agg w/ map-side
  *    combine); group keys are low-cardinality so the shuffle is tiny.
  */
object RelationalOps {

  /** Exact money representation: DECIMAL(12,2) (values < 1e6, 2 decimals). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum, emitted as double for oracle-type parity. */
  def moneySum(c: Column): Column = sum(money(c)).cast("double")

  /** Pricing summary report (TPC-H Q1 shape) over lineitem.
    * Scan -> filter -> hash agg (partial+final) -> tiny sort.
    * The only shuffle moves ~|groups| rows per partition (map-side combine).
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
          * (lit(1) + money(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(money(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        (sum(money(col("l_discount"))).cast("double") / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Shipping-priority top-k (TPC-H Q3 shape): filtered fact-fact join,
    * customer side reduced to a one-column key list by the segment
    * filter. NO broadcast hint on it: AQE broadcasts the filtered keys
    * while they fit (they do at bench scale, keeping orders⋈lineitem the
    * only shuffle) and degrades to a shuffle equi-join when a 100 TB
    * customer segment outgrows the driver — a hint would pin it.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Revenue by region/nation (TPC-H Q5 shape). nation/region (25/5
    * rows) broadcast by hint; the customer side carries NO hint — AQE
    * broadcasts the narrow (custkey, names) projection while it fits and
    * shuffle-joins beyond, so the plan survives a customer table that
    * outgrows the driver. */
  def regionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val dims = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Customers with at least one open order — EXISTS via left_semi join
    * (reference O7's set-membership test, index.py:166, relationalized). */
  def customersWithOpenOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val open = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O").select("o_custkey")
    cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Customers with no pending ('P') orders — NOT EXISTS via left_anti
    * join (reference O7 `not in` semantics, index.py:162). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "P").select("o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Top-3 parts by retail price per brand — ranking window (EXT §2.2).
    * Shuffles once on p_brand; rank inside each partition. */
  def topPartsPerBrand(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
      .orderBy("p_brand", "rn")
  }

  /** Order-priority counts by month — date_trunc + count agg (EXT). */
  def orderPriorityByMonth(spark: SparkSession, sfDir: String): DataFrame = {
    // order_month stays TIMESTAMP (not DATE): parquet DATE and DuckDB DATE
    // take different paths through the driver's pandas compare (date object
    // vs datetime64) and hash-mismatch even when equal
    Tables.orders(spark, sfDir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"),
               col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"),
           moneySum(col("o_totalprice")).as("sum_total"))
      .orderBy("order_month", "o_orderpriority")
  }

  /** Rollup over region/nation customer counts (grouping-sets EXT). */
  def customerRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val joined = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
    joined.rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           moneySum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Global top-k: 10 highest-value orders. Spark plans this as
    * TakeOrderedAndProject — per-partition top-k then a single merge, no
    * full sort. */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        money(col("o_totalprice")).cast("double").as("total"))
      .orderBy(col("total").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Set algebra (reference O7/union semantics): customers present in both
    * the BUILDING segment and the high-balance set (intersect), plus union
    * and except variants are covered in tests. */
  def setOpsCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = cust.filter(col("c_acctbal") > 5000).select("c_custkey")
    building.intersect(rich).orderBy("c_custkey")
  }

  /** Theta/range join: lineitems shipped within 30 days after their
    * order date (non-equi condition on top of the equi key). */
  def shipLagWithin30Days(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_quick_lines"))
      .orderBy("l_orderkey")
  }

  /** Cube over order status × priority (grouping-sets EXT, the cube
    * companion of [[customerRollup]]). */
  def orderCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("sum_total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Arbitrary GROUPING SETS (beyond rollup/cube): per-status totals,
    * per-priority totals, and the grand total — but not the cross. */
  def orderGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("sum_total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Set difference: BUILDING-segment customers that are NOT
    * high-balance (completes the union/intersect/except triad of
    * reference O7's set algebra). */
  def exceptCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = cust.filter(col("c_acctbal") > 5000).select("c_custkey")
    building.except(rich).orderBy("c_custkey")
  }

  /** Exact distinct-count per group (count_distinct shuffles on
    * (status, custkey) for the partial phase — the exact form;
    * approx_count_distinct (HLL) is the 100 TB form and is covered by a
    * ScalaTest accuracy bound, since HLL sketches are not
    * oracle-reproducible across engines). */
  def distinctCustomersPerStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** Reference O15 (Mongo `$set` point update, apitestmongo.py:48-55) as
    * merge semantics: updates table left-joined onto the base, new
    * values coalesced over old per column. At production scale this is
    * Delta/Iceberg MERGE; over parquet it is the same join shape. */
  def upsertCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val updates = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("u_custkey"),
        (money(col("c_acctbal")).cast("double") + 1000.0).as("u_acctbal"),
        lit("UPDATED").as("u_mktsegment"))
    cust.join(updates, col("c_custkey") === col("u_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("u_acctbal"), money(col("c_acctbal")).cast("double"))
          .as("acctbal"),
        coalesce(col("u_mktsegment"), col("c_mktsegment")).as("mktsegment"),
        col("u_custkey").isNotNull.as("was_updated"))
      .orderBy("c_custkey")
  }

  /** Median retail price per brand — exact interpolated percentile.
    * Exact percentile shuffles all values per group (fine for bounded
    * groups); at 100 TB approx_percentile is the sketch form. */
  def medianPricePerBrand(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .groupBy("p_brand")
      .agg(percentile(col("p_retailprice"), lit(0.5)).as("median_price"),
           count(lit(1)).as("n_parts"))
      .orderBy("p_brand")

  /** Full outer join: BUILDING-segment membership vs pending-order
    * counts — rows survive from either side, key coalesced. */
  def fullOuterSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val building = cust.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("b_custkey"))
    val pending = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey").as("p_custkey"))
      .agg(count(lit(1)).as("n_pending"))
    building.join(pending, col("b_custkey") === col("p_custkey"), "full_outer")
      .select(
        coalesce(col("b_custkey"), col("p_custkey")).as("custkey"),
        col("b_custkey").isNotNull.as("in_building"),
        coalesce(col("n_pending"), lit(0L)).as("n_pending"))
      .orderBy("custkey")
  }

  /** Ranking-function family over one window: rank, dense_rank, ntile
    * (deterministic: ordering includes the unique p_partkey). */
  def rankFamilyParts(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_partkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"))
      .filter(col("rnk") <= 8)
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  /** Distribution-rank window family: percent_rank and cume_dist over
    * brand-partitioned prices — the quantile-position analytics that
    * complete the ranking family ([[rankFamilyParts]] covers the
    * ordinal ranks). Both are exact small-integer divisions
    * ((rank-1)/(n-1), rows<=/n) so the doubles are bit-identical across
    * engines; ties in price take equal values, deterministic regardless
    * of tie order. One shuffle (the brand window). */
  def distFamilyParts(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc)
    Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_partkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .filter(col("pr") <= 0.1)
      .orderBy("p_brand", "p_partkey")
  }

  /** Wide→long reshape (melt / UNPIVOT): one row per (part, measure)
    * from the columnar measures, via Dataset.unpivot — a single
    * Expand node, row-local and zero-shuffle, where the naive spelling
    * is k self-UNIONs that scan the table k times. Measures are cast
    * to double up front so the value column has one type (unpivot
    * requires it, and the oracle's UNION ALL model matches bitwise —
    * int-valued doubles are exact). At 100 TB this is the shape used
    * to feed per-feature statistics: the Expand multiplies rows
    * map-side, so downstream (measure)-keyed aggs see k·N rows but
    * the table itself is scanned once. */
  def unpivotPartMeasures(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("p_size"), col("p_retailprice")),
        variableColumnName = "measure",
        valueColumnName = "val")
      .orderBy("p_partkey", "measure")
  }

  /** Percent-of-total contribution: each order priority's revenue share
    * of the whole book. The scale-correct spelling is a 1-row total
    * aggregate BROADCAST back over the per-group rows — never
    * `sum() OVER ()`, whose empty partitioning funnels every row
    * through a single task. Shares are integer BASIS POINTS from exact
    * cent arithmetic (cents·10000 DIV total_cents): decimal division
    * would pit Spark's scale/rounding rules against the oracle's,
    * integer division is bit-identical. (Both engines CAST the
    * integral-valued cent decimals, so round-vs-truncate never
    * differs.) */
  def revenueShareByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    val tot = per.agg(sum(col("rev")).as("tot"))
    per.crossJoin(broadcast(tot))
      .select(col("o_orderpriority"),
        col("rev").cast("double").as("revenue"),
        expr("CAST(CAST(rev * 100 AS BIGINT) * 10000 DIV CAST(tot * 100 AS BIGINT) AS BIGINT)")
          .as("share_bps"))
      .orderBy("o_orderpriority")
  }

  /** Running distinct count over a window — COUNT(DISTINCT) OVER is
    * illegal in both engines, so this is the standard rewrite: flag
    * each (brand, type)'s FIRST row by price rank, then running-sum
    * the flags over the brand window. Distinct-so-far state never
    * materializes as a per-row set; it's two ordinary window passes.
    * The first window partitions by (brand, type) — a refinement of
    * the second's (brand) — so at scale AQE plans two exchanges of
    * the same narrow projection, or one when the input is already
    * brand-bucketed. */
  def runningDistinctTypes(spark: SparkSession, sfDir: String): DataFrame = {
    val perType = Window.partitionBy(col("p_brand"), col("p_type"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val perBrand = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.part(spark, sfDir)
      .withColumn("first_occ",
        when(row_number().over(perType) === 1, 1L).otherwise(0L))
      .select(col("p_brand"), col("p_partkey"),
        sum(col("first_occ")).over(perBrand).as("distinct_types_so_far"))
      .orderBy("p_brand", "p_partkey")
  }

  /** Data-quality constraint suite (Deequ-style gate): uniqueness,
    * referential integrity, domain membership, freshness, and range
    * checks emitted as one (check, n_rows, n_violations, ok) report —
    * the go/no-go table a pipeline consults before publishing a
    * dataset. Scale shape: ALL of a table's row-local checks fold into
    * ONE conditional-aggregate pass over one scan (never one scan per
    * check); the lone join-shaped check (FK) is a broadcast-dim
    * left-anti count. The result is k tiny 1-row aggregates unioned —
    * driver-side size k, data-side one pass per table. Freshness and
    * quantity thresholds are set tight enough to flag rows in this
    * corpus: a report that can only ever say "ok" tests nothing. */
  def dataQualityReport(spark: SparkSession, sfDir: String): DataFrame = {
    def longSum(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val o = Tables.orders(spark, sfDir)
    val ordersAgg = o.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
      longSum(!col("o_orderstatus").isin("P", "O", "F")).as("status_dom"),
      longSum(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .as("stale"))
    val fkViolations = o.join(
        Tables.customer(spark, sfDir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val li = Tables.lineitem(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      longSum(!col("l_quantity").between(1, 40)).as("qty_range"))
    val ev = Tables.events(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      longSum(col("value") < 0).as("neg_value"),
      longSum(col("props").isNull).as("null_props"))
    // stack() the wide 1-row aggregates into long rows: referencing the
    // same DataFrame from k union branches would RE-EXECUTE the
    // aggregate (and its scan) k times — Catalyst does not materialize
    // shared subplans; an Expand over the single 1-row result does.
    val ordersRows = ordersAgg.crossJoin(fkViolations).selectExpr(
      "n_rows",
      """stack(4,
        |  'orders_pk_unique', pk_dup,
        |  'orders_status_domain', status_dom,
        |  'orders_fresh_before_2000', stale,
        |  'orders_fk_customer', v) AS (check_name, n_violations)""".stripMargin)
    val liRows = li.selectExpr("n_rows",
      "stack(1, 'lineitem_qty_1_40', qty_range) AS (check_name, n_violations)")
    val evRows = ev.selectExpr("n_rows",
      """stack(2,
        |  'events_value_nonneg', neg_value,
        |  'events_props_complete', null_props) AS (check_name, n_violations)"""
        .stripMargin)
    ordersRows.unionAll(liRows).unionAll(evRows)
      .select(col("check_name"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("ok"))
      .orderBy("check_name")
  }

  /** Universe sampling: sample by HASH OF THE JOIN KEY, not per-row —
    * every table filtered by the same key predicate keeps a CONSISTENT
    * 20% universe of customers, so joins, funnels, and per-key
    * aggregates computed on the sample are exact for the sampled keys
    * (per-row Bernoulli would break referential integrity: a kept
    * order whose customer was dropped). The fixed multiplicative hash
    * is engine-portable and cluster-size-independent — reruns and
    * resumes see the same universe, and at 100 TB the predicate pushes
    * to both scans BEFORE the join, shrinking the shuffle to the
    * sample rate. Left join keeps zero-order customers: the sample
    * must preserve the key population, not just matched pairs. */
  def universeSampleSpend(spark: SparkSession, sfDir: String): DataFrame = {
    def inUniverse(key: Column): Column =
      (key * lit(2654435761L)) % lit(1000000007L) % 100 < 20
    val cust = Tables.customer(spark, sfDir)
      .filter(inUniverse(col("c_custkey")))
      .select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, sfDir)
      .filter(inUniverse(col("o_custkey")))
      .select("o_custkey", "o_totalprice")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(col("o_custkey")).as("n_orders"),
        coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total_spend"))
      .orderBy("c_custkey")
  }

  /** Correlated-scalar shape: parts priced above their brand average.
    * Expressed as window avg (one shuffle) instead of a self-join. */
  def partsAboveBrandAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
    Tables.part(spark, sfDir)
      .withColumn("brand_cnt", count(lit(1)).over(w))
      .withColumn("brand_sum", sum(money(col("p_retailprice"))).over(w))
      .filter(money(col("p_retailprice")) * col("brand_cnt") > col("brand_sum"))
      .select("p_partkey", "p_brand", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** TPC-H Q10 shape (returned-item reporting) through the SQL ENTRY
    * PATH — the relational analogue of TextOps' fingerprint-via-SQL:
    * registered temp views over the same parquet loaders, the whole
    * query handed to `spark.sql`. Same Catalyst plan space as the
    * DataFrame suite (the optimizer sees identical logical plans), so
    * this pins API parity: a user arriving with SQL gets the same
    * broadcast-dim join and decimal-exact aggregation discipline
    * (DECIMAL(12,2) partials, double only at the edge) the DataFrame
    * spellings use. */
  def sqlReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem_v
      JOIN orders_v ON l_orderkey = o_orderkey
      JOIN customer_v ON o_custkey = c_custkey
      JOIN nation_v ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-10-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting) — the
    * MULTI-CORRELATED-EXISTS decorrelation exercise: one EXISTS and one
    * NOT EXISTS, both correlated to the outer lineitem row by order key
    * AND by a supplier INEQUALITY. (The local lineitem has no
    * receipt/commit dates; `l_returnflag = 'R'` stands in as the
    * per-line "failure" predicate with the same shape.) Catalyst
    * decorrelates EXISTS into a LEFT SEMI and NOT EXISTS into a LEFT
    * ANTI join on the equi-key with the `<>` as residual join
    * condition — three co-partitioned passes over lineitem on
    * l_orderkey, never a cartesian; at 100 TB all three sides shuffle
    * once on the same key (or ride bucketed layout with no exchange at
    * all). Deterministic under LIMIT: s_name is unique per supplier. */
  def sqlWaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier_v, lineitem_v l1, orders_v
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_returnflag = 'R'
        AND EXISTS (
          SELECT 1 FROM lineitem_v l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem_v l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20""")
  }

  /** TPC-H Q2 shape (minimum-cost supplier) — the CORRELATED SCALAR
    * subquery exercise: the outer predicate compares a lineitem price
    * to `(SELECT min(price) ... WHERE l2.l_partkey = p_partkey)`.
    * Catalyst's RewriteCorrelatedScalarSubquery turns the subquery
    * into a per-partkey aggregate LEFT-OUTER-joined on the correlation
    * key and rewrites the comparison against the joined column — an
    * aggregate + two equi-joins, no per-row re-execution and no
    * cartesian; exactly the group-then-join discipline
    * [[largeOrders]] hand-writes, here produced by the decorrelator
    * from declarative SQL. Ties on the min price all survive (same in
    * DuckDB); the full ORDER BY makes the output deterministic. */
  def sqlMinPricePerPart(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "lineitem").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT p_partkey, p_brand, l_suppkey, l_orderkey, l_linenumber,
             l_extendedprice AS min_price
      FROM part_v, lineitem_v
      WHERE l_partkey = p_partkey
        AND p_size >= 45
        AND l_extendedprice = (
          SELECT MIN(l2.l_extendedprice) FROM lineitem_v l2
          WHERE l2.l_partkey = p_partkey)
      ORDER BY p_partkey, l_suppkey, l_orderkey, l_linenumber""")
  }

  /** TPC-H Q15 shape (top supplier by revenue) — the UNCORRELATED
    * scalar-aggregate-over-a-view exercise completing the subquery
    * family ([[sqlWaitingSuppliers]] EXISTS / [[sqlMinPricePerPart]]
    * correlated scalar): the same derived revenue view is consumed
    * twice, once as the join input and once reduced to a 1-row MAX that
    * Catalyst plans as a scalar subquery broadcast into the filter —
    * the revenue aggregation shuffles lineitem once per consumer and
    * nothing ever re-executes per row. Exact DECIMAL revenue makes the
    * MAX-equality deterministic; the output casts to double only at the
    * edge. Ties on the max all survive (same in DuckDB). */
  def sqlTopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("supplier_v")
    // spread: the revenue CTE's decimal agg is CPU-bound and the scalar
    // MAX subquery re-runs it — both passes deserve > 3 tasks locally;
    // identity at cluster scale (see Tables.spread). Keyed on the AGG
    // key l_suppkey (r15, guide §2.4 share exchanges): the spread
    // exchange then satisfies the groupBy's required distribution, so
    // the separate ENSURE_REQUIREMENTS exchange disappears AND the scan
    // no longer reads l_orderkey (one less column through the full-width
    // exchange).
    Tables.spread(Tables.load(spark, sfDir, "lineitem"), col("l_suppkey"))
      .createOrReplaceTempView("lineitem_v")
    // the revenue view is read TWICE (equi-join probe + scalar MAX);
    // Spark inlines WITH-CTEs, so without materialization the lineitem
    // aggregate runs twice — persist() makes the second consumer read
    // the cached per-supplier rows (Q15's defining "create view" step
    // in the spec is exactly this materialization; caller releases via
    // clearCache, the suite-wide contract)
    val revenue = spark.sql("""
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem_v GROUP BY l_suppkey""")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    revenue.createOrReplaceTempView("revenue_v")
    spark.sql("""
      SELECT s_suppkey, s_name,
             CAST(total_revenue AS DOUBLE) AS total_revenue
      FROM supplier_v, revenue_v
      WHERE s_suppkey = supplier_no
        AND total_revenue = (SELECT MAX(total_revenue) FROM revenue_v)
      ORDER BY s_suppkey""")
  }

  /** TPC-H Q7 shape (volume shipping between two nations) via the SQL
    * entry path — the classic JOIN-REORDER exercise: six relations with
    * the selective disjunctive nation predicate spanning BOTH nation
    * references. Catalyst prunes each nation side to one row behind a
    * broadcast, and the lineitem→orders→customer chain shuffles on its
    * join keys once each; the bidirectional OR survives as a join-level
    * filter, never a cartesian. Money math in DECIMAL(12,2) partials,
    * double only at the edge (driver-hash discipline). */
  def sqlNationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "customer", "nation").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume
        FROM supplier_v, lineitem_v, orders_v, customer_v, nation_v n1, nation_v n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""")
  }

  /** TPC-H Q8 shape (national market share) — the EIGHT-relation join
    * with a conditional-aggregate ratio: share of one supplier nation in
    * a region's PROMO-part import volume, by order year. The region and
    * both nation sides broadcast (dimension tables), part's type filter
    * prunes before the join, and the fact chain shuffles once per key —
    * the plan Catalyst should and does pick without hints. The ratio
    * divides two exactly-summed DECIMAL volumes only after the DOUBLE
    * cast, so both engines stringify identical bits. */
  def sqlMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "customer", "nation",
      "region").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT o_year,
        CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
          / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume,
          n2.n_name AS nation
        FROM part_v, supplier_v, lineitem_v, orders_v, customer_v,
          nation_v n1, nation_v n2, region_v
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
          AND p_type = 'PROMO') all_nations
      GROUP BY o_year ORDER BY o_year""")
  }

  /** TPC-H Q9 shape (product-type profit by nation and year). The local
    * schema has no partsupp, so ps_supplycost is stood in by
    * 0.1·p_retailprice per unit — the JOIN STRUCTURE (part's name
    * filter fanning through lineitem to supplier nation and order year)
    * and the mixed-sign DECIMAL profit aggregation are what the shape
    * exercises. Scales as one shuffle per fact join key; part prunes on
    * the LIKE before joining. */
  def sqlProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "nation").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2)))
            - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(3,1))
              * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        FROM part_v, supplier_v, lineitem_v, orders_v, nation_v
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%') profit
      GROUP BY nation, o_year ORDER BY nation, o_year""")
  }

  /** TPC-H Q18 shape (large-volume orders): aggregate the fact table
    * FIRST (sum quantity per order, map-side combined), filter the
    * aggregate (HAVING), and only then join the ~0.1%-selective
    * survivor keys to orders and customers — the group-filter-join
    * discipline that keeps the join input at |qualifying orders|, not
    * |lineitem|. AQE broadcasts the survivor side while it fits. */
  def largeOrders(spark: SparkSession, sfDir: String,
                  minQty: Double = 250.0): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(sum(money(col("l_quantity"))).cast("double").as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        money(col("o_totalprice")).cast("double").as("o_price"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q4 shape (order-priority checking): a correlated EXISTS
    * whose subquery references the OUTER row in a NON-equi predicate
    * (l_shipdate > o_orderdate) on top of the equi correlation.
    * Catalyst decorrelates it to one LEFT SEMI join on l_orderkey with
    * the date comparison as residual — one pass over lineitem, no
    * per-row re-execution. At 100 TB both sides hash-partition on the
    * order key (or ride bucketed layout with zero exchange); the semi
    * join caps its output at |filtered orders|, never |lineitem|, and
    * the quarter filter prunes the orders scan before the join. */
  def sqlOrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "lineitem").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders_v
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem_v
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join with an extra NON-key predicate inside the join condition —
    * orders dropped by `o_orderpriority <> '1-URGENT'` must still
    * yield their customer with count 0, so the predicate CANNOT move
    * to a WHERE (that would silently make the join inner; Catalyst is
    * not allowed to push it, and doesn't). COUNT(o_orderkey) counts
    * only matched rows (NULL-skipping), giving the exact per-customer
    * order count including zeros. Two exchanges at any scale: the
    * outer join on custkey and the tiny histogram regroup whose input
    * is |customers| rows, already one per key. */
  def sqlCustDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer_v LEFT OUTER JOIN orders_v
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  }

  /** TPC-H Q14 shape (promotion effect): a conditional-aggregate RATIO
    * over one month of lineitem joined to part. Both sums stay
    * DECIMAL(12,2)-exact until the single final division, so the
    * resulting double is bit-identical across engines and partition
    * fold orders. The ship-date window prunes the fact scan BEFORE
    * the join; part is the broadcast side; the 1-row answer means the
    * final exchange carries two decimal partials per partition. */
  def sqlPromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume ELSE 0 END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS promo_share
      FROM (
        SELECT p_type,
          CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume
        FROM lineitem_v, part_v
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01') promo""")
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    * AVG — the decorrelation case with the classic COUNT-bug hazard
    * (an empty group must yield NULL, not 0, so the comparison is
    * false). Catalyst rewrites it to a per-partkey aggregate
    * LEFT-OUTER-joined back on the correlation key. Determinism note:
    * quantities are integral, so SUM(double) is order-independent-exact
    * and AVG = sum/count is the same double in both engines; the final
    * division by 7.0 happens once on the driver-side 1-row result.
    * At 100 TB the aggregate side collapses lineitem to |parts touched
    * by the brand filter| rows before the join — never a re-scan per
    * outer row. */
  def sqlSmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
      FROM lineitem_v, part_v
      WHERE p_partkey = l_partkey
        AND p_brand = 'Brand#3' AND p_type = 'PROMO'
        AND l_quantity < 0.2 * (
          SELECT AVG(l2.l_quantity) FROM lineitem_v l2
          WHERE l2.l_partkey = p_partkey)""")
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    * OR-of-ANDs join condition where every disjunct repeats the
    * `p_partkey = l_partkey` equi-conjunct. Catalyst factors the
    * common equi-condition OUT of the disjunction, planning an
    * equi-join (broadcast here, shuffle-hash at scale) with the
    * brand/size/quantity disjunction as residual filter — never the
    * cartesian a naive reading of the OR would force. The l_quantity
    * bounds also derive a pushed range filter (qty between the min and
    * max across disjuncts) on the fact scan. */
  def sqlDisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
      FROM lineitem_v, part_v
      WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
             AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
             AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         OR (p_partkey = l_partkey AND p_brand = 'Brand#24'
             AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")
  }

  /** TPC-H Q6 shape (forecasting revenue change): the pure
    * scan-efficiency probe — single table, no join, no group key, three
    * range predicates and one decimal-exact product sum. Every filter
    * is pushable (PushedFilters on shipdate/discount/quantity), the
    * projection reads three columns of the fact table, and the 1-row
    * answer means each partition ships a single decimal partial: the
    * query is scan-bandwidth-bound by construction, the shape used to
    * measure raw scan + pushdown health at 100 TB. Discounts are
    * exact hundredths stored as doubles, so the BETWEEN endpoints
    * match identically in both engines. */
  def sqlSimpleRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem_v
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""")
  }

  /** TPC-H Q11 shape (important stock identification): a group survives
    * only if its value exceeds 1.5× the mean group value. The textbook
    * spelling gates HAVING on TWO uncorrelated scalar subqueries
    * (COUNT(DISTINCT part), global SUM) — three scans of the fact
    * table. Both scalars are DERIVABLE FROM THE GROUPED AGGREGATE
    * ITSELF (the distinct part count is the group count; the global
    * total is the sum of group sums — exact in DECIMAL, order-
    * independent), so this spelling computes the per-part aggregate
    * ONCE and folds it into a 1-row (count, total) aggregate that
    * broadcasts back into the filter: one scan, one corpus shuffle,
    * and Catalyst reuses the per-part exchange for both consumers.
    * The above-1.5×-mean test is cross-multiplied (value·n·2 >
    * total·3) so every comparison stays in exact integer/decimal
    * products — decimal DIVISION rounds and could flip a boundary
    * group between engines. Per-part stock value stands in for the
    * absent partsupp availability. */
  def sqlImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    // spread: the local file is 3 splits and the decimal-product agg is
    // CPU-bound; identity at cluster scale (see Tables.spread). Keyed
    // on the AGG key l_partkey (r15, guide §2.4): the spread exchange
    // satisfies the per-part groupBy's distribution — no second
    // exchange, and l_orderkey drops out of the scan entirely.
    Tables.spread(Tables.load(spark, sfDir, "lineitem"), col("l_partkey"))
      .createOrReplaceTempView("lineitem_v")
    spark.sql("""
      WITH a AS (
        SELECT l_partkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_quantity AS DECIMAL(12,2))) AS sv
        FROM lineitem_v
        GROUP BY l_partkey),
      g AS (SELECT COUNT(*) AS cntd, SUM(sv) AS tot FROM a)
      SELECT l_partkey, CAST(sv AS DOUBLE) AS stock_value
      FROM a, g
      WHERE sv * cntd * 2 > tot * 3
      ORDER BY stock_value DESC, l_partkey""")
  }

  /** TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT) per
    * group with a NOT IN subquery over a nullable-typed key — the
    * NULL-AWARE anti join path, distinct from NOT EXISTS' plain anti
    * join: NOT IN must reject every probe row if the subquery yields
    * any NULL, so Catalyst plans a null-aware anti join (broadcast,
    * with the isnull-or-match condition) rather than a simple LeftAnti
    * on equality. The excluded-supplier list (negative balances) is
    * tiny and broadcasts; the distinct-count aggregate shuffles once
    * on the (brand, type, size) group key after the semi-filtered
    * join. */
  def sqlPartsSupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "lineitem", "supplier").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM part_v, lineitem_v
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#1'
        AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier_v WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  }

  /** TPC-H Q12 shape (shipping modes / order priority): conditional
    * priority counts per derived ship-lag class (the local lineitem
    * carries no shipmode/receipt date; days-from-order buckets play
    * the mode's role with the same CASE-in-aggregate structure). One
    * fact-fact equi-join on the order key, then a 3-group conditional
    * aggregate — the CASE arms fold into the same map-side-combined
    * hash agg, so the exchange carries two counters per class per
    * partition. */
  def sqlShipLagPriority(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "orders").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT lag_class,
        SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS high_count,
        SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS low_count
      FROM (
        SELECT o_orderpriority,
          CASE WHEN datediff(l_shipdate, o_orderdate) <= 30 THEN 'fast'
               WHEN datediff(l_shipdate, o_orderdate) <= 90 THEN 'medium'
               ELSE 'slow' END AS lag_class
        FROM lineitem_v JOIN orders_v ON l_orderkey = o_orderkey) x
      GROUP BY lag_class
      ORDER BY lag_class""")
  }

  /** TPC-H Q20 shape (potential part promotion): a SEMI JOIN whose
    * subquery is itself an AGGREGATE with HAVING — suppliers appearing
    * in any (supplier, part) group that shipped > 50 units of a
    * name-matched part. Catalyst plans the IN as LEFT SEMI against the
    * grouped/filtered subquery; the aggregate collapses lineitem to
    * (suppkey, partkey) groups BEFORE the semi probe, so the join
    * input is |qualifying groups|, not |lineitem| — the same
    * group-filter-join discipline as the Q18 shape, reached through
    * the subquery planner instead of an explicit CTE. */
  def sqlExcessSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "part").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      SELECT s_suppkey, s_name
      FROM supplier_v
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem_v, part_v
        WHERE l_partkey = p_partkey AND p_name LIKE '%red%'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50)
      ORDER BY s_suppkey""")
  }

  /** TPC-H Q22 shape (global sales opportunity): rich customers with no
    * RECENT orders, grouped by a name-derived code. Exercises three
    * planner paths at once: an uncorrelated scalar-aggregate subquery
    * pair (the positive-balance count and sum, each a 1-row broadcast),
    * a correlated NOT EXISTS decorrelated to a LEFT ANTI join on
    * custkey, and string derivation in the group key. The
    * above-average comparison is EXACT: `bal * n > s` in DECIMAL
    * arithmetic instead of comparing against a floating AVG, so no
    * boundary row can flip between engines. (The local customer has no
    * phone; the last two digits of c_name stand in as the country
    * code, and "no orders since 2000" stands in for "no orders ever",
    * which is empty on this corpus.) */
  /** NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM): the join
    * semantics ordinary `=` cannot give — NULL keys MATCH each other
    * instead of silently dropping, the behavior a dimension merge needs
    * when "unknown" is itself a legitimate bucket. Keys are made
    * sparse-nullable with nullif; Spark still plans this as a HASH join
    * (null-safe equality is a hashable key expression — no fallback to
    * nested-loop), so the 100 TB shape is the ordinary shuffled equi
    * join with the NULL bucket as one more key value (a skew candidate
    * when unknowns dominate — [[skewNullBucketJoin]] drives exactly
    * that case and proves the AQE skew split fires on it). */
  def nullSafeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), nullif(col("c_nationkey") % 5, lit(4)).as("ck"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), nullif(col("s_nationkey") % 5, lit(4)).as("sk"))
    c.join(s, col("ck") <=> col("sk"))
      .groupBy(col("ck").as("key_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c_custkey")).as("n_customers"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("key_bucket").asc_nulls_first)
  }

  /** The [[nullSafeJoin]] hazard DRIVEN FOR REAL (VERDICT r8 #5): a
    * null-safe dimension merge where the unknown bucket DOMINATES —
    * only nation 0 is "known", so ~24/25 of customers and suppliers
    * land on the NULL key and one shuffle partition carries almost the
    * whole join. This is the canonical skewed-join input, and the query
    * executes with AQE skew-join splitting adjudicated at runtime:
    * OptimizeSkewedJoin splits the hot sort-merge partition into
    * advisory-sized slices (replicating the matching other side), which
    * is exactly the mitigation a 100 TB unknown-dominated merge relies
    * on — no salting rewrite, no plan surgery, the straight declarative
    * join plus runtime statistics.
    *
    * Harness mechanics: the skew thresholds are scoped to THIS query's
    * materialization (test-scale shuffle partitions are KB-sized; the
    * 256 MB production default would never trip locally) and restored
    * after — production keeps the defaults and the same plan splits at
    * the same relative skew. Both broadcast paths are pinned off while
    * it runs (at real scale neither side fits in a broadcast), the
    * merge hint pins SMJ, and the final adaptive plan's "skew=true"
    * split count is filed in [[graft.tools.SkewEvidence]] — Bench
    * appends it to bench_journal.jsonl, the spec asserts it fired.
    * Aggregation keys differ from the join key on purpose: a
    * downstream operator requiring the join key's distribution would
    * veto the split (AQE never introduces an extra shuffle to split a
    * skew), so the per-supplier rollup sits behind its own exchange. */
  def skewNullBucketJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // spread: a 1-split local scan means ONE mapper feeds the hot
      // reduce partition, and OptimizeSkewedJoin can only split at map-
      // block boundaries — identity on a real multi-split cluster scan
      val c = Tables.spread(Tables.customer(spark, sfDir), col("c_custkey"))
        .select(col("c_custkey"),
          when(col("c_nationkey") === 0, 0L).otherwise(lit(null).cast("long"))
            .as("ck"))
      val s = Tables.spread(Tables.supplier(spark, sfDir), col("s_suppkey"))
        .select(col("s_suppkey"),
          when(col("s_nationkey") === 0, 0L).otherwise(lit(null).cast("long"))
            .as("sk"))
      val agg = c.join(s.hint("merge"), col("ck") <=> col("sk"))
        .groupBy(col("s_suppkey"), col("sk").as("key_bucket"))
        .agg(count(lit(1)).as("n_matches"),
          sum(col("c_custkey")).as("sum_custkeys"))
        .orderBy("s_suppkey")
      // materialize NOW, under the scoped confs — the skew split exists
      // only in the final adaptive plan of an executed query
      val out = agg.localCheckpoint()
      graft.tools.SkewEvidence.record("rel_skew_null_bucket",
        agg.queryExecution.executedPlan.toString)
      out
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** LATERAL correlated subquery with ORDER BY + LIMIT — the "top-2
    * line items per order" spelling a SQL user writes naturally, and
    * the last decorrelation family the engine had not exercised:
    * Catalyst rewrites the per-order correlated LIMIT into
    * `WindowGroupLimit` (a PARTIAL group-limit runs map-side BEFORE the
    * shuffle, so each partition forwards ≤2 rows per order key — the
    * whole-plan analogue of the bounded TopK aggregator) joined back to
    * the outer filter, instead of re-executing the subquery per outer
    * row. DuckDB runs the same LATERAL text natively, so the oracle is
    * the same query. */
  def sqlLateralTopItems(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("orders_v")
    // spread: the decorrelated lateral runs a per-order rank window at
    // SCAN parallelism — lineitem's 11 MB parquet plans ≤3 splits, so
    // the 600 k-row sort+window ran single-digit-task (1.33 s stage,
    // JobProfile r15); hash-spreading on the window's own partition key
    // keeps the exchange it already needs and parallelizes it.
    // Identity at cluster scale (see Tables.spread).
    Tables.spread(Tables.load(spark, sfDir, "lineitem"), col("l_orderkey"))
      .createOrReplaceTempView("lineitem_v")
    spark.sql("""
      SELECT o.o_orderkey, t.l_linenumber, t.revenue
      FROM orders_v o, LATERAL (
        SELECT l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem_v l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY revenue DESC, l_linenumber LIMIT 2) t
      WHERE o.o_orderstatus = 'P'
      ORDER BY o_orderkey, l_linenumber""")
  }

  def sqlGlobalSales(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }
    spark.sql("""
      WITH pos AS (
        SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s
        FROM customer_v WHERE c_acctbal > 0.0)
      SELECT cntrycode, COUNT(*) AS numcust,
             CAST(SUM(bal) AS DOUBLE) AS totacctbal
      FROM (
        SELECT SUBSTRING(c_name, LENGTH(c_name) - 1, 2) AS cntrycode,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer_v
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * (SELECT n FROM pos)
              > (SELECT s FROM pos)
          AND NOT EXISTS (
            SELECT 1 FROM orders_v
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01')) custsale
      GROUP BY cntrycode
      ORDER BY cntrycode""")
  }

  /** Recursive-CTE subtree rollup — the SQL SURFACE for iteration (the
    * reference's crawl loop, index.py:121-142, is exactly this shape:
    * a work-list expanded until exhausted). Spark 4's `WITH RECURSIVE`
    * plans a `UnionLoop`: the engine runs the same materialize-frontier
    * / join / append cycle [[graft.operators.GraphOps.frontierBfs]]
    * hand-drives — but declared in one SQL statement, with Catalyst
    * owning per-step column pruning and join planning.
    *
    * The hierarchy is a derived 8-ary forest over customer keys
    * (parent(k) = k DIV 8, roots 1..7): every node has exactly ONE
    * path from its anchor, which is what makes UNION ALL recursion
    * exact — Spark's recursive CTEs do not yet support UNION DISTINCT,
    * so the recursion must run on a forest/DAG with unique paths (a
    * cyclic graph diverges; that case stays with the driver-loop BFS
    * and its anti-join frontier). The rollup is the BOM/org-chart
    * query: per-anchor descendant count, max depth, and exact
    * DECIMAL-floored cents balance.
    *
    * Scale shape: recursion depth is O(log_8 N) (~11 levels at 10^10
    * keys); each level is ONE equi-join of the current frontier
    * against the table — identical per-round budget to frontierBfs.
    * The final rollup is one map-side-combined agg over |forest| rows.
    * The oracle runs the SAME text natively in DuckDB (both engines
    * terminate on frontier exhaustion, not a row cap). */
  def sqlHierarchyRollup(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("customer_v")
    spark.sql("""
      WITH RECURSIVE sub(anchor, node, depth) AS (
        SELECT c_custkey, c_custkey, 0
        FROM customer_v WHERE c_custkey BETWEEN 1 AND 7
        UNION ALL
        SELECT s.anchor, c.c_custkey, s.depth + 1
        FROM sub s JOIN customer_v c
          ON CAST(FLOOR(c.c_custkey / 8) AS BIGINT) = s.node
         AND c.c_custkey > 7
      )
      SELECT sub.anchor, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(MAX(sub.depth) AS BIGINT) AS max_depth,
             CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
                  AS BIGINT) AS bal_cents
      FROM sub JOIN customer_v c ON c.c_custkey = sub.node
      GROUP BY sub.anchor
      ORDER BY anchor""")
  }

  /** Per-column table profile — the data-quality summary every warehouse
    * job emits before trusting a new drop (row count, null count, exact
    * distinct, min/max rendered as strings so one schema covers every
    * column type). Reference analogue: index.py's ad-hoc counters grown
    * into the standard profiling report.
    *
    * TWO linear passes over the table (split r15 — see the inline
    * comment): the distinct pass plans the multi-column COUNT(DISTINCT)
    * set via one Expand + HashAggregate (map-side partials collapse the
    * fan-out; the shuffle carries per-partition partials, never rows),
    * and the null/min/max pass is a keyless single fold. The wide 1-row
    * results are recombined with a broadcast cross join and unpivoted
    * driver-free with `stack` into the (col_name, metric...) shape. At
    * 100 TB the Expand factor (6× the scan, pre-combine) is the
    * documented cost of EXACT distincts; the drop-in scale relaxation
    * is approx_count_distinct, which removes the Expand entirely —
    * same plan otherwise.
    *
    * min/max string parity: o_totalprice goes through DECIMAL(12,2) so
    * both engines render two fixed decimals; o_orderdate is
    * midnight-aligned so both render 'yyyy-MM-dd HH:mm:ss'.
    *
    * The scan rides [[Tables.spread]]: the local test file is one
    * row-group, and without the starvation guard the 6-way Expand plus
    * the distinct partial aggregation all run in a single task (2.9 s
    * of the query's 4 s at sf0.1). At cluster scale the scan has
    * >= cores splits and spread is the identity. */
  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.spread(Tables.orders(spark, sfDir), col("o_orderkey"))
    val profiled: Seq[(String, Column)] = Seq(
      "o_orderkey"      -> col("o_orderkey"),
      "o_custkey"       -> col("o_custkey"),
      "o_orderstatus"   -> col("o_orderstatus"),
      "o_totalprice"    -> money(col("o_totalprice")),
      "o_orderdate"     -> col("o_orderdate"),
      "o_orderpriority" -> col("o_orderpriority"))
    // TWO aggregation passes instead of one (r15 optimization): min/max
    // over string/timestamp/decimal columns carry IMMUTABLE aggregation
    // buffers, and one buffer like that in an aggregate demotes the
    // whole operator to SortAggregate — the fused r14 form sorted the
    // 7×-expanded distinct stream (≈7N wide rows, two sorts around the
    // exchange; 31 s of the sweep's CPU at sf0.1, the suite's worst).
    // Split, the distinct pass keeps count-only buffers → HashAggregate
    // over the Expand (hash keys may be strings; only BUFFERS must be
    // mutable), and the null/min/max pass is a keyless single fold with
    // no Expand at all. The price is a second scan of orders; at any
    // scale, two linear scans beat one sort of 7× the table.
    val distincts = profiled.map { case (n, c) =>
      count_distinct(c).as(s"${n}__nd") }
    val folds = profiled.flatMap { case (n, c) => Seq(
      count(when(c.isNull, lit(1))).as(s"${n}__nn"),
      min(c).cast("string").as(s"${n}__mn"),
      max(c).cast("string").as(s"${n}__mx")) }
    val wideD = o.agg(count(lit(1)).as("n_rows"), distincts: _*)
    val wideF = Tables.orders(spark, sfDir).agg(folds.head, folds.tail: _*)
    // 1-row × 1-row: the recombination is free; stack unpivots as before
    val wide = wideD.crossJoin(broadcast(wideF))
    val stackArgs = profiled.map { case (n, _) =>
      s"'$n', ${n}__nn, ${n}__nd, ${n}__mn, ${n}__mx" }.mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${profiled.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_s, max_s)"))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
      .orderBy("col_name")
  }

  /** Benford first-digit profile — the fraud/aberration screen a
    * warehouse runs over any naturally-grown monetary column (Benford
    * 1938, public): leading digits of amounts spanning several orders
    * of magnitude should follow P(d) = log10(1 + 1/d); a column that
    * deviates hard was generated, capped, or tampered with. Reported
    * per digit as exact basis points — observed share (n·10000 div
    * total), the Benford expectation (precomputed integer constants:
    * 3010, 1761, ... bp), and the absolute deviation — so the readout
    * is engine-exact with no float log10 anywhere. The deviation sum is
    * the screen's headline number; per-digit rows show WHERE it
    * concentrates. (TPC-H's uniform o_totalprice is expected to FAIL
    * Benford — that, not conformance, is the informative readout on
    * synthetic data.)
    *
    * Scale shape: one map-side-combined groupBy on a 9-value key; the
    * 1-row total broadcasts back. Nothing else moves. */
  def benfordProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val expBp = typedLit(Map(1 -> 3010L, 2 -> 1761L, 3 -> 1249L,
      4 -> 969L, 5 -> 792L, 6 -> 669L, 7 -> 580L, 8 -> 512L, 9 -> 458L))
    val byDigit = Tables.orders(spark, sfDir)
      .select((money(col("o_totalprice")) * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = byDigit.agg(sum(col("n")).as("total"))
    byDigit.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 10000 DIV total").as("obs_bp"),
        element_at(expBp, col("digit").cast("int")).as("exp_bp"))
      .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
      .orderBy("digit")
  }

  /** Declarative data-validation suite (the Deequ/Great-Expectations
    * check model, both public): run a battery of constraint checks —
    * completeness (NOT NULL), domain membership, value range, key
    * uniqueness, referential integrity — over `orders` and report one
    * row per check with its violation count and verdict. This is the
    * gate a 100 TB ingest runs BEFORE publishing a partition: checks
    * are declared once, evaluated in as few passes as their class
    * allows, and a single failing row blocks the release.
    *
    * Scale shape, by check class: the four row-local checks (nulls,
    * domain, range, negative price) FUSE into ONE conditional-agg scan
    * of orders — adding a check is a new aggregate expression, not a
    * new pass. Uniqueness is one map-side-combined groupBy on the key
    * (count>1 groups summed); referential integrity joins the DISTINCT
    * foreign-key projection (narrow, pre-collapsed map-side) against
    * the parent keys — at scale both sides shuffle only key columns,
    * never rows. The report is a union of 1-row frames: driver-sized,
    * like every release gate. */
  def constraintSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    // class 1: row-local predicates — ONE fused scan, one agg row
    val scan = o.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("o_orderkey").isNull, 1)).as("null_key"),
      count(when(col("o_custkey").isNull, 1)).as("null_cust"),
      count(when(col("o_orderdate").isNull, 1)).as("null_date"),
      // NULL fails a domain/range check too (three-valued logic would
      // silently skip it — the oracle counts it the same way)
      count(when(!col("o_orderstatus").isin("O", "F", "P") ||
        col("o_orderstatus").isNull, 1)).as("bad_status"),
      count(when(money(col("o_totalprice")) <= 0 ||
        col("o_totalprice").isNull, 1)).as("bad_price"))
      .localCheckpoint() // evaluate the fused scan once, slice it below
    def check(name: String, viol: Column): DataFrame =
      scan.select(lit(name).as("check_name"), col("n_rows").as("n_checked"),
        viol.cast("long").as("n_violations"))
    // class 2: key uniqueness — one groupBy on the key, excess rows only
    val dup = o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("c") - 1), lit(0L)).as("n_dup_rows"))
    // class 3: referential integrity — distinct FK projection (collapses
    // map-side) anti-joined against parent keys; only keys shuffle
    val orphans = o.select(col("o_custkey")).filter(col("o_custkey").isNotNull)
      .distinct()
      .join(Tables.customer(spark, sfDir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_keys"))
    check("o_orderkey_not_null", col("null_key"))
      .unionAll(check("o_custkey_not_null", col("null_cust")))
      .unionAll(check("o_orderdate_not_null", col("null_date")))
      .unionAll(check("o_orderstatus_in_domain", col("bad_status")))
      .unionAll(check("o_totalprice_positive", col("bad_price")))
      .unionAll(scan.crossJoin(dup)
        .select(lit("o_orderkey_unique").as("check_name"),
          col("n_rows").as("n_checked"),
          col("n_dup_rows").cast("long").as("n_violations")))
      .unionAll(scan.crossJoin(orphans)
        .select(lit("o_custkey_references_customer").as("check_name"),
          col("n_rows").as("n_checked"),
          col("n_orphan_keys").cast("long").as("n_violations")))
      .withColumn("ok", col("n_violations") === 0)
      .orderBy("check_name")
  }

  /** Functional-dependency audit (the TANE/metanome problem family,
    * public; here the CHECK form over declared candidates, not
    * discovery): a dependency lhs → rhs holds iff every lhs value maps
    * to exactly one rhs value, i.e. |distinct(lhs)| = |distinct(lhs,
    * rhs)|. Reported per candidate with the violating-group count —
    * the schema-inference signal a warehouse uses to find undeclared
    * keys and denormalization drift before they bite a join.
    *
    * Scale shape: each candidate collapses its table to DISTINCT
    * (lhs, rhs) pairs in one map-side-combined exchange — the table's
    * rows never move, only the pair projection — then one tiny agg
    * (count + count-distinct over pairs). Candidates on the same table
    * still scan independently (they need different distinct sets);
    * at 100 TB one would stage the distinct-pair tables off a shared
    * scan, which Spark's scan reuse already gives when the projections
    * agree. */
  def fdCheck(spark: SparkSession, sfDir: String): DataFrame = {
    def fd(df: DataFrame, lhs: String, rhs: String): DataFrame =
      df.select(col(lhs), col(rhs)).distinct()
        .agg(countDistinct(col(lhs)).as("n_lhs"),
          count(lit(1)).as("n_pairs"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs"), col("n_pairs"),
          (col("n_pairs") - col("n_lhs")).as("n_violating"),
          (col("n_pairs") === col("n_lhs")).as("holds"))
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    fd(n, "n_nationkey", "n_regionkey")
      .unionAll(fd(c, "c_custkey", "c_mktsegment"))
      .unionAll(fd(c, "c_nationkey", "c_mktsegment"))
      .unionAll(fd(c, "c_mktsegment", "c_nationkey"))
      .orderBy("lhs", "rhs")
  }

  /** Incremental materialized-view maintenance — the algebraic
    * partial-aggregate merge (Gray et al. 1997 data-cube algebra,
    * public): a stored per-priority aggregate over the BASE partitions
    * (o_orderkey mod 10 < 9, standing in for "yesterday's published
    * MV") absorbs a DELTA partition's partial aggregate by merging
    * mergeable state — counts add, sums add, mins least, maxes
    * greatest — and the derived mean is recomputed from merged sums.
    * The contract proven by the oracle: merge(partial(base),
    * partial(delta)) == recompute(full), bit-exact in BIGINT cents.
    *
    * Scale shape: THIS is how a 100 TB rollup stays fresh — the base
    * is never rescanned (here both partials are built in-query for
    * the oracle's sake, but the merge subtree only ever sees the two
    * priority-sized partial tables); the delta pass touches one
    * day's partition and the merge is a union + re-agg over 2×|groups|
    * rows. AVG-class (algebraic) measures ride as (sum, count) state;
    * only holistic measures (exact median) would force a rescan. */
  def incrementalAggMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("prio"),
        (money(col("o_totalprice")) * 100).cast("long").as("cents"),
        (col("o_orderkey") % 10 < 9).as("is_base"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("prio").agg(
        count(lit(1)).as("n"), sum(col("cents")).as("s"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    // the merge: union the two partial-state tables, re-aggregate with
    // each measure's MERGE operator (count+, sum+, min-least, max-greatest)
    partial(o.filter(col("is_base")))
      .unionAll(partial(o.filter(!col("is_base"))))
      .groupBy("prio").agg(
        sum(col("n")).as("n_orders"), sum(col("s")).as("sum_cents"),
        min(col("mn")).as("min_cents"), max(col("mx")).as("max_cents"))
      .withColumn("avg_cents", expr("sum_cents DIV n_orders"))
      .orderBy("prio")
  }
}

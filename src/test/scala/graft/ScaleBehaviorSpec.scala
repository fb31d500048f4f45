package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two RUNTIME scale mechanisms the 100 TB notes lean on but
  * no oracle query can show (they are plan-level, data-size-triggered):
  * AQE's skew-join split and runtime bloom-filter join pruning. Both
  * are exercised with thresholds scaled down to harness data — the
  * mechanism is identical at cluster scale, only the trigger sizes
  * differ (SURVEY §8.3). */
class ScaleBehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf0001 = SparkFixture.sf0001

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    // one hot key carries ~20k rows (≫ factor × median of the singleton
    // keys); the salting alternative is hand-written — this pins that
    // the RUNTIME re-plan path the skew story defers to actually fires
    val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("v"))
      .unionAll(spark.range(1, 200).select(col("id").as("k"), col("id").as("v")))
    val right = spark.range(0, 1).select(lit(0L).as("k"), col("id").as("w"))
      .unionAll(spark.range(1, 200).select(col("id").as("k"), col("id").as("w")))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // harness-scale triggers: a 20k-row hot partition must register
      // as skewed next to byte-sized siblings
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
      val j = left.join(right, "k")
      // drive THIS DataFrame's own QueryExecution — a count() spawns a
      // separate execution and j's adaptive plan would never finalize
      assert(j.collect().length == 200000 + 199) // hot key matches + singletons
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"),
        s"expected an AQEShuffleRead skewed split in:\n$plan")
    }
  }

  test("runtime bloom-filter pruning injects from a selective dim filter") {
    // the shuffled fact⋈dim join with a selective dim predicate: Spark's
    // InjectRuntimeFilter should plant bloom_filter_might_contain on the
    // fact side so the scan discards non-joining rows pre-shuffle — the
    // row-level runtime-filter tier under partition pruning in §8
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1b",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = Tables.lineitem(spark, sf0001)
      val dim = Tables.part(spark, sf0001).filter(col("p_size") === 1)
      val j = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
        .select("l_orderkey", "p_partkey")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$plan")
      // and the filtered result is identical to the unfiltered-plan run
      val expected = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        fact.join(dim, fact("l_partkey") === dim("p_partkey"))
          .select("l_orderkey", "p_partkey").count()
      }
      assert(j.count() == expected)
    }
  }
}

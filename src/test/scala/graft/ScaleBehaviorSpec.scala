package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the RUNTIME scale mechanisms the 100 TB notes lean on but no
  * oracle query can show (they are plan-level or data-size-triggered):
  * AQE's skew-join split, runtime bloom-filter join pruning, and the
  * kNN build's salt-split + two-phase-merge regime. The first two are
  * exercised with thresholds scaled down to harness data — the
  * mechanism is identical at cluster scale, only the trigger sizes
  * differ (SURVEY §8.3); the kNN regime test runs on a synthetic
  * corpus big enough to cross the real cap. */
class ScaleBehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf0001 = SparkFixture.sf0001

  test("kNN graph holds quality and shape where the salt-split cap engages") {
    import spark.implicits._
    import graft.operators.SimilarityOps
    // synth:8000 → 3200 vectors in 8 tight clusters (~400 each): at the
    // autoBits width whole clusters share a bucket, so buckets exceed
    // the 256 cap and BOTH scale mechanisms engage — the per-table salt
    // split and phase 1's per-bucket group limit. This is the regime
    // the committed oracles never reach (max bucket 143 at sf0.1), so
    // the two-phase merge's behavior under the cap is pinned here.
    val dir = "synth:8000"
    val occ = SimilarityOps.bucketOccupancy(spark, dir, 8,
      SimilarityOps.autoBits(3200)).first()
    assert(occ.getLong(2) > 256L,
      s"corpus no longer engages the cap (max bucket ${occ.getLong(2)}) — resize the test")
    val rows = SimilarityOps.knnGraph(spark, dir).collect()
    spark.catalog.clearCache()
    // shape: full anchor set, dense ranks, non-increasing scores, no
    // self-edges, at most k neighbors — the same contract as the
    // sf0.001 test, now under the cap
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    assert(rows.map(_.getAs[Long]("a_id")).distinct.length == e.length,
      "anchor set must be the full corpus")
    rows.groupBy(_.getAs[Long]("a_id")).foreach { case (a, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.length <= 4 &&
        sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
      assert(!sorted.exists(_.getAs[Long]("b_id") == a), "self-edge")
    }
    // quality: recall@4 vs the exact cosine top-4 over the whole
    // corpus — the salt split must leave each anchor enough
    // cluster-mates across tables to keep its true neighbors reachable
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = e.map { case (id, v) =>
      id -> e.filter(_._1 != id).map { case (j, w) => (j, cos(v, w)) }
        .sortBy { case (j, s) => (-s, j) }.take(4).map(_._1).toSet
    }.toMap
    val hits = rows.groupBy(_.getAs[Long]("a_id")).toSeq.map { case (a, rs) =>
      rs.flatMap(r => Option(r.getAs[java.lang.Long]("b_id")))
        .count(b => exact(a)(b.longValue)).toDouble / 4.0
    }
    val recall = hits.sum / hits.length
    assert(recall >= 0.6, f"cap-engaged kNN recall@4 too low: $recall%.3f")
  }

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

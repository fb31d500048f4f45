package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must be bit-stable run-to-run: the driver's
  * correctness gate hashes ordered output, so any nondeterminism
  * (unordered ties, RNG, partition-dependent folds) is a latent
  * correctness failure even if one run happens to match the oracle.
  * Runs the full query surface twice at sf0.001 and compares collected
  * row sequences exactly. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("all declared queries produce identical ordered output across runs") {
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      graft.plans.TextIndexCatalog.clear() // per-query plan independence
      val a = fn(spark, SparkFixture.sf0001).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      val b = fn(spark, SparkFixture.sf0001).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      if (a == b) None else Some(name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: ${flaky.mkString(", ")}")
  }

  test("every query has matching oracle SQL or is explicitly exempt") {
    // the driver records a weaker rows-only check for queries without an
    // oracle; we declare none — every query must carry its oracle
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }
}

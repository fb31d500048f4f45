package graft.tools

import org.apache.spark.sql.SparkSession

/** Catalyst rule-time census over the registered suite — the planning-
  * side companion to [[QueryJournal]] (which sees only task metrics):
  * runs every registered query once (same confs as Bench) and prints
  * `RuleExecutor.dumpTimeSpent`, the cumulative per-rule wall time of
  * the analyzer + optimizer across the sweep. The bench floor is
  * ~0.1 s/query of pure driver work; this names the rules it goes to,
  * so planning-cost optimizations (conf exclusions, plan-shape
  * simplifications) are chosen from measurement, not folklore.
  *
  * Usage: `runMain graft.tools.RuleTime [query...]` (all when empty).
  */
object RuleTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet
    // one untimed warmup then reset, so JIT/classloading noise does not
    // ride the census
    try graft.Tables.lineitem(spark, sfDir).limit(1000)
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        graft.plans.TextIndexCatalog.clear()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"[ruletime] $name failed: ${e.getMessage}") }
        spark.catalog.clearCache()
      }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"SWEEP $dt%.1f s")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}

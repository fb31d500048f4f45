package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit across the whole query suite: counts the physical
  * operators that matter for the 100 TB story — shuffle exchanges,
  * broadcast exchanges, parquet scans, sorts, whole-stage-codegen spans
  * — per query, from the executed plan string (string-level counting is
  * stable under AQE wrapping). Output is the markdown table committed
  * to BASELINE.md, the standing answer to "does this query shuffle more
  * than it should". */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // static plans: AQE wraps unexecuted plans and hides codegen spans;
      // the audit wants the planner's worst-case shape
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffles | broadcasts | scans | sorts | codegen spans |")
    println("|---|---|---|---|---|---|")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val s = PlanGate.shapeOf(plan) // shared with the regression gate
        println(s"| $name | ${s.shuffles} | ${s.broadcasts} | ${s.scans} " +
          s"| ${s.sorts} | ${s.spans} |")
      } catch {
        case e: Throwable =>
          val msg = String.valueOf(e.getMessage).replace("|", "/").take(60)
          println(s"| $name | plan failed: $msg | - | - | - | - |")
      }
      spark.catalog.clearCache()
      graft.plans.TextIndexCatalog.clear()
    }
    spark.stop()
  }
}

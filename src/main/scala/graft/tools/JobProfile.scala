package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Per-job wall-clock profile of one registered query — the drill-down
  * companion to [[QueryJournal]] (which attributes task metrics but not
  * job boundaries). Iterative operators (connected components, BFS,
  * PageRank) hide their cost structure inside a single bench number;
  * this prints one line per Spark job so the expensive round is visible.
  *
  * Usage: `runMain graft.tools.JobProfile <queryName> [sfDir]`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: JobProfile <queryName> [sfDir]"))
    val sfDir = args.lift(1).orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap.empty[Int, (Long, String)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stages = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n')}[${si.numTasks}]")
          .mkString(" | ")
        starts.put(js.jobId, (js.time, stages))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          lines.add(f"job ${je.jobId}%3d  ${(je.time - t0) / 1e3}%8.3f s  $desc")
        }
    })
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    // warm (JIT/codegen), then profile the steady-state run
    graft.plans.TextIndexCatalog.clear()
    fn(spark, sfDir).count()
    spark.catalog.clearCache()
    lines.clear()
    graft.plans.TextIndexCatalog.clear()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    // listener bus is async (private); a short sleep drains it
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"TOTAL $dt%8.3f s  rows=$n  query=$name  sf=$sfDir")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's crawl frontier (O8: BFS work-list with visited-set
  * dedup, index.py:117-142) as distributed iteration.
  *
  * Each round is one distributed job: expand the frontier through the
  * edge table, anti-join against the visited set, union. `localCheckpoint`
  * caps lineage growth per iteration (SURVEY.md §7.4 hard part (b)) — at
  * 100 TB this is the standard iterate-with-checkpoint shape (same as
  * GraphX/Pregel supersteps); depth is bounded so the loop terminates.
  */
object GraphOps {

  /** Deterministic synthetic link graph over documents: each doc links to
    * (id*7+1) % N — one edge per doc, same formula in the DuckDB oracle. */
  def linkEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val n = docs.count() // metadata-scale action: one number on the driver
    docs.select(col("doc_id").as("src"),
      ((col("doc_id") * 7 + 1) % n).as("dst"))
  }

  /** BFS from doc 0, max depth 6: minimum-depth label per reachable node.
    * The loop is driver-side control flow only; all data stays
    * distributed. Oracle: recursive CTE with min(depth). */
  def frontierBfs(spark: SparkSession, sfDir: String, maxDepth: Int = 6): DataFrame = {
    val edges = linkEdges(spark, sfDir).localCheckpoint()
    var frontier = spark.range(1).select(lit(0L).as("node"), lit(0).as("depth"))
    var visited = frontier
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"), lit(depth).as("depth"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint() // cap lineage: each round starts from materialized state
      // visited is a union of already-checkpointed frontiers — cheap
      // lineage, no second materialization per round
      visited = visited.union(next)
      frontier = next
    }
    visited.orderBy("node")
  }
}

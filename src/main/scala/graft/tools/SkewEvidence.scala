package graft.tools

import scala.collection.concurrent.TrieMap

/** Runtime-plan evidence registry (VERDICT r8 #5): operators that
  * adjudicate an AQE decision at EXECUTION time (skew-join splitting
  * is invisible in the static plan — it exists only in the final
  * adaptive plan after runtime statistics arrive) record what actually
  * fired here, keyed by query name. Bench appends these lines to
  * bench_journal.jsonl so a driver run carries the proof alongside the
  * task metrics; the spec asserts the firing directly. Same
  * session-scoped TrieMap pattern as
  * [[graft.plans.TextIndexCatalog]]. */
object SkewEvidence {
  final case class Evidence(skewSplits: Int, smjCount: Int)

  private val ev = TrieMap.empty[String, Evidence]

  /** Count skew-split sort-merge partitions in a FINAL executed-plan
    * string ("skew=true" is how AdaptiveSparkPlan renders an
    * OptimizeSkewedJoin-split SMJ side) and file it under `name`. */
  def record(name: String, executedPlan: String): Unit =
    ev.put(name, Evidence(
      "skew=true".r.findAllIn(executedPlan).length,
      "SortMergeJoin".r.findAllIn(executedPlan).length))

  def lookup(name: String): Option[Evidence] = ev.get(name)

  def clear(): Unit = ev.clear()

  /** One JSON line per recorded query, for bench_journal.jsonl. */
  def toJsonLines: String = ev.toSeq.sortBy(_._1).map { case (n, e) =>
    s"""{"query":"$n","skew_splits":${e.skewSplits},"sort_merge_joins":${e.smjCount}}"""
  }.mkString("", "\n", if (ev.isEmpty) "" else "\n")
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.2 UDAF / sketch surface): Misra–Gries
  * heavy-hitter summary (Misra & Gries, Sci. Comp. Prog. 1982; the
  * mergeable form is Agarwal et al., PODS 2012 "Mergeable Summaries" —
  * both public), the deterministic counter-based alternative to the
  * count-min sketch next to it in the sketch family ([[graft.operators
  * .TextOps.cmsTermCounts]]).
  *
  * Contract: a capacity-m counter map that provably RETAINS every item
  * whose true frequency exceeds N/(m+1) — the candidate set for an
  * exact second pass (sketch proposes, recount disposes; the estimator
  * itself is never trusted for the final answer, so the composed query
  * stays hash-gate deterministic however partitions fold).
  *
  * The partial-aggregation contract is what makes it scale: `reduce`
  * folds rows map-side into the bounded m-entry map, `merge` sums two
  * summaries and subtracts the (m+1)-th largest counter (the PODS'12
  * merge, error adds across merges but stays ≤ N/(m+1) total), so the
  * shuffle carries ≤ m counters per partition instead of the corpus
  * vocabulary. The immutable-map fold is the clarity spelling; the
  * decrement branch only fires for tail items once the map is full. */
object MisraGries {

  class Summary(cap: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(cap > 0, s"MisraGries requires cap > 0, got $cap")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1L)
        case None if b.size < cap => b.updated(w, 1L)
        // classic MG step: the new item and one unit of every counter
        // annihilate (counters hitting 0 drop out, freeing slots)
        case None => b.collect { case (k, v) if v > 1L => (k, v - 1L) }
      }

    override def merge(x: Map[String, Long],
                       y: Map[String, Long]): Map[String, Long] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val m = y.foldLeft(x) { case (acc, (k, v)) =>
          acc.updated(k, acc.getOrElse(k, 0L) + v)
        }
        if (m.size <= cap) m
        else {
          // subtract the (cap+1)-th largest counter from all and drop
          // non-positive — at most cap survive, guarantee preserved
          val kth = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(cap)
          m.collect { case (k, v) if v - kth > 0L => (k, v - kth) }
        }
      }

    /** Candidate ids only, sorted — the retained COUNTS are estimates
      * (true count minus at most N/(cap+1)) and deliberately do not
      * surface; the exact pass recounts. */
    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** Column function: candidates(127)(col("word")) — sorted candidate
    * array provably covering every item above N/(cap+1) frequency. */
  def candidates(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Summary(cap), Encoders.STRING)
}

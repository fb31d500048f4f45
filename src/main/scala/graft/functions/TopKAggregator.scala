package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.2 UDAF surface): top-k ids by score per
  * group, deterministic under ties (score desc, then id asc).
  *
  * The partial-aggregation contract is what makes this scale: `reduce`
  * folds rows into a bounded k-element buffer map-side, `merge` combines
  * buffers across partitions, so the shuffle carries k rows per
  * (partition, group) instead of the group's whole population — same
  * shape Spark plans for built-in aggregates. Output is the id list as
  * a CSV string (comparable against a DuckDB window-ranking oracle;
  * doubles never surface in the output, so no float-format drift). */
object TopKAggregator {

  final case class ScoredId(id: Long, score: Double)

  class TopK(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], String] {
    private def best(xs: Seq[ScoredId]): Seq[ScoredId] =
      xs.sortBy(x => (-x.score, x.id)).take(k)
    override def zero: Seq[ScoredId] = Seq.empty
    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      best(b :+ a)
    override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
      best(b1 ++ b2)
    override def finish(r: Seq[ScoredId]): String = r.map(_.id).mkString(",")
    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      Encoders.kryo[Seq[ScoredId]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column function: topK(3)(col(id), col(score)). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopK(k), Encoders.product[ScoredId])
}

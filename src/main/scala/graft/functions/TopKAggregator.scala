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
    require(k > 0, s"topK requires k > 0, got $k")
    // rank key: score desc, id asc — smaller key = better element
    private def key(x: ScoredId): (Double, Long) = (-x.score, x.id)
    private val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    private def best(xs: Seq[ScoredId]): Seq[ScoredId] =
      xs.sortBy(key)(ord).take(k)
    override def zero: Seq[ScoredId] = Seq.empty
    /** Map-side fold is O(k) compare + at most one element swap per row
      * (no sort, no growing allocation): append while under k, then
      * replace the current worst only when the new row beats it. The
      * buffer stays unsorted until merge/finish sorts once. */
    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      if (b.length < k) b :+ a
      else {
        var wi = 0
        var i = 1
        while (i < b.length) {
          if (ord.gt(key(b(i)), key(b(wi)))) wi = i
          i += 1
        }
        if (ord.lt(key(a), key(b(wi)))) b.updated(wi, a) else b
      }
    override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
      best(b1 ++ b2)
    override def finish(r: Seq[ScoredId]): String =
      r.sortBy(key)(ord).map(_.id).mkString(",")
    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      Encoders.kryo[Seq[ScoredId]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** [[TopK]] that keeps the (id, score) pairs in rank order instead of
    * flattening to a CSV — for consumers that explode the top-k back to
    * rows (the ANN top-k queries). Same bounded buffer, same
    * deterministic (score desc, id asc) order. */
  class TopKPairs(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private val inner = new TopK(k)
    override def zero: Seq[ScoredId] = inner.zero
    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      inner.reduce(b, a)
    override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
      inner.merge(b1, b2)
    override def finish(r: Seq[ScoredId]): Seq[ScoredId] =
      r.sortBy(x => (-x.score, x.id))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      Encoders.kryo[Seq[ScoredId]]
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Column function: topK(3)(col(id), col(score)). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopK(k), Encoders.product[ScoredId])

  /** Column function: topKPairs(10)(col(id), col(score)) — array of
    * (id, score) structs in rank order. */
  def topKPairs(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKPairs(k), Encoders.product[ScoredId])
}

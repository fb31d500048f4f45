package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{PolyHashExpr, Shingle3HashesExpr, SimHash48Expr, SortedIntersectCountExpr, WordPolyHashesExpr}

/** Engine extension point (SURVEY.md §7.4 custom work): registers the
  * native hash expressions as SQL functions so queries reach them via
  * `expr("word_poly_hashes(...)")` etc. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — every
  * entry point (Verify/Bench/EntrySmoke/tests) does. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.TokenSearchRewrite)
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHashExpr].getName, "poly_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHashExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_poly_hashes"),
      new ExpressionInfo(classOf[WordPolyHashesExpr].getName, "word_poly_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordPolyHashesExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("shingle3_hashes"),
      new ExpressionInfo(classOf[Shingle3HashesExpr].getName, "shingle3_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Shingle3HashesExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCountExpr].getName, "sorted_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCountExpr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash48"),
      new ExpressionInfo(classOf[SimHash48Expr].getName, "simhash48"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash48Expr(children.head)))
  }
}

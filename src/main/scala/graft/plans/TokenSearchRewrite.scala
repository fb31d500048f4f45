package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (SURVEY.md §4 "custom Rule[LogicalPlan]" seam): the
  * whole-token search predicate the article pipeline plans —
  *
  *   array_contains(split(text, ' ', -1), 'kw')        (O18, api.py:26)
  *
  * — materializes the full token array per row just to probe one
  * membership. This rule rewrites it into a single-pass substring probe
  *
  *   locate(' kw ', concat(' ', text, ' ')) > 0
  *
  * which is equivalent for a non-empty space-free literal keyword
  * (tokens are the maximal space-free runs, so ' kw ' occurs in the
  * space-padded text iff kw is a whole token — including at either
  * end; consecutive spaces only introduce empty tokens, which the
  * non-empty guard excludes). No allocation, no per-token comparison,
  * and the scan stays inside whole-stage codegen. At 100 TB this is
  * the difference between a search that allocates a token array per
  * document and one that memcmp-scans the page.
  *
  * Registered via GraftExtensions.injectOptimizerRule; fires wherever
  * the pattern appears (filters, projections), keyword-search results
  * verified unchanged by the oracle gate and a rule-level spec. */
object TokenSearchRewrite extends Rule[LogicalPlan] {

  private val Space = UTF8String.fromString(" ")

  private def plainToken(kw: UTF8String): Boolean =
    kw != null && kw.numChars() > 0 && !kw.toString.contains(' ')

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // limit must be the unlimited default (-1): a bounded split keeps
      // separators inside the last element, which the substring probe
      // would wrongly match
      case ArrayContains(
            StringSplit(text, Literal(sep: UTF8String, StringType),
              Literal(-1, _)),
            Literal(kw: UTF8String, StringType))
          if sep == Space && plainToken(kw) =>
        val padded = Concat(Seq(
          Literal(Space, StringType), text, Literal(Space, StringType)))
        val needle = Literal(
          UTF8String.fromString(" " + kw.toString + " "), StringType)
        GreaterThan(new StringLocate(needle, padded), Literal(0))
    }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.PlanGate
import graft.tools.PlanGate.Shape

/** Pins the plan-audit regression gate: the comparator must go RED on
  * an injected shuffle/scan growth (the "unpersisted a shared frame" /
  * "dropped a broadcast hint" regression), stay green on improvement
  * drift, and flag unaudited queries — all as pure-function checks so
  * the spec never builds 260+ plans. The end-to-end run is the
  * driver-facing `runMain graft.tools.PlanGate` against the committed
  * tools/plan_audit.tsv. */
class PlanGateSpec extends AnyFunSuite {

  private val base = Map(
    "q_join" -> Shape(shuffles = 2, broadcasts = 1, scans = 2, sorts = 0, spans = 3),
    "q_agg"  -> Shape(shuffles = 1, broadcasts = 0, scans = 1, sorts = 1, spans = 2))

  test("injected shuffle growth is a hard violation") {
    val cur = base.updated("q_join", base("q_join").copy(shuffles = 3))
    val (hard, _) = PlanGate.violations(base, cur)
    assert(hard.exists(_.contains("q_join: shuffles grew 2 -> 3")), hard)
  }

  test("injected scan growth (lost a shared persist) is a hard violation") {
    val cur = base.updated("q_agg", base("q_agg").copy(scans = 2))
    val (hard, _) = PlanGate.violations(base, cur)
    assert(hard.exists(_.contains("q_agg: scans grew 1 -> 2")), hard)
  }

  test("a query missing from the committed audit is a hard violation") {
    val cur = base + ("q_new" -> Shape(1, 0, 1, 0, 1))
    val (hard, _) = PlanGate.violations(base, cur)
    assert(hard.exists(_.startsWith("q_new:")), hard)
  }

  test("improvements and broadcast/sort/span drift only warn") {
    val cur = Map(
      "q_join" -> base("q_join").copy(shuffles = 1),          // improvement
      "q_agg"  -> base("q_agg").copy(broadcasts = 1, sorts = 0)) // benign drift
    val (hard, soft) = PlanGate.violations(base, cur)
    assert(hard.isEmpty, hard)
    assert(soft.exists(_.startsWith("q_join: shape drift")), soft)
    assert(soft.exists(_.startsWith("q_agg: shape drift")), soft)
  }

  test("identical shapes are silent; a stale audit row is a hard count mismatch") {
    val (hard0, soft0) = PlanGate.violations(base, base)
    assert(hard0.isEmpty && soft0.isEmpty)
    // a query removed from the registry with its audit row left behind
    // used to only warn — between a registry edit and the next --write
    // the gate would pass while auditing a query that no longer exists;
    // the row-count diff makes that window hard
    val (hard1, soft1) = PlanGate.violations(base, base - "q_agg")
    assert(hard1.exists(_.contains("audit row count 2 != registered query count 1")), hard1)
    assert(soft1.exists(_.contains("q_agg: in committed audit but no longer")), soft1)
  }

  test("audit/registry count mismatch is hard in both directions, not fooled by failures") {
    // unaudited new query: caught per-name AND by the count diff
    val cur = base + ("q_new" -> Shape(1, 0, 1, 0, 1))
    val (hard, _) = PlanGate.violations(base, cur)
    assert(hard.exists(_.contains("audit row count 2 != registered query count 3")), hard)
    // a failed-to-plan query still counts as REGISTERED: no count
    // mismatch on top of the (already hard) failure itself
    val (hard2, _) = PlanGate.violations(base, base - "q_agg",
      failedToPlan = Map("q_agg" -> "boom"))
    assert(!hard2.exists(_.contains("audit row count")), hard2)
  }

  test("a registered query whose plan threw is a hard violation, not a removal warning") {
    // q_agg is still registered but failed to plan: it is absent from
    // `current` yet must NOT surface as the soft "no longer registered"
    // warning — that soft path would let the gate exit 0 on a hard break
    val (hard, soft) = PlanGate.violations(base, base - "q_agg",
      failedToPlan = Map("q_agg" -> "AnalysisException: boom"))
    assert(hard.exists(_.contains("q_agg: registered but failed to plan")), hard)
    assert(!soft.exists(_.contains("q_agg")), soft)
  }

  test("truncated or non-numeric audit lines fail with the line number") {
    val truncated = Seq("# header", "q_join\t1\t2", s"q_agg\t${base("q_agg").tsv}")
    val e1 = intercept[IllegalArgumentException] {
      PlanGate.parseTsv(truncated.iterator)
    }
    assert(e1.getMessage.contains("line 2") && e1.getMessage.contains("q_join"), e1.getMessage)
    val nonNumeric = Seq(s"q_join\t${base("q_join").tsv}", "q_agg\t1\tx\t1\t1\t1")
    val e2 = intercept[IllegalArgumentException] {
      PlanGate.parseTsv(nonNumeric.iterator)
    }
    assert(e2.getMessage.contains("line 2") && e2.getMessage.contains("non-numeric"), e2.getMessage)
  }

  test("tsv round-trip: parse(write(x)) == x, comments and blanks skipped") {
    val body = Seq("# query\tshuffles\tbroadcasts\tscans\tsorts\tspans", "",
      s"q_join\t${base("q_join").tsv}", s"q_agg\t${base("q_agg").tsv}")
    assert(PlanGate.parseTsv(body.iterator) == base)
  }

  test("shapeOf counts exchanges, scans, sorts, and distinct codegen spans") {
    val plan =
      """*(3) HashAggregate
        |+- Exchange hashpartitioning(k, 8)
        |   +- *(2) HashAggregate
        |      +- *(2) BroadcastHashJoin
        |         :- BroadcastExchange HashedRelationBroadcastMode
        |         :  +- *(1) Scan parquet [a]
        |         +- Sort [k ASC]
        |            +- Exchange rangepartitioning(k, 8)
        |               +- Scan parquet [b]""".stripMargin
    val s = PlanGate.shapeOf(plan)
    assert(s == Shape(shuffles = 2, broadcasts = 1, scans = 2, sorts = 1, spans = 3))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the division-by-zero contract the suite's zero-guards are
  * built on. Spark 4 runs ANSI mode by default, so a bare integer
  * `DIV 0` THROWS — it does NOT return NULL the way DuckDB's `// 0`
  * does. Every operator whose denominator can be zero must therefore
  * guard with conditional EVALUATION (a CaseWhen whose branch only
  * evaluates when the divisor is positive — gopherRules' ratio rules)
  * or keep the division out of the frame entirely (markovAttribution
  * builds its share expression only when the total is non-zero). */
class AnsiProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("ANSI is on: bare DIV 0 throws, the when-guard yields NULL like DuckDB") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val thrown = intercept[Exception] {
      spark.sql("SELECT 7 DIV 0").collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"))
    // the sanctioned guard: CaseWhen evaluates the division ONLY on
    // rows where the divisor is positive; elsewhere the rule reads
    // NULL — exactly DuckDB's `x // 0` result on the oracle side
    import spark.implicits._
    val r = Seq((10L, 2L), (10L, 0L)).toDF("x", "d")
      .select(when(col("d") > 0L, expr("x DIV d")).as("q"))
      .as[Option[Long]].collect()
    assert(r.toSeq == Seq(Some(5L), None))
  }

  test("sequenceMatch: empty events yield NULL share_bp, not DIVIDE_BY_ZERO") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.EventOps.sequenceMatchOn(empty).collect()
    assert(got.length == 5) // one row per declared pattern
    got.foreach { r =>
      assert(r.getAs[Long]("n_users") == 0L)
      assert(r.getAs[Long]("n_matched") == 0L)
      assert(r.isNullAt(r.fieldIndex("share_bp")))
    }
  }

  test("holtLinear: 0- and 1-day series yield the oracle's empty frame, not throw") {
    import spark.implicits._
    val e0 = Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "ts")
    val g0 = graft.operators.EventOps.holtLinearOn(e0)
    assert(g0.columns.toSeq ==
      Seq("day", "y", "level_milli", "trend_milli", "forecast_milli"))
    assert(g0.count() == 0)
    val e1 = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    assert(graft.operators.EventOps.holtLinearOn(e1).count() == 0)
  }

  test("lshQuality: no banded candidates / no true pairs yield NULL rates") {
    import spark.implicits._
    val tiny = Seq((1L, "web", "alpha beta gamma delta"))
      .toDF("doc_id", "source", "text")
    val got = graft.operators.DedupOps.lshQualityOn(tiny).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_candidates") == 0L)
    assert(r.getAs[Long]("n_true") == 0L)
    assert(r.isNullAt(r.fieldIndex("precision_bp")))
    assert(r.isNullAt(r.fieldIndex("recall_bp")))
    spark.catalog.clearCache() // release lshQuality's persisted stages
  }
}

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
}

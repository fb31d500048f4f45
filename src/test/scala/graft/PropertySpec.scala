package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ArticleOps, TextOps}

/** Property tests (SURVEY.md §5: upgrade the reference's randomized
  * payload tests to real invariants). Uses scalacheck directly —
  * Prop.forAll checked inline, no scalatest bridge needed. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val htmlish: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr, Gen.const("<b>"), Gen.const("</p>"),
    Gen.const("<img src=\"x\">"), Gen.const("plain text")))
    .map(_.mkString(" "))

  test("tag-strip leaves no tags and is idempotent") {
    holds(Prop.forAll(htmlish) { s =>
      val once = s.replaceAll(ArticleOps.TagRe, "")
      val twice = once.replaceAll(ArticleOps.TagRe, "")
      !once.matches(".*<[^>]*>.*") && once == twice
    })
  }

  test("Spark polyHash agrees with an independent JVM model on random ASCII") {
    import spark.implicits._
    def model(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % TextOps.HashMod)
    val samples = Gen.listOfN(40, Gen.asciiPrintableStr).sample.get
      .filter(_.nonEmpty)
    val got = samples.toDF("s")
      .select(col("s"), TextOps.polyHash(col("s")))
      .as[(String, Long)].collect().toMap
    samples.foreach(s => assert(got(s) == model(s), s"mismatch for ${s.take(30)}"))
  }

  test("dedup keys: distinct md5 implies distinct text (md5 injective on corpus)") {
    import spark.implicits._
    val texts = Gen.listOfN(60, Gen.alphaStr).sample.get.distinct
    val n = texts.toDF("text")
      .select(md5(col("text").cast("binary")).as("h"))
      .distinct().count()
    assert(n == texts.length)
  }
}

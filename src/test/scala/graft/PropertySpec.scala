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

  test("positional postings invariants: positions sorted, len == tf, and re-derivable from the tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "merge group merge  the merge"),
      (2L, ""),
      (3L, "a a a a"),
      (4L, "Group MERGE group")).toDF("doc_id", "text")
    val post = graft.plans.TextIndexCatalog.postingsOf(docs).collect()
    assert(post.nonEmpty)
    post.foreach { r =>
      val tf = r.getAs[Long]("tf")
      val ps = r.getAs[scala.collection.Seq[Int]]("positions")
      assert(ps.length == tf.toInt, s"len(positions) != tf in $r")
      assert(ps == ps.sorted, s"positions unsorted in $r")
    }
    // positions index into the empty-filtered lower-cased token stream
    val m = post.map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
      r.getAs[scala.collection.Seq[Int]]("positions")).toMap
    assert(m(("merge", 1L)) == Seq(0, 2, 4)) // double space dropped
    assert(m(("a", 3L)) == Seq(0, 1, 2, 3))
    assert(m(("group", 4L)) == Seq(0, 2) && m(("merge", 4L)) == Seq(1))
  }

  test("tag-strip leaves no tags and is idempotent") {
    holds(Prop.forAll(htmlish) { s =>
      val once = s.replaceAll(ArticleOps.TagRe, "")
      val twice = once.replaceAll(ArticleOps.TagRe, "")
      !once.matches(".*<[^>]*>.*") && once == twice
    })
  }

  test("prefix-filter lemma: df-ordered prefixes catch every pair with jaccard >= 0.5") {
    // the pure-set form of the pigeonhole argument dd_ngram_jaccard
    // relies on: for any two sets with jaccard >= t, the (n - ceil(t*n)
    // + 1)-prefixes under ANY shared total order must intersect. Checked
    // here against random set families with the same global order the
    // query uses (document frequency asc, value asc).
    val setGen = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 40L)).map(_.toSet))
    holds(Prop.forAll(Gen.listOfN(6, setGen)) { fam =>
      val df = fam.flatten.groupBy(identity).map { case (v, xs) => v -> xs.size }
      def prefix(s: Set[Long]): Set[Long] = {
        val n = s.size
        s.toSeq.sortBy(v => (df(v), v)).take(n / 2 + 1).toSet
      }
      def jaccard(a: Set[Long], b: Set[Long]): Double =
        a.intersect(b).size.toDouble / a.union(b).size
      fam.combinations(2).forall { case Seq(a, b) =>
        jaccard(a, b) < 0.5 || prefix(a).intersect(prefix(b)).nonEmpty
      }
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

  test("native hash expressions agree with the HOF forms and a JVM model") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "),
      Gen.const("中文"), Gen.const("mot clé"))).map(_.mkString(" "))
    val samples = Gen.listOfN(60, gen).sample.get.filter(_.nonEmpty)
    def wordModel(s: String): Seq[Long] =
      s.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
        .map(_.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % TextOps.HashMod))
    val rows = samples.toDF("text")
      .select(col("text"),
        expr("poly_hash(text)"),
        expr("word_poly_hashes(lower(text))"),
        expr("shingle3_hashes(word_poly_hashes(lower(text)))"),
        TextOps.polyHash(col("text")))
      .as[(String, Long, Seq[Long], Seq[Long], Long)].collect()
    rows.foreach { case (s, ph, whs, sh3, phHof) =>
      assert(ph == phHof, s"poly_hash vs HOF for ${s.take(30)}")
      assert(whs == wordModel(s), s"word_poly_hashes vs model for ${s.take(30)}")
      val m = TextOps.HashMod
      val expSh = whs.sliding(3).filter(_.size == 3)
        .map(t => ((t(0) * 31 + t(1)) % m * 31 + t(2)) % m).toSeq
      assert(sh3 == expSh, s"shingle3 vs model for ${s.take(30)}")
    }
  }

  test("shinglek_hashes matches the seeded-fold model for random arrays and k") {
    import spark.implicits._
    val m = TextOps.HashMod
    def model(ws: Seq[Long], k: Int): Seq[Long] =
      if (ws.length < k) Seq.empty
      else ws.sliding(k).filter(_.size == k)
        .map(_.reduce((a, b) => (a * 31 + b) % m)).toSeq
    val arrGen = Gen.listOfN(12, Gen.choose(0L, m - 1))
    val samples = Gen.listOfN(25, arrGen).sample.get
    (1 to 10).foreach { k =>
      val rows = samples.map(Tuple1(_)).toDF("ws")
        .select(col("ws"), expr(s"shinglek_hashes(ws, $k)"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.foreach { case (ws, got) =>
        assert(got == model(ws, k), s"k=$k on ${ws.take(4)}...")
      }
    }
    // k=3 coincides with the dedicated trigram expression
    val eq = samples.map(Tuple1(_)).toDF("ws")
      .select((expr("shinglek_hashes(ws, 3)") === expr("shingle3_hashes(ws)"))
        .as("same"))
      .as[Boolean].collect()
    assert(eq.forall(identity))
  }

  test("simhash48 expression matches a bit-counting JVM model") {
    import spark.implicits._
    val docs = Seq("alpha beta gamma delta", "one", "", "x y z x y z")
    val got = docs.toDF("text")
      .select(expr("simhash48(word_poly_hashes(lower(text)))"))
      .as[Long].collect().toSeq
    def model(s: String): Long = {
      val whs = s.toLowerCase.split(" ").filter(_.nonEmpty)
        .map(_.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % TextOps.HashMod))
      (0 until 48).foldLeft(0L) { (acc, j) =>
        val cnt = whs.count(h => ((h >>> j) & 1L) == 1L)
        if (2 * cnt >= whs.length) acc | (1L << j) else acc
      }
    }
    assert(got == docs.map(model))
  }

  test("dot_double is bitwise-equal to the sequential HOF fold") {
    import spark.implicits._
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0))
    val pairs = Gen.listOfN(30, Gen.zip(vecGen, vecGen)).sample.get
    val rows = pairs.toDF("a", "b")
      .select(
        expr("dot_double(a, b)"),
        graft.operators.SimilarityOps.dotdHof(col("a"), col("b")))
      .as[(Double, Double)].collect()
    rows.foreach { case (got, exp) =>
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(exp))
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on random sets") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.distinct.sorted)
    val pairs = Gen.listOfN(50, Gen.zip(gen, gen)).sample.get
    val rows = pairs.toDF("a", "b")
      .select(
        expr("sorted_intersect_count(a, b)"),
        size(array_intersect(col("a"), col("b"))))
      .as[(Int, Int)].collect()
    rows.foreach { case (got, exp) => assert(got == exp) }
  }

  test("qlog2: monotone, exact at powers of two, within 1.5 sixteenths of true 16*log2") {
    import spark.implicits._
    val xs = (Gen.listOfN(300, Gen.chooseNum(1L, 1L << 50)).sample.get ++
      (0 to 50).map(1L << _) ++ Seq(1L, 2L, 3L, 5L, 7L, 1023L, 1025L)).distinct
    val got = xs.toDF("x")
      .select(col("x"), graft.operators.TextOps.qlog2(col("x")).as("q"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (x, q) =>
      val t = 16.0 * math.log(x.toDouble) / math.log(2.0)
      // log2 is concave, so the mantissa chord UNDERSHOOTS between
      // powers of two by at most 0.0861 bits; the floor division can
      // drop one more sixteenth: t - 2.5 <= q <= t
      assert(q >= t - 2.5 && q <= t + 1e-6,
        s"qlog2($x)=$q vs true $t")
      if ((x & (x - 1)) == 0) // power of two: exact
        assert(q == 16L * java.lang.Long.numberOfTrailingZeros(x))
    }
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
      "qlog2 must be monotone non-decreasing")
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

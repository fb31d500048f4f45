package graft.functions

/** DuckDB-SQL rendering of the Porter stemmer ([[PorterStemmer]]) — the
  * oracle side of the Porter-stemmed search (VERDICT r7 #8: "a DuckDB
  * macro implementing the same algorithm would make the Porter path
  * oracle-gated").
  *
  * The algorithm's every condition (measure m, *v*, *d, *o) is a
  * function of Porter's consonant/vowel classification, and that
  * classification at position i depends only on characters 0..i — so
  * the CV pattern of any PREFIX of w is a prefix of the CV pattern of
  * w. Each step therefore computes ONE scan per token (a `list_reduce`
  * over the characters producing a 'C'/'V' string) and evaluates all
  * its suffix conditions as slices of it:
  *
  *   m(prefix of length L)  = len(regexp_extract_all(substr(cv,1,L), 'V+C+'))
  *   contains-vowel(prefix) = contains(substr(cv,1,L), 'V')
  *   *d / *o                = char tests on w + slice tests on cv
  *
  * Steps 1a..5b are chained CTEs over the exploded token table; the
  * query keyword rides the same pipeline as sentinel doc_id -1, so the
  * oracle stems both sides with the same SQL — exactly the engine's
  * contract (document tokens and the query keyword go through the SAME
  * stem function). Step tables are rendered from the same Seqs the JVM
  * stemmer uses, in the same first-match order, so the two renderings
  * cannot drift independently.
  *
  * Validated token-for-token against the JVM stemmer over the sf0.01
  * corpus (27k tokens) plus an adversarial vocabulary (classic Porter
  * pairs, `syzygy`, `don't`, digits) before registration; the standing
  * gate is the driver's hash compare on `art_search_porter`.
  */
object PorterSql {

  /** One CV-classification scan over the characters of column `w`. */
  private val cv: String =
    "list_reduce(list_prepend('', string_split(w, '')), (acc, ch) -> acc || " +
      "CASE WHEN ch IN ('a','e','i','o','u') THEN 'V' " +
      "WHEN ch = 'y' THEN CASE WHEN acc = '' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END " +
      "ELSE 'C' END)"

  /** Porter measure of the cv-slice expression. */
  private def mOf(cvSlice: String): String =
    s"len(regexp_extract_all($cvSlice, 'V+C+'))"

  /** cv prefix of w after dropping the last n characters. */
  private def pre(n: Int): String = s"substr(c, 1, length(w) - $n)"

  /** CASE chain returning the FIRST-matching suffix in table order (the
    * JVM stemmer's `find` semantics), else NULL. */
  private def caseSuffix(sufs: Seq[String]): String =
    sufs.map(s => s"WHEN ends_with(w, '$s') THEN '$s'")
      .mkString("CASE ", " ", " ELSE NULL END")

  private def caseRep(table: Seq[(String, String)]): String =
    table.map { case (s, r) => s"WHEN ends_with(w, '$s') THEN '$r'" }
      .mkString("CASE ", " ", " ELSE NULL END")

  /** Full search oracle: documents containing a token whose Porter stem
    * equals the Porter stem of `keyword` (must be lowercase, quote-free). */
  def searchOracle(keyword: String): String = {
    require(keyword == keyword.toLowerCase && !keyword.contains("'"),
      s"keyword must be lowercase and quote-free: $keyword")
    val s2suf = caseSuffix(PorterStemmer.step2.map(_._1))
    val s2rep = caseRep(PorterStemmer.step2)
    val s3suf = caseSuffix(PorterStemmer.step3.map(_._1))
    val s3rep = caseRep(PorterStemmer.step3)
    val s4suf = caseSuffix(PorterStemmer.step4)
    val mStem = mOf("substr(c, 1, length(w) - length(suf))")
    s"""WITH tok AS (
       |  SELECT doc_id, orig FROM (
       |    SELECT doc_id,
       |      unnest(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS orig
       |    FROM documents)
       |  UNION ALL SELECT -1, '$keyword'),
       |s1a AS (SELECT doc_id, orig,
       |  CASE WHEN ends_with(w, 'sses') THEN substr(w, 1, length(w) - 2)
       |       WHEN ends_with(w, 'ies') THEN substr(w, 1, length(w) - 2)
       |       WHEN NOT ends_with(w, 'ss') AND ends_with(w, 's') THEN substr(w, 1, length(w) - 1)
       |       ELSE w END AS w
       |  FROM (SELECT doc_id, orig, orig AS w FROM tok)),
       |s1bq AS (SELECT doc_id, orig, w, c,
       |  CASE WHEN ends_with(w, 'eed') THEN NULL
       |       WHEN ends_with(w, 'ed') AND contains(${pre(2)}, 'V') THEN substr(w, 1, length(w) - 2)
       |       WHEN ends_with(w, 'ing') AND contains(${pre(3)}, 'V') THEN substr(w, 1, length(w) - 3)
       |       ELSE NULL END AS t,
       |  CASE WHEN ends_with(w, 'eed') AND ${mOf(pre(3))} > 0
       |       THEN substr(w, 1, length(w) - 1) ELSE w END AS w_eed
       |  FROM (SELECT doc_id, orig, w, $cv AS c FROM s1a)),
       |s1b AS (SELECT doc_id, orig,
       |  CASE WHEN t IS NULL THEN w_eed
       |       WHEN ends_with(t, 'at') OR ends_with(t, 'bl') OR ends_with(t, 'iz') THEN t || 'e'
       |       WHEN length(t) >= 2 AND substr(t, length(t), 1) = substr(t, length(t) - 1, 1)
       |            AND right(substr(c, 1, length(t)), 1) = 'C'
       |            AND substr(t, length(t), 1) NOT IN ('l','s','z')
       |       THEN substr(t, 1, length(t) - 1)
       |       WHEN ${mOf("substr(c, 1, length(t))")} = 1
       |            AND length(t) >= 3 AND right(substr(c, 1, length(t)), 3) = 'CVC'
       |            AND substr(t, length(t), 1) NOT IN ('w','x','y')
       |       THEN t || 'e'
       |       ELSE t END AS w
       |  FROM s1bq),
       |s1c AS (SELECT doc_id, orig,
       |  CASE WHEN ends_with(w, 'y') AND contains(${pre(1)}, 'V')
       |       THEN substr(w, 1, length(w) - 1) || 'i' ELSE w END AS w
       |  FROM (SELECT doc_id, orig, w, $cv AS c FROM s1b)),
       |s2 AS (SELECT doc_id, orig,
       |  CASE WHEN suf IS NULL THEN w
       |       WHEN $mStem > 0
       |       THEN substr(w, 1, length(w) - length(suf)) || rep
       |       ELSE w END AS w
       |  FROM (SELECT doc_id, orig, w, $cv AS c, $s2suf AS suf, $s2rep AS rep FROM s1c)),
       |s3 AS (SELECT doc_id, orig,
       |  CASE WHEN suf IS NULL THEN w
       |       WHEN $mStem > 0
       |       THEN substr(w, 1, length(w) - length(suf)) || rep
       |       ELSE w END AS w
       |  FROM (SELECT doc_id, orig, w, $cv AS c, $s3suf AS suf, $s3rep AS rep FROM s2)),
       |s4 AS (SELECT doc_id, orig,
       |  CASE WHEN suf IS NULL THEN w
       |       WHEN $mStem > 1
       |            AND (suf <> 'ion' OR (length(w) - length(suf) >= 1
       |                 AND substr(w, length(w) - length(suf), 1) IN ('s','t')))
       |       THEN substr(w, 1, length(w) - length(suf))
       |       ELSE w END AS w
       |  FROM (SELECT doc_id, orig, w, $cv AS c, $s4suf AS suf FROM s3)),
       |s5a AS (SELECT doc_id, orig,
       |  CASE WHEN NOT ends_with(w, 'e') THEN w
       |       WHEN ${mOf(pre(1))} > 1 THEN substr(w, 1, length(w) - 1)
       |       WHEN ${mOf(pre(1))} = 1 AND NOT (
       |            length(w) - 1 >= 3 AND right(${pre(1)}, 3) = 'CVC'
       |            AND substr(w, length(w) - 1, 1) NOT IN ('w','x','y'))
       |       THEN substr(w, 1, length(w) - 1)
       |       ELSE w END AS w
       |  FROM (SELECT doc_id, orig, w, $cv AS c FROM s4)),
       |s5b AS (SELECT doc_id, orig,
       |  CASE WHEN ends_with(w, 'll') AND ${mOf("c")} > 1 THEN substr(w, 1, length(w) - 1)
       |       ELSE w END AS w
       |  FROM (SELECT doc_id, orig, w, $cv AS c FROM s5a)),
       |stem AS (SELECT doc_id, CASE WHEN length(orig) <= 2 THEN orig ELSE w END AS w FROM s5b),
       |kw AS (SELECT DISTINCT w FROM stem WHERE doc_id = -1),
       |hit AS (SELECT DISTINCT s.doc_id FROM stem s JOIN kw ON s.w = kw.w WHERE s.doc_id >= 0)
       |SELECT d.doc_id, d.lang, d.source FROM documents d JOIN hit USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}

package graft.functions

/** DuckDB-SQL rendering of the Snowball English ("Porter2") stemmer
  * ([[SnowballStemmer]]) — the oracle side of the Snowball-stemmed
  * search, closing the LAST stemming-fidelity gap with a hash gate:
  * DuckDB's own `stem()` needs the fts extension (absent offline), so
  * the oracle renders the published algorithm itself, from the same
  * step tables the JVM stemmer executes.
  *
  * Unlike Porter's context-dependent consonant classification
  * ([[PorterSql]]'s CV-scan), Snowball's vowel class is fixed
  * (aeiouy, with the prelude rewriting consonant-y to 'Y'), and its
  * R1/R2 regions are POSITIONS computed once after the prelude —
  * every later step edits only the word's tail, so region membership
  * is an integer compare carried as columns (`p1`, `p2`) through the
  * stage CTEs:
  *
  *   prelude : one list_reduce marking y→Y off the already-marked
  *             previous character
  *   R1/R2   : '^[^aeiouy]*[aeiouy]+[^aeiouy]' anchored matches
  *             (gener/commun/arsen overrides as CASE)
  *   steps   : 0, 1a (+invariant list), 1b, 1c, 2, 3, 4, 5 as chained
  *             CTEs; whole-word exceptions and the ≤2-length guard ride
  *             a `fin` column that freezes the row
  *   postlude: replace(w, 'Y', 'y')
  *
  * The keyword rides the pipeline as sentinel doc_id -1 — the oracle
  * stems both sides with the same SQL, the engine's own contract.
  * Validated token-for-token against the JVM stemmer's Python
  * transliteration over the sf0.01 corpus (27k tokens), the spec's 70
  * hand-derived vocabulary vectors, and an adversarial set
  * (exception-list words, apostrophe forms, gener/commun/arsen,
  * short-syllable and double-letter fixups); the standing gate is the
  * driver's hash compare on `art_search_snowball`.
  */
object SnowballSql {

  private val V = "('a','e','i','o','u','y')"

  private def sq(s: String): String = s.replace("'", "''")

  private def caseSuffix(sufs: Seq[String]): String =
    sufs.map(s => s"WHEN ends_with(w, '${sq(s)}') THEN '${sq(s)}'")
      .mkString("CASE ", " ", " ELSE NULL END")

  private def caseRep(table: Seq[(String, String)]): String =
    table.map { case (s, r) => s"WHEN ends_with(w, '${sq(s)}') THEN '${sq(r)}'" }
      .mkString("CASE ", " ", " ELSE NULL END")

  private def exc1Case: String =
    SnowballStemmer.exceptions1.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN s = '$k' THEN '$v'" }
      .mkString("CASE ", " ", " ELSE NULL END")

  private def exc2In: String =
    SnowballStemmer.exceptions2.toSeq.sorted.map(x => s"'$x'").mkString("(", ",", ")")

  /** ends_short_syllable(word-expr, length-expr) as SQL. */
  private def ess(w: String, l: String): String =
    s"(CASE WHEN $l = 2 THEN substr($w,1,1) IN $V AND substr($w,2,1) NOT IN $V " +
      s"WHEN $l >= 3 THEN substr($w,$l-2,1) NOT IN $V " +
      s"AND substr($w,$l-1,1) IN $V " +
      s"AND substr($w,$l,1) NOT IN $V " +
      s"AND substr($w,$l,1) NOT IN ('w','x','Y') " +
      "ELSE FALSE END)"

  /** Full search oracle: documents containing a token whose Snowball
    * stem equals the Snowball stem of `keyword` (lowercase, quote-free). */
  def searchOracle(keyword: String): String = {
    require(keyword == keyword.toLowerCase && !keyword.contains("'"),
      s"keyword must be lowercase and quote-free: $keyword")
    val s2suf = caseSuffix(SnowballStemmer.step2.map(_._1))
    val s2rep = caseRep(SnowballStemmer.step2)
    val s3suf = caseSuffix(SnowballStemmer.step3.map(_._1))
    val s3rep = caseRep(SnowballStemmer.step3)
    val s4suf = caseSuffix(SnowballStemmer.step4)
    s"""WITH tok AS (
       |  SELECT doc_id, orig FROM (
       |    SELECT doc_id,
       |      unnest(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS orig
       |    FROM documents)
       |  UNION ALL SELECT -1, '$keyword'),
       |p0 AS (SELECT doc_id, orig,
       |  CASE WHEN starts_with(orig, '''') THEN substr(orig, 2) ELSE orig END AS s
       |  FROM tok),
       |pfin AS (SELECT doc_id, orig, s,
       |  CASE WHEN length(s) <= 2 THEN s ELSE $exc1Case END AS fin
       |  FROM p0),
       |pre AS (SELECT doc_id, orig, s, fin,
       |  list_reduce(list_prepend('', string_split(s, '')), (acc, ch) -> acc ||
       |    CASE WHEN ch = 'y' AND (acc = '' OR right(acc, 1) IN $V) THEN 'Y' ELSE ch END) AS w
       |  FROM pfin),
       |reg AS (SELECT doc_id, orig, fin, w,
       |  CASE WHEN starts_with(s, 'gener') OR starts_with(s, 'arsen') THEN 5
       |       WHEN starts_with(s, 'commun') THEN 6
       |       ELSE CASE WHEN m1 = '' THEN length(w) ELSE length(m1) END END AS p1
       |  FROM (SELECT *, regexp_extract(w, '^[^aeiouy]*[aeiouy]+[^aeiouy]') AS m1 FROM pre) z),
       |reg2 AS (SELECT doc_id, orig, fin, w, p1,
       |  CASE WHEN m2 = '' THEN length(w) ELSE p1 + length(m2) END AS p2
       |  FROM (SELECT *, regexp_extract(substr(w, p1 + 1), '^[^aeiouy]*[aeiouy]+[^aeiouy]') AS m2 FROM reg) z),
       |s0 AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN fin IS NOT NULL THEN w
       |       WHEN ends_with(w, '''s''') THEN substr(w, 1, length(w) - 3)
       |       WHEN ends_with(w, '''s') THEN substr(w, 1, length(w) - 2)
       |       WHEN ends_with(w, '''') THEN substr(w, 1, length(w) - 1)
       |       ELSE w END AS w
       |  FROM reg2),
       |s1a AS (SELECT doc_id, orig, p1, p2,
       |  CASE WHEN fin IS NOT NULL THEN fin
       |       WHEN w2 IN $exc2In THEN w2 ELSE NULL END AS fin,
       |  w2 AS w
       |  FROM (SELECT *,
       |    CASE WHEN fin IS NOT NULL THEN w
       |         WHEN ends_with(w, 'sses') THEN substr(w, 1, length(w) - 2)
       |         WHEN ends_with(w, 'ied') OR ends_with(w, 'ies') THEN
       |           CASE WHEN length(w) > 4 THEN substr(w, 1, length(w) - 2)
       |                ELSE substr(w, 1, length(w) - 1) END
       |         WHEN ends_with(w, 'us') OR ends_with(w, 'ss') THEN w
       |         WHEN ends_with(w, 's') AND regexp_matches(substr(w, 1, length(w) - 2), '[aeiouy]')
       |           THEN substr(w, 1, length(w) - 1)
       |         ELSE w END AS w2
       |    FROM s0) z),
       |s1bq AS (SELECT doc_id, orig, fin, p1, p2, w,
       |  CASE WHEN fin IS NOT NULL THEN NULL
       |       WHEN ends_with(w, 'eedly') OR ends_with(w, 'eed') THEN NULL
       |       WHEN ends_with(w, 'ingly') AND regexp_matches(substr(w, 1, length(w) - 5), '[aeiouy]') THEN substr(w, 1, length(w) - 5)
       |       WHEN ends_with(w, 'edly') AND regexp_matches(substr(w, 1, length(w) - 4), '[aeiouy]') THEN substr(w, 1, length(w) - 4)
       |       WHEN ends_with(w, 'ing') AND regexp_matches(substr(w, 1, length(w) - 3), '[aeiouy]') THEN substr(w, 1, length(w) - 3)
       |       WHEN ends_with(w, 'ed') AND regexp_matches(substr(w, 1, length(w) - 2), '[aeiouy]') THEN substr(w, 1, length(w) - 2)
       |       ELSE NULL END AS t,
       |  CASE WHEN fin IS NOT NULL THEN w
       |       WHEN ends_with(w, 'eedly') AND length(w) - 5 >= p1 THEN substr(w, 1, length(w) - 3)
       |       WHEN ends_with(w, 'eedly') THEN w
       |       WHEN ends_with(w, 'eed') AND length(w) - 3 >= p1 THEN substr(w, 1, length(w) - 1)
       |       ELSE w END AS w_eed
       |  FROM s1a),
       |s1b AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN t IS NULL THEN w_eed
       |       WHEN ends_with(t, 'at') OR ends_with(t, 'bl') OR ends_with(t, 'iz') THEN t || 'e'
       |       WHEN length(t) >= 2 AND substr(t, length(t), 1) = substr(t, length(t) - 1, 1)
       |            AND substr(t, length(t), 1) IN ('b','d','f','g','m','n','p','r','t')
       |       THEN substr(t, 1, length(t) - 1)
       |       WHEN p1 >= length(t) AND ${ess("t", "length(t)")} THEN t || 'e'
       |       ELSE t END AS w
       |  FROM s1bq),
       |s1c AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN fin IS NOT NULL THEN w
       |       WHEN length(w) >= 3 AND substr(w, length(w), 1) IN ('y','Y')
       |            AND substr(w, length(w) - 1, 1) NOT IN $V
       |       THEN substr(w, 1, length(w) - 1) || 'i' ELSE w END AS w
       |  FROM s1b),
       |s2 AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN fin IS NOT NULL OR suf IS NULL THEN w
       |       WHEN length(w) - length(suf) < p1 THEN w
       |       WHEN suf = 'ogi' AND NOT (length(w) >= 4 AND substr(w, length(w) - 3, 1) = 'l') THEN w
       |       WHEN suf = 'li' AND NOT (length(w) >= 3 AND substr(w, length(w) - 2, 1) IN ('c','d','e','g','h','k','m','n','r','t')) THEN w
       |       ELSE substr(w, 1, length(w) - length(suf)) || rep END AS w
       |  FROM (SELECT *, $s2suf AS suf, $s2rep AS rep FROM s1c) z),
       |s3 AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN fin IS NOT NULL OR suf IS NULL THEN w
       |       WHEN length(w) - length(suf) < p1 THEN w
       |       WHEN suf = 'ative' AND length(w) - 5 < p2 THEN w
       |       ELSE substr(w, 1, length(w) - length(suf)) || rep END AS w
       |  FROM (SELECT *, $s3suf AS suf, $s3rep AS rep FROM s2) z),
       |s4 AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN fin IS NOT NULL OR suf IS NULL THEN w
       |       WHEN length(w) - length(suf) < p2 THEN w
       |       WHEN suf = 'ion' AND NOT (length(w) >= 4 AND substr(w, length(w) - 3, 1) IN ('s','t')) THEN w
       |       ELSE substr(w, 1, length(w) - length(suf)) END AS w
       |  FROM (SELECT *, $s4suf AS suf FROM s3) z),
       |s5 AS (SELECT doc_id, orig, fin, p1, p2,
       |  CASE WHEN fin IS NOT NULL THEN w
       |       WHEN ends_with(w, 'e') AND (length(w) - 1 >= p2 OR
       |            (length(w) - 1 >= p1 AND NOT ${ess("w", "(length(w) - 1)")}))
       |       THEN substr(w, 1, length(w) - 1)
       |       WHEN ends_with(w, 'l') AND length(w) - 1 >= p2 AND length(w) >= 2
       |            AND substr(w, length(w) - 1, 1) = 'l'
       |       THEN substr(w, 1, length(w) - 1)
       |       ELSE w END AS w
       |  FROM s4),
       |stem AS (SELECT doc_id, coalesce(fin, replace(w, 'Y', 'y')) AS w FROM s5),
       |kw AS (SELECT DISTINCT w FROM stem WHERE doc_id = -1),
       |hit AS (SELECT DISTINCT s.doc_id FROM stem s JOIN kw ON s.w = kw.w WHERE s.doc_id >= 0)
       |SELECT d.doc_id, d.lang, d.source FROM documents d JOIN hit USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}

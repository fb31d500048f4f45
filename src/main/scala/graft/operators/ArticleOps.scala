package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.UrlFunctions

/** The reference's article ETL pipeline, Spark-first, over the driver's
  * `documents` table (SURVEY.md §2 O4-O6, O10-O13, O18-O20).
  *
  * The reference crawls live HTML; here the corpus is synthesized
  * deterministically from `documents` columns inside each query (both the
  * Spark plan and the DuckDB oracle build the identical corpus), so each
  * operator — tag-strip cleanse, meta-tag field extraction, link routing,
  * keyword search, inverted index — is exercised end-to-end and
  * hash-checked.
  *
  * Everything here is narrow (scan -> project/filter) or a single
  * hash-agg; no query shuffles more than once. All regexes are shared
  * Java/RE2-safe dialect.
  */
object ArticleOps {

  /** `<tag>`-strip regex — the reference's `re.sub(r'<.*?>', '', …)`
    * (newsspider.py:49), written as `<[^>]*>` which is equivalent on
    * well-formed markup and safe in both Java regex and RE2. */
  val TagRe = "<[^>]*>"

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** O13: cleanse — wrap the text in article markup, then strip tags +
    * trim (newsspider.py:48-49). Pure narrow projection; whole-stage
    * codegen'd end to end. */
  def cleanseText(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(
        col("doc_id"),
        trim(regexp_replace(
          concat(lit("<article><p>"), col("text"), lit("</p></article>")),
          TagRe, "")).as("clean_text"))
      .orderBy("doc_id")

  /** Deterministic synthetic article HTML for a document row. Every 5th
    * doc lacks og:title (exercising the h1 coalesce fallback, O12) and
    * every 3rd lacks an author (nullable field, apitestmongo.py:27-31). */
  private def articleHtml: Column = {
    val ogTitle = when(col("doc_id") % 5 =!= 0,
      concat(lit("<meta property=\"og:title\" content=\"Doc "),
        col("doc_id"), lit("\"/>"))).otherwise(lit(""))
    val author = when(col("doc_id") % 3 =!= 0,
      concat(lit("<meta property=\"article:author\" content=\"author_"),
        col("doc_id") % 7, lit("\"/>"))).otherwise(lit(""))
    concat(
      ogTitle,
      lit("<h1 itemprop=\"headline\">Headline "), col("doc_id"), lit("</h1>"),
      lit("<meta property=\"og:description\" content=\""),
      substring(col("text"), 1, 40), lit("\"/>"),
      author,
      lit("<meta property=\"article:section\" content=\""), col("source"), lit("\"/>"),
      lit("<meta name=\"keywords\" content=\""), col("lang"), lit(","),
      col("source"), lit("\"/>"))
  }

  private def metaProp(html: Column, prop: String): Column =
    nullif(regexp_extract(html,
      "<meta property=\"" + prop + "\" content=\"([^\"]*)\"", 1), lit(""))

  /** O11+O12: the 7-field article projection — regex meta-tag extraction
    * with coalesce(og:title, h1) title fallback (newsspider.py:40-46). */
  def extractArticleFields(spark: SparkSession, sfDir: String): DataFrame = {
    val withHtml = docs(spark, sfDir).withColumn("html", articleHtml)
    withHtml.select(
      col("doc_id"),
      concat(lit("https://www.example.com/"), col("source"), lit("/"),
        col("doc_id")).as("url"),
      coalesce(
        metaProp(col("html"), "og:title"),
        nullif(regexp_extract(col("html"),
          "<h1 itemprop=\"headline\">([^<]*)</h1>", 1), lit(""))).as("title"),
      metaProp(col("html"), "og:description").as("description"),
      metaProp(col("html"), "article:author").as("author"),
      metaProp(col("html"), "article:section").as("section"),
      nullif(regexp_extract(col("html"),
        "<meta name=\"keywords\" content=\"([^\"]*)\"", 1), lit(""))
        .as("keywords"))
      .orderBy("doc_id")
  }

  /** Regexes from index.py:10-12 (doc extensions / binary extensions),
    * re-expressed portably. */
  val WantedExtRe = "\\.(pdf|csv|docx?|xlsx?|zip|tar\\.gz)$"
  val BinExtRe    = "\\.(jpe?g|png|gif|js|css|ico)$"
  val SiteHost    = "www.example.com"

  /** O4+O5+O6: link fan-out, URL normalization, 3-way routing
    * (index.py:158-172). The href population is synthesized to hit every
    * route branch; normalization runs through the `resolveUrl` UDF only
    * for relative links (the regex guard short-circuits absolute ones). */
  def routeLinks(spark: SparkSession, sfDir: String): DataFrame = {
    val pageUrl = lit("https://www.example.com/index")
    val href =
      when(col("doc_id") % 6 === 0, concat(lit("/news/uk-"), col("doc_id")))
      .when(col("doc_id") % 6 === 1,
        concat(lit("https://www.example.com/sport/"), col("doc_id")))
      .when(col("doc_id") % 6 === 2,
        concat(lit("https://www.example.com/files/report"), col("doc_id"), lit(".pdf")))
      .when(col("doc_id") % 6 === 3, concat(lit("https://other.site/page"), col("doc_id")))
      .when(col("doc_id") % 6 === 4,
        concat(lit("https://www.example.com/img/logo"), col("doc_id"), lit(".jpg")))
      .otherwise(concat(lit("report-"), col("doc_id"), lit(".csv")))
    docs(spark, sfDir)
      .select(col("doc_id"), href.as("href"))
      .withColumn("resolved", UrlFunctions.normalizeUrl(pageUrl, col("href")))
      .withColumn("route",
        when(col("resolved").rlike(WantedExtRe), "doc")
          .when(col("resolved").contains(SiteHost) && !col("resolved").rlike(BinExtRe),
            "frontier")
          .otherwise("junk"))
      .orderBy("doc_id")
  }

  /** O21-flavored summary over the routing: page/doc/junk counters
    * (index.py:144's `found %d pages, %d docs`). */
  def routeCounts(spark: SparkSession, sfDir: String): DataFrame =
    routeLinks(spark, sfDir)
      .groupBy("route").agg(count(lit(1)).as("n"))
      .orderBy("route")

  /** O18+O19: keyword search — case-insensitive whole-token match over
    * `text` (the engine's defined semantics for Mongo `$text`, SURVEY.md
    * §7.5), projecting the searchable fields. */
  def searchKeyword(spark: SparkSession, sfDir: String, keyword: String = "spark"): DataFrame =
    docs(spark, sfDir)
      .filter(array_contains(split(lower(col("text")), " "), keyword.toLowerCase))
      .select("doc_id", "lang", "source", "n_chars", "text")
      .orderBy("doc_id")

  /** O18 multi-keyword form: Mongo `$text $search` ORs its terms
    * (api.py:26 — "spark merge" matches docs containing either token);
    * arrays_overlap expresses exactly that over the token set. */
  def searchAnyKeyword(spark: SparkSession, sfDir: String,
                       keywords: Seq[String] = Seq("spark", "merge")): DataFrame =
    docs(spark, sfDir)
      .filter(arrays_overlap(split(lower(col("text")), " "),
        array(keywords.map(k => lit(k.toLowerCase)): _*)))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Diacritic fold table — the Latin-1/Latin-Extended vowels +
    * c/n common in the corpus languages (es/fr/de). BOTH engines apply
    * the IDENTICAL translate mapping (rather than each engine's own
    * strip-accents routine, whose tables differ), so folded text is
    * byte-equal and the oracle hashes match. */
  val DiacriticsFrom = "áàâäãåéèêëíìîïóòôöõúùûüýñç"
  val DiacriticsTo   = "aaaaaaeeeeiiiiooooouuuuync"

  /** FULL Latin fold — closes SURVEY §7.5's "full Unicode fold
    * coverage" residual for the scripts Mongo's `$text` actually folds:
    * every foldable letter of Latin-1 Supplement and Latin Extended-A,
    * grouped by base letter, plus the ligature/special letters that
    * EXPAND (æ→ae, œ→oe, ß→ss, ĳ→ij, þ→th) and therefore can't ride a
    * 1:1 translate. Lowercase only — `lower()` runs first, and both the
    * corpus and the synthesized accents are lowercase, so JVM-vs-utf8proc
    * case-mapping divergence never enters. The From/To strings and the
    * oracle's SQL are all rendered from THIS table, so the two engines
    * cannot drift. */
  private val LatinFoldGroups: Seq[(Char, String)] = Seq(
    'a' -> "áàâäãåāăą", 'c' -> "çćĉċč", 'd' -> "ďđð", 'e' -> "éèêëēĕėęě",
    'g' -> "ĝğġģ", 'h' -> "ĥħ", 'i' -> "íìîïĩīĭįı", 'j' -> "ĵ",
    'k' -> "ķĸ", 'l' -> "ĺļľŀł", 'n' -> "ñńņňŉŋ", 'o' -> "óòôöõøōŏő",
    'r' -> "ŕŗř", 's' -> "śŝşšſ", 't' -> "ţťŧ", 'u' -> "úùûüũūŭůűų",
    'w' -> "ŵ", 'y' -> "ýÿŷ", 'z' -> "źżž")
  val LatinFoldFrom: String = LatinFoldGroups.map(_._2).mkString
  val LatinFoldTo: String =
    LatinFoldGroups.map { case (b, s) => b.toString * s.length }.mkString
  /** Multi-char expansions, applied before the translate. */
  val LigatureFolds: Seq[(String, String)] = Seq(
    "æ" -> "ae", "œ" -> "oe", "ß" -> "ss", "ĳ" -> "ij", "þ" -> "th")

  /** The shared fold: lower → ligature expansions → base-letter
    * translate. Row-local; both engines evaluate the same mapping. */
  def foldLatin(c: Column): Column = {
    val replaced = LigatureFolds.foldLeft(lower(c)) { case (acc, (f, t)) =>
      call_function("replace", acc, lit(f), lit(t))
    }
    translate(replaced, LatinFoldFrom, LatinFoldTo)
  }

  /** Mongo `$text` diacritic insensitivity (api.py:26 — `$text` is
    * diacritic-insensitive for Latin scripts): both the document tokens
    * and the query keyword are folded through the same translate table,
    * so `cafe` matches `café`. The query synthesizes diacritics onto
    * every 7th doc (both engines identically) so folding is genuinely
    * exercised against accented text. Row-local narrow projection —
    * translate adds no shuffle. */
  def searchDiacriticFolded(spark: SparkSession, sfDir: String,
                            keyword: String = "merge"): DataFrame = {
    val kwFolded = translate(lower(lit(keyword)),
      DiacriticsFrom, DiacriticsTo)
    val accented = docs(spark, sfDir)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, translate(col("text"), "ae", "áé"))
          .otherwise(col("text")))
    accented
      .filter(array_contains(
        split(translate(lower(col("text")), DiacriticsFrom, DiacriticsTo), " "),
        kwFolded))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** [[searchDiacriticFolded]] over the FULL Latin fold ([[foldLatin]]):
    * synthesizes Latin-Extended-A accents onto every 7th doc
    * (a→ā, e→ě — folded back by the extended translate) and the German
    * ß onto every 11th (s→ß — its tokens fold to 'ss' forms, so they
    * correctly STOP matching an unligatured keyword; the expansion path
    * is exercised in both engines identically). Same row-local shape;
    * the oracle's fold SQL is rendered from the same tables. */
  def searchFoldedFull(spark: SparkSession, sfDir: String,
                       keyword: String = "spark"): DataFrame = {
    val accented = docs(spark, sfDir)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, translate(col("text"), "ae", "āě"))
          .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 11 === 0,
          call_function("replace", col("text"), lit("s"), lit("ß")))
          .otherwise(col("text")))
    accented
      .filter(array_contains(split(foldLatin(col("text")), " "),
        foldLatin(lit(keyword))))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** English stop words Mongo's `$text` drops from a query string
    * (api.py:26 — a search for "the spark and merge" matches on the
    * content words only). Query-COMPILE-time behavior, like Mongo's
    * query analyzer: the stop words never reach the data plane. */
  val StopWords: Set[String] =
    Set("the", "a", "an", "of", "and", "or", "to", "in", "is", "on")

  /** Mongo `$text` query-string semantics end-to-end: tokenize the raw
    * query, drop stop words, OR the surviving terms (api.py:26). The
    * data-plane plan is exactly [[searchAnyKeyword]]'s arrays_overlap —
    * and therefore index-rewritable — over the analyzed term set. */
  def searchTextQuery(spark: SparkSession, sfDir: String,
                      query: String = "the spark and merge"): DataFrame = {
    val terms = query.toLowerCase.split(" ")
      .filter(t => t.nonEmpty && !StopWords.contains(t)).toSeq
    require(terms.nonEmpty, s"query is all stop words: '$query'")
    searchAnyKeyword(spark, sfDir, terms)
  }

  /** O20: search results serialized to JSON lines (api.py:38). */
  def searchKeywordJson(spark: SparkSession, sfDir: String): DataFrame =
    searchKeyword(spark, sfDir)
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("source"))).as("js"))
      .orderBy("doc_id")

  /** O18 index form: the inverted index the Mongo text index implies
    * (api.py:22) as a derived table: token explode -> term stats.
    * One shuffle on `term`; partial aggregation collapses the explosion
    * map-side. At 100 TB this materializes once and is reused by every
    * search (join on term), instead of N full scans. */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(
        countDistinct(col("doc_id")).as("doc_count"),
        count(lit(1)).as("total_count"),
        // postings serialized to a sorted CSV string: array columns crash
        // the driver's comparator (ADVICE.md r01), and a canonical string
        // is what a downstream join would broadcast anyway
        concat_ws(",", sort_array(collect_set(col("doc_id")))).as("doc_ids"))
      .orderBy("term")

  /** The reference's whole reason to exist as ONE dataflow (EP1+EP3,
    * SURVEY.md §3): crawl reachability (BFS from the seed over the link
    * graph) → article field extraction on the reached pages → keyword
    * search over their text. Composes the iterative, extraction, and
    * search layers end-to-end. */
  def crawlExtractSearch(spark: SparkSession, sfDir: String,
                         keyword: String = "spark"): DataFrame = {
    val reached = GraphOps.frontierBfs(spark, sfDir)
      .select(col("node").as("doc_id"), col("depth"))
    extractArticleFields(spark, sfDir)
      .join(reached, "doc_id")
      .join(searchKeyword(spark, sfDir, keyword).select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("depth").cast("long").as("depth"),
        col("title"), col("section"))
      .orderBy("doc_id")
  }

  /** Reference O17 (`download_files` batch driver, index.py:190-212):
    * number the input lines, give every row a per-row outcome (the
    * reference's try/except skip, O24 — simulated deterministically
    * here), and report `downloaded m / n` per outcome.
    *
    * The sequential line counter (index.py:198-205) is computed with
    * two-level numbering instead of a global unpartitioned window
    * (round-2's single-task bottleneck): rows are range-bucketed on the
    * order key, numbered per bucket in parallel, and each bucket adds
    * the cumulative count of the buckets before it. The only serial
    * step is the running sum over per-bucket COUNTS — O(#buckets) rows,
    * not O(#rows) — and the offset table broadcasts back. Same values
    * as `row_number() OVER (ORDER BY doc_id)` (doc_ids are unique), so
    * the oracle is unchanged. */
  def batchReport(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketWidth = 1000L
    val d = docs(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bucket", floor(col("doc_id") / bucketWidth))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
    val offsets = d.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("offset",
        coalesce(sum(col("bn")).over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    d.join(broadcast(offsets), "bucket")
      .withColumn("line_nb",
        (col("offset") + row_number().over(wIn)).cast("long"))
      .withColumn("outcome",
        when(col("n_chars") % 13 === 0, "error").otherwise("ok"))
      .groupBy("outcome")
      .agg(count(lit(1)).as("n"),
        min(col("line_nb")).as("first_line"),
        max(col("line_nb")).as("last_line"))
      .orderBy("outcome")
  }

  /** Index-backed search as the DEFAULT plan (VERDICT r02 item 4): the
    * query is written as the plain token-match filter — identical source
    * to [[searchKeyword]] — but the materialized text index is
    * registered first, so graft.plans.TextIndexRewrite rewrites the
    * filter into a semi-join against the postings table during
    * optimization. The Mongo shape exactly: `create_index` once
    * (api.py:22), then every `$text` search uses it transparently
    * (api.py:26). A plan spec asserts the index join fires. */
  def searchIndexed(spark: SparkSession, sfDir: String, keyword: String = "spark"): DataFrame = {
    graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    docs(spark, sfDir)
      .filter(array_contains(split(lower(col("text")), " "), keyword.toLowerCase))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Ranked search — the Mongo textScore analogue (api.py:26): multi-term
    * OR match scored by total term frequency (integer-exact, so the
    * oracle hash is stable), ordered by (score desc, doc_id). One
    * (doc_id) shuffle for the TF aggregation, then a key join back to
    * the documents; the token explode collapses map-side via partial
    * aggregation. */
  def searchRanked(spark: SparkSession, sfDir: String,
                   keywords: Seq[String] = Seq("spark", "merge")): DataFrame = {
    val hits = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term").isin(keywords.map(_.toLowerCase): _*))
      .groupBy("doc_id").agg(count(lit(1)).as("score"))
    docs(spark, sfDir)
      .join(hits, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** [[searchRanked]] written as the SCAN spelling with the text index
    * merely REGISTERED — the transparent textScore path: the query
    * tokenizes and counts keyword occurrences, and
    * graft.plans.TextIndexRewrite folds the whole explode→filter→count
    * subtree into `SUM(tf)` over the materialized postings (which store
    * the per-(term, doc) frequency), so scoring touches only the probed
    * terms' row groups and the corpus is never tokenized at query time.
    * Mongo's `$text` contract: indexes are storage, not syntax
    * (api.py:22,26). A plan spec asserts the Generate is gone. */
  def searchRankedAuto(spark: SparkSession, sfDir: String,
                       keywords: Seq[String] = Seq("spark", "merge")): DataFrame = {
    graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    searchRanked(spark, sfDir, keywords)
  }

  /** Mongo `$text` quoted-phrase search (api.py:26 accepts `"exact
    * phrase"` syntax): docs whose FILTERED token sequence contains the
    * phrase's tokens adjacently, in order. Textbook positional-index
    * plan: the materialized postings give the candidate docs (every doc
    * containing ALL phrase terms — a term-pruned index scan, never a
    * corpus scan), then the positional verify runs on candidates only —
    * posexplode positions per candidate, and the phrase is an equi-join
    * of each term's positions shifted by its phrase offset (the IR
    * AND-merge of positional postings). Adjacency is over the
    * empty-filtered token sequence, consistent with every other search's
    * whole-token semantics. */
  def searchPhrase(spark: SparkSession, sfDir: String,
                   phrase: String = "merge group"): DataFrame = {
    val terms = phrase.toLowerCase.split(" ").filter(_.nonEmpty)
    require(terms.nonEmpty,
      "phrase search needs at least one non-space token")
    val idxPath = graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    val cand = spark.read.parquet(idxPath)
      .filter(col("term").isin(terms.distinct.toSeq: _*))
      .groupBy("doc_id").agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === terms.distinct.length)
      .select("doc_id")
    val toks = docs(spark, sfDir)
      .join(cand, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(
        filter(split(lower(col("text")), " "), t => length(t) > 0)))
      .toDF("doc_id", "pos", "term")
    val first = toks.filter(col("term") === terms(0)).select("doc_id", "pos")
    val hits = terms.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      acc.join(toks.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("pos")), Seq("doc_id", "pos"))
    }.select("doc_id").distinct()
    docs(spark, sfDir).join(hits, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** [[searchPhrase]] served ENTIRELY from the positional postings —
    * the adjacency verify never re-tokenizes a document: each phrase
    * term's sorted position list comes out of the index (pushed
    * term-equality probe on the term-bucketed layout), positions shift
    * by their phrase offset, and the phrase is the (doc_id, pos)
    * equi-join AND-merge of the per-term lists — the classic positional
    * intersection of an IR engine, as dataflow. The corpus is touched
    * exactly once, by the final 3-column projection semi-join.
    *
    * Scale shape: per term the index contributes only that term's
    * postings rows (row-group-pruned by the sort-on-term write); the
    * merge joins carry narrow (doc_id, pos) pairs; nothing re-reads
    * text. Same output contract and oracle as [[searchPhrase]]. */
  def searchPhraseIndexed(spark: SparkSession, sfDir: String,
                          phrase: String = "merge group"): DataFrame = {
    val terms = phrase.toLowerCase.split(" ").filter(_.nonEmpty)
    require(terms.nonEmpty,
      "phrase search needs at least one non-space token")
    val idxPath = graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    val post = spark.read.parquet(idxPath)
    def positionsOf(t: String, shift: Int) =
      post.filter(col("term") === t)
        .select(col("doc_id"), explode(col("positions")).as("p"))
        .select(col("doc_id"), (col("p") - shift).as("pos"))
    val hits = terms.zipWithIndex.drop(1)
      .foldLeft(positionsOf(terms(0), 0)) { case (acc, (t, i)) =>
        acc.join(positionsOf(t, i), Seq("doc_id", "pos"))
      }.select("doc_id").distinct()
    docs(spark, sfDir).join(hits, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Fuzzy keyword search (edit distance <= maxDist) resolved against
    * the TERM DICTIONARY, never the corpus — the way a search engine
    * runs fuzzy queries (Lucene walks its term dict with a Levenshtein
    * automaton; the dataflow analogue filters the vocabulary): the
    * distinct-term side of the postings index is vocabulary-sized, the
    * `levenshtein` probe runs there, matching terms semi-join back into
    * the postings for doc ids, and the corpus is touched exactly once by
    * the final projection. The probe is the THRESHOLD form
    * `levenshtein(l, r, k)` (returns −1 past the bound): the banded DP
    * early-exits at O(k·n) per term instead of filling the full O(m·n)
    * matrix and comparing after — on a 100 TB corpus the term
    * dictionary is tens of millions of rows and the probe scans all of
    * it, so the per-term bound is the dominant constant. DuckDB's plain
    * `levenshtein` + `<=` predicate is semantically identical at the
    * threshold, so the oracle is unchanged. */
  def searchFuzzy(spark: SparkSession, sfDir: String,
                  keyword: String = "soft", maxDist: Int = 1): DataFrame = {
    val idxPath = graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    val post = spark.read.parquet(idxPath)
    val cand = post.select("term").distinct()
      .filter(levenshtein(col("term"), lit(keyword.toLowerCase),
        maxDist) =!= -1)
    val hits = post.join(cand, "term").select("doc_id").distinct()
    docs(spark, sfDir).join(hits, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Mongo `$text` negation (api.py:26 accepts `-term` exclusions):
    * `"spark -merge"` matches docs containing `spark` but not `merge`.
    * The positive conjunct is the rewrite-matchable token pattern, so
    * with an index registered TextIndexRewrite turns it into the
    * postings semi-join and the negation stays behind as the residual
    * filter over the candidates — index-pruned scan plus a cheap
    * per-candidate check, the standard inclusion-list/exclusion-filter
    * split. */
  def searchNegation(spark: SparkSession, sfDir: String,
                     keyword: String = "spark", excluded: String = "merge"): DataFrame =
    docs(spark, sfDir)
      .filter(array_contains(split(lower(col("text")), " "), keyword.toLowerCase) &&
        !array_contains(split(lower(col("text")), " "), excluded.toLowerCase))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** BM25-style ranked search — the tf·idf-shaped upgrade of
    * [[searchRanked]]'s raw TF (Mongo's textScore weighs rarity and
    * length, api.py:26). Per (doc, term):
    *
    *   part = floor(1e6 · idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)))
    *
    * with k1 = 1.2, b = 0.75 and the log-free probabilistic idf ratio
    * (N − df + 0.5)/(df + 0.5) — no transcendental functions, because ln
    * is not correctly-rounded across engines while +,×,/ and floor are:
    * both sides evaluate the identical expression tree over exact
    * integer inputs, so the floored parts — and their BIGINT sum, the
    * score — hash-match bitwise. Shuffle shape: one doc_id agg for
    * lengths, one narrow (doc_id, term) agg for tf, a broadcast df
    * table, a broadcast 1-row stats table, and the score join back —
    * the explode collapses map-side everywhere. */
  /** The BM25 per-(doc, term) part — ONE expression tree shared by the
    * scan, indexed and transparent forms, so their bitwise-equality
    * contract is structural rather than a convention three copies must
    * uphold. Inputs are exact integer counts; see [[searchBm25]] for
    * the no-transcendentals argument. */
  private[operators] def bm25Part(tf: Column, df: Column, dl: Column,
                       nDocs: Column, tot: Column): Column =
    floor(lit(1000000.0) *
      ((nDocs.cast("double") - df.cast("double") + lit(0.5)) /
        (df.cast("double") + lit(0.5))) *
      ((tf.cast("double") * lit(2.2)) /
        (tf.cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
          (dl.cast("double") /
            (tot.cast("double") / nDocs.cast("double"))))))
    ).cast("long")

  def searchBm25(spark: SparkSession, sfDir: String,
                 keywords: Seq[String] = Seq("spark", "merge")): DataFrame = {
    val kws = keywords.map(_.toLowerCase)
    val toks = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = toks.filter(col("term").isin(kws: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df falls out of tf (one row per doc containing the term) — no
    // third tokenize+explode pass over the corpus
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scores = tf.join(broadcast(dfq), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // 1-row stats
      .select(col("doc_id"),
        bm25Part(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("tot")).as("part"))
      .groupBy("doc_id").agg(sum(col("part")).as("score"))
    docs(spark, sfDir)
      .join(scores, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Query-likelihood ranked search with Dirichlet smoothing (Zhai &
    * Lafferty 2001, "A Study of Smoothing Methods for Language Models
    * Applied to Ad Hoc Information Retrieval" — public): the language-
    * modeling alternative to [[searchBm25]]'s probabilistic ranking.
    * Each document is scored by the log-likelihood of the query under
    * the document's smoothed unigram LM,
    *
    *   score(d) = Σ_q log P(q|d),
    *   P(q|d)   = (tf + μ·cf_q/C) / (dl + μ)
    *
    * with μ = 2000, cf_q the term's COLLECTION frequency and C the
    * total token count — every query term contributes (tf = 0 falls
    * back to the collection prior), which is what distinguishes QL
    * from tf·idf sums. In exact integer arithmetic: multiply P(q|d)
    * through by C to get the integer ratio (tf·C + μ·cf_q)/(C·(dl+μ)),
    * and take logs as the quantized sixteenth-bit [[TextOps.qlog2]] —
    * no transcendental is evaluated, so scores hash-match bitwise
    * across engines (the same discipline as the entropy/Zipf family;
    * qlog2 is exact while its argument < 2⁵², so at ≥ ~10¹³ corpus
    * tokens rescale cf/C to parts-per-billion first — plan unchanged).
    *
    * Shuffle shape mirrors [[searchBm25]]: one doc_id agg for lengths
    * (stats fall out of it as a 1-row broadcast), one narrow
    * (doc_id, term) agg for tf, cf folded out of tf by a second
    * term-keyed agg over ≤|query| rows, and the score join back. */
  /** The QLM per-(doc, term) sixteenth-bit part — ONE expression tree
    * shared by the scan and indexed forms (the [[bm25Part]] pattern:
    * bitwise equality between forms is structural, not a convention). */
  private[operators] def qlmPart(tf0: Column, cf: Column, dl: Column,
                                 ctot: Column, mu: Long): Column =
    TextOps.qlog2(tf0 * ctot + lit(mu) * cf) -
      TextOps.qlog2(ctot * (dl + lit(mu)))

  /** Shared QLM scoring tail over (doc_id, term, tf) rows + per-doc
    * lengths: candidates × query-term grid (tf coalesced to 0 — the
    * collection-prior contribution), one part per cell, summed. */
  private def qlmScores(tf: DataFrame, dl: DataFrame, mu: Long): DataFrame = {
    val stats = dl.agg(sum(col("dl")).as("ctot"))
    // collection frequency folds out of tf (cf = Σ_d tf) — no third
    // pass over the corpus or the postings; a query term absent from
    // the corpus drops out of cf and contributes nothing, both engines
    val cf = tf.groupBy("term").agg(sum(col("tf")).as("cf"))
    tf.select("doc_id").distinct()
      .crossJoin(broadcast(cf)) // |query| rows per doc
      .join(tf, Seq("doc_id", "term"), "left")
      .withColumn("tf0", coalesce(col("tf"), lit(0L)))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // 1-row totals
      .select(col("doc_id"),
        qlmPart(col("tf0"), col("cf"), col("dl"), col("ctot"), mu).as("part"))
      .groupBy("doc_id").agg(sum(col("part")).as("score"))
  }

  def searchQlm(spark: SparkSession, sfDir: String,
                keywords: Seq[String] = Seq("spark", "merge"),
                mu: Long = 2000L): DataFrame = {
    val kws = keywords.map(_.toLowerCase)
    val toks = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(kws: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    docs(spark, sfDir)
      .join(qlmScores(tf, dl, mu), "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** [[searchQlm]] served off the MATERIALIZED postings index — zero
    * query-time tokenization: tf rows are the term-pruned postings, dl
    * is SUM(tf) over each doc's postings (identical by construction to
    * the scan's token count), ctot and cf fold out of those. Bitwise
    * equal to the scan form via the shared [[qlmPart]] tree over the
    * same exact-integer inputs. */
  def searchQlmIndexed(spark: SparkSession, sfDir: String,
                       keywords: Seq[String] = Seq("spark", "merge"),
                       mu: Long = 2000L): DataFrame = {
    val kws = keywords.map(_.toLowerCase)
    val idxPath = graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    val post = spark.read.parquet(idxPath)
    val dl = post.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val tf = post.filter(col("term").isin(kws: _*))
      .select("doc_id", "term", "tf")
    docs(spark, sfDir)
      .join(qlmScores(tf, dl, mu), "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** [[searchBm25]] with the index registered — the TRANSPARENT form:
    * the query is the SAME scan spelling, and TextIndexRewrite folds
    * both tokenize subtrees into the postings (the dl aggregate becomes
    * SUM(tf) over the full postings via DocLenMatch; the per-(doc,
    * term) tf aggregate IS the term-pruned postings row set via
    * TermTfMatch) — so the whole BM25 evaluation runs off the index
    * with zero query-time tokenization, the Mongo index-transparent
    * `$text` scoring contract (api.py:22,26). Results are bitwise equal
    * to the scan form (same exact-integer inputs, same score tree). */
  def searchBm25Auto(spark: SparkSession, sfDir: String,
                     keywords: Seq[String] = Seq("spark", "merge")): DataFrame = {
    graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    searchBm25(spark, sfDir, keywords)
  }

  /** [[searchBm25]] served ENTIRELY from the postings index — the
    * "indexes are storage, not syntax" story for the full scoring path.
    * Every BM25 input is already in the (term, doc_id, tf) postings:
    * dl = SUM(tf) per doc, df = term's row count, n_docs/avgdl from the
    * dl aggregate — so query time never tokenizes text (no split, no
    * explode; the only corpus touch is the final output-column join).
    * At 100 TB that converts each query from a full-text scan + explode
    * shuffle into aggregates over the narrow term-bucketed postings with
    * the query terms pushed to the scan. The score expression tree is
    * byte-for-byte the scan form's — exact integer inputs (postings tf
    * is the same COUNT the scan computes) through +,×,/,floor — so
    * scores, and the oracle hash, match [[searchBm25]] bitwise. */
  def searchBm25Indexed(spark: SparkSession, sfDir: String,
                        keywords: Seq[String] = Seq("spark", "merge")): DataFrame = {
    val kws = keywords.map(_.toLowerCase)
    val idxPath = graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    val post = spark.read.parquet(idxPath)
    val dl = post.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = post.filter(col("term").isin(kws: _*))
      .select("doc_id", "term", "tf")
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scores = tf.join(broadcast(dfq), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // 1-row stats
      .select(col("doc_id"),
        bm25Part(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("tot")).as("part"))
      .groupBy("doc_id").agg(sum(col("part")).as("score"))
    docs(spark, sfDir)
      .join(scores, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Search-result SNIPPET generation — the keyword-in-context window
    * every search UI renders under a hit (reference analogue: the JSON
    * article payload api.py:28-35 returns whole articles; a result
    * page excerpts them): for each matching document, the ±3-word
    * window around the FIRST occurrence of the query term, clamped at
    * the document edges. Entirely row-local array surgery on the
    * matching rows (array_position + slice on the token array) — zero
    * shuffle beyond the match filter itself at any corpus size; at
    * 100 TB this runs over the index-served candidate set, not the
    * corpus. */
  def searchSnippet(spark: SparkSession, sfDir: String,
                    keyword: String = "merge"): DataFrame = {
    val w = TextOps.words(col("text"))
    val p = array_position(w, lit(keyword.toLowerCase))
    docs(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), w.as("w"), p.as("p"))
      .filter(col("p") > 0)
      .select(col("doc_id"), col("lang"), col("source"),
        col("p").as("hit_pos"),
        concat_ws(" ", slice(col("w"),
          greatest(lit(1L), col("p") - 3).cast("int"),
          (least(size(col("w")).cast("long"), col("p") + 3) -
            greatest(lit(1L), col("p") - 3) + 1).cast("int"))).as("snippet"))
      .orderBy("doc_id")
  }

  /** [[searchSnippet]] served off the POSITIONAL index — the
    * [[searchPhraseIndexed]] discipline applied to keyword-in-context:
    * the postings row (term, doc_id, tf, positions) already carries
    * exactly what the ±3-word window needs, so the candidate set AND
    * the hit position come from one pushed term-equality probe
    * (`positions` is the sorted occurrence list in the SAME
    * empty-filtered token coordinates the scan uses; its head + 1 IS
    * `array_position`'s 1-based first hit). The corpus is touched
    * exactly once, by the word-array slice of the matched docs — a
    * doc_id equi-join against the narrow hit set instead of
    * tokenizing and probing every document. Bitwise-equal to the scan
    * form (spec-pinned), same oracle.
    *
    * Scale shape: the index contributes only the probed term's
    * postings rows (row-group-pruned by the sort-on-term write); the
    * only corpus pass is the output projection of matching docs. At
    * 100 TB that is the difference between a full-text tokenize scan
    * and |hits| row lookups. */
  def searchSnippetIndexed(spark: SparkSession, sfDir: String,
                           keyword: String = "merge"): DataFrame = {
    val kw = keyword.toLowerCase
    val idxPath = graft.plans.TextIndexCatalog.ensureIndex(spark, sfDir)
    val hits = spark.read.parquet(idxPath)
      .filter(col("term") === kw)
      .select(col("doc_id"),
        (element_at(col("positions"), 1) + 1).cast("long").as("p"))
    val w = TextOps.words(col("text"))
    docs(spark, sfDir)
      .join(hits, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), w.as("w"), col("p"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("p").as("hit_pos"),
        concat_ws(" ", slice(col("w"),
          greatest(lit(1L), col("p") - 3).cast("int"),
          (least(size(col("w")).cast("long"), col("p") + 3) -
            greatest(lit(1L), col("p") - 3) + 1).cast("int"))).as("snippet"))
      .orderBy("doc_id")
  }

  /** SURVEY §1.3 `keywords` CSV → array derivation: the extracted
    * comma-joined keywords string split into one row per keyword with
    * its position (arrays can't be output columns under the driver's
    * comparator, so the derivation is exercised as an explode). */
  def keywordsSplit(spark: SparkSession, sfDir: String): DataFrame =
    extractArticleFields(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("keywords"), ",")))
      .toDF("doc_id", "kw_pos", "keyword")
      .select(col("doc_id"), col("kw_pos").cast("long").as("kw_pos"), col("keyword"))
      .orderBy("doc_id", "kw_pos")

  /** Stemmed search — the Mongo `$text` stemming behavior (api.py:26:
    * Mongo stems both query and document terms, so "merges" matches
    * "merge"), on the S-stemmer defined in TextOps.stemToken. Both the
    * document tokens and the query keyword go through the SAME stem
    * function; match is whole-(stemmed-)token. Narrow scan + row-local
    * transform; at 100 TB the postings table is built over stemmed
    * terms once and this becomes the usual index semi-join. */
  def searchStemmed(spark: SparkSession, sfDir: String,
                    keyword: String = "merges"): DataFrame =
    docs(spark, sfDir)
      .filter(array_contains(
        transform(graft.operators.TextOps.words(col("text")),
          t => graft.operators.TextOps.stemToken(t)),
        graft.operators.TextOps.stemToken(lit(keyword.toLowerCase))))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Search via the inverted index: term lookup -> semi-join back to the
    * documents (the scalable form of `searchKeyword` — touches only the
    * postings for the term instead of scanning every document). */
  def searchViaIndex(spark: SparkSession, sfDir: String, keyword: String = "merge"): DataFrame = {
    val postings = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") === keyword.toLowerCase)
      .select("doc_id").distinct()
    docs(spark, sfDir)
      .join(postings, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** [[searchStemmed]] in index form — the 100 TB path its scaladoc
    * promises: a MATERIALIZED stemmed-postings table (stemming is
    * row-local, applied once at index time;
    * TextIndexCatalog.ensureStemmedIndex carries the same incremental
    * manifest/delta maintenance as the token index), the query keyword
    * is stemmed once, and the probe is a pushed term equality on the
    * term-bucketed postings + semi-join back — a plural-insensitive
    * search touches one term's row groups instead of re-stemming every
    * document per query. */
  /** [[searchStemmed]] written as the SCAN form with the stemmed index
    * merely REGISTERED — the transparent path: TextIndexRewrite
    * recognizes the stem-lambda predicate (verified structurally against
    * TextOps.stemToken), swaps in a semi-join against the stemmed
    * postings, and the query text never mentions the index — Mongo's
    * `$text` contract, where indexes are storage, not syntax. */
  def searchStemmedAuto(spark: SparkSession, sfDir: String,
                        keyword: String = "merges"): DataFrame = {
    graft.plans.TextIndexCatalog.ensureStemmedIndex(spark, sfDir)
    searchStemmed(spark, sfDir, keyword)
  }

  /** [[searchStemmed]] on the PORTER stemmer — the documented
    * derivational option (VERDICT r5 #8) closing the Mongo `$text`
    * fidelity gap the S-stemmer leaves (api.py:26: Mongo stems
    * derivationally, so "generalizations" matches "general"). Same
    * whole-(stemmed-)token shape: document tokens and the query keyword
    * go through the SAME stem function, row-local over a narrow scan.
    * ORACLE-GATED since r8 (`art_search_porter`): the DuckDB side runs
    * the same algorithm rendered to SQL from the same step tables
    * (functions/PorterSql.scala), so the full derivational behavior —
    * "merges"/"merged"/"merging" all stem to "merg" — is hash-checked,
    * not just spec-covered. */
  def searchStemmedPorter(spark: SparkSession, sfDir: String,
                          keyword: String = "merges"): DataFrame =
    docs(spark, sfDir)
      .filter(array_contains(
        transform(graft.operators.TextOps.words(col("text")),
          t => graft.operators.TextOps.stemTokenPorter(t)),
        graft.operators.TextOps.stemTokenPorter(lit(keyword.toLowerCase))))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** [[searchStemmed]] on the SNOWBALL English stemmer ("Porter2") —
    * the stemmer Mongo's `$text` actually runs for English documents
    * (api.py:26 routes through MongoDB's Snowball library), closing
    * VERDICT r7's last fidelity gap: the repo previously offered only
    * the S-stemmer (oracle-gated) and 1980 Porter, whose suffix tables
    * differ from Snowball's. Same whole-(stemmed-)token shape: document
    * tokens and the query keyword go through the SAME stem function,
    * row-local over a narrow scan. ORACLE-GATED since r8
    * (`art_search_snowball`): DuckDB's own stem() needs the absent fts
    * extension, so the oracle renders the published algorithm itself
    * from the same step tables (functions/SnowballSql.scala) — the full
    * Mongo-fidelity stemming behavior is hash-checked, on top of the
    * hand-derived vocabulary-vector specs. */
  def searchStemmedSnowball(spark: SparkSession, sfDir: String,
                            keyword: String = "merges"): DataFrame =
    docs(spark, sfDir)
      .filter(array_contains(
        transform(graft.operators.TextOps.words(col("text")),
          t => graft.operators.TextOps.stemTokenSnowball(t)),
        graft.operators.TextOps.stemTokenSnowball(lit(keyword.toLowerCase))))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  def searchStemmedIndexed(spark: SparkSession, sfDir: String,
                           keyword: String = "merges"): DataFrame = {
    val idxDir = graft.plans.TextIndexCatalog.ensureStemmedIndex(spark, sfDir)
    val probe = spark.read.parquet(idxDir)
      .filter(col("term") ===
        graft.operators.TextOps.stemToken(lit(keyword.toLowerCase)))
      .select("doc_id")
    docs(spark, sfDir)
      .join(probe, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }
}

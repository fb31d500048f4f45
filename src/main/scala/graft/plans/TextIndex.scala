package graft.plans

import java.io.File
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, explode, length, lit, lower, split}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-side analogue of Mongo's `create_index([('text','text')])`
  * (reference api.py:22, SURVEY.md §4 "materialized view" seam): a
  * registry of materialized postings tables, plus an optimizer rule that
  * rewrites whole-token search filters over a registered table into a
  * semi-join against its postings — so every search becomes an
  * index-pruned parquet scan + key join instead of a full corpus scan,
  * transparently, for any query that plans the token-match pattern.
  *
  * Contract (what `register` asserts about the index): the postings
  * parquet at `indexPath` holds DISTINCT (term, doc_id) rows built as
  * `explode(split(lower(text), ' '))` over exactly the docs parquet at
  * `docsPath`, whose `doc_id` uniquely keys its rows. Under that
  * contract, `array_contains(split(lower(text),' '), kw)` ⟺
  * `doc_id SEMI JOIN postings WHERE term = kw`, for any space-free
  * non-empty literal keyword.
  */
object TextIndexCatalog {
  /** absolute docs-parquet path -> postings directory */
  private val indexes = TrieMap.empty[String, String]

  def register(docsPath: String, indexPath: String): Unit =
    indexes.put(docsPath, indexPath)

  def clear(): Unit = indexes.clear()

  def lookup(docsPath: String): Option[String] = indexes.get(docsPath)

  /** Distinct (term, doc_id) postings for a docs table. */
  def postings(spark: SparkSession, docsPath: String): DataFrame =
    spark.read.parquet(docsPath)
      .select(explode(split(lower(col("text")), " ")).as("term"), col("doc_id"))
      .filter(length(col("term")) > 0)
      .distinct()

  /** Materialize (once) + register the text index for `sfDir`'s
    * documents table. The postings land under java.io.tmpdir keyed by a
    * hash of the docs path PLUS the source files' (name, length, mtime)
    * fingerprint — a regenerated docs parquet at the same path gets a
    * fresh index directory instead of silently serving stale postings.
    * Sorted by term within few partitions so the term-equality probe
    * prunes parquet row groups (at 100 TB this is a bucketed-by-term
    * table; same probe shape). Idempotent per fingerprint. */
  def ensureIndex(spark: SparkSession, sfDir: String): String = {
    val docsPath = s"$sfDir/documents.parquet"
    val f = new File(docsPath)
    val parts =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
      else Array(s"${f.getName}:${f.length}:${f.lastModified}")
    val fingerprint = docsPath + "|" + parts.mkString(",")
    val key = java.security.MessageDigest.getInstance("SHA-1")
      .digest(fingerprint.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val idxDir = new File(sys.props("java.io.tmpdir"),
      s"graft-text-index/$key").getAbsolutePath
    if (!new File(idxDir, "_SUCCESS").exists()) {
      postings(spark, docsPath)
        .coalesce(4).sortWithinPartitions("term")
        .write.mode("overwrite").parquet(idxDir)
    }
    register(docsPath, idxDir)
    idxDir
  }
}

/** The rewrite rule. Matches both spellings of the whole-token search
  * predicate over `lower(text)` —
  *
  *   array_contains(split(lower(text), ' ', -1), 'kw')        (as planned)
  *   locate(' kw ', ' ' || lower(text) || ' ') > 0            (after TokenSearchRewrite)
  *
  * — when the filtered relation's file scan is a registered docs table
  * and `doc_id` is available, and replaces that conjunct with
  *
  *   child LEFT SEMI JOIN (postings WHERE term = 'kw') ON doc_id
  *
  * leaving any remaining conjuncts as a residual Filter. The postings
  * probe's term filter reaches the parquet scan as a pushed filter, so
  * the search touches one term's row groups instead of every document.
  */
class TextIndexRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def plainToken(kw: String): Boolean =
    kw != null && kw.nonEmpty && !kw.contains(' ')

  /** (text attribute, keywords) from any predicate spelling: the
    * single-term array_contains form, the locate form TokenSearchRewrite
    * produces, and the multi-term OR form (arrays_overlap — Mongo $text
    * ORs its terms, api.py:26). */
  private object TokenMatch {
    private object TokenArrayLit {
      def unapply(e: Expression): Option[Seq[String]] = tokenArray(e)
    }
    private def tokenArray(e: Expression): Option[Seq[String]] = e match {
      case CreateArray(elems, _) =>
        val kws = elems.collect {
          case Literal(kw: UTF8String, StringType) if plainToken(kw.toString) =>
            kw.toString
        }
        if (kws.length == elems.length && kws.nonEmpty) Some(kws) else None
      // constant folding collapses CreateArray of literals into one
      // array literal before this rule's match
      case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(StringType, _)) =>
        val n = arr.numElements()
        val kws = (0 until n).flatMap { i =>
          Option(arr.getUTF8String(i)).map(_.toString)
        }
        if (kws.length == n && kws.nonEmpty && kws.forall(plainToken)) Some(kws)
        else None
      case _ => None
    }
    def unapply(e: Expression): Option[(Attribute, Seq[String])] = e match {
      case ArrayContains(
            StringSplit(Lower(a: Attribute), Literal(sep: UTF8String, StringType),
              Literal(-1, _)),
            Literal(kw: UTF8String, StringType))
          if sep.toString == " " && plainToken(kw.toString) =>
        Some((a, Seq(kw.toString)))
      case ArraysOverlap(
            StringSplit(Lower(a: Attribute), Literal(sep: UTF8String, StringType),
              Literal(-1, _)),
            TokenArrayLit(kws))
          if sep.toString == " " =>
        Some((a, kws))
      case GreaterThan(
            StringLocate(Literal(needle: UTF8String, StringType),
              Concat(Seq(Literal(s1: UTF8String, StringType),
                Lower(a: Attribute),
                Literal(s2: UTF8String, StringType))),
              Literal(1, IntegerType)),
            Literal(0, _))
          if s1.toString == " " && s2.toString == " " && {
            val n = needle.toString
            n.length > 2 && n.startsWith(" ") && n.endsWith(" ") &&
              plainToken(n.substring(1, n.length - 1))
          } =>
        Some((a, Seq(needle.toString.trim)))
      case _ => None
    }
  }

  /** The registered docs scan DIRECTLY under `plan` — only through
    * row-identity-preserving nodes (Project/Filter). Anything else
    * (union, join, generate, aggregate) changes or mixes row identity,
    * so rewriting a filter above it against the base table's postings
    * would be wrong (e.g. a dup-seeded union contains rows the postings
    * have never seen); those plans are conservatively refused. */
  private def registeredScan(plan: LogicalPlan): Option[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.collectFirst {
        case p if TextIndexCatalog.lookup(p.toUri.getPath).isDefined =>
          p.toUri.getPath
      }
    case org.apache.spark.sql.catalyst.plans.logical.Project(_, c) => registeredScan(c)
    case Filter(_, c) => registeredScan(c)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = registeredScan(child).flatMap { docsPath =>
        conjuncts.collectFirst {
          case p @ TokenMatch(attr, kws)
              if attr.name == "text" && child.outputSet.contains(attr) &&
                child.output.exists(_.name == "doc_id") =>
            (p, kws, docsPath)
        }
      }
      hit match {
        case Some((pred, kws, docsPath)) =>
          val idxPath = TextIndexCatalog.lookup(docsPath).get
          // postings are distinct per (term, doc_id); a doc matching
          // several OR terms yields several matches, which LeftSemi
          // collapses — no distinct needed
          val probe = spark.read.parquet(idxPath)
            .filter(col("term").isin(kws: _*)).select("doc_id")
            .queryExecution.analyzed
          val docId = child.output.find(_.name == "doc_id").get
          val idxDocId = probe.output.find(_.name == "doc_id").get
          val rest = conjuncts.filterNot(_ eq pred)
          val base = if (rest.isEmpty) child else Filter(rest.reduce(And), child)
          Join(base, probe, LeftSemi,
            Some(EqualTo(docId, idxDocId)), JoinHint.NONE)
        case None => f
      }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL scalar functions (reference O5 — index.py:14,160-161: relative →
  * absolute link normalization via urljoin, guarded by an absolute-URL
  * regex).
  *
  * `resolveUrl` is the engine's one true UDF (java.net.URI-backed); the
  * absolute-URL guard stays a codegen'd regex so most rows never invoke
  * the UDF (the `when` short-circuits per row).
  */
object UrlFunctions {

  /** RFC 3986 resolution of `href` against `base` (java.net.URI). Returns
    * null on unparseable input (reference's try/except skip, O24). */
  val resolveUdf = udf { (base: String, href: String) =>
    if (base == null || href == null) null
    else
      try new java.net.URI(base).resolve(href).toString
      catch { case _: Exception => null }
  }

  private val AbsoluteRe = "^https?://"

  /** Absolute hrefs pass through; relative ones resolve against the page
    * URL (newsspider.py:29-31 / index.py:160-161 semantics). */
  def normalizeUrl(pageUrl: Column, href: Column): Column =
    when(href.rlike(AbsoluteRe), href)
      .otherwise(resolveUdf(pageUrl, href))

  /** Basename of a URL path (reference O16: `URL.split('/')[-1]`). */
  def urlBasename(url: Column): Column =
    element_at(split(url, "/"), -1)
}

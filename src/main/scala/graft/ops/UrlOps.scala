package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL-stage corpus curation — the stage UPSTREAM of document text
  * that a CommonCrawl-style pipeline runs first: URL canonicalization,
  * URL-level exact dedup, and domain blocklist filtering (reference
  * scope: the LLM-pipeline extensions mandated alongside SURVEY §2
  * N1/N2; the reference engine itself starts at the record stream,
  * `PartitionedSimpleConsumerKafkaInputDStream.scala:48-58`).
  *
  * Everything here is a pure per-row string map (canonicalize) or one
  * hash aggregate keyed by the canonical URL / domain — the 100 TB
  * shape: no joins except against a broadcast-size blocklist, no
  * windows, no collect. All string surgery uses engine-portable
  * primitives (split_part / substr / filter / array_join) so the
  * DuckDB oracle replays it verbatim.
  */
object UrlOps {

  /** Tracking query parameters stripped by [[canonicalizeUrl]]:
    * `utm_*` (Google Analytics), `fbclid` (Facebook), `gclid`
    * (Google Ads) — the standard strip set of web-crawl pipelines.
    */
  private def isTracking(p: Column): Column =
    substring(p, 1, 4) === "utm_" ||
      substring(p, 1, 7) === "fbclid=" ||
      substring(p, 1, 6) === "gclid="

  /** Canonicalize a URL string:
    *  - scheme and host lowercased (path/query case is significant
    *    per RFC 3986 and preserved)
    *  - default ports dropped (http:80, https:443)
    *  - fragment dropped
    *  - tracking params (utm_*, fbclid, gclid) removed; other params
    *    keep their original order
    *  - ONE trailing slash stripped from a non-root path
    * Contract: the input looks like `scheme://host[:port][/path]
    * [?query][#frag]`; no userinfo, no '?'/'#' inside the path, no
    * percent-normalization (that needs a charset table — out of
    * scope). Pure codegen-friendly string ops, no UDF.
    */
  /** 1-based position where the authority of `rest` (= the URL after
    * `scheme://`) ends: the FIRST of '/', '?', '#' — RFC 3986 permits
    * a query or fragment directly after the authority with no path
    * (http://h.com?a=1), and splitting at '/' alone would absorb the
    * query into the host (lowercasing it and skipping tracking-param
    * strip). Absent separators sentinel to length+1.
    */
  private def authorityEnd(rest: Column): Column = {
    def cutAt(sep: String): Column =
      when(instr(rest, sep) > 0, instr(rest, sep))
        .otherwise(length(rest) + lit(1))
    least(cutAt("/"), cutAt("?"), cutAt("#"))
  }

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(substring_index(url, "://", 1))
    val rest = substring_index(url, "://", -1)
    val cut = authorityEnd(rest)
    val hostport = substring(rest, lit(1), cut - 1)
    val tail = substring(rest, cut, length(rest))
    val host = lower(substring_index(hostport, ":", 1))
    val port = when(hostport.contains(":"),
      substring_index(hostport, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val noFrag = substring_index(tail, "#", 1)
    val path = substring_index(noFrag, "?", 1)
    val query = when(noFrag.contains("?"),
      substring_index(noFrag, "?", -1)).otherwise(lit(""))
    val cleanQuery = array_join(
      filter(split(query, "&"), p => !isTracking(p) && p =!= ""), "&")
    val cleanPath = when(
      path.endsWith("/") && length(path) > 1,
      substring(path, lit(1), length(path) - 1)).otherwise(path)
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      cleanPath,
      when(cleanQuery =!= "", concat(lit("?"), cleanQuery))
        .otherwise(lit("")))
  }

  /** The (lowercased) host of a URL — the domain-filter key. Shares
    * [[authorityEnd]] so a pathless `http://h.com?a=1` yields `h.com`,
    * not `h.com?a=1`.
    */
  def urlDomain(url: Column): Column = {
    val rest = substring_index(url, "://", -1)
    val hostport = substring(rest, lit(1), authorityEnd(rest) - 1)
    lower(substring_index(hostport, ":", 1))
  }

  /** Deterministic synthetic URL for a (source, id) pair — the
    * fixture has no URL column, so registry rows derive one the same
    * way link_rank derives synthetic edges (`ops/Graph.scala`): messy
    * on purpose (mixed case, default ports, tracking params,
    * fragments, trailing slashes — each keyed off a different residue
    * of the id), with the canonical content keyed off `id % 97` so
    * distinct raw URLs COLLIDE after canonicalization and the dedup
    * stage has real duplicate clusters to find. Replayed verbatim in
    * the DuckDB oracles.
    */
  def syntheticUrl(src: Column, id: Column): Column = {
    val bucket = pmod(id, lit(97L))
    val scheme = when(id % 2 === 0, lit("HTTP")).otherwise(lit("https"))
    val host = concat(
      when(id % 3 === 0, upper(src)).otherwise(src),
      lit(".Example.COM"))
    val port = when(id % 2 === 0, lit(":80")).otherwise(lit(""))
    val path = concat(lit("/crawl/"), bucket.cast(StringType),
      when(id % 5 === 0, lit("/")).otherwise(lit("")))
    val track = when(id % 4 === 0,
        concat(lit("?utm_source=feed&page="), (bucket % 7).cast(StringType)))
      .when(id % 4 === 1,
        concat(lit("?page="), (bucket % 7).cast(StringType),
          lit("&utm_campaign=x")))
      .when(id % 4 === 2, lit("?fbclid=AbC123"))
      .otherwise(lit(""))
    val frag = when(id % 3 === 1, lit("#section-2")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, track, frag)
  }

  /** URL-level exact dedup: one hash aggregate keyed by the canonical
    * URL — the first dedup pass of a crawl pipeline, BEFORE any text
    * is fetched or compared. Keep policy: smallest id (first crawl
    * wins). Output one row per distinct canonical URL with the
    * cluster size; map-side combinable, single shuffle on the URL.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("url"), col(idCol))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Domain blocklist filter with a per-domain keep/drop census — the
    * pipeline-run report ("how much did each blocked domain cost").
    * The blocklist is a literal broadcast set (in production: a
    * broadcast join against a small dimension table); the census is
    * one hash aggregate keyed by (domain, blocked), value-domain
    * bounded by the number of distinct domains.
    */
  def domainFilter(df: DataFrame, urlCol: String, idCol: String,
                   blocklist: Seq[String]): DataFrame = {
    val domain = urlDomain(col(urlCol))
    df.select(domain.as("domain"), col(idCol))
      .withColumn("blocked",
        col("domain").isin(blocklist.map(_.toLowerCase): _*))
      .groupBy(col("domain"), col("blocked"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_id"))
  }
}

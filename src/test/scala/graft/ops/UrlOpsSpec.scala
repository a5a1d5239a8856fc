package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** URL-stage curation semantics the row-hash oracle can't pin down
  * alone: canonicalization rule-by-rule on crafted URLs, dedup keep
  * policy, blocklist census.
  */
class UrlOpsSpec extends SparkSuite {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalizeUrl: case, default ports, tracking params, " +
      "fragments, trailing slash") {
    assert(canon(
      "HTTP://Host.Example.COM:80/Path/?utm_source=x&page=2#frag",
      "https://a.b:443/x",
      "https://a.b:8443/x?fbclid=z",
      "http://a.b/",
      "https://A.B/p?utm_a=1&gclid=2&utm_b=3",
      "http://h.c/p?keep=1&utm_x=2&also=3") === Seq(
      // scheme+host lowered, :80 dropped, utm_ stripped, page kept,
      // fragment dropped, trailing slash stripped
      "http://host.example.com/Path?page=2",
      "https://a.b/x",
      // non-default port survives, fbclid stripped
      "https://a.b:8443/x",
      // root slash is NOT stripped
      "http://a.b/",
      // all params tracking → no '?' at all
      "https://a.b/p",
      // non-tracking params keep their original order
      "http://h.c/p?keep=1&also=3"))
  }

  test("canonicalizeUrl: query or fragment directly after the " +
      "authority (no path) — the r13 ADVICE case") {
    assert(canon(
      "http://H.com?a=1&utm_source=x",
      "HTTPS://h.com#frag",
      "http://h.com:80?page=2",
      "http://h.com") === Seq(
      // query split off the authority: host lowercased WITHOUT the
      // query, tracking param stripped
      "http://h.com?a=1",
      "https://h.com",
      "http://h.com?page=2",
      "http://h.com"))
    // urlDomain shares the split
    import spark.implicits._
    val doms = Seq("http://H.com?a=1", "https://x.Y#f", "http://a.b:8080?q=1")
      .toDF("url").select(UrlOps.urlDomain(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(doms === Seq("h.com", "x.y", "a.b"))
  }

  test("urlDedup: messy variants of one logical URL form a cluster, " +
      "keep = min id") {
    import spark.implicits._
    val df = Seq(
      (10L, "HTTP://A.b:80/x?utm_s=1"),
      (7L, "http://a.B/x#frag"),
      (3L, "http://a.b/x/"),
      (5L, "https://a.b/x")) // different scheme → different URL
      .toDF("doc_id", "url")
    val out = UrlOps.urlDedup(df, "url", "doc_id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size === 2)
    assert(out("http://a.b/x").getAs[Long]("n_docs") === 3L)
    assert(out("http://a.b/x").getAs[Long]("keep_id") === 3L)
    assert(out("https://a.b/x").getAs[Long]("n_docs") === 1L)
  }

  test("domainFilter: census splits blocked and kept domains") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://spam.com/a"),
      (2L, "https://Spam.COM:8080/b"),
      (3L, "http://ok.org/c"))
      .toDF("doc_id", "url")
    val out = UrlOps.domainFilter(df, "url", "doc_id", Seq("Spam.com"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)) -> r).toMap
    assert(out(("spam.com", true)).getAs[Long]("n_docs") === 2L)
    assert(out(("ok.org", false)).getAs[Long]("n_docs") === 1L)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** URL canonicalization contract: each normalization rule pinned on a
  * crafted URL, plus the pass-through and null behavior. */
class UrlOpsSpec extends SparkTestBase {

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .orderBy("id")
      .select(UrlOps.canonicalizeUrl(col("url")))
      .collect().map(r => r.getString(0)).toSeq
  }

  test("host case, www, default ports, tracking params, fragments, slashes") {
    val out = canon(Seq(
      "HTTPS://WWW.Example.COM:443/Article/7/?utm_source=f&id=3#frag",
      "http://example.com:80/a/b",
      "https://example.com:8443/x//y/?fbclid=1&q=2",
      "http://example.com/?utm_campaign=x&utm_medium=y",
      "https://example.com/p?gclid=1&ref_src=t&keep=1&msclkid=2",
      "ftp://Example.com:21/file"))
    assert(out(0) == "https://example.com/Article/7?id=3") // case+www+443+utm+frag+slash
    assert(out(1) == "http://example.com/a/b")             // default port 80 dropped
    assert(out(2) == "https://example.com:8443/x//y?q=2")  // non-default port kept, interior // kept
    assert(out(3) == "http://example.com")                 // query fully consumed
    assert(out(4) == "https://example.com/p?keep=1")       // every tracker family dropped
    assert(out(5) == "ftp://example.com:21/file")          // non-http port untouched
  }

  test("non-URLs pass through unchanged; null stays null") {
    import spark.implicits._
    val out = Seq((1L, "not a url 42"), (2L, null))
      .toDF("id", "url").orderBy("id")
      .select(UrlOps.canonicalizeUrl(col("url")))
      .collect()
    assert(out(0).getString(0) == "not a url 42")
    assert(out(1).isNullAt(0))
  }

  test("scheme/host accessors") {
    import spark.implicits._
    val row = Seq(Tuple1("HTTPS://User.Example.com:8443/p?q=1"))
      .toDF("url")
      .select(UrlOps.urlScheme(col("url")), UrlOps.urlHostPort(col("url")))
      .collect().head
    assert(row.getString(0) == "https")
    assert(row.getString(1) == "user.example.com:8443")
  }

  test("extractLinks pulls hrefs in order; linkHost canonicalizes or nulls relatives") {
    import spark.implicits._
    val html = """<a HREF="HTTPS://WWW.News.Example.com:443/a">n</a>
      |<p>no link</p><a href="/relative/path">r</a>
      |<a href="http://blog.example.com:80/x?q=1">b</a>""".stripMargin
    val links = Seq(Tuple1(html)).toDF("html")
      .select(explode(UrlOps.extractLinks(col("html"))).as("link"))
      .select(col("link"), UrlOps.linkHost(col("link")).as("host"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(links.map(_._1).toSeq == Seq(
      "HTTPS://WWW.News.Example.com:443/a", "/relative/path",
      "http://blog.example.com:80/x?q=1"))
    assert(links.map(_._2).toSeq == Seq(
      Some("news.example.com"), None, Some("blog.example.com")))
    // null html -> no links, null host
    val nul = Seq(Tuple1(null: String)).toDF("html")
      .select(explode_outer(UrlOps.extractLinks(col("html"))))
      .collect()
    assert(nul.length == 1 && nul.head.isNullAt(0))
  }

  test("latestPerUrl keeps the newest capture per canonical URL, ties to min id") {
    import spark.implicits._
    val pages = Seq(
      // three spellings of ONE page, captured at ts 1/5/5
      (1L, 1L, "https://example.com/a?utm_source=x"),
      (2L, 5L, "HTTPS://WWW.Example.com:443/a"),
      (3L, 5L, "https://example.com/a/"),
      // a second page, single capture
      (4L, 2L, "http://other.com/p"),
      // non-URL passes through as its own key
      (5L, 9L, "not a url 5"))
      .toDF("id", "ts", "url")
    val out = UrlOps.latestPerUrl(pages, "id", "url", "ts")
      .orderBy("canonical_url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("http://other.com/p", 2L, 4L, 1L),
      ("https://example.com/a", 5L, 2L, 3L),   // ts-tie 2 vs 3: min id 2
      ("not a url 5", 9L, 5L, 1L)))
  }

  test("latestPerUrl null contract: null urls excluded, all-null-ts pages survive") {
    import spark.implicits._
    val pages = Seq(
      (1L, Some(3L), "https://a.com/x"),
      (2L, None, "https://a.com/x"),        // null ts in a mixed group: counted, can't win
      (3L, None, "https://b.com/y"),        // ALL captures of b.com/y are null-ts
      (4L, None, "https://b.com/y"),
      (5L, Some(7L), null: String))         // null url: no canonical key — excluded
      .toDF("id", "ts", "url")
    val out = UrlOps.latestPerUrl(pages, "id", "url", "ts")
      .orderBy("canonical_url")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("https://a.com/x", 3L, 1L, 2L),  // null-ts row 2 counted in n_snapshots
      ("https://b.com/y", -1L, 3L, 2L)  // all-null-ts: survives with null ts, min id
    ))
  }
}

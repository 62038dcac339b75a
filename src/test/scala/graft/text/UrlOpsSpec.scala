package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalUrl(col("u"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("canonicalUrl: case, default ports, tracking params, fragments") {
    assert(canon(
      "HTTP://Example.COM:80/p?id=1&utm_source=feed#top",
      "https://news.example.co.uk:443/a/B?utm_campaign=x&ref=y",
      "https://Shop.example.com.au:8443/x",
      "http://example.com",
      "http://example.com/?fbclid=abc",
      "not a url") == Seq(
      "http://example.com/p?id=1",          // scheme+host lowered, :80 gone, utm gone, #frag gone
      "https://news.example.co.uk/a/B?ref=y", // leading tracking param drops, next promoted to ?
      "https://shop.example.com.au:8443/x", // NON-default port kept
      "http://example.com/",                // empty path normalized to /
      "http://example.com/",                // query entirely tracking -> no ?
      null))                                // non-URL input -> null, not an echo
  }

  test("canonicalUrl: tracking param in the middle keeps both neighbors") {
    assert(canon("http://h.io/p?a=1&gclid=z&b=2") == Seq("http://h.io/p?a=1&b=2"))
  }

  test("registeredDomain: two-level public suffixes take three labels") {
    val got = Seq(
      "http://news.example.co.uk/x", "https://a.b.example.com/",
      "http://example.com/", "http://localhost/x",
      "https://shop.example.com.au:8443/").toDF("u")
      .select(UrlOps.registeredDomain(col("u"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.co.uk", "example.com", "example.com",
      "localhost", "example.com.au"))
  }
}

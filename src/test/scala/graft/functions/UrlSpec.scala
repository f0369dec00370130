package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization columns: host extraction (userinfo/port/www
  * stripping), the ccTLD-aware registrable-domain heuristic, and the
  * normalized dedup key (default-port drop, fragment drop, empty path). */
class UrlSpec extends SparkSpec {

  private def run(c: org.apache.spark.sql.Column, urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("u").select(c.cast("string")).collect().map(_.getString(0)).toSeq
  }

  test("urlHost strips scheme, userinfo, port, www; non-URLs are empty") {
    assert(run(Text.urlHost(col("u")),
      "HTTPS://User:Pw@WWW.Ex.COM:8443/a?b#c",
      "http://sub.shop.co.uk/x",
      "ftp://Mirror.net",
      "no scheme here",
      "") == Seq("ex.com", "sub.shop.co.uk", "mirror.net", "", ""))
  }

  test("registrableDomain: last two labels, ccTLD second-level kept whole") {
    assert(run(Text.registrableDomain(col("u")),
      "a.b.pages.example.com", "example.com", "single",
      "deep.shop.co.uk", "co.uk", "x.ac.jp", "notcc.co.com") ==
      Seq("example.com", "example.com", "single",
        "shop.co.uk", "co.uk", "x.ac.jp", "co.com"))
  }

  test("normalizeUrl: lowercase key, default ports dropped, fragment dropped, empty path → /") {
    assert(run(Text.normalizeUrl(col("u")),
      "HTTP://WWW.Ex.COM:80/A/B?Q=1#frag",
      "https://Ex.com:443",
      "https://ex.com:8443/p",
      "http://ex.com:443/p", // 443 is NOT http's default: kept
      "junk") == Seq(
      "http://ex.com/a/b?q=1",
      "https://ex.com/",
      "https://ex.com:8443/p",
      "http://ex.com:443/p",
      ""))
  }
}

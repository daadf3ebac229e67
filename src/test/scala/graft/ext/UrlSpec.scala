package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class UrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Url.canonicalize(col("u"))).as[String].collect().toSeq

  test("case, www, default ports, tracking params, order, fragments fold") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/Docs/1/?utm_source=x&b=2&a=1",
      "https://example.com/Docs/1?a=1&b=2&utm_campaign=y#sec",
      "https://example.com/Docs/1/?b=2&a=1&fbclid=abc"
    ).distinct == Seq("https://example.com/Docs/1?a=1&b=2"))
  }

  test("path case preserved, non-default port kept, query-less handling") {
    assert(canon("http://h.example.com:8080/A/B?z=9&y=8#f") ==
      Seq("http://h.example.com:8080/A/B?y=8&z=9"))
    assert(canon("http://www.h.example.com:80/path/") ==
      Seq("http://h.example.com/path"))
    assert(canon("https://h.example.com/") == Seq("https://h.example.com"))
  }

  test("a ? inside the fragment is not a query") {
    assert(canon("http://h.example.com/p#frag?x=1") ==
      Seq("http://h.example.com/p"))
  }

  test("schemeless input canonicalizes to empty; site extracts 2 labels") {
    assert(canon("not a url at all") == Seq(""))
    val sites = Seq("https://a.b.news.example.co/x", "http://example.com")
      .toDF("u").select(Url.site(col("u"))).as[String].collect().toSeq
    assert(sites == Seq("example.co", "example.com"))
  }
}

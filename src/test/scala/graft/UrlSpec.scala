package graft

import graft.text.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization against hand-computed expected forms. */
class UrlSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def norm(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlOps.normalizeUrl(col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("case, www, default port, trailing slash, fragment") {
    assert(norm(
      "HTTP://WWW.Ex1.COM:80/p/5/?id=5#frag",
      "https://ex2.com:443/a/b",
      "https://ex2.com:8443/a/b",       // non-default port survives
      "http://ex3.com",                 // empty path -> "/"
      "http://ex3.com///"               // all slashes -> "/"
    ) == Seq(
      "http://ex1.com/p/5?id=5",
      "https://ex2.com/a/b",
      "https://ex2.com:8443/a/b",
      "http://ex3.com/",
      "http://ex3.com/"))
  }

  test("tracking params dropped, remaining params sorted") {
    assert(norm(
      "http://e.com/x?utm_source=a&b=2&a=1&gclid=z",
      "http://e.com/x?utm_campaign=c&fbclid=f",   // all tracked -> no ?
      "http://e.com/x?id=10&cat=3",
      "http://e.com/x?cat=3&id=10"
    ) == Seq(
      "http://e.com/x?a=1&b=2",
      "http://e.com/x",
      "http://e.com/x?cat=3&id=10",
      "http://e.com/x?cat=3&id=10"))
  }

  test("malformed input yields null, not garbage") {
    assert(norm("not a url", "").forall(_ == null))
  }

  test("urlDedup keeps the smallest id per canonical") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://E.com/x?b=2&a=1"),
      (7L, "HTTP://www.e.com:80/x/?utm_source=s&a=1&b=2"),
      (3L, "https://other.com/y")
    ).toDF("id", "url")
    val got = UrlOps.urlDedup(df, col("id"), col("url"))
      .orderBy("canonical_url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("http://e.com/x?a=1&b=2", 1L, 2L),
      ("https://other.com/y", 3L, 1L)))
  }

  test("syntheticUrl collapses to the page-arithmetic canonical") {
    import spark.implicits._
    val got = spark.range(0, 3000)
      .select(col("id"),
        UrlOps.normalizeUrl(UrlOps.syntheticUrl(col("id"))).as("c"))
      .collect()
    got.foreach { r =>
      val i = r.getLong(0)
      val p = i % 1000
      val scheme = if (p % 2 == 0) "http" else "https"
      val exp = s"$scheme://ex${p % 7}.com/p/$p?cat=${p % 5}&id=$p"
      assert(r.getString(1) == exp, s"id=$i")
    }
  }
}

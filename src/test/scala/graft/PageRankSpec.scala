package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{LinkOps, PageRankOps}

class PageRankSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  /** Dense local power-iteration oracle (same update rule). */
  private def prOracle(n: Int, edges: Seq[(Int, Int, Double)],
                       iters: Int, d: Double): Array[Double] = {
    val wout = new Array[Double](n)
    edges.foreach { case (u, _, w) => wout(u) += w }
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)((1.0 - d) / n)
      val dm = (0 until n).filter(wout(_) == 0.0).map(r).sum
      for (i <- 0 until n) next(i) += d * dm / n
      edges.foreach { case (u, v, w) =>
        next(v) += d * r(u) * w / wout(u)
      }
      r = next
    }
    r
  }

  private def runPr(edges: Seq[(Int, Int, Double)], iters: Int,
                    weighted: Boolean): Map[Long, Double] = {
    import spark.implicits._
    val df = edges.toDF("u", "v", "w")
    val res = PageRankOps.pageRank(df, col("u"), col("v"),
      iterations = iters,
      weight = if (weighted) Some(col("w")) else None)
    val m = res.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.util.Release.free(res)
    m
  }

  test("pageRank matches dense power iteration (unweighted)") {
    // 0 -> 1,2 ; 1 -> 2 ; 2 -> 0 ; 3 -> 2 (classic small graph)
    val e = Seq((0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0),
      (3, 2, 1.0))
    val got = runPr(e, 12, weighted = false)
    val want = prOracle(4, e, 12, 0.85)
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    for ((k, v) <- got) assert(math.abs(v - want(k.toInt)) < 1e-12,
      s"node $k: $v vs ${want(k.toInt)}")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank handles dangling nodes (sink keeps mass balanced)") {
    // 3 is a pure sink; its mass must be redistributed
    val e = Seq((0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0))
    val got = runPr(e, 8, weighted = false)
    val want = prOracle(4, e, 8, 0.85)
    for ((k, v) <- got) assert(math.abs(v - want(k.toInt)) < 1e-12,
      s"node $k: $v vs ${want(k.toInt)}")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank respects edge weights and coalesces multi-edges") {
    // duplicate (0,1) edges must sum; weight skews 0's mass toward 2
    val e = Seq((0, 1, 1.0), (0, 1, 1.0), (0, 2, 6.0), (1, 0, 1.0),
      (2, 0, 1.0))
    val got = runPr(e, 10, weighted = true)
    val want = prOracle(3, Seq((0, 1, 2.0), (0, 2, 6.0), (1, 0, 1.0),
      (2, 0, 1.0)), 10, 0.85)
    for ((k, v) <- got) assert(math.abs(v - want(k.toInt)) < 1e-12,
      s"node $k: $v vs ${want(k.toInt)}")
    assert(got(2L) > got(1L))
  }

  test("extractLinks resolves every rule; hostGraph projects hosts") {
    import spark.implicits._
    val html =
      """<html><body>
        |<a href="#top">skip</a>
        |<a href="mailto:a@b.c">skip</a>
        |<a href="javascript:void(0)">skip</a>
        |<a href="https://other.example.org/x">abs</a>
        |<a href="//proto.example.net/y">pr</a>
        |<a href="/root/z">rootrel</a>
        |<a href='sibling.html'>rel</a>
        |<A HREF="HTTP://CASE.example.com/Q">caps</A>
        |</body></html>""".stripMargin
    val df = Seq(("http://me.example.com/dir/page.html", html))
      .toDF("url", "html")
    val links = df.select(
      LinkOps.extractLinks(col("url"), col("html")).as("l"))
      .head().getSeq[String](0)
    assert(links === Seq(
      "https://other.example.org/x",
      "http://proto.example.net/y",
      "http://me.example.com/root/z",
      "http://me.example.com/dir/sibling.html",
      "HTTP://CASE.example.com/Q"))
    val g = LinkOps.hostGraph(df, col("url"), col("html"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // self-host edges (rootrel, rel) dropped by default
    assert(g === Set(
      ("me.example.com", "other.example.org", 1L),
      ("me.example.com", "proto.example.net", 1L),
      ("me.example.com", "case.example.com", 1L)))
  }

  test("synthetic link fixture matches its closed form") {
    import spark.implicits._
    val df = Seq(123L, 124L, 125L).toDF("id")
      .select(col("id"), LinkOps.syntheticPageUrl(col("id")).as("url"),
        LinkOps.syntheticLinkHtml(col("id")).as("html"))
    val rows = df.select(col("id"),
        size(LinkOps.extractHrefs(col("html"))).as("raw"),
        size(LinkOps.extractLinks(col("url"), col("html"))).as("ok"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    rows.foreach { case (id, raw, ok) =>
      val nk = (id % 3 + 2).toInt
      assert(raw === nk + 5, s"id=$id raw")
      assert(ok === nk + 3, s"id=$id resolved")
    }
  }
}

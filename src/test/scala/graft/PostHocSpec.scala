package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PostHocOps

/** Omnibus / post-hoc family: local-loop parity on randomized (tied)
  * data, plus published anchors (the scipy brunnermunzel docstring
  * vector) and p-value checks against commons-math3 CDFs. */
class PostHocSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  private val rnd = new scala.util.Random(41)
  // 2-decimal values -> deliberate ties, like the events table
  private val xs = Array.fill(240)(math.rint(rnd.nextDouble() * 2000) / 100.0)

  test("jarqueBera matches the two-pass moment loop and chi2 p") {
    val df = xs.toSeq.map((_, "g")).toDF("x", "g")
    val r = one(PostHocOps.jarqueBera(df, col("x"), Seq("g"))
      .select("skewness", "ex_kurtosis", "statistic", "pvalue"))
    val n = xs.length
    val mu = xs.sum / n
    def m(k: Int) = xs.map(v => math.pow(v - mu, k)).sum / n
    val skew = m(3) / math.pow(m(2), 1.5)
    val exk = m(4) / (m(2) * m(2)) - 3.0
    val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    assert(math.abs(r.getDouble(0) - skew) < 1e-9)
    assert(math.abs(r.getDouble(1) - exk) < 1e-9)
    assert(math.abs(r.getDouble(2) - jb) < 1e-9)
    val p = 1.0 - new org.apache.commons.math3.distribution
      .ChiSquaredDistribution(2.0).cumulativeProbability(jb)
    assert(math.abs(r.getDouble(3) - p) < 1e-9)
  }

  test("brunnerMunzel reproduces the scipy docstring vector") {
    val x1 = Seq(1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1)
    val x2 = Seq(3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4)
    val df = (x1.map(v => (v.toDouble, 1)) ++ x2.map(v => (v.toDouble, 0)))
      .toDF("x", "s")
    val r = one(PostHocOps.brunnerMunzel(df, col("x"), col("s") === 1,
      Nil).select("statistic", "pvalue", "n1", "n2"))
    assert(r.getLong(2) == 14 && r.getLong(3) == 11)
    assert(math.abs(r.getDouble(0) - 3.1374674823029505) < 1e-9,
      s"W ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 0.0057862086661515377) < 1e-9,
      s"p ${r.getDouble(1)}")
  }

  test("tukeyHsd matches the local pooled-MSE pairwise loop") {
    val levels = Array("a", "b", "c")
    val data = Array.tabulate(300) { i =>
      val l = levels(i % 3)
      (l, 10.0 + (i % 3) * 2.0 + rnd.nextGaussian() * 3.0)
    }
    val df = data.toSeq.toDF("f", "x")
    val rows = PostHocOps.tukeyHsd(df, col("x"), col("f"))
      .orderBy("level_a", "level_b").collect()
    val byL = data.groupBy(_._1).map { case (l, vs) =>
      l -> (vs.map(_._2).sum / vs.length, vs.length) }
    val k = 3; val n = data.length
    val sse = data.map { case (l, v) =>
      math.pow(v - byL(l)._1, 2) }.sum
    val mse = sse / (n - k)
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    for ((row, (la, lb)) <- rows.zip(pairs)) {
      val (ma, na) = byL(la); val (mb, nb) = byL(lb)
      val se = math.sqrt(mse / 2 * (1.0 / na + 1.0 / nb))
      assert(row.getString(0) == la && row.getString(1) == lb)
      assert(math.abs(row.getDouble(4) - (mb - ma)) < 1e-9)
      assert(math.abs(row.getDouble(5) - se) < 1e-9)
      assert(math.abs(row.getDouble(6) - math.abs(mb - ma) / se) < 1e-9)
    }
    // planted separation: a vs c is the largest q
    assert(rows(1).getDouble(6) > rows(0).getDouble(6))
  }

  test("friedman matches the local tie-corrected rank loop") {
    // 40 blocks x 4 treatments with a planted treatment effect + ties
    val k = 4; val nb = 40
    val cells = for (b <- 0 until nb; t <- 0 until k)
      yield (b, s"t$t", math.rint((t * 0.8 + rnd.nextDouble() * 4) * 10) / 10)
    val df = cells.toDF("b", "t", "x")
    val r = one(PostHocOps.friedman(df, col("x"), col("b"), col("t"))
      .select("n_blocks", "k", "statistic", "pvalue"))
    // local replay
    def ranks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      vs.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        (lo + hi) / 2.0
      }
    }
    val byBlock = cells.groupBy(_._1).values.toSeq
    val rankRows = byBlock.map { cs =>
      val sortedC = cs.sortBy(_._2)
      sortedC.map(_._2).zip(ranks(sortedC.map(_._3)))
    }
    val rj = rankRows.flatten.groupBy(_._1).map { case (_, rs) =>
      rs.map(_._2).sum }
    val ssbn = rj.map(v => v * v).sum
    val ties = byBlock.map { cs =>
      cs.groupBy(_._3).values.map { g =>
        math.pow(g.size, 3) - g.size }.sum
    }.sum
    val chisq = 12.0 / (nb * k * (k + 1)) * ssbn - 3.0 * nb * (k + 1)
    val c = 1.0 - ties / (nb.toDouble * k * (k * k - 1))
    val stat = chisq / c
    assert(r.getLong(0) == nb && r.getLong(1) == k)
    assert(math.abs(r.getDouble(2) - stat) < 1e-9,
      s"${r.getDouble(2)} vs $stat")
    assert(r.getDouble(3) < 0.01, "planted treatment effect must show")
  }

  test("friedman drops incomplete blocks") {
    val cells = (for (b <- 0 until 10; t <- 0 until 3)
      yield (b, s"t$t", rnd.nextDouble())) :+ ((99, "t0", 0.5))
    val df = cells.toDF("b", "t", "x")
    val r = one(PostHocOps.friedman(df, col("x"), col("b"), col("t"))
      .select("n_blocks"))
    assert(r.getLong(0) == 10)
  }

  test("cochranQ matches the closed form on a planted design") {
    val k = 3; val nb = 30
    val cells = for (b <- 0 until nb; t <- 0 until k)
      yield (b, s"t$t", rnd.nextDouble() < 0.2 + 0.25 * t)
    val df = cells.toDF("b", "t", "s")
    val r = one(PostHocOps.cochranQ(df, col("s"), col("b"), col("t"))
      .select("statistic", "df", "pvalue"))
    val g = (0 until k).map(t => cells.filter(_._2 == s"t$t")
      .count(_._3).toDouble)
    val l = (0 until nb).map(b => cells.filter(_._1 == b)
      .count(_._3).toDouble)
    val tt = g.sum
    val q = k * (k - 1) * (g.map(v => v * v).sum - tt * tt / k) /
      (k * tt - l.map(v => v * v).sum)
    assert(math.abs(r.getDouble(0) - q) < 1e-9)
    assert(r.getDouble(1) == 2.0)
    val p = 1.0 - new org.apache.commons.math3.distribution
      .ChiSquaredDistribution(2.0).cumulativeProbability(q)
    assert(math.abs(r.getDouble(2) - p) < 1e-9)
  }

  test("bartlett matches the local closed form and detects unequal " +
      "variances") {
    val k = 4
    val data = (0 until k).flatMap { j =>
      Array.fill(80 + 10 * j)(("l" + j,
        rnd.nextGaussian() * (1.0 + j), "g"))
    }
    val df = data.toDF("f", "x", "g")
    val r = one(PostHocOps.bartlett(df, col("x"), col("f"), Nil)
      .select("statistic", "df", "pvalue", "n", "k"))
    val byL = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def varS(a: Seq[Double]) = {
      val m = a.sum / a.length
      a.map(v => (v - m) * (v - m)).sum / (a.length - 1)
    }
    val nT = data.length.toDouble
    val ssw = byL.values.map(v => (v.length - 1) * varS(v.toSeq)).sum
    val sl = byL.values.map(v => (v.length - 1) *
      math.log(varS(v.toSeq))).sum
    val si = byL.values.map(v => 1.0 / (v.length - 1)).sum
    val c = 1.0 + (si - 1.0 / (nT - k)) / (3.0 * (k - 1))
    val stat = ((nT - k) * math.log(ssw / (nT - k)) - sl) / c
    assert(r.getLong(3) == data.length && r.getLong(4) == k)
    assert(math.abs(r.getDouble(0) - stat) < 1e-8)
    assert(r.getDouble(2) < 1e-6, "planted heteroscedasticity")
  }

  test("icc1: rater agreement raises ICC toward 1; noise drops it " +
      "toward 0; local closed-form parity") {
    // 40 targets x 5 replicates, strong target effect
    val strong = (0 until 40).flatMap { t =>
      val mu = rnd.nextGaussian() * 5
      Array.fill(5)((t.toLong, mu + rnd.nextGaussian() * 0.3, "g"))
    }
    val rs = one(PostHocOps.icc1(strong.toDF("t", "x", "g"), col("x"),
      col("t"), Nil).select("icc1", "msb", "msw", "n", "k_targets"))
    assert(rs.getDouble(0) > 0.9, s"strong ICC ${rs.getDouble(0)}")
    assert(rs.getLong(3) == 200 && rs.getLong(4) == 40)
    // local closed form (balanced: k0 = group size)
    val byT = strong.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = 200.0; val k = 40.0
    val gs = strong.map(_._2).sum
    val sb = byT.values.map(v => math.pow(v.sum, 2) / v.length).sum
    val gss = strong.map(v => v._2 * v._2).sum
    val msb = (sb - gs * gs / n) / (k - 1)
    val msw = (gss - sb) / (n - k)
    val k0 = (n - byT.values.map(v => math.pow(v.length, 2)).sum / n) /
      (k - 1)
    val icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert(math.abs(rs.getDouble(0) - icc) < 1e-9)
    val noise = (0 until 40).flatMap { t =>
      Array.fill(5)((t.toLong, rnd.nextGaussian(), "g"))
    }
    val rn = one(PostHocOps.icc1(noise.toDF("t", "x", "g"), col("x"),
      col("t"), Nil).select("icc1"))
    assert(math.abs(rn.getDouble(0)) < 0.25, s"noise ICC ${rn.getDouble(0)}")
  }

  test("grubbs finds a planted outlier with the exact t-mapped p") {
    val data = (Array.fill(120)(rnd.nextGaussian()) :+ 9.0).zipWithIndex
      .map { case (v, i) => (v, "g") }
    val df = data.toSeq.toDF("x", "g")
    val r = one(PostHocOps.grubbs(df, col("x"), Nil)
      .select("g_stat", "outlier_value", "pvalue", "n"))
    assert(r.getDouble(1) == 9.0)
    val xs = data.map(_._1)
    val n = xs.length
    val mu = xs.sum / n
    val sd = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
    val g = xs.map(v => math.abs(v - mu) / sd).max
    assert(math.abs(r.getDouble(0) - g) < 1e-9)
    val t2 = n * (n - 2.0) * g * g / ((n - 1.0) * (n - 1.0) - n * g * g)
    val tDist = new org.apache.commons.math3.distribution
      .TDistribution(n - 2.0)
    val p = math.min(1.0,
      n * (1.0 - tDist.cumulativeProbability(math.sqrt(t2))))
    assert(math.abs(r.getDouble(2) - p) < 1e-9)
    assert(p < 0.01, "planted 9-sigma-ish outlier must be significant")
  }

  test("dunn matches the local tie-corrected rank loop") {
    val levels = Array("a", "b", "c")
    val data = Array.tabulate(210) { i =>
      (levels(i % 3), math.rint((i % 3 + rnd.nextDouble() * 5) * 10) / 10)
    }
    val df = data.toSeq.toDF("f", "x")
    val rows = PostHocOps.dunn(df, col("x"), col("f"))
      .orderBy("level_a", "level_b").collect()
    // local pooled midranks
    val vs = data.map(_._2)
    val sorted = vs.sorted
    def rk(v: Double) =
      (sorted.indexOf(v) + 1 + sorted.lastIndexOf(v) + 1) / 2.0
    val nT = vs.length.toDouble
    val ties = vs.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val rb = data.groupBy(_._1).map { case (l, g) =>
      l -> (g.map(p => rk(p._2)).sum / g.length, g.length.toDouble) }
    for ((row, (la, lb)) <- rows.zip(
        Seq(("a", "b"), ("a", "c"), ("b", "c")))) {
      val (ra, na) = rb(la); val (rbv, nbv) = rb(lb)
      val sig2 = (nT * (nT + 1) / 12 - ties / (12 * (nT - 1))) *
        (1 / na + 1 / nbv)
      val z = (ra - rbv) / math.sqrt(sig2)
      assert(math.abs(row.getDouble(2) - ra) < 1e-9)
      assert(math.abs(row.getDouble(3) - rbv) < 1e-9)
      assert(math.abs(row.getDouble(4) - z) < 1e-9)
      val p = 2.0 * (1.0 - new org.apache.commons.math3.distribution
        .NormalDistribution(0, 1).cumulativeProbability(math.abs(z)))
      assert(math.abs(row.getDouble(5) - p) < 1e-9)
    }
  }
}

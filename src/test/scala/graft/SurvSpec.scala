package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SurvOps

/** Cox PH: the fixed-Newton fit must recover a planted log-hazard
  * ratio on exponential survival data, agree with a hand-rolled
  * Breslow partial-likelihood Newton, and the distributed path must
  * match the driver fast path. */
class SurvSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(61)
  // exponential event times with hazard ratio e^1 for x=1 vs x=0,
  // ~25% random censoring
  private val beta0 = 1.0
  private val data = Array.tabulate(600) { i =>
    val x = i % 2
    val t = -math.log(rnd.nextDouble()) / math.exp(beta0 * x)
    val event = if (rnd.nextDouble() < 0.25) 0 else 1
    (math.rint(t * 1000) / 1000.0, event, x.toDouble, "g")
  }
  private lazy val df = data.toSeq.toDF("t", "e", "x", "g")

  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  /** Hand-rolled Breslow Newton with the same fixed-iteration
    * contract (tie blocks share the risk set). */
  private def localFit(iters: Int): (Double, Double) = {
    val sorted = data.sortBy(-_._1)
    val n = sorted.length
    def pass(b: Double): (Double, Double) = {
      var u = 0.0; var inf = 0.0
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) {
        var j = i
        while (j < n && sorted(j)._1 == sorted(i)._1) {
          val e = math.exp(b * sorted(j)._3)
          s0 += e; s1 += sorted(j)._3 * e
          s2 += sorted(j)._3 * sorted(j)._3 * e
          j += 1
        }
        var k = i
        while (k < j) {
          if (sorted(k)._2 == 1) {
            val r1 = s1 / s0
            u += sorted(k)._3 - r1
            inf += s2 / s0 - r1 * r1
          }
          k += 1
        }
        i = j
      }
      (u, inf)
    }
    var b = 0.0
    for (_ <- 1 to iters) { val (u, inf) = pass(b); b += u / inf }
    (b, 1.0 / math.sqrt(pass(b)._2))
  }

  test("coxPh matches the local Breslow Newton and recovers beta") {
    val r = one(SurvOps.coxPh(df, col("t"), col("e") === 1, col("x"),
      Seq("g"), maxIter = 4)
      .select("beta", "se", "hazard_ratio", "n", "n_events"))
    val (b, se) = localFit(4)
    assert(math.abs(r.getDouble(0) - b) < 1e-9,
      s"beta ${r.getDouble(0)} vs $b")
    assert(math.abs(r.getDouble(1) - se) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.exp(b)) < 1e-9)
    assert(r.getLong(3) == 600)
    // planted effect: beta within ~3 se of the true log hazard ratio
    assert(math.abs(b - beta0) < 3 * se + 0.05,
      s"beta $b should recover $beta0 (se $se)")
  }

  test("3 Newton steps from 0 are already at float convergence") {
    val (b3, _) = localFit(3)
    val (b6, _) = localFit(6)
    assert(math.abs(b3 - b6) < 1e-6, s"$b3 vs $b6")
  }

  test("distributed path matches the driver fast path") {
    val loc = one(SurvOps.coxPh(df, col("t"), col("e") === 1, col("x"),
      Seq("g"), maxIter = 3).select("beta", "se"))
    System.setProperty("graft.maxLocalIrls", "1")
    try {
      val dist = one(SurvOps.coxPh(df, col("t"), col("e") === 1,
        col("x"), Seq("g"), maxIter = 3).select("beta", "se"))
      assert(math.abs(loc.getDouble(0) - dist.getDouble(0)) < 1e-8)
      assert(math.abs(loc.getDouble(1) - dist.getDouble(1)) < 1e-8)
    } finally System.clearProperty("graft.maxLocalIrls")
  }

  test("cIndex matches the brute-force pair count with time and risk " +
      "ties") {
    // 2-decimal times and quantized risks -> plenty of ties
    val rows = Array.fill(400)((
      math.rint(rnd.nextDouble() * 100) / 10.0,
      rnd.nextDouble() < 0.7,
      (rnd.nextInt(20)) / 20.0, "g"))
    val df2 = rows.toSeq.toDF("t", "e", "r", "g")
    val got = one(df2.groupBy("g")
      .agg(graft.agg.ConcordanceAgg.cIndex(col("t"), col("e"),
        col("r")).as("ci"))
      .select(col("ci._1"), col("ci._2")))
    var num = 0.0; var pairs = 0L
    for (a <- rows; b <- rows) {
      if (a._1 < b._1 && a._2) { // equal times not usable
        pairs += 1
        if (a._3 > b._3) num += 1.0
        else if (a._3 == b._3) num += 0.5
      }
    }
    assert(got.getLong(1) == pairs, s"${got.getLong(1)} vs $pairs")
    assert(math.abs(got.getDouble(0) - num / pairs) < 1e-12)
  }

  test("cIndex anchors: perfect predictor = 1, anti-predictor = 0") {
    val rows = (0 until 100).map(i =>
      (i.toDouble, true, 100.0 - i, "g"))
    val perfect = one(rows.toDF("t", "e", "r", "g").groupBy("g")
      .agg(graft.agg.ConcordanceAgg.cIndex(col("t"), col("e"),
        col("r")).as("ci")).select(col("ci._1"))).getDouble(0)
    assert(perfect == 1.0)
    val anti = one(rows.map(r => (r._1, r._2, -r._3, r._4))
      .toDF("t", "e", "r", "g").groupBy("g")
      .agg(graft.agg.ConcordanceAgg.cIndex(col("t"), col("e"),
        col("r")).as("ci")).select(col("ci._1"))).getDouble(0)
    assert(anti == 0.0)
  }

  test("cIndex of the Cox linear predictor beats random") {
    val withRisk = data.toSeq.toDF("t", "e", "x", "g")
    val ci = one(withRisk.groupBy("g")
      .agg(graft.agg.ConcordanceAgg.cIndex(col("t"), col("e") === 1,
        col("x")).as("ci")).select(col("ci._1"))).getDouble(0)
    assert(ci > 0.6, s"planted-hazard C $ci should be well above 0.5")
  }

  test("zero covariate effect gives beta ~ 0 and hazard_ratio ~ 1") {
    val flat = data.map { case (t, e, _, g) =>
      (t, e, rnd.nextDouble(), g) }.toSeq.toDF("t", "e", "x", "g")
    val r = one(SurvOps.coxPh(flat, col("t"), col("e") === 1, col("x"),
      Seq("g"), maxIter = 3).select("beta", "se"))
    assert(math.abs(r.getDouble(0)) < 3 * r.getDouble(1) + 0.05)
  }
}

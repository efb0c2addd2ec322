package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.agg.LinRegAgg
import graft.linear.{GLM, Solvers}

/** Driver-contract queries for SURVEY §2.9 second wave: elastic net
  * (coordinate descent on the Gram matrix), NNLS, rcond-SVD minimum-
  * norm solve, GLM IRLS, and per-row lin-reg predictions.
  *
  * Oracle strategies: elastic net with l1=0 has the ridge closed form
  * (penalized features only); NNLS on a deterministic target has a
  * provably stable active set → reduced-OLS closed form; the rcond
  * query uses an exactly collinear duplicated feature whose minimum-
  * norm solution splits the coefficient ∝ (1,2)/5; GLM targets are
  * exact inverse-link transforms of the linear predictor, making the
  * literal coefficients the MLE. Lasso (l1>0) has no closed form →
  * KKT-verified in LinearSpec2 instead. */
object LinearQueries2 extends QueryPack {

  /** Per-group Gram sums → driver-side solver → result rows. One
    * aggregate pass; one output row per group. */
  private def perGroupGram(df: DataFrame, group: String, d: Int,
                           feats: Seq[org.apache.spark.sql.Column],
                           y: org.apache.spark.sql.Column)
      : Seq[(String, Array[Array[Double]], Array[Double], Double)] = {
    val aggs =
      (for (i <- 0 until d; j <- i until d) yield
        sum(feats(i) * feats(j)).as(s"g_${i}_$j")) ++
      (0 until d).map(i => sum(feats(i) * y).as(s"b_$i")) :+
      count(lit(1)).cast("double").as("n")
    df.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.map { r =>
        val xtx = Array.ofDim[Double](d, d)
        var idx = 1
        for (i <- 0 until d; j <- i until d) {
          xtx(i)(j) = r.getDouble(idx); xtx(j)(i) = xtx(i)(j); idx += 1
        }
        val xty = Array.tabulate(d)(i => r.getDouble(idx + i))
        (r.getString(0), xtx, xty, r.getDouble(idx + d))
      }
  }

  /** HALF_UP rounding, matching Spark's round() and DuckDB's ROUND. */
  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def resultDf(s: SparkSession, group: String,
                       rows: Seq[Row], fields: Seq[String]): DataFrame =
    s.createDataFrame(
      s.sparkContext.parallelize(rows),
      StructType(StructField(group, StringType) +:
        fields.map(f => StructField(f, DoubleType))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_elastic_net" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val feats = Seq(col("l_quantity"), col("l_discount"), lit(1.0))
      val sols = perGroupGram(li, "l_returnflag", 3, feats,
        col("l_extendedprice"))
        .map { case (g, xtx, xty, _) =>
          val b = Solvers.elasticNet(xtx, xty, l1 = 0.0, l2 = 5.0,
            penalize = j => j < 2, maxIter = 100000, tol = 1e-13)
          Row(g, rnd(b(0), 6), rnd(b(1), 4), rnd(b(2), 4))
        }
      resultDf(s, "l_returnflag", sols, Seq("b_qty", "b_disc", "b0"))
        .orderBy("l_returnflag")
    }),
    "q_nnls" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("y",
          col("l_quantity") * 100.0 - col("l_discount") * 2000.0 + 500.0)
      val feats = Seq(col("l_quantity"), col("l_discount"), lit(1.0))
      val sols = perGroupGram(li, "l_returnflag", 3, feats, col("y"))
        .map { case (g, xtx, xty, _) =>
          val b = Solvers.nnls(xtx, xty)
          Row(g, rnd(b(0), 6), rnd(b(1), 6), rnd(b(2), 4))
        }
      resultDf(s, "l_returnflag", sols, Seq("b_qty", "b_disc", "b0"))
        .orderBy("l_returnflag")
    }),
    "q_lr_rcond" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val feats = Seq(col("l_quantity"), col("l_quantity") * 2.0,
        col("l_discount"), lit(1.0))
      val sols = perGroupGram(li, "l_returnflag", 4, feats,
        col("l_extendedprice"))
        .map { case (g, xtx, xty, _) =>
          val (b, _) = Solvers.svdRcond(xtx, xty, 1e-6)
          Row(g, rnd(b(0), 6), rnd(b(1), 6), rnd(b(2), 4), rnd(b(3), 4))
        }
      resultDf(s, "l_returnflag", sols,
        Seq("b_q1", "b_q2", "b_disc", "b0"))
        .orderBy("l_returnflag")
    }),
    "q_glm" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("y_pois",
          exp(col("l_quantity") * 0.02 - col("l_discount") * 0.8 + 0.3))
        .withColumn("y_bin",
          lit(1.0) / (lit(1.0) +
            exp(-(col("l_quantity") * 0.05 - col("l_discount") * 2.0
              + 0.1))))
      // The two family fits are independent IRLS loops of small
      // sequential Spark jobs; running them from separate threads lets
      // the scheduler interleave the per-iteration Gram aggregates
      // (roughly halving wall-clock here, and overlapping cluster
      // utilization at scale).
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fp = Future(new GLM("poisson")
        .fit(li, Seq(col("l_quantity"), col("l_discount")), col("y_pois")))
      val fb = Future(new GLM("binomial")
        .fit(li, Seq(col("l_quantity"), col("l_discount")), col("y_bin")))
      val pois = Await.result(fp, Duration.Inf)
      val bin = Await.result(fb, Duration.Inf)
      val r = Row(
        rnd(pois.coeffs(0), 6), rnd(pois.coeffs(1), 6),
        rnd(pois.coeffs(2), 6), rnd(bin.coeffs(0), 6),
        rnd(bin.coeffs(1), 6), rnd(bin.coeffs(2), 6))
      s.createDataFrame(s.sparkContext.parallelize(Seq(r)),
        StructType(Seq("p_qty", "p_disc", "p0", "bl_qty", "bl_disc", "bl0")
          .map(f => StructField(f, DoubleType))))
    }),
    "q_rolling_lr2" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("x2", (col("event_id") % 997) / 10.0)
        .withColumn("yy", col("value") + col("x2") * 2.0 + 5.0)
      // exercises the general-d windowed-Gram rolling path (d=2
      // instance) so the DuckDB Cramer oracle gates it; the Column-
      // algebra twin rollingLinReg2 stays spec-covered
      graft.ops.LinRegOps.rollingLinReg(ev, Seq(col("value"), col("x2")),
          col("yy"), col("event_id"), Seq("event_type"), 8)
        .filter(col("coeffs").isNotNull)
        .select(col("event_type"),
          element_at(col("coeffs"), 1).as("b1"),
          element_at(col("coeffs"), 2).as("b2"),
          element_at(col("coeffs"), 3).as("b0"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("b1")), 6).as("avg_b1"),
          round(avg(col("b2")), 6).as("avg_b2"),
          round(avg(col("b0")), 4).as("avg_b0"),
          count(lit(1)).as("n_windows"))
        .orderBy("event_type")
    }),
    "q_recursive_lr2" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("x2", (col("event_id") % 997) / 10.0)
        .withColumn("yy", col("value") + col("x2") * 2.0 + 5.0)
      graft.ops.LinRegOps.recursiveLinReg2(ev, col("value"), col("x2"),
          col("yy"), col("event_id"), Seq("event_type"))
        .filter(col("rec_n") >= 10.0)
        .groupBy(col("event_type"))
        .agg(round(avg(col("rec_b1")), 6).as("avg_b1"),
          round(avg(col("rec_b2")), 6).as("avg_b2"),
          round(avg(col("rec_b0")), 4).as("avg_b0"))
        .orderBy("event_type")
    }),
    // HC0-HC3 robust standard errors, d=1+bias per group so the oracle
    // can spell the sandwich in closed form (A⁻¹MA⁻¹ entry 0,0 =
    // (n²M₀₀ − 2n·sx·M₀₁ + sx²M₁₁)/det²)
    "q_hc_se" -> ((s, dir) => {
      graft.ops.LinRegOps.hcReport(t(s, dir, "lineitem"),
          Seq(col("l_quantity")), col("l_extendedprice"),
          Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(element_at(col("coeffs"), 1), 6).as("b1"),
          round(element_at(col("se"), 1), 6).as("se1"),
          round(element_at(col("hc0_se"), 1), 6).as("hc0"),
          round(element_at(col("hc1_se"), 1), 6).as("hc1"),
          round(element_at(col("hc2_se"), 1), 6).as("hc2"),
          round(element_at(col("hc3_se"), 1), 6).as("hc3"))
        .orderBy("l_returnflag")
    }),
    // shared-Gram multi-target fit: target_0 is gated by the Cramer
    // oracle; target_1 is an exact linear function of the features, so
    // its coefficients are literally (3, -7, 2) — same closed-form
    // device as q_glm
    "q_multi_target" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("y2",
        col("l_quantity") * 3.0 - col("l_discount") * 7.0 + 2.0)
      graft.ops.LinRegOps.linRegMultiTarget(li,
          Seq(col("l_quantity"), col("l_discount")),
          Seq(col("l_extendedprice"), col("y2")), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(element_at(col("target_0"), 1), 6).as("b1_t0"),
          round(element_at(col("target_0"), 2), 4).as("b2_t0"),
          round(element_at(col("target_0"), 3), 4).as("b0_t0"),
          round(element_at(col("target_1"), 1), 6).as("b1_t1"),
          round(element_at(col("target_1"), 2), 6).as("b2_t1"),
          round(element_at(col("target_1"), 3), 6).as("b0_t1"))
        .orderBy("l_returnflag")
    }),
    "q_lin_reg_pred" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val coeffs = li.groupBy(col("l_returnflag"))
        .agg(LinRegAgg.linReg(
          array(col("l_quantity"), col("l_discount"), lit(1.0)),
          col("l_extendedprice"), 3).as("r"))
        .select(col("l_returnflag"),
          element_at(col("r.coeffs"), 1).as("b1"),
          element_at(col("r.coeffs"), 2).as("b2"),
          element_at(col("r.coeffs"), 3).as("b0"))
      li.join(broadcast(coeffs), "l_returnflag")
        .withColumn("pred",
          col("b1") * col("l_quantity") + col("b2") * col("l_discount")
            + col("b0"))
        .withColumn("resid", col("l_extendedprice") - col("pred"))
        .groupBy(col("l_returnflag"))
        .agg(round(avg(abs(col("resid"))), 4).as("avg_abs_resid"),
          round(avg(col("pred")), 4).as("avg_pred"))
        .orderBy("l_returnflag")
    })
  )

  private val gram3 =
    """SELECT l_returnflag, COUNT(*)::DOUBLE n,
      |  SUM(l_quantity * l_quantity) s11,
      |  SUM(l_quantity * l_discount) s12, SUM(l_quantity) s1,
      |  SUM(l_discount * l_discount) s22, SUM(l_discount) s2,
      |  SUM(y) sy, SUM(l_quantity * y) s1y, SUM(l_discount * y) s2y
      |FROM li GROUP BY 1""".stripMargin

  /** Cramer solve of [[s11+r1,s12,s1],[s12,s22+r2,s2],[s1,s2,n]]β =
    * [s1y,s2y,sy] shared by the ridge/pred oracles. */
  private def cramer3(r1: String, r2: String) =
    s"""d AS (
       |  SELECT *,
       |    (s11 + $r1) * ((s22 + $r2) * n - s2 * s2)
       |      - s12 * (s12 * n - s2 * s1)
       |      + s1 * (s12 * s2 - (s22 + $r2) * s1) AS det
       |  FROM s),
       |b AS (
       |  SELECT *,
       |    (s1y * ((s22 + $r2) * n - s2 * s2) - s12 * (s2y * n - s2 * sy)
       |      + s1 * (s2y * s2 - (s22 + $r2) * sy)) / det AS b1,
       |    ((s11 + $r1) * (s2y * n - sy * s2) - s1y * (s12 * n - s2 * s1)
       |      + s1 * (s12 * sy - s2y * s1)) / det AS b2,
       |    ((s11 + $r1) * ((s22 + $r2) * sy - s2y * s2)
       |      - s12 * (s12 * sy - s2y * s1)
       |      + s1y * (s12 * s2 - (s22 + $r2) * s1)) / det AS b0
       |  FROM d)""".stripMargin

  /** Shared windowed-Cramer oracle for the rolling/recursive queries —
    * the same normal-equation expressions the Spark Column algebra
    * evaluates per row. */
  private def rollRecOracle(frame: String, cond: String,
                            sel: String): String =
    s"""WITH ev AS (
       |  SELECT event_type, event_id, value x1,
       |    (event_id % 997) / 10.0 x2,
       |    value + (event_id % 997) / 10.0 * 2.0 + 5.0 y
       |  FROM events),
       |s AS (
       |  SELECT event_type,
       |    COUNT(*) OVER w::DOUBLE n,
       |    SUM(x1 * x1) OVER w s11, SUM(x1 * x2) OVER w s12,
       |    SUM(x2 * x2) OVER w s22, SUM(x1) OVER w s1,
       |    SUM(x2) OVER w s2, SUM(y) OVER w sy,
       |    SUM(x1 * y) OVER w s1y, SUM(x2 * y) OVER w s2y
       |  FROM ev
       |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
       |    $frame)),
       |b AS (
       |  SELECT event_type, n,
       |    (s1y * (s22 * n - s2 * s2) - s12 * (s2y * n - s2 * sy)
       |      + s1 * (s2y * s2 - s22 * sy))
       |      / (s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1)
       |        + s1 * (s12 * s2 - s22 * s1)) b1,
       |    (s11 * (s2y * n - sy * s2) - s1y * (s12 * n - s2 * s1)
       |      + s1 * (s12 * sy - s2y * s1))
       |      / (s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1)
       |        + s1 * (s12 * s2 - s22 * s1)) b2,
       |    (s11 * (s22 * sy - s2y * s2) - s12 * (s12 * sy - s2y * s1)
       |      + s1y * (s12 * s2 - s22 * s1))
       |      / (s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1)
       |        + s1 * (s12 * s2 - s22 * s1)) b0
       |  FROM s)
       |SELECT event_type, $sel
       |FROM b WHERE $cond GROUP BY 1 ORDER BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_elastic_net" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_quantity, l_discount,
         |    l_extendedprice y FROM lineitem),
         |s AS ($gram3),
         |${cramer3("5.0", "5.0")}
         |SELECT l_returnflag, ROUND(b1, 6) AS b_qty,
         |  ROUND(b2, 4) AS b_disc, ROUND(b0, 4) AS b0
         |FROM b ORDER BY 1""".stripMargin,
    "q_nnls" ->
      """WITH li AS (
        |  SELECT l_returnflag, l_quantity q,
        |    100 * l_quantity - 2000 * l_discount + 500 y FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, COUNT(*)::DOUBLE n, SUM(q * q) sqq,
        |    SUM(q) sq, SUM(y) sy, SUM(q * y) sqy
        |  FROM li GROUP BY 1)
        |SELECT l_returnflag,
        |  ROUND((sqy * n - sq * sy) / (sqq * n - sq * sq), 6) AS b_qty,
        |  0.0 AS b_disc,
        |  ROUND((sy - (sqy * n - sq * sy) / (sqq * n - sq * sq) * sq)
        |    / n, 4) AS b0
        |FROM s ORDER BY 1""".stripMargin,
    "q_lr_rcond" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_quantity, l_discount,
         |    l_extendedprice y FROM lineitem),
         |s AS ($gram3),
         |${cramer3("0.0", "0.0")}
         |SELECT l_returnflag,
         |  ROUND(b1 / 5.0, 6) AS b_q1,
         |  ROUND(b1 * 2.0 / 5.0, 6) AS b_q2,
         |  ROUND(b2, 4) AS b_disc, ROUND(b0, 4) AS b0
         |FROM b ORDER BY 1""".stripMargin,
    "q_glm" ->
      """SELECT 0.02 AS p_qty, -0.8 AS p_disc, 0.3 AS p0,
        |  0.05 AS bl_qty, -2.0 AS bl_disc, 0.1 AS bl0""".stripMargin,
    "q_rolling_lr2" -> rollRecOracle(
      "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW", "n = 8",
      """ROUND(AVG(b1), 6) AS avg_b1, ROUND(AVG(b2), 6) AS avg_b2,
        |  ROUND(AVG(b0), 4) AS avg_b0, COUNT(*) AS n_windows""".stripMargin),
    "q_recursive_lr2" -> rollRecOracle(
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", "n >= 10",
      """ROUND(AVG(b1), 6) AS avg_b1, ROUND(AVG(b2), 6) AS avg_b2,
        |  ROUND(AVG(b0), 4) AS avg_b0""".stripMargin),
    "q_multi_target" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_quantity, l_discount,
         |    l_extendedprice y FROM lineitem),
         |s AS ($gram3),
         |${cramer3("0.0", "0.0")}
         |SELECT l_returnflag, ROUND(b1, 6) AS b1_t0,
         |  ROUND(b2, 4) AS b2_t0, ROUND(b0, 4) AS b0_t0,
         |  3.0 AS b1_t1, -7.0 AS b2_t1, 2.0 AS b0_t1
         |FROM b ORDER BY 1""".stripMargin,
    "q_hc_se" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*)::DOUBLE n, SUM(l_quantity) sx,
        |    SUM(l_quantity * l_quantity) sxx, SUM(l_extendedprice) sy,
        |    SUM(l_quantity * l_extendedprice) sxy
        |  FROM lineitem GROUP BY 1),
        |b AS (
        |  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) b1,
        |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n b0,
        |    n * sxx - sx * sx det
        |  FROM s),
        |r AS (
        |  SELECT li.l_returnflag, li.l_quantity x,
        |    li.l_extendedprice - b.b1 * li.l_quantity - b.b0 e,
        |    (b.n * li.l_quantity * li.l_quantity
        |      - 2 * b.sx * li.l_quantity + b.sxx) / b.det h
        |  FROM lineitem li JOIN b ON li.l_returnflag = b.l_returnflag),
        |m AS (
        |  SELECT r.l_returnflag,
        |    SUM(e * e) sse,
        |    SUM(x * x * e * e) ma11, SUM(x * e * e) ma12,
        |    SUM(e * e) ma22,
        |    SUM(x * x * e * e / (1 - h)) mb11,
        |    SUM(x * e * e / (1 - h)) mb12, SUM(e * e / (1 - h)) mb22,
        |    SUM(x * x * e * e / ((1 - h) * (1 - h))) mc11,
        |    SUM(x * e * e / ((1 - h) * (1 - h))) mc12,
        |    SUM(e * e / ((1 - h) * (1 - h))) mc22
        |  FROM r GROUP BY 1)
        |SELECT b.l_returnflag, ROUND(b.b1, 6) AS b1,
        |  ROUND(SQRT(m.sse / (b.n - 2) * b.n / b.det), 6) AS se1,
        |  ROUND(SQRT((b.n * b.n * m.ma11 - 2 * b.n * b.sx * m.ma12
        |    + b.sx * b.sx * m.ma22) / (b.det * b.det)), 6) AS hc0,
        |  ROUND(SQRT(b.n / (b.n - 2) * (b.n * b.n * m.ma11
        |    - 2 * b.n * b.sx * m.ma12 + b.sx * b.sx * m.ma22)
        |    / (b.det * b.det)), 6) AS hc1,
        |  ROUND(SQRT((b.n * b.n * m.mb11 - 2 * b.n * b.sx * m.mb12
        |    + b.sx * b.sx * m.mb22) / (b.det * b.det)), 6) AS hc2,
        |  ROUND(SQRT((b.n * b.n * m.mc11 - 2 * b.n * b.sx * m.mc12
        |    + b.sx * b.sx * m.mc22) / (b.det * b.det)), 6) AS hc3
        |FROM b JOIN m ON b.l_returnflag = m.l_returnflag
        |ORDER BY 1""".stripMargin,
    "q_lin_reg_pred" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_quantity, l_discount,
         |    l_extendedprice y FROM lineitem),
         |s AS ($gram3),
         |${cramer3("0.0", "0.0")}
         |SELECT li.l_returnflag,
         |  ROUND(AVG(ABS(li.y - (b.b1 * li.l_quantity
         |    + b.b2 * li.l_discount + b.b0))), 4) AS avg_abs_resid,
         |  ROUND(AVG(b.b1 * li.l_quantity + b.b2 * li.l_discount + b.b0),
         |    4) AS avg_pred
         |FROM li JOIN b USING (l_returnflag)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}

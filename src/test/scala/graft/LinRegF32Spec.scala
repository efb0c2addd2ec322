package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{LinRegAgg, LinRegAggF32}

/** Single-precision twin kernel (reference linear_regression_f32.rs,
  * toggled via config.py LIN_REG_EXPR_F64). Three contracts:
  * f32≈f64 on a well-conditioned design, f32≠f64 on a design built to
  * exhaust the 24-bit mantissa (proves the kernel genuinely computes
  * in single precision, not f64-rounded-at-the-end), and the
  * `graft.linRegF32` conf reroutes the shared [[LinRegAgg.linReg]]
  * entry point. */
class LinRegF32Spec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def data = {
    import spark.implicits._
    (0 until 100).map { i =>
      val x1 = (i % 10).toDouble
      val x2 = ((i * 7) % 13).toDouble
      val noise = (((i * 37) % 11) - 5) / 10.0
      (x1, x2, 2 + 0.5 * x1 - 0.3 * x2 + noise)
    }.toDF("x1", "x2", "y")
  }

  private def fit(c: org.apache.spark.sql.Column) =
    data.agg(c.as("r")).select("r.*").collect()(0)

  test("f32 OLS tracks the f64 kernel on a well-conditioned design") {
    val f64 = fit(LinRegAgg.linReg(
      array(col("x1"), col("x2"), lit(1.0)), col("y"), 3))
    val f32 = fit(LinRegAggF32.linRegF32(
      array(col("x1"), col("x2"), lit(1.0)), col("y"), 3))
    val b64 = f64.getSeq[Double](0)
    val b32 = f32.getSeq[Double](0)
    (0 until 3).foreach { i =>
      assert(math.abs(b32(i) - b64(i)) < 1e-3,
        s"coef $i: f32 ${b32(i)} vs f64 ${b64(i)}")
    }
    assert(math.abs(f32.getDouble(4) - f64.getDouble(4)) < 1e-3) // r2
    assert(f32.getLong(6) === 100L)
  }

  test("f32 ridge/WLS variants run through the same buffer layout") {
    val f64 = fit(LinRegAgg.linReg(
      array(col("x1"), col("x2")), col("y"), 2, lambda = 1.0,
      weight = col("x1") + 1.0))
    val f32 = fit(LinRegAggF32.linRegF32(
      array(col("x1"), col("x2")), col("y"), 2, lambda = 1.0,
      weight = col("x1") + 1.0))
    (0 until 2).foreach { i =>
      assert(math.abs(f32.getSeq[Double](0)(i) -
        f64.getSeq[Double](0)(i)) < 1e-3)
    }
  }

  test("f32 kernel is genuinely single-precision: " +
    "a mantissa-exhausting offset diverges from f64") {
    import spark.implicits._
    // x centered at 4096 with ±1 variation: x² ≈ 1.7e7 eats 24 of the
    // 24 mantissa bits, so the f32 Gram loses the variance digits the
    // f64 Gram keeps. True slope is 0.5.
    val df = (0 until 1000).map { i =>
      val x = 4096.0 + (i % 3) - 1
      (x, 0.5 * x + (((i * 37) % 11) - 5) / 10.0)
    }.toDF("x", "y")
    // singularXTol = 0: this design's second pivot is legitimately
    // ~1e-14 of maxDiag, so the default rank gate (correctly) refuses
    // it in BOTH kernels; the point here is raw arithmetic precision.
    val b64 = df.agg(LinRegAgg.linReg(
      array(col("x"), lit(1.0)), col("y"), 2,
      singularXTol = 0.0).as("r"))
      .select("r.*").collect()(0).getSeq[Double](0)
    val b32 = df.agg(LinRegAggF32.linRegF32(
      array(col("x"), lit(1.0)), col("y"), 2,
      singularXTol = 0.0).as("r"))
      .select("r.*").collect()(0).getSeq[Double](0)
    // deterministic noise leaves a small residual x-correlation over
    // the non-integral cycle count → slope ≈ 0.504, not exactly 0.5
    assert(math.abs(b64(0) - 0.5) < 1e-2, s"f64 slope ${b64(0)}")
    // f32 must be measurably off (garbage, NaN, or degenerate) — if
    // it ever matches f64 to 1e-6 the kernel silently upcast.
    assert(b32.isEmpty || b32(0).isNaN ||
      math.abs(b32(0) - b64(0)) > 1e-6,
      s"f32 slope ${if (b32.isEmpty) "degenerate" else b32(0)} " +
        "suspiciously equals f64 — kernel not actually f32?")
  }

  test("graft.linRegF32 conf reroutes the shared linReg entry point") {
    spark.conf.set("graft.linRegF32", "true")
    try {
      val toggled = fit(LinRegAgg.linReg(
        array(col("x1"), col("x2"), lit(1.0)), col("y"), 3))
      val direct = fit(LinRegAggF32.linRegF32(
        array(col("x1"), col("x2"), lit(1.0)), col("y"), 3))
      // identical plan → bit-identical f32 results
      assert(toggled.getSeq[Double](0) === direct.getSeq[Double](0))
    } finally spark.conf.unset("graft.linRegF32")
  }

  test("null feature rows and n<d degenerate like the f64 kernel") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 1.0f)), 1.0f),
      (None, 2.0f), (Some(Seq(2.0f, 1.0f)), 2.0f))
      .toDF("x", "y")
    val r = df.agg(LinRegAggF32.linRegF32(col("x"), col("y"), 2)
      .as("r")).select("r.*").collect()(0)
    assert(r.getLong(6) === 2L) // null row skipped
    val tiny = Seq((Seq(1.0f, 2.0f), 1.0f)).toDF("x", "y")
      .agg(LinRegAggF32.linRegF32(col("x"), col("y"), 2).as("r"))
      .select("r.*").collect()(0)
    assert(tiny.getDouble(4).isNaN) // n < d → degenerate
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random column generators + noise (SURVEY §2.5; reference
  * python/polars_ds/exprs/stats.py:406-755, kernels
  * src/stats/sample.rs).
  *
  * Spark's `rand/randn(seed)` are deterministic per (seed, partition,
  * row-offset) — reproducible for a fixed plan, but NOT bitwise equal
  * to the reference's rand-crate streams (impossible cross-engine;
  * SURVEY §7). Tests are therefore distributional/structural, exactly
  * as the reference's own streaming-engine tests are
  * (tests/test_many.py:11-29).
  */
object RandomGen {

  /** U(lo, hi). (stats.py:523 random) */
  def randomUniform(lo: Double, hi: Double, seed: Long): Column =
    rand(seed) * (hi - lo) + lo

  /** Uniform integer in [lo, hi). (stats.py:608 random_int) */
  def randomInt(lo: Int, hi: Int, seed: Long): Column =
    floor(rand(seed) * (hi - lo)).cast("int") + lo

  /** N(mean, sd). (stats.py:713 random_normal) */
  def randomNormal(mean: Double, sd: Double, seed: Long): Column =
    randn(seed) * sd + mean

  /** Exp(λ) via inverse transform. (stats.py:689 random_exp) */
  def randomExp(lambda: Double, seed: Long): Column =
    -log(lit(1.0) - rand(seed)) / lambda

  /** Binomial(n, p) as a sum of n Bernoulli draws (distinct seeds per
    * trial). (stats.py:664 random_binomial) */
  def randomBinomial(n: Int, p: Double, seed: Long): Column =
    (0 until n).map(i => (rand(seed + i) < p).cast("int"))
      .reduce(_ + _)

  /** Random lowercase string of the given length; deterministic per
    * (seed, key). (stats.py:636 random_str) */
  def randomStr(len: Int, seed: Long)(key: Column): Column = {
    val u = udf((k: Long) => {
      val rng = new scala.util.Random(seed ^ (k * 0x9E3779B97F4A7C15L))
      (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    })
    u(key.cast("long"))
  }

  /** Nulls a fraction of values at random. (stats.py:580 random_null) */
  def randomNull(c: Column, fraction: Double, seed: Long): Column =
    when(rand(seed) < fraction, lit(null)).otherwise(c)

  /** Uniform noise in [−ε/2, ε/2), or [0, ε) with `positive=true`
    * (stats.py:406 perturb; src/stats/sample.rs:120). */
  def perturb(c: Column, eps: Double, seed: Long,
              positive: Boolean = false): Column = {
    require(!eps.isNaN && !eps.isInfinite,
      "epsilon must be a finite value")
    val e = math.abs(eps)
    if (positive) c + rand(seed) * e
    else c + (rand(seed) - 0.5) * e
  }

  /** Gaussian noise with the given sd. (stats.py:447 jitter /
    * add_noise; sample.rs:165) */
  def jitter(c: Column, sd: Double, seed: Long): Column =
    c + randn(seed) * sd

  /** add_noise dispatcher (stats.py:471): "gaussian" → [[jitter]],
    * "uniform" → [[perturb]]. */
  def addNoise(c: Column, noiseType: String = "gaussian",
               scale: Double = 1.0, seed: Long = 0L): Column =
    noiseType match {
      case "gaussian" => jitter(c, scale, seed)
      case "uniform"  => perturb(c, scale, seed)
      case t => throw new IllegalArgumentException(
        s"the noise_type $t is not currently supported")
    }
}

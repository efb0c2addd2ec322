package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numerical helpers mirroring the reference's `python/polars_ds/exprs/
  * num.py` surface (SURVEY §2.6): horizontal norms, array/list math,
  * elementwise special functions, haversine, gcd/lcm.
  *
  * Everything except gcd/lcm/gamma/digamma is pure `Column` algebra —
  * whole-stage-codegen'd by Catalyst, no UDF boundary, so these run at
  * scan speed on arbitrarily large tables. Array ops use the higher-order
  * functions `zip_with`/`aggregate`/`transform`, which execute inside
  * codegen without materializing intermediate arrays per element.
  */
object NumFuncs {

  // ---- horizontal (row-wise across columns) norms: num.py:74-127 ----

  /** Σ|xᵢ| across columns. (num.py:74 l1_horizontal) */
  def l1Horizontal(cols: Column*): Column =
    cols.map(abs).reduce(_ + _)

  /** Σxᵢ² across columns. (num.py:92 l2_sq_horizontal) */
  def l2SqHorizontal(cols: Column*): Column =
    cols.map(c => c * c).reduce(_ + _)

  /** max|xᵢ| across columns. (num.py:74 l_inf_horizontal) */
  def lInfHorizontal(cols: Column*): Column =
    greatest(cols.map(abs): _*)

  // normalize=True variants: divide by the dimension (num.py:74-127)
  def l1Horizontal(cols: Seq[Column], normalize: Boolean): Column =
    if (normalize) l1Horizontal(cols: _*) / cols.length
    else l1Horizontal(cols: _*)
  def l2SqHorizontal(cols: Seq[Column], normalize: Boolean): Column =
    if (normalize) l2SqHorizontal(cols: _*) / cols.length
    else l2SqHorizontal(cols: _*)
  def lInfHorizontal(cols: Seq[Column], normalize: Boolean): Column =
    if (normalize) lInfHorizontal(cols: _*) / cols.length
    else lInfHorizontal(cols: _*)

  // ---- array (fixed-dim vector) math: num.py:128-216 ----

  /** Pairwise dot product of two array columns. (num.py:128 arr_dot) */
  def arrDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Σ|aᵢ−bᵢ|. (num.py:146 arr_l1_dist) */
  def arrL1Dist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0),
      (acc, v) => acc + v)

  /** Σ(aᵢ−bᵢ)². (num.py:163 arr_sql2_dist) */
  def arrSql2Dist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, v) => acc + v)

  /** max|aᵢ−bᵢ| (Chebyshev). (arkadia LInf metric) */
  def arrLInfDist(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => abs(x - y)))

  /** Cosine similarity of two array columns. */
  def arrCosineSim(a: Column, b: Column): Column =
    arrDot(a, b) / sqrt(arrDot(a, a) * arrDot(b, b))

  /** Max of a list column. (num.py:915 list_amax) */
  def listAmax(a: Column): Column = array_max(a)

  /** Per-row set Jaccard of two array columns. (num.py:466 jaccard_row)
    * Spark's array_intersect/union dedup — matching the reference's set
    * semantics. */
  def jaccardRow(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  /** Column-set Jaccard |A∩B|/|A∪B| over the DISTINCT values of two
    * columns (num.py:487 jaccard_col); `countNull=true` counts null as
    * a distinct element of each side. One row out. Plan: union the two
    * sides tagged, one shuffle on value with per-side membership
    * max-flags (map-side combinable), then a global sum — never
    * materializes either set. */
  def jaccardCol(df: org.apache.spark.sql.DataFrame, a: Column,
                 b: Column, countNull: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val P = "__jc_"
    def side(c: Column, tag: Int) = {
      val base = df.select(c.as(s"${P}v"))
      (if (countNull) base else base.where(col(s"${P}v").isNotNull))
        .withColumn(s"${P}s", lit(tag))
    }
    side(a, 0).unionByName(side(b, 1))
      .groupBy(s"${P}v")
      .agg(max(when(col(s"${P}s") === 0, 1L).otherwise(0L))
          .as(s"${P}ina"),
        max(when(col(s"${P}s") === 1, 1L).otherwise(0L)).as(s"${P}inb"))
      .agg(sum(s"${P}ina").as("n_a"), sum(s"${P}inb").as("n_b"),
        sum(col(s"${P}ina") * col(s"${P}inb")).as("n_common"))
      .select(col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")))
          .as("jaccard_col"))
  }

  // ---- elementwise special functions: num.py:926-1177 ----

  /** Sigmoid 1/(1+e^(−x)). (num.py:947 expit; float_extras.rs) */
  def expit(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** log(x/(1−x)). (num.py:958 logit) */
  def logit(x: Column): Column = log(x / (lit(1.0) - x))

  /** 2^x. (num.py:983 exp2) */
  def exp2(x: Column): Column = pow(lit(2.0), x)

  /** Fractional part x − trunc(x); cast-to-long truncates toward zero.
    * (num.py:991 fract) */
  def fract(x: Column): Column = x - x.cast("long").cast("double")

  /** Integer part toward zero; NaN/±Inf pass through unchanged (the
    * long cast would clamp them — test_many.py:421 keeps trunc(NaN)
    * NaN), and any |x| ≥ 2^53 passes through too: such doubles are
    * already integral and the long cast would saturate past 2^63.
    * (num.py:999 trunc) */
  def truncCol(x: Column): Column =
    when(isnan(x) || abs(x) >= lit(9007199254740992.0), x)
      .otherwise(x.cast("long").cast("double"))

  /** Normalized sinc: sin(πx)/(πx), 1 at 0. (num.py:1139 sinc) */
  def sinc(x: Column): Column = {
    val px = x * math.Pi
    when(x === 0.0, 1.0).otherwise(sin(px) / px)
  }

  /** x·log(y), 0 when x=0 (even if y=0). (num.py:1151 xlogy) */
  def xlogy(x: Column, y: Column): Column =
    // x==0 shortcuts to 0 ONLY when y is not NaN — scipy/reference
    // contract (float_extras.rs xlogy; test_many.py:1452: 0·log(NaN)
    // stays NaN)
    when(x === 0.0 && !isnan(y), 0.0).otherwise(x * log(y))

  /** Γ(x) via commons-math (num.py:926 gamma; float_extras.rs:67). */
  val gammaFn: Column => Column = {
    val u = udf((x: Double) => org.apache.commons.math3.special.Gamma.gamma(x))
    c => u(c)
  }

  /** ψ(x) digamma via commons-math (num.py:1129 digamma). */
  val digammaFn: Column => Column = {
    val u = udf((x: Double) => org.apache.commons.math3.special.Gamma.digamma(x))
    c => u(c)
  }

  /** Math.nextUp / nextDown (num.py:1163-1177 next_up/next_down). */
  val nextUp: Column => Column = {
    val u = udf((x: Double) => Math.nextUp(x)); c => u(c)
  }
  val nextDown: Column => Column = {
    val u = udf((x: Double) => Math.nextDown(x)); c => u(c)
  }

  // ---- integer gcd/lcm: num.py:291-336; src/num_ext/gcd_lcm.rs ----

  private val gcdUdf = udf((a: Long, b: Long) => {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  })

  def gcdCol(a: Column, b: Column): Column =
    gcdUdf(a.cast("long"), b.cast("long"))

  def lcmCol(a: Column, b: Column): Column = {
    val g = gcdUdf(a.cast("long"), b.cast("long"))
    // divide-before-multiply with integral `div`: keeps every intermediate
    // at or below the true lcm in exact long arithmetic (abs(a*b) can
    // overflow, and long `/` in Spark routes through double, losing
    // precision above 2^53).
    when(g === 0L, 0L)
      .otherwise(call_function("div", abs(a.cast("long")), g) *
        abs(b.cast("long")))
  }

  // ---- haversine: num.py:337; src/num_ext/haversine.rs:55 ----

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2) in
    * degrees; pure column math (no UDF). */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                radiusKm: Double = 6371.0): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    asin(sqrt(a)) * (2.0 * radiusKm)
  }

  // ---- standardization (aggregate forms): num.py:253-290 ----
  // center/z_normalize as full-column transforms live in EncodeOps /
  // Pipeline (they need group or global stats); softmax here is the
  // agg-context building block: exp(x - max) / Σ exp(x - max).

  /** Stable softmax over an array column. (num.py:279 softmax) */
  def softmaxArr(a: Column): Column = {
    val m = array_max(a)
    val ex = transform(a, v => exp(v - m))
    val s = aggregate(ex, lit(0.0), (acc, v) => acc + v)
    transform(ex, v => v / s)
  }
}

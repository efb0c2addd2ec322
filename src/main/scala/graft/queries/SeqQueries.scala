package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{PcaOps, SeqOps}

/** Driver-contract queries for SURVEY §2.6 whole-series kernels + PCA.
  * Isotonic regression's oracle uses the exact minimax characterization
  * fit(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) — O(n²) in SQL, which the
  * 1-in-10 subsample keeps cheap. The spline is oracle-gated through
  * its Reinsch invariants (Σf̂ = Σy, Σx·f̂ = Σx·y) plus golden specs. */
object SeqQueries extends QueryPack {

  private def sub(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_id") % 10 === 0)

  private val subSql = "SELECT * FROM events WHERE event_id % 10 = 0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca" -> ((s, dir) => {
      PcaOps.singularValues(t(s, dir, "lineitem"),
          Seq(col("l_quantity"), col("l_extendedprice") / 1000.0),
          Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(element_at(col("singular_values"), 1), 4).as("sv1"),
          round(element_at(col("singular_values"), 2), 4).as("sv2"),
          round(element_at(col("explained_variance_ratio"), 1), 6)
            .as("evr1"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),
    "q_pca_project" -> ((s, dir) => {
      // sign-invariant check of the per-row projection: the sample
      // variance of PC i equals the i-th covariance eigenvalue (closed
      // form for d=2 in the oracle), and the PCs are uncorrelated
      val proj = PcaOps.principalComponents(
        t(s, dir, "lineitem").select(col("l_quantity"),
          (col("l_extendedprice") / 1000.0).as("y")),
        Seq(col("l_quantity"), col("y")), 2)
      proj.agg(
        count(lit(1)).as("n"),
        round(var_samp(col("pc_1")), 4).as("var_pc1"),
        round(var_samp(col("pc_2")), 4).as("var_pc2"),
        round(abs(covar_samp(col("pc_1"), col("pc_2"))), 4)
          .as("cross_cov"))
    }),
    "q_isotonic" -> ((s, dir) => {
      SeqOps.isotonic(sub(s, dir), col("value"), col("event_id"),
          Seq("event_type"))
        .select(col("event_type"),
          round(aggregate(col("isotonic"), lit(0.0), _ + _), 2)
            .as("sum_fit"),
          round(aggregate(
            zip_with(col("isotonic"), col("series"),
              (f, y) => (f - y) * (f - y)),
            lit(0.0), _ + _), 4).as("ssr"),
          forall(zip_with(col("isotonic"),
              slice(col("isotonic"), 2, 100000),
              (a, b) => b.isNull || a <= b), x => x)
            .as("monotone"))
        .orderBy("event_type")
    }),
    // sf1-feasible value-exact twin (BASELINE.md "sf1 CORRECTNESS"):
    // q_isotonic's min-max oracle is quadratic in each group's SERIES
    // length, so unlike the sampled-QUERY twins the series itself must
    // shrink — the twin runs the identical PAVA operator on an
    // sf-adaptively thinned series (mod 10 at gate scale, where it
    // equals q_isotonic exactly; mod 971 past 200k events), and the
    // oracle replays the same thinned series with the identical
    // count-based rule.
    "q_sx_isotonic" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val mod = if (ev.count() > 200000) 971L else 10L
      SeqOps.isotonic(ev.filter(col("event_id") % mod === 0),
          col("value"), col("event_id"), Seq("event_type"))
        .select(col("event_type"),
          round(aggregate(col("isotonic"), lit(0.0), _ + _), 2)
            .as("sum_fit"),
          round(aggregate(
            zip_with(col("isotonic"), col("series"),
              (f, y) => (f - y) * (f - y)),
            lit(0.0), _ + _), 4).as("ssr"),
          forall(zip_with(col("isotonic"),
              slice(col("isotonic"), 2, 100000),
              (a, b) => b.isNull || a <= b), x => x)
            .as("monotone"))
        .orderBy("event_type")
    }),
    "q_convolve" -> ((s, dir) => {
      val k = Seq(0.25, 0.5, 0.25)
      val valid = SeqOps.convolveWin(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"), k, "valid")
        .groupBy(col("event_type"))
        .agg(round(sum(col("conv")), 4).as("sum_valid"),
          count(col("conv")).as("n_valid"))
      val same = SeqOps.convolveWin(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"), k, "same")
        .groupBy(col("event_type"))
        .agg(round(sum(col("conv")), 4).as("sum_same"))
      // method="fft" (convolve.rs:190): radix-2 FFT convolution must
      // reproduce the direct kernel to fp accuracy — deterministic
      // boolean, asserted as a literal in the oracle
      val direct = SeqOps.convolveSeries(sub(s, dir), col("value"),
        col("event_id"), Seq("event_type"), k, "same", "cd")
      val fftc = SeqOps.convolveSeries(sub(s, dir), col("value"),
        col("event_id"), Seq("event_type"), k, "same", "cf",
        method = "fft")
      val fftOk = direct.join(fftc, "event_type")
        .select(col("event_type"),
          aggregate(zip_with(col("cd"), col("cf"),
              (a, b) => abs(a - b)),
            lit(0.0), (acc, v) => greatest(acc, v)).as("maxdiff"))
        .select(col("event_type"), (col("maxdiff") < 1e-6).as("fft_ok"))
      valid.join(same, "event_type").join(fftOk, "event_type")
        .orderBy("event_type")
    }),
    "q_rfft" -> ((s, dir) => {
      SeqOps.rfft(sub(s, dir), col("value"), col("event_id"),
          Seq("event_type"), 3)
        .select(col("event_type"),
          round(element_at(col("fft"), 1)("re"), 4).as("re0"),
          round(element_at(col("fft"), 2)("re"), 4).as("re1"),
          round(element_at(col("fft"), 2)("im"), 4).as("im1"),
          round(sqrt(
            element_at(col("fft"), 3)("re") * element_at(col("fft"), 3)("re")
            + element_at(col("fft"), 3)("im") * element_at(col("fft"), 3)("im")
          ), 4).as("mag2"))
        .orderBy("event_type")
    }),
    // smoothing spline at λ=10, oracle-gated via the Reinsch-form
    // invariants: f̂ = y − λQγ where every column of Q annihilates
    // constants AND linears in x (second-difference coefficients), so
    // Σf̂ = Σy and Σx·f̂ = Σx·y EXACTLY — sum_spline is a real value
    // check against SUM(value) in SQL, wsum_ratio pins the x-weighted
    // identity, shrink_ok pins that smoothing contracts variance.
    // The λ>0 pointwise values stay golden-tested in SeqSpec.
    "q_spline" -> ((s, dir) => {
      val fit = SeqOps.smoothSpline(sub(s, dir), col("event_id"),
        col("value"), Seq("event_type"), 10.0)
      val n = size(col("ys")).cast("double")
      val ybar = aggregate(col("ys"), lit(0.0), _ + _) / n
      // SSE around ybar via the expanded form Σa² − 2·ȳΣa + n·ȳ².
      // The direct form (v − ȳ)² put the O(n) ybar AGGREGATE inside
      // the per-element lambda: higher-order functions evaluate
      // interpreted (no codegen/CSE), so each element re-ran the inner
      // aggregate — O(n²) per group, >8 min single-task at sf1 group
      // sizes (r10 sf1 sweep hang). The expansion keeps every
      // aggregate non-nested: O(n) per group.
      val sse = (a: Column) => {
        val sa = aggregate(a, lit(0.0), _ + _)
        val sa2 = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
        sa2 - lit(2.0) * ybar * sa + n * ybar * ybar
      }
      fit.select(col("event_type"),
          round(aggregate(col("spline"), lit(0.0), _ + _), 2)
            .as("sum_spline"),
          round(
            aggregate(zip_with(col("xs"), col("spline"), _ * _),
              lit(0.0), _ + _) /
            aggregate(zip_with(col("xs"), col("ys"), _ * _),
              lit(0.0), _ + _), 6).as("wsum_ratio"),
          (sse(col("spline")) <= sse(col("ys")) + lit(1e-9))
            .as("shrink_ok"))
        .orderBy("event_type")
    }),
    "q_spline_interp" -> ((s, dir) => {
      // lambda = 0 → the smoothing spline interpolates: fitted values
      // at the knots ARE the inputs (SeqSpec proves it), which gives
      // the spline plumbing an exact SQL oracle; the lambda > 0 math
      // stays golden-tested in SeqSpec.
      SeqOps.smoothSpline(sub(s, dir), col("event_id"), col("value"),
          Seq("event_type"), 0.0)
        .select(col("event_type"),
          round(aggregate(col("spline"), lit(0.0), _ + _), 2)
            .as("sum_spline"))
        .orderBy("event_type")
    }),
    "q_combinations" -> ((s, dir) => {
      val small = t(s, dir, "events")
        .filter(col("event_id") % 100 === 0)
      val comb = SeqOps.combinations2(small, col("value"),
          col("event_id"), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          // 2-dp × 2-dp products are exact 4-dp quantities: sum them
          // in decimal so the oracle survives any sf (a double sum's
          // FP error crosses the 4-dp rounding lattice at sf1)
          sum((col("c1").cast("decimal(18,2)") *
            col("c2").cast("decimal(18,2)")).cast("decimal(30,4)"))
            .cast("double").as("sum_prod"))
      val prod = SeqOps.product(
        t(s, dir, "region"), col("r_regionkey"),
        t(s, dir, "nation"), col("n_nationkey"))
        .agg(count(lit(1)).as("n_prod"),
          sum(col("p1") * col("p2")).as("sum_cross"))
      comb.crossJoin(prod).orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    // Reinsch invariants: the smoother preserves Σy and Σx·y (columns
    // of Q are second differences → orthogonal to constants and to x),
    // so SUM(value) is the true expected sum of the λ=10 fit.
    "q_spline" ->
      s"""WITH s AS ($subSql)
         |SELECT event_type, ROUND(SUM(value), 2) AS sum_spline,
         |  1.0 AS wsum_ratio, true AS shrink_ok
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_spline_interp" ->
      s"""WITH s AS ($subSql)
         |SELECT event_type, ROUND(SUM(value), 2) AS sum_spline
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pca_project" ->
      """WITH f AS (
        |  SELECT l_quantity x, l_extendedprice / 1000.0 y FROM lineitem),
        |s AS (
        |  SELECT COUNT(*)::DOUBLE n,
        |    SUM(x * x) sxx, SUM(x * y) sxy, SUM(y * y) syy,
        |    SUM(x) sx, SUM(y) sy
        |  FROM f),
        |c AS (
        |  SELECT n,
        |    (sxx - sx * sx / n) / (n - 1) c11,
        |    (sxy - sx * sy / n) / (n - 1) c12,
        |    (syy - sy * sy / n) / (n - 1) c22
        |  FROM s)
        |SELECT n::BIGINT AS n,
        |  ROUND(((c11 + c22)
        |    + SQRT((c11 - c22) * (c11 - c22) + 4 * c12 * c12)) / 2, 4)
        |    AS var_pc1,
        |  ROUND(((c11 + c22)
        |    - SQRT((c11 - c22) * (c11 - c22) + 4 * c12 * c12)) / 2, 4)
        |    AS var_pc2,
        |  0.0 AS cross_cov
        |FROM c""".stripMargin,
    "q_pca" ->
      """WITH f AS (
        |  SELECT l_returnflag, l_quantity x, l_extendedprice / 1000.0 y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, COUNT(*)::DOUBLE n,
        |    SUM(x * x) sxx, SUM(x * y) sxy, SUM(y * y) syy,
        |    SUM(x) sx, SUM(y) sy
        |  FROM f GROUP BY 1),
        |c AS (
        |  SELECT l_returnflag, n,
        |    (sxx - sx * sx / n) / (n - 1) c11,
        |    (sxy - sx * sy / n) / (n - 1) c12,
        |    (syy - sy * sy / n) / (n - 1) c22
        |  FROM s),
        |e AS (
        |  SELECT l_returnflag, n,
        |    (c11 + c22 + SQRT((c11 + c22) * (c11 + c22)
        |      - 4 * (c11 * c22 - c12 * c12))) / 2 l1,
        |    (c11 + c22 - SQRT((c11 + c22) * (c11 + c22)
        |      - 4 * (c11 * c22 - c12 * c12))) / 2 l2
        |  FROM c)
        |SELECT l_returnflag,
        |  ROUND(SQRT(GREATEST(l1, 0) * (n - 1)), 4) AS sv1,
        |  ROUND(SQRT(GREATEST(l2, 0) * (n - 1)), 4) AS sv2,
        |  ROUND(l1 / (l1 + l2), 6) AS evr1,
        |  n::BIGINT AS n
        |FROM e ORDER BY 1""".stripMargin,
    "q_isotonic" ->
      s"""WITH e AS (
         |  SELECT event_type, value y,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)
         |      i
         |  FROM ($subSql)),
         |ps AS (
         |  SELECT event_type, i, y,
         |    SUM(y) OVER (PARTITION BY event_type ORDER BY i) s
         |  FROM e),
         |pairs AS (
         |  SELECT a.event_type, a.i j, b.i k,
         |    (b.s - a.s + a.y) / (b.i - a.i + 1) m
         |  FROM ps a JOIN ps b
         |    ON a.event_type = b.event_type AND a.i <= b.i),
         |mink AS (
         |  SELECT event_type, j, k,
         |    MIN(m) OVER (PARTITION BY event_type, j
         |      ORDER BY k DESC) mk
         |  FROM pairs),
         |fit AS (
         |  SELECT mk.event_type, mk.k i, MAX(mk.mk) f
         |  FROM mink mk WHERE mk.j <= mk.k
         |  GROUP BY 1, 2)
         |SELECT f.event_type,
         |  ROUND(SUM(f.f), 2) AS sum_fit,
         |  ROUND(SUM((f.f - e.y) * (f.f - e.y)), 4) AS ssr,
         |  TRUE AS monotone
         |FROM fit f JOIN e ON e.event_type = f.event_type AND e.i = f.i
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sx_isotonic" ->
      s"""WITH e AS (
         |  SELECT event_type, value y,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)
         |      i
         |  FROM events WHERE event_id %
         |    (CASE WHEN (SELECT COUNT(*) FROM events) > 200000
         |          THEN 971 ELSE 10 END) = 0),
         |ps AS (
         |  SELECT event_type, i, y,
         |    SUM(y) OVER (PARTITION BY event_type ORDER BY i) s
         |  FROM e),
         |pairs AS (
         |  SELECT a.event_type, a.i j, b.i k,
         |    (b.s - a.s + a.y) / (b.i - a.i + 1) m
         |  FROM ps a JOIN ps b
         |    ON a.event_type = b.event_type AND a.i <= b.i),
         |mink AS (
         |  SELECT event_type, j, k,
         |    MIN(m) OVER (PARTITION BY event_type, j
         |      ORDER BY k DESC) mk
         |  FROM pairs),
         |fit AS (
         |  SELECT mk.event_type, mk.k i, MAX(mk.mk) f
         |  FROM mink mk WHERE mk.j <= mk.k
         |  GROUP BY 1, 2)
         |SELECT f.event_type,
         |  ROUND(SUM(f.f), 2) AS sum_fit,
         |  ROUND(SUM((f.f - e.y) * (f.f - e.y)), 4) AS ssr,
         |  TRUE AS monotone
         |FROM fit f JOIN e ON e.event_type = f.event_type AND e.i = f.i
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_convolve" ->
      """WITH s AS (
        |  SELECT event_type, value x0,
        |    LEAD(value, 1) OVER w x1, LEAD(value, 2) OVER w x2
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
        |SELECT event_type,
        |  ROUND(SUM(x0 * 0.25 + x1 * 0.5 + x2 * 0.25), 4) AS sum_valid,
        |  COUNT(CASE WHEN x2 IS NOT NULL THEN 1 END) AS n_valid,
        |  ROUND(SUM(x0 * 0.25 + COALESCE(x1, 0) * 0.5
        |    + COALESCE(x2, 0) * 0.25), 4) AS sum_same,
        |  true AS fft_ok
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rfft" ->
      s"""WITH e AS (
         |  SELECT event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)
         |      - 1 j,
         |    COUNT(*) OVER (PARTITION BY event_type) n
         |  FROM ($subSql))
         |SELECT event_type,
         |  ROUND(SUM(value * COS(2 * PI() * j * 0 / n)), 4) AS re0,
         |  ROUND(SUM(value * COS(2 * PI() * j * 1 / n)), 4) AS re1,
         |  ROUND(-SUM(value * SIN(2 * PI() * j * 1 / n)), 4) AS im1,
         |  ROUND(SQRT(SUM(value * COS(2 * PI() * j * 2 / n))
         |      * SUM(value * COS(2 * PI() * j * 2 / n))
         |    + SUM(-value * SIN(2 * PI() * j * 2 / n))
         |      * SUM(-value * SIN(2 * PI() * j * 2 / n))), 4) AS mag2
         |FROM e GROUP BY event_type ORDER BY 1""".stripMargin,
    "q_combinations" ->
      """WITH small AS (
        |  SELECT * FROM events WHERE event_id % 100 = 0),
        |comb AS (
        |  SELECT a.event_type, COUNT(*) n_pairs,
        |    SUM((a.value::DECIMAL(18,2) * b.value::DECIMAL(18,2))
        |      ::DECIMAL(30,4))::DOUBLE sum_prod
        |  FROM small a JOIN small b
        |    ON a.event_type = b.event_type AND a.event_id < b.event_id
        |  GROUP BY 1),
        |prod AS (
        |  SELECT COUNT(*) n_prod,
        |    SUM(r.r_regionkey * n.n_nationkey)::BIGINT sum_cross
        |  FROM region r CROSS JOIN nation n)
        |SELECT event_type, n_pairs, sum_prod, n_prod, sum_cross
        |FROM comb CROSS JOIN prod ORDER BY 1""".stripMargin
  )
}

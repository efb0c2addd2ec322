package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.eda.EdaOps
import graft.functions.Strings
import graft.knn.KnnOps
import graft.pipeline.Blueprint
import graft.sample.SampleOps
import graft.util.Expander

/** Oracle gates for the ops that were previously spec-only (VERDICT r6
  * "What's missing" #2): similar_to_vocab strategies, null-safe radius
  * query, kd-tree epsilon mode, random_cols, infer_prob,
  * infer_dependency, PartitionHelper, rank_hot_encode, the cast
  * helpers, and select_by_std. Approximate/driver-side ops use the
  * structural-oracle style of MiscQueries (exact counts + invariant
  * booleans); everything else replays the exact semantics in SQL. */
object ParityQueries extends QueryPack {

  /** Same deterministic 2-D feature space as KnnQueries, with f2
    * nulled on ~5% of rows for the null-safe variant. */
  private def feat(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("f1", col("c_acctbal") / 100.0)
      .withColumn("f2", (col("c_custkey") * 7919 % 1000) / 10.0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_similar_vocab" -> ((s, dir) => {
      // the two strategies q_str_vocab doesn't cover: avg-similarity
      // gate on lv, all-similarity gate on dlv (string.py:702)
      val d = t(s, dir, "part")
        .withColumn("w", lower(split(col("p_type"), " ").getItem(0)))
      d.groupBy(col("p_brand"))
        .agg(
          count(when(Strings.similarToVocab(col("w"),
            Seq("promo", "standard"), 0.4, "lv", "avg"), 1))
            .as("n_avg"),
          count(when(Strings.similarToVocab(col("w"),
            Seq("small", "large"), 0.3, "dlv", "all"), 1))
            .as("n_all"))
        .orderBy("p_brand")
    }),
    "q_knn_radius_null" -> ((s, dir) => {
      // expr_knn.py:528 query_radius_ptwise_null_safe: rows with a null
      // feature report null ids (not a job failure) and never appear as
      // neighbors of other rows
      val d = feat(s, dir).withColumn("f2",
        when(col("c_custkey") % 19 === 0, lit(null)).otherwise(col("f2")))
      KnnOps.radiusPtwiseNullSafe(d, col("c_custkey"),
          Seq(col("f1"), col("f2")), 3.0)
        .groupBy(col("c_mktsegment"))
        .agg(count(when(col("radius_ids").isNull, 1)).as("n_null"),
          // size(null) = -1 under the session's non-ANSI (polars-style)
          // config — guard, or every null row subtracts one pair
          sum(when(col("radius_ids").isNotNull,
            size(col("radius_ids")))).as("n_pairs"),
          sum(coalesce(element_at(col("radius_ids"), 1), lit(0L)))
            .as("sum_first_id"))
        .orderBy("c_mktsegment")
    }),
    "q_sx_knn_radius_null" -> ((s, dir) => {
      // sf1-feasible value-exact twin of q_knn_radius_null (see
      // KnnQueries q_sx_*): identical null-safe op over the FULL
      // corpus, aggregate restricted to a 1/97 query sample so the
      // oracle's pair CTE is sample x corpus
      val d = feat(s, dir).withColumn("f2",
        when(col("c_custkey") % 19 === 0, lit(null)).otherwise(col("f2")))
      KnnOps.radiusPtwiseNullSafe(d, col("c_custkey"),
          Seq(col("f1"), col("f2")), 3.0)
        .filter(col("c_custkey") % 97 === 0)
        .groupBy(col("c_mktsegment"))
        .agg(count(when(col("radius_ids").isNull, 1)).as("n_null"),
          // coalesce: a segment whose sample is all-null rows sums to
          // NULL, which pandas would widen to float64 vs the oracle's 0
          coalesce(sum(when(col("radius_ids").isNotNull,
            size(col("radius_ids")))), lit(0L)).as("n_pairs"),
          sum(coalesce(element_at(col("radius_ids"), 1), lit(0L)))
            .as("sum_first_id"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_epsilon" -> ((s, dir) => {
      // kd-tree epsilon mode contract: the approximate k-th distance is
      // never below the exact one and never above sqrt(1+eps) times it
      // (the (1+eps) box-pruning bound lives in squared-l2 space)
      val d = feat(s, dir)
      val eps = 0.4
      val exact = KnnOps.distFromKthNb(d, col("c_custkey"),
          Seq(col("f1"), col("f2")), 3)
        .select(col("c_custkey"), col("kth_dist").as("d_exact"))
      val approx = KnnOps.distFromKthNb(d, col("c_custkey"),
          Seq(col("f1"), col("f2")), 3, epsilon = eps)
        .select(col("c_custkey").as("k2"), col("kth_dist").as("d_eps"))
      exact.join(approx, col("c_custkey") === col("k2"))
        .agg(count(lit(1)).as("n"),
          coalesce(bool_and(col("d_eps") >= col("d_exact") - 1e-9),
            lit(false)).as("lb_ok"),
          coalesce(bool_and(col("d_eps") <=
            col("d_exact") * math.sqrt(1.0 + eps) + 1e-9), lit(false))
            .as("ub_ok"))
    }),
    "q_random_cols" -> ((s, dir) => {
      // driver-side helper: structural oracle (deterministic under a
      // seed, valid subset, k distinct names)
      val li = t(s, dir, "lineitem")
      val picked = SampleOps.randomCols(li, 4, seed = 42)
      val again = SampleOps.randomCols(li, 4, seed = 42)
      val other = SampleOps.randomCols(li, 4, seed = 7)
      val spark = s
      import spark.implicits._
      Seq((picked.size.toLong,
        picked.forall(li.columns.contains),
        picked.distinct.size == 4,
        picked == again,
        other.forall(li.columns.contains) && other.distinct.size == 4))
        .toDF("n_cols", "subset_ok", "distinct_ok", "stable", "other_ok")
    }),
    "q_infer_prob" -> ((s, dir) => {
      // diagnosis.py:492 infer_prob: columns whose non-null values all
      // lie in [0,1]. pa/pc qualify (pc with nulls), pb/pd don't.
      val ev = t(s, dir, "events")
        .withColumn("pa", (col("event_id") % 100) / 100.0)
        .withColumn("pb", col("value"))
        .withColumn("pc", when(col("user_id") % 3 === 0, lit(null))
          .otherwise((col("user_id") % 50) / 50.0))
        .withColumn("pd", col("value") / 100.0)
      val inferred = EdaOps.inferProb(ev, Seq("pa", "pb", "pc", "pd"))
      val spark = s
      import spark.implicits._
      inferred.sorted.toDF("column").orderBy("column")
    }),
    "q_infer_dependency" -> ((s, dir) => {
      // diagnosis.py:772 infer_dependency: H(x|y) per candidate pair;
      // 0 means y determines x. ybin→xdet is exact determination.
      val ev = t(s, dir, "events")
        .withColumn("xbin", floor(col("value") / 10.0).cast("int"))
        .withColumn("ybin", (col("user_id") % 5).cast("int"))
        .withColumn("xdet", (col("ybin") * 3).cast("int"))
      val pairs = Seq(
        ("xbin|ybin", col("xbin"), col("ybin")),
        ("xdet|ybin", col("xdet"), col("ybin")),
        ("ybin|xbin", col("ybin"), col("xbin")))
      val rows = pairs.map { case (name, x, y) =>
        Row(name, math.rint(EdaOps.dependencyScore(ev, x, y) * 1e6) / 1e6)
      }
      s.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
        StructType(Seq(StructField("pair", StringType),
          StructField("cond_entropy", DoubleType))))
        .orderBy("pair")
    }),
    "q_partition_helper" -> ((s, dir) => {
      // partition.py:15 PartitionHelper: split by key, transform each
      // part, concat back — must equal the plain grouped aggregate
      val orders = t(s, dir, "orders")
      graft.util.PartitionHelper.applyAndUnion(orders,
          "o_orderpriority") { part =>
        part.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("sum_price"))
      }.orderBy("o_orderpriority")
    }),
    "q_rank_hot" -> ((s, dir) => {
      // transforms.py:431 rank_hot_encode with a USER-GIVEN ranking
      // (5-LOW < ... < 1-URGENT by the numeric prefix): indicator i is
      // rank(value) >= i
      val base = t(s, dir, "orders")
        .withColumn("pr", split(col("o_orderpriority"), "-").getItem(0))
      val pipe = Blueprint(base)
        .rankHotEncode("pr", Seq("5", "4", "3", "2", "1"), "_ge_")
        .materialize()
      pipe.transform(base)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("pr_ge_4")).as("n_ge_4"),
          sum(col("pr_ge_3")).as("n_ge_3"),
          sum(col("pr_ge_2")).as("n_ge_2"),
          sum(col("pr_ge_1")).as("n_ge_1"))
        .orderBy("o_orderpriority")
    }),
    "q_cast_helpers" -> ((s, dir) => {
      // pipeline.py:415 nan_to_null, :422 int_to_float, :367 cast_bools
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") > 25).as("bulky"),
          when(col("l_orderkey") % 7 === 0, lit(Double.NaN))
            .otherwise(col("l_tax")).as("taxn"))
      val pipe = Blueprint(base)
        .nanToNull()
        .intToFloat(f32 = false)
        .castBools("int")
        .materialize()
      val out = pipe.transform(base)
      // the casts must show in the value domain: NaNs became nulls,
      // ints aggregate as doubles, booleans as 0/1 ints
      out.agg(
        count(when(col("taxn").isNull, 1)).as("n_nan_nulled"),
        round(sum(col("taxn")), 4).as("sum_tax"),
        round(sum(col("l_linenumber")), 1).as("sum_linenumber"),
        sum(col("bulky")).as("n_bulky"),
        lit(out.schema("l_linenumber").dataType.typeName).as("int_type"),
        lit(out.schema("bulky").dataType.typeName).as("bool_type"))
    }),
    "q_select_std" -> ((s, dir) => {
      // transforms.py:668 select_by_std: drop columns whose train std
      // is outside [0.01, 1000] — keeps quantity/discount/tax, drops
      // extendedprice (std ~3e4)
      val cand = Seq("l_quantity", "l_discount", "l_tax",
        "l_extendedprice")
      val base = t(s, dir, "lineitem").select(cand.map(col): _*)
      val pipe = Blueprint(base)
        .selectByStd(cand, 0.01, 1000.0)
        .materialize()
      val kept = pipe.transform(base).columns.filter(cand.contains)
      val spark = s
      import spark.implicits._
      kept.toSeq.sorted.toDF("column").orderBy("column")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_similar_vocab" ->
      """WITH d AS (
        |  SELECT p_brand, LOWER(string_split(p_type, ' ')[1]) w
        |  FROM part)
        |SELECT p_brand,
        |  COUNT(CASE WHEN (
        |      (1 - levenshtein(w, 'promo')::DOUBLE
        |         / GREATEST(LENGTH(w), 5))
        |      + (1 - levenshtein(w, 'standard')::DOUBLE
        |         / GREATEST(LENGTH(w), 8))) / 2.0 >= 0.4
        |    THEN 1 END) AS n_avg,
        |  COUNT(CASE WHEN
        |      1 - damerau_levenshtein(w, 'small')::DOUBLE
        |        / GREATEST(LENGTH(w), 5) >= 0.3
        |      AND 1 - damerau_levenshtein(w, 'large')::DOUBLE
        |        / GREATEST(LENGTH(w), 5) >= 0.3
        |    THEN 1 END) AS n_all
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_radius_null" ->
      """WITH f AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal / 100.0 f1,
        |    CASE WHEN c_custkey % 19 = 0 THEN NULL
        |      ELSE (c_custkey * 7919 % 1000) / 10.0 END f2
        |  FROM customer),
        |nn AS (SELECT * FROM f WHERE f2 IS NOT NULL),
        |-- exact grid-cell radius pairs, cell = radius 3.0: the 3x3
        |-- neighborhood provably contains every pair with d <= 3 (see
        |-- KnnQueries pairsSql rationale), so this is the same pair set
        |-- as the all-pairs join at sub-quadratic cost
        |g AS (
        |  SELECT nn.*, CAST(FLOOR(f1 / 3.0) AS BIGINT) cx,
        |    CAST(FLOOR(f2 / 3.0) AS BIGINT) cy
        |  FROM nn),
        |pairs AS (
        |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
        |    ROW_NUMBER() OVER (PARTITION BY a.c_custkey
        |      ORDER BY (a.f1-b.f1)*(a.f1-b.f1)
        |        + (a.f2-b.f2)*(a.f2-b.f2), b.c_custkey) rk
        |  FROM (SELECT g.*, g.cx + dx.d px, g.cy + dy.d py
        |        FROM g, (VALUES (-1), (0), (1)) dx(d),
        |             (VALUES (-1), (0), (1)) dy(d)) a
        |  JOIN g b ON b.cx = a.px AND b.cy = a.py
        |    AND a.c_custkey <> b.c_custkey
        |  WHERE (a.f1-b.f1)*(a.f1-b.f1)
        |    + (a.f2-b.f2)*(a.f2-b.f2) <= 9.0)
        |SELECT f.c_mktsegment,
        |  COUNT(CASE WHEN f.f2 IS NULL THEN 1 END) AS n_null,
        |  (SELECT COUNT(*) FROM pairs p
        |   WHERE p.seg = f.c_mktsegment)::BIGINT AS n_pairs,
        |  (SELECT COALESCE(SUM(CASE WHEN p.rk = 1 THEN p.cid END), 0)
        |   FROM pairs p WHERE p.seg = f.c_mktsegment)::BIGINT
        |    AS sum_first_id
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sx_knn_radius_null" ->
      """WITH f AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal / 100.0 f1,
        |    CASE WHEN c_custkey % 19 = 0 THEN NULL
        |      ELSE (c_custkey * 7919 % 1000) / 10.0 END f2
        |  FROM customer),
        |nn AS (SELECT * FROM f WHERE f2 IS NOT NULL),
        |q AS (SELECT * FROM nn WHERE c_custkey % 97 = 0),
        |pairs AS (
        |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
        |    ROW_NUMBER() OVER (PARTITION BY a.c_custkey
        |      ORDER BY (a.f1-b.f1)*(a.f1-b.f1)
        |        + (a.f2-b.f2)*(a.f2-b.f2), b.c_custkey) rk
        |  FROM q a JOIN nn b ON a.c_custkey <> b.c_custkey
        |  WHERE (a.f1-b.f1)*(a.f1-b.f1)
        |    + (a.f2-b.f2)*(a.f2-b.f2) <= 9.0)
        |SELECT f.c_mktsegment,
        |  COUNT(CASE WHEN f.f2 IS NULL THEN 1 END) AS n_null,
        |  (SELECT COUNT(*) FROM pairs p
        |   WHERE p.seg = f.c_mktsegment)::BIGINT AS n_pairs,
        |  (SELECT COALESCE(SUM(CASE WHEN p.rk = 1 THEN p.cid END), 0)
        |   FROM pairs p WHERE p.seg = f.c_mktsegment)::BIGINT
        |    AS sum_first_id
        |FROM f WHERE c_custkey % 97 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_epsilon" ->
      """SELECT COUNT(*)::BIGINT AS n, TRUE AS lb_ok, TRUE AS ub_ok
        |FROM customer""".stripMargin,
    "q_random_cols" ->
      """SELECT 4::BIGINT AS n_cols, TRUE AS subset_ok,
        |  TRUE AS distinct_ok, TRUE AS stable, TRUE AS other_ok""".stripMargin,
    "q_infer_prob" ->
      """WITH flags AS (SELECT
        |  MIN(CASE WHEN (event_id % 100) / 100.0 IS NOT NULL
        |    THEN ((event_id % 100) / 100.0 BETWEEN 0 AND 1)::INT END) pa,
        |  MIN(CASE WHEN value IS NOT NULL
        |    THEN (value BETWEEN 0 AND 1)::INT END) pb,
        |  MIN(CASE WHEN user_id % 3 <> 0
        |    THEN ((user_id % 50) / 50.0 BETWEEN 0 AND 1)::INT END) pc,
        |  MIN(CASE WHEN value IS NOT NULL
        |    THEN (value / 100.0 BETWEEN 0 AND 1)::INT END) pd
        |  FROM events)
        |SELECT c AS "column"
        |FROM (VALUES ('pa'), ('pb'), ('pc'), ('pd')) t(c), flags
        |WHERE (c = 'pa' AND pa = 1) OR (c = 'pb' AND pb = 1)
        |   OR (c = 'pc' AND pc = 1) OR (c = 'pd' AND pd = 1)
        |ORDER BY 1""".stripMargin,
    "q_infer_dependency" ->
      """WITH t AS (
        |  SELECT FLOOR(value / 10.0)::INT xbin,
        |    (user_id % 5)::INT ybin, ((user_id % 5) * 3)::INT xdet
        |  FROM events),
        |ce AS (
        |  SELECT 'xbin|ybin' pair, xbin x, ybin y FROM t
        |  UNION ALL SELECT 'xdet|ybin', xdet, ybin FROM t
        |  UNION ALL SELECT 'ybin|xbin', ybin, xbin FROM t)
        |SELECT pair, ROUND(-SUM(pxy * LN(pxy / py)), 6) AS cond_entropy
        |FROM (SELECT pair,
        |        COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER
        |          (PARTITION BY pair) pxy,
        |        SUM(COUNT(*)) OVER (PARTITION BY pair, y)
        |          / SUM(COUNT(*)) OVER (PARTITION BY pair) py
        |      FROM ce GROUP BY pair, x, y)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_partition_helper" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rank_hot" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    CASE string_split(o_orderpriority, '-')[1]
        |      WHEN '5' THEN 0 WHEN '4' THEN 1 WHEN '3' THEN 2
        |      WHEN '2' THEN 3 WHEN '1' THEN 4 END rk
        |  FROM orders)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  SUM((rk >= 1)::INT)::BIGINT AS n_ge_4,
        |  SUM((rk >= 2)::INT)::BIGINT AS n_ge_3,
        |  SUM((rk >= 3)::INT)::BIGINT AS n_ge_2,
        |  SUM((rk >= 4)::INT)::BIGINT AS n_ge_1
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cast_helpers" ->
      """SELECT
        |  COUNT(CASE WHEN l_orderkey % 7 = 0 THEN 1 END) AS n_nan_nulled,
        |  ROUND(SUM(CASE WHEN l_orderkey % 7 <> 0 THEN l_tax END), 4)
        |    AS sum_tax,
        |  ROUND(SUM(l_linenumber::DOUBLE), 1) AS sum_linenumber,
        |  SUM((l_quantity > 25)::INT)::BIGINT AS n_bulky,
        |  'double' AS int_type, 'integer' AS bool_type
        |FROM lineitem""".stripMargin,
    "q_select_std" ->
      """SELECT c AS "column"
        |FROM (VALUES ('l_quantity'), ('l_discount'), ('l_tax'),
        |  ('l_extendedprice')) t(c)
        |WHERE (CASE c
        |    WHEN 'l_quantity' THEN
        |      (SELECT stddev_samp(l_quantity) FROM lineitem)
        |    WHEN 'l_discount' THEN
        |      (SELECT stddev_samp(l_discount) FROM lineitem)
        |    WHEN 'l_tax' THEN
        |      (SELECT stddev_samp(l_tax) FROM lineitem)
        |    WHEN 'l_extendedprice' THEN
        |      (SELECT stddev_samp(l_extendedprice) FROM lineitem)
        |  END) BETWEEN 0.01 AND 1000.0
        |ORDER BY 1""".stripMargin
  )
}

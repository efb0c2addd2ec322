package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.knn.KnnOps

/** Driver-contract queries for SURVEY §2.10 — KNN / spatial operators.
  * Feature space: two deterministic continuous columns derived from
  * customer, so the DuckDB oracle can brute-force the same neighbors
  * with a cross join at sf0.01 scale. Tie-breaks are (distance, id) on
  * both sides, making neighbor identity — not just distance —
  * hash-comparable. */
object KnnQueries extends QueryPack {

  private def feat(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("f1", col("c_acctbal") / 100.0)
      .withColumn("f2", (col("c_custkey") * 7919 % 1000) / 10.0)

  private val featSql =
    """SELECT c_custkey, c_mktsegment, c_acctbal / 100.0 f1,
      |  (c_custkey * 7919 % 1000) / 10.0 f2
      |FROM customer""".stripMargin

  /** qid→neighbors ranked by (l2², id): the shared oracle skeleton.
    *
    * EXACT grid-cell formulation (r11 verdict ask #4 — the former
    * all-pairs `f a JOIN f b` was quadratic and DuckDB-infeasible at
    * sf1's 150k² pairs). Points bucket into C×C cells (C = 3.0); any
    * pair within distance C lands in adjacent cells, so the 3×3
    * neighborhood join enumerates EVERY pair with d ≤ C (each pair
    * once: b's cell matches exactly one of a's nine probe cells).
    * `pairs` therefore contains, per query point, the complete
    * neighbor set within C — sufficient for every downstream use:
    * radius reads filter d2 ≤ C², and rank reads (rk ≤ 3) are served
    * exactly for the qids with ≥ 3 candidates inside C (their true
    * top-3 provably all lie within C); the rare qids that fail that
    * (`good` misses them) fall back to a brute-force row — exactness
    * holds unconditionally, with sub-quadratic cost on real data.
    * ~58M candidate rows at sf1 vs 22.5B all-pairs. */
  private val pairsSql =
    s"""f AS ($featSql),
       |g AS MATERIALIZED (
       |  SELECT f.*, CAST(FLOOR(f1 / 3.0) AS BIGINT) cx,
       |    CAST(FLOOR(f2 / 3.0) AS BIGINT) cy
       |  FROM f),
       |-- MATERIALIZED throughout: DuckDB otherwise re-inlines cand
       |-- into each of its three consumers (measured 3x the 17 s build
       |-- at sf1); and brute must join FROM the materialized bad set so
       |-- the <>-join never runs as an unfiltered 150k^2 nested loop
       |cand AS MATERIALIZED (
       |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
       |    (a.f1 - b.f1) * (a.f1 - b.f1)
       |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
       |  FROM (SELECT g.*, g.cx + dx.d px, g.cy + dy.d py
       |        FROM g, (VALUES (-1), (0), (1)) dx(d),
       |             (VALUES (-1), (0), (1)) dy(d)) a
       |  JOIN g b ON b.cx = a.px AND b.cy = a.py
       |    AND a.c_custkey <> b.c_custkey
       |  WHERE (a.f1 - b.f1) * (a.f1 - b.f1)
       |      + (a.f2 - b.f2) * (a.f2 - b.f2) <= 9.0),
       |good AS MATERIALIZED (
       |  SELECT qid FROM cand GROUP BY 1 HAVING COUNT(*) >= 3),
       |bad AS MATERIALIZED (
       |  SELECT * FROM f
       |  WHERE c_custkey NOT IN (SELECT qid FROM good)),
       |brute AS (
       |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
       |    (a.f1 - b.f1) * (a.f1 - b.f1)
       |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
       |  FROM bad a JOIN f b ON a.c_custkey <> b.c_custkey),
       |pairs AS (
       |  SELECT * FROM cand WHERE qid IN (SELECT qid FROM good)
       |  UNION ALL SELECT * FROM brute),
       |ranked AS (
       |  SELECT qid, seg, cid, d2,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) rk
       |  FROM pairs)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_kth_dist" -> ((s, dir) => {
      val df = feat(s, dir)
      // one driver collect + kd-tree build + broadcast shared by both
      // probe legs (r17) — identical reference set and metric
      val tree = Some(KnnOps.buildRefTree(df, col("c_custkey"),
        Seq(col("f1"), col("f2"))))
      val kth = KnnOps.distFromKthNb(df, col("c_custkey"),
        Seq(col("f1"), col("f2")), 3, refTree = tree)
      val ids = KnnOps.knnPtwise(df, col("c_custkey"),
        Seq(col("f1"), col("f2")), 3, refTree = tree)
        .select(col("c_custkey"), element_at(col("knn_ids"), 1).as("nn1"))
      kth.join(ids, "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(round(avg(col("kth_dist")), 6).as("avg_kth_dist"),
          sum(col("nn1")).as("sum_nn1"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_avg" -> ((s, dir) => {
      // reference contract: k+1 incl self, min_bound drops d=0, and the
      // weighted variant uses 1/d weights inside max_bound
      val df = feat(s, dir)
      val tree = Some(KnnOps.buildRefTree(df, col("c_custkey"),
        Seq(col("f1"), col("f2"))))
      val plain = KnnOps.knnAvg(df, col("c_custkey"),
        Seq(col("f1"), col("f2")), col("c_acctbal"), 5, refTree = tree)
      val wtd = KnnOps.knnAvg(df, col("c_custkey"),
          Seq(col("f1"), col("f2")), col("c_acctbal"), 5,
          weighted = true, maxBound = 30.0, refTree = tree)
        .select(col("c_custkey").as("k2"), col("knn_avg").as("knn_wavg"))
      plain.join(wtd, col("c_custkey") === col("k2"))
        .groupBy(col("c_mktsegment"))
        .agg(round(avg(col("knn_avg")), 4).as("avg_knn_avg"),
          round(avg(col("knn_wavg")), 4).as("avg_knn_wavg"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_nb_cnt" -> ((s, dir) => {
      KnnOps.nbCnt(feat(s, dir), col("c_custkey"),
          Seq(col("f1"), col("f2")), 5.0)
        .groupBy(col("c_mktsegment"))
        .agg(round(avg(col("nb_cnt")), 6).as("avg_nb_cnt"),
          max(col("nb_cnt")).as("max_nb_cnt"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_radius" -> ((s, dir) => {
      KnnOps.radiusPtwise(feat(s, dir), col("c_custkey"),
          Seq(col("f1"), col("f2")), 3.0)
        .groupBy(col("c_mktsegment"))
        .agg(sum(size(col("radius_ids"))).as("n_pairs"),
          sum(coalesce(element_at(col("radius_ids"), 1), lit(0L)))
            .as("sum_first_id"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_freq" -> ((s, dir) => {
      val df = feat(s, dir)
      val tree = Some(KnnOps.buildRefTree(df, col("c_custkey"),
        Seq(col("f1"), col("f2"))))
      val kf = KnnOps.knnFreqCnt(df, col("c_custkey"),
        Seq(col("f1"), col("f2")), 3, refTree = tree)
      val rf = KnnOps.radiusFreqCnt(df, col("c_custkey"),
        Seq(col("f1"), col("f2")), 3.0, refTree = tree)
        .withColumnRenamed("freq", "rfreq")
      df.select(col("c_custkey").as("nb_id"), col("c_mktsegment"))
        .join(kf, Seq("nb_id"), "left")
        .join(rf, Seq("nb_id"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(sum(coalesce(col("freq"), lit(0L))).as("knn_freq_sum"),
          max(coalesce(col("freq"), lit(0L))).as("knn_freq_max"),
          sum(coalesce(col("rfreq"), lit(0L))).as("radius_freq_sum"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_within" -> ((s, dir) => {
      val df = KnnOps.isKnnFrom(feat(s, dir),
        Seq(col("f1"), col("f2")), Seq(50.0, 50.0), 100, col("c_custkey"))
      df.withColumn("within",
          KnnOps.withinDistFrom(Seq(col("f1"), col("f2")),
            Seq(50.0, 50.0), 30.0))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("is_knn").cast("long")).as("n_knn100"),
          sum(col("within").cast("long")).as("n_within30"))
        .orderBy("c_mktsegment")
    }),
    "q_knn_join" -> ((s, dir) => {
      // cross-frame: every customer's 2 nearest suppliers in the shared
      // (acctbal/100, key-derived) feature space — pair rows, exact
      val cust = feat(s, dir)
      val supp = t(s, dir, "supplier")
        .withColumn("f1", col("s_acctbal") / 100.0)
        .withColumn("f2", (col("s_suppkey") * 7919 % 1000) / 10.0)
      KnnOps.knnJoin(cust, col("c_custkey"), Seq(col("f1"), col("f2")),
          supp, col("s_suppkey"), Seq(col("f1"), col("f2")), 2)
        .select(col("c_custkey").as("cid"), col("nb_id").as("sid"),
          col("rk").cast("long").as("rk"),
          round(col("nb_dist"), 6).as("dist"))
    }),
    // ---- q_sx_*: sf1-feasible value-exact twins (BASELINE.md "sf1
    // CORRECTNESS"). The originals' oracles brute-force ALL query
    // rows x ALL candidates — quadratic SQL DuckDB cannot replay at
    // sf1 (150k^2 pairs). These twins keep the Spark side IDENTICAL
    // in every operator-relevant way (kd-tree built over the full
    // corpus, per-row searches, tie-breaks, bounds) and restrict only
    // the AGGREGATED query rows to a deterministic 1/97 key sample,
    // turning the oracle into sample x corpus (~2.3e8 pairs at sf1 —
    // DuckDB replays it inside the isolated runner's budget).
    "q_sx_knn_point" -> ((s, dir) => {
      val df = feat(s, dir)
      val fs = Seq(col("f1"), col("f2"))
      // sf-adaptive sample: 1/97 at gate scale, 1/971 past 20k rows —
      // keeps the all-pairs oracle inside DuckDB's 120 s budget at sf1
      // (two ranked pair sets; 1/97 × 150k × 150k was borderline).
      // The SQL twin applies the IDENTICAL count-based rule.
      val mod = if (df.count() > 20000) 971L else 97L
      // one driver collect + kd-tree build + broadcast shared by all
      // five probe legs (r17) — they query the identical l2 reference
      // set; the former per-op builds were five identical collects
      val tree = Some(KnnOps.buildRefTree(df, col("c_custkey"), fs))
      val kth = KnnOps.distFromKthNb(df, col("c_custkey"), fs, 3,
          refTree = tree)
        .filter(col("c_custkey") % mod === 0)
      val ids = KnnOps.knnPtwise(df, col("c_custkey"), fs, 3,
          refTree = tree)
        .select(col("c_custkey").as("ki"),
          element_at(col("knn_ids"), 1).as("nn1"))
      val av = KnnOps.knnAvg(df, col("c_custkey"), fs, col("c_acctbal"), 5,
          refTree = tree)
        .select(col("c_custkey").as("ka"), col("knn_avg"))
      val cnt = KnnOps.nbCnt(df, col("c_custkey"), fs, 5.0,
          refTree = tree)
        .select(col("c_custkey").as("kc"), col("nb_cnt"))
      val rad = KnnOps.radiusPtwise(df, col("c_custkey"), fs, 3.0,
          refTree = tree)
        .select(col("c_custkey").as("kr"), col("radius_ids"))
      kth.join(ids, col("c_custkey") === col("ki"))
        .join(av, col("c_custkey") === col("ka"))
        .join(cnt, col("c_custkey") === col("kc"))
        .join(rad, col("c_custkey") === col("kr"))
        .groupBy(col("c_mktsegment"))
        .agg(round(avg(col("kth_dist")), 6).as("avg_kth_dist"),
          sum(col("nn1")).as("sum_nn1"),
          round(avg(col("knn_avg")), 4).as("avg_knn_avg"),
          round(avg(col("nb_cnt")), 6).as("avg_nb_cnt"),
          sum(size(col("radius_ids"))).as("n_rpairs"),
          sum(coalesce(element_at(col("radius_ids"), 1), lit(0L)))
            .as("sum_first_id"))
        .orderBy("c_mktsegment")
    }),
    "q_sx_knn_freq" -> ((s, dir) => {
      // freq over the SAMPLED queries' neighbor lists (a well-defined
      // statistic of its own — the original all-queries freq stays
      // rows-checked at sf1 plus the n*k sum invariant both share)
      val df = feat(s, dir)
      val freq = KnnOps.knnPtwise(df, col("c_custkey"),
          Seq(col("f1"), col("f2")), 3)
        .filter(col("c_custkey") % 97 === 0)
        .select(explode(col("knn_ids")).as("nb_id"))
        .groupBy(col("nb_id")).agg(count(lit(1)).as("freq"))
      df.select(col("c_custkey").as("nb_id"), col("c_mktsegment"))
        .join(freq, Seq("nb_id"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(sum(coalesce(col("freq"), lit(0L))).as("knn_freq_sum"),
          max(coalesce(col("freq"), lit(0L))).as("knn_freq_max"))
        .orderBy("c_mktsegment")
    }),
    "q_sx_knn_join" -> ((s, dir) => {
      // the supplier-side tree is FULL size; only probe rows sampled
      val cust = feat(s, dir).filter(col("c_custkey") % 97 === 0)
      val supp = t(s, dir, "supplier")
        .withColumn("f1", col("s_acctbal") / 100.0)
        .withColumn("f2", (col("s_suppkey") * 7919 % 1000) / 10.0)
      KnnOps.knnJoin(cust, col("c_custkey"), Seq(col("f1"), col("f2")),
          supp, col("s_suppkey"), Seq(col("f1"), col("f2")), 2)
        .select(col("c_custkey").as("cid"), col("nb_id").as("sid"),
          col("rk").cast("long").as("rk"),
          round(col("nb_dist"), 6).as("dist"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_knn_kth_dist" ->
      s"""WITH $pairsSql
         |SELECT seg AS c_mktsegment,
         |  ROUND(AVG(CASE WHEN rk = 3 THEN SQRT(d2) END), 6)
         |    AS avg_kth_dist,
         |  SUM(CASE WHEN rk = 1 THEN cid END)::BIGINT AS sum_nn1
         |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_avg" ->
      s"""WITH f AS (
         |  SELECT c_custkey, c_mktsegment, c_acctbal,
         |    c_acctbal / 100.0 f1, (c_custkey * 7919 % 1000) / 10.0 f2
         |  FROM customer),
         |-- exact grid-cell pairs (see pairsSql rationale): k+1 = 6
         |-- nearest INCLUDING self; qids with < 6 candidates within the
         |-- 3.0 cell radius fall back to brute force
         |g AS MATERIALIZED (
         |  SELECT f.*, CAST(FLOOR(f1 / 3.0) AS BIGINT) cx,
         |    CAST(FLOOR(f2 / 3.0) AS BIGINT) cy
         |  FROM f),
         |cand AS MATERIALIZED (
         |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
         |    b.c_acctbal tv,
         |    (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
         |  FROM (SELECT g.*, g.cx + dx.d px, g.cy + dy.d py
         |        FROM g, (VALUES (-1), (0), (1)) dx(d),
         |             (VALUES (-1), (0), (1)) dy(d)) a
         |  JOIN g b ON b.cx = a.px AND b.cy = a.py
         |  WHERE (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) <= 9.0),
         |good AS MATERIALIZED (
         |  SELECT qid FROM cand GROUP BY 1 HAVING COUNT(*) >= 6),
         |bad AS MATERIALIZED (
         |  SELECT * FROM f
         |  WHERE c_custkey NOT IN (SELECT qid FROM good)),
         |brute AS (
         |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
         |    b.c_acctbal tv,
         |    (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
         |  FROM bad a CROSS JOIN f b),
         |pairs AS (
         |  SELECT * FROM cand WHERE qid IN (SELECT qid FROM good)
         |  UNION ALL SELECT * FROM brute),
         |-- k+1 nearest INCLUDING self; min_bound 1e-9 then drops the
         |-- self pair (and exact feature duplicates) from the average
         |kept AS (
         |  SELECT * FROM (
         |    SELECT qid, seg, tv, SQRT(d2) d,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) rk
         |    FROM pairs)
         |  WHERE rk <= 6 AND d >= 1e-9),
         |knn AS (
         |  SELECT qid, AVG(tv) knn_avg,
         |    SUM(tv / d) FILTER (d < 30.0)
         |      / SUM(1.0 / d) FILTER (d < 30.0) knn_wavg
         |  FROM kept GROUP BY 1)
         |-- anchor on f, LEFT JOIN: a query whose k+1 nearest are ALL
         |-- zero-distance duplicates (the sf1 fixture creates this by
         |-- construction) has an empty `kept` and a NULL average on the
         |-- Spark side — the segment row must still exist (same fix as
         |-- the q_sx_knn_point twin)
         |SELECT f.c_mktsegment,
         |  ROUND(AVG(knn.knn_avg), 4) AS avg_knn_avg,
         |  ROUND(AVG(knn.knn_wavg), 4) AS avg_knn_wavg
         |FROM f LEFT JOIN knn ON knn.qid = f.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_nb_cnt" ->
      s"""WITH f AS ($featSql),
         |-- radius-only grid count, cell = radius 5.0: the 3x3
         |-- neighborhood provably contains every pair with d <= 5, so
         |-- no fallback branch is needed (see pairsSql rationale)
         |g AS (
         |  SELECT f.*, CAST(FLOOR(f1 / 5.0) AS BIGINT) cx,
         |    CAST(FLOOR(f2 / 5.0) AS BIGINT) cy
         |  FROM f),
         |cnt AS (
         |  SELECT a.c_custkey qid, COUNT(*) n
         |  FROM (SELECT g.*, g.cx + dx.d px, g.cy + dy.d py
         |        FROM g, (VALUES (-1), (0), (1)) dx(d),
         |             (VALUES (-1), (0), (1)) dy(d)) a
         |  JOIN g b ON b.cx = a.px AND b.cy = a.py
         |    AND a.c_custkey <> b.c_custkey
         |  WHERE (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) <= 25.0
         |  GROUP BY 1)
         |SELECT c_mktsegment,
         |  ROUND(AVG(COALESCE(n, 0)), 6) AS avg_nb_cnt,
         |  MAX(COALESCE(n, 0))::INT AS max_nb_cnt
         |FROM f LEFT JOIN cnt ON cnt.qid = f.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_radius" ->
      s"""WITH $pairsSql,
         |within AS (
         |  SELECT qid, seg, cid,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) rk
         |  FROM pairs WHERE d2 <= 9.0),
         |per_q AS (
         |  SELECT f.c_custkey, f.c_mktsegment,
         |    COALESCE(w.n, 0) n, COALESCE(w.first_id, 0) first_id
         |  FROM f LEFT JOIN (
         |    SELECT qid, COUNT(*) n,
         |      MIN(CASE WHEN rk = 1 THEN cid END) first_id
         |    FROM within GROUP BY 1) w ON w.qid = f.c_custkey)
         |SELECT c_mktsegment,
         |  SUM(n)::BIGINT AS n_pairs,
         |  SUM(first_id)::BIGINT AS sum_first_id
         |FROM per_q GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_freq" ->
      s"""WITH $pairsSql,
         |kf AS (
         |  SELECT cid nb_id, COUNT(*) freq FROM ranked WHERE rk <= 3
         |  GROUP BY 1),
         |rf AS (
         |  SELECT cid nb_id, COUNT(*) rfreq FROM pairs WHERE d2 <= 9.0
         |  GROUP BY 1)
         |SELECT f.c_mktsegment,
         |  SUM(COALESCE(kf.freq, 0))::BIGINT AS knn_freq_sum,
         |  MAX(COALESCE(kf.freq, 0))::BIGINT AS knn_freq_max,
         |  SUM(COALESCE(rf.rfreq, 0))::BIGINT AS radius_freq_sum
         |FROM f LEFT JOIN kf ON kf.nb_id = f.c_custkey
         |LEFT JOIN rf ON rf.nb_id = f.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_within" ->
      s"""WITH f AS ($featSql),
         |d AS (
         |  SELECT c_custkey, c_mktsegment,
         |    (f1 - 50.0) * (f1 - 50.0) + (f2 - 50.0) * (f2 - 50.0) d2,
         |    ROW_NUMBER() OVER (ORDER BY
         |      (f1 - 50.0) * (f1 - 50.0) + (f2 - 50.0) * (f2 - 50.0),
         |      c_custkey) rk
         |  FROM f)
         |SELECT c_mktsegment,
         |  SUM(CASE WHEN rk <= 100 THEN 1 ELSE 0 END)::BIGINT AS n_knn100,
         |  SUM(CASE WHEN SQRT(d2) <= 30.0 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_within30
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_join" ->
      """WITH l AS (
        |  SELECT c_custkey cid, c_acctbal / 100.0 f1,
        |    (c_custkey * 7919 % 1000) / 10.0 f2 FROM customer),
        |r AS (
        |  SELECT s_suppkey sid, s_acctbal / 100.0 f1,
        |    (s_suppkey * 7919 % 1000) / 10.0 f2 FROM supplier),
        |-- exact grid-cell candidates over the supplier corpus (see
        |-- pairsSql rationale): probes with < 2 candidates within the
        |-- 3.0 cell radius fall back to brute force
        |gr AS MATERIALIZED (
        |  SELECT r.*, CAST(FLOOR(f1 / 3.0) AS BIGINT) cx,
        |    CAST(FLOOR(f2 / 3.0) AS BIGINT) cy
        |  FROM r),
        |cand AS MATERIALIZED (
        |  SELECT a.cid, b.sid,
        |    (a.f1 - b.f1) * (a.f1 - b.f1)
        |      + (a.f2 - b.f2) * (a.f2 - b.f2) d2
        |  FROM (SELECT l.*, CAST(FLOOR(f1 / 3.0) AS BIGINT) + dx.d px,
        |          CAST(FLOOR(f2 / 3.0) AS BIGINT) + dy.d py
        |        FROM l, (VALUES (-1), (0), (1)) dx(d),
        |             (VALUES (-1), (0), (1)) dy(d)) a
        |  JOIN gr b ON b.cx = a.px AND b.cy = a.py
        |  WHERE (a.f1 - b.f1) * (a.f1 - b.f1)
        |      + (a.f2 - b.f2) * (a.f2 - b.f2) <= 9.0),
        |good AS MATERIALIZED (
        |  SELECT cid FROM cand GROUP BY 1 HAVING COUNT(*) >= 2),
        |bad AS MATERIALIZED (
        |  SELECT * FROM l WHERE cid NOT IN (SELECT cid FROM good)),
        |brute AS (
        |  SELECT b.cid, r.sid,
        |    (b.f1 - r.f1) * (b.f1 - r.f1)
        |      + (b.f2 - r.f2) * (b.f2 - r.f2) d2
        |  FROM bad b CROSS JOIN r),
        |d AS (
        |  SELECT * FROM cand WHERE cid IN (SELECT cid FROM good)
        |  UNION ALL SELECT * FROM brute),
        |rk AS (
        |  SELECT cid, sid, d2,
        |    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, sid) rk
        |  FROM d)
        |SELECT cid, sid, rk, ROUND(SQRT(d2), 6) AS dist
        |FROM rk WHERE rk <= 2""".stripMargin,
    "q_sx_knn_point" ->
      s"""WITH fa AS (
         |  SELECT c_custkey, c_mktsegment, c_acctbal,
         |    c_acctbal / 100.0 f1, (c_custkey * 7919 % 1000) / 10.0 f2
         |  FROM customer),
         |q AS (SELECT * FROM fa WHERE c_custkey %
         |  (CASE WHEN (SELECT COUNT(*) FROM customer) > 20000
         |        THEN 971 ELSE 97 END) = 0),
         |pairs AS (
         |  SELECT a.c_custkey qid, a.c_mktsegment seg, b.c_custkey cid,
         |    (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
         |  FROM q a JOIN fa b ON a.c_custkey <> b.c_custkey),
         |ranked AS (
         |  SELECT qid, seg, cid, d2,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) rk
         |  FROM pairs),
         |kth AS (
         |  SELECT qid, seg, SQRT(MAX(CASE WHEN rk = 3 THEN d2 END)) kd,
         |    MAX(CASE WHEN rk = 1 THEN cid END) nn1,
         |    SUM(CASE WHEN d2 <= 25.0 THEN 1 ELSE 0 END) nbc,
         |    SUM(CASE WHEN d2 <= 9.0 THEN 1 ELSE 0 END) nr,
         |    MIN(CASE WHEN rk = 1 AND d2 <= 9.0 THEN cid END) fid
         |  FROM ranked GROUP BY 1, 2),
         |pairs_s AS (
         |  SELECT a.c_custkey qid, b.c_acctbal tv, b.c_custkey cid,
         |    (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
         |  FROM q a CROSS JOIN fa b),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT qid, tv, SQRT(d2) d,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) rk
         |    FROM pairs_s)
         |  WHERE rk <= 6 AND d >= 1e-9),
         |knn AS (SELECT qid, AVG(tv) knn_avg FROM kept GROUP BY 1)
         |SELECT seg AS c_mktsegment,
         |  ROUND(AVG(kd), 6) AS avg_kth_dist,
         |  SUM(nn1)::BIGINT AS sum_nn1,
         |  ROUND(AVG(knn_avg), 4) AS avg_knn_avg,
         |  ROUND(AVG(nbc), 6) AS avg_nb_cnt,
         |  SUM(nr)::BIGINT AS n_rpairs,
         |  SUM(COALESCE(fid, 0))::BIGINT AS sum_first_id
         |FROM kth LEFT JOIN knn USING (qid)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // LEFT JOIN knn, not INNER: knnAvg's reference contract drops
    // neighbors under min_bound=1e-9 from the average, so a query
    // whose k+1 nearest are ALL zero-distance exact duplicates (the
    // MakeScale sf1 fixture: every customer's copies share acctbal
    // AND custkey*7919%1000 — offset 15000 ≡ 0 mod 1000) gets a NULL
    // knn_avg on the Spark side; an inner join would drop the qid
    // entirely and desync the other five aggregates.
    "q_sx_knn_freq" ->
      s"""WITH f AS ($featSql),
         |q AS (SELECT * FROM f WHERE c_custkey % 97 = 0),
         |pairs AS (
         |  SELECT a.c_custkey qid, b.c_custkey cid,
         |    (a.f1 - b.f1) * (a.f1 - b.f1)
         |      + (a.f2 - b.f2) * (a.f2 - b.f2) AS d2
         |  FROM q a JOIN f b ON a.c_custkey <> b.c_custkey),
         |ranked AS (
         |  SELECT qid, cid,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) rk
         |  FROM pairs),
         |kf AS (
         |  SELECT cid nb_id, COUNT(*) freq FROM ranked WHERE rk <= 3
         |  GROUP BY 1)
         |SELECT f.c_mktsegment,
         |  SUM(COALESCE(kf.freq, 0))::BIGINT AS knn_freq_sum,
         |  MAX(COALESCE(kf.freq, 0))::BIGINT AS knn_freq_max
         |FROM f LEFT JOIN kf ON kf.nb_id = f.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sx_knn_join" ->
      """WITH l AS (
        |  SELECT c_custkey cid, c_acctbal / 100.0 f1,
        |    (c_custkey * 7919 % 1000) / 10.0 f2 FROM customer
        |  WHERE c_custkey % 97 = 0),
        |r AS (
        |  SELECT s_suppkey sid, s_acctbal / 100.0 f1,
        |    (s_suppkey * 7919 % 1000) / 10.0 f2 FROM supplier),
        |d AS (
        |  SELECT l.cid, r.sid,
        |    (l.f1 - r.f1) * (l.f1 - r.f1)
        |      + (l.f2 - r.f2) * (l.f2 - r.f2) d2
        |  FROM l CROSS JOIN r),
        |rk AS (
        |  SELECT cid, sid, d2,
        |    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, sid) rk
        |  FROM d)
        |SELECT cid, sid, rk, ROUND(SQRT(d2), 6) AS dist
        |FROM rk WHERE rk <= 2""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{RandomGen, Strings}
import graft.util.Expander

/** Driver-contract queries for SURVEY §2.5 random generators, §2.8
  * vocabulary string ops, §2.2 distance filters, §2.14 expander.
  * Random outputs can't be bit-compared cross-engine → structural
  * oracles (exact counts + invariant booleans), mirroring the
  * reference's own engine-compat smoke tests (tests/test_many.py:11). */
object MiscQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_random_gen" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("u", RandomGen.randomUniform(10.0, 20.0, 42))
        .withColumn("i", RandomGen.randomInt(0, 5, 43))
        .withColumn("g", RandomGen.randomNormal(100.0, 5.0, 44))
        .withColumn("e", RandomGen.randomExp(0.5, 45))
        .withColumn("b", RandomGen.randomBinomial(10, 0.3, 46))
        .withColumn("str", RandomGen.randomStr(8, 47)(col("event_id")))
        .withColumn("nl", RandomGen.randomNull(col("value"), 0.5, 48))
        .withColumn("p", RandomGen.perturb(col("value"), 0.1, 49))
        .withColumn("j", RandomGen.jitter(col("value"), 1.0, 50))
      ev.agg(
        count(lit(1)).as("n"),
        (min(col("u")) >= 10.0 && max(col("u")) < 20.0).as("u_in_range"),
        (min(col("i")) >= 0 && max(col("i")) <= 4 &&
          countDistinct(col("i")) === 5).as("i_in_range"),
        (abs(avg(col("g")) - 100.0) < 1.0).as("g_centered"),
        (min(col("e")) >= 0.0 && abs(avg(col("e")) - 2.0) < 0.5)
          .as("e_positive"),
        (min(col("b")) >= 0 && max(col("b")) <= 10 &&
          abs(avg(col("b")) - 3.0) < 0.5).as("b_in_range"),
        (min(length(col("str"))) === 8 && max(length(col("str"))) === 8 &&
          countDistinct(col("str")) > count(lit(1)) * 0.5).as("str_ok"),
        (sum(col("nl").isNull.cast("long")) > count(lit(1)) * 0.4 &&
          sum(col("nl").isNull.cast("long")) < count(lit(1)) * 0.6)
          .as("null_frac_ok"),
        // reference range is [-eps/2, eps/2) (stats.py:420)
        (max(abs(col("p") - col("value"))) <= 0.05).as("perturb_bounded"),
        (abs(avg(col("j") - col("value"))) < 0.1).as("jitter_centered"))
    }),
    "q_str_vocab" -> ((s, dir) => {
      val vocab = Seq("promo", "standard", "economy", "small", "large")
      val d = t(s, dir, "part")
        .withColumn("w", lower(split(col("p_type"), " ").getItem(0)))
        .withColumn("nearest", Strings.strNearest(col("w"), vocab))
        .withColumn("mapped", Strings.mapWords(lower(col("p_type")),
          Map("brushed" -> "matte", "polished" -> "shiny")))
        .withColumn("nfc_len",
          length(Strings.normalizeString(col("p_name"), "NFC")))
      d.groupBy(col("p_brand"))
        .agg(
          count(when(col("nearest") === "promo", 1)).as("n_promo"),
          countDistinct(col("nearest")).as("n_distinct_nearest"),
          sum(length(col("mapped"))).as("mapped_len"),
          sum(col("nfc_len")).as("nfc_len"),
          count(when(levenshtein(col("w"), lit("standard")) <= 3, 1))
            .as("n_lev3"),
          count(when(Strings.strHamming(
            substring(concat(col("w"), lit("########")), 1, 8),
            lit("standard")) <= 5, 1)).as("n_ham5"),
          count(when(Strings.similarToVocab(col("w"),
            Seq("promo", "standard"), 0.5, "lv", "any"), 1))
            .as("n_similar"),
          // the reference's AGGREGATE str_nearest: per group, the value
          // of w nearest to the word within threshold (lv metric)
          Strings.strNearest(col("w"), "standard", 3, "lv")
            .as("nearest_std"))
        .orderBy("p_brand")
    }),
    "q_expander" -> ((s, dir) => {
      // reference E signature: string mappings incl. the special
      // 'len' (single __len__ column) and 'null_rate', plus a
      // customizer entry (expander.py:6)
      val exp = Expander.expand(Seq("l_quantity", "l_tax"),
        Seq("mean6", "max", "null_count", "null_rate", "len"),
        "_", "__len__",
        Map("mean6" -> (c => round(avg(c), 6))))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(exp.head, exp.tail: _*)
        .orderBy("l_returnflag")
    }),
    "q_salted_agg" -> ((s, dir) => {
      // skew-safe two-phase agg must equal the direct groupBy
      graft.ops.ScaleOps.saltedAgg(t(s, dir, "lineitem"),
          Seq("l_returnflag"), salt = 8,
          Seq(("sum", "l_quantity", "sum_qty"),
            ("avg", "l_extendedprice", "avg_price"),
            ("min", "l_discount", "min_disc"),
            ("max", "l_discount", "max_disc"),
            ("count", "l_orderkey", "n")))
        .select(col("l_returnflag"),
          round(col("sum_qty"), 2).as("sum_qty"),
          round(col("avg_price"), 4).as("avg_price"),
          col("min_disc"), col("max_disc"), col("n"))
        .orderBy("l_returnflag")
    }),
    "q_range_join" -> ((s, dir) => {
      // every (event, supplier) pair where the event value falls in the
      // supplier's ±2 band around s_acctbal/25 — binned equi-join shape
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("value"))
      val su = t(s, dir, "supplier")
        .select(col("s_suppkey"),
          (col("s_acctbal") / 25.0 - 2.0).as("lo"),
          (col("s_acctbal") / 25.0 + 2.0).as("hi"))
      graft.ops.ScaleOps.binnedPointIntervalJoin(ev, "value",
          su, "lo", "hi", binWidth = 4.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("s_suppkey")).as("sum_suppkey"),
          // decimal-exact: value is 2-dp; at sf1 pair counts the
          // double sum's FP error crosses the 2-dp rounding lattice
          sum(col("value").cast("decimal(18,2)"))
            .cast("double").as("sum_value"))
        .orderBy("event_type")
    }),
    "q_overlap_join" -> ((s, dir) => {
      // supplier vs customer account-balance bands that overlap —
      // interval×interval join, binned (no cartesian); each pair is
      // accepted only in its canonical bin so the count is exact
      val su = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"),
          (col("s_acctbal") / 25.0 - 2.0).as("slo"),
          (col("s_acctbal") / 25.0 + 2.0).as("shi"))
      val cu = t(s, dir, "customer")
        .select(col("c_custkey"),
          (col("c_acctbal") / 25.0 - 1.5).as("clo"),
          (col("c_acctbal") / 25.0 + 1.5).as("chi"))
      graft.ops.ScaleOps.binnedIntervalOverlapJoin(su, "slo", "shi",
          cu, "clo", "chi", binWidth = 4.0)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("c_custkey")).as("sum_custkey"))
        .orderBy("s_nationkey")
    }),
    "q_topk_group" -> ((s, dir) => {
      // top-3 orders by totalprice per priority — bounded-heap
      // aggregate, not a window sort (k rows per partition shuffle)
      graft.ops.ScaleOps.topKPerGroup(t(s, dir, "orders"),
          Seq(col("o_orderpriority")), col("o_totalprice"),
          col("o_orderkey"), 3)
        .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
          round(col("score"), 2).as("price"),
          col("id").as("o_orderkey"))
        .orderBy("o_orderpriority", "rk")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_topk_group" ->
      """SELECT o_orderpriority, rk, price, o_orderkey FROM (
        |  SELECT o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |    ROUND(o_totalprice, 2) AS price, o_orderkey
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "q_overlap_join" ->
      """SELECT s_nationkey,
        |  COUNT(*) AS n_pairs,
        |  SUM(c_custkey)::BIGINT AS sum_custkey
        |FROM supplier, customer
        |WHERE s_acctbal / 25.0 + 2.0 >= c_acctbal / 25.0 - 1.5
        |  AND c_acctbal / 25.0 + 1.5 >= s_acctbal / 25.0 - 2.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  MIN(l_discount) AS min_disc,
        |  MAX(l_discount) AS max_disc,
        |  COUNT(l_orderkey) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_join" ->
      """SELECT e.event_type,
        |  COUNT(*) AS n_pairs,
        |  SUM(s.s_suppkey)::BIGINT AS sum_suppkey,
        |  SUM(e.value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events e JOIN supplier s
        |  ON e.value >= s.s_acctbal / 25.0 - 2.0
        | AND e.value <= s.s_acctbal / 25.0 + 2.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_random_gen" ->
      """SELECT COUNT(*) AS n, TRUE AS u_in_range, TRUE AS i_in_range,
        |  TRUE AS g_centered, TRUE AS e_positive, TRUE AS b_in_range,
        |  TRUE AS str_ok, TRUE AS null_frac_ok, TRUE AS perturb_bounded,
        |  TRUE AS jitter_centered
        |FROM events""".stripMargin,
    "q_str_vocab" -> {
      // vocab with position: strNearest tie-breaks by FIRST match in
      // vocab order (Scala minBy), so the oracle must too
      val vocabSql = "VALUES (0, 'promo'), (1, 'standard'), " +
        "(2, 'economy'), (3, 'small'), (4, 'large')"
      s"""WITH d AS (
         |  SELECT p_brand, p_name, p_type,
         |    LOWER(string_split(p_type, ' ')[1]) w
         |  FROM part),
         |near AS (
         |  SELECT d.p_brand, d.w, v.col1 cand,
         |    ROW_NUMBER() OVER (PARTITION BY d.p_brand, d.w, d.rowid
         |      ORDER BY levenshtein(d.w, v.col1), v.col0) rk,
         |    d.rowid
         |  FROM (SELECT *, ROW_NUMBER() OVER () rowid FROM d) d
         |  CROSS JOIN ($vocabSql) v(col0, col1)),
         |sel AS (
         |  SELECT p_brand, w, cand nearest FROM near WHERE rk = 1),
         |m AS (
         |  SELECT p_brand,
         |    array_to_string(list_transform(
         |      string_split(LOWER(p_type), ' '),
         |      x -> CASE x WHEN 'brushed' THEN 'matte'
         |        WHEN 'polished' THEN 'shiny' ELSE x END), ' ') mapped,
         |    LENGTH(NFC_NORMALIZE(p_name)) nfc_len,
         |    LOWER(string_split(p_type, ' ')[1]) w
         |  FROM part)
         |SELECT m.p_brand,
         |  (SELECT COUNT(*) FROM sel s2
         |   WHERE s2.p_brand = m.p_brand AND s2.nearest = 'promo')
         |    AS n_promo,
         |  (SELECT COUNT(DISTINCT s2.nearest) FROM sel s2
         |   WHERE s2.p_brand = m.p_brand) AS n_distinct_nearest,
         |  SUM(LENGTH(mapped))::BIGINT AS mapped_len,
         |  SUM(nfc_len)::BIGINT AS nfc_len,
         |  COUNT(CASE WHEN levenshtein(w, 'standard') <= 3 THEN 1 END)
         |    AS n_lev3,
         |  COUNT(CASE WHEN hamming(LEFT(w || '########', 8), 'standard')
         |    <= 5 THEN 1 END) AS n_ham5,
         |  COUNT(CASE WHEN
         |      1 - levenshtein(w, 'promo')::DOUBLE
         |        / GREATEST(LENGTH(w), 5) >= 0.5
         |      OR 1 - levenshtein(w, 'standard')::DOUBLE
         |        / GREATEST(LENGTH(w), 8) >= 0.5
         |    THEN 1 END) AS n_similar,
         |  (SELECT m2.w FROM m m2
         |   WHERE m2.p_brand = m.p_brand
         |     AND levenshtein(m2.w, 'standard') <= 3
         |   ORDER BY levenshtein(m2.w, 'standard'), m2.w LIMIT 1)
         |    AS nearest_std
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_expander" ->
      """SELECT l_returnflag,
        |  ROUND(AVG(l_quantity), 6) AS l_quantity_mean6,
        |  MAX(l_quantity) AS l_quantity_max,
        |  SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS l_quantity_null_count,
        |  AVG(CASE WHEN l_quantity IS NULL THEN 1.0 ELSE 0.0 END)
        |    AS l_quantity_null_rate,
        |  ROUND(AVG(l_tax), 6) AS l_tax_mean6,
        |  MAX(l_tax) AS l_tax_max,
        |  SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS l_tax_null_count,
        |  AVG(CASE WHEN l_tax IS NULL THEN 1.0 ELSE 0.0 END)
        |    AS l_tax_null_rate,
        |  COUNT(*)::BIGINT AS __len__
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eda.EdaOps
import graft.sample.SampleOps

/** Driver-contract queries for SURVEY §2.12 (sampling/splitting) and
  * §2.13 (EDA reports). Random sampling can't be bit-compared across
  * engines, so sampling queries verify the *deterministic* structure:
  * exact counts from volume-neutral caps and stratified percent-rank
  * cuts, plus invariant booleans for Bernoulli paths. */
object EdaQueries extends QueryPack {

  /** events with a derived nullable numeric + flags, shared with the
    * oracle. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("v_null",
        when(col("value") < 1.0, lit(null)).otherwise(col("value")))

  private val evSql =
    """SELECT *, CASE WHEN value < 1.0 THEN NULL ELSE value END v_null
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // col/row validation reports (diagnosis.py:236/:268): the rule
    // sets are fixed, so which column rules fail and the per-reason
    // violating-row counts are plain SQL facts
    "q_eda_validation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val colRep = EdaOps.colValidation(li, Seq(
          ("l_quantity", min(col("l_quantity")) >= 1, "qty >= 1"),
          ("l_discount", max(col("l_discount")) <= 0.05, "disc cap"),
          ("l_tax", min(col("l_tax")) >= 0, "tax >= 0")))
        .select(lit("col").as("kind"), col("column").as("name"),
          lit(1L).as("n"))
      val rowRep = EdaOps.rowValidation(li,
          Seq((col("l_quantity") <= 30, "qty > 30"),
            (col("l_discount") <= 0.06, "disc > 0.06")),
          idCol = Some((col("l_orderkey") * 10 + col("l_linenumber"))
            .as("rid")))
        .groupBy(col("__reason__"))
        .agg(count(lit(1)).as("n"))
        .select(lit("row").as("kind"), col("__reason__").as("name"),
          col("n"))
      colRep.unionByName(rowRep).orderBy("kind", "name")
    }),
    "q_split_ratio" -> ((s, dir) => {
      SampleOps.splitByRatio(t(s, dir, "events"),
          Seq(("train", 0.7), ("val", 0.2), ("test", 0.1)),
          stratifyBy = Seq("event_type"))
        .groupBy(col("event_type"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "split")
    }),
    "q_seeded_sample" -> ((s, dir) => {
      // exact k-minimum-values sample: the 500 docs with the smallest
      // md5(id ":7") — deterministic and engine-independent, so the
      // oracle reproduces the EXACT member set, not just its size.
      SampleOps.seededSample(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          col("doc_id"), 500, seed = 7)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("source")
    }),
    "q_epoch_shuffle" -> ((s, dir) => {
      // deterministic per-epoch shuffle: order and 1-based positions
      // come from md5(id ":" epoch) — identical in DuckDB, so the
      // order-sensitive checksum gates the whole permutation; the
      // positions ride the range-partitioned global cumsum (no
      // single-partition window).
      val sh = SampleOps.epochShufflePositions(
        t(s, dir, "documents").filter(col("doc_id") < 5000)
          .select(col("doc_id"), col("source")),
        col("doc_id"), epoch = 3)
      sh.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("position")).as("pos_sum"),
          sum(col("position") * (col("doc_id") + 1)).as("order_checksum"),
          min(col("position")).as("min_pos"))
        .orderBy("source")
    }),
    "q_temp_sample" -> ((s, dir) => {
      // temperature-based domain mixing (mT5 rule, alpha = 0.5):
      // integer weights w_d = floor(sqrt(n_d)) and pure-integer
      // targets t_d = min(n_d, 3000*w_d div W) make the selection
      // exactly engine-reproducible; membership is the t_d smallest
      // md5(id ":7") per domain, so the oracle rebuilds the EXACT
      // selected set.
      val sel = SampleOps.temperatureSample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"), alpha = 0.5,
        targetTotal = 3000, seed = 7)
      sel.groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"),
          sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("min_id"))
        .orderBy("source")
    }),
    "q_volume_neutral" -> ((s, dir) => {
      SampleOps.volumeNeutral(t(s, dir, "events"), Seq("event_type"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    // volume_neutral with `control` (sample_and_split.py:224): the cap
    // is the min by-group size INSIDE each control group — group sizes
    // after equalization are deterministic
    "q_vn_control" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("ctl", col("user_id") % 3)
      SampleOps.volumeNeutral(df, Seq("event_type"), control = Seq("ctl"))
        .groupBy(col("ctl"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("ctl", "event_type")
    }),
    // downsample with exact-n conditions (sample_and_split.py:238):
    // kept counts are min(n, subset size); unmatched rows untouched
    "q_downsample_where" -> ((s, dir) => {
      SampleOps.downsampleWhere(t(s, dir, "events"), Seq(
          (col("event_type") === "click", Left(100)),
          (col("event_type") === "view", Left(50))))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "q_sample_counts" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val n = SampleOps.sampleN(events, 500).count()
      val down = SampleOps.downsample(events, "event_type",
        Map("click" -> 0.5))
      val clickKept = down.filter(col("event_type") === "click").count()
      val clickTotal = events.filter(col("event_type") === "click").count()
      val othersKept = down.filter(col("event_type") =!= "click").count()
      val othersTotal = events.filter(col("event_type") =!= "click").count()
      s.createDataFrame(Seq((n,
        clickKept > 0 && clickKept < clickTotal,
        othersKept == othersTotal)))
        .toDF("sample_n", "click_downsampled", "others_untouched")
    }),
    "q_eda_special" -> ((s, dir) => {
      EdaOps.specialValuesReport(ev(s, dir), Seq("v_null", "value"))
        .orderBy("column")
    }),
    "q_eda_profile" -> ((s, dir) => {
      EdaOps.numericProfile(ev(s, dir), Seq("v_null", "value"),
          nBins = 4, histogram = true)
        .select(col("column"), col("non_null_cnt"),
          round(col("null_pct"), 6).as("null_pct"),
          round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"),
          col("min"), round(col("q1"), 6).as("q1"),
          col("median"),
          round(col("q3"), 6).as("q3"), col("max"),
          round(col("iqr"), 6).as("iqr"), col("outlier_cnt"),
          element_at(col("hist"), 1).as("h1"),
          element_at(col("hist"), 4).as("h4"))
        .orderBy("column")
    }),
    // reference null_corr: corr between the NULL INDICATORS of every
    // column pair, invalid (all/never-null) columns skipped
    "q_null_corr" -> ((s, dir) => {
      val df = ev(s, dir)
        .withColumn("v_null2",
          when(col("user_id") % 7 === 0, lit(null)).otherwise(col("value")))
      EdaOps.nullCorr(df, Seq("v_null", "v_null2", "value", "user_id"))
        .select(col("column_1"), col("column_2"),
          round(col("null_corr"), 6).as("null_corr"))
        .orderBy("column_1", "column_2")
    }),
    // DIA.corr wide table, spearman path (pearson is q_corr_matrix,
    // kendall is q_kendall_tau — this exercises the shared rank plan)
    "q_corr_table" -> ((s, dir) => {
      val df = t(s, dir, "events")
      EdaOps.corrTable(df, Seq("value", "user_id"),
          Seq("value", "user_id", "event_id"), "spearman")
        .select(col("column"), round(col("value"), 6).as("r_value"),
          round(col("user_id"), 6).as("r_user"),
          round(col("event_id"), 6).as("r_event"))
        .orderBy("column")
    }),
    "q_str_stats" -> ((s, dir) => {
      EdaOps.strStats(t(s, dir, "documents"), Seq("text", "lang"))
        .select(col("column"), col("null_cnt"), col("n_unique"),
          col("min_len"), round(col("avg_len"), 6).as("avg_len"),
          col("max_len"))
        .orderBy("column")
    }),
    "q_eda_infer" -> ((s, dir) => {
      val df = ev(s, dir)
        .withColumn("const_col", lit(1))
        .withColumn("bin_col", col("user_id") % 2)
      EdaOps.inferReport(df,
          Seq("const_col", "bin_col", "event_type", "value", "v_null"),
          discreteThreshold = 0.001, discreteMaxValCnt = 10,
          highNullThreshold = 0.005, kDistinct = Some(2))
        .orderBy("column")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_eda_validation" ->
      """WITH rowv AS (
        |  SELECT CASE WHEN NOT (l_quantity <= 30) THEN 'qty > 30'
        |              WHEN NOT (l_discount <= 0.06) THEN 'disc > 0.06'
        |         END r
        |  FROM lineitem),
        |rv AS (
        |  SELECT 'row' AS kind, r AS name, COUNT(*)::BIGINT AS n
        |  FROM rowv WHERE r IS NOT NULL GROUP BY 2),
        |cv AS (
        |  SELECT 'col' AS kind, 'l_discount' AS name, 1::BIGINT AS n
        |  FROM (SELECT MAX(l_discount) m FROM lineitem) WHERE m > 0.05)
        |SELECT * FROM cv UNION ALL SELECT * FROM rv
        |ORDER BY kind, name""".stripMargin,
    "q_seeded_sample" ->
      """WITH s AS (
        |  SELECT source, doc_id FROM documents
        |  ORDER BY md5(doc_id::VARCHAR || ':7') LIMIT 500)
        |SELECT source, COUNT(*)::BIGINT AS n,
        |  SUM(doc_id)::BIGINT AS id_sum,
        |  MIN(doc_id)::BIGINT AS min_id, MAX(doc_id)::BIGINT AS max_id
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH sh AS (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR || ':3'))
        |      AS position
        |  FROM documents WHERE doc_id < 5000)
        |SELECT source, COUNT(*)::BIGINT AS n,
        |  SUM(position)::BIGINT AS pos_sum,
        |  SUM(position * (doc_id + 1))::BIGINT AS order_checksum,
        |  MIN(position)::BIGINT AS min_pos
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_temp_sample" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, n, FLOOR(SQRT(n))::BIGINT AS wt FROM c),
        |tot AS (SELECT SUM(wt) AS tw FROM w),
        |tg AS (
        |  SELECT source, LEAST(n, (3000 * wt) // GREATEST(1, tw)) AS t
        |  FROM w, tot),
        |r AS (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR || ':7')) AS rk
        |  FROM documents),
        |sel AS (
        |  SELECT r.source, r.doc_id
        |  FROM r JOIN tg ON tg.source = r.source
        |  WHERE r.rk <= tg.t)
        |SELECT source, COUNT(*)::BIGINT AS n_selected,
        |  SUM(doc_id)::BIGINT AS id_sum, MIN(doc_id)::BIGINT AS min_id
        |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_split_ratio" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) n FROM events GROUP BY 1),
        |r AS (
        |  SELECT event_type, UNNEST(generate_series(0, (n - 1)::INT)) i, n
        |  FROM g),
        |lab AS (
        |  SELECT event_type,
        |    CASE WHEN i / (n - 1.0) <= 0.7 THEN 'train'
        |         WHEN i / (n - 1.0) <= 0.9 THEN 'val'
        |         ELSE 'test' END split
        |  FROM r)
        |SELECT event_type, split, COUNT(*) AS n
        |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_volume_neutral" ->
      """WITH g AS (SELECT event_type, COUNT(*) n FROM events GROUP BY 1),
        |m AS (SELECT MIN(n) cap FROM g)
        |SELECT event_type, LEAST(n, cap)::BIGINT AS n
        |FROM g, m ORDER BY 1""".stripMargin,
    "q_vn_control" ->
      """WITH base AS (SELECT user_id % 3 AS ctl, event_type FROM events),
        |g AS (SELECT ctl, event_type, COUNT(*) n FROM base GROUP BY 1, 2),
        |m AS (SELECT ctl, MIN(n) cap FROM g GROUP BY 1)
        |SELECT g.ctl, g.event_type, m.cap::BIGINT AS n
        |FROM g JOIN m USING (ctl) ORDER BY 1, 2""".stripMargin,
    "q_downsample_where" ->
      """WITH g AS (SELECT event_type, COUNT(*) n FROM events GROUP BY 1)
        |SELECT event_type,
        |  CASE WHEN event_type = 'click' THEN LEAST(n, 100)
        |       WHEN event_type = 'view' THEN LEAST(n, 50)
        |       ELSE n END::BIGINT AS n
        |FROM g ORDER BY 1""".stripMargin,
    "q_sample_counts" ->
      """SELECT 500::BIGINT AS sample_n, TRUE AS click_downsampled,
        |  TRUE AS others_untouched""".stripMargin,
    "q_eda_special" ->
      s"""WITH e AS ($evSql),
         |u AS (
         |  SELECT 'v_null' AS "column",
         |    SUM(CASE WHEN v_null IS NULL THEN 1 ELSE 0 END)::BIGINT n_null,
         |    0::BIGINT n_inf,
         |    SUM(CASE WHEN isnan(v_null) THEN 1 ELSE 0 END)::BIGINT n_nan,
         |    SUM(CASE WHEN v_null = 0 THEN 1 ELSE 0 END)::BIGINT n_zero
         |  FROM e
         |  UNION ALL
         |  SELECT 'value',
         |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
         |    0::BIGINT,
         |    SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END)::BIGINT,
         |    SUM(CASE WHEN value = 0 THEN 1 ELSE 0 END)::BIGINT
         |  FROM e)
         |SELECT * FROM u ORDER BY "column"""".stripMargin,
    "q_eda_profile" ->
      s"""WITH e AS ($evSql),
         |prof AS (
         |  SELECT 'v_null' AS c, COUNT(*)::DOUBLE len,
         |    COUNT(v_null)::BIGINT cnt, AVG(v_null) mean,
         |    STDDEV_SAMP(v_null) std, MIN(v_null) mn,
         |    quantile_cont(v_null, 0.25) q1,
         |    quantile_cont(v_null, 0.5) med,
         |    quantile_cont(v_null, 0.75) q3, MAX(v_null) mx
         |  FROM e
         |  UNION ALL
         |  SELECT 'value', COUNT(*)::DOUBLE, COUNT(value)::BIGINT,
         |    AVG(value), STDDEV_SAMP(value), MIN(value),
         |    quantile_cont(value, 0.25), quantile_cont(value, 0.5),
         |    quantile_cont(value, 0.75), MAX(value)
         |  FROM e),
         |-- IQR-fence outliers and 4-bin histogram against the
         |-- profile's quantiles (same second-pass shape as the engine)
         |ext AS (
         |  SELECT p.c,
         |    SUM(CASE WHEN v < p.q1 - 1.5 * (p.q3 - p.q1)
         |          OR v > p.q3 + 1.5 * (p.q3 - p.q1)
         |        THEN 1 ELSE 0 END)::BIGINT outlier_cnt,
         |    SUM(CASE WHEN LEAST(GREATEST(
         |        FLOOR((v - p.mn) / (p.mx - p.mn) * 4), 0), 3) = 0
         |        THEN 1 ELSE 0 END)::BIGINT h1,
         |    SUM(CASE WHEN LEAST(GREATEST(
         |        FLOOR((v - p.mn) / (p.mx - p.mn) * 4), 0), 3) = 3
         |        THEN 1 ELSE 0 END)::BIGINT h4
         |  FROM prof p JOIN (
         |    SELECT 'v_null' AS c, v_null AS v FROM e
         |    UNION ALL SELECT 'value', value FROM e) x
         |    ON x.c = p.c AND x.v IS NOT NULL
         |  GROUP BY 1)
         |SELECT p.c AS "column", p.cnt AS non_null_cnt,
         |  ROUND(1 - p.cnt / p.len, 6) AS null_pct,
         |  ROUND(p.mean, 6) AS mean, ROUND(p.std, 6) AS std,
         |  p.mn AS min, ROUND(p.q1, 6) AS q1,
         |  round_even(p.med, 2) AS median, ROUND(p.q3, 6) AS q3,
         |  p.mx AS max, ROUND(p.q3 - p.q1, 6) AS iqr,
         |  x.outlier_cnt, x.h1, x.h4
         |FROM prof p JOIN ext x ON p.c = x.c
         |ORDER BY 1""".stripMargin,
    "q_null_corr" ->
      s"""WITH e AS ($evSql)
         |SELECT 'v_null' AS column_1, 'v_null2' AS column_2,
         |  ROUND(CORR(
         |    CASE WHEN v_null IS NULL THEN 1.0 ELSE 0.0 END,
         |    CASE WHEN user_id % 7 = 0 THEN 1.0 ELSE 0.0 END), 6)
         |    AS null_corr
         |FROM e""".stripMargin,
    "q_corr_table" ->
      """WITH r AS (
        |  SELECT
        |    RANK() OVER (ORDER BY value)
        |      + (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0 rv,
        |    RANK() OVER (ORDER BY user_id)
        |      + (COUNT(*) OVER (PARTITION BY user_id) - 1) / 2.0 ru,
        |    RANK() OVER (ORDER BY event_id)
        |      + (COUNT(*) OVER (PARTITION BY event_id) - 1) / 2.0 re
        |  FROM events)
        |SELECT 'value' AS "column", ROUND(CORR(rv, rv), 6) r_value,
        |  ROUND(CORR(rv, ru), 6) r_user, ROUND(CORR(rv, re), 6) r_event
        |FROM r
        |UNION ALL
        |SELECT 'user_id', ROUND(CORR(ru, rv), 6),
        |  ROUND(CORR(ru, ru), 6), ROUND(CORR(ru, re), 6)
        |FROM r
        |ORDER BY "column"""".stripMargin,
    "q_str_stats" ->
      """WITH u AS (
        |  SELECT 'lang' AS "column",
        |    SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT null_cnt,
        |    COUNT(DISTINCT lang)::BIGINT n_unique,
        |    MIN(LENGTH(lang))::BIGINT min_len,
        |    ROUND(AVG(LENGTH(lang)), 6) avg_len,
        |    MAX(LENGTH(lang))::BIGINT max_len
        |  FROM documents
        |  UNION ALL
        |  SELECT 'text',
        |    SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    COUNT(DISTINCT text)::BIGINT, MIN(LENGTH(text))::BIGINT,
        |    ROUND(AVG(LENGTH(text)), 6), MAX(LENGTH(text))::BIGINT
        |  FROM documents)
        |SELECT * FROM u ORDER BY "column"""".stripMargin,
    // polars n_unique convention: null counts as one distinct value
    "q_eda_infer" ->
      s"""WITH e AS (SELECT *, 1 const_col, user_id % 2 bin_col
         |  FROM ($evSql)),
         |u AS (
         |  SELECT 'bin_col' AS c, COUNT(DISTINCT bin_col)
         |      + CASE WHEN COUNT(*) > COUNT(bin_col) THEN 1 ELSE 0 END nu,
         |    COUNT(*) - COUNT(bin_col) nc, COUNT(*) len FROM e
         |  UNION ALL SELECT 'const_col', COUNT(DISTINCT const_col)
         |      + CASE WHEN COUNT(*) > COUNT(const_col) THEN 1 ELSE 0 END,
         |    COUNT(*) - COUNT(const_col), COUNT(*) FROM e
         |  UNION ALL SELECT 'event_type', COUNT(DISTINCT event_type)
         |      + CASE WHEN COUNT(*) > COUNT(event_type) THEN 1 ELSE 0 END,
         |    COUNT(*) - COUNT(event_type), COUNT(*) FROM e
         |  UNION ALL SELECT 'v_null', COUNT(DISTINCT v_null)
         |      + CASE WHEN COUNT(*) > COUNT(v_null) THEN 1 ELSE 0 END,
         |    COUNT(*) - COUNT(v_null), COUNT(*) FROM e
         |  UNION ALL SELECT 'value', COUNT(DISTINCT value)
         |      + CASE WHEN COUNT(*) > COUNT(value) THEN 1 ELSE 0 END,
         |    COUNT(*) - COUNT(value), COUNT(*) FROM e)
         |SELECT c AS "column", nu::BIGINT AS n_unique,
         |  nu = 1 AS is_const, nu = 2 AS is_binary,
         |  (nu < 10 OR nu < 0.001 * len) AS is_discrete,
         |  nc >= 0.005 * len AS high_null, nu = 2 AS is_k_distinct
         |FROM u ORDER BY 1""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Strings

/** Driver-contract queries for SURVEY §2.8 — string similarity and
  * cleaning. Distances are aggregated (avg per group) so the oracle
  * compares one row per group; DuckDB's built-in levenshtein /
  * damerau_levenshtein / jaro(_winkler)_similarity / hamming / jaccard
  * provide independent implementations of the same published
  * algorithms. */
object StringQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_distances" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .withColumn("a", col("p_name"))
        .withColumn("b", lower(col("p_type")))
      p.groupBy(col("p_brand"))
        .agg(
          round(avg(levenshtein(col("a"), col("b"))), 6).as("lev"),
          round(avg(Strings.strDamerau(col("a"), col("b"))), 6).as("dlev"),
          round(avg(Strings.strJaccard(col("a"), col("b"), 1)), 6)
            .as("jaccard1"),
          round(avg(Strings.strSorensenDice(col("a"), col("b"), 1)), 6)
            .as("dice1"),
          round(avg(Strings.strHamming(
            substring(concat(col("a"), lit("#####")), 1, 5),
            substring(concat(col("b"), lit("#####")), 1, 5))), 6)
            .as("hamming5"),
          round(avg(Strings.strLevenSim(col("a"), col("b"))), 6)
            .as("lev_sim"))
        .orderBy("p_brand")
    }),
    // Jaro/JW follow the rapidfuzz convention (0.7 boost threshold),
    // which DuckDB shares — so the fuzzy metrics get a real SQL twin:
    // jaro/jw via DuckDB built-ins, overlap/tversky via bigram-set
    // algebra. The non-SQL-expressible metrics (osa/lcs/fuzz) are
    // oracle-gated in q_str_golden against independent vectors.
    "q_str_fuzzy" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .withColumn("a", col("p_name"))
        .withColumn("b", lower(col("p_type")))
      p.groupBy(col("p_brand"))
        .agg(
          round(avg(Strings.strJaro(col("a"), col("b"))), 6).as("jaro"),
          round(avg(Strings.strJaroWinkler(col("a"), col("b"))), 6)
            .as("jw"),
          round(avg(Strings.strOverlapCoeff(col("a"), col("b"), 2)), 6)
            .as("overlap2"),
          round(avg(Strings.strTversky(col("a"), col("b"), 0.5, 0.5, 2)),
            6).as("tversky2"))
        .orderBy("p_brand")
    }),
    // Golden fixture: reference-published vectors (tests/test_string.py
    // jaro :95, osa :368, lcs_substr :146, lcs_subseq :165) plus
    // independently computed textbook values; the oracle is a VALUES
    // literal, so every metric is a hard value check.
    "q_str_golden" -> ((s, dir) => {
      import s.implicits._
      val pairs = Seq(
        (1, "FAREMVIEL", "FARMVILLE"), (2, "CA", "ABC"), (3, "AB", "BA"),
        (4, "AGGTAB", "GXTXAYB"), (5, "kitten", "sitting"),
        (6, "common", "common"), (7, "", "test"), (8, "mary", "merry"),
        (9, "DIXON", "DICKSONX"), (10, "apple", "let"))
      pairs.toDF("pair_id", "a", "b")
        .select(col("pair_id"),
          round(Strings.strJaro(col("a"), col("b")), 6).as("jaro"),
          round(Strings.strJaroWinkler(col("a"), col("b")), 6).as("jw"),
          Strings.strOsa(col("a"), col("b")).cast("long").as("osa"),
          Strings.strLcsSubstr(col("a"), col("b")).cast("long")
            .as("lcs_substr"),
          Strings.strLcsSubseq(col("a"), col("b")).cast("long")
            .as("lcs_subseq"),
          round(Strings.strFuzz(col("a"), col("b")), 6).as("fuzz"))
        .orderBy("pair_id")
    }),
    "q_str_clean" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          sum(length(Strings.normalizeWhitespace(col("text"))))
            .as("ws_len"),
          sum(length(Strings.replaceNonAscii(col("text"), "")))
            .as("ascii_len"),
          sum(length(Strings.removeDiacritics(col("text"))))
            .as("nodiac_len"),
          count(when(col("text") =!=
            Strings.normalizeWhitespace(col("text")), 1)).as("n_ws_changed"))
        .orderBy("source")
    }),
    "q_str_case" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(
          sum(length(Strings.toSnakeCase(col("p_name")))).as("snake_len"),
          sum(length(Strings.toCamelCase(col("p_name")))).as("camel_len"),
          sum(length(Strings.toPascalCase(col("p_name"))))
            .as("pascal_len"),
          countDistinct(Strings.toConstantCase(col("p_name")))
            .as("n_const"))
        .orderBy("p_brand")
    }),
    "q_extract_numbers" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("nums", Strings.extractNumbers(col("props")))
        .withColumn("nums_nc",
          Strings.extractNumbers(col("props"), ignoreComma = true))
        .withColumn("joined",
          Strings.extractNumbers(col("props"), joinBy = Some("|")))
        .groupBy(col("event_type"))
        .agg(
          round(sum(element_at(col("nums"), 1).cast("double")), 2)
            .as("sum_k"),
          sum(size(col("nums"))).as("n_nums"),
          sum(size(col("nums_nc"))).as("n_nums_nc"),
          sum(length(col("joined"))).as("joined_len"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_str_fuzzy" ->
      """WITH p AS (
        |  SELECT p_partkey k, p_brand, p_name a, LOWER(p_type) b
        |  FROM part),
        |ga AS (SELECT DISTINCT k, substr(a, s.i, 2) g
        |  FROM p, UNNEST(generate_series(1, LENGTH(a) - 1)) s(i)),
        |gb AS (SELECT DISTINCT k, substr(b, s.i, 2) g
        |  FROM p, UNNEST(generate_series(1, LENGTH(b) - 1)) s(i)),
        |na AS (SELECT k, COUNT(*) n FROM ga GROUP BY 1),
        |nb AS (SELECT k, COUNT(*) n FROM gb GROUP BY 1),
        |cm AS (SELECT ga.k, COUNT(*) c FROM ga
        |  JOIN gb ON ga.k = gb.k AND ga.g = gb.g GROUP BY 1),
        |m AS (
        |  SELECT p.k, p.p_brand, p.a, p.b, na.n na, nb.n nb,
        |    COALESCE(cm.c, 0) c
        |  FROM p JOIN na ON p.k = na.k JOIN nb ON p.k = nb.k
        |  LEFT JOIN cm ON p.k = cm.k)
        |SELECT p_brand,
        |  ROUND(AVG(jaro_similarity(a, b)), 6) AS jaro,
        |  ROUND(AVG(jaro_winkler_similarity(a, b)), 6) AS jw,
        |  ROUND(AVG(c::DOUBLE / LEAST(na, nb)), 6) AS overlap2,
        |  ROUND(AVG(c::DOUBLE / (c + 0.5 * (na - c) + 0.5 * (nb - c))),
        |    6) AS tversky2
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_str_golden" ->
      """SELECT * FROM (VALUES
        |  (1, 0.884259, 0.918981, 3, 3, 7, 0.777778),
        |  (2, 0.0, 0.0, 3, 1, 1, 0.4),
        |  (3, 0.0, 0.0, 1, 1, 1, 0.5),
        |  (4, 0.746032, 0.746032, 4, 1, 4, 0.615385),
        |  (5, 0.746032, 0.746032, 3, 3, 4, 0.615385),
        |  (6, 1.0, 1.0, 0, 6, 6, 1.0),
        |  (7, 0.0, 0.0, 4, 0, 0, 0.0),
        |  (8, 0.783333, 0.805, 2, 2, 3, 0.666667),
        |  (9, 0.766667, 0.813333, 4, 2, 4, 0.615385),
        |  (10, 0.0, 0.0, 4, 2, 2, 0.5))
        |  AS t(pair_id, jaro, jw, osa, lcs_substr, lcs_subseq, fuzz)
        |ORDER BY pair_id""".stripMargin,
    "q_str_distances" ->
      """WITH p AS (
        |  SELECT p_brand, p_name a, LOWER(p_type) b FROM part)
        |SELECT p_brand,
        |  ROUND(AVG(levenshtein(a, b)), 6) AS lev,
        |  ROUND(AVG(damerau_levenshtein(a, b)), 6) AS dlev,
        |  ROUND(AVG(jaccard(a, b)), 6) AS jaccard1,
        |  ROUND(AVG(2 * jaccard(a, b) / (1 + jaccard(a, b))), 6) AS dice1,
        |  ROUND(AVG(hamming(LEFT(a || '#####', 5), LEFT(b || '#####', 5))),
        |    6) AS hamming5,
        |  ROUND(AVG(1 - levenshtein(a, b)::DOUBLE
        |    / GREATEST(LENGTH(a), LENGTH(b))), 6) AS lev_sim
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_str_clean" ->
      """SELECT source,
        |  SUM(LENGTH(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))))::BIGINT
        |    AS ws_len,
        |  SUM(LENGTH(REGEXP_REPLACE(text, '[^\x00-\x7F]', '', 'g')))::BIGINT
        |    AS ascii_len,
        |  SUM(LENGTH(strip_accents(NFC_NORMALIZE(text))))::BIGINT
        |    AS nodiac_len,
        |  COUNT(CASE WHEN text <> TRIM(REGEXP_REPLACE(text, '\s+', ' ',
        |    'g')) THEN 1 END) AS n_ws_changed
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_str_case" ->
      """SELECT p_brand,
        |  SUM(LENGTH(REPLACE(p_name, ' ', '_')))::BIGINT AS snake_len,
        |  SUM(LENGTH(REPLACE(p_name, ' ', '')))::BIGINT AS camel_len,
        |  SUM(LENGTH(REPLACE(p_name, ' ', '')))::BIGINT AS pascal_len,
        |  COUNT(DISTINCT UPPER(REPLACE(p_name, ' ', '_'))) AS n_const
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_extract_numbers" ->
      """SELECT event_type,
        |  ROUND(SUM(CAST(regexp_extract(props, '(-?[0-9]+\.?[0-9]*)', 1)
        |    AS DOUBLE)), 2) AS sum_k,
        |  SUM(LENGTH(regexp_extract_all(props, '(-?[0-9]+\.?[0-9]*)', 1)))
        |    ::BIGINT AS n_nums,
        |  SUM(LENGTH(regexp_extract_all(REPLACE(props, ',', ''),
        |    '(-?[0-9]+\.?[0-9]*)', 1)))::BIGINT AS n_nums_nc,
        |  SUM(LENGTH(array_to_string(
        |    regexp_extract_all(props, '(-?[0-9]+\.?[0-9]*)', 1), '|')))
        |    ::BIGINT AS joined_len
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}

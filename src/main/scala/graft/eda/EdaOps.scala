package graft.eda

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EDA / diagnosis reports (SURVEY §2.13; reference
  * python/polars_ds/eda/diagnosis.py class DIA). Computational parts
  * only — plotting is out of scope. Every report is a single
  * aggregation pass over the frame (one job, map-side combined), shaped
  * long (one row per column) like the reference's report frames.
  */
object EdaOps {

  /** inf/nan/null/zero counts per numeric column.
    * (diagnosis.py:102 special_values_report) */
  def specialValuesReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__null"),
        sum((col(c) === Double.PositiveInfinity ||
          col(c) === Double.NegativeInfinity).cast("long")).as(s"${c}__inf"),
        sum(isnan(col(c)).cast("long")).as(s"${c}__nan"),
        sum((col(c) === 0.0).cast("long")).as(s"${c}__zero"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val rows = cols.zipWithIndex.map { case (c, i) =>
      (c, r.getLong(4 * i), r.getLong(4 * i + 1), r.getLong(4 * i + 2),
        r.getLong(4 * i + 3))
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "n_null", "n_inf", "n_nan", "n_zero")
  }

  /** Summary stats per numeric column: count, null_count, mean, std,
    * min, q25, median, q75, max. (diagnosis.py:122 numeric_profile) */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).cast("double"),
        sum(col(c).isNull.cast("long")).cast("double"),
        avg(col(c)), stddev_samp(col(c)),
        min(col(c)).cast("double"),
        percentile(col(c), lit(0.25)),
        percentile(col(c), lit(0.5)),
        percentile(col(c), lit(0.75)),
        max(col(c)).cast("double"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val o = 9 * i
      (c, r.getDouble(o).toLong, r.getDouble(o + 1).toLong,
        r.getDouble(o + 2), r.getDouble(o + 3), r.getDouble(o + 4),
        r.getDouble(o + 5), r.getDouble(o + 6), r.getDouble(o + 7),
        r.getDouble(o + 8))
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "cnt", "null_cnt", "mean", "std", "min", "q25",
        "median", "q75", "max")
  }

  /** Pearson corr between each column's null-indicator and each numeric
    * column — does missingness predict the value?
    * (diagnosis.py:342 null_corr) */
  def nullCorr(df: DataFrame, nullCols: Seq[String],
               numCols: Seq[String]): DataFrame = {
    val aggs = for (nc <- nullCols; xc <- numCols) yield
      corr(col(nc).isNull.cast("double"), col(xc))
        .as(s"${nc}__$xc")
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val rows = (for ((nc, i) <- nullCols.zipWithIndex;
                     (xc, j) <- numCols.zipWithIndex) yield
      (nc, xc, r.getDouble(i * numCols.length + j)))
    df.sparkSession.createDataFrame(rows)
      .toDF("null_col", "num_col", "corr")
  }

  /** String column stats: null count, distinct count, min/avg/max
    * length. (diagnosis.py:408 str_stats) */
  def strStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).cast("double"),
        countDistinct(col(c)).cast("double"),
        min(length(col(c))).cast("double"),
        avg(length(col(c))),
        max(length(col(c))).cast("double"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val o = 5 * i
      (c, r.getDouble(o).toLong, r.getDouble(o + 1).toLong,
        r.getDouble(o + 2).toLong, r.getDouble(o + 3),
        r.getDouble(o + 4).toLong)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "null_cnt", "n_unique", "min_len", "avg_len",
        "max_len")
  }

  /** Column-class inference flags, one row per column:
    * is_const, is_binary, is_discrete (≤ maxDistinct distinct),
    * high_null (> nullThreshold fraction).
    * (diagnosis.py:492-772 infer_* helpers) */
  def inferReport(df: DataFrame, cols: Seq[String],
                  maxDistinct: Int = 10,
                  nullThreshold: Double = 0.5): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(countDistinct(col(c)).cast("double"),
        avg(col(c).isNull.cast("double")),
        count(lit(1)).cast("double"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val o = 3 * i
      val nd = r.getDouble(o).toLong
      val nullFrac = r.getDouble(o + 1)
      (c, nd, nd == 1, nd == 2, nd <= maxDistinct, nullFrac > nullThreshold)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "n_distinct", "is_const", "is_binary",
        "is_discrete", "high_null")
  }

  /** Columns that could hold probabilities: every non-null value lies
    * in [0, 1]. One aggregation over all candidates.
    * (diagnosis.py:492 infer_prob) */
  def inferProb(df: DataFrame, cols: Seq[String]): Seq[String] = {
    if (cols.isEmpty) Nil
    else {
      val aggs = cols.map(c =>
        min(when(col(c).isNotNull,
          col(c).between(0.0, 1.0).cast("int"))).as(c))
      val r = df.agg(aggs.head, aggs.tail: _*).head
      cols.zipWithIndex.collect {
        case (c, i) if !r.isNullAt(i) && r.getInt(i) == 1 => c
      }
    }
  }

  /** H(x|y): conditional-entropy dependency score used by
    * infer_dependency (diagnosis.py:772) — 0 means y determines x. */
  def dependencyScore(df: DataFrame, x: Column, y: Column): Double =
    graft.ops.TSOps.condEntropy(df, x, y, Nil)
      .head.getDouble(0)

  /** Column-rule validation report (diagnosis.py:236 col_validation):
    * each rule is (columnName, aggregate boolean Column, message); all
    * rules evaluate in ONE action, and only the failing ones are
    * returned as (column, __reason__) rows. A rule evaluating to null
    * counts as failed. */
  def colValidation(df: DataFrame,
                    rules: Seq[(String, Column, String)]): DataFrame = {
    require(rules.nonEmpty, "colValidation: no rules")
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.select(rules.zipWithIndex.map { case ((_, c, _), i) =>
      c.cast("boolean").as(s"_r$i") }: _*).head
    rules.zipWithIndex.collect {
      case ((name, _, msg), i) if row.isNullAt(i) || !row.getBoolean(i) =>
        (name, msg)
    }.toDF("column", "__reason__")
  }

  /** Row-rule validation report (diagnosis.py:268 row_validation):
    * rules are per-row boolean Columns with a violation message;
    * output keeps only violating rows with the id (default: a
    * generated `__index__`), any `keep` columns, and either the first
    * violation reason (`__reason__`) or all of them (`__reasons__`).
    * A null rule value counts as a violation, like a failed filter. */
  def rowValidation(df: DataFrame, rules: Seq[(Column, String)],
                    idCol: Option[Column] = None,
                    keep: Seq[Column] = Nil,
                    allReasons: Boolean = false): DataFrame = {
    require(rules.nonEmpty, "rowValidation: no rules")
    val id = idCol.getOrElse(
      monotonically_increasing_id().as("__index__"))
    val reasons = rules.map { case (c, msg) =>
      when(!coalesce(c.cast("boolean"), lit(false)), lit(msg)) }
    val arr = array_compact(array(reasons: _*))
    val base = df.select((id +: keep) :+ arr.as("__reasons__"): _*)
      .filter(size(col("__reasons__")) > 0)
    if (allReasons) base
    else base
      .withColumn("__reason__", element_at(col("__reasons__"), 1))
      .drop("__reasons__")
  }
}

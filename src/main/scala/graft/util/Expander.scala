package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misc API surface (SURVEY §2.14). */
object Expander {

  /** Built-in mapping names for [[expand]]: plain aggregate method
    * names plus the reference's special composites (expander.py:25
    * 'null_rate' → null_count / len; 'len' → a single length column
    * aliased `lenAlias`, emitted once, not per input column). */
  private val builtins: Map[String, Column => Column] = Map(
    "mean" -> (c => avg(c)),
    "min" -> (c => min(c)),
    "max" -> (c => max(c)),
    "sum" -> (c => sum(c)),
    "std" -> (c => stddev_samp(c)),
    "var" -> (c => var_samp(c)),
    "median" -> (c => percentile(c, lit(0.5))),
    "first" -> (c => first(c)),
    "last" -> (c => last(c)),
    "n_unique" -> (c => countDistinct(c)),
    "null_count" -> (c => sum(c.isNull.cast("long"))),
    "null_rate" -> (c => avg(c.isNull.cast("double"))))

  /** The `E` expander (python/polars_ds/expander.py:6), reference
    * signature: mapping NAMES applied to M columns with auto-aliased
    * outputs `<col><separator><mapping>`, mapping-major order like the
    * reference ('a_min, b_min, a_max, b_max'). "len" emits one
    * `lenAlias` column; `customizer` adds/overrides mappings. Returns
    * the Seq[Column] to splat into agg(). */
  def expand(cols: Seq[String], mappings: Seq[String],
             separator: String = "_", lenAlias: String = "__len__",
             customizer: Map[String, Column => Column] = Map.empty)
      : Seq[Column] = {
    val fns = builtins ++ customizer
    mappings.flatMap {
      case "len" => Seq(count(lit(1)).as(lenAlias))
      case m =>
        val fn = fns.getOrElse(m, throw new IllegalArgumentException(
          s"E: unknown mapping '$m' — builtins: " +
            builtins.keys.toSeq.sorted.mkString(", ") +
            ", len; or pass a customizer"))
        cols.map(c => fn(col(c)).as(s"$c$separator$m"))
    }
  }

  /** Function-pair variant — the `customizer` path as a first-class
    * API for fully custom aggregates. */
  def expand(cols: Seq[String],
             metrics: Seq[(String, Column => Column)]): Seq[Column] =
    for (c <- cols; (name, fn) <- metrics)
      yield fn(col(c)).as(s"${c}_$name")

  /** Common metric set for expand(). */
  val basicMetrics: Seq[(String, Column => Column)] = Seq(
    "mean" -> (c => avg(c)),
    "min" -> (c => min(c)),
    "max" -> (c => max(c)),
    "std" -> (c => stddev_samp(c)),
    "null_count" -> (c => sum(c.isNull.cast("long"))))
}

/** PartitionHelper (python/polars_ds/partition/partition.py:15):
  * split a frame by key values and apply a function per part. The
  * Spark-native form keeps everything ONE job when possible
  * (groupBy), and only materializes per-key frames on request. */
object PartitionHelper {

  /** Reference type gate (partition.py:47): partitions are only by
    * string / boolean (categorical) columns — a loud error otherwise,
    * since partitioning by a continuous column is a mistake. */
  private def checkTypes(df: DataFrame, by: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{BooleanType, StringType}
    val bad = by.filterNot { c =>
      df.schema(c).dataType match {
        case StringType | BooleanType => true
        case _ => false
      }
    }
    require(bad.isEmpty,
      s"PartitionHelper: only str/bool partition columns supported " +
        s"(reference contract); got non-str/bool: ${bad.mkString(", ")}")
  }

  /** Distinct partition keys (driver-side, sorted for determinism);
    * multi-column keys joined by `separator` (partition.py:26). */
  def keys(df: DataFrame, by: Seq[String], separator: String): Seq[String] = {
    checkTypes(df, by)
    df.select(concat_ws(separator, by.map(c => col(c).cast("string")): _*)
        .as("__k")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }

  def keys(df: DataFrame, by: String): Seq[String] =
    keys(df, Seq(by), "|")

  /** Map of key → filtered frame (lazy — nothing runs until the caller
    * acts on a part). `by = Nil` yields the whole frame under
    * `wholeDfName`, like the reference's `by=None` (partition.py:44). */
  def partitionBy(df: DataFrame, by: Seq[String], separator: String = "|",
                  wholeDfName: String = "df"): Map[String, DataFrame] =
    if (by.isEmpty) Map(wholeDfName -> df)
    else {
      val k = concat_ws(separator, by.map(c => col(c).cast("string")): _*)
      keys(df, by, separator).map(v => v -> df.filter(k === v)).toMap
    }

  def partitionBy(df: DataFrame, by: String): Map[String, DataFrame] =
    partitionBy(df, Seq(by))

  /** Apply a transformation per part and union the results back —
    * the apply+concat pattern of the reference helper. */
  def applyAndUnion(df: DataFrame, by: String)
                   (fn: DataFrame => DataFrame): DataFrame =
    partitionBy(df, Seq(by)).values.map(fn).reduce(_ unionByName _)
}

/** frame() index generator (python/polars_ds/__init__.py:13). */
object Frames {
  def frame(spark: SparkSession, size: Long,
            indexName: String = "row_num"): DataFrame =
    spark.range(size).withColumnRenamed("id", indexName)
}

package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misc API surface (SURVEY §2.14). */
object Expander {

  /** The `E` expander (python/polars_ds/expander.py:6): apply N named
    * aggregations to M columns with auto-aliased outputs
    * `<col>_<metric>` — returns the Seq[Column] to splat into agg(). */
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

  /** Distinct partition keys (driver-side, sorted for determinism). */
  def keys(df: DataFrame, by: String): Seq[String] =
    df.select(col(by).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Map of key → filtered frame (lazy — nothing runs until the caller
    * acts on a part). */
  def partitionBy(df: DataFrame, by: String): Map[String, DataFrame] =
    keys(df, by).map(k => k -> df.filter(col(by).cast("string") === k))
      .toMap

  /** Apply a transformation per part and union the results back —
    * the apply+concat pattern of the reference helper. */
  def applyAndUnion(df: DataFrame, by: String)
                   (fn: DataFrame => DataFrame): DataFrame =
    partitionBy(df, by).values.map(fn).reduce(_ unionByName _)
}

/** frame() index generator (python/polars_ds/__init__.py:13). */
object Frames {
  def frame(spark: SparkSession, size: Long,
            indexName: String = "row_num"): DataFrame =
    spark.range(size).withColumnRenamed("id", indexName)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, the most recent right
  * row with rightTime ≤ leftTime within the same key (backward
  * direction; the temporal-join primitive the reference's engine has no
  * equivalent for, and Spark lacks as a built-in).
  *
  * Execution shape: tag both sides, union, ONE shuffle on the key with
  * an in-partition sort on (time, side, tieBreak), then
  * `last(value, ignoreNulls)` over the unbounded-preceding window
  * carries the latest right value forward into each left row. No
  * broadcast, no range explosion, no per-key collect — cost is a
  * sort-merge pass, identical asymptotics to a groupBy at 100 TB.
  * Right rows sort before left rows at equal timestamps, so a right
  * row AT the left timestamp matches (≤ semantics).
  */
object AsOfJoin {

  /** Backward as-of join of `rightVal` onto `left`.
    *
    * @param keys        equi-join key column names (present both sides)
    * @param leftTime    left event-time column (orderable; same type as
    *                    rightTime)
    * @param rightTime   right event-time column
    * @param rightVal    right value column to carry
    * @param rightTieBreak deterministic order among equal-time right
    *                    rows (the LAST by this order wins)
    * @param tolerance   optional max allowed leftTime − matchedTime
    *                    (same units as the time columns); matches
    *                    further back become null
    * @param out         output column name
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: Column, rightTime: Column, rightVal: Column,
                   rightTieBreak: Column, tolerance: Option[Column] = None,
                   out: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", leftTime)
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast("long"))
      .withColumn("_rv", lit(null).cast("double"))
      .withColumn("_rt", lit(null).cast(left.select(leftTime).schema
        .head.dataType.catalogString))
    val r0 = right
      .withColumn("_t", rightTime)
      .withColumn("_side", lit(0))
      .withColumn("_tb", rightTieBreak.cast("long"))
      .withColumn("_rv", rightVal.cast("double"))
      .withColumn("_rt", rightTime)
    // right side carries only keys + internals; left payload is null
    val internal = Seq("_t", "_side", "_tb", "_rv", "_rt")
    val r = leftCols.foldLeft(
      r0.select((keys ++ internal).map(col): _*)) { (df, c) =>
      if (keys.contains(c) || internal.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.select(c).schema
        .head.dataType.catalogString))
    }.select((leftCols.filterNot(internal.contains) ++ internal).map(col): _*)
    val unioned = l.select((leftCols.filterNot(internal.contains) ++
      internal).map(col): _*).unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("_matchT", last(col("_rt"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn(out,
        when(col("_t") - col("_matchT") <= tol, col("_match")))
      case None => matched.withColumn(out, col("_match"))
    }
    bounded.select((leftCols :+ out).map(col): _*)
  }
}

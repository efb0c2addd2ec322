package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns as first-class operators: skew-safe two-phase
  * aggregation and binned range joins. These exist because at 100 TB a
  * single hot key or an interval predicate turns the naive plan into
  * one straggler task (skew) or a cartesian product (range join);
  * both operators keep the declarative API while forcing the scalable
  * physical shape. */
object ScaleOps {

  /** Skew-safe aggregation: adds a random salt to the grouping key so a
    * hot key's rows spread over `salt` reduce tasks (phase 1), then
    * combines the per-salt partials (phase 2). Supported specs:
    * (func, col, out) with func ∈ sum|count|min|max|avg — the algebraic
    * aggregates whose partials compose; avg is carried as (sum, count)
    * and finished exactly in phase 2.
    *
    * Results are EXACTLY those of `df.groupBy(keys).agg(...)` (modulo
    * float summation order, like any distributed agg); the salt only
    * changes the partial-combine tree. Spark's map-side partial
    * aggregation already dedups within a task — the salt matters when a
    * hot key's post-partial traffic still swamps one reducer. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                specs: Seq[(String, String, String)]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salt)).cast("int"))
    // phase 1: per (keys, salt) partials
    val p1 = specs.flatMap { case (f, c, out) => f match {
      case "sum"   => Seq(sum(col(c)).as(s"_s_$out"))
      case "count" => Seq(count(col(c)).as(s"_c_$out"))
      case "min"   => Seq(min(col(c)).as(s"_mn_$out"))
      case "max"   => Seq(max(col(c)).as(s"_mx_$out"))
      case "avg"   => Seq(sum(col(c)).as(s"_s_$out"),
        count(col(c)).as(s"_c_$out"))
      case other => throw new IllegalArgumentException(
        s"saltedAgg: unsupported '$other' (algebraic only)")
    }}
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(p1.head, p1.tail: _*)
    // phase 2: combine partials per key
    val p2 = specs.map { case (f, _, out) => f match {
      case "sum"   => sum(col(s"_s_$out")).as(out)
      case "count" => sum(col(s"_c_$out")).as(out)
      case "min"   => min(col(s"_mn_$out")).as(out)
      case "max"   => max(col(s"_mx_$out")).as(out)
      case "avg"   => (sum(col(s"_s_$out")) / sum(col(s"_c_$out"))).as(out)
    }}
    phase1.groupBy(keys.map(col): _*).agg(p2.head, p2.tail: _*)
  }

  /** Point-in-interval range join via binning: left points land in one
    * bin of width `binWidth`; right intervals explode into every bin
    * they overlap (`sequence` — codegen'd, no UDF); the join is then a
    * plain shuffled equi-join on the bin (+ optional equi-keys) with an
    * exact interval check. Each qualifying pair meets exactly once (the
    * point's bin is unique), so no dedup pass is needed.
    *
    * Replaces the O(|L|·|R|) cartesian/BNLJ plan Spark produces for a
    * raw BETWEEN condition with shuffle cost |L| + |R|·(width/binWidth
    * + 1). Pick binWidth near the median interval width. Column names
    * must be disjoint between the two frames (alias before calling). */
  def binnedPointIntervalJoin(left: DataFrame, point: String,
                              right: DataFrame, lo: String, hi: String,
                              binWidth: Double,
                              keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("_bin",
      floor(col(point) / binWidth).cast("long"))
    val rb = right.withColumn("_bin", explode(sequence(
      floor(col(lo) / binWidth).cast("long"),
      floor(col(hi) / binWidth).cast("long"))))
    lb.join(rb, keys :+ "_bin")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bin")
  }
}

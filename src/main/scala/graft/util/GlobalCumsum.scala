package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-frame running sums WITHOUT an unbounded single-partition
  * WindowExec.
  *
  * `Window.orderBy(x)` with no partition keys plans a WindowExec that
  * drags every row through ONE task ("Moving all data to a single
  * partition" in the physical plan) — correct at bench scale, fatal at
  * 100 TB. This helper re-expresses the global cumulative sum as:
  *
  *   1. `repartitionByRange(P, order)` — parallel range shuffle; equal
  *      keys land in one partition, partition p's keys all precede
  *      partition p+1's.
  *   2. per-partition running sum via `Window.partitionBy(__pid)` —
  *      P-way parallel.
  *   3. per-partition totals aggregated by `__pid` (≤ P rows), their
  *      exclusive prefix sum taken with a window over that BOUNDED
  *      frame (its input cardinality is the partition count, never the
  *      data size), broadcast-joined back on `__pid`.
  *
  * global_cumsum(row) = within-partition cumsum + offset(partition).
  * One declarative plan: the range exchange feeding steps 2 and 3 is
  * shared via Spark's exchange reuse, no driver collect, no persist.
  *
  * The inclusive frame (unboundedPreceding..currentRow) is computed;
  * callers needing the exclusive frame subtract the row's own value —
  * the algebra every call site in MetricOps/StatOps already uses. Rows
  * whose `order` value ties are NOT distinguishable by a rows-frame,
  * so call this on a distinct-key table (every caller compresses to
  * distinct thresholds first) or treat the result as rangeBetween
  * semantics per tie-group.
  */
object GlobalCumsum {

  private val PID = "__gcs_pid"

  /** Add inclusive global running sums of `sums._1` ordered by `order`
    * (ascending or descending), one output column per `sums._2` name.
    * All original columns pass through. `numParts` overrides the range
    * partition count (default: the session's parallelism) — exposed so
    * the offset algebra is testable at every partition count and so
    * callers with tiny key tables can skip over-partitioning. */
  def runningSums(df: DataFrame, order: Column, ascending: Boolean,
                  sums: Seq[(Column, String)],
                  numParts: Option[Int] = None): DataFrame =
    runningSumsMulti(df, Seq(order), ascending, sums, numParts)

  /** [[runningSums]] over a COMPOSITE order key (lexicographic over
    * `orders`) — lets several per-key cumsum pipelines share ONE range
    * exchange by stacking them under a discriminator column (e.g.
    * corrTable's per-column rank maps ordered by (column, value)). */
  def runningSumsMulti(df: DataFrame, orders: Seq[Column],
                       ascending: Boolean,
                       sums: Seq[(Column, String)],
                       numParts: Option[Int] = None): DataFrame = {
    require(sums.nonEmpty, "GlobalCumsum.runningSums: no sum columns")
    require(orders.nonEmpty, "GlobalCumsum.runningSums: no order columns")
    require(numParts.forall(_ >= 1),
      s"GlobalCumsum.runningSums: numParts must be >= 1, got $numParts")
    val spark = df.sparkSession
    val p = numParts.getOrElse(spark.sparkContext.defaultParallelism)
    val ords = orders.map(o => if (ascending) o.asc else o.desc)
    // MUST persist: the plan references `parted` twice (offsets + local
    // cumsums). Un-persisted, each branch would plan its OWN range
    // exchange, and RangePartitioner's sample seed derives from the RDD
    // id — two independently-sampled bound sets can differ, landing the
    // same row in different `spark_partition_id`s on the two sides and
    // silently mis-joining the offsets (observed: AUC off by 1e-3 when
    // exchange reuse didn't kick in). One cached RDD = one partitioner.
    // The blocks are reclaimed by Release.scoped callers, the session's
    // periodic cleaner, or explicit unpersist (Quantiles.exact).
    val parted = df.repartitionByRange(p, ords: _*)
      .withColumn(PID, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition inclusive cumsum — P-way parallel (the hash
    // exchange on __pid rebalances nothing: each pid is one group)
    val wIn = Window.partitionBy(col(PID)).orderBy(ords: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLocal = sums.zipWithIndex.foldLeft(parted) {
      case (d, ((c, _), i)) =>
        d.withColumn(s"__gcs_l$i", sum(c).over(wIn))
    }
    // exclusive prefix of per-partition totals: ≤ P rows, so the
    // zero-partition window here is bounded by the PARTITION COUNT,
    // not the data — the one place a single-task window is safe by
    // construction.
    val totAggs = sums.zipWithIndex.map { case ((c, _), i) =>
      coalesce(sum(c), lit(0L)).cast("double").as(s"__gcs_t$i")
    }
    val wOff = Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = parted.groupBy(col(PID)).agg(totAggs.head, totAggs.tail: _*)
    val offsets = sums.indices.foldLeft(offsets0) { (d, i) =>
      d.withColumn(s"__gcs_o$i",
        coalesce(sum(s"__gcs_t$i").over(wOff), lit(0.0)))
    }.select(col(PID) +: sums.indices.map(i => col(s"__gcs_o$i")): _*)
    val joined = withLocal.join(broadcast(offsets), PID)
    val out = sums.zipWithIndex.foldLeft(joined) {
      case (d, ((_, name), i)) =>
        d.withColumn(name, col(s"__gcs_l$i") + col(s"__gcs_o$i"))
    }
    out.drop(PID +: sums.indices.flatMap(i =>
      Seq(s"__gcs_l$i", s"__gcs_o$i")): _*)
  }
}

package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Minimum-parallelism guard for expensive per-row kernel stages.
  *
  * The bench/test corpora are single-row-group parquet files, so a scan
  * feeding a heavy narrow kernel (tokenize + hash signatures, image
  * decode, LM scoring, link-graph parsing) runs as ONE task no matter
  * how many cores the session has — the kernel stage is serialized
  * before the first exchange even on local[32], and adding cores does
  * not move it (the "one huge unsplittable file" input-skew case,
  * spark_optimization_guide §2.5).
  *
  * [[byKey]] hash-repartitions the frame on a caller-supplied
  * deterministic key to the session's default parallelism, but ONLY
  * when the planned scan parallelism is materially below it. At
  * production scale the input is thousands of splits, the gate is
  * false, and the plan is untouched — no extra exchange is ever paid
  * where the scan already parallelizes. Hash partitioning (not
  * round-robin) keeps the row→partition map deterministic under task
  * retry (SPARK-23207 concerns round-robin only) and adds no
  * sort-before-repartition pass.
  */
object Spread {

  /** `df` repartitioned on `key` to the session default parallelism if
    * its current plan has fewer than half that many partitions;
    * otherwise `df` unchanged. `key` must be deterministic (an id or
    * content column, never rand()). */
  def byKey(df: DataFrame, key: Column, more: Column*): DataFrame = {
    // streaming frames: no .rdd and no repartition-by-key below a
    // micro-batch — parallelism is the source's concern there
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (want <= 1) return df
    // planned (not executed) partition count; cheap at kernel-input
    // plan sizes and the only reliable pre-action signal
    val have = df.rdd.getNumPartitions
    if (have * 2 >= want) df else df.repartition(want, (key +: more): _*)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for all graft entry points.
  * testdata's events.parquet stores ts as TIMESTAMP(NANOS) which Spark 4
  * rejects unless nanosAsLong is set (reads as LongType nanos — still a
  * valid monotone order column, which is all the library needs). */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bucketed-table writes (sources.Bucketing) register external
      // tables; keep the managed-table root out of the repo tree.
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // Reclaim dropped RDD/broadcast blocks promptly in long-lived
      // sessions (default 30 min lets unreachable blocks pile up and
      // evict useful cache on a busy cluster).
      .config("spark.cleaner.periodicGC.interval", "2min")
      // Polars-style permissive numerics: x/0 → null, not an error.
      // The reference's kernels never raise on degenerate denominators
      // (e.g. confusion-matrix ratios with an empty class).
      .config("spark.sql.ansi.enabled", "false")
}

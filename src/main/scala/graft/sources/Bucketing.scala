package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet tables: the storage-side half of the shuffle story.
  *
  * A join or aggregation on a 100 TB fact table pays its dominant cost
  * in the exchange. Bucketing pre-pays that cost ONCE at write time:
  * `df.write.bucketBy(n, key)` hash-partitions rows into `n` buckets
  * per partition-dir and records the layout in the catalog, so every
  * later equi-join or groupBy on the bucket key between co-bucketed
  * tables runs with NO Exchange at all (Spark's bucketing rule matches
  * `HashPartitioning(key, n)` on both sides). `sortBy` additionally
  * pre-sorts within buckets, eliding the sort of a sort-merge join.
  *
  * The reference inherits Polars IO and has no equivalent (SURVEY §2.1
  * — /root/reference/python/polars_ds/pipeline/pipeline.py:129 is its
  * only persistence); this is Spark-native layout control, the same
  * lever as `zorderBy` (data skipping) but aimed at shuffle elision.
  *
  * Scale notes:
  *  - pick `buckets` so one bucket of the BIG table ≈ 100-500 MB
  *    (e.g. 100 TB / 128 GB-executors → thousands of buckets); both
  *    sides must use the SAME bucket count to co-locate.
  *  - bucket pruning: an equality predicate on the bucket key scans
  *    1/n of the files (`spark.sql.sources.bucketing.enabled`).
  *  - these are EXTERNAL tables (explicit `path`) — dropping the
  *    catalog entry keeps the parquet files.
  */
object Bucketing {

  /** Write `df` as an external bucketed parquet table named `table` at
    * `path`, bucketed (and bucket-sorted) by `keys`. Replaces any
    * previous catalog entry with the same name. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "writeBucketed: no bucket keys")
    require(buckets > 0, "writeBucketed: buckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Cluster rows to their bucket BEFORE the write: HashPartitioning
    // over the bucket keys with numPartitions = buckets is exactly the
    // bucket spec's hash, so each write task holds one whole bucket —
    // one file per bucket (not one per task×bucket: the small-files
    // trap, guide §6) and the sort+write runs `buckets`-way parallel
    // instead of serializing on however many input splits the source
    // happened to have.
    df.repartition(buckets, keys.map(df.col): _*).write
      .format("parquet")
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-style partitioned parquet layout (`path/col=value/...`):
    * the other storage-pruning lever. Equality/IN predicates on the
    * partition columns never touch non-matching files at all (plan
    * shows them under PartitionFilters, not PushedFilters — directory
    * pruning, stronger than footer-stats skipping). Partition by
    * low-cardinality routing columns (source, date, lang); high-
    * cardinality keys belong in buckets or Z-order instead (millions
    * of tiny directories kill the file listing). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: no partition cols")
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so joins/aggs on the bucket keys skip their Exchange). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Join two co-bucketed tables on their (shared) bucket keys.
    * Precondition: both were written with the same bucket count over
    * `keys` — then the plan contains no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String],
                   joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate semantics of [[graft.util.Spread]] — the size-proportional
  * minimum-parallelism guard in front of expensive per-row kernels.
  * The contract under test: rows are NEVER changed, the repartition
  * fires only on small narrow-chain sources (one partition per chunk,
  * capped at session parallelism), and plans that already carry an
  * exchange (repartition/join/aggregate) or large/unknown-size leaves
  * are left untouched. */
class SpreadSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def tmpParquet(rows: Int): String = {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft_spread").toString + "/t.parquet"
    (0 until rows).map(i => (i.toLong, s"doc $i body " + ("x" * 50)))
      .toDF("id", "text").coalesce(1).write.mode("overwrite").parquet(p)
    p
  }

  test("fires on a small single-split scan at chunked granularity, " +
      "caps at session parallelism, and preserves rows exactly") {
    val path = tmpParquet(2000)
    val df = spark.read.parquet(path)
    assert(df.rdd.getNumPartitions == 1)
    val out = graft.util.Spread.byKeyChunked(df, 1L, col("id"))
    // bytes/chunk=1 ≥ parallelism → capped at defaultParallelism
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.select(sum(col("id"))).head.getLong(0) ==
      df.select(sum(col("id"))).head.getLong(0))
    assert(out.count() == 2000)
  }

  test("stays out of the way: sub-chunk sources, widened plans, " +
      "and unknown-size leaves are returned unchanged") {
    val path = tmpParquet(50)
    val df = spark.read.parquet(path)
    // a few KB over a 4 MB default chunk → parts < 4 → untouched
    assert(graft.util.Spread.byKey(df, col("id")) eq df)
    // an explicit upstream repartition means the caller already spread
    // (e.g. a query repartitioning BEFORE an expensive projection) —
    // re-shuffling would undo that placement
    val pre = spark.read.parquet(path).repartition(2, col("id"))
    assert(graft.util.Spread.byKeyChunked(pre, 1L, col("id")) eq pre)
    // aggregates establish distribution on their own exchange
    val agg = spark.read.parquet(path).groupBy(col("id"))
      .agg(count(lit(1)).as("n"))
    assert(graft.util.Spread.byKeyChunked(agg, 1L, col("id")) eq agg)
    // LogicalRDD leaves have unknown (default, huge) size → untouched
    val rddBacked = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    assert(graft.util.Spread.byKeyChunked(rddBacked, 1L, col("id"))
      eq rddBacked)
  }
}

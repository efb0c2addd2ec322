package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("dynamicGroupByAgg buckets rows into tumbling windows") {
    import spark.implicits._
    val df = Seq(
      (Timestamp.valueOf("2026-01-01 10:05:00"), "a", 1.0),
      (Timestamp.valueOf("2026-01-01 10:55:00"), "a", 3.0),
      (Timestamp.valueOf("2026-01-01 11:05:00"), "a", 5.0),
      (Timestamp.valueOf("2026-01-01 10:30:00"), "b", 7.0))
      .toDF("t", "k", "v")
    val out = StreamOps.dynamicGroupByAgg(df, col("t"), "1 hour",
        Seq(col("k")), Seq(avg(col("v")).as("avg_v")))
      .orderBy("k", "window_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("avg_v") == 2.0) // a @ 10:00
    assert(out(1).getAs[Double]("avg_v") == 5.0) // a @ 11:00
    assert(out(2).getAs[Double]("avg_v") == 7.0) // b @ 10:00
  }

  test("the same windowed agg runs incrementally under a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamed = StreamOps.withEventTime(
      mem.toDF().toDF("t", "k", "v"), col("t"), "10 minutes", "event_time")
    val agg = StreamOps.streamingWindowedAgg(streamed, "1 hour",
      Seq(col("k")), Seq(sum(col("v")).as("sum_v")))
    val q = agg.writeStream.format("memory").queryName("graft_stream_test")
      .outputMode("update").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2026-01-01 10:05:00"), "a", 1.0),
        (Timestamp.valueOf("2026-01-01 10:20:00"), "a", 2.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 10:40:00"), "a", 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT max(sum_v) FROM graft_stream_test").head
      // update mode: the latest emission for the 10:00 window holds the
      // full incremental sum 1+2+4
      assert(rows.getDouble(0) == 7.0)
    } finally q.stop()
  }

  test("nanosToTimestamp converts the testdata nanos encoding") {
    import spark.implicits._
    // 2026-01-01 00:00:00 UTC = 1767225600 s
    val nanos = 1767225600L * 1000000000L + 123456000L
    val ts = Seq(nanos).toDF("ts")
      .select(StreamOps.nanosToTimestamp(col("ts"))).head.getTimestamp(0)
    assert(ts.toInstant.getEpochSecond == 1767225600L)
  }
}

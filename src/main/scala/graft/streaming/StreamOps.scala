package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed and streaming aggregation (SURVEY §1 last row: the
  * reference's only temporal surface is `Blueprint.group_by_dynamic_agg`
  * — pipeline.py:930 — a tumbling-window batch aggregation; its
  * "streaming" engine is out-of-core batching, which plain distributed
  * execution already subsumes).
  *
  * [[dynamicGroupByAgg]] is the batch form (works on any DataFrame);
  * the SAME plan shape runs under Structured Streaming: feed a
  * `readStream` source through [[withEventTime]] →
  * [[streamingWindowedAgg]] → `writeStream`, and Spark maintains the
  * windows incrementally with watermark-based state eviction. That is
  * the genuinely streaming upgrade the reference cannot express —
  * covered by StreamingSpec with a MemoryStream.
  */
object StreamOps {

  /** Tumbling-window aggregation over an event-time column
    * (pipeline.py:930 group_by_dynamic_agg → Spark `window()`).
    * `eventTime` must be a TimestampType column; aggs are any Column
    * aggregates. Emits window_start/window_end + keys + aggs. */
  def dynamicGroupByAgg(df: DataFrame, eventTime: Column,
                        windowDuration: String, keys: Seq[Column],
                        aggs: Seq[Column]): DataFrame =
    df.groupBy((window(eventTime, windowDuration) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Convert the testdata's TIMESTAMP(NANOS)-as-long column to a real
    * timestamp (GraftSession reads nanos as LongType). Uses integral
    * division (`div`) so the nanos→micros conversion stays in exact long
    * arithmetic: `c / 1000L` would round-trip through double, and epoch
    * nanos (~1.7e18) exceed double's 2^53 exact-integer range. */
  def nanosToTimestamp(c: Column): Column =
    timestamp_micros(call_function("div", c, lit(1000L)))

  /** Attach event time + watermark to a (possibly streaming) frame. */
  def withEventTime(df: DataFrame, eventTime: Column,
                    watermark: String, out: String = "event_time")
      : DataFrame =
    df.withColumn(out, eventTime).withWatermark(out, watermark)

  /** Watermarked tumbling-window aggregate — the streaming twin of
    * [[dynamicGroupByAgg]]; on a streaming frame Spark plans this as
    * incremental stateful aggregation with late-data handling. */
  def streamingWindowedAgg(df: DataFrame, windowDuration: String,
                           keys: Seq[Column], aggs: Seq[Column],
                           eventTimeCol: String = "event_time")
      : DataFrame =
    df.groupBy((window(col(eventTimeCol), windowDuration) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-pipeline operator the
  * reference (batch-only, single-frame) has no surface for, but any
  * 100 TB behavioral dataset needs: assign consecutive events of a key
  * to one session while gaps stay under a threshold.
  *
  * Batch form is gaps-and-islands over a keyed window: one shuffle on
  * the session keys, no self-join, no collect. The streaming twin uses
  * Spark's native `session_window`, which maintains open sessions as
  * watermarked state and merges windows on late events — semantics the
  * batch window reproduces exactly on a replay of the same data. */
object SessionOps {

  /** Append a per-key 1-based `session_id`: a new session starts when
    * the gap from the previous event of the same keys exceeds
    * `gapNanos` (always NANOseconds — the event-time column may be a
    * long of epoch nanos, TIMESTAMP, or TIMESTAMP_NTZ; all are
    * normalized through [[StreamOps.eventTimeNanos]]). Rows tied on
    * event time always land in one session regardless of their relative
    * order, so the assignment is deterministic. */
  def sessionize(df: DataFrame, keys: Seq[Column], ts: Column,
                 gapNanos: Long, out: String = "session_id"): DataFrame = {
    val tsN = StreamOps.eventTimeNanos(df, ts)
    val w = Window.partitionBy(keys: _*).orderBy(tsN)
    val prev = lag(tsN, 1).over(w)
    val isNew = when(prev.isNull || tsN - prev > gapNanos, 1L)
      .otherwise(0L)
    df.withColumn(out, sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session stats: event count and exact span in MICROseconds
    * (integer arithmetic end-to-end — no float lattice to disagree on
    * with an oracle). One row per (keys, session_id). */
  def sessionStats(df: DataFrame, keys: Seq[Column], ts: Column,
                   gapNanos: Long): DataFrame = {
    val tsN = StreamOps.eventTimeNanos(df, ts)
    sessionize(df, keys, ts, gapNanos)
      .groupBy(keys :+ col("session_id"): _*)
      .agg(count(lit(1)).as("n_events"),
        call_function("div", max(tsN) - min(tsN), lit(1000L))
          .as("span_us"))
  }

  /** Streaming twin: native session windows with watermark-bounded
    * state. `gap` is a duration string ("30 minutes"). The input must
    * carry an event-time column with a watermark
    * ([[StreamOps.withEventTime]]); works identically on a batch frame. */
  def streamingSessionAgg(df: DataFrame, gap: String, keys: Seq[Column],
                          aggs: Seq[Column],
                          eventTimeCol: String = "event_time"): DataFrame =
    df.groupBy(session_window(col(eventTimeCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
}

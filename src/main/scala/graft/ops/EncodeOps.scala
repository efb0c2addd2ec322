package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Encoding / drift operators from SURVEY §2.6: target encoding, weight
  * of evidence + information value, population stability index, detrend,
  * scatter-add. Each is a direct DataFrame translation of the reference
  * kernel's internal group-by lazyframe (woe_iv.rs:29-50, psi.rs:41-74,
  * target_encode.rs:51) — Catalyst plans them as two-stage hash
  * aggregations with map-side partials, so the shuffled state is one row
  * per (group, bucket), independent of input row count: the shapes scale
  * to 100 TB unchanged.
  */
object EncodeOps {

  /** groupBy-count then divide by the grand total, carried as a 1-row
    * broadcast cross join — NOT an empty-partition window, which would
    * pull every (possibly high-cardinality) group through one task. */
  private def normalizedCounts(grouped: DataFrame, keys: Seq[String],
                               name: String): DataFrame = {
    val counts = grouped.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("_tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn(name, col("n") / col("_tot"))
      .drop("n", "_tot")
  }

  /** Mean-target encoding with sigmoid smoothing between the category
    * mean and the global prior (num.py:1068; target_encode.rs:51).
    * Returns (value, to) mapping rows per category.
    * blend = 1/(1+exp(-(cnt - minSamplesLeaf)/smoothing)). */
  def targetEncode(df: DataFrame, cat: Column, target: Column,
                   minSamplesLeaf: Double = 20, smoothing: Double = 10.0)
      : DataFrame = {
    val agg = df.select(cat.as("value"), target.as("t"))
    val prior = agg.agg(avg(col("t"))).head.getDouble(0)
    agg.groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"), avg(col("t")).as("cond_p"))
      .withColumn("alpha",
        lit(1.0) / (lit(1.0) +
          exp(-(col("cnt") - minSamplesLeaf) / smoothing)))
      .select(col("value"),
        (col("alpha") * col("cond_p") +
          (lit(1.0) - col("alpha")) * prior).as("to"))
  }

  /** Weight of Evidence per discrete bin with the reference's +1
    * smoothing on event counts (num.py:698 woe_discrete;
    * woe_iv.rs:22-74). target is 0/1. */
  def woeDiscrete(df: DataFrame, bin: Column, target: Column): DataFrame = {
    val counts = df.select(bin.as("value"), target.cast("double").as("t"))
      .groupBy(col("value"))
      .agg(sum(col("t")).as("events"),
        (count(lit(1)) - sum(col("t"))).as("non_events"))
    val tot = counts.agg(sum("events"), sum("non_events")).head
    val (te, tn) = (tot.getDouble(0), tot.getDouble(1))
    counts.select(col("value"),
      log(((col("events") + 1.0) / (te + 2.0)) /
          ((col("non_events") + 1.0) / (tn + 2.0))).as("woe"))
  }

  /** Information value per bin (+ derived total via sum). (num.py:764
    * info_value; woe_iv.rs:51) */
  def infoValue(df: DataFrame, bin: Column, target: Column): DataFrame = {
    val counts = df.select(bin.as("value"), target.cast("double").as("t"))
      .groupBy(col("value"))
      .agg(sum(col("t")).as("events"),
        (count(lit(1)) - sum(col("t"))).as("non_events"))
    val tot = counts.agg(sum("events"), sum("non_events")).head
    val (te, tn) = (tot.getDouble(0), tot.getDouble(1))
    val pe = (col("events") + 1.0) / (te + 2.0)
    val pn = (col("non_events") + 1.0) / (tn + 2.0)
    counts.select(col("value"), ((pe - pn) * log(pe / pn)).as("iv"))
  }

  /** Continuous-feature WOE + IV (num.py:698 woe, num.py:760
    * info_value — both qcut the feature then run the discrete kernel):
    * equal-frequency bins from the nBins−1 EXACT percentile
    * breakpoints (one `percentile` aggregate pass, the same device as
    * [[psiReport]]), then a codegen'd when-chain bucketing and the
    * +1-smoothed per-bin math of [[woeDiscrete]]/[[infoValue]].
    * Non-finite x rows are excluded (the reference filters is_finite
    * before qcut).
    *
    * This is the 100 TB plan: two codegen'd scans, no total sort, no
    * RDD hop. Heavily tied values can land a whole tie-run in one bin
    * (breakpoint binning cannot split equal values); for the
    * reference's exact rank-split of ties use [[woeContinuousExact]].
    * Returns (bin, events, non_events, woe, iv); total IV = sum(iv). */
  def woeContinuous(df: DataFrame, x: Column, target: Column,
                    nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"woeContinuous: nBins must be >= 2, got $nBins")
    val proj = df.select(x.cast("double").as("__x"),
        target.cast("double").as("__t"))
      .filter(col("__x").isNotNull && !isnan(col("__x")) &&
        col("__x") =!= Double.PositiveInfinity &&
        col("__x") =!= Double.NegativeInfinity)
    val probs = (1 to (nBins - 1)).map(_.toDouble / nBins)
    val bps = proj
      .agg(percentile(col("__x"), array(probs.map(p => lit(p)): _*)))
      .head.getSeq[Double](0).toArray
    require(bps.nonEmpty, "woeContinuous: no finite rows to bin")
    def bucket(c: Column): Column =
      bps.indices.foldLeft(lit(nBins - 1)) { (acc, i) =>
        when(c <= bps(bps.length - 1 - i), bps.length - 1 - i)
          .otherwise(acc)
      }
    val counts = proj
      .select(bucket(col("__x")).cast("long").as("bin"),
        col("__t").as("t"))
      .groupBy(col("bin"))
      .agg(sum(col("t")).as("events"),
        (count(lit(1)) - sum(col("t"))).as("non_events"))
    val tot = counts.agg(sum("events"), sum("non_events")).head
    val (te, tn) = (tot.getDouble(0), tot.getDouble(1))
    val pe = (col("events") + 1.0) / (te + 2.0)
    val pn = (col("non_events") + 1.0) / (tn + 2.0)
    counts.select(col("bin"), col("events"), col("non_events"),
      log(pe / pn).as("woe"), ((pe - pn) * log(pe / pn)).as("iv"))
  }

  /** Tie-exact variant of [[woeContinuous]]: the reference's qcut
    * rank-splits ties via the deterministic (x, tiebreak) total order,
    * bin = ⌊idx·nBins/N⌋. Costs a distributed total sort +
    * zipWithIndex (range-partitioned, no single-partition window, but
    * an RDD hop out of codegen) — opt-in where tie placement must
    * match the reference bit-for-bit; the breakpoint path above is
    * the scale default. */
  def woeContinuousExact(df: DataFrame, x: Column, target: Column,
                         tiebreak: Column, nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val proj = df.select(x.cast("double").as("__x"),
        target.cast("double").as("__t"), tiebreak.as("__o"))
      .filter(col("__x").isNotNull && !isnan(col("__x")) &&
        col("__x") =!= Double.PositiveInfinity &&
        col("__x") =!= Double.NegativeInfinity)
    val sorted = proj.orderBy(col("__x"), col("__o")).select(col("__t"))
    val indexed = sorted.rdd.zipWithIndex()
    val n = indexed.count()
    require(n > 0, "woeContinuousExact: no finite rows to bin")
    val binned = spark.createDataFrame(
      indexed.map { case (r, idx) => Row(idx * nBins / n, r.getDouble(0)) },
      StructType(Seq(StructField("bin", LongType, nullable = false),
        StructField("t", DoubleType, nullable = false))))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(col("t")).as("events"),
        (count(lit(1)) - sum(col("t"))).as("non_events"))
    val tot = counts.agg(sum("events"), sum("non_events")).head
    val (te, tn) = (tot.getDouble(0), tot.getDouble(1))
    val pe = (col("events") + 1.0) / (te + 2.0)
    val pn = (col("non_events") + 1.0) / (tn + 2.0)
    counts.select(col("bin"), col("events"), col("non_events"),
      log(pe / pn).as("woe"), ((pe - pn) * log(pe / pn)).as("iv"))
  }

  /** PSI of `actual` against `baseline` using `nBins` baseline quantile
    * breakpoints (num.py:511 psi; psi.rs:76, bucketing psi.rs:19-37).
    * Returns the report frame: one row per bucket with
    * (bp, baseline_pct, actual_pct, psi_bin); total PSI = sum(psi_bin).
    * Both sides get the +smoothing count treatment only implicitly via
    * the reference's cnt>0 convention — empty buckets keep pct=0 and the
    * formula's log guards via a small epsilon. */
  def psiReport(baseline: DataFrame, baseCol: Column,
                actual: DataFrame, actCol: Column,
                nBins: Int = 10): DataFrame = {
    val probs = (1 to (nBins - 1)).map(_.toDouble / nBins)
    // exact quantiles on the baseline (one pass; the breakpoint list is
    // tiny and broadcast into the bucketing expressions)
    val bps = baseline
      .agg(percentile(baseCol,
        array(probs.map(p => lit(p)): _*)))
      .head.getSeq[Double](0).toArray
    def bucket(c: Column): Column =
      bps.indices.foldLeft(lit(nBins - 1)) { (acc, i) =>
        when(c <= bps(bps.length - 1 - i), bps.length - 1 - i).otherwise(acc)
      }
    def pct(df: DataFrame, c: Column, name: String): DataFrame =
      normalizedCounts(df.select(bucket(c).as("bucket")),
        Seq("bucket"), name)
    val b = pct(baseline, baseCol, "baseline_pct")
    val a = pct(actual, actCol, "actual_pct")
    // the reference clamps both pcts at 0.0001 (clip_min, psi.rs:58-63)
    // so empty cells contribute a large-but-finite psi term
    b.join(a, Seq("bucket"), "full")
      .na.fill(0.0, Seq("baseline_pct", "actual_pct"))
      .withColumn("baseline_pct", greatest(col("baseline_pct"), lit(1e-4)))
      .withColumn("actual_pct", greatest(col("actual_pct"), lit(1e-4)))
      .withColumn("psi_bin",
        (col("actual_pct") - col("baseline_pct")) *
          log(col("actual_pct") / col("baseline_pct")))
      .orderBy("bucket")
  }

  /** PSI against caller-supplied breakpoints (num.py:653
    * psi_w_breakpoints): same report, bucketing fixed by `bps` instead
    * of baseline quantiles. */
  def psiWithBreakpoints(baseline: DataFrame, baseCol: Column,
                         actual: DataFrame, actCol: Column,
                         bps: Array[Double]): DataFrame = {
    val nBins = bps.length + 1
    def bucket(c: Column): Column =
      bps.indices.foldLeft(lit(nBins - 1)) { (acc, i) =>
        when(c <= bps(bps.length - 1 - i), bps.length - 1 - i)
          .otherwise(acc)
      }
    def pct(df: DataFrame, c: Column, name: String): DataFrame =
      normalizedCounts(df.select(bucket(c).as("bucket")),
        Seq("bucket"), name)
    // same 0.0001 clamp as psiReport (psi.rs:58-63)
    pct(baseline, baseCol, "baseline_pct")
      .join(pct(actual, actCol, "actual_pct"), Seq("bucket"), "full")
      .na.fill(0.0, Seq("baseline_pct", "actual_pct"))
      .withColumn("baseline_pct", greatest(col("baseline_pct"), lit(1e-4)))
      .withColumn("actual_pct", greatest(col("actual_pct"), lit(1e-4)))
      .withColumn("psi_bin",
        (col("actual_pct") - col("baseline_pct")) *
          log(col("actual_pct") / col("baseline_pct")))
      .orderBy("bucket")
  }

  /** Discrete PSI: categories instead of quantile buckets.
    * (num.py:600 psi_discrete; psi.rs:97) */
  def psiDiscrete(baseline: DataFrame, baseCol: Column,
                  actual: DataFrame, actCol: Column): DataFrame = {
    def pct(df: DataFrame, c: Column, name: String): DataFrame =
      normalizedCounts(df.select(c.as("value")), Seq("value"), name)
    // same 0.0001 clamp as psiReport (psi.rs:58-63)
    pct(baseline, baseCol, "baseline_pct")
      .join(pct(actual, actCol, "actual_pct"), Seq("value"), "full")
      .na.fill(0.0, Seq("baseline_pct", "actual_pct"))
      .withColumn("baseline_pct", greatest(col("baseline_pct"), lit(1e-4)))
      .withColumn("actual_pct", greatest(col("actual_pct"), lit(1e-4)))
      .withColumn("psi_bin",
        (col("actual_pct") - col("baseline_pct")) *
          log(col("actual_pct") / col("baseline_pct")))
  }

  /** Remove the least-squares linear trend of x over an explicit order
    * column, per group (num.py:1021 detrend). Two window aggregates (no
    * shuffle beyond the group partitioning); method "mean" subtracts the
    * group mean instead. */
  def detrend(df: DataFrame, x: Column, order: Column,
              groupNames: Seq[String], method: String = "linear",
              out: String = "detrended"): DataFrame = {
    val w = Window.partitionBy(groupNames.map(col): _*)
    if (method == "mean") df.withColumn(out, x - avg(x).over(w))
    else {
      val i = order.cast("double")
      val slope = (avg(i * x).over(w) - avg(i).over(w) * avg(x).over(w)) /
        (avg(i * i).over(w) - avg(i).over(w) * avg(i).over(w))
      val intercept = avg(x).over(w) - slope * avg(i).over(w)
      df.withColumn(out, x - (slope * i + intercept))
    }
  }

  /** Scatter-add out[idx] += x (num.py:1178 add_at;
    * float_extras.rs:304): groupBy(idx).sum — the distributed-native
    * form of the sequential kernel. */
  def addAt(df: DataFrame, idx: Column, x: Column): DataFrame =
    df.groupBy(idx.as("idx")).agg(sum(x).as("sum")).orderBy("idx")


}

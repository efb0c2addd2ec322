package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ML evaluation metrics as aggregate `Column` expressions, usable inside
  * `df.groupBy(...).agg(...)` exactly like the reference's
  * `group_by().agg(pds.query_*)` pattern
  * (reference: python/polars_ds/exprs/metrics.py).
  *
  * Every function here is *algebraic*: a composition of built-in Spark
  * aggregates (`sum/avg/count/max/...`), so Catalyst plans them as
  * partial + final hash aggregation — map-side combine, single shuffle,
  * whole-stage codegen. No UDAF object allocation, no per-group buffers.
  * That is the property that lets these run unchanged over 100 TB: the
  * partial states are O(1) per group per partition.
  *
  * Non-algebraic metrics (exact ROC-AUC and friends, which need a sort)
  * live in [[graft.ops.MetricOps]] as distributed DataFrame ops and in
  * [[graft.agg]] as typed Aggregators for small-group agg-context parity.
  */
object Metrics {

  /** Guard against log(0): clip p into [eps, 1-eps].
    * Mirrors metrics.py query_log_loss semantics. */
  private def clip01(p: Column, eps: Double): Column =
    least(greatest(p, lit(eps)), lit(1.0 - eps))

  /** Mean absolute error; normalize=false returns the sum.
    * (metrics.py:162 query_l1) */
  def l1Loss(y: Column, p: Column, normalize: Boolean = true): Column =
    if (normalize) avg(abs(y - p)) else sum(abs(y - p))

  /** Mean squared error; normalize=false returns the sum.
    * (metrics.py:141 query_l2) */
  def l2Loss(y: Column, p: Column, normalize: Boolean = true): Column =
    if (normalize) avg((y - p) * (y - p)) else sum((y - p) * (y - p))

  /** Max absolute error. (metrics.py:186 query_l_inf) */
  def lInfLoss(y: Column, p: Column): Column = max(abs(y - p))

  /** Root mean squared error. */
  def rmse(y: Column, p: Column): Column = sqrt(l2Loss(y, p))

  /** Mean absolute percentage error; weighted variant uses |y| weights.
    * (metrics.py:229 query_mape) */
  def mape(y: Column, p: Column, weighted: Boolean = false): Column =
    if (weighted) sum(abs(y - p)) / sum(abs(y))
    else avg(abs((y - p) / y))

  /** Symmetric MAPE. (metrics.py:253 query_smape) */
  def smape(y: Column, p: Column, double: Boolean = false): Column = {
    val base = avg(abs(p - y) / (abs(p) + abs(y)))
    if (double) base * 2.0 else base
  }

  /** Mean squared log error; normalize=false returns the sum.
    * (metrics.py:334 query_msle) */
  def msle(y: Column, p: Column, normalize: Boolean = true): Column = {
    val se = pow(log1p(y) - log1p(p), 2)
    if (normalize) avg(se) else sum(se)
  }

  /** R-squared. Algebraic expansion: SS_tot = Σy² − (Σy)²/n so no nested
    * aggregate is needed. (metrics.py:64 query_r2) */
  def r2(y: Column, p: Column): Column = {
    val n = count(y)
    val ssRes = sum((y - p) * (y - p))
    val ssTot = sum(y * y) - sum(y) * sum(y) / n
    lit(1.0) - ssRes / ssTot
  }

  /** Adjusted R². (metrics.py:84 query_adj_r2) */
  def adjR2(y: Column, p: Column, nFeatures: Int): Column = {
    val n = count(y).cast("double")
    lit(1.0) - (lit(1.0) - r2(y, p)) * (n - 1.0) / (n - 1.0 - nFeatures)
  }

  /** log-cosh loss; numerically stable form:
    * log(cosh(x)) = |x| + log1p(exp(-2|x|)) - log(2).
    * (metrics.py:108 query_log_cosh) */
  def logCosh(y: Column, p: Column, normalize: Boolean = true): Column = {
    val x = abs(p - y)
    val lc = x + log1p(exp(x * -2.0)) - math.log(2.0)
    if (normalize) avg(lc) else sum(lc)
  }

  /** Huber loss (mean). (metrics.py:118 query_hubor_loss) */
  def huberLoss(y: Column, p: Column, delta: Double): Column = {
    val d = abs(y - p)
    avg(when(d < delta, d * d / 2.0)
      .otherwise(lit(delta) * (d - delta / 2.0)))
  }

  /** Binary log loss / cross entropy. y in {0,1}, p in (0,1).
    * (metrics.py:198 query_log_loss) */
  def logLoss(y: Column, p: Column, normalize: Boolean = true,
              eps: Double = 1e-15): Column = {
    val pc = clip01(p, eps)
    val ll = -(y * log(pc) + (lit(1.0) - y) * log(lit(1.0) - pc))
    if (normalize) avg(ll) else sum(ll)
  }

  /** Categorical cross entropy: y is the true class index (0-based), probs
    * an array column of class probabilities. (metrics.py:569) */
  def catCrossEntropy(y: Column, probs: Column, normalize: Boolean = true,
                      eps: Double = 1e-15): Column = {
    val pTrue = clip01(element_at(probs, (y + 1).cast("int")), eps)
    if (normalize) -avg(log(pTrue)) else -sum(log(pTrue))
  }

  /** Mean absolute deviation around the mean — algebraic two-sum trick is
    * impossible (abs of centered value), so this returns the *median*-free
    * mean version via a subexpression that needs a window/second pass.
    * Provided here only for single-pass approximation-free use:
    * use [[graft.ops.MetricOps.mad]] for group-wise exact computation. */
  // (intentionally no single-pass mad here; see MetricOps)

  /** Matthews correlation coefficient for binary labels.
    * y, p are {0,1} (p = hard predictions). Pure conditional counts.
    * (metrics.py:599 query_mcc; kernel src/num_ext/tp_fp.rs:195) */
  def mcc(y: Column, p: Column): Column = {
    val tp = sum(when(y === 1 && p === 1, 1L).otherwise(0L)).cast("double")
    val fp = sum(when(y === 0 && p === 1, 1L).otherwise(0L)).cast("double")
    val tn = sum(when(y === 0 && p === 0, 1L).otherwise(0L)).cast("double")
    val fn = sum(when(y === 1 && p === 0, 1L).otherwise(0L)).cast("double")
    (tp * tn - fp * fn) /
      sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
  }

  /** The 4 confusion counts as a struct (building block for
    * confusionMatrix / precision / recall / ...). */
  def confusionCounts(y: Column, p: Column): Column = struct(
    sum(when(y === 1 && p === 1, 1L).otherwise(0L)).as("tp"),
    sum(when(y === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
    sum(when(y === 0 && p === 0, 1L).otherwise(0L)).as("tn"),
    sum(when(y === 1 && p === 0, 1L).otherwise(0L)).as("fn")
  )

  /** Full 25-field confusion-matrix struct mirroring the reference's
    * query_confusion_matrix (metrics.py:418; field list
    * src/num_ext/tp_fp.rs:245-303). `threshold` binarizes the score. */
  def confusionMatrix(y: Column, score: Column,
                      threshold: Double = 0.5): Column = {
    val p = (score >= threshold).cast("long")
    val yl = y.cast("long")
    val tp = sum(when(yl === 1 && p === 1, 1L).otherwise(0L)).cast("double")
    val fp = sum(when(yl === 0 && p === 1, 1L).otherwise(0L)).cast("double")
    val tn = sum(when(yl === 0 && p === 0, 1L).otherwise(0L)).cast("double")
    val fn = sum(when(yl === 1 && p === 0, 1L).otherwise(0L)).cast("double")
    // the reference's nandiv convention (test_metrics.py:42): an
    // undefined ratio (zero denominator, e.g. fpr with no negatives)
    // is NaN, never null — Spark's divide would yield null instead
    def nd(a: Column, b: Column): Column =
      when(b === 0.0, lit(Double.NaN)).otherwise(a / b)
    val precision = nd(tp, tp + fp)
    val recall = nd(tp, tp + fn)         // = tpr
    val specificity = nd(tn, tn + fp)    // = tnr
    val fpr = nd(fp, fp + tn)
    val plr = nd(recall, lit(1.0) - specificity)
    val nlr = nd(lit(1.0) - recall, specificity)
    struct(
      tp.cast("long").as("tp"), fp.cast("long").as("fp"),
      tn.cast("long").as("tn"), fn.cast("long").as("fn"),
      recall.as("tpr"),
      fpr.as("fpr"),
      nd(fn, fn + tp).as("fnr"),
      specificity.as("tnr"),
      precision.as("precision"),
      recall.as("recall"),
      nd(tp + fn, tp + fp + tn + fn).as("prevalence"),
      nd(sqrt(recall * fpr) - fpr, recall - fpr)
        .as("prevalence_threshold"),
      nd(fn, fn + tn).as("false_omission_rate"),
      nd(tp, tp + fp + fn).as("threat_score"),
      nd(tp + tn, tp + fp + tn + fn).as("accuracy"),
      nd(tp * 2.0, tp * 2.0 + fp + fn).as("f1"),
      nd(tp * tn - fp * fn,
        sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))).as("mcc"),
      (recall + specificity - 1.0).as("informedness"),
      nd(fn, fn + tp).as("miss_rate"),
      nd(fp, fp + tp).as("false_discovery_rate"),
      nd(tn, tn + fn).as("npv"),
      plr.as("plr"),
      nlr.as("nlr"),
      (precision + nd(tn, tn + fn) - 1.0).as("markedness"),
      ((recall + specificity) / 2.0).as("balanced_accuracy"),
      (sqrt(precision * recall)).as("fowlkes_mallows"),
      nd(plr, nlr).as("dor")
    )
  }

  /** F-beta from counts (beta=1 default). */
  def fScore(y: Column, p: Column, beta: Double = 1.0): Column = {
    val tp = sum(when(y === 1 && p === 1, 1L).otherwise(0L)).cast("double")
    val fp = sum(when(y === 0 && p === 1, 1L).otherwise(0L)).cast("double")
    val fn = sum(when(y === 1 && p === 0, 1L).otherwise(0L)).cast("double")
    val b2 = beta * beta
    tp * (1.0 + b2) / (tp * (1.0 + b2) + fn * b2 + fp)
  }

  /** MASE needs ordered seasonal diffs — see [[graft.ops.MetricOps.mase]]. */
}

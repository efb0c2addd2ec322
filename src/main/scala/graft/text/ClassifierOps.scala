package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style document quality classifier: hashing-trick
  * bag-of-words features + the library's distributed IRLS logistic.
  * This is the CCNet / GPT-3 "wiki-vs-crawl" quality-filter pattern:
  * label a seed set (curated = 1, raw crawl = 0), train a linear
  * model over hashed token counts, score the whole corpus, keep the
  * high-probability tail.
  *
  * Feature hashing uses the first two hex digits of md5(token) mod
  * `dim` — deliberately engine-portable (md5 + ascii arithmetic
  * exist everywhere), so an external auditor can recompute every
  * feature; swap in xxhash64 for a few % less skew if auditability
  * doesn't matter. Featurization is one explode + one conditional-sum
  * aggregation (map-side partial, fully codegen); training is
  * [[graft.ops.LinRegOps.logisticFit]] — one weighted-Gram aggregate
  * per IRLS step, β on the driver. Nothing here collects data rows.
  */
object ClassifierOps {

  /** Hash bucket of one token: value of the first two hex chars of
    * md5(token), mod `dim` (non-negative). */
  def hashedBucket(token: Column, dim: Int): Column =
    (conv(substring(md5(token), 1, 2), 16, 10).cast("int") % dim)

  /** Whitespace tokens of `lower(trim(text))` — the same house rule
    * every text oracle replays (`regexp_split_to_array(LOWER(TRIM(x)),
    * '\s+')` with empties dropped). */
  private def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Hashed bag-of-words features: one row per input row (keyed by
    * `id`), columns `f0..f{dim-1}` = bucket count / token count (0.0
    * for empty docs) and `n_tok`. One explode + one aggregation. */
  def hashedFeatures(df: DataFrame, id: Column, text: Column,
                     dim: Int): DataFrame = {
    require(dim > 1, "hashedFeatures: dim must be > 1")
    val tok = df.select(id.as("__hf_id"),
        explode(tokens(text)).as("__hf_t"))
      .select(col("__hf_id"),
        hashedBucket(col("__hf_t"), dim).as("__hf_b"))
    val aggs = (0 until dim).map(i =>
      sum(when(col("__hf_b") === i, 1).otherwise(0))
        .cast("double").as(s"__hf_c$i")) :+
      count(lit(1)).as("__hf_n")
    val counts = tok.groupBy(col("__hf_id")).agg(aggs.head, aggs.tail: _*)
    val base = df.select(id.as("__hf_id"), col("*"))
    base.join(counts, Seq("__hf_id"), "left")
      .select(base.columns.filter(_ != "__hf_id").map(col) ++
        (0 until dim).map(i =>
          coalesce(col(s"__hf_c$i") / col("__hf_n"), lit(0.0))
            .as(s"f$i")) :+
        coalesce(col("__hf_n"), lit(0L)).as("n_tok"): _*)
  }

  /** Train the quality classifier: hashed features + IRLS logistic.
    * Returns coefficients (f0..f{dim-1}, bias last).
    *
    * `lambda` (default 1e-6) is REQUIRED to be > 0 here, not a
    * tuning nicety: the normalized bucket shares of any non-empty doc
    * sum to exactly 1, which is perfectly collinear with the
    * intercept — the unpenalized Gram is singular by construction.
    * The tiny ridge picks the minimum-norm solution deterministically;
    * at 1e-6 the score-equation residuals stay ~1e-5·|β| (still 0 at
    * any sane rounding). */
  def trainQualityClassifier(df: DataFrame, id: Column, text: Column,
                             label: Column, dim: Int = 13,
                             maxIter: Int = 40,
                             lambda: Double = 1e-6): Array[Double] = {
    require(lambda > 0.0,
      "trainQualityClassifier: lambda must be > 0 (normalized bucket " +
        "shares are collinear with the intercept)")
    val feats = hashedFeatures(df.select(id.as("__qc_id"),
      text.as("__qc_text"), label.as("__qc_y")),
      col("__qc_id"), col("__qc_text"), dim)
    graft.ops.LinRegOps.logisticFit(feats,
      (0 until dim).map(i => col(s"f$i")), col("__qc_y"),
      maxIter = maxIter, lambda = lambda)
  }

  /** Score rows with a trained classifier: adds `quality_prob`. */
  def scoreQuality(df: DataFrame, id: Column, text: Column,
                   beta: Array[Double]): DataFrame = {
    val dim = beta.length - 1
    val feats = hashedFeatures(df, id, text, dim)
    feats.withColumn("quality_prob",
        graft.ops.LinRegOps.logisticPredict(
          (0 until dim).map(i => col(s"f$i")), beta))
      .drop((0 until dim).map(i => s"f$i") :+ "n_tok": _*)
  }
}

package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling & splitting (SURVEY §2.12; reference
  * python/polars_ds/sample_and_split/sample_and_split.py).
  *
  * Randomness is Spark's `rand(seed)` — deterministic per
  * (seed, partition layout). Cross-engine bitwise equality with the
  * reference's rand streams is impossible (SURVEY §7 hard parts), so
  * correctness checks are structural: exact counts, ratios, and
  * per-group invariants, all of which ARE deterministic.
  */
object SampleOps {

  /** Sample an exact number of rows (sample_and_split.py:15 `sample`
    * with n). Global sort on the random key — for cluster scale prefer
    * fraction-based sampling (below) which is shuffle-free. */
  def sampleN(df: DataFrame, n: Int, seed: Long = 42): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** Bernoulli fraction sample — shuffle-free, scales linearly. */
  def sampleFraction(df: DataFrame, fraction: Double,
                     withReplacement: Boolean = false,
                     seed: Long = 42): DataFrame =
    df.sample(withReplacement, fraction, seed)

  /** Exact-n sampling WITH replacement (sample_and_split.py:15 with
    * `replace=True`): draw n uniform row indices and join them against
    * the zipWithIndex'd frame — fully distributed (one hash join on
    * the index), never a driver-side collect, and rows drawn k times
    * appear k times. */
  def sampleNWithReplacement(df: DataFrame, n: Long, seed: Long = 42)
      : DataFrame = {
    val spark = df.sparkSession
    val total = df.count()
    require(total > 0, "sampleNWithReplacement: empty frame")
    val schema = df.schema.add("_idx",
      org.apache.spark.sql.types.LongType)
    val indexed = spark.createDataFrame(
      df.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }, schema)
    // clamp: rand() can reach 1−2⁻⁵³, and for large `total` the product
    // rounds up to exactly `total` — an index that joins to nothing and
    // silently shorts the exact-n contract by a row
    val picks = spark.range(n)
      .select(least(floor(rand(seed) * total), lit(total - 1))
        .cast("long").as("_idx"))
    indexed.join(picks, "_idx").drop("_idx")
  }

  /** Equalize group sizes down to the smallest group (or `target`):
    * keep a uniform random subset of each group.
    * (sample_and_split.py:140 volume_neutral) */
  def volumeNeutral(df: DataFrame, by: Seq[String],
                    target: Option[Int] = None,
                    seed: Long = 42): DataFrame = {
    val sizes = df.groupBy(by.map(col): _*).count()
    val cap = target.getOrElse(
      sizes.agg(min("count")).head.getLong(0).toInt)
    val w = Window.partitionBy(by.map(col): _*).orderBy(rand(seed))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Downsample the given classes by per-class fractions, keep others
    * intact. (sample_and_split.py:238 downsample) */
  def downsample(df: DataFrame, classCol: String,
                 fractions: Map[String, Double],
                 seed: Long = 42): DataFrame = {
    val keep = df.stat.sampleBy(classCol,
      fractions, seed)
    val untouched = df.filter(!col(classCol).isin(fractions.keys.toSeq: _*))
    keep.filter(col(classCol).isin(fractions.keys.toSeq: _*))
      .unionByName(untouched)
  }

  /** Train/test/k-way split label, optionally stratified: percent_rank
    * over a seeded random order within each stratum, cut at cumulative
    * ratios. Counts per (stratum, split) are deterministic given group
    * sizes. (sample_and_split.py:416 split_by_ratio) */
  def splitByRatio(df: DataFrame, ratios: Seq[(String, Double)],
                   stratifyBy: Seq[String] = Nil,
                   seed: Long = 42, out: String = "split"): DataFrame = {
    require(math.abs(ratios.map(_._2).sum - 1.0) < 1e-9,
      "ratios must sum to 1")
    val w = (if (stratifyBy.isEmpty) Window.partitionBy()
             else Window.partitionBy(stratifyBy.map(col): _*))
      .orderBy(rand(seed))
    val pr = percent_rank().over(w)
    // snap cumulative bounds to 12 decimals: 0.7+0.2 must be the user's
    // 0.9, not 0.8999999999999999, or boundary rows land one split off
    val cum = ratios.scanLeft(0.0)(_ + _._2).tail
      .map(x => math.rint(x * 1e12) / 1e12)
    val labeled = ratios.map(_._1).zip(cum).reverse
      .foldLeft(lit(ratios.last._1)) { case (acc, (name, bound)) =>
        when(pr <= bound, name).otherwise(acc)
      }
    // reversed fold: the tightest bound lands outermost, so the label
    // is the FIRST cum-ratio the row's percent_rank falls under
    df.withColumn(out, labeled)
  }

  /** Choose k random column names (driver-side).
    * (sample_and_split.py:352 random_cols) */
  def randomCols(df: DataFrame, k: Int, seed: Long = 42): Seq[String] = {
    val rng = new scala.util.Random(seed)
    rng.shuffle(df.columns.toList).take(k)
  }
}

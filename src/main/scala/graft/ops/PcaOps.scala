package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import breeze.linalg.{eigSym, DenseMatrix}

/** PCA / singular values per group (SURVEY §2.6; reference num.py:369
  * singular_values/pca/principal_components backed by faer SVD,
  * src/num_ext/pca.rs:39-184).
  *
  * Spark-first design: the ONLY distributed work is a plain algebraic
  * aggregation of sums and cross-products (O(d²) state per group,
  * map-side combined, single shuffle). The d×d covariance eigen-solve
  * runs as a scalar UDF on the one aggregated row per group — no
  * collect, no per-row matrix work, group count can be millions.
  * Covariance PCA ≡ SVD of centered X: σ_i = √(λ_i·(n−1)).
  */
object PcaOps {

  /** Eigen-decomposition of a packed symmetric matrix (row-major d×d),
    * returning eigenvalues descending. */
  private def eigDesc(packed: Seq[Double], d: Int): Seq[Double] = {
    val m = DenseMatrix.tabulate(d, d)((i, j) => packed(i * d + j))
    eigSym(m).eigenvalues.toArray.sorted(Ordering[Double].reverse).toSeq
  }

  private val eigUdf = udf((packed: Seq[Double], d: Int) => eigDesc(packed, d))

  /** Adds per-group `singular_values` (descending) and
    * `explained_variance_ratio` array columns. */
  def singularValues(df: DataFrame, features: Seq[Column],
                     groupNames: Seq[String]): DataFrame = {
    val d = features.length
    val gc = groupNames.map(col)
    val fx = features.zipWithIndex.map { case (c, i) =>
      c.cast("double").as(s"__f$i") }
    val pre = df.select(gc ++ fx: _*)
    val aggs =
      (for (i <- 0 until d; j <- i until d) yield
        sum(col(s"__f$i") * col(s"__f$j")).as(s"__s_${i}_$j")) ++
      (0 until d).map(i => sum(col(s"__f$i")).as(s"__s_$i")) :+
      count(lit(1)).cast("double").as("__n")
    val agg = pre.groupBy(gc: _*).agg(aggs.head, aggs.tail: _*)
    // packed covariance: cov(i,j) = (S_ij − S_i·S_j/n)/(n−1)
    val cov = array((for (i <- 0 until d; j <- 0 until d) yield {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      (col(s"__s_${a}_$b") - col(s"__s_$i") * col(s"__s_$j") / col("__n")) /
        (col("__n") - 1.0)
    }): _*)
    val eig = eigUdf(cov, lit(d))
    val sv = transform(eig, v =>
      sqrt(greatest(v, lit(0.0)) * (col("__n") - 1.0)))
    val tot = aggregate(eig, lit(0.0), (acc, v) => acc + v)
    agg
      .withColumn("singular_values", sv)
      .withColumn("explained_variance_ratio",
        transform(eig, v => v / tot))
      .select(gc ++ Seq(col("singular_values"),
        col("explained_variance_ratio"), col("__n").as("n")): _*)
  }
}

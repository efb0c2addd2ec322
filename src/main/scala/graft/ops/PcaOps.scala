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
    val a = packed.toArray // List at udf call sites: O(1) indexing after
    val m = DenseMatrix.tabulate(d, d)((i, j) => a(i * d + j))
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

  /** Per-row projection onto the top-`k` principal components
    * (num.py:434 principal_components): appends `pc_1..pc_k` columns.
    *
    * Mechanism for scale: ONE algebraic aggregation collapses the frame
    * to a d×d covariance on the driver (d² doubles — constant-size
    * collect), the eigen-solve happens once, and the projection is pure
    * codegen'd Column arithmetic with the eigenvector entries inlined as
    * literals — a single streaming pass, no shuffle, no per-row UDF.
    *
    * Rows with any null feature project to null and are excluded from
    * the fit. Eigenvector signs are normalized so each component's
    * largest-magnitude entry is positive (first index wins ties) —
    * deterministic across platforms, unlike raw LAPACK/faer output. */
  def principalComponents(df: DataFrame, features: Seq[Column], k: Int,
                          center: Boolean = true): DataFrame = {
    val d = features.length
    require(k >= 1 && k <= d,
      s"principalComponents: need 1 <= k <= $d, got $k")
    val fx = features.zipWithIndex.map { case (c, i) =>
      c.cast("double").as(s"__f$i") }
    val aggs =
      (for (i <- 0 until d; j <- i until d) yield
        sum(col(s"__f$i") * col(s"__f$j")).as(s"s_${i}_$j")) ++
      (0 until d).map(i => sum(col(s"__f$i")).as(s"s_$i")) :+
      count(lit(1)).cast("double").as("n")
    val row = df.select(fx: _*).na.drop()
      .agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Double]("n")
    require(n > k, s"principalComponents: needs more than $k rows")
    val mean = Array.tabulate(d)(i => row.getAs[Double](s"s_$i") / n)
    val cov = DenseMatrix.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      (row.getAs[Double](s"s_${a}_$b") - mean(i) * mean(j) * n) / (n - 1.0)
    }
    val es = eigSym(cov)
    // eigenvalues ascending in breeze — take the top k, descending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(i => es.eigenvectors(i, c))
      val m = (0 until d).maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }
    val pcCols = comps.zipWithIndex.map { case (v, pi) =>
      (0 until d).map { i =>
        val centered = if (center) features(i).cast("double") - mean(i)
          else features(i).cast("double")
        centered * v(i)
      }.reduce(_ + _).as(s"pc_${pi + 1}")
    }
    df.select(col("*") +: pcCols: _*)
  }
}

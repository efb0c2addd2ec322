package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding compression —
  * the standard dimensionality-reduction step in front of ANN /
  * clustering at corpus scale (distances are preserved within 1±ε for
  * k = O(ln n / ε²) output dims).
  *
  * The Gaussian projection matrix is DERIVED, not sampled: entry
  * (j, i) comes from md5("jl:salt:j:i") via Box–Muller over the two
  * 32-bit uniforms in the digest's first 16 hex chars. That makes the
  * projection a pure function of (salt, dims) — the same bytes on any
  * cluster, any run, any engine — so the q_jl_project oracle recomputes
  * every matrix entry AND every projected coordinate in SQL.
  *
  * Scale shape: the matrix is embedded as a plan literal (outDim ×
  * inDim doubles — a few KB, same pattern as the pHash DCT basis
  * table) and the projection is codegen'd zip_with/aggregate Column
  * algebra: row-local, no shuffle, no UDF, no broadcast needed.
  */
object ProjectOps {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Deterministic standard normal for matrix cell (j, i): Box–Muller
    * over two (value + 0.5)/2³² uniforms from md5("jl:salt:j:i"). */
  def gaussianEntry(salt: Int, j: Int, i: Int): Double = {
    val hex = md5Hex(s"jl:$salt:$j:$i")
    val u1 = (java.lang.Long.parseLong(hex.substring(0, 8), 16) + 0.5) /
      4294967296.0
    val u2 = (java.lang.Long.parseLong(hex.substring(8, 16), 16) + 0.5) /
      4294967296.0
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** The outDim × inDim projection matrix for `salt`. */
  def jlMatrix(outDim: Int, inDim: Int,
               salt: Int = 0): Array[Array[Double]] = {
    require(outDim >= 1 && inDim >= 1,
      s"jlMatrix: dims must be >= 1, got ($outDim, $inDim)")
    Array.tabulate(outDim, inDim)((j, i) => gaussianEntry(salt, j, i))
  }

  /** Project a numeric array column to `outDim` dims:
    * out_j = (1/√outDim) Σ_i vec_i · g(j, i). The caller's vector must
    * have exactly `inDim` elements (shorter vectors are zero-padded by
    * zip_with's null→0 coalesce; longer ones are truncated). */
  def jlProject(vec: Column, outDim: Int, inDim: Int,
                salt: Int = 0): Column = {
    val m = jlMatrix(outDim, inDim, salt)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val mat = array(m.map(r => array(r.map(lit): _*)): _*)
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(
        zip_with(vec.cast("array<double>"), element_at(mat, j + 1),
          (x, y) => coalesce(x, lit(0.0)) * y),
        lit(0.0), (acc, x) => acc + x) * scale)
  }
}

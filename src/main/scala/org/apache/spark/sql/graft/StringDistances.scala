// Lives under org.apache.spark.sql so it can use the private[sql]
// expression/codegen APIs — the standard packaging for third-party
// native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen promotions of the hot elementwise fuzzy-string
  * kernels (SURVEY §2.15; reference kernels src/str_ext/jaro.rs,
  * osa.rs, levenshtein.rs:261). The Scala UDF versions these replace
  * were the one remaining interpreted family on the string hot path:
  * each row paid a catalyst→JVM boundary and boxing. These stay inside
  * whole-stage codegen — the generated code calls the same static
  * kernels in [[graft.functions.Strings]] that the interpreted eval
  * uses, so parity with the UDF path is by construction (and pinned by
  * NativeExprSpec).
  *
  * All four are null-intolerant binary expressions over strings: any
  * null input → null, matching the previous UDF null contract.
  */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.jaro(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.jaro($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Jaro–Winkler with the rapidfuzz 0.7-boost-threshold convention;
  * `weight` is the prefix-boost scale (plan-time constant — inlined
  * into the generated code as a double literal). */
case class JaroWinklerSimilarity(left: Expression, right: Expression,
                                 weight: Double)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.jaroWinkler(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], weight)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.jaroWinkler($a, $b, ${weight}D)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Optimal-string-alignment (restricted Damerau) distance over code
  * points. */
case class OsaDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.osa(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.osa($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OsaDistance =
    copy(left = newLeft, right = newRight)
}

/** Full Damerau–Levenshtein (unrestricted transpositions) over code
  * points. */
case class DamerauDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.damerau(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.damerau($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauDistance =
    copy(left = newLeft, right = newRight)
}

/** Char-n-gram set similarity — one expression covering the four
  * reference kernels (string.py:230 str_jaccard, :308 sorensen_dice,
  * :269 overlap_coeff, :347 tversky_sim). `kind` selects the formula
  * (plan-time constant, inlined into the generated code); `alpha`/
  * `beta` only matter for tversky. Same n-gram set construction and
  * empty-set conventions as the UDFs these replace (parity pinned by
  * NativeExprSpec). */
case class NgramSetSimilarity(left: Expression, right: Expression,
                              n: Int, kind: Int,
                              alpha: Double, beta: Double)
    extends BinaryExpression with ExpectsInputTypes {
  // the reference raises ValueError for negative weights
  // (string.py:347 str_tversky_sim); non-finite values would also
  // interpolate as uncompilable Java literals (NaND / InfinityD) in
  // doGenCode and force a noisy codegen fallback
  require(kind != NgramSetSimilarity.Tversky ||
    (java.lang.Double.isFinite(alpha) && alpha >= 0 &&
      java.lang.Double.isFinite(beta) && beta >= 0),
    s"tversky: alpha and beta must be finite and >= 0, got α=$alpha β=$beta")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.ngramSim(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], n, kind, alpha, beta)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) =>
      s"$cls.ngramSim($a, $b, $n, $kind, ${alpha}D, ${beta}D)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramSetSimilarity =
    copy(left = newLeft, right = newRight)
}

object NgramSetSimilarity {
  val Jaccard = 0; val Dice = 1; val Overlap = 2; val Tversky = 3
}

/** Longest-common-substring / -subsequence LENGTH (string.py:547
  * str_lcs_substr, :602 str_lcs_subseq); `subsequence` is a plan-time
  * constant selecting the DP. */
case class LcsLength(left: Expression, right: Expression,
                     subsequence: Boolean)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.lcsLen(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], subsequence)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.lcsLen($a, $b, $subsequence)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

/** rapidfuzz-style indel ratio 1 − indel/(|a|+|b|) (string.py:679
  * str_fuzz) — LCS-subsequence DP in one codegen'd kernel. */
case class FuzzRatio(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.fuzzRatio(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = StringDistances.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.fuzzRatio($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FuzzRatio =
    copy(left = newLeft, right = newRight)
}

/** Static bridges shared by interpreted eval and generated code —
  * one UTF8String→String decode per input, then the exact kernels the
  * UDF path ran. */
object StringDistances {
  def jaro(a: UTF8String, b: UTF8String): Double =
    graft.functions.Strings.jaroSim(a.toString, b.toString)

  def jaroWinkler(a: UTF8String, b: UTF8String, weight: Double): Double =
    graft.functions.Strings.jaroWinklerSim(a.toString, b.toString, weight)

  def osa(a: UTF8String, b: UTF8String): Int =
    graft.functions.Strings.osaDist(a.toString, b.toString)

  def damerau(a: UTF8String, b: UTF8String): Int =
    graft.functions.Strings.damerauDist(a.toString, b.toString)

  def ngramSim(a: UTF8String, b: UTF8String, n: Int, kind: Int,
               alpha: Double, beta: Double): Double = {
    val sa = graft.functions.Strings.ngramSet(a.toString, n)
    val sb = graft.functions.Strings.ngramSet(b.toString, n)
    val inter = sa.intersect(sb).size.toDouble
    kind match {
      case 0 => // jaccard
        val uni = sa.size + sb.size - inter
        if (uni == 0) 1.0 else inter / uni
      case 1 => // sorensen–dice
        if (sa.isEmpty && sb.isEmpty) 1.0
        else inter * 2.0 / (sa.size + sb.size)
      case 2 => // overlap coefficient
        val m = math.min(sa.size, sb.size)
        if (m == 0) 0.0 else inter / m
      case _ => // tversky
        val d = inter + alpha * (sa.size - inter) + beta * (sb.size - inter)
        if (d == 0) 0.0 else inter / d
    }
  }

  def lcsLen(a: UTF8String, b: UTF8String, subsequence: Boolean): Int =
    if (subsequence)
      graft.functions.Strings.lcsSubseqLen(a.toString, b.toString)
    else graft.functions.Strings.lcsSubstrLen(a.toString, b.toString)

  def fuzzRatio(a: UTF8String, b: UTF8String): Double = {
    val x = a.toString; val y = b.toString
    val tot = x.length + y.length
    if (tot == 0) 1.0
    else 1.0 - (tot - 2.0 * graft.functions.Strings.lcsSubseqLen(x, y)) / tot
  }
}

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
}

// Lives under org.apache.spark.sql so it can use the private[sql]
// expression/codegen APIs (AbstractDataType, ExpressionUtils) — the
// standard packaging for third-party native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Hamming distance between two
  * equal-length strings (null if lengths differ) — the codegen
  * promotion path SURVEY §2.15 prescribes for hot elementwise string
  * kernels (reference kernel src/str_ext/hamming.rs:24).
  *
  * Unlike a Scala UDF this stays inside whole-stage codegen: no
  * catalyst→JVM boundary, no row boxing, and the comparison loop the
  * generated code runs is exactly the static `compute` below. Register
  * as SQL function `graft_hamming` via [[GraftExtensions]] or use
  * [[NativeFunctions.hammingNative]] from the DSL.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  // length mismatch → null even for non-null inputs
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    HammingDistance.compute(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = HammingDistance.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"""
         |Object graftHammingRes = $cls.compute($l, $r);
         |if (graftHammingRes == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Integer) graftHammingRes).intValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Integer = {
    val sa = a.toString
    val sb = b.toString
    if (sa.length != sb.length) null
    else {
      var d = 0
      var i = 0
      while (i < sa.length) {
        if (sa.charAt(i) != sb.charAt(i)) d += 1
        i += 1
      }
      Integer.valueOf(d)
    }
  }
}

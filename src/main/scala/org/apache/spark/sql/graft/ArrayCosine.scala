// Lives under org.apache.spark.sql so it can use the private[sql]
// expression/codegen APIs — the standard packaging for third-party
// native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native cosine similarity of two array<double> columns — the exact
  * verification kernel of the ANN/near-dup family
  * ([[graft.sim.SimOps.cosine]]).
  *
  * Replaces the higher-order-function form
  * `aggregate(zip_with(a,b,*), 0.0, +) / sqrt(...)`, which allocates a
  * product array plus lambda frames PER PAIR — measured ~60 s of the
  * sf10 cosine-dup sweep rung was this verify leg over ~20M candidate
  * pairs. The kernel is one fused primitive loop inside whole-stage
  * codegen and is arithmetic-identical to the HOF form: each
  * accumulator folds in ascending index order from 0.0, and the final
  * `dot / sqrt(na·nb)` follows Spark's Divide (NULL on a zero divisor
  * — empty or zero-norm vectors → null, not NaN).
  *
  * Null semantics match the HOF form: null input array → null
  * (nullIntolerant); unequal lengths → null (zip_with pads with null,
  * poisoning the fold); any null ELEMENT → null (same poisoning). SQL
  * `graft_cosine_sim`; DSL [[NativeFunctions.cosineSimNative]].
  *
  * The zero-divisor null is returned regardless of
  * `spark.sql.ansi.enabled` — under ANSI mode the HOF form would
  * raise DIVIDE_BY_ZERO instead. Graft sessions force ansi=false;
  * external sessions registering [[GraftExtensions]] get this
  * non-ANSI null contract (documented in docs/API.md).
  */
case class ArrayCosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayCosineSim.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = ArrayCosineSim.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $r = $cls.compute($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSim =
    copy(left = newLeft, right = newRight)
}

object ArrayCosineSim {
  /** Shared by interpreted eval and generated code. Returns null on
    * length mismatch or any null element (the HOF form's null
    * poisoning); otherwise IEEE dot/sqrt(na·nb) with each sum folded
    * in ascending index order — bit-identical to the Column-algebra
    * formulation it replaces. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // Spark's Divide returns NULL on a zero divisor (non-ANSI), even
    // for doubles — zero-norm / empty vectors must match that, not NaN
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) null
    else java.lang.Double.valueOf(dot / denom)
  }
}

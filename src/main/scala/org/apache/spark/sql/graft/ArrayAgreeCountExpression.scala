package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Number of positions where two long arrays hold equal values — the
  * positional-agreement count of two minhash signatures (the MMDS
  * ch.3 Jaccard estimator numerator, reference MinHashLSH.java:150-166
  * intended semantics).
  *
  * Why custom: the built-ins form
  * `size(filter(zip_with(a, b, _ === _), identity))` is three nested
  * interpreted HOFs allocating two intermediate arrays per pair; it
  * runs on EVERY candidate pair (~1M at sf0.1) as the sketch
  * pre-filter gating exact verification. This is one fused loop,
  * codegen-friendly via a static call. */
case class ArrayAgreeCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_array_agree_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayAgreeCountUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ArrayAgreeCountUtil.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeCount =
    copy(left = newLeft, right = newRight)
}

object ArrayAgreeCountUtil {
  /** Signatures are fixed-size (S components); a length mismatch is a
    * pipeline bug — fail loudly rather than truncate (which would also
    * silently skew the agreement estimate vs the oracle). */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"graft_array_agree_count: length mismatch ($n vs ${b.numElements()})")
    }
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused vector dot product — the hot inner loop of every similarity
  * operator (brute-force / LSH / IVF cosine ranking, feature-hashed
  * embedding verification), replacing interpreted
  * `aggregate(zip_with(a, b, ...))` HOF chains that allocate two
  * intermediate arrays per evaluated pair (~millions of pairs at
  * sf0.1).
  *
  * Determinism contract (mirrors graft.oracle.Sql EXACTLY):
  *   - array<float> × array<float> → double: each element cast to
  *     double, multiplied, accumulated LEFT-TO-RIGHT in IEEE double —
  *     bit-identical to the `aggregate` fold the DuckDB oracle
  *     replays (DESIGN.md "Ordered IEEE folds").
  *   - array<long> × array<long> → long: exact int64 accumulation
  *     (order-free), matching the oracle's BIGINT list_reduce.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }
  private lazy val isLong =
    elemType(left) == LongType && elemType(right) == LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (elemType(left), elemType(right)) match {
      case (LongType, LongType) | (FloatType, FloatType) |
           (DoubleType, DoubleType) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot needs two arrays of matching float/double/long " +
        s"element type, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = if (isLong) LongType else DoubleType
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    elemType(left) match {
      case LongType => VecDotUtil.dotLong(x, y)
      case FloatType => VecDotUtil.dotFloat(x, y)
      case DoubleType => VecDotUtil.dotDouble(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = elemType(left) match {
      case LongType => "dotLong"
      case FloatType => "dotFloat"
      case DoubleType => "dotDouble"
    }
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.VecDotUtil.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDotUtil {
  /** All callers dot fixed-dimension vectors; a length mismatch is a
    * dimension bug, and silently truncating would also diverge from
    * the DuckDB oracle (whose out-of-range list index yields NULL,
    * poisoning the sum). Fail loudly instead. */
  private def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"graft_vec_dot: length mismatch ($n vs ${b.numElements()})")
    }
    n
  }

  /** Strict left-to-right double fold over float elements (IEEE
    * order matters — do not reorder or vectorize into pairwise
    * sums: the oracle replays this exact sequence). */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = checkLen(a, b)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

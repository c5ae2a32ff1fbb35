package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Signed feature-hash histogram of a DISTINCT hash array: component
  * j = Σ over h of (h % dim == j ? sign(h) : 0), sign(h) = +1 if
  * (h / dim) even else −1 — the hashing-trick embedding
  * (DocEmbedding.featureEmbed) as one narrow per-row pass instead of
  * a collect_set shuffle + 64 interpreted array-filter sums.
  * PRECONDITION: input elements distinct (array_distinct upstream);
  * dim must be a power of two. */
case class FeatureHashVec(child: Expression, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(Integer.bitCount(dim) == 1, "dim must be a power of two")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_feature_hash_vec"

  override def nullSafeEval(input: Any): Any =
    HashVectorUtil.featureVec(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.HashVectorUtil.featureVec($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashVec =
    copy(child = newChild)
}

/** SimHash fingerprint of a DISTINCT hash array: bit j of the result
  * is set iff Σ over h of (bit j of h ? +1 : −1) > 0, for j in
  * [0, bits) — one narrow pass (TextAnalysis.simHash semantics)
  * instead of an explode + distinct + bits-way conditional-sum
  * aggregate (two shuffles). */
case class SimHashBits(child: Expression, bits: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits < 63, "bits must be in (0, 63)")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_bits"

  override def nullSafeEval(input: Any): Any =
    HashVectorUtil.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.HashVectorUtil.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object HashVectorUtil {
  def featureVec(hs: ArrayData, dim: Int): ArrayData = {
    val shift = Integer.numberOfTrailingZeros(dim)
    val mask = dim - 1
    val out = new Array[Long](dim)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      val sign = if (((h >> shift) & 1L) == 0L) 1L else -1L
      out((h & mask).toInt) += sign
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def simhash(hs: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

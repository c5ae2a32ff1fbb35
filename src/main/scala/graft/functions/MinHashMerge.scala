package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the Aggregator tier of the UDF framework — SURVEY
  * §2.2 "no UDAF framework" in the reference): merges per-row
  * minhash sketches by ELEMENTWISE MIN, which is exactly the minhash
  * of the UNION of the underlying shingle sets — so a group's merged
  * sketch estimates Jaccard against any other sketch without ever
  * touching the group's documents again. Commutative + associative,
  * so map-side partial aggregation applies and the result is
  * partition-order-independent (spec-checked under repartition).
  * Empty-input groups keep the empty array sentinel. */
object MinHashMerge extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def mergeArrays(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"minhash sketch length mismatch: ${a.length} vs ${b.length}")
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
      out
    }

  override def reduce(acc: Array[Long], row: Array[Long]): Array[Long] =
    mergeArrays(acc, if (row == null) Array.emptyLongArray else row)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = mergeArrays(a, b)

  override def finish(acc: Array[Long]): Array[Long] = acc

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

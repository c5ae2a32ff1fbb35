package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word bigrams of a text in one pass: tokenize on single
  * spaces (empty tokens dropped), join consecutive tokens with one
  * space, dedup keeping first-occurrence order — exactly
  * `array_distinct(transform(...))` over
  * `filter(split(text, ' '), _ <> '')` (TextAnalysis.bigramsCol's
  * built-ins form, which pays interpreted split/concat/dedup lambdas
  * per row).
  *
  * Byte-safe: the ASCII space byte never occurs inside a multi-byte
  * UTF-8 sequence, so span scanning over raw bytes is correct for
  * any input. */
case class WordBigrams(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_bigrams"

  override def nullSafeEval(input: Any): Any =
    WordBigramsUtil.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordBigramsUtil.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object WordBigramsUtil {
  def bigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token spans (start, end) over non-space runs
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && bytes(i) != ' ') i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < 2) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t < nTok - 1) {
      val aLen = ends.get(t) - starts.get(t)
      val bLen = ends.get(t + 1) - starts.get(t + 1)
      val out = new Array[Byte](aLen + 1 + bLen)
      System.arraycopy(bytes, starts.get(t), out, 0, aLen)
      out(aLen) = ' '
      System.arraycopy(bytes, starts.get(t + 1), out, aLen + 1, bLen)
      seen.add(UTF8String.fromBytes(out))
      t += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

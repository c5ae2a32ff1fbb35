package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-shingle WINDOW STRINGS of a text in one pass (reference
  * semantics, Shingling.java:32-42: stride 1, short trailing windows
  * padded with a single space) — the string twin of [[ShingleHashes]]
  * for consumers that need the shingle text itself (inverted index,
  * CountVectorizer path), replacing the interpreted
  * `transform(sequence(...), substr...)` chain. On the ASCII fast
  * path full-width windows SHARE the parent's byte array
  * (UTF8String.fromBytes with offset) — no per-window copy. */
case class ShingleWindows(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "k must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_windows"

  override def nullSafeEval(input: Any): Any =
    ShingleWindowsUtil.windows(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleWindowsUtil.windows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleWindows =
    copy(child = newChild)
}

object ShingleWindowsUtil {
  def windows(s: UTF8String, k: Int): ArrayData = {
    val nBytes = s.numBytes
    if (nBytes == s.numChars) { // ASCII: windows are byte slices
      val bytes = s.getBytes
      val out = new Array[AnyRef](nBytes)
      var i = 0
      while (i < nBytes) {
        if (i + k <= nBytes) {
          out(i) = UTF8String.fromBytes(bytes, i, k)
        } else {
          val w = nBytes - i
          val padded = new Array[Byte](w + 1)
          System.arraycopy(bytes, i, padded, 0, w)
          padded(w) = ' '
          out(i) = UTF8String.fromBytes(padded)
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val str = s.toString
      val n = s.numChars
      // code-point start offsets (UTF-16 indices) per window position
      val starts = new Array[Int](n + 1)
      var ci = 0
      var j = 0
      while (ci < str.length) {
        starts(j) = ci
        ci += Character.charCount(str.codePointAt(ci))
        j += 1
      }
      starts(n) = str.length
      val out = new Array[AnyRef](n)
      var i = 0
      while (i < n) {
        val endPos = math.min(i + k, n)
        val w = str.substring(starts(i), starts(endPos))
        out(i) = UTF8String.fromString(if (i + k > n) w + " " else w)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

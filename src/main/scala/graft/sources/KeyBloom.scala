package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-file KEY BLOOM FILTERS for the snapshot manifest — the
  * precision upgrade over min/max intervals that Delta ships as its
  * bloom-filter file index: an interval can only prove a key OUTSIDE
  * [min, max]; a point delete or a gap insert whose key falls inside
  * some file's span conservatively rewrites that file even when the
  * key isn't there. The bloom proves ABSENCE for in-span keys (no
  * false negatives over an immutable file's exact key set), so
  * [[Merge]] skips the rewrite; a false positive only costs a
  * redundant rewrite, never correctness.
  *
  * Built EXECUTOR-SIDE in one columnar pass (`groupBy(
  * input_file_name())` + this commutative bit-OR aggregate — map-side
  * partial combine, the driver sees one `Bits/8`-byte array per
  * file), at commit time, over only the files the commit just wrote.
  * Probes are derived from a splitmix64 avalanche of the key, k bit
  * positions per key — pure integer arithmetic, identical at build
  * and query time.
  *
  * Sizing: [[Bits]] = 4096 (512 bytes/file, ~700 base64 chars in the
  * manifest line) targets the harness' bin-packed file sizes at ~10
  * bits/row; a production table sizes bits by target rows-per-file
  * and moves the bitsets to a manifest sidecar once file counts make
  * inline lines heavy (the Delta layout). */
object KeyBloom {

  val Bits = 4096
  private val Words = Bits / 64
  private val Probes = 6

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def setBits(bits: Array[Long], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Query side: false means PROVABLY absent from the built key set. */
  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      if ((bits(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(Words * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bb.array())
  }

  /** The aggregate's byte output, encoded directly — byte-identical
    * to [[encode]] of the decoded words (big-endian both ways). */
  def encodeBytes(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  /** Empty string (no bloom recorded) decodes to None — the
    * conservative always-touched path. */
  def decode(s: String): Option[Array[Long]] =
    if (s == null || s.isEmpty) None
    else {
      val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getUrlDecoder.decode(s))
      Some(Array.fill(Words)(bb.getLong))
    }

  private object BloomAgg extends Aggregator[Long, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](Words)
    override def reduce(acc: Array[Long], key: Long): Array[Long] = {
      setBits(acc, key); acc
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < Words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(acc: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(Words * 8)
      acc.foreach(bb.putLong)
      bb.array()
    }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private lazy val bloomUdaf = udaf(BloomAgg, Encoders.scalaLong)

  def bloomAgg(key: Column): Column = bloomUdaf(key)

  /** One executor-side pass over a freshly-written data dir: the
    * base64 key bloom per absolute file uri. */
  def bloomsFor(df: DataFrame, keyCol: String): Map[String, String] =
    df.groupBy(input_file_name().as("file"))
      .agg(bloomAgg(col(keyCol).cast("long")).as("bloom"))
      .collect()
      .map { r =>
        val bytes = r.getAs[Array[Byte]]("bloom")
        val bb = java.nio.ByteBuffer.wrap(bytes)
        r.getAs[String]("file") ->
          encode(Array.fill(Words)(bb.getLong))
      }.toMap
}

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
  * Built EXECUTOR-SIDE (`groupBy(input_file_name())` + this
  * commutative bit-OR aggregate — map-side partial combine, the
  * driver sees one bitset per file) at commit time, over only the
  * files the commit just wrote; a preceding row-count pass (fused
  * with the commit's interval stats) picks the bitset size. Probes are
  * derived from a splitmix64 avalanche of the key, k bit positions
  * per key — pure integer arithmetic, identical at build and query
  * time.
  *
  * SIZING is ADAPTIVE (r9): the commit picks the bitset size from the
  * files' actual row counts ([[bitsFor]] — ~10 bits/key, floor 4096,
  * cap 2^17 ≈ 16 KB/file ≈ 13k keys at full precision), so a
  * 100-row fix-up file pays 512 bytes while a bin-packed 10k-row file
  * keeps its ~1% false-positive rate instead of degenerating to
  * all-positive (what any FIXED size does the moment rows-per-file
  * outgrows it). The size rides the encoding — [[decode]] infers it
  * from length, so files of different generations and sizes coexist
  * in one manifest. Beyond the cap a production table moves the
  * bitsets to a manifest sidecar (the Delta layout); the cap keeps
  * inline manifest lines bounded.
  */
object KeyBloom {

  /** Floor size: 4096 bits = 512 bytes/file (~700 base64 chars). */
  val MinBits = 4096

  /** Inline-manifest cap: 2^17 bits = 16 KB/file. */
  val MaxBits = 1 << 17

  private val Probes = 6

  /** ~10 bits per expected key, rounded to whole 64-bit words,
    * clamped to [[MinBits]]..[[MaxBits]]. */
  def bitsFor(expectedKeys: Long): Int = {
    val want = expectedKeys * 10L
    val clamped = math.min(MaxBits.toLong, math.max(MinBits.toLong, want))
    (((clamped + 63) / 64) * 64).toInt
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def setBits(bits: Array[Long], key: Long): Unit = {
    val nBits = bits.length * 64
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits).toInt
      bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Query side: false means PROVABLY absent from the built key set.
    * The modulus comes from the bitset itself, so probes agree with
    * whatever size the building commit chose. */
  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val nBits = bits.length * 64
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits).toInt
      if ((bits(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bb.array())
  }

  /** The aggregate's byte output, encoded directly — byte-identical
    * to [[encode]] of the decoded words (big-endian both ways). */
  def encodeBytes(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  /** Empty string (no bloom recorded) decodes to None — the
    * conservative always-touched path. Size inferred from length. */
  def decode(s: String): Option[Array[Long]] =
    if (s == null || s.isEmpty) None
    else {
      val bytes = java.util.Base64.getUrlDecoder.decode(s)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Some(Array.fill(bytes.length / 8)(bb.getLong))
    }

  private class BloomAgg(words: Int) extends Aggregator[Long, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(acc: Array[Long], key: Long): Array[Long] = {
      setBits(acc, key); acc
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(acc: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(words * 8)
      acc.foreach(bb.putLong)
      bb.array()
    }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The bit-OR bloom aggregate at a given size (whole words). All
    * groups of one aggregation share the size — the commit picks it
    * from the largest file it wrote ([[bitsFor]]); different commits
    * (and so different manifest lines) are free to differ. */
  def bloomAgg(key: Column, bits: Int = MinBits): Column = {
    require(bits % 64 == 0 && bits > 0, s"bloom bits must be whole words: $bits")
    udaf(new BloomAgg(bits / 64), Encoders.scalaLong)(key)
  }

  /** Per-file key blooms over a parquet frame (TWO jobs: a count
    * pass sizes the bitset, the bloom pass builds it), keyed by
    * absolute file uri. The spec-facing unit surface for the bloom
    * properties; the production commit path is
    * [[Merge.statsWithBlooms]], which gets the sizing counts from
    * the interval stats it needs anyway. */
  def bloomsFor(df: DataFrame, keyCol: String): Map[String, String] = {
    val counts = df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n")).collect()
    if (counts.isEmpty) return Map.empty
    val bits = bitsFor(counts.map(_.getAs[Long]("n")).max)
    df.filter(col(keyCol).isNotNull)
      .groupBy(input_file_name().as("file"))
      .agg(bloomAgg(col(keyCol).cast("long"), bits).as("bloom"))
      .collect()
      .map(r => r.getAs[String]("file") ->
        encodeBytes(r.getAs[Array[Byte]]("bloom")))
      .toMap
  }
}

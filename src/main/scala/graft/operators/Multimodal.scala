package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata, with a decode/feature-extraction stage.
  *
  * The container ships no image/audio codecs, so the DECODE step is
  * a clearly-marked deterministic stub (`StubDecoder`) — but the
  * Spark-side plumbing is real: binary columns, schema, partition-
  * preserving mapPartitions with batched per-partition decoder
  * setup (the same shape a real codec-backed extractor needs: open
  * the codec once per partition, stream records through it).
  * `mapPartitions` over a typed Dataset is the Scala analog of
  * PySpark's `mapInPandas` batch-UDF shape — same per-partition
  * batching, same schema contract, no Python worker round-trip;
  * a Python decode stage would plug into this exact pipeline
  * position with an identical output schema.
  *
  * At 100 TB: payloads stay in executor space end-to-end (no
  * collect), decode is a narrow transformation, and downstream
  * feature aggregation is a standard hash agg on the small feature
  * schema, not the payload.
  */
object Multimodal {

  /** Feature record produced by the decode stage. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, kind: String,
                           width: Int, height: Int, checksum: Long)

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * pure function of the payload bytes (first bytes → fake
    * dimensions; full fold → checksum). Replace with a real codec
    * binding in production. */
  object StubDecoder {
    val P = graft.Config.P
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      var acc = 0L
      var i = 0
      while (i < payload.length) {
        acc = (acc * 31 + (payload(i) & 0xffL)) % P
        i += 1
      }
      val w = if (payload.nonEmpty) 64 + (payload(0) & 0x3f) else 0
      val h = if (payload.length > 1) 64 + (payload(1) & 0x3f) else 0
      MediaFeatures(docId, payload.length.toLong, "image/stub", w, h, acc)
    }
  }

  /** documents -> (doc_id, payload: binary) — the multimodal column
    * shape (here synthesized from text since the testdata has no
    * real media blobs). */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Decode + feature-extract via mapPartitions: decoder state is
    * set up ONCE per partition (the shape a real codec binding
    * needs — open the codec, stream records through it); payloads
    * never leave the executor. */
  def extractFeatures(binTable: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        // per-partition setup: a real implementation opens/initializes
        // the codec here, once, and closes it when `rows` is drained
        val decoder = StubDecoder
        rows.map(row => decoder.decode(row.getLong(0), row.getAs[Array[Byte]](1)))
      }(enc)
  }

  case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
                   frame_bytes: Long, frame_hash: Long)

  /** One-to-many extraction (the frame-sampling / chunking shape for
    * video/audio payloads): split each payload into fixed-size
    * chunks, emit one typed feature row per chunk — flatMap inside
    * mapPartitions, decoder state per partition, payloads never on
    * the driver. */
  def frameSample(binTable: DataFrame, chunkSize: Int = 64): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        val P = graft.Config.P
        rows.flatMap { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          payload.grouped(chunkSize).zipWithIndex.map { case (chunk, i) =>
            var acc = 0L
            chunk.foreach(b => acc = (acc * 31 + (b & 0xffL)) % P)
            Frame(id, i, i.toLong * chunkSize, chunk.length.toLong, acc)
          }
        }
      }(enc)
  }

  case class Resized(doc_id: Long, in_bytes: Long, out_bytes: Long,
                     factor: Int, payload: Array[Byte])

  /** Binary→binary transform (the RESIZE shape: image downscale /
    * audio downsample): keep every factor-th byte as a stand-in for
    * real resampling — deterministic, size-contracting, payload in
    * and payload out so downstream stages (frameSample, re-encode,
    * partitioned sink) compose. A real codec swap changes only the
    * per-partition body, not the schema or the plan shape. */
  def resizeStub(binTable: DataFrame, factor: Int = 4): Dataset[Resized] = {
    require(factor >= 1, "factor must be >= 1")
    implicit val enc = Encoders.product[Resized]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val in = row.getAs[Array[Byte]](1)
          val out = Array.tabulate((in.length + factor - 1) / factor)(i => in(i * factor))
          Resized(id, in.length.toLong, out.length.toLong, factor, out)
        }
      }(enc)
  }

  /** Oracle-checkable metadata surface: byte/char counts + a header
    * hash (the portable fold over the first 16 chars — the moral
    * equivalent of a magic-bytes probe). */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      length(col("text")).cast("long").as("n_chars"),
      PortableHash.charFoldHash(substring(col("text"), 1, 16)).as("header_hash"))
}

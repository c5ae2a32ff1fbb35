package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata, with a decode/feature-extraction stage.
  *
  * The decode step is REAL for PNG/JPEG: the JDK's `ImageIO`
  * (java.desktop — no external dependency) decodes recognized image
  * payloads to true width/height/pixel-checksum features; payloads
  * no reader recognizes fall back to the clearly-marked
  * deterministic `StubDecoder` (the stand-in for codecs the JRE
  * doesn't ship, e.g. audio/video). Either way the Spark-side
  * plumbing is identical: binary columns, schema, partition-
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

  /** REAL image decoder over the same feature schema: ImageIO probes
    * the payload's magic bytes for a registered reader (PNG/JPEG/GIF/
    * BMP in any stock JRE); on a hit the features are the TRUE
    * decoded dimensions plus a deterministic fold over the decoded
    * pixels' low byte (gray channel for grayscale images) — on a
    * miss, None, and the caller falls back to the stub. */
  object ImageIoDecoder {
    val P = graft.Config.P
    def decode(docId: Long, payload: Array[Byte]): Option[MediaFeatures] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            reader.setInput(iis)
            val img = reader.read(0)
            val fmt = reader.getFormatName.toLowerCase
            reader.dispose()
            var acc = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                acc = (acc * 31 + (img.getRGB(x, y) & 0xffL)) % P
                x += 1
              }
              y += 1
            }
            Some(MediaFeatures(docId, payload.length.toLong, s"image/$fmt",
              img.getWidth, img.getHeight, acc))
          }
        } finally iis.close()
      } catch { case _: Exception => None }
  }

  /** documents -> (doc_id, payload: binary) — the multimodal column
    * shape (here synthesized from text since the testdata has no
    * real media blobs). */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  case class Encoded(doc_id: Long, payload: Array[Byte])

  /** documents -> REAL PNG payloads: each text rendered as a
    * deterministic 16-wide grayscale raster (pixel i = char i mod
    * 256, zero-padded to the last row) and encoded with the JDK PNG
    * writer. PNG is lossless, so whatever byte stream the encoder
    * emits, the DECODED pixels equal the source mapping — which is
    * what the decode features hash, keeping the round trip
    * oracle-replayable from the text alone. */
  def encodePng(docs: DataFrame, width: Int = 16): DataFrame = {
    implicit val enc = Encoders.product[Encoded]
    docs.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val text = row.getString(1)
          val h = math.max(1, (text.length + width - 1) / width)
          val img = new java.awt.image.BufferedImage(
            width, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < width * h) {
            val g = if (i < text.length) text.charAt(i) % 256 else 0
            img.setRGB(i % width, i / width, (g << 16) | (g << 8) | g)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Encoded(id, bos.toByteArray)
        }
      }(enc).toDF()
  }

  /** Decode + feature-extract via mapPartitions: decoder state is
    * set up ONCE per partition (the shape a real codec binding
    * needs — open the codec, stream records through it); payloads
    * never leave the executor. Recognized image payloads take the
    * REAL ImageIO path; anything else falls back to the stub. */
  def extractFeatures(binTable: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        // per-partition setup: a real implementation opens/initializes
        // the codec here, once, and closes it when `rows` is drained
        rows.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          ImageIoDecoder.decode(id, payload)
            .getOrElse(StubDecoder.decode(id, payload))
        }
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

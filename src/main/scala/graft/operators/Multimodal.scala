package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata, with a decode/feature-extraction stage.
  *
  * The decode step is REAL for every format the JRE ships a reader
  * for — PNG, JPEG, GIF, BMP, WBMP: the JDK's `ImageIO`
  * (java.desktop — no external dependency) decodes recognized image
  * payloads to true width/height/pixel-checksum features — and for
  * every AUDIO format `javax.sound.sampled` reads (WAV/AU/AIFF):
  * [[WavDecoder]] extracts true sample-rate/frame-count/PCM-checksum
  * features. VIDEO decodes for real in BOTH stages: container
  * metadata via a REAL ISO-BMFF/MP4 structural parse ([[Mp4Parser]]
  * — box walking, mvhd/tkhd/stsd/stsz/mdat, both 32- and 64-bit
  * framings), and SAMPLE decode via uncompressed-DIB AVI
  * ([[AviParser]] — RIFF walk + raw BI_RGB frame decode) AND via
  * MJPEG-in-AVI, a genuinely COMPRESSED codec whose frames are
  * self-contained JPEGs the JDK fully decodes ([[mjpegRoundTrip]] —
  * entropy decode + IDCT per frame, within-tolerance gate since the
  * codec is lossy); only INTER-FRAME codecs (H.264 etc., whose
  * bitstreams no stock-JRE component parses) remain out of reach.
  * Payloads no reader recognizes fall back to the
  * clearly-marked deterministic `StubDecoder`. Either way the Spark-side
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

  /** Container-nesting bound shared by the MP4 box walk and the AVI
    * RIFF walk. Real files nest well under 10 levels; a crafted
    * payload that is nothing but nested container headers would
    * otherwise drive the recursive walks payload/8 frames deep —
    * StackOverflowError, an Error the parsers' Exception handlers do
    * NOT catch, killing the task instead of yielding the marked stub
    * row. Past this depth the input is flagged malformed. */
  val MaxBoxDepth: Int = 64

  /** ImageIO's default stream cache is FILE-backed: every
    * createImageInputStream/createImageOutputStream call makes (and
    * deletes) a temp file. Every payload in this engine is an
    * in-memory byte array, so the disk round trip is pure overhead —
    * at ~10 frames/doc it is one temp file per frame per rep across
    * 32 concurrent partitions, measured as multi-second cross-rep
    * noise on the media queries. Memory-cached streams only
    * (JVM-global, idempotent; referenced from every codec setup). */
  private[operators] lazy val imageIoMemOnly: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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

    private def features(docId: Long, payload: Array[Byte],
                         img: java.awt.image.BufferedImage,
                         fmt: String): MediaFeatures = {
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
      MediaFeatures(docId, payload.length.toLong, s"image/$fmt",
        img.getWidth, img.getHeight, acc)
    }

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
            Some(features(docId, payload, img, fmt))
          }
        } finally iis.close()
      } catch { case _: Exception => None }

    /** Per-partition decode session: the ImageIO REGISTRY PROBE per
      * row (every provider's canDecodeInput against the stream) was
      * the dominant per-record cost of the lossless round-trip
      * queries, not the pixel work. The session sniffs the formats
      * with reliable magic bytes (PNG/JPEG/GIF/BMP) and dispatches
      * straight to a cached reader instance; anything else — WBMP
      * has no usable signature — falls back to the probing path.
      * Same features, same fallback semantics (a corrupt payload
      * returns None either way); one session per partition, the
      * encodeImage per-partition-setup discipline. */
    final class Session {
      private val cache =
        scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
      private def cached(fmt: String): Option[javax.imageio.ImageReader] =
        cache.get(fmt).orElse {
          val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
          if (!it.hasNext) None
          else { val r = it.next(); cache(fmt) = r; Some(r) }
        }
      private def sniff(b: Array[Byte]): Option[String] =
        if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
            b(2) == 'N' && b(3) == 'G') Some("png")
        else if (b.length >= 3 && (b(0) & 0xff) == 0xFF &&
            (b(1) & 0xff) == 0xD8 && (b(2) & 0xff) == 0xFF) Some("jpeg")
        else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' &&
            b(2) == 'F' && b(3) == '8') Some("gif")
        else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
        else None
      def decode(docId: Long, payload: Array[Byte]): Option[MediaFeatures] =
        sniff(payload).flatMap(cached) match {
          case Some(reader) =>
            try {
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(payload))
              try {
                reader.setInput(iis)
                val img = reader.read(0)
                Some(features(docId, payload, img,
                  reader.getFormatName.toLowerCase))
              } finally iis.close()
            } catch { case _: Exception => None }
          case None => ImageIoDecoder.decode(docId, payload)
        }
    }
  }

  /** documents -> (doc_id, payload: binary) — the multimodal column
    * shape (here synthesized from text since the testdata has no
    * real media blobs). */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  case class Encoded(doc_id: Long, payload: Array[Byte])

  /** documents -> REAL image payloads in `format`: each text rendered
    * as a deterministic 16-wide raster and encoded with the JDK's
    * writer for that format. Every stock-JRE writer is covered —
    * png/bmp/gif/wbmp — each through a representation that makes the
    * round trip LOSSLESS so the decoded pixels re-derive from the
    * text alone (oracle-replayable) whatever byte stream the encoder
    * emits:
    *   - png/bmp: 24-bit RGB raster, pixel i = gray (c,c,c) with
    *     c = char i mod 256 — both formats store RGB verbatim and
    *     `getRGB` reads it back without color-space conversion;
    *   - gif: 8-bit INDEXED raster over an explicit 256-entry gray
    *     palette (palette index = c) — GIF stores palette + indices
    *     exactly; going through TYPE_BYTE_GRAY instead would gamma-
    *     convert in getRGB and break bit-exactness;
    *   - wbmp: 1-bit raster (the codec is binary by spec), bit =
    *     char i mod 2, decoding to 0 or 255 per pixel.
    * Zero-padding to the last row in all formats. */
  def encodeImage(docs: DataFrame, format: String, width: Int = 16): DataFrame = {
    require(Set("png", "bmp", "gif", "wbmp")(format),
      s"no lossless stock-JRE fixture path for format '$format'")
    implicit val enc = Encoders.product[Encoded]
    docs.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { rows =>
        imageIoMemOnly
        import java.awt.image.{BufferedImage, IndexColorModel}
        // per-partition setup: palette AND writer — a partition is
        // consumed by one thread, so one writer instance serves every
        // record (the service-registry lookup per row was measurable)
        val grayLut = Array.tabulate(256)(_.toByte)
        val grayPalette = new IndexColorModel(8, 256, grayLut, grayLut, grayLut)
        val writers = javax.imageio.ImageIO.getImageWritersByFormatName(format)
        require(writers.hasNext, s"JRE has no ImageIO writer for '$format'")
        val writer = writers.next()
        val param = writer.getDefaultWriteParam
        // interlace OFF: the JDK GIF writer's default progressive mode
        // garbles rows for heights 2-4 (rows land interlace-shifted on
        // decode — measured width*(height-1) wrong pixels);
        // MODE_DISABLED round-trips bit-exactly at every size
        if (param.canWriteProgressive)
          param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        rows.map { row =>
          val id = row.getLong(0)
          val text = row.getString(1)
          val h = math.max(1, (text.length + width - 1) / width)
          val img = format match {
            case "gif" =>
              new BufferedImage(width, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            case "wbmp" =>
              new BufferedImage(width, h, BufferedImage.TYPE_BYTE_BINARY)
            case _ =>
              new BufferedImage(width, h, BufferedImage.TYPE_INT_RGB)
          }
          val raster = img.getRaster
          var i = 0
          while (i < width * h) {
            val c = if (i < text.length) text.charAt(i) % 256 else 0
            format match {
              case "gif"  => raster.setSample(i % width, i / width, 0, c)
              case "wbmp" => raster.setSample(i % width, i / width, 0, c % 2)
              case _      => img.setRGB(i % width, i / width, (c << 16) | (c << 8) | c)
            }
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
          } finally ios.close()
          Encoded(id, bos.toByteArray)
        }
      }(enc).toDF()
  }

  /** documents -> REAL PNG payloads (the original fixture format —
    * see [[encodeImage]]). */
  def encodePng(docs: DataFrame, width: Int = 16): DataFrame =
    encodeImage(docs, "png", width)

  /** Decode + feature-extract via mapPartitions: decoder state is
    * set up ONCE per partition (the shape a real codec binding
    * needs — open the codec, stream records through it); payloads
    * never leave the executor. Recognized image payloads take the
    * REAL ImageIO path; anything else falls back to the stub. */
  def extractFeatures(binTable: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        imageIoMemOnly
        // per-partition setup: cached reader instances with magic-byte
        // dispatch (registry probe only for signature-less formats)
        val session = new ImageIoDecoder.Session
        rows.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          session.decode(id, payload)
            .getOrElse(StubDecoder.decode(id, payload))
        }
      }(enc)
  }

  /** Feature record produced by the AUDIO decode stage: true decoded
    * format parameters + a fold over the decoded PCM bytes. */
  case class AudioFeatures(doc_id: Long, n_bytes: Long, kind: String,
                           sample_rate: Int, n_frames: Long, checksum: Long)

  /** REAL audio decoder on the stock JRE: `javax.sound.sampled` reads
    * WAV (and AU/AIFF) without any external codec. Features are the
    * TRUE decoded sample rate and frame count plus a deterministic
    * fold over the raw PCM bytes — the audio analog of
    * [[ImageIoDecoder]] (video's real path is [[AviParser]]). */
  object WavDecoder {
    val P = graft.Config.P
    def decode(docId: Long, payload: Array[Byte]): Option[AudioFeatures] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val frames = ais.getFrameLength
          var acc = 0L
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) { acc = (acc * 31 + (buf(i) & 0xffL)) % P; i += 1 }
            n = ais.read(buf)
          }
          Some(AudioFeatures(docId, payload.length.toLong,
            s"audio/${f.getEncoding.toString.toLowerCase}",
            f.getSampleRate.toInt, frames, acc))
        } finally ais.close()
      } catch { case _: Exception => None }
  }

  /** documents -> REAL WAV payloads: each text rendered as 16-bit
    * signed little-endian mono PCM at `sampleRate`, sample i = char i
    * mod 256 (low byte = the char, high byte = 0) — lossless by
    * construction, so the decoded PCM re-derives from the text alone
    * and the round trip is oracle-replayable (the [[encodeImage]]
    * fixture discipline, audio edition). Empty text encodes as a
    * header-only zero-frame WAV. */
  def encodeWav(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    implicit val enc = Encoders.product[Encoded]
    docs.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { rows =>
        import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
        // one format object per partition; the writer is stateless
        val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
        rows.map { row =>
          val id = row.getLong(0)
          val text = row.getString(1)
          val pcm = new Array[Byte](2 * text.length)
          var i = 0
          while (i < text.length) {
            pcm(2 * i) = (text.charAt(i) % 256).toByte // little-endian low byte
            i += 1
          }
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, text.length.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          finally ais.close()
          Encoded(id, bos.toByteArray)
        }
      }(enc).toDF()
  }

  /** Audio decode + feature-extract, the [[extractFeatures]] shape:
    * per-partition decoder setup, payloads stay on the executors.
    * Payloads no audio reader recognizes fall back to a clearly-
    * marked deterministic stub row (kind 'audio/stub'), keeping the
    * stage total. */
  def extractAudioFeatures(binTable: DataFrame): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          WavDecoder.decode(id, payload).getOrElse {
            val s = StubDecoder.decode(id, payload)
            AudioFeatures(id, payload.length.toLong, "audio/stub", 0,
              payload.length.toLong, s.checksum)
          }
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

  /** Container-level metadata parsed from an MP4 (ISO-BMFF) payload.
    * Every field is a real read of the container's bytes: the brand
    * from `ftyp`, movie timescale/duration from `mvhd` (both version
    * 0 and version 1 layouts), track count and display dimensions
    * from `tkhd`, the codec fourcc from the first `stsd` sample
    * entry, the sample count from `stsz`, and the media-data byte
    * count + fold checksum from `mdat` (32-bit size and 64-bit
    * largesize framings both handled). */
  case class VideoMeta(doc_id: Long, brand: String, mvhd_version: Int,
                       timescale: Long, duration: Long, n_tracks: Int,
                       width: Int, height: Int, codec: String,
                       n_samples: Long, mdat_bytes: Long, checksum: Long)

  /** Deterministic MP4 fixture writer: each text becomes a spec-valid
    * minimal ISO-BMFF file — `ftyp` (isom), a `free` padding box (so
    * the parser's unknown-box skip path is always exercised), `mdat`
    * carrying the text bytes as n one-byte video samples, then `moov`
    * with the full required box chain (mvhd, trak/tkhd,
    * mdia/mdhd/hdlr(vide)/minf/vmhd/dinf/dref/stbl/stsd(mp4v)/stts/
    * stsc/stsz/stco). All metadata derives from the text alone —
    * duration = 40 ticks/sample at timescale 1000 (25 fps), display
    * raster 16 × ceil(n/16) (the [[encodeImage]] raster metaphor) —
    * so the parse output is oracle-replayable from `documents.text`.
    * Odd doc_ids write the 64-bit variants (version-1 mvhd, largesize
    * mdat) so both framings are covered on every corpus. */
  object Mp4Writer {
    val Timescale = 1000L
    val SampleDelta = 40L
    val Width = 16

    private def u16(o: java.io.DataOutputStream, v: Int): Unit = o.writeShort(v)
    private def u32(o: java.io.DataOutputStream, v: Long): Unit = o.writeInt(v.toInt)
    private def u64(o: java.io.DataOutputStream, v: Long): Unit = o.writeLong(v)

    private def box(fourcc: String)(body: java.io.DataOutputStream => Unit): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      body(o); o.flush()
      val payload = bos.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      val oo = new java.io.DataOutputStream(out)
      u32(oo, 8L + payload.length); oo.writeBytes(fourcc); oo.write(payload); oo.flush()
      out.toByteArray
    }

    private def fullBox(fourcc: String, version: Int, flags: Int)(
        body: java.io.DataOutputStream => Unit): Array[Byte] =
      box(fourcc) { o => o.writeByte(version); o.writeByte(flags >> 16)
        o.writeByte(flags >> 8); o.writeByte(flags); body(o) }

    private val UnityMatrix: java.io.DataOutputStream => Unit = { o =>
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(u32(o, _))
    }

    def encode(docId: Long, text: String): Array[Byte] = {
      val n = text.length
      val h = math.max(1, (n + Width - 1) / Width)
      val duration = SampleDelta * n
      val v1 = docId % 2 != 0 // 64-bit layout variant

      val ftyp = box("ftyp") { o =>
        o.writeBytes("isom"); u32(o, 0L); o.writeBytes("isom"); o.writeBytes("mp41") }
      val free = box("free")(o => u32(o, 0L))

      // mdat BEFORE moov (the common non-faststart layout): the stco
      // chunk offset is then known before moov is sized
      val mdatHeader = if (v1) 16 else 8
      val mdat = {
        val out = new java.io.ByteArrayOutputStream()
        val o = new java.io.DataOutputStream(out)
        if (v1) { u32(o, 1L); o.writeBytes("mdat"); u64(o, mdatHeader.toLong + n) }
        else { u32(o, mdatHeader.toLong + n); o.writeBytes("mdat") }
        var i = 0
        while (i < n) { o.writeByte(text.charAt(i) % 256); i += 1 }
        o.flush(); out.toByteArray
      }
      val chunkOffset = ftyp.length.toLong + free.length + mdatHeader

      val mvhd = fullBox("mvhd", if (v1) 1 else 0, 0) { o =>
        if (v1) { u64(o, 0L); u64(o, 0L); u32(o, Timescale); u64(o, duration) }
        else { u32(o, 0L); u32(o, 0L); u32(o, Timescale); u32(o, duration) }
        u32(o, 0x00010000L); u16(o, 0x0100); u16(o, 0); u64(o, 0L)
        UnityMatrix(o); (0 until 6).foreach(_ => u32(o, 0L)); u32(o, 2L)
      }
      val tkhd = fullBox("tkhd", 0, 7) { o =>
        u32(o, 0L); u32(o, 0L); u32(o, 1L); u32(o, 0L); u32(o, duration)
        u64(o, 0L); u16(o, 0); u16(o, 0); u16(o, 0); u16(o, 0)
        UnityMatrix(o); u32(o, Width.toLong << 16); u32(o, h.toLong << 16)
      }
      val mdhd = fullBox("mdhd", 0, 0) { o =>
        u32(o, 0L); u32(o, 0L); u32(o, Timescale); u32(o, duration)
        u16(o, 0x55c4); u16(o, 0) // language 'und'
      }
      val hdlr = fullBox("hdlr", 0, 0) { o =>
        u32(o, 0L); o.writeBytes("vide"); (0 until 3).foreach(_ => u32(o, 0L))
        o.writeBytes("graft video"); o.writeByte(0)
      }
      val vmhd = fullBox("vmhd", 0, 1) { o => u16(o, 0); u16(o, 0); u16(o, 0); u16(o, 0) }
      val dref = fullBox("dref", 0, 0) { o =>
        u32(o, 1L)
        o.write(fullBox("url ", 0, 1)(_ => ())) // self-contained
      }
      val dinf = box("dinf")(o => o.write(dref))
      val stsd = fullBox("stsd", 0, 0) { o =>
        u32(o, 1L)
        o.write(box("mp4v") { e =>
          (0 until 6).foreach(_ => e.writeByte(0)); u16(e, 1) // data_ref_index
          u16(e, 0); u16(e, 0); (0 until 3).foreach(_ => u32(e, 0L))
          u16(e, Width); u16(e, h)
          u32(e, 0x00480000L); u32(e, 0x00480000L); u32(e, 0L); u16(e, 1)
          val name = "graft"
          e.writeByte(name.length); e.writeBytes(name)
          (0 until 31 - name.length).foreach(_ => e.writeByte(0))
          u16(e, 24); u16(e, 0xffff)
        })
      }
      val stts = fullBox("stts", 0, 0) { o =>
        if (n == 0) u32(o, 0L) else { u32(o, 1L); u32(o, n.toLong); u32(o, SampleDelta) } }
      val stsc = fullBox("stsc", 0, 0) { o =>
        if (n == 0) u32(o, 0L) else { u32(o, 1L); u32(o, 1L); u32(o, n.toLong); u32(o, 1L) } }
      val stsz = fullBox("stsz", 0, 0) { o => u32(o, 1L); u32(o, n.toLong) }
      val stco = fullBox("stco", 0, 0) { o =>
        if (n == 0) u32(o, 0L) else { u32(o, 1L); u32(o, chunkOffset) } }
      val stbl = box("stbl") { o =>
        o.write(stsd); o.write(stts); o.write(stsc); o.write(stsz); o.write(stco) }
      val minf = box("minf") { o => o.write(vmhd); o.write(dinf); o.write(stbl) }
      val mdia = box("mdia") { o => o.write(mdhd); o.write(hdlr); o.write(minf) }
      val trak = box("trak") { o => o.write(tkhd); o.write(mdia) }
      val moov = box("moov") { o => o.write(mvhd); o.write(trak) }

      val out = new java.io.ByteArrayOutputStream()
      out.write(ftyp); out.write(free); out.write(mdat); out.write(moov)
      out.toByteArray
    }
  }

  /** REAL ISO-BMFF structural parser on the stock JRE (pure byte
    * walking, no codec): generic length-prefixed box iteration with
    * recursion into container boxes (`moov`/`trak`/`mdia`/`minf`/
    * `stbl`/`dinf`/`edts`/`udta`), unknown boxes skipped by size,
    * 32-bit and largesize (size==1 → 64-bit) framings, size==0 →
    * to-end-of-enclosure. Extracts [[VideoMeta]]; any structural
    * violation (truncated box, size under the header length, missing
    * required boxes) → None and the caller falls back to a marked
    * stub row. Sample decode for the ISO-BMFF path would need a real
    * codec; the uncompressed-AVI path ([[AviParser]]) decodes
    * samples for real. */
  object Mp4Parser {
    val P = graft.Config.P
    private val Containers =
      Set("moov", "trak", "mdia", "minf", "stbl", "dinf", "edts", "udta")

    private final class State {
      var brand: String = null
      var mvhdVersion: Int = -1
      var timescale: Long = -1
      var duration: Long = -1
      var nTracks: Int = 0
      var width: Int = -1
      var height: Int = -1
      var codec: String = null
      var nSamples: Long = -1
      var mdatBytes: Long = -1
      var checksum: Long = 0
      var malformed: Boolean = false
    }

    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u64(b: Array[Byte], i: Int): Long =
      (u32(b, i) << 32) | u32(b, i + 4)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def walk(b: Array[Byte], from: Long, to: Long, st: State,
                     depth: Int): Unit = {
      // Recursion bound: real files nest a handful of levels; a
      // crafted payload of nothing but nested container headers would
      // otherwise recurse payload/8 deep and StackOverflowError PAST
      // the Exception handler in parse (it's an Error). Malformed,
      // deterministically, instead.
      if (depth > MaxBoxDepth) { st.malformed = true; return }
      var pos = from
      while (pos < to && !st.malformed) {
        if (pos + 8 > to) { st.malformed = true; return }
        val size32 = u32(b, pos.toInt)
        val name = fourcc(b, pos.toInt + 4)
        var header = 8L
        val size: Long =
          if (size32 == 1L) {
            if (pos + 16 > to) { st.malformed = true; return }
            header = 16L; u64(b, pos.toInt + 8)
          } else if (size32 == 0L) to - pos
          else size32
        if (size < header || pos + size > to) { st.malformed = true; return }
        val body = pos + header
        val bodyLen = (size - header).toInt
        name match {
          case "ftyp" =>
            if (bodyLen < 4) { st.malformed = true; return }
            st.brand = fourcc(b, body.toInt)
          case "mvhd" =>
            // v1 reads through body+31, v0 through body+19 — a shorter
            // box must flag malformed, not read the neighbor's bytes
            if (bodyLen < 20) { st.malformed = true; return }
            val v = b(body.toInt) & 0xff
            if (v == 1 && bodyLen < 32) { st.malformed = true; return }
            st.mvhdVersion = v
            if (v == 1) { st.timescale = u32(b, body.toInt + 20); st.duration = u64(b, body.toInt + 24) }
            else { st.timescale = u32(b, body.toInt + 12); st.duration = u32(b, body.toInt + 16) }
          case "tkhd" if st.width < 0 =>
            if (bodyLen < 84) { st.malformed = true; return }
            val v = b(body.toInt) & 0xff
            val dimOff = if (v == 1) 88 else 76
            if (bodyLen < dimOff + 8) { st.malformed = true; return }
            st.width = (u32(b, body.toInt + dimOff) >> 16).toInt
            st.height = (u32(b, body.toInt + dimOff + 4) >> 16).toInt
          case "stsd" if st.codec == null =>
            if (bodyLen >= 16 && u32(b, body.toInt + 4) >= 1)
              st.codec = fourcc(b, body.toInt + 12)
          case "stsz" if st.nSamples < 0 =>
            if (bodyLen < 12) { st.malformed = true; return }
            st.nSamples = u32(b, body.toInt + 8)
          case "mdat" =>
            st.mdatBytes = size - header
            var acc = 0L
            var i = body.toInt
            val end = (pos + size).toInt
            while (i < end) { acc = (acc * 31 + (b(i) & 0xffL)) % P; i += 1 }
            st.checksum = acc
          case "trak" =>
            st.nTracks += 1; walk(b, body, pos + size, st, depth + 1)
          case c if Containers(c) =>
            walk(b, body, pos + size, st, depth + 1)
          case _ => // unknown box: skip by size
        }
        pos += size
      }
    }

    def parse(docId: Long, payload: Array[Byte]): Option[VideoMeta] = {
      val st = new State
      try walk(payload, 0L, payload.length.toLong, st, 0)
      catch { case _: Exception => return None }
      if (st.malformed || st.brand == null || st.mvhdVersion < 0 ||
          st.nTracks == 0 || st.codec == null || st.mdatBytes < 0) None
      else Some(VideoMeta(docId, st.brand, st.mvhdVersion, st.timescale,
        st.duration, st.nTracks, st.width, st.height, st.codec,
        st.nSamples, st.mdatBytes, st.checksum))
    }
  }

  /** documents -> REAL MP4 payloads (see [[Mp4Writer]]). */
  def encodeMp4(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[Encoded]
    docs.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { rows =>
        rows.map(row => Encoded(row.getLong(0), Mp4Writer.encode(row.getLong(0), row.getString(1))))
      }(enc).toDF()
  }

  /** MP4 container parse + metadata-extract, the [[extractFeatures]]
    * shape: narrow mapPartitions, payloads stay on the executors.
    * Unparseable payloads become a marked `raw`/`none` stub row with
    * the [[StubDecoder]] checksum, keeping the stage total. */
  def extractVideoMeta(binTable: DataFrame): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          Mp4Parser.parse(id, payload).getOrElse {
            val s = StubDecoder.decode(id, payload)
            VideoMeta(id, "raw", -1, 0, 0, 0, 0, 0, "none", 0,
              payload.length.toLong, s.checksum)
          }
        }
      }(enc)
  }

  /** One decoded video FRAME: true stream dimensions plus a fold
    * over the decoded pixel values in top-down row-major order —
    * every field a real read/decode of the container's bytes. */
  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
                        height: Int, checksum: Long)

  /** Deterministic AVI fixture writer: each text becomes a spec-valid
    * RIFF/AVI file carrying UNCOMPRESSED 24-bit DIB video frames —
    * the one video sample format a stock JRE can decode for real
    * (no codec: BI_RGB frames are raw bottom-up BGR rasters with
    * 4-byte-aligned row strides, per the Windows DIB spec the AVI
    * container inherits). Frame f covers text chars
    * [f·frameChars, (f+1)·frameChars), rendered as a width-wide gray
    * raster (pixel = char mod 256, zero-padded), so the DECODED
    * pixels re-derive from the text alone — the [[encodeImage]] /
    * [[encodeWav]] lossless-fixture discipline, now for video
    * samples. Structure: RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh 'vids'/'DIB ', strf BITMAPINFOHEADER}} →
    * LIST(movi){'00db'×n} → idx1. All fields little-endian (RIFF),
    * the endianness twin of the big-endian ISO-BMFF path above.
    * RIFF's word-alignment rule (odd-size chunks take a pad byte) is
    * exercised whenever width·3 is odd×height — covered in specs via
    * non-default widths. */
  object AviWriter {
    val Width = 16
    val FrameChars = 64 // 16 × 4 raster per frame
    val UsecPerFrame = 40000L // 25 fps

    private def u16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    private def u32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    private def chunk(fourcc: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); body(b)
      val payload = b.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(fourcc.getBytes("US-ASCII")); u32(out, payload.length.toLong)
      out.write(payload)
      if (payload.length % 2 == 1) out.write(0) // RIFF word alignment
      out.toByteArray
    }
    private def list(listType: String)(parts: Array[Byte]*): Array[Byte] =
      chunk("LIST") { o => o.write(listType.getBytes("US-ASCII")); parts.foreach(o.write) }

    private[operators] def stride(width: Int): Int = ((width * 3 + 3) / 4) * 4

    /** One DIB frame: bottom-up rows, BGR, stride-padded. */
    private def dibFrame(text: String, from: Int, width: Int, height: Int): Array[Byte] = {
      val rowBytes = stride(width)
      val buf = new Array[Byte](rowBytes * height)
      var y = 0
      while (y < height) {
        val rowBase = (height - 1 - y) * rowBytes // bottom-up storage
        var x = 0
        while (x < width) {
          val i = from + y * width + x
          val c: Byte = if (i < text.length) (text.charAt(i) % 256).toByte else 0
          buf(rowBase + 3 * x) = c     // B
          buf(rowBase + 3 * x + 1) = c // G
          buf(rowBase + 3 * x + 2) = c // R
          x += 1
        }
        y += 1
      }
      buf
    }

    /** Assemble a spec-valid RIFF/AVI container around pre-encoded
      * frame payloads — shared by the uncompressed-DIB and MJPEG
      * muxes. avih/strh buffer sizing uses the LARGEST frame
      * (compressed frames vary per frame; for DIB all are equal, so
      * the bytes are identical to the pre-r8 single-codec writer);
      * idx1 records each frame's TRUE offset and size, offsets
      * relative to the start of the movi list's type field (the
      * convention every AVI muxer uses). */
    private def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
                    handler: String, biCompression: Long,
                    chunkId: String): Array[Byte] = {
      val nFrames = frames.size
      val maxBytes = frames.map(_.length).max.toLong
      val avih = chunk("avih") { o =>
        u32(o, UsecPerFrame); u32(o, maxBytes * 25L) // maxBytesPerSec
        u32(o, 0L); u32(o, 0x10L) // padding, flags (AVIF_HASINDEX)
        u32(o, nFrames.toLong); u32(o, 0L); u32(o, 1L) // totalFrames, initial, streams
        u32(o, maxBytes); u32(o, width.toLong); u32(o, height.toLong)
        (0 until 4).foreach(_ => u32(o, 0L)) // reserved
      }
      val strh = chunk("strh") { o =>
        o.write("vids".getBytes("US-ASCII")); o.write(handler.getBytes("US-ASCII"))
        u32(o, 0L); u16(o, 0); u16(o, 0); u32(o, 0L) // flags, prio, lang, initial
        u32(o, 1L); u32(o, 25L) // scale, rate → 25 fps
        u32(o, 0L); u32(o, nFrames.toLong) // start, length (in frames)
        u32(o, maxBytes); u32(o, 0xffffffffL); u32(o, 0L) // bufSize, quality, sampleSize
        u16(o, 0); u16(o, 0); u16(o, width); u16(o, height) // rcFrame
      }
      val strf = chunk("strf") { o => // BITMAPINFOHEADER
        u32(o, 40L); u32(o, width.toLong); u32(o, height.toLong)
        u16(o, 1); u16(o, 24) // planes, bitCount
        u32(o, biCompression) // 0 = BI_RGB; 'MJPG' fourcc = motion JPEG
        u32(o, maxBytes); u32(o, 0L); u32(o, 0L); u32(o, 0L); u32(o, 0L)
      }
      val hdrl = list("hdrl")(avih, list("strl")(strh, strf))
      val movi = list("movi")(frames.map(f => chunk(chunkId)(_.write(f))): _*)
      val idx1 = chunk("idx1") { o =>
        var off = 4L
        frames.foreach { f =>
          o.write(chunkId.getBytes("US-ASCII")); u32(o, 0x10L) // AVIIF_KEYFRAME
          u32(o, off); u32(o, f.length.toLong)
          off += 8L + f.length + (f.length % 2)
        }
      }
      val riffBody = {
        val o = new java.io.ByteArrayOutputStream()
        o.write("AVI ".getBytes("US-ASCII")); o.write(hdrl); o.write(movi); o.write(idx1)
        o.toByteArray
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII")); u32(out, riffBody.length.toLong)
      out.write(riffBody)
      out.toByteArray
    }

    def encode(docId: Long, text: String, width: Int = Width,
               frameChars: Int = FrameChars): Array[Byte] = {
      require(frameChars % width == 0, "frameChars must fill whole rows")
      val height = frameChars / width
      val nFrames = math.max(1, (text.length + frameChars - 1) / frameChars)
      mux((0 until nFrames).map(f => dibFrame(text, f * frameChars, width, height)),
        width, height, "DIB ", 0L, "00db")
    }

    /** 'MJPG' little-endian fourcc, the biCompression value every
      * motion-JPEG AVI carries. */
    val MjpgFourcc: Long = 0x47504A4DL

    /** MJPEG-in-AVI: each frame is a real JPEG — the grayscale
      * text raster compressed through the JDK's ImageIO JPEG writer
      * at quality 1.0 — carried in '00dc' (compressed) movi chunks
      * under an strh 'MJPG' handler and strf biCompression 'MJPG'.
      * This is the one COMPRESSED video codec a stock JRE both
      * encodes and decodes (MJPEG frames are self-contained JPEGs —
      * no inter-frame state), which is what retires the compressed-
      * video stub: the decode side runs a true entropy-decode + IDCT
      * per frame, not a byte copy. Grayscale (single-band) rasters
      * keep the codec path free of chroma subsampling, bounding the
      * quality-1.0 round-trip error to ±[[Multimodal.MjpegTol]] per
      * pixel (measured max 1). */
    def encodeMjpeg(text: String, width: Int = Width,
                    frameChars: Int = FrameChars): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      try encodeMjpegWith(writer, text, width, frameChars)
      finally writer.dispose()
    }

    /** Same, with a caller-owned writer — the per-partition-setup
      * form [[Multimodal.mjpegRoundTrip]] uses (one writer serves
      * every record of a partition, the [[Multimodal.encodeImage]]
      * discipline: the registry lookup per row was measurable). */
    def encodeMjpegWith(writer: javax.imageio.ImageWriter, text: String,
                        width: Int = Width,
                        frameChars: Int = FrameChars): Array[Byte] = {
      require(frameChars % width == 0, "frameChars must fill whole rows")
      val height = frameChars / width
      val nFrames = math.max(1, (text.length + frameChars - 1) / frameChars)
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(1.0f)
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var i = 0
        while (i < frameChars) {
          val gi = f * frameChars + i
          val c = if (gi < text.length) text.charAt(gi) % 256 else 0
          img.getRaster.setSample(i % width, i / width, 0, c)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
        } finally ios.close()
        bos.toByteArray
      }
      mux(frames, width, height, "MJPG", MjpgFourcc, "00dc")
    }
  }

  /** REAL video frame decoder on the stock JRE: walks the RIFF tree
    * (little-endian sizes, word-aligned chunks — the endianness and
    * alignment twin of [[Mp4Parser]]), validates the video stream
    * headers (avih, strh 'vids' with an uncompressed-DIB handler,
    * strf BITMAPINFOHEADER at 24-bit BI_RGB), then DECODES each
    * '00db'/'00dc' movi chunk as a raw DIB: bottom-up rows
    * re-ordered top-down, stride padding dropped, BGR samples
    * averaged to gray — a true sample decode, no codec required
    * because BI_RGB is the uncompressed video format. Cross-checks
    * the idx1 entry count against the frames actually decoded. Any
    * structural violation → None, caller falls back to a marked stub
    * row. Closes the last stubbed modality: image, audio, video
    * container AND video samples now all decode for real. */
  object AviParser {
    val P = graft.Config.P

    private def u16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private final class Stream {
      var width: Int = -1; var height: Int = -1
      var nFrames: Long = -1; var idxEntries: Long = -1
      var vids: Boolean = false; var bgr24: Boolean = false
      // MJPEG stream: strh handler 'MJPG' seen / strf confirms 'MJPG'
      var mjpgHandler: Boolean = false; var mjpeg: Boolean = false
      // per-container JPEG reader, set by decodeMjpeg for frame reuse
      var jpegReader: javax.imageio.ImageReader = null
      val frames = scala.collection.mutable.ArrayBuffer.empty[Long]
      // mjpeg frames carry decoded gray pixels (the lossy-codec gate
      // compares them to the source raster; a fold can't)
      val framesPx = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var malformed: Boolean = false
    }

    /** Decode one MJPEG frame — a self-contained JPEG — through the
      * JDK's full JPEG pipeline (entropy decode, dequantize, IDCT):
      * gray samples in top-down row-major order, or None when the
      * payload isn't a decodable single-band JPEG at the stream's
      * declared dimensions. The reader instance is reused across a
      * container's frames (a per-frame ImageIO registry probe was
      * measurable at ~10 frames/doc × corpus). */
    private def decodeJpegGray(reader: javax.imageio.ImageReader,
                               b: Array[Byte], from: Int, len: Int,
                               width: Int, height: Int): Option[Array[Int]] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b, from, len))
        try {
          reader.setInput(iis)
          val img = reader.read(0)
          if (img == null || img.getWidth != width || img.getHeight != height ||
              img.getRaster.getNumBands != 1) None
          else {
            val px = new Array[Int](width * height)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                px(y * width + x) = img.getRaster.getSample(x, y, 0)
                x += 1
              }
              y += 1
            }
            Some(px)
          }
        } finally iis.close()
      } catch { case _: Exception => None }

    /** Decode one 24-bit BI_RGB DIB: bottom-up BGR rows with 4-byte
      * stride; fold gray = (r+g+b)/3 in top-down row-major order. */
    private def decodeDib(b: Array[Byte], from: Int, len: Int,
                          width: Int, height: Int): Option[Long] = {
      val rowBytes = AviWriter.stride(width)
      if (len < rowBytes * height) return None
      var acc = 0L
      var y = 0
      while (y < height) {
        val rowBase = from + (height - 1 - y) * rowBytes
        var x = 0
        while (x < width) {
          val blue = b(rowBase + 3 * x) & 0xffL
          val green = b(rowBase + 3 * x + 1) & 0xffL
          val red = b(rowBase + 3 * x + 2) & 0xffL
          acc = (acc * 31 + (red + green + blue) / 3) % P
          x += 1
        }
        y += 1
      }
      Some(acc)
    }

    private def walk(b: Array[Byte], from: Long, to: Long, st: Stream,
                     depth: Int): Unit = {
      // same nesting bound as the MP4 walk: nested LISTs recurse, and
      // a crafted all-LIST payload must flag malformed, not
      // StackOverflowError past the Exception handler
      if (depth > MaxBoxDepth) { st.malformed = true; return }
      var pos = from
      while (pos < to && !st.malformed) {
        if (pos + 8 > to) { st.malformed = true; return }
        val name = fourcc(b, pos.toInt)
        val size = u32(b, pos.toInt + 4)
        val body = pos + 8
        if (body + size > to) { st.malformed = true; return }
        name match {
          case "LIST" =>
            if (size < 4) { st.malformed = true; return }
            walk(b, body + 4, body + size, st, depth + 1) // skip the list-type fourcc
          case "avih" =>
            if (size < 40) { st.malformed = true; return }
            st.nFrames = u32(b, body.toInt + 16)
          case "strh" =>
            if (size < 48) { st.malformed = true; return }
            val fccType = fourcc(b, body.toInt)
            val handler = fourcc(b, body.toInt + 4)
            if (fccType == "vids") {
              st.vids = handler == "DIB " || handler == "    "
              st.mjpgHandler = handler == "MJPG"
            }
          case "strf" if st.vids || st.mjpgHandler =>
            if (size < 40) { st.malformed = true; return }
            st.width = u32(b, body.toInt + 4).toInt
            st.height = u32(b, body.toInt + 8).toInt
            st.bgr24 = st.vids &&
              u16(b, body.toInt + 14) == 24 && u32(b, body.toInt + 16) == 0L
            st.mjpeg = st.mjpgHandler &&
              u32(b, body.toInt + 16) == AviWriter.MjpgFourcc
          case f if (f.endsWith("db") || f.endsWith("dc")) && st.bgr24 =>
            decodeDib(b, body.toInt, size.toInt, st.width, st.height) match {
              case Some(sum) => st.frames += sum
              case None => st.malformed = true
            }
          case f if (f.endsWith("db") || f.endsWith("dc")) && st.mjpeg =>
            decodeJpegGray(st.jpegReader, b, body.toInt, size.toInt,
              st.width, st.height) match {
              case Some(px) => st.framesPx += px
              case None => st.malformed = true
            }
          case "idx1" =>
            st.idxEntries = size / 16
          case _ => // unknown chunk: skip by size
        }
        pos = body + size + (size % 2) // RIFF word alignment
      }
    }

    def decodeFrames(docId: Long, payload: Array[Byte]): Option[Seq[VideoFrame]] = {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return None
      val st = new Stream
      try walk(payload, 12L, math.min(payload.length.toLong, 8L + u32(payload, 4)), st, 0)
      catch { case _: Exception => return None }
      if (st.malformed || !st.vids || !st.bgr24 || st.frames.isEmpty ||
          st.frames.size != st.nFrames || st.idxEntries != st.nFrames) None
      else Some(st.frames.toSeq.zipWithIndex.map { case (sum, i) =>
        VideoFrame(docId, i, st.width, st.height, sum)
      })
    }

    /** MJPEG-in-AVI decode: the same RIFF walk, but frames pass
      * through the full JPEG pipeline and come back as decoded gray
      * pixel arrays (top-down row-major) — the caller needs pixels,
      * not a fold, because a lossy codec's gate compares against the
      * source raster within a tolerance ([[Multimodal.mjpegRoundTrip]]).
      * Same structural validation as the DIB path: stream headers
      * must declare an 'MJPG' video stream, every frame must decode
      * at the declared dimensions, and the idx1 entry count must
      * match the frames actually decoded. Returns (width, height,
      * frames) or None for the caller's stub fallback. */
    def decodeMjpeg(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Int]])] = {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return None
      val st = new Stream
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
      if (!readers.hasNext) return None
      st.jpegReader = readers.next()
      try walk(payload, 12L, math.min(payload.length.toLong, 8L + u32(payload, 4)), st, 0)
      catch { case _: Exception => return None }
      finally st.jpegReader.dispose()
      if (st.malformed || !st.mjpeg || st.framesPx.isEmpty ||
          st.framesPx.size != st.nFrames || st.idxEntries != st.nFrames) None
      else Some((st.width, st.height, st.framesPx.toSeq))
    }
  }

  /** documents -> REAL AVI payloads (see [[AviWriter]]). */
  def encodeAvi(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[Encoded]
    docs.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { rows =>
        rows.map(row => Encoded(row.getLong(0), AviWriter.encode(row.getLong(0), row.getString(1))))
      }(enc).toDF()
  }

  /** One frame of the MJPEG round-trip gate: `within_tol` = 1 iff
    * every decoded pixel of the frame is within [[MjpegTol]] of the
    * source raster. */
  case class MjpegFrame(doc_id: Long, frame_idx: Int, width: Int,
                        height: Int, within_tol: Int)

  /** Per-pixel tolerance of the quality-1.0 grayscale JPEG round
    * trip. Measured max error on char-valued rasters is 1 (single-
    * band JPEG has no chroma subsampling; at quality 1.0 the quant
    * tables are near-unity so the only loss is DCT rounding); 4
    * leaves headroom without ever passing a broken codec path, which
    * would be off by tens. */
  val MjpegTol: Int = 4

  /** COMPRESSED-video round trip — the query that retires the last
    * codec stub: text → grayscale raster → real JPEG per frame
    * (ImageIO encoder) → MJPEG-in-AVI container ([[AviWriter
    * .encodeMjpeg]]) → RIFF walk + full JPEG decode per frame
    * ([[AviParser.decodeMjpeg]]) → per-frame comparison against the
    * source raster. Because the codec is LOSSY, the decoded-pixel
    * checksum the lossless media queries emit would be encoder-
    * dependent — so the gate follows the sketch_error_gate
    * discipline instead: the engine does the real work (entropy
    * decode + IDCT on every frame), verifies it in-engine against
    * the exact source raster, and emits an integer within-tolerance
    * bit the oracle replays from the text alone. Encode, decode and
    * verify fuse into ONE narrow mapPartitions (the verify needs the
    * source raster, so splitting stages would re-join payload-sized
    * data for no reason); payloads never leave the executors.
    * Undecodable containers yield one marked row (idx -1, tol 0) so
    * a codec regression fails the hash gate instead of dropping
    * rows. */
  def mjpegRoundTrip(docs: DataFrame, tol: Int = MjpegTol): Dataset[MjpegFrame] = {
    implicit val enc = Encoders.product[MjpegFrame]
    val frameChars = AviWriter.FrameChars
    docs.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { rows =>
        imageIoMemOnly
        // per-partition codec setup (the encodeImage discipline); the
        // decode side reuses one reader per container inside
        // AviParser.decodeMjpeg
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        rows.flatMap { row =>
          val id = row.getLong(0)
          val text = row.getString(1)
          val payload = AviWriter.encodeMjpegWith(writer, text)
          AviParser.decodeMjpeg(payload) match {
            case Some((w, h, frames)) =>
              frames.zipWithIndex.map { case (px, f) =>
                var maxErr = 0
                var i = 0
                while (i < px.length) {
                  val gi = f * frameChars + i
                  val expected = if (gi < text.length) text.charAt(gi) % 256 else 0
                  maxErr = math.max(maxErr, math.abs(px(i) - expected))
                  i += 1
                }
                MjpegFrame(id, f, w, h, if (maxErr <= tol) 1 else 0)
              }
            case None => Seq(MjpegFrame(id, -1, 0, 0, 0))
          }
        }
      }(enc)
  }

  /** AVI parse + per-frame sample DECODE, the one-to-many
    * [[frameSample]] shape over a real container: narrow
    * mapPartitions flatMap, payloads stay on the executors.
    * Unparseable payloads become one marked stub frame row (idx -1),
    * keeping the stage total. */
  def extractVideoFrames(binTable: DataFrame): Dataset[VideoFrame] = {
    implicit val enc = Encoders.product[VideoFrame]
    binTable.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          AviParser.decodeFrames(id, payload).getOrElse {
            val s = StubDecoder.decode(id, payload)
            Seq(VideoFrame(id, -1, 0, 0, s.checksum))
          }
        }
      }(enc)
  }
}

package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary plumbing: encode -> mapPartitions decode -> typed features") {
    val d = docsDf(1L -> "hello world", 2L -> "")
    val feats = Multimodal.extractFeatures(Multimodal.asBinaryTable(d))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 11)
    assert(feats(1L).kind == "image/stub")
    assert(feats(1L).width == 64 + ('h' & 0x3f))
    assert(feats(2L).n_bytes == 0 && feats(2L).width == 0)
  }

  test("stub decoder is deterministic and matches the portable fold hash for ASCII") {
    val f1 = Multimodal.StubDecoder.decode(1L, "abc".getBytes("UTF-8"))
    val f2 = Multimodal.StubDecoder.decode(1L, "abc".getBytes("UTF-8"))
    assert(f1 == f2)
    val model = "abc".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % Config.P)
    assert(f1.checksum == model)
  }

  test("real PNG round trip: encodePng payloads decode via ImageIO to true dims + pixel fold") {
    val text = "the quick brown fox jumps over the lazy dog" // 44 chars -> 16x3
    val d = docsDf(7L -> text)
    val feats = Multimodal.extractFeatures(Multimodal.encodePng(d)).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.kind == "image/png", s"ImageIO did not recognize the payload: ${f.kind}")
    assert(f.width == 16 && f.height == 3)
    // decoded pixels = char i (zero-padded): replay the fold directly
    val padded = text.map(_.toInt % 256).padTo(48, 0)
    val model = padded.foldLeft(0L)((a, g) => (a * 31 + g) % Config.P)
    assert(f.checksum == model, "decoded-pixel checksum must re-derive from the text")
    // and the payload really is a PNG container, not the stub passthrough
    assert(f.n_bytes > 8)
  }

  test("real GIF/BMP/WBMP round trips are lossless: decoded pixels re-derive from the text") {
    val text = "the quick brown fox jumps over the lazy dog" // 44 chars -> 16x3
    val d = docsDf(7L -> text)
    val gray = text.map(_.toInt % 256).padTo(48, 0)
    val grayFold = gray.foldLeft(0L)((a, g) => (a * 31 + g) % Config.P)
    // wbmp is 1-bit by spec: pixel = (char mod 2) decoding to 0 / 255
    val bitFold = text.map(c => (c.toInt % 2) * 255).padTo(48, 0)
      .foldLeft(0L)((a, g) => (a * 31 + g) % Config.P)
    for ((fmt, expect) <- Seq("gif" -> grayFold, "bmp" -> grayFold, "wbmp" -> bitFold)) {
      val f = Multimodal.extractFeatures(Multimodal.encodeImage(d, fmt)).collect().head
      assert(f.kind == s"image/$fmt", s"ImageIO did not recognize the $fmt payload: ${f.kind}")
      assert(f.width == 16 && f.height == 3, s"$fmt dims ${f.width}x${f.height}")
      assert(f.checksum == expect, s"$fmt decoded-pixel checksum must re-derive from the text")
    }
  }

  test("real WAV round trip: encodeWav payloads decode via javax.sound to true PCM features") {
    val text = "the quick brown fox jumps over the lazy dog"
    val d = docsDf(7L -> text, 8L -> "") // empty text = header-only WAV
    val feats = Multimodal.extractAudioFeatures(Multimodal.encodeWav(d))
      .collect().map(f => f.doc_id -> f).toMap
    val f = feats(7L)
    assert(f.kind == "audio/pcm_signed",
      s"javax.sound did not recognize the payload: ${f.kind}")
    assert(f.sample_rate == 8000)
    assert(f.n_frames == text.length.toLong)
    // decoded PCM = [c_i low byte, 0 high byte] per char: replay the fold
    val pcm = text.flatMap(c => Seq(c.toInt % 256, 0))
    val model = pcm.foldLeft(0L)((a, b) => (a * 31 + b) % Config.P)
    assert(f.checksum == model, "decoded-PCM checksum must re-derive from the text")
    assert(f.n_bytes > 40, "payload must be a real WAV container (44-byte header)")
    val empty = feats(8L)
    assert(empty.kind == "audio/pcm_signed" && empty.n_frames == 0L
      && empty.checksum == 0L)
  }

  test("non-audio payloads fall back to the labeled audio stub row") {
    val d = docsDf(1L -> "plain text, certainly not a RIFF container")
    val f = Multimodal.extractAudioFeatures(Multimodal.asBinaryTable(d))
      .collect().head
    assert(f.kind == "audio/stub" && f.sample_rate == 0)
  }

  test("unrecognizable payloads still fall back to the stub decoder") {
    val d = docsDf(1L -> "plain text, no image magic bytes")
    val f = Multimodal.extractFeatures(Multimodal.asBinaryTable(d)).collect().head
    assert(f.kind == "image/stub")
  }

  test("frame sampling chunks payloads into typed per-frame rows") {
    val d = docsDf(1L -> ("x" * 150), 2L -> "short")
    val frames = Multimodal.frameSample(Multimodal.asBinaryTable(d), chunkSize = 64)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).length == 3) // 64 + 64 + 22
    assert(frames(1L).sortBy(_.frame_idx).map(_.frame_bytes).toSeq == Seq(64L, 64L, 22L))
    assert(frames(1L).map(_.offset).sorted.toSeq == Seq(0L, 64L, 128L))
    assert(frames(2L).length == 1 && frames(2L).head.frame_bytes == 5)
    // chunk hash of the full-payload doc 2 equals the whole-payload checksum
    assert(frames(2L).head.frame_hash ==
      Multimodal.StubDecoder.decode(2L, "short".getBytes("UTF-8")).checksum)
  }

  test("resize stub contracts payloads and composes with frame sampling") {
    val d = docsDf(1L -> ("abcdefgh" * 16)) // 128 bytes
    val resized = Multimodal.resizeStub(Multimodal.asBinaryTable(d), factor = 4).collect().head
    assert(resized.in_bytes == 128 && resized.out_bytes == 32)
    // every 4th byte of repeating "abcdefgh" is "aeae..."
    assert(new String(resized.payload, "UTF-8") == "ae" * 16)
    // composes: resized payload can feed the frame sampler
    val frames = Multimodal.frameSample(
      Multimodal.resizeStub(Multimodal.asBinaryTable(d), 4).toDF()
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("payload")), chunkSize = 16)
      .collect()
    assert(frames.map(_.frame_bytes).sum == 32)
  }

  test("media meta exposes byte/char counts") {
    val d = docsDf(1L -> "abc")
    val r = Multimodal.mediaMeta(d).collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 3)
  }

  test("real MP4 round trip: container parse re-derives every field from the text") {
    val text = "the quick brown fox jumps over the lazy dog" // 43 chars -> 16x3
    // even id -> mvhd v0 / 32-bit mdat; odd id -> mvhd v1 / largesize mdat;
    // empty text -> zero-sample container
    val d = docsDf(6L -> text, 7L -> text, 8L -> "")
    val metas = Multimodal.extractVideoMeta(Multimodal.encodeMp4(d))
      .collect().map(m => m.doc_id -> m).toMap
    val model = text.foldLeft(0L)((a, c) => (a * 31 + c.toInt % 256) % Config.P)
    for (id <- Seq(6L, 7L)) {
      val m = metas(id)
      assert(m.brand == "isom" && m.codec == "mp4v", s"parse fell back to stub: $m")
      assert(m.mvhd_version == (id % 2).toInt)
      assert(m.timescale == 1000L && m.duration == 40L * text.length)
      assert(m.n_tracks == 1 && m.width == 16 && m.height == 3)
      assert(m.n_samples == text.length.toLong && m.mdat_bytes == text.length.toLong)
      assert(m.checksum == model, "mdat checksum must re-derive from the text")
    }
    val empty = metas(8L)
    assert(empty.brand == "isom" && empty.n_samples == 0L
      && empty.mdat_bytes == 0L && empty.checksum == 0L && empty.height == 1)
  }

  test("real AVI round trip: DIB frame decode re-derives every pixel from the text") {
    val text = "the quick brown fox jumps over the lazy dog, and then more " +
      "text so the fixture spans a whole frame plus a zero-padded second"
    assert(text.length > 64 && text.length < 128) // 2 frames, second padded
    val d = docsDf(6L -> text, 8L -> "") // empty text -> one zero frame
    val frames = Multimodal.extractVideoFrames(Multimodal.encodeAvi(d))
      .collect().groupBy(_.doc_id)
    val f6 = frames(6L).sortBy(_.frame_idx)
    assert(f6.length == 2, s"${text.length} chars at 64/frame must decode to 2 frames: ${f6.length}")
    for ((f, idx) <- f6.zipWithIndex) {
      assert(f.frame_idx == idx && f.width == 16 && f.height == 4)
      val slice = text.drop(idx * 64).take(64).map(_.toInt % 256).padTo(64, 0)
      val model = slice.foldLeft(0L)((a, g) => (a * 31 + g) % Config.P)
      assert(f.checksum == model, s"frame $idx decoded-pixel checksum must re-derive from the text")
    }
    val f8 = frames(8L)
    assert(f8.length == 1 && f8.head.frame_idx == 0 && f8.head.checksum == 0L)
  }

  test("AVI DIB decode handles stride padding and RIFF word alignment") {
    // width 10 -> 30-byte pixel rows padded to a 32-byte stride; the
    // decoder must drop the 2 pad bytes per row. frameChars 10x1=10
    // keeps frames small so multi-frame alignment is exercised too.
    val text = "abcdefghijKLMNOPQRSTuv" // 22 chars -> 3 frames of 10
    val payload = Multimodal.AviWriter.encode(3L, text, width = 10, frameChars = 10)
    val frames = Multimodal.AviParser.decodeFrames(3L, payload)
    assert(frames.isDefined, "parser rejected a spec-valid stride-padded AVI")
    val fs = frames.get
    assert(fs.length == 3 && fs.forall(f => f.width == 10 && f.height == 1))
    for ((f, idx) <- fs.zipWithIndex) {
      val slice = text.drop(idx * 10).take(10).map(_.toInt % 256).padTo(10, 0)
      val model = slice.foldLeft(0L)((a, g) => (a * 31 + g) % Config.P)
      assert(f.checksum == model, s"stride-padded frame $idx must decode exactly")
    }
  }

  test("AVI encode -> decode round-trips arbitrary char-valued frames (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // chars beyond 0xFF exercise the mod-256 pixel clamp; lengths
    // around multiples of 64 exercise exact-fit vs padded last frames
    val textGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> Gen.choose(32.toChar, 126.toChar),
        1 -> Gen.oneOf('é', '中', 'ÿ', 'Ā'))).map(_.mkString))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(textGen) { s =>
        val frames = Multimodal.AviParser.decodeFrames(
          1L, Multimodal.AviWriter.encode(1L, s)).getOrElse(Seq.empty)
        val expectFrames = math.max(1, (s.length + 63) / 64)
        frames.length == expectFrames && frames.zipWithIndex.forall { case (f, i) =>
          val slice = s.drop(i * 64).take(64).map(_.toInt % 256).padTo(64, 0)
          f.frame_idx == i && f.width == 16 && f.height == 4 &&
            f.checksum == slice.foldLeft(0L)((a, g) => (a * 31 + g) % Config.P)
        }
      })
    assert(res.passed, s"AVI round-trip property: ${res.status}")
  }

  test("AVI parser rejects structural violations and falls back to a marked stub row") {
    val good = Multimodal.AviWriter.encode(2L, "hello avi world")
    assert(Multimodal.AviParser.decodeFrames(2L, good).isDefined)
    // truncated mid-chunk
    assert(Multimodal.AviParser.decodeFrames(2L, good.take(good.length - 5)).isEmpty)
    // idx1 count disagreeing with decoded frames: flip the index size
    // down by one 16-byte entry
    val text = "x" * 130 // 3 frames so idx1 has >1 entry
    val multi = Multimodal.AviWriter.encode(2L, text)
    val idxAt = {
      var i = multi.length - 4
      while (i > 0 && !(multi(i) == 'i' && multi(i + 1) == 'd' &&
        multi(i + 2) == 'x' && multi(i + 3) == '1')) i -= 1
      i
    }
    assert(idxAt > 0, "fixture must contain an idx1 chunk")
    val broken = multi.clone()
    val oldSize = (broken(idxAt + 4) & 0xff) | ((broken(idxAt + 5) & 0xff) << 8)
    broken(idxAt + 4) = ((oldSize - 16) & 0xff).toByte
    // (chunk now under-reads its body; the walk's size bound keeps it in range)
    assert(Multimodal.AviParser.decodeFrames(2L, broken).isEmpty,
      "an idx1/frame-count mismatch must be rejected, not silently decoded")
    // not a container at all -> one marked stub frame row in the stage
    val d = docsDf(1L -> "plain text, no RIFF header")
    val f = Multimodal.extractVideoFrames(Multimodal.asBinaryTable(d)).collect()
    assert(f.length == 1 && f.head.frame_idx == -1 && f.head.width == 0)
  }

  test("MJPEG-in-AVI: frames are real JPEGs and decode within tolerance of the source raster") {
    val text = "compressed video at last: motion jpeg frames, one real JPEG " +
      "per frame, long enough for two frames and a zero-padded tail!"
    assert(text.length > 64 && text.length < 128)
    val payload = Multimodal.AviWriter.encodeMjpeg(text)
    // the frames must be genuinely JPEG-compressed: a JPEG SOI marker
    // (FF D8) inside the movi data, and an 'MJPG' strf compression tag
    def hasSeq(hay: Array[Byte], needle: Array[Byte]): Boolean =
      hay.indices.exists(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    assert(hasSeq(payload, Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)),
      "MJPEG payload must contain JPEG SOI markers")
    assert(hasSeq(payload, "MJPG".getBytes("US-ASCII")),
      "container must declare the MJPG codec")
    // full decode: dims + both frames within tolerance, and the error
    // is genuinely nonzero-capable (lossy codec) but bounded
    val (w, h, frames) = Multimodal.AviParser.decodeMjpeg(payload).get
    assert(w == 16 && h == 4 && frames.length == 2)
    for ((px, f) <- frames.zipWithIndex; i <- px.indices) {
      val gi = f * 64 + i
      val expected = if (gi < text.length) text.charAt(gi) % 256 else 0
      assert(math.abs(px(i) - expected) <= Multimodal.MjpegTol,
        s"frame $f pixel $i: decoded ${px(i)} vs source $expected")
    }
    // the DIB decoder must NOT accept an MJPEG container (codec gate)
    assert(Multimodal.AviParser.decodeFrames(1L, payload).isEmpty)
  }

  test("mjpegRoundTrip gate: every frame row within_tol, undecodable input marked") {
    val rows = Multimodal.mjpegRoundTrip(docsDf(
      1L -> ("y" * 130), 2L -> "", 3L -> "short")).collect()
    val byDoc = rows.groupBy(_.doc_id)
    assert(byDoc(1L).length == 3 && byDoc(2L).length == 1 && byDoc(3L).length == 1)
    assert(rows.forall(r => r.within_tol == 1 && r.width == 16 && r.height == 4),
      s"all frames must pass the tolerance gate: ${rows.filter(_.within_tol == 0).toSeq}")
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
    // a truncated container must surface as the marked failure row,
    // not vanish: decodeMjpeg returns None on structural violations
    val good = Multimodal.AviWriter.encodeMjpeg("hello mjpeg")
    assert(Multimodal.AviParser.decodeMjpeg(good.take(good.length - 5)).isEmpty)
  }

  test("MJPEG decode round-trips arbitrary char-valued frames (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val textGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> Gen.choose(32.toChar, 126.toChar),
        1 -> Gen.oneOf('é', '中', 'ÿ', 'Ā'))).map(_.mkString))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAll(textGen) { s =>
        Multimodal.AviParser.decodeMjpeg(Multimodal.AviWriter.encodeMjpeg(s)) match {
          case None => false
          case Some((w, h, frames)) =>
            val expectFrames = math.max(1, (s.length + 63) / 64)
            w == 16 && h == 4 && frames.length == expectFrames &&
              frames.zipWithIndex.forall { case (px, f) =>
                px.indices.forall { i =>
                  val gi = f * 64 + i
                  val e = if (gi < s.length) s.charAt(gi) % 256 else 0
                  math.abs(px(i) - e) <= Multimodal.MjpegTol
                }
              }
        }
      })
    assert(res.passed, s"MJPEG round-trip property: ${res.status}")
  }

  test("MP4 parser skips unknown boxes and rejects structural violations") {
    val good = Multimodal.Mp4Writer.encode(2L, "hello")
    // the writer always embeds a 'free' box, so a successful parse
    // proves the unknown-box skip path; now break the structure:
    assert(Multimodal.Mp4Parser.parse(2L, good).isDefined)
    // truncated mid-box
    assert(Multimodal.Mp4Parser.parse(2L, good.take(good.length - 5)).isEmpty)
    // box size under the header length
    val undersized = good.clone()
    undersized(0) = 0; undersized(1) = 0; undersized(2) = 0; undersized(3) = 4
    assert(Multimodal.Mp4Parser.parse(2L, undersized).isEmpty)
    // not a container at all -> stub fallback row in the stage
    val d = docsDf(1L -> "plain text, no ftyp box")
    val f = Multimodal.extractVideoMeta(Multimodal.asBinaryTable(d)).collect().head
    assert(f.brand == "raw" && f.codec == "none" && f.mvhd_version == -1)
  }

  test("pathological container nesting is rejected as malformed, not a stack overflow") {
    // MP4: nothing but nested 'moov' headers — each 8-byte header
    // opens one more recursion level. Enough levels to blow a default
    // JVM stack if the walk were unbounded (StackOverflowError is an
    // Error, which the parse handler deliberately does not catch).
    val levels = 200000
    val mp4 = new Array[Byte](8 * levels)
    var i = 0
    while (i < levels) {
      val size = 8L * (levels - i) // each box spans the whole remainder
      mp4(8 * i) = ((size >> 24) & 0xff).toByte
      mp4(8 * i + 1) = ((size >> 16) & 0xff).toByte
      mp4(8 * i + 2) = ((size >> 8) & 0xff).toByte
      mp4(8 * i + 3) = (size & 0xff).toByte
      mp4(8 * i + 4) = 'm'.toByte; mp4(8 * i + 5) = 'o'.toByte; mp4(8 * i + 6) = 'o'.toByte; mp4(8 * i + 7) = 'v'.toByte
      i += 1
    }
    assert(Multimodal.Mp4Parser.parse(1L, mp4).isEmpty)

    // AVI: RIFF header then nothing but nested LIST chunks (12 bytes
    // per level: fourcc + size + list type)
    val aviLevels = 200000
    val avi = new Array[Byte](12 + 12 * aviLevels)
    def le32(at: Int, v: Long): Unit = {
      avi(at) = (v & 0xff).toByte; avi(at + 1) = ((v >> 8) & 0xff).toByte
      avi(at + 2) = ((v >> 16) & 0xff).toByte; avi(at + 3) = ((v >> 24) & 0xff).toByte
    }
    avi(0) = 'R'.toByte; avi(1) = 'I'.toByte; avi(2) = 'F'.toByte; avi(3) = 'F'.toByte
    le32(4, (avi.length - 8).toLong)
    avi(8) = 'A'.toByte; avi(9) = 'V'.toByte; avi(10) = 'I'.toByte; avi(11) = ' '.toByte
    var j = 0
    while (j < aviLevels) {
      val at = 12 + 12 * j
      avi(at) = 'L'.toByte; avi(at + 1) = 'I'.toByte; avi(at + 2) = 'S'.toByte; avi(at + 3) = 'T'.toByte
      le32(at + 4, (avi.length - at - 8).toLong)
      avi(at + 8) = 'h'.toByte; avi(at + 9) = 'd'.toByte; avi(at + 10) = 'r'.toByte; avi(at + 11) = 'l'.toByte
      j += 1
    }
    assert(Multimodal.AviParser.decodeFrames(1L, avi).isEmpty)
  }

  test("undersized mvhd/tkhd/stsz boxes are flagged malformed, not read past their end") {
    // a valid file, then shrink the mvhd box so its v0 reads would
    // reach into the next box's bytes: the parser must reject it
    val good = Multimodal.Mp4Writer.encode(2L, "hello")
    def findBox(b: Array[Byte], name: String): Int = {
      var i = 0
      while (i + 4 <= b.length - 4 &&
        !(b(i + 4) == name(0) && b(i + 5) == name(1) && b(i + 6) == name(2) && b(i + 7) == name(3))) i += 1
      i
    }
    val at = findBox(good, "mvhd")
    assert(at + 8 < good.length, "fixture must contain mvhd")
    val shrunk = good.clone()
    // box size := 8 + 12 (bodyLen 12 < the v0 minimum of 20)
    shrunk(at) = 0; shrunk(at + 1) = 0; shrunk(at + 2) = 0; shrunk(at + 3) = 20
    assert(Multimodal.Mp4Parser.parse(2L, shrunk).isEmpty,
      "an mvhd too short for its version's reads must be malformed")
  }
}

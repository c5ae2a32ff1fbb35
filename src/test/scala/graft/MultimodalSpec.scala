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

  test("media meta exposes byte/char counts") {
    val d = docsDf(1L -> "abc")
    val r = Multimodal.mediaMeta(d).collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 3)
  }
}

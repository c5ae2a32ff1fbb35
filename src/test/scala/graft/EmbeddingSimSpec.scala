package graft

import graft.operators.EmbeddingSim

class EmbeddingSimSpec extends SparkSpec {

  private def embDf(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("norms: dim and squared L2") {
    val r = EmbeddingSim.norms(embDf(1L -> Seq(3f, 4f))).collect().head
    assert(r.getLong(1) == 2 && r.getDouble(2) == 25.0)
  }

  test("cosine top-k ranks collinear above orthogonal") {
    val d = embDf(
      0L -> Seq(1f, 0f, 0f),    // query (vec_id % 100 == 0)
      1L -> Seq(2f, 0f, 0f),    // same direction -> cosine 1
      2L -> Seq(1f, 1f, 0f),    // 45 degrees
      3L -> Seq(0f, 1f, 0f))    // orthogonal
    val out = EmbeddingSim.cosineTopK(d, k = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // rank order
    assert(out.head._3 == 1.0)
    assert(math.abs(out(1)._3 - math.sqrt(0.5)) < 1e-12)
    assert(out(2)._3 == 0.0)
  }

  test("ann buckets are deterministic and identical vectors share a bucket") {
    val d = embDf(1L -> Seq(1f, 2f, 3f, 4f), 2L -> Seq(1f, 2f, 3f, 4f), 3L -> Seq(-1f, -2f, -3f, -4f))
    val b = EmbeddingSim.annBuckets(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // opposite vector flips every sign bit
  }

  test("ann topk only pairs within buckets") {
    val d = embDf(1L -> Seq(1f, 2f, 3f, 4f), 2L -> Seq(1f, 2f, 3f, 4f), 3L -> Seq(-1f, -2f, -3f, -4f))
    val pairs = EmbeddingSim.annTopK(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 1L)))
  }

  test("int8 quantization: max-abs component maps to ±127, zero vector to zeros, codes bounded") {
    val d = embDf(1L -> Seq(0.5f, -1.0f, 0.25f), 2L -> Seq(0f, 0f))
    val out = EmbeddingSim.quantizeInt8(d).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getDouble(1), r.getLong(3))).toMap
    // vec 1: max|v| = 1.0 → scale 127; floor(0.5*127+0.5)=64,
    // floor(-127+0.5)=-127, floor(0.25*127+0.5)=32
    assert(out((1L, 0L))._2 == 64L)
    assert(out((1L, 1L))._2 == -127L)
    assert(out((1L, 2L))._2 == 32L)
    assert(out((1L, 0L))._1 == 127.0)
    // zero vector: scale 1, all-zero codes
    assert(out((2L, 0L)) == ((1.0, 0L)) && out((2L, 1L)) == ((1.0, 0L)))
    assert(out.values.forall { case (_, c) => c >= -127L && c <= 127L })
  }

  test("centroid sim: parallel labels get cosine exactly 1, orthogonal exactly 0") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), 0), // label 0: centroid (254, 0)
      (2L, Seq(2.0f, 0.0f), 0), //   (both quantize to code 127)
      (3L, Seq(0.0f, 1.0f), 1), // label 1: centroid (0, 127)
      (4L, Seq(3.0f, 0.0f), 2)  // label 2: centroid (127, 0)
    ).toDF("vec_id", "embedding", "label")
    val rows = EmbeddingSim.centroidSim(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows((0L, 1L))._4 == 0.0) // orthogonal: integer dot is exactly 0
    assert(rows((1L, 2L))._4 == 0.0)
    // parallel: 254·127 / (sqrt(254²)·sqrt(127²)) — perfect squares, exact 1
    assert(rows((0L, 2L)) == ((32258L, 64516L, 16129L, 1.0)))
  }

  test("embed outliers: the planted far vector ranks first in its label") {
    val s = spark
    import s.implicits._
    // label 0: three near-identical vectors + one opposite-direction
    // outlier; all quantize exactly (components are ±1/0 scaled)
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 0),
      (4L, Seq(-1.0f, 0.0f), 0),
      (5L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = EmbeddingSim.embedOutliers(d).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getLong(2)))).toMap
    // label 0: codes ±127, n=4, csum=(254,0):
    //   members: (4·127-254)² = 254²; outlier: (4·(-127)-254)² = 762²
    assert(rows((0L, 1L)) == ((4L, 762L * 762L)))
    assert(rows((0L, 2L))._1 == 1L && rows((0L, 2L))._2 == 254L * 254L)
    // singleton label: deviation is exactly zero
    assert(rows((1L, 1L)) == ((5L, 0L)))
  }
}

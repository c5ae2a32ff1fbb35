package graft

import graft.operators.EmbeddingSim

class EmbeddingSimSpec extends SparkSpec {

  private def embDf(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("scoredCache keeps LIVE sibling sessions' entries — alternating sessions hit, not thrash") {
    // r13 advice: the r12 purge evicted ALL foreign-session entries on
    // a miss, so two live sessions alternating calls recomputed the
    // scored matrix every time. The purge now targets only entries
    // whose owning context is STOPPED (untestable in-JVM — one context
    // per JVM — the filter is exercised by the capacity path); live
    // siblings coexist under the capacity-2 LRU.
    val emb1 = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    EmbeddingSim.cosineScoredCached(emb1)
    val tag1 = Caches.sessionTag(emb1)
    assert(EmbeddingSim.scoredCacheKeys.exists(_.startsWith(tag1 + "|")))
    val s2 = spark.newSession()
    val emb2 = s2.read.parquet(s"$Sf0001/embeddings.parquet")
    EmbeddingSim.cosineScoredCached(emb2)
    val tag2 = Caches.sessionTag(emb2)
    assert(tag1 != tag2)
    val keys = EmbeddingSim.scoredCacheKeys
    assert(keys.exists(_.startsWith(tag1 + "|")) && keys.exists(_.startsWith(tag2 + "|")),
      s"both live sessions' entries must coexist, got $keys")
    // alternating sessions serve from cache: the key set is unchanged
    EmbeddingSim.cosineScoredCached(emb1)
    EmbeddingSim.cosineScoredCached(emb2)
    assert(EmbeddingSim.scoredCacheKeys.toSet == keys.toSet,
      "an alternating live session must hit, not purge-and-recompute")
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

  test("feed-maintained IVF index probes like a rebuild under the same quantizer") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.{Merge, Snapshots}
    spark.conf.set("spark.graft.merge.changeFeed", "true")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_ivffeed")
      val root = base.resolve("table").toString
      val modelDir = base.resolve("model").toString
      val indexDir = base.resolve("index").toString
      val tombDir = base.resolve("tomb").toString
      val freshDir = base.resolve("fresh").toString

      val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
        .select("vec_id", "embedding")
      val corpus = emb.filter(col("vec_id") < 400L)
      Snapshots.commit(spark, root, "base",
        statsFor = p => Merge.statsWithBlooms(spark, p, Seq("vec_id"))) { p =>
        corpus.repartitionByRange(4, col("vec_id"))
          .sortWithinPartitions("vec_id").write.parquet(p)
      } // v1
      EmbeddingSim.ivfIndexBuild(corpus, modelDir, indexDir)

      def vec(id: Long): Seq[Float] = emb.filter(col("vec_id") === id)
        .select("embedding").head().getSeq[Float](0)
      // v2: move vec 5 onto vec 50's embedding, insert a new vector
      Merge.merge(spark, root,
        Seq((5L, vec(50L), Merge.UpsertOp), (9999L, vec(7L), Merge.UpsertOp))
          .toDF("vec_id", "embedding", "op"), "m1", Seq("vec_id"))
      EmbeddingSim.ivfApplyChangeFeed(
        Merge.changeFeed(spark, root, 1, 2), modelDir, indexDir, tombDir)
      // v3: a COW delete and a re-update of the fresh vector
      Merge.merge(spark, root,
        Seq((11L, Seq.empty[Float], Merge.DeleteOp),
          (9999L, vec(90L), Merge.UpsertOp))
          .toDF("vec_id", "embedding", "op"), "m2", Seq("vec_id"))
      EmbeddingSim.ivfApplyChangeFeed(
        Merge.changeFeed(spark, root, 2, 3), modelDir, indexDir, tombDir)

      // the reference: a from-scratch cell table of the CURRENT rows
      // under the SAME persisted quantizer
      EmbeddingSim.ivfIndexBuild(
        Merge.readCurrent(spark, root), modelDir, freshDir)
      val queries = emb.filter(col("vec_id") >= 400L && col("vec_id") < 430L)
      // collected-set compare (exceptAll over two window-ranked
      // frames with shared lineage trips a Catalyst binding bug);
      // cosine is bit-identical on both paths by construction
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val maintained = rows(EmbeddingSim.ivfProbeMaintained(
        queries, modelDir, indexDir, tombDir))
      val rebuilt = rows(EmbeddingSim.ivfProbeIndex(queries, modelDir, freshDir))
      assert(maintained == rebuilt,
        s"feed-maintained IVF probe diverged from the same-model rebuild " +
          s"(m-r=${(maintained -- rebuilt).take(3)} r-m=${(rebuilt -- maintained).take(3)})")
      assert(!maintained.exists(_._2 == 11L),
        "a deleted vector must not surface as a neighbor")

      // replaying an old span rewrites its own ingest_batch partition
      // (dynamic overwrite) — the probe must not change
      EmbeddingSim.ivfApplyChangeFeed(
        Merge.changeFeed(spark, root, 1, 2), modelDir, indexDir, tombDir)
      val replayed = rows(EmbeddingSim.ivfProbeMaintained(
        queries, modelDir, indexDir, tombDir))
      assert(replayed == rebuilt, "a replayed span changed the maintained probe")

      // compaction drops dead generations, folds tombstones to one
      // row per vector, and changes nothing the probe observes —
      // including under a post-compaction replay
      EmbeddingSim.ivfCompactMaintained(spark, indexDir, tombDir)
      val folded = spark.read.parquet(tombDir)
      assert(folded.count() == folded.select("vec_id").distinct().count(),
        "compaction must fold tombstones to one max-version row per vector")
      assert(rows(EmbeddingSim.ivfProbeMaintained(
        queries, modelDir, indexDir, tombDir)) == rebuilt,
        "compaction changed the maintained probe")
      EmbeddingSim.ivfApplyChangeFeed(
        Merge.changeFeed(spark, root, 1, 2), modelDir, indexDir, tombDir)
      assert(rows(EmbeddingSim.ivfProbeMaintained(
        queries, modelDir, indexDir, tombDir)) == rebuilt,
        "a span replayed after compaction resurrected stale vectors")
    } finally spark.conf.unset("spark.graft.merge.changeFeed")
  }

  test("maintained-IVF upkeep costs the change, not the corpus (BENCH_SCALE r11_maintained_ivf)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // deterministic synthetic embeddings, generated EXECUTOR-side
    // (dim 16; component j of vector i = ((i*31 + j*7) mod 101)/101)
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 15), " +
        "j -> cast(pmod(id * 31 + j * 7, 101) / 101.0 as float))")
        .as("embedding"))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e6)
    }
    def vec(seed: Int): Seq[Float] =
      (0 until 16).map(j => ((seed * 13 + j * 5) % 101) / 101f)
    // the SAME 3-row feed span at both corpus sizes — one update
    // pair, one insert (the r9_maintained_index protocol)
    val feed = Seq(
      (5L, vec(50), "update_postimage", 2),
      (5L, vec(5), "update_preimage", 2),
      (999999L, vec(7), "insert", 2))
      .toDF("vec_id", "embedding", "_change_type", "_commit_version")
    val base = java.nio.file.Files.createTempDirectory("graft_ivfscale")
    def dirs(tag: String) =
      (s"$base/${tag}_model", s"$base/${tag}_index", s"$base/${tag}_tomb")
    val (mS, iS, tS) = dirs("x1"); val (mB, iB, tB) = dirs("x5")
    EmbeddingSim.ivfIndexBuild(corpus(20000), mS, iS)
    EmbeddingSim.ivfIndexBuild(corpus(100000), mB, iB)
    // warm the apply path once, then measure steady upkeep: a
    // change-sized span collapse + one dynamic-partition write + a
    // tombstone append, independent of the cell table's size
    EmbeddingSim.ivfApplyChangeFeed(feed, mS, iS, tS)
    val (_, aS) = timed(EmbeddingSim.ivfApplyChangeFeed(feed, mS, iS, tS))
    val (_, aB) = timed(EmbeddingSim.ivfApplyChangeFeed(feed, mB, iB, tB))
    // the alternative: a full rebuild (quantizer refit + corpus-wide
    // cell assignment) — O(corpus) by construction
    val (mSr, iSr, _) = dirs("x1r"); val (mBr, iBr, _) = dirs("x5r")
    val (_, rS) = timed(EmbeddingSim.ivfIndexBuild(corpus(20000), mSr, iSr))
    val (_, rB) = timed(EmbeddingSim.ivfIndexBuild(corpus(100000), mBr, iBr))
    System.err.println(
      f"[scale] r11_maintained_ivf: apply same feed: 1x $aS%.0f ms, " +
        f"5x $aB%.0f ms; full rebuild: 1x $rS%.0f ms, 5x $rB%.0f ms")
    assert(aB < rB,
      f"upkeep ($aB%.0f ms) must beat a rebuild ($rB%.0f ms) at the 5x corpus")
    // and the maintained index still probes correctly after the span
    val probe = EmbeddingSim.ivfProbeMaintained(
      corpus(20000).filter(col("vec_id") < 3), mS, iS, tS, k = 2)
    assert(probe.count() == 6, "3 queries x k=2 expected")
  }
}

package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.sources.BandIndex
import graft.operators.MinHashLsh

class BandIndexSpec extends SparkSpec {

  private def hasIndexScan(p: SparkPlan): Boolean =
    p.collectLeaves().exists {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("graft_band_idx"))
      case _ => false
    }

  test("bucketed index probe: the index side of the band join carries no Exchange") {
    // AQE re-plans around materialized stages and hides the static
    // shape; the property under test is the planner's, so pin it off
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = BandIndex.incrementalPairsBucketed(spark, Sf0001)
      val smjs = df.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j
      }
      val idxJoin = smjs.find(j => hasIndexScan(j.left) || hasIndexScan(j.right))
        .getOrElse(fail(s"no sort-merge join over the band index in:\n" +
          df.queryExecution.executedPlan))
      val (idxSide, batchSide) =
        if (hasIndexScan(idxJoin.left)) (idxJoin.left, idxJoin.right)
        else (idxJoin.right, idxJoin.left)
      assert(idxSide.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        s"index side must not shuffle, was:\n$idxSide")
      assert(batchSide.collect { case e: ShuffleExchangeLike => e }.nonEmpty,
        "the batch side is the one that adapts to the index's bucketing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("bucket sizing scales with the corpus and stays within bounds") {
    assert(BandIndex.bucketsFor(0) == BandIndex.MinBuckets)
    assert(BandIndex.bucketsFor(400) == BandIndex.MinBuckets)
    assert(BandIndex.bucketsFor(20000) == 20)
    assert(BandIndex.bucketsFor(100L * 1000 * 1000 * 1000) == BandIndex.MaxBuckets)
  }

  test("stop-band-capped index: capped candidates are a strict subset, batch pairs intact") {
    val all = spark.read.parquet(s"$Sf0001/documents.parquet")
    val frontier = graft.operators.IncrementalIngest.frontierId(all)
    val uncapped = BandIndex.incrementalPairsBucketed(spark, Sf0001)
    val capped = BandIndex.incrementalPairsCapped(spark, Sf0001, maxBucket = 3)
    assert(capped.exceptAll(uncapped).isEmpty,
      "the cap may only remove candidates, never invent them")
    assert(capped.count() < uncapped.count(),
      "cap 3 must genuinely drop degenerate-bucket candidates at sf0.001")
    // within-batch pairs are outside the index and must survive the cap
    val batchOnly = MinHashLsh.incrementalCandidates(
      MinHashLsh.bands(all.filter(col("doc_id") < frontier))
        .limit(0), // empty index: only within-batch pairs remain
      all.filter(col("doc_id") >= frontier))
    assert(batchOnly.exceptAll(capped).isEmpty,
      "within-batch pairs must be unaffected by the index cap")
  }

  test("bucketed index probe equals the flat incremental candidates") {
    val all = spark.read.parquet(s"$Sf0001/documents.parquet")
    val frontier = graft.operators.IncrementalIngest.frontierId(all)
    val flat = MinHashLsh.incrementalCandidates(
      MinHashLsh.bands(all.filter(col("doc_id") < frontier)),
      all.filter(col("doc_id") >= frontier))
    val bucketed = BandIndex.incrementalPairsBucketed(spark, Sf0001)
    assert(bucketed.count() > 0)
    assert(bucketed.exceptAll(flat).isEmpty && flat.exceptAll(bucketed).isEmpty,
      "the index layout must not change the candidate set")
  }

  test("maintained-index upkeep costs the change, not the corpus") {
    val s = spark
    import s.implicits._
    import graft.sources.{BandIndex => BI}
    def corpus(n: Long) = (0L until n)
      .map(i => (i, s"document number $i carries words w${i % 97} w${i % 31} " +
        s"and a long enough tail for shingles to mean something"))
      .toDF("doc_id", "text")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e6)
    }
    val feedBatch = Seq(
      (5L, "a fresh text for doc five after its upstream edit", "update_postimage", 2),
      (5L, "document number 5 carries words w5 w5 and a long enough tail", "update_preimage", 2),
      (999999L, "a brand new arrival with text of its own", "insert", 2))
      .toDF("doc_id", "text", "_change_type", "_commit_version")

    val (tS, tombS) = BI.buildMaintained(spark, corpus(20000), "scale1x")
    val (tB, tombB) = BI.buildMaintained(spark, corpus(100000), "scale5x")
    // warm the apply path once, then measure steady upkeep
    BI.applyChangeFeed(spark, tS, tombS, feedBatch)
    val (_, aS) = timed(BI.applyChangeFeed(spark, tS, tombS, feedBatch))
    val (_, aB) = timed(BI.applyChangeFeed(spark, tB, tombB, feedBatch))
    val (_, rS) = timed(BI.buildMaintained(spark, corpus(20000), "scale1xr"))
    val (_, rB) = timed(BI.buildMaintained(spark, corpus(100000), "scale5xr"))
    info(f"apply same feed: 1x $aS%.0f ms, 5x $aB%.0f ms; " +
      f"full rebuild: 1x $rS%.0f ms, 5x $rB%.0f ms")
    assert(aB < rB,
      f"upkeep ($aB%.0f ms) must beat a rebuild ($rB%.0f ms) at the 5x corpus")
  }

  test("change-feed-maintained index equals a fresh rebuild at every step") {
    val s = spark
    import s.implicits._
    import graft.sources.{Merge, Snapshots}
    spark.conf.set("spark.graft.merge.changeFeed", "true")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_bandfeed").toString
      val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
        .select("doc_id", "text").filter(col("doc_id") < 120)
      Snapshots.commit(spark, root, "base",
        statsFor = p => Merge.statsWithBlooms(spark, p)) { p =>
        docs.repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
          .write.parquet(p)
      } // v1
      val (t, tomb) = BandIndex.buildMaintained(spark,
        Merge.readCurrent(spark, root).select("doc_id", "text"), root)
      // exceptAll is positional — align the fresh rebuild's column
      // order to the index layout's
      def freshBands = MinHashLsh.bands(
        Merge.readCurrent(spark, root).select("doc_id", "text"))
        .select("band", "band_key", "doc_id")
      def liveB = BandIndex.liveBands(spark, t, tomb)
        .select("band", "band_key", "doc_id")
      def assertSame(tagS: String): Unit =
        assert(liveB.exceptAll(freshBands).isEmpty &&
          freshBands.exceptAll(liveB).isEmpty,
          s"$tagS: maintained index diverged from a fresh rebuild")

      // v2: an update (doc 5 becomes doc 7's near-dup) and an insert
      val d7text = docs.filter(col("doc_id") === 7L)
        .select("text").head().getString(0)
      Merge.merge(spark, root,
        Seq((5L, d7text, Merge.UpsertOp), (5000L, d7text, Merge.UpsertOp))
          .toDF("doc_id", "text", "op"), "m1")
      BandIndex.applyChangeFeed(spark, t, tomb,
        Merge.changeFeed(spark, root, 1, 2))
      assertSame("after update+insert")

      // v3: a COW delete and a re-update of the fresh doc
      Merge.merge(spark, root,
        Seq((7L, "", Merge.DeleteOp),
          (5000L, "completely different text with its own shingles", Merge.UpsertOp))
          .toDF("doc_id", "text", "op"), "m2")
      BandIndex.applyChangeFeed(spark, t, tomb,
        Merge.changeFeed(spark, root, 2, 3))
      assertSame("after delete+re-update")
      assert(liveB.filter(col("doc_id") === 7L).isEmpty,
        "a deleted doc's bands must be tombstoned out")

      // probe equivalence against the from-scratch index of the
      // CURRENT corpus
      val batch = spark.read.parquet(s"$Sf0001/documents.parquet")
        .select("doc_id", "text")
        .filter(col("doc_id") >= 120L && col("doc_id") < 160L)
      val viaMaintained = BandIndex.probeMaintained(spark, t, tomb, batch)
      val viaFresh = MinHashLsh.incrementalCandidates(freshBands, batch)
      assert(viaMaintained.exceptAll(viaFresh).isEmpty &&
        viaFresh.exceptAll(viaMaintained).isEmpty,
        "maintained-index probe diverged from the fresh-index probe")

      // the tombstone mask must not cost the index its layout: the
      // probe's index side still carries NO Exchange (the tombstone
      // anti-join broadcasts and preserves the bucketed partitioning)
      val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        def hasLiveScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p.collectLeaves().exists {
            case f: FileSourceScanExec =>
              f.tableIdentifier.exists(_.table.startsWith("graft_band_live"))
            case _ => false
          }
        val plan = BandIndex.probeMaintained(spark, t, tomb, batch)
          .queryExecution.executedPlan
        val smjs = plan.collect { case j: SortMergeJoinExec => j }
        val idxJoin = smjs.find(j => hasLiveScan(j.left) || hasLiveScan(j.right))
          .getOrElse(fail(s"no sort-merge join over the live index in:\n$plan"))
        val idxSide = if (hasLiveScan(idxJoin.left)) idxJoin.left else idxJoin.right
        // the broadcast BUILD side may shuffle (the tombstone agg is
        // change-sized); the INDEX lineage itself must not
        def indexShuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
          p match {
            case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
              Seq.empty
            case e: ShuffleExchangeLike =>
              e.nodeName +: p.children.flatMap(indexShuffles)
            case _ => p.children.flatMap(indexShuffles)
          }
        assert(indexShuffles(idxSide).isEmpty,
          s"the tombstone-masked index lineage must not shuffle, was:\n$idxSide")
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)

      // compaction drops dead generations and folds the sidecar to
      // one row per doc — and changes nothing observable
      BandIndex.compactMaintained(spark, t, tomb)
      assertSame("after compaction")
      val folded = spark.read.parquet(tomb)
      assert(folded.count() == folded.select("doc_id").distinct().count(),
        "compaction must fold tombstones to one max-version row per doc")
      val postCompact = BandIndex.probeMaintained(spark, t, tomb, batch)
      assert(postCompact.exceptAll(viaFresh).isEmpty &&
        viaFresh.exceptAll(postCompact).isEmpty)

      // a span REPLAYED after compaction must not resurrect stale
      // bands: the kept tombstones mask its superseded appends, and
      // the only possible additions are duplicates of current content
      BandIndex.applyChangeFeed(spark, t, tomb,
        Merge.changeFeed(spark, root, 1, 2))
      val liveD = liveB.distinct()
      val freshD = freshBands.distinct()
      assert(liveD.exceptAll(freshD).isEmpty && freshD.exceptAll(liveD).isEmpty,
        "replay after compaction resurrected stale bands")
      val postReplay = BandIndex.probeMaintained(spark, t, tomb, batch)
      assert(postReplay.exceptAll(viaFresh).isEmpty &&
        viaFresh.exceptAll(postReplay).isEmpty,
        "replay after compaction changed the candidate set")
    } finally spark.conf.unset("spark.graft.merge.changeFeed")
  }
}

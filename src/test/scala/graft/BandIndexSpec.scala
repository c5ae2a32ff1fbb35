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
}

package graft

import graft.ml.MlMinHash
import graft.operators.MinHashLsh

/** Cross-check pillar B (MLlib LSH) against pillar A (DataFrame
  * pipeline) — both verify candidates with exact Jaccard, so both
  * have perfect precision; recall may differ by hash family. */
class MlMinHashSpec extends SparkSpec {

  test("mllib pairs agree with the DataFrame pipeline on sf0.001 (high recall both ways)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val a = MinHashLsh.similarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = MlMinHash.pairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.nonEmpty && b.nonEmpty)
    val overlapA = a.intersect(b).size.toDouble / a.size
    val overlapB = a.intersect(b).size.toDouble / b.size
    assert(overlapA >= 0.8, s"A-recall in B too low: $overlapA (A=${a.size}, B=${b.size})")
    assert(overlapB >= 0.8, s"B-recall in A too low: $overlapB")
  }

  test("AND-OR banded mllib pairs agree with the DataFrame pipeline (high recall both ways)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val a = MinHashLsh.similarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = MlMinHash.pairsBanded(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.nonEmpty && b.nonEmpty)
    val overlapA = a.intersect(b).size.toDouble / a.size
    val overlapB = a.intersect(b).size.toDouble / b.size
    assert(overlapA >= 0.8, s"A-recall in B too low: $overlapA (A=${a.size}, B=${b.size})")
    assert(overlapB >= 0.8, s"B-recall in A too low: $overlapB")
  }

  test("banded pillar-B admits far fewer candidates than OR-only on the same corpus") {
    // the scale claim behind removing the input cap: banding's
    // background admit rate (~(1-(1-J^r)^b)) must be a small fraction
    // of OR-only's (~1-(1-J)^tables ≈ 0.95 here)
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    val banded = MlMinHash.pairsBanded(docs, threshold = 0.0) // no verify cut: raw candidates
    assert(banded.count() < allPairs / 4,
      s"banding admitted ${banded.count()} of $allPairs pairs — not a candidate pruner")
  }

  test("annTopK: per-query probe returns k true-ish neighbors, self excluded") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val rows = MlMinHash.annTopK(docs, numNeighbors = 3, queryEvery = 50).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (qid, ns) =>
      assert(ns.length <= 3)
      assert(!ns.exists(_.getLong(1) == qid), s"query $qid returned itself")
    }
    // the planted near-dup of a query doc must surface as its top hit:
    // pick any verified pair whose smaller id is a query id
    val sim = MinHashLsh.similarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = sim.filter { case (l, _) => l % 50 == 0 }
    planted.foreach { case (q, dup) =>
      val hits = byQuery.get(q).toSeq.flatten.map(_.getLong(1)).toSet
      assert(hits.contains(dup), s"query $q missing planted near-dup $dup (got $hits)")
    }
  }

  test("annTopK: the driver-side query batch is capped at maxQueries (lowest ids)") {
    // r11 verdict: the collected query set must be corpus-size-
    // independent. queryEvery=1 makes every doc a query; the cap must
    // keep exactly `maxQueries` of them — the DETERMINISTIC lowest
    // doc_ids — so a 100x corpus still collects the same-sized batch.
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val n = docs.count()
    val cap = 4
    assert(n > cap, s"fixture too small for the cap test ($n docs)")
    val rows = MlMinHash.annTopK(docs, queryEvery = 1, maxQueries = cap).collect()
    val queryIds = rows.map(_.getLong(0)).toSet
    assert(queryIds.size == cap, s"expected $cap query ids, got ${queryIds.size}")
    val expected = docs.select("doc_id").collect().map(_.getLong(0)).sorted.take(cap).toSet
    assert(queryIds == expected,
      s"cap must keep the lowest doc_ids: got $queryIds, want $expected")
  }

  test("mllib pairs are deterministic under the fixed seed") {
    val docs = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "unrelated zzz qqq www")
    val p1 = MlMinHash.pairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = MlMinHash.pairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == p2)
  }
}

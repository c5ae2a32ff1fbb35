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

package graft

import graft.operators._

/** Degenerate-input behavior: empty corpus, single document, and
  * whitespace/empty text must flow through the core chains without
  * crashing and with sane (usually empty) output — the shapes a
  * 100 TB pipeline hits in stray partitions and fresh ingests. */
class EdgeCaseSpec extends SparkSpec {

  private val empty = docsDf()
  private val single = docsDf(1L -> "one lonely document with enough text in it")

  test("empty corpus: minhash chain yields empty frames, not errors") {
    assert(MinHashLsh.signatures(empty).count() == 0)
    assert(MinHashLsh.candidatePairs(empty).count() == 0)
    assert(MinHashLsh.similarPairs(empty).count() == 0)
    assert(MinHashLsh.collisionCounts(empty).count() == 0)
    assert(MinHashLsh.groupSketch(empty).count() == 0)
    assert(Shingling.shingleDict(empty).count() == 0)
  }

  test("empty corpus: dedup and analysis operators stay empty") {
    assert(Dedup.exactGroups(empty).count() == 0)
    assert(Dedup.nearDupKeep(empty).count() == 0)
    assert(TextAnalysis.simHash(empty).count() == 0)
    assert(TextAnalysis.tokenStats(empty).count() == 0)
    import org.apache.spark.sql.functions.{length, lit}
    assert(TrainingPipeline.kept(empty
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(empty("text")).cast("long"))).count() == 0)
  }

  test("empty corpus: catalog/diagnostic/codec operators define the zero-row contract") {
    import org.apache.spark.sql.functions.{length, lit}
    val s = spark
    import s.implicits._
    val emptyFull = empty
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(empty("text")).cast("long"))
    // ANALYZE on an empty table is NOT empty: one row per column with
    // n_rows = 0 (the engine/oracle divergence the r7 advice caught —
    // the oracle's GROUP BY dropped its rows, the engine's global
    // aggregate kept them; both now agree on this contract)
    val stats = CorpusStats.tableStats(emptyFull).collect()
    assert(stats.length == CorpusStats.StatsNumCols.size + CorpusStats.StatsStrCols.size)
    assert(stats.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.getAs[Long]("n_nulls") == 0L && r.getAs[Long]("n_distinct") == 0L))
    // diagnostics and the lossy-codec round trip stay empty, no errors
    val emptyEvents = Seq.empty[(Long, Long)].toDF("user_id", "event_id")
    assert(CorpusStats.skewReport(emptyEvents).count() == 0)
    assert(CorpusStats.bigramFluency(empty).count() == 0)
    assert(Multimodal.mjpegRoundTrip(empty).count() == 0)
  }

  test("single document: no self-pairs anywhere") {
    assert(MinHashLsh.signatures(single).count() == 1)
    assert(MinHashLsh.candidatePairs(single).count() == 0)
    assert(MinHashLsh.similarPairs(single).count() == 0)
    assert(Dedup.nearDupKeep(single).count() == 1)
  }

  test("empty and whitespace-only texts are dropped by the sketch, kept by token stats") {
    val docs = docsDf(1L -> "", 2L -> "   ", 3L -> "real content here")
    // empty text has no shingles -> no signature row; whitespace has
    // windows (spaces are characters in the reference semantics)
    val sigs = MinHashLsh.signatures(docs).collect().map(_.getLong(0)).toSet
    assert(sigs == Set(2L, 3L))
    assert(TextAnalysis.tokenStats(docs).count() == 3)
  }

  test("empty corpus: corpus-stats and selection operators stay empty") {
    import org.apache.spark.sql.functions.lit
    assert(CorpusStats.vocabTopK(empty).count() == 0)
    assert(CorpusStats.unigramScore(empty).count() == 0)
    assert(CorpusStats.chunkDedup(empty).count() == 0)
    assert(CorpusStats.containmentPairs(empty).count() == 0)
    assert(CorpusStats.sourceOverlap(empty.withColumn("source", lit("s"))).count() == 0)
    assert(Sampling.budgetSelect(empty).count() == 0)
    assert(Sampling.mixtureSample(empty.withColumn("source", lit("s"))).count() == 0)
  }

  test("short texts: containment and chunk dedup handle docs below the gram size") {
    // "a b" has no trigram; "x" no tokens beyond one; none may crash
    val docs = docsDf(1L -> "a b", 2L -> "x", 3L -> "", 4L -> "p q r s t u v w")
    assert(CorpusStats.containmentPairs(docs).count() == 0)
    // chunk dedup keeps the non-empty docs' chunks (1 chunk each)
    val kept = CorpusStats.chunkDedup(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 2L, 4L))
    // budget select includes zero/low-token docs without dividing by zero
    assert(Sampling.budgetSelect(docs, budgetTokens = 100L).count() == 4)
  }
}

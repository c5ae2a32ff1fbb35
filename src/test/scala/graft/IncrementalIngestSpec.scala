package graft

import graft.operators.{IncrementalIngest, MinHashLsh}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalIngestSpec extends SparkSpec {

  private val a = "the quick brown fox jumps over the lazy dog again and again"
  private val b = "a completely different sentence about distributed query engines"
  private val c = "yet another unrelated document concerning parquet column pruning"

  test("filterBatch drops corpus near-dups and within-batch dups, keeps novel docs") {
    val corpus = docsDf(1L -> a, 2L -> b)
    val corpusBands = MinHashLsh.bands(corpus)
    // batch: near-dup of corpus doc 1, a novel doc, and an exact dup
    // of that novel doc (within-batch pair -> min id 11 survives)
    val batch = docsDf(10L -> a, 11L -> c, 12L -> c)
    val kept = IncrementalIngest.filterBatch(batch, corpusBands, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
  }

  test("filterBatch with empty corpus keeps all non-duplicate batch docs") {
    val empty = docsDf()
    val kept = IncrementalIngest.filterBatch(
        docsDf(1L -> a, 2L -> b), MinHashLsh.bands(empty), empty)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("streaming ingest loop: second batch deduped against the first's persisted state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("graft-ingest").toString
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().select($"_1".as("doc_id"), $"_2".as("text"))
    val q = IncrementalIngest.ingestDedupStream(
      docs, s"$dir/corpus", s"$dir/index", s"$dir/ckpt")
    try {
      input.addData((1L, a), (2L, b))
      q.processAllAvailable()
      // batch 2: dup of persisted doc 1 + a novel doc
      input.addData((10L, a), (11L, c))
      q.processAllAvailable()
      val corpus = s.read.parquet(s"$dir/corpus").collect()
        .map(_.getLong(0)).toSet
      assert(corpus == Set(1L, 2L, 11L))
      // the index grew in lockstep: Bands rows per surviving doc
      val index = s.read.parquet(s"$dir/index")
      assert(index.select("doc_id").distinct().collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L, 11L))
      assert(index.count() == 3L * Config.Bands)
    } finally q.stop()
  }

  test("ingest replay is idempotent: re-running a batch overwrites, never duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("graft-ingest-replay").toString
    def runOnce(ckpt: String): Unit = {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().select($"_1".as("doc_id"), $"_2".as("text"))
      val q = IncrementalIngest.ingestDedupStream(
        docs, s"$dir/corpus", s"$dir/index", ckpt)
      try {
        input.addData((1L, a), (2L, b), (3L, a)) // 3 is a within-batch dup of 1
        q.processAllAvailable()
      } finally q.stop()
    }
    runOnce(s"$dir/ckpt1")
    // fresh checkpoint = the engine re-delivers the SAME data as
    // batch 0 against stores that already hold batch 0's partial (here:
    // complete) writes — exactly the at-least-once replay shape
    runOnce(s"$dir/ckpt2")
    val corpus = s.read.parquet(s"$dir/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(corpus.sorted == Seq(1L, 2L)) // no duplicates from the replay
    val index = s.read.parquet(s"$dir/index")
    assert(index.count() == 2L * Config.Bands)
  }
}

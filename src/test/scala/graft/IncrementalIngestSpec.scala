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

  test("crash replay: partial write between the two store writes converges on restart") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ingest-crash").toString
    def batchDf(rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
    // clean reference run: two batches straight through
    IncrementalIngest.ingestBatch(batchDf(1L -> a, 2L -> b), 0L,
      s"$dir/ref/corpus", s"$dir/ref/index")
    IncrementalIngest.ingestBatch(batchDf(10L -> a, 11L -> c), 1L,
      s"$dir/ref/corpus", s"$dir/ref/index")
    // crashing run: batch 1's corpus partition lands but the process
    // dies BEFORE the index write (simulated by deleting the index
    // partition the run would have written) — then the engine
    // re-delivers batch 1 after restart
    IncrementalIngest.ingestBatch(batchDf(1L -> a, 2L -> b), 0L,
      s"$dir/crash/corpus", s"$dir/crash/index")
    IncrementalIngest.ingestBatch(batchDf(10L -> a, 11L -> c), 1L,
      s"$dir/crash/corpus", s"$dir/crash/index")
    val lostPartition = new java.io.File(s"$dir/crash/index/ingest_batch=1")
    assert(lostPartition.exists())
    lostPartition.listFiles().foreach(_.delete())
    assert(lostPartition.delete())
    IncrementalIngest.ingestBatch(batchDf(10L -> a, 11L -> c), 1L,
      s"$dir/crash/corpus", s"$dir/crash/index") // the replay
    // bit-identical stores vs the clean run
    def dump(path: String): Seq[String] =
      s.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(dump(s"$dir/crash/corpus") == dump(s"$dir/ref/corpus"))
    assert(dump(s"$dir/crash/index") == dump(s"$dir/ref/index"))
  }

  test("readOr surfaces non-path analysis errors instead of re-ingesting everything") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ingest-badstore").toString
    // a "corpus" store that exists but is NOT parquet: the read fails
    // with an analysis error that must propagate, not read as empty
    Files.createDirectory(java.nio.file.Paths.get(s"$dir/corpus"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/corpus/garbage.txt"), "not parquet")
    val e = intercept[Exception] {
      IncrementalIngest.ingestBatch(Seq(1L -> a).toDF("doc_id", "text"), 0L,
        s"$dir/corpus", s"$dir/index")
    }
    assert(!e.isInstanceOf[java.util.NoSuchElementException],
      s"store corruption must not be silently treated as an empty corpus: $e")
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

  test("mergeSchema unifies landing batches across a schema evolution") {
    import org.apache.spark.sql.functions._
    val merged = IncrementalIngest.evolvedIngestStats(spark, Sf0001)
    // pre-evolution rows surface as the null-filled bucket; both eras
    // are present and nothing is dropped by the schema difference
    val total = merged.agg(sum("n_docs")).head().getLong(0)
    assert(total == spark.read.parquet(s"$Sf0001/documents.parquet").count())
    assert(merged.filter(col("lang_merged") === "pre_evolution").count() == 1)
    assert(merged.filter(col("lang_merged") =!= "pre_evolution").count() >= 2,
      "post-evolution rows must keep their real lang values")
  }
}

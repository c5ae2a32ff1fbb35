package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._

class StreamingSinkSpec extends SparkSpec {

  test("checkpointed parquet sink read-back equals the batch projection") {
    val out = graft.streaming.StreamingQueries.streamToParquet(spark, Sf0001)
    val batch = graft.operators.TextAnalysis.tokenStats(
      spark.read.parquet(s"$Sf0001/documents.parquet").select("doc_id", "text"))
      .select("doc_id", "n_tokens", "n_distinct_tokens", "chars_no_space",
        "avg_token_len")
    assert(out.count() > 0)
    assert(out.except(batch).isEmpty && batch.except(out).isEmpty)
  }

  test("compacting the streaming sink folds its files and changes no row") {
    val out = graft.streaming.StreamingQueries.streamToParquet(spark, Sf0001)
    val compacted = graft.streaming.StreamingQueries.streamCompacted(spark, Sf0001)
    assert(compacted.exceptAll(out).isEmpty && out.exceptAll(compacted).isEmpty,
      "the rewrite must preserve the exact multiset of rows")
    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    // the sink lands >= one file per micro-batch task; the bin-pack
    // must strictly fold them (sf0.001 fits one target file)
    assert(files(compacted) < files(out),
      s"compaction did not reduce files: ${files(out)} -> ${files(compacted)}")
  }

  test("parquet sink is exactly-once across an interrupted restart") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-sink-eo")
    val in = Files.createDirectory(root.resolve("in"))
    // three single-file chunks = three micro-batches at maxFilesPerTrigger=1
    // (staged then moved: the file source watches flat files, not subdirs)
    (0 until 3).foreach { j =>
      val stage = root.resolve(s"stage_$j")
      (0 until 50).map(i => (j * 50L + i, s"doc $j $i")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, in.resolve(s"chunk_$j.parquet"))
    }
    def start() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"))
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .writeStream.format("parquet")
      .option("path", root.resolve("out").toString)
      .option("checkpointLocation", root.resolve("cp").toString)
      .outputMode("append").start()
    // run 1: stop as soon as at least one batch has committed — an
    // interrupted landing job
    val q1 = start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    // run 2: same checkpoint — must pick up where run 1 committed
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(root.resolve("out").toString)
    // no row lost, no row duplicated, despite the mid-run kill: the
    // _spark_metadata commit log exposes exactly the committed files
    assert(got.count() == 150, s"expected 150 rows, got ${got.count()}")
    assert(got.select("doc_id").distinct().count() == 150)
  }
}

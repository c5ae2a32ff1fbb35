package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.EventsOps

/** Driver-checkable STREAMING queries: each runs a real Structured
  * Streaming query (MemoryStream source → the StreamingOps transform
  * → memory sink) over the round's parquet input, fed in several
  * micro-batches so the incremental/stateful path is genuinely
  * exercised, then returns the materialized result as a plain
  * DataFrame for the DuckDB oracle to replay with batch SQL.
  *
  * This is the `ingest_filter` pattern generalized: streaming
  * semantics chosen so the final materialized state equals a batch
  * computation (complete-mode aggregation; append-mode emission of
  * pairs whose membership is arrival-order independent).
  *
  * The driver-side `collect()` feeding the MemoryStream is harness
  * scaffolding, not operator design — a production deployment reads
  * from a real source (Kafka/files); the transforms under test are
  * identical either way.
  */
object StreamingQueries {

  private def feed[A](input: MemoryStream[A], rows: Seq[A], nChunks: Int,
                      process: () => Unit): Unit =
    rows.grouped(math.max(1, rows.length / nChunks)).foreach { chunk =>
      input.addData(chunk)
      process() // one micro-batch per chunk: state carries across batches
    }

  /** Tumbling-window counts per event type, computed by the
    * STREAMING windowCounts (watermark + window aggregation) in
    * complete output mode — state is never evicted, so the final
    * table equals the batch GROUP BY whatever the arrival order.
    * Output keys are integer epoch micros (timestamp columns don't
    * hash portably across engines). */
  def streamWindowCounts(spark: SparkSession, sfDir: String,
                         nChunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = events
      .select(col("event_type"), EventsOps.microsCol(events).as("us"), col("value"))
      .as[(String, Long, Double)].collect().toIndexedSeq
    val input = MemoryStream[(String, Long, Double)]
    val stream = input.toDF().toDF("event_type", "us", "value")
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val name = "graft_stream_window_counts"
    val q = StreamingOps.windowCounts(stream).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try feed(input, rows, nChunks, () => q.processAllAvailable())
    finally q.stop()
    spark.table(name).select(
      unix_micros(col("window_start")).as("window_start_us"),
      col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Near-duplicate pairs discovered ONLINE by nearDupStream (the
    * per-bucket stateful membership operator): docs arrive in doc_id
    * order across several micro-batches; a pair is emitted the
    * moment its second member arrives. With an uncapped bucket the
    * emitted set equals the batch band-collision candidates verified
    * at exact hash-set Jaccard >= threshold — order-independent, so
    * batch SQL replays it. A pair colliding in several buckets is
    * emitted once per bucket; the final dropDuplicates is sink-side
    * dedup (jaccard is a function of the pair, so rows agree). */
  def streamNearDup(spark: SparkSession, sfDir: String,
                    nChunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).toIndexedSeq
    val input = MemoryStream[(Long, String)]
    val name = "graft_stream_near_dup"
    val q = StreamingOps.nearDupStream(input.toDS(), maxBucket = Int.MaxValue)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try feed(input, docs, nChunks, () => q.processAllAvailable())
    finally q.stop()
    spark.table(name).dropDuplicates("id_l", "id_r")
      .select("id_l", "id_r", "jaccard")
  }
}

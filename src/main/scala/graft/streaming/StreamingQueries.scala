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
  * The driver-side `collect()` feeding a MemoryStream is harness
  * scaffolding, not operator design — a production deployment reads
  * from a real source (Kafka/files); the transforms under test are
  * identical either way. Two queries (stream_exact_dedup,
  * stream_pipeline) instead use a real FILE source via
  * [[runDedupFeedFileQuery]] — executor-written parquet chunks
  * replayed with readStream + maxFilesPerTrigger=1 — so that path
  * has NO corpus-sized driver transfer at all.
  */
object StreamingQueries {

  private def feed[A](input: MemoryStream[A], rows: Seq[A], nChunks: Int,
                      process: () => Unit): Unit =
    rows.grouped(math.max(1, rows.length / nChunks)).foreach { chunk =>
      input.addData(chunk)
      process() // one micro-batch per chunk: state carries across batches
    }

  /** Run a streaming harness query under a SMALL state partitioning:
    * stateful operators create one state store per shuffle partition
    * per side per micro-batch, so a batch session's 32-partition
    * default multiplies store setup/commit cost by 4-8× for zero
    * benefit at harness data sizes (state partitioning is a
    * deployment choice pinned at first checkpoint — a production
    * stream sizes it to throughput, a test harness to overhead). */
  private def withStatePartitions[A](spark: SparkSession, n: Int = 8)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
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
    withStatePartitions(spark) {
      val q = StreamingOps.windowCounts(stream).writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      try feed(input, rows, nChunks, () => q.processAllAvailable())
      finally q.stop()
    }
    spark.table(name).select(
      unix_micros(col("window_start")).as("window_start_us"),
      col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Native session windows computed by the STREAMING sessionWindows
    * (watermark + session_window aggregation) in append output mode.
    * Append emits a session only once the watermark passes its end,
    * so after the time-ordered feed two far-future sentinel events
    * (filtered from the output) advance the watermark and flush every
    * real session: the sentinel batch raises the max event time, and
    * the batch after it runs with the advanced watermark. Empirically
    * session_window merges events at EXACTLY gap distance (an event
    * at last+gap extends the session), i.e. a new session starts iff
    * the gap is strictly exceeded — the oracle replays that with
    * lag()-over-user chaining. Output keys are integer epoch micros. */
  def streamSessionWindows(spark: SparkSession, sfDir: String,
                           nChunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = events
      .select(col("user_id"), EventsOps.microsCol(events).as("us"), col("value"))
      .as[(Long, Long, Double)].collect().sortBy(_._2).toIndexedSeq
    val maxUs = rows.last._2
    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("user_id", "us", "value")
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val name = "graft_stream_session_windows"
    withStatePartitions(spark) {
      val q = StreamingOps.sessionWindows(stream).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        feed(input, rows, nChunks, () => q.processAllAvailable())
        Seq(1, 2).foreach { i =>
          input.addData((-i.toLong, maxUs + i * 4L * 3600 * 1000000L, 0.0))
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(name).filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
  }

  /** Stream-static enrichment: each streaming event joined to its
    * user's customer-dimension row (events.user_id is a c_custkey).
    * Stateless — every micro-batch broadcasts the dim and emits its
    * enriched rows, so the final table equals the batch left join
    * whatever the chunking. */
  def streamEnrich(spark: SparkSession, sfDir: String,
                   nChunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect().sortBy(_._1).toIndexedSeq
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"), col("c_nationkey"))
    val input = MemoryStream[(Long, Long, String, Double)]
    val stream = input.toDF().toDF("event_id", "user_id", "event_type", "value")
    val name = "graft_stream_enrich"
    withStatePartitions(spark) {
      val q = StreamingOps.enrichStream(stream, dim).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try feed(input, rows, nChunks, () => q.processAllAvailable())
      finally q.stop()
    }
    spark.table(name).select("event_id", "user_id", "event_type", "value",
      "c_mktsegment", "c_nationkey")
  }

  /** Stream-STREAM interval join (rangeJoinStream): purchases joined
    * to the same user's clicks in the preceding 600 s. Both streams
    * are fed in lockstep over ALIGNED TIME windows (not row counts):
    * every click with m_ts <= a target's ts arrives in the same
    * micro-batch as the target or earlier, so with the default
    * 30-minute watermark (>> the 600 s join window) no buffered row
    * is evicted before its partner arrives and the inner-join output
    * equals the batch interval join exactly. */
  def streamRangeJoin(spark: SparkSession, sfDir: String,
                      nChunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val all = events
      .select(col("user_id"), col("event_id"), EventsOps.microsCol(events).as("us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val targets = all.filter(_._4 == "purchase").sortBy(_._3)
    val matches = all.filter(_._4 == "click").sortBy(_._3)
    val lo = all.iterator.map(_._3).min
    val step = math.max(1L, (all.iterator.map(_._3).max - lo) / nChunks + 1)
    val tIn = MemoryStream[(Long, Long, Long)]
    val mIn = MemoryStream[(Long, Long, Long)]
    def asDf(in: MemoryStream[(Long, Long, Long)]): DataFrame =
      in.toDF().toDF("user_id", "event_id", "us")
        .withColumn("ts_ts", timestamp_micros(col("us"))).drop("us")
    val name = "graft_stream_range_join"
    withStatePartitions(spark) {
      val q = StreamingOps.rangeJoinStream(asDf(tIn), asDf(mIn)).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try (0 until nChunks).foreach { j =>
        val a = lo + j * step
        val b = a + step
        tIn.addData(targets.filter(r => r._3 >= a && r._3 < b).map(r => (r._1, r._2, r._3)).toSeq)
        mIn.addData(matches.filter(r => r._3 >= a && r._3 < b).map(r => (r._1, r._2, r._3)).toSeq)
        q.processAllAvailable()
      } finally q.stop()
    }
    spark.table(name).select(col("user_id"), col("target_id"), col("match_id"),
      unix_micros(col("ts_ts")).as("target_us"),
      unix_micros(col("m_ts")).as("match_us"))
  }

  /** FILE-SOURCE dedup feed + query runner: builds the doc∪copy feed
    * (the documents table, then an exact COPY of every text under a
    * shifted doc_id — originals at (3600+id) s, copies offset
    * (n+100) s past them, well inside the 1 h dedup watermark at the
    * oracle sf) ENTIRELY executor-side, writes it as `nChunks`
    * single-file parquet chunks covering disjoint ascending
    * event-time ranges, and replays them through a real
    * `readStream.parquet` source with maxFilesPerTrigger=1 — one
    * micro-batch per chunk, in mtime order, state carried across
    * batches. Unlike the MemoryStream harness used by the other
    * stream queries, the corpus NEVER passes through the driver:
    * this is the shape a production deployment uses (tail a landing
    * directory). The only driver-side values are the doc count (one
    * scalar agg, sizes the copy offset) and file moves.
    *
    * Determinism: a copy always lands >= 2 chunks after its original
    * — the copy offset (n+100) s exceeds the chunk width
    * ~(2n+100)/nChunks s for any nChunks >= 2 — so no original/copy
    * pair ever shares a micro-batch, and chunk ranges ascend so no
    * row is ever late for the watermark. */
  private def runDedupFeedFileQuery(spark: SparkSession, sfDir: String,
                                    nChunks: Int, name: String)
                                   (transform: DataFrame => DataFrame): DataFrame = {
    import java.nio.file.{Files, Path}
    import java.nio.file.attribute.FileTime
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val feedDf = docs.select(col("doc_id"), col("text"),
        ((col("doc_id") + 3600L) * 1000000L).as("us"))
      .unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        ((col("doc_id") + 3700L + n) * 1000000L).as("us")))
    val root = Files.createTempDirectory("graft_feed_")
    val watch = Files.createDirectory(root.resolve("in"))
    try {
      val lo = 3600L * 1000000L
      val hi = (3700L + 2 * n) * 1000000L
      val step = (hi - lo) / nChunks + 1
      val baseMs = System.currentTimeMillis()
      (0 until nChunks).foreach { j =>
        val stage = root.resolve(s"stage_$j")
        feedDf.filter(col("us") >= lo + j * step && col("us") < lo + (j + 1) * step)
          .repartition(1).write.mode("overwrite").parquet(stage.toString)
        val part = Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst.orElseThrow(() => new IllegalStateException(s"no part file in $stage"))
        val tgt = watch.resolve(f"chunk-$j%04d.parquet")
        Files.move(part, tgt)
        // strictly increasing mtimes pin FileStreamSource's pick order
        Files.setLastModifiedTime(tgt, FileTime.fromMillis(baseMs + j * 2000L))
      }
      val stream = spark.readStream.schema(feedDf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(watch.toString)
        .withColumn("ts_ts", timestamp_micros(col("us")))
      withStatePartitions(spark) {
        val q = transform(stream).writeStream
          .format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      spark.table(name)
    } finally {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Streaming exact dedup over the doc∪copy FILE feed: every shifted
    * copy is dropped by dropDuplicatesWithinWatermark state carried
    * across micro-batches; the kept set is exactly the original
    * documents (replayed by batch SQL over the documents table). */
  def streamExactDedup(spark: SparkSession, sfDir: String,
                       nChunks: Int = 4): DataFrame =
    runDedupFeedFileQuery(spark, sfDir, nChunks, "graft_stream_exact_dedup")(
      StreamingOps.exactDedupStream(_))
      .select(col("doc_id"), unix_micros(col("ts_ts")).as("us"), col("text_md5"))

  /** The full streaming training pipeline (exact dedup → quality gate
    * → deterministic hash sample) over the same doc∪copy FILE feed:
    * the copies prove the stateful dedup stage, and the row-local
    * gate + sample are bit-identical to the batch predicates, so the
    * kept set is replayed by the batch gates over the documents
    * table. */
  def streamPipeline(spark: SparkSession, sfDir: String,
                     nChunks: Int = 4): DataFrame =
    runDedupFeedFileQuery(spark, sfDir, nChunks, "graft_stream_pipeline")(
      StreamingOps.pipelineStream(_))
      .select(col("doc_id"), unix_micros(col("ts_ts")).as("us"),
        col("n_chars"), col("n_tokens"))

  /** Custom-state sessionization (flatMapGroupsWithState with an
    * event-time timeout) over the real events stream: sessions close
    * either when a later same-user event exceeds the gap or when the
    * watermark times the state out. Two far-future sentinel events
    * (dropped from the output) advance the watermark so every open
    * session flushes; the feed is globally time-ordered so no event
    * is late. The gap comparison is in MICROseconds (`diff > gap`
    * starts a new session), replayed by lag()-chaining in the oracle. */
  def streamSessionize(spark: SparkSession, sfDir: String,
                       nChunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = events
      .select(col("user_id"), col("event_id"), EventsOps.microsCol(events).as("us"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._3, r._2))
      .map(r => StreamingOps.SessionEvent(r._1, r._2, r._3, r._4)).toIndexedSeq
    val maxUs = rows.iterator.map(_.us).max
    val input = MemoryStream[StreamingOps.SessionEvent]
    val name = "graft_stream_sessionize"
    withStatePartitions(spark) {
      val q = StreamingOps.sessionizeStateful(input.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        feed(input, rows, nChunks, () => q.processAllAvailable())
        Seq(1, 2).foreach { i =>
          input.addData(StreamingOps.SessionEvent(-i.toLong, 0L,
            maxUs + i * 4L * 3600 * 1000000L, 0.0))
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    spark.table(name).filter(col("user_id") >= 0)
      .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
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
    // 16, not the harness-default 8: unlike the store-bound harness
    // queries, this one does real CPU work INSIDE the stateful op
    // (per-bucket exact-Jaccard verify) plus rowwise banding before
    // the shuffle, so partitions = cores-for-verify. Measured sf0.1
    // steady-state: 7.3 s @ 8, 5.7 s @ 16, 5.9 s @ 32 (the r4 5.8 →
    // 8.6 regression was exactly this knob dropping 32 → 8).
    withStatePartitions(spark, 16) {
      val q = StreamingOps.nearDupStream(input.toDS(), maxBucket = Int.MaxValue)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try feed(input, docs, nChunks, () => q.processAllAvailable())
      finally q.stop()
    }
    spark.table(name).dropDuplicates("id_l", "id_r")
      .select("id_l", "id_r", "jaccard")
  }
}

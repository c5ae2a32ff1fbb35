package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.EventsOps
import graft.streaming.StreamingQueries

/** End-to-end checks of the driver-facing STREAMING queries: each
  * wrapper runs a real multi-micro-batch Structured Streaming query
  * over sf0.001 parquet; the result must equal the equivalent BATCH
  * computation (the same equivalence the DuckDB oracle replays at
  * sf0.01).
  */
class StreamingQueriesSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(r.get)).sortBy(_.mkString("|")).toIndexedSeq
  }

  private def assertSameAs(streamed: DataFrame, batch: DataFrame): Unit = {
    val s = canon(streamed)
    val b = canon(batch)
    assert(s.length == b.length, s"rows: streamed=${s.length} batch=${b.length}")
    s.zip(b).zipWithIndex.foreach { case ((l, r), i) => assert(l == r, s"row $i: $l != $r") }
  }

  private def eventsUs: DataFrame = {
    val e = spark.read.parquet(s"$Sf0001/events.parquet")
    e.withColumn("us", EventsOps.microsCol(e))
  }

  private def sessionsBatch(startExpr: String, endExpr: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    eventsUs
      .withColumn("c", round(col("value") * 100, 0).cast("long"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("ns",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("min_us"),
        max(col("us")).as("max_us"), sum(col("c")).as("cents"))
      .select(col("user_id"), expr(startExpr).as("s"), expr(endExpr).as("e"),
        col("n_events"), (col("cents").cast("double") / 100.0).as("sum_value"))
  }

  test("stream_session_windows equals batch gap-chained sessions (end = last + gap)") {
    assertSameAs(
      StreamingQueries.streamSessionWindows(spark, Sf0001),
      sessionsBatch("min_us", "max_us + 1800000000")
        .toDF("user_id", "session_start_us", "session_end_us", "n_events", "sum_value"))
  }

  test("stream_sessionize equals batch gap-chained sessions (second-floored bounds)") {
    assertSameAs(
      StreamingQueries.streamSessionize(spark, Sf0001),
      sessionsBatch("min_us div 1000000", "max_us div 1000000")
        .toDF("user_id", "start_sec", "end_sec", "n_events", "sum_value"))
  }

  test("stream_enrich equals the batch left join to the customer dim") {
    val batch = eventsUs.join(
        spark.read.parquet(s"$Sf0001/customer.parquet")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"), col("c_nationkey")),
        Seq("user_id"), "left")
      .select("event_id", "user_id", "event_type", "value", "c_mktsegment", "c_nationkey")
    assertSameAs(StreamingQueries.streamEnrich(spark, Sf0001), batch)
  }

  test("stream_range_join equals the batch one-sided interval join") {
    val e = eventsUs
    val t = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("target_id"), col("us").as("target_us"))
    val m = e.filter(col("event_type") === "click")
      .select(col("user_id").as("m_user"), col("event_id").as("match_id"),
        col("us").as("match_us"))
    val batch = t.join(m, col("user_id") === col("m_user") &&
        col("match_us") >= col("target_us") - 600000000L &&
        col("match_us") <= col("target_us"))
      .select("user_id", "target_id", "match_id", "target_us", "match_us")
    assertSameAs(StreamingQueries.streamRangeJoin(spark, Sf0001), batch)
  }

  test("stream_asof_join equals the batch as-of join (nulls included)") {
    val batch = EventsOps.asOfJoin(spark.read.parquet(s"$Sf0001/events.parquet"))
    val streamed = StreamingQueries.streamAsOfJoin(spark, Sf0001)
    // targets with no preceding click must still appear, with nulls
    assert(batch.filter(col("prev_match_id").isNull).count() ==
      streamed.filter(col("prev_match_id").isNull).count())
    assertSameAs(streamed, batch)
  }

  test("stream_exact_dedup keeps exactly the original documents (copies dropped)") {
    val batch = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), ((col("doc_id") + 3600) * 1000000L).as("us"),
        md5(col("text")).as("text_md5"))
    assertSameAs(StreamingQueries.streamExactDedup(spark, Sf0001), batch)
  }

  test("stream_exact_dedup is deterministic when the corpus itself holds duplicate texts") {
    // duplicate texts WITHIN the corpus raced intra-batch in
    // dropDuplicatesWithinWatermark before the feed kept only the
    // min-id representative per text — plant duplicates (incl. a
    // sparse-id pair) and require exactly the min-id survivors
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dup-corpus").toString
    Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta"),   // dup of 0
      (3L, "iota kappa lambda mu"),
      (900000L, "epsilon zeta eta theta")) // sparse-id dup of 1
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = StreamingQueries.streamExactDedup(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 1L, 3L),
      s"kept $kept — must be exactly the min-id representative per distinct text")
  }

  test("stream_pipeline equals the batch quality gate + hash sample over originals") {
    val (a, b) = Config.coeffs(0)
    val toks = graft.operators.TextAnalysis.tokensCol(col("text"))
    val stop = Seq("the", "a", "of", "in", "and")
    val batch = spark.read.parquet(s"$Sf0001/documents.parquet")
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_types", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stopwords", size(filter(toks, t => t.isin(stop: _*))).cast("long"))
      .filter(col("n_tokens") >= 5 && col("n_chars") >= 20 && col("n_chars") <= 10000 &&
        col("n_stopwords") * 2 <= col("n_tokens") &&
        col("n_types") * 10 >= col("n_tokens") * 3)
      .filter(((lit(a) * col("doc_id") + lit(b)) % lit(Config.P)) % 100 < 10)
      .select(col("doc_id"), ((col("doc_id") + 3600) * 1000000L).as("us"),
        col("n_chars"), col("n_tokens"))
    assertSameAs(StreamingQueries.streamPipeline(spark, Sf0001), batch)
  }

  test("stream_heavy_hitters: the micro-batch-merged CMS grid probes bit-identically to batch") {
    val batch = graft.operators.CorpusStats.heavyHitters(
      spark.read.parquet(s"$Sf0001/documents.parquet"))
    assertSameAs(StreamingQueries.streamHeavyHitters(spark, Sf0001), batch)
  }

  test("stream_cdc_merge: the continuously-maintained table equals the batch latest-wins merge") {
    val batch = graft.operators.ChangeData.cdcMerge(
      spark.read.parquet(s"$Sf0001/documents.parquet"))
    assertSameAs(StreamingQueries.streamCdcMerge(spark, Sf0001), batch)
  }

  test("stream_merge: the snapshot table maintained by foreachBatch equals pure merge semantics") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val batch = docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("n_chars",
        when(col("doc_id") % 11 === 0 || col("doc_id") % 7 === 0,
          col("n_chars") + 7).otherwise(col("n_chars")))
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [rev2]")))
          .when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev1]")))
          .otherwise(col("text")))
      .select("doc_id", "lang", "source", "n_chars", "text")
    assertSameAs(StreamingQueries.streamMerge(spark, Sf0001), batch)
  }

  test("stream_merge's writer is exactly-once: a replayed micro-batch never re-applies") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_smerge_replay").toString
    def batchDf(rows: (Long, String, Long, String)*) =
      rows.toDF("doc_id", "text", "version", "op")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "lang", "source", "n_chars", "text", "version", "op")
    StreamingQueries.applyMergeBatch(
      batchDf((1L, "one", 0L, "I"), (2L, "two", 0L, "I")), root, 0L)
    StreamingQueries.applyMergeBatch(
      batchDf((1L, "one v2", 1L, "U"), (2L, "", 1L, "D")), root, 1L)
    val after = graft.sources.Merge.readCurrent(spark, root)
    assert(after.count() == 1 &&
      after.select("text").head().getString(0) == "one v2")
    val version = graft.sources.Snapshots.current(spark, root).get.version
    // the at-least-once replays Structured Streaming can deliver on
    // restart: the SAME batch again, and an older one — both no-ops
    StreamingQueries.applyMergeBatch(
      batchDf((1L, "one v2", 1L, "U"), (2L, "", 1L, "D")), root, 1L)
    StreamingQueries.applyMergeBatch(
      batchDf((1L, "one", 0L, "I"), (2L, "two", 0L, "I")), root, 0L)
    assert(graft.sources.Snapshots.current(spark, root).get.version == version,
      "replayed batches must not commit new versions")
    val again = graft.sources.Merge.readCurrent(spark, root)
    assert(again.count() == 1 &&
      again.select("text").head().getString(0) == "one v2")
  }

  test("CDC in, change feed out: replayed micro-batches log no duplicate feed entries") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_smerge_cdf").toString
    spark.conf.set("spark.graft.merge.changeFeed", "true")
    try {
      def batchDf(rows: (Long, String, Long, String)*) =
        rows.toDF("doc_id", "text", "version", "op")
          .withColumn("lang", lit("en")).withColumn("source", lit("t"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .select("doc_id", "lang", "source", "n_chars", "text", "version", "op")
      StreamingQueries.applyMergeBatch(
        batchDf((1L, "one", 0L, "I"), (2L, "two", 0L, "I")), root, 0L) // v1 bootstrap
      StreamingQueries.applyMergeBatch(
        batchDf((1L, "one v2", 1L, "U"), (2L, "", 1L, "D")), root, 1L) // v2: update+delete
      // at-least-once replays: the exactly-once writer must also keep
      // the CHANGE LOG exactly-once (a re-merge would double it)
      StreamingQueries.applyMergeBatch(
        batchDf((1L, "one v2", 1L, "U"), (2L, "", 1L, "D")), root, 1L)
      StreamingQueries.applyMergeBatch(
        batchDf((1L, "one", 0L, "I"), (2L, "two", 0L, "I")), root, 0L)
      StreamingQueries.applyMergeBatch(
        batchDf((3L, "three", 2L, "U")), root, 2L) // v3: insert
      val feedDir = java.nio.file.Files.createTempDirectory("graft_smerge_feed").toString
      assert(graft.sources.Merge.publishChangeFeed(spark, root, feedDir) == 2)
      val q = graft.sources.Merge.streamChangeFeed(spark, root, feedDir)
        .writeStream.format("memory").queryName("cdc_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val out = spark.sql(
        "select doc_id, _change_type, _commit_version from cdc_out")
        .as[(Long, String, Int)].collect()
      assert(out.length == out.toSet.size, "feed must hold no duplicates")
      assert(out.toSet == Set(
        (1L, "update_preimage", 2), (1L, "update_postimage", 2),
        (2L, "delete", 2), (3L, "insert", 3)), s"got ${out.toSet}")
    } finally spark.conf.unset("spark.graft.merge.changeFeed")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MinHashLsh

/** BUCKETED persisted LSH band index — the storage layout that makes
  * continuous dedup cheap at 100 TB. The incremental pipeline
  * ([[graft.operators.IncrementalIngest]], q:`incremental_pairs`)
  * probes every arriving batch against the corpus band index; with
  * the index as a flat table that probe re-shuffles BOTH sides on
  * (band, band_key) every batch — i.e. the multi-TB index pays a
  * full exchange per micro-batch forever. Written bucketed on the
  * join key instead, the index scan reports its hash partitioning
  * to the planner, so the per-batch join plans with an Exchange on
  * the BATCH side only (batch-sized, by definition small) and the
  * index is never shuffled again after the one write.
  *
  * Same discipline as [[Bucketed]]: the layout changes where bytes
  * live, never what the probe returns — q:`incremental_pairs_bucketed`
  * shares q:`incremental_pairs`'s oracle verbatim, and BandIndexSpec
  * asserts the zero-exchange-on-index plan shape.
  */
object BandIndex {

  /** Bucket sizing — the production rule the sf0.5 word-salad
    * measurement taught (DESIGN "Scale pass 4"): a bucketed join
    * runs at the table's FIXED bucket count with AQE skew-splitting
    * disabled, so the count must grow with the corpus or a large
    * probe funnels through too few sorted streams. One band row per
    * corpus doc per band, so corpus docs are the driver; floor 8
    * keeps small corpora multi-file, the cap bounds catalog size. */
  val DocsPerBucket = 1000L
  val MinBuckets = 8
  val MaxBuckets = 4096

  def bucketsFor(corpusDocs: Long): Int =
    math.max(MinBuckets.toLong,
      math.min(MaxBuckets.toLong,
        (corpusDocs + DocsPerBucket - 1) / DocsPerBucket)).toInt


  private def tag(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Stop-band cap used by the capped index variant — the same 20
    * as candidate_pairs_capped (max sf0.01 bucket is 58, so the cap
    * genuinely bites at the oracle sf). */
  val DefaultMaxBucket = 20

  /** Write the corpus band index ONCE, bucketed + sorted on the probe
    * key. With `maxBucket` set, degenerate band buckets (occupancy >
    * cap) are dropped AT BUILD TIME — stop-band removal, the
    * production answer to the adversarial-corpus funnel DESIGN
    * "Scale pass 4" measured: junk keys never enter the index, so no
    * probe ever pays for them (the flat path's candidate_pairs_capped
    * applies the same cap per query instead). Idempotent per JVM
    * (catalog check); the write is part of the measured operator, the
    * [[Bucketed.ensureOrderTables]] discipline. */
  def ensureBandIndexTable(spark: SparkSession, dir: String,
                           maxBucket: Option[Int] = None): String = {
    val t = s"graft_band_idx_${maxBucket.fold("")(m => s"c${m}_")}${tag(dir)}"
    if (!spark.catalog.tableExists(t)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_band_idx_" +
        s"${maxBucket.fold("")(m => s"c${m}_")}${tag(dir)}"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val all = spark.read.parquet(s"$dir/documents.parquet")
      val corpus = all.filter(
        col("doc_id") < graft.operators.IncrementalIngest.frontierId(all))
      // one bounded scalar (the ZOrder.eventMaxes catalog-stats
      // justification) sizes the layout to the corpus
      val buckets = bucketsFor(corpus.count())
      val bandsDf = MinHashLsh.bands(corpus)
      val pruned = maxBucket.fold(bandsDf) { m =>
        val keep = bandsDf.groupBy("band", "band_key")
          .agg(count(lit(1)).as("occ")).filter(col("occ") <= m)
          .select("band", "band_key")
        bandsDf.join(keep, Seq("band", "band_key"))
      }
      pruned
        .repartition(buckets, col("band"), col("band_key"))
        .write.mode("overwrite").format("parquet")
        .option("path", s"$root/bands")
        .bucketBy(buckets, "band", "band_key").sortBy("band", "band_key")
        .saveAsTable(t)
    }
    t
  }

  /** The incremental probe off the bucketed index: same semantics
    * (and oracle) as the flat q:`incremental_pairs`, but the index
    * side of the band join carries NO Exchange — only the arriving
    * batch is shuffled to the index's bucketing. */
  def incrementalPairsBucketed(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.table(ensureBandIndexTable(spark, dir))
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val batch = all.filter(
      col("doc_id") >= graft.operators.IncrementalIngest.frontierId(all))
    MinHashLsh.incrementalCandidates(idx, batch, mergeHint = true)
  }

  /** The probe off the STOP-BAND-CAPPED index: identical join, but
    * degenerate buckets were never written, so an adversarial key
    * distribution cannot funnel quadratic output through the probe
    * (within-batch pairs are unaffected — the cap governs what the
    * INDEX serves, exactly like a search engine's stop-word list). */
  def incrementalPairsCapped(spark: SparkSession, dir: String,
                             maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val idx = spark.table(ensureBandIndexTable(spark, dir, Some(maxBucket)))
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val batch = all.filter(
      col("doc_id") >= graft.operators.IncrementalIngest.frontierId(all))
    MinHashLsh.incrementalCandidates(idx, batch, mergeHint = true)
  }
}

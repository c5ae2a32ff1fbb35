package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file COMPACTION and file-level min/max DATA SKIPPING — the
  * table-maintenance pair every 100 TB lakehouse runs continuously
  * and the reference (flat text files, one job = one re-read,
  * SURVEY.md §2.1 O16/O17) has no notion of:
  *
  *  - A streaming/incremental ingest lands one file per micro-batch
  *    task; after a day a table is thousands of KB-sized files and
  *    every scan pays per-file open/footer/schema cost that dwarfs
  *    the I/O. COMPACTION bin-packs those files into target-sized
  *    ones, sorted so each output file covers a contiguous key range
  *    — the OPTIMIZE primitive of Delta/Iceberg.
  *  - A catalog of per-file min/max key stats (which parquet footers
  *    already carry; Delta/Iceberg lift them into the manifest) lets
  *    a range query DROP whole files before the scan is planned —
  *    one level above parquet row-group pruning, and the level that
  *    matters at 100 TB where even opening 100k footers is a cost.
  *
  * Both layout twins ([[smallFilesScan]] / [[compactedScan]]) and the
  * index-planned scan ([[skippingScan]]) return layout-independent
  * results, so DuckDB replays all three off the raw flat table —
  * layout changes WHERE bytes live, never WHAT a query returns.
  */
object Compaction {

  /** Fragmentation degree of the simulated ingest (one file per
    * hash-partitioned landing task). */
  val FragmentFiles = 64

  /** Compaction bin-pack target — 64 KB so the compacted layout has
    * several files even at the oracle sf and the index's file-level
    * pruning is observable (the ZOrder 32 KB row-group discipline);
    * production uses the same arithmetic with a ~128 MB target. */
  val TargetFileBytes: Long = 64L * 1024

  private def tag(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")
  private def root(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_compact_${tag(dir)}"

  private def listParquet(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .toSeq

  /** The fragmented landing layout: documents hash-scattered across
    * [[FragmentFiles]] writer tasks, i.e. the worst-case small-files
    * table an unmaintained ingest produces. Idempotent per JVM; the
    * write is part of the measured operator (the
    * [[Bucketed.ensureOrderTables]] discipline). */
  def ensureFragmented(spark: SparkSession, dir: String): String = {
    val path = s"${root(dir)}/small"
    val done = new java.io.File(s"${root(dir)}/_small_done")
    if (!done.exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .repartition(FragmentFiles, col("doc_id"))
        .write.mode("overwrite").parquet(path)
      done.getParentFile.mkdirs(); done.createNewFile()
    }
    path
  }

  /** The compaction REWRITE itself: bin-pack `src`'s files into
    * ceil(bytes / target) outputs at `dst`, range-partitioned and
    * sorted by `sortCol` so every output file covers a contiguous,
    * disjoint key range. The sort is what turns the rewrite into an
    * indexable layout: afterwards the per-file min/max intervals
    * tile the key space instead of all spanning it
    * ([[skippingIndex]] proves this in CompactionSpec). */
  def compactDir(spark: SparkSession, src: String, dst: String,
                 sortCol: String): String = {
    val bytes = listParquet(src).map(_.length()).sum
    val nFiles = math.max(1L, (bytes + TargetFileBytes - 1) / TargetFileBytes).toInt
    spark.read.parquet(src)
      .repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(dst)
    dst
  }

  /** The fragmented documents table compacted once per JVM (the
    * write is part of the measured operator). */
  def ensureCompacted(spark: SparkSession, dir: String): String = {
    val small = ensureFragmented(spark, dir)
    val path = s"${root(dir)}/compacted"
    val done = new java.io.File(s"${root(dir)}/_compacted_done")
    if (!done.exists()) {
      compactDir(spark, small, path, "doc_id")
      done.getParentFile.mkdirs(); done.createNewFile()
    }
    path
  }

  /** The per-language scan both layout twins run — a full-table
    * aggregate whose cost at scale is dominated by per-file overhead
    * on the fragmented layout and by I/O on the compacted one. */
  private def scanStats(df: DataFrame): DataFrame =
    df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"))

  /** Full scan off the FRAGMENTED layout (the before-compaction
    * twin; same oracle as [[compactedScan]] — the raw flat table). */
  def smallFilesScan(spark: SparkSession, dir: String): DataFrame =
    scanStats(spark.read.parquet(ensureFragmented(spark, dir)))

  /** Full scan off the COMPACTED layout. */
  def compactedScan(spark: SparkSession, dir: String): DataFrame =
    scanStats(spark.read.parquet(ensureCompacted(spark, dir)))

  /** File-level min/max SKIPPING INDEX of a parquet directory: one
    * row per file with its doc_id interval and row count — the
    * manifest-level stats a Delta/Iceberg table carries natively.
    * Built with one aggregate over input_file_name(); the index is
    * file-count-sized (catalog-sized), NOT data-sized. Layout-bound
    * by construction (file names are write-dependent), so it is
    * consumed in-engine by [[skippingScan]] and asserted structurally
    * in CompactionSpec rather than registered as an oracle query. */
  def skippingIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        count(lit(1)).as("n_rows"))

  /** The [20%, 40%) doc_id slice bounds, derived from the index's own
    * global max (integer arithmetic, replayed by the oracle from
    * max(doc_id) of the raw table). */
  def sliceBounds(maxId: Long): (Long, Long) =
    ((maxId + 1) * 20 / 100, (maxId + 1) * 40 / 100)

  /** Range scan PLANNED THROUGH the skipping index: consult the
    * (catalog-sized) index on the driver, keep only files whose
    * [min_id, max_id] interval intersects the query range, hand
    * exactly those paths to the scan, and apply the residual filter
    * in-engine. On the compacted layout the intersecting set is a
    * small fraction of the files (asserted in CompactionSpec); at
    * 100 TB this is the difference between listing+opening every
    * file of a table and touching only the data the query can use.
    * The collect is the file-stats catalog — bounded by file count,
    * never by rows (the [[ZOrder.eventMaxes]] justification). */
  def skippingScan(spark: SparkSession, dir: String): DataFrame = {
    val compacted = ensureCompacted(spark, dir)
    val idx = skippingIndex(spark, compacted).collect()
    val maxId = idx.map(_.getAs[Long]("max_id")).max
    val (lo, hi) = sliceBounds(maxId)
    val hit = idx.filter(r =>
      r.getAs[Long]("max_id") >= lo && r.getAs[Long]("min_id") < hi)
      .map(_.getAs[String]("file")).toSeq
    // a sparse id space can leave the slice with zero intersecting
    // files; parquet needs >= 1 path to carry a schema, so fall back
    // to the full layout with a false filter (scans nothing: the
    // range predicate is contradictory on every file's stats)
    val src =
      if (hit.nonEmpty) spark.read.parquet(hit: _*)
      else spark.read.parquet(compacted).filter(lit(false))
    scanStats(src.filter(col("doc_id") >= lo && col("doc_id") < hi))
  }
}

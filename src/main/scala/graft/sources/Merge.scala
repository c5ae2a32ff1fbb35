package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level MERGE (upsert + delete) on a snapshot-maintained table,
  * executed COPY-ON-WRITE: only the files whose key interval contains
  * a change key are rewritten; every other file is carried into the
  * new version BY REFERENCE through the manifest's root-relative file
  * list ([[Snapshots.commit]]'s `carry`). This is the capability gap
  * between "rebuild the table" and a continuously-maintained corpus:
  * at 100 TB a CDC batch touches a sliver of the key space, and the
  * Delta/Iceberg answer — rewrite O(touched files), publish with one
  * atomic manifest rename — is the only shape whose cost tracks the
  * batch, not the table. The reference (flat files, whole-job
  * rewrites, `fs.delete` then write — Shingling.java:97-100) has no
  * row-level maintenance at all; [[graft.operators.ChangeData]] holds
  * the COMPUTATIONAL merge (latest-wins over a change log), while
  * this is the STORAGE merge that applies such a batch in place.
  *
  * Pruning runs on the driver against the manifest's per-file
  * [minKey, maxKey] stats — catalog-sized work (file count × binary
  * search over the batch's distinct keys, themselves batch-bounded) —
  * so query-time data I/O is exactly the touched files plus the
  * batch. A key absent from the table but inside some file's interval
  * conservatively touches that file (the interval can't prove
  * absence), which keeps the no-duplicates invariant without a
  * per-key bloom filter; keys beyond every interval insert without
  * touching anything.
  *
  * Rewritten rows land range-sorted by the key so the NEW files carry
  * tight disjoint intervals of their own (the [[Compaction]]
  * discipline), and the commit records their footer stats next to the
  * carried ones — the table stays skipping-plannable across any
  * number of merges. Crash/concurrency story is [[Snapshots]]':
  * a killed merge leaves an unreferenced data dir, never a partial
  * table; readers of prior versions keep intact files until
  * [[Snapshots.expire]], which keeps a version dir alive while any
  * surviving manifest still carries a file inside it.
  */
object Merge {

  val UpsertOp = "upsert"
  val DeleteOp = "delete"

  /** Bumped whenever the registered change-batch semantics change, so
    * fingerprint-cached chains from an older design rebuild. */
  private val BatchFormat = "b2"

  /** Apply one CDC-shaped change batch (`op` column = upsert|delete;
    * upsert rows carry the full table schema) to the current snapshot
    * of `root`, committing the result as the next version. An EMPTY
    * batch still commits — a carry-all version with no new files —
    * so version history and idempotence fingerprints advance even
    * when no row moves (the Delta empty-transaction behavior a
    * fingerprint-stamped chain depends on). */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
            fingerprint: String, keyCol: String = "doc_id"): Snapshots.Snapshot = {
    Snapshots.current(spark, root).getOrElse(throw new IllegalStateException(
      s"merge target $root has no committed snapshot"))
    val stats = Snapshots.fileStats(spark, root)
    require(stats.nonEmpty,
      s"merge needs a stats-carrying snapshot (commit the base with statsFor) at $root")

    // the batch's distinct keys: batch-sized by contract (a CDC batch,
    // not the corpus), sorted for the per-file interval probe
    val keys: Array[Long] = changes.select(col(keyCol).cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    val priorDels = morDeleteKeys(spark, root)
    if (keys.isEmpty)
      return Snapshots.commit(spark, root, fingerprint,
        carry = relativize(root, stats),
        extras = if (priorDels.isEmpty) Seq.empty
                 else Seq(DeletesKey -> encodeKeys(priorDels))) { p =>
        Snapshots.fs(spark, root).mkdirs(new Path(p)); ()
      }

    // interval first (sorted-keys binary probe), then the file's key
    // bloom when one is recorded: the interval can only prove a key
    // OUTSIDE [min,max]; the bloom proves absence INSIDE it, so point
    // deletes / gap inserts stop rewriting files they merely span
    def touchedBy(s: Snapshots.FileStat): Boolean = {
      val i = java.util.Arrays.binarySearch(keys, s.minKey)
      val from = if (i >= 0) i else -(i + 1)
      if (from >= keys.length || keys(from) > s.maxKey) false
      else KeyBloom.decode(s.bloom) match {
        case None => true // no bloom recorded: conservative
        case Some(bits) =>
          var j = from
          while (j < keys.length && keys(j) <= s.maxKey) {
            if (KeyBloom.mightContain(bits, keys(j))) return true
            j += 1
          }
          false
      }
    }
    val (touched, carried) = stats.partition(touchedBy)

    val upserts = changes.filter(col("op") === UpsertOp).drop("op")
    val changeKeys = changes.select(col(keyCol)).distinct()
    val merged =
      if (touched.isEmpty) upserts
      else {
        // the raw touched bytes may still hold rows a merge-on-read
        // delete removed logically — apply the list before merging so
        // the rewrite materializes those deletions for its files
        val raw = spark.read.parquet(touched.map(_.path): _*)
        val base = if (priorDels.isEmpty) raw
                   else raw.filter(!col(keyCol).isInCollection(priorDels))
        // delete-and-replace: every change key's old row goes (the
        // broadcast anti-join is batch-bounded), upserts come back
        base.join(broadcast(changeKeys), Seq(keyCol), "left_anti")
          .unionByName(upserts.select(raw.columns.toIndexedSeq.map(col): _*))
      }

    // size the rewrite by the touched bytes (catalog-sized listing),
    // same bin-pack target as compaction; inserts are batch-noise
    val conf = spark.sessionState.newHadoopConf()
    val touchedBytes = touched.map { s =>
      val p = new Path(s.path); p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1L,
      (touchedBytes + Compaction.TargetFileBytes - 1) / Compaction.TargetFileBytes).toInt

    // the batch's keys now have EXPLICIT state (rewritten or inserted)
    // — drop them from the deletion list so a re-upsert of a
    // MOR-deleted key survives the read filter
    val remainingDels = {
      val ks = keys.toSet
      priorDels.filterNot(ks)
    }
    Snapshots.commit(spark, root, fingerprint,
      statsFor = p => statsWithBlooms(spark, p, keyCol),
      carry = relativize(root, carried),
      extras = if (remainingDels.isEmpty) Seq.empty
               else Seq(DeletesKey -> encodeKeys(remainingDels))) { path =>
      merged.repartitionByRange(nFiles, col(keyCol))
        .sortWithinPartitions(col(keyCol))
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Footer intervals plus a [[KeyBloom]] per freshly-written file:
    * one extra executor-side columnar pass over only the files this
    * commit wrote — the commit-time investment that buys bloom-exact
    * pruning on every later merge (carried files keep their recorded
    * bloom verbatim; an immutable file's bloom never staleness-drifts). */
  def statsWithBlooms(spark: SparkSession, path: String,
                      keyCol: String = "doc_id"): Seq[Snapshots.FileStat] = {
    val base = Compaction.footerStats(spark, path, keyCol)
    val byName = KeyBloom.bloomsFor(spark.read.parquet(path), keyCol)
      .map { case (uri, b) => new Path(uri).getName -> b }
    base.map(s => s.copy(bloom = byName.getOrElse(s.path, "")))
  }

  /** Strip the absolute resolution [[Snapshots.fileStats]] applied so
    * carried entries re-record root-relative in the next manifest. */
  private def relativize(root: String,
                         stats: Seq[Snapshots.FileStat]): Seq[Snapshots.FileStat] = {
    val rootUri = new Path(root).toUri.getPath
    stats.map { s =>
      val p = new Path(s.path).toUri.getPath
      s.copy(path = p.stripPrefix(rootUri).stripPrefix("/"))
    }
  }

  private val DeletesKey = "deletes"

  private def encodeKeys(keys: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(keys.length * 8)
    keys.foreach(bb.putLong)
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bb.array())
  }

  /** The MERGE-ON-READ deletion list the current manifest carries —
    * keys logically deleted but not yet physically rewritten out.
    * Batch-bounded by construction (each MOR delete adds one CDC
    * batch's keys; any copy-on-write merge subtracts its batch and
    * OPTIMIZE clears the list entirely). */
  def morDeleteKeys(spark: SparkSession, root: String): Array[Long] =
    Snapshots.extras(spark, root).get(DeletesKey) match {
      case None => Array.emptyLongArray
      case Some(s) =>
        val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getUrlDecoder.decode(s))
        Array.fill(bb.remaining() / 8)(bb.getLong)
    }

  /** MERGE-ON-READ DELETE: an O(batch) commit that rewrites NOTHING —
    * every file is carried and the keys join the manifest's deletion
    * list, applied as a read-time filter until a later copy-on-write
    * merge (which subtracts its batch keys, so a re-upsert
    * resurrects cleanly) or OPTIMIZE (which materializes the
    * filter and clears the list) — the Delta deletion-vector
    * trade at key granularity: delete latency O(batch) now, one
    * predicate per read until maintenance amortizes it. */
  def deleteMor(spark: SparkSession, root: String, delKeys: DataFrame,
                fingerprint: String, keyCol: String = "doc_id"): Snapshots.Snapshot = {
    // same precondition as merge(): a MOR commit carries the CURRENT
    // file list forward, so a base committed without statsFor (empty
    // fileStats) would carry NOTHING and the new version would
    // silently serve an empty table — fail fast instead
    Snapshots.current(spark, root).getOrElse(throw new IllegalStateException(
      s"merge-on-read delete target $root has no committed snapshot"))
    val stats = Snapshots.fileStats(spark, root)
    require(stats.nonEmpty,
      s"deleteMor needs a stats-carrying snapshot (commit the base with statsFor) at $root")
    val keys = delKeys.select(col(keyCol).cast("long"))
      .distinct().collect().map(_.getLong(0))
    val merged = (morDeleteKeys(spark, root) ++ keys).distinct.sorted
    Snapshots.commit(spark, root, fingerprint,
      carry = relativize(root, stats),
      extras = if (merged.isEmpty) Seq.empty
               else Seq(DeletesKey -> encodeKeys(merged))) { p =>
      Snapshots.fs(spark, root).mkdirs(new Path(p)); ()
    }
  }

  /** Read the current snapshot of a merge-maintained table: the
    * manifest's file list (spanning version dirs) in one parquet
    * read, minus the merge-on-read deletion list (compiled to an
    * InSet predicate — batch-bounded, codegen-friendly). */
  def readCurrent(spark: SparkSession, root: String,
                  keyCol: String = "doc_id"): DataFrame = {
    val df = spark.read.parquet(Snapshots.dataFiles(spark, root): _*)
    val dels = morDeleteKeys(spark, root)
    if (dels.isEmpty) df
    else df.filter(!col(keyCol).isInCollection(dels))
  }

  // ---- registered-query fixtures ------------------------------------

  private def tag(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")
  private def root(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_merge_${tag(dir)}"

  private def maxDocId(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/documents.parquet")
      .agg(max("doc_id")).head().getLong(0)

  /** The [loPct%, hiPct%) doc_id band derived from the corpus' own
    * max id — the [[Compaction.sliceBounds]] integer arithmetic, so
    * the oracle replays the bounds exactly. RANGE-localized change
    * batches are what makes the registered queries exercise the
    * copy-on-write path for real: a CDC batch touching a narrow key
    * band rewrites a sliver of the files (mod-scattered keys would
    * conservatively touch every file's interval and degenerate to a
    * full rewrite). */
  private def band(mi: Long, loPct: Long, hiPct: Long): (Long, Long) =
    ((mi + 1) * loPct / 100, (mi + 1) * hiPct / 100)

  private def inBand(c: org.apache.spark.sql.Column, b: (Long, Long)) =
    c >= b._1 && c < b._2

  /** Batch 1 — the oracle-replayable CDC batch: delete the [10%,13%)
    * id band, re-language [40%,42%) to 'zz', and insert 100 fresh
    * docs above the current max id. */
  def changeBatch1(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mi = maxDocId(spark, dir)
    val deletes = docs.filter(inBand(col("doc_id"), band(mi, 10, 13)))
      .withColumn("op", lit(DeleteOp))
    val updates = docs.filter(inBand(col("doc_id"), band(mi, 40, 42)))
      .withColumn("lang", lit("zz"))
      .withColumn("op", lit(UpsertOp))
    val text = concat(lit("merged doc "), col("id").cast("string"))
    val inserts = spark.range(1, 101).select(
      (lit(mi) + col("id")).as("doc_id"),
      text.as("text"),
      lit("new").as("lang"),
      lit("merge").as("source"),
      length(text).cast("long").as("n_chars"))
      .withColumn("op", lit(UpsertOp))
    deletes.unionByName(updates).unionByName(inserts)
  }

  /** Batch 2 — built FROM THE CURRENT TABLE (the realistic CDC loop):
    * delete the [70%,72%) band, re-source [20%,22%) to 'rev2'; bands
    * off the ORIGINAL corpus max so the oracle sees the same bounds. */
  def changeBatch2(spark: SparkSession, dir: String, vroot: String): DataFrame = {
    val mi = maxDocId(spark, dir)
    val cur = readCurrent(spark, vroot)
    cur.filter(inBand(col("doc_id"), band(mi, 70, 72)))
      .withColumn("op", lit(DeleteOp))
      .unionByName(
        cur.filter(inBand(col("doc_id"), band(mi, 20, 22)))
          .withColumn("source", lit("rev2"))
          .withColumn("op", lit(UpsertOp)))
  }

  /** Base v1 + the given number of merge batches, rebuilt only when
    * the source fingerprint (or chain depth) changed — the
    * [[Snapshots.ensure]] idempotence discipline, keyed on the final
    * chain state. */
  def ensureChain(spark: SparkSession, dir: String, batches: Int): String = {
    val src = s"$dir/documents.parquet"
    val fp = Snapshots.fingerprint(spark, src)
    val vroot = s"${root(dir)}/chain$batches"
    // the fingerprint keys on source DATA; the batch-format tag keys
    // on batch SEMANTICS — cached chains from an older batch design
    // must rebuild, not silently serve the old rows
    val want = s"$BatchFormat-m$batches:$fp"
    // an OPTIMIZEd chain ([[mergeCompactedScan]]) holds the same rows
    // under a consolidated layout — still current, don't rebuild
    val have = Snapshots.current(spark, vroot).map(_.fingerprint)
    if (!have.contains(want) && !have.contains(s"opt:$want")) {
      Snapshots.fs(spark, vroot).delete(new Path(vroot), true)
      Snapshots.commit(spark, vroot, s"base:$fp",
        statsFor = p => statsWithBlooms(spark, p)) { p =>
        Compaction.compactDir(spark, src, p, "doc_id")
      }
      val b1fp = if (batches >= 2) s"m1:$fp" else want
      merge(spark, vroot, changeBatch1(spark, dir), b1fp)
      if (batches >= 2)
        merge(spark, vroot, changeBatch2(spark, dir, vroot), want)
    }
    vroot
  }

  private def scanStats(df: DataFrame): DataFrame =
    df.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(col("doc_id")).cast("long").as("sum_ids"))

  /** The table after batch 1, read through the manifest's file list
    * — content is pure merge semantics, so DuckDB replays it off the
    * raw table with no knowledge of the layout. */
  def mergeScan(spark: SparkSession, dir: String): DataFrame =
    scanStats(readCurrent(spark, ensureChain(spark, dir, 1)))

  /** The table after batch 2 chained on batch 1 — two copy-on-write
    * versions deep, proving carried references survive re-merging. */
  def mergeIncrementalScan(spark: SparkSession, dir: String): DataFrame =
    scanStats(readCurrent(spark, ensureChain(spark, dir, 2)))

  /** The table after batch 1 plus a MERGE-ON-READ delete of the
    * [55%,57%) id band — zero files rewritten, the band lives in the
    * manifest's deletion list and is filtered at read time. Content
    * is still pure merge semantics for the oracle. */
  def mergeMorScan(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/documents.parquet"
    val fp = Snapshots.fingerprint(spark, src)
    val vroot = s"${root(dir)}/chainmor"
    val want = s"$BatchFormat-mor:$fp"
    if (!Snapshots.current(spark, vroot).exists(_.fingerprint == want)) {
      Snapshots.fs(spark, vroot).delete(new Path(vroot), true)
      Snapshots.commit(spark, vroot, s"base:$fp",
        statsFor = p => statsWithBlooms(spark, p)) { p =>
        Compaction.compactDir(spark, src, p, "doc_id")
      }
      merge(spark, vroot, changeBatch1(spark, dir), s"$BatchFormat-m1:$fp")
      val mi = maxDocId(spark, dir)
      deleteMor(spark, vroot,
        spark.read.parquet(src)
          .filter(inBand(col("doc_id"), band(mi, 55, 57)))
          .select("doc_id"),
        want)
    }
    scanStats(readCurrent(spark, vroot))
  }

  /** OPTIMIZE after merging — the lifecycle's last step: merges leave
    * the current version's file list scattered across version dirs
    * (carried refs + per-batch rewrites); this consolidates them into
    * one fresh compacted version with NO carries, then expires every
    * older version — the moment retention can finally reclaim the
    * dirs the carries were keeping alive. Content is untouched, so
    * the batch-2 oracle replays this scan unchanged. */
  def mergeCompactedScan(spark: SparkSession, dir: String): DataFrame = {
    val vroot = ensureChain(spark, dir, 2)
    if (!Snapshots.current(spark, vroot).get.fingerprint.startsWith("opt:"))
      optimize(spark, vroot)
    scanStats(readCurrent(spark, vroot))
  }

  /** The OPTIMIZE step itself: rewrite the current (possibly
    * cross-dir) file list as one compacted version with no carries,
    * then expire everything older — after which retention has
    * reclaimed every dir only the carries kept alive. */
  def optimize(spark: SparkSession, vroot: String): Snapshots.Snapshot = {
    val cur = Snapshots.current(spark, vroot).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $vroot"))
    // statsWithBlooms, not bare footerStats: the consolidated files
    // are carried by every later merge, and a bloom-less carry
    // degenerates that merge's pruning to conservative interval-touch
    // rewrites — OPTIMIZE must not silently lower the table's
    // skipping precision
    val snap = Snapshots.commit(spark, vroot, s"opt:${cur.fingerprint}",
      statsFor = p => statsWithBlooms(spark, p)) { p =>
      Compaction.compactFrame(spark, readCurrent(spark, vroot), p, "doc_id")
    }
    Snapshots.expire(spark, vroot, keepVersions = 1)
    snap
  }
}

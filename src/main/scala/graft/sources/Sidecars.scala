package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared sidecar/marker plumbing for the maintained-index family:
  * one copy of the tombstone fold-and-swap and of the fixture-marker
  * read/write, so a fix to either discipline lands everywhere at once
  * (the r10 review found the hand-rolled copies already drifting).
  */
object Sidecars {

  /** The content of a small marker file, None when absent. */
  def readMarker(spark: SparkSession, path: String): Option[String] = {
    val f = Snapshots.fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Overwrite a marker file. Markers guard REBUILDABLE fixtures (a
    * torn write just forces a rebuild), so plain create-overwrite is
    * the right weight — correctness-bearing state uses the staged
    * rename disciplines instead. */
  def writeMarker(spark: SparkSession, path: String, value: String): Unit = {
    val f = Snapshots.fs(spark, path)
    val out = f.create(new Path(path), true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  /** Heal a fold interrupted between its two renames: the ONLY state
    * with the published dir missing is "original parked at `._old`,
    * completed fold staged at `._folding`" (the fold stages fully
    * before any rename; the aside is deleted only after the staged
    * dir took the published name). Prefer the completed fold —
    * semantics-identical and already paid for. Returns true when a
    * recovery happened. Idempotent; a racing second recoverer loses
    * its rename benignly (the dir exists afterwards either way). */
  def recoverTombstones(spark: SparkSession, tombDir: String): Boolean = {
    val f = Snapshots.fs(spark, tombDir)
    val tombPath = new Path(tombDir)
    if (f.exists(tombPath)) return false
    val tmp = new Path(s"$tombDir._folding")
    val aside = new Path(s"$tombDir._old")
    if (f.exists(tmp) && f.exists(aside)) {
      if (f.rename(tmp, tombPath) || f.exists(tombPath)) {
        f.delete(aside, true); true
      } else throw new IllegalStateException(
        s"crashed-fold recovery rename failed at $tombDir")
    } else if (f.exists(aside)) {
      // staged copy lost (manual cleanup?) — the original still has a name
      if (f.rename(aside, tombPath) || f.exists(tombPath)) true
      else throw new IllegalStateException(
        s"crashed-fold recovery rename failed at $tombDir")
    } else false // genuinely no sidecar (nothing ever tombstoned)
  }

  /** Fold a (keyCol, gen) tombstone sidecar to one max-gen row per
    * key — semantics-identical to what the live-row masks compute on
    * read — and swap it in with the rename-ASIDE discipline: stage
    * the folded copy, move the old dir to a visible `._old` sibling,
    * rename the staged one in, then delete the old. A crash at any
    * point leaves the tombstones recoverable BY NAME, and both this
    * fold and the live-row readers ([[recoverTombstones]]) self-heal
    * the crashed-swap state instead of reading an absent sidecar as
    * "no tombstones" (which would silently resurrect deleted rows).
    * The write is bin-packed from the RAW sidecar's bytes (an upper
    * bound on the fold) — a corpus-sized tombstone set folds in
    * parallel, never through one task. The swap replaces the dir
    * WHOLESALE — foreign files (e.g. a fixture marker parked inside)
    * do not survive a fold; markers guard rebuildable state and
    * tolerate that by design. No-op when the sidecar doesn't exist.
    * Single maintainer. */
  def foldTombstones(spark: SparkSession, tombDir: String,
                     keyCol: String): Unit = {
    import graft.Caches.CheckpointSyntax
    recoverTombstones(spark, tombDir)
    val f = Snapshots.fs(spark, tombDir)
    val tombPath = new Path(tombDir)
    if (!f.exists(tombPath)) return
    val raw = spark.read.parquet(tombDir)
    val nFiles = Compaction.binPackFileCount(spark, raw)
    val folded = raw.groupBy(keyCol).agg(max("gen").as("gen"))
      .graftCheckpoint()
    val tmp = new Path(s"$tombDir._folding")
    val aside = new Path(s"$tombDir._old")
    f.delete(tmp, true)
    f.delete(aside, true)
    folded.repartition(nFiles).write.parquet(tmp.toString)
    if (!f.rename(tombPath, aside))
      throw new IllegalStateException(s"tombstone aside-rename failed at $tombDir")
    if (!f.rename(tmp, tombPath))
      throw new IllegalStateException(s"tombstone fold swap failed at $tombDir")
    f.delete(aside, true)
  }
}

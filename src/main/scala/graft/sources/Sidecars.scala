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
    out.write(value.getBytes("UTF-8")); out.close()
  }

  /** Fold a (keyCol, gen) tombstone sidecar to one max-gen row per
    * key — semantics-identical to what the live-row masks compute on
    * read — and swap it in with the rename-ASIDE discipline: stage
    * the folded copy, move the old dir to a visible `._old` sibling,
    * rename the staged one in, then delete the old. A crash at any
    * point leaves the tombstones recoverable BY NAME. The swap
    * replaces the dir WHOLESALE — foreign files (e.g. a fixture
    * marker parked inside) do not survive a fold; markers guard
    * rebuildable state and tolerate that by design. No-op when the
    * sidecar doesn't exist. Single maintainer. */
  def foldTombstones(spark: SparkSession, tombDir: String,
                     keyCol: String): Unit = {
    import graft.Caches.CheckpointSyntax
    val f = Snapshots.fs(spark, tombDir)
    val tombPath = new Path(tombDir)
    if (!f.exists(tombPath)) return
    val folded = spark.read.parquet(tombDir)
      .groupBy(keyCol).agg(max("gen").as("gen"))
      .graftCheckpoint()
    val tmp = new Path(s"$tombDir._folding")
    val aside = new Path(s"$tombDir._old")
    f.delete(tmp, true)
    f.delete(aside, true)
    folded.coalesce(1).write.parquet(tmp.toString)
    if (!f.rename(tombPath, aside))
      throw new IllegalStateException(s"tombstone aside-rename failed at $tombDir")
    if (!f.rename(tmp, tombPath))
      throw new IllegalStateException(s"tombstone fold swap failed at $tombDir")
    f.delete(aside, true)
  }
}

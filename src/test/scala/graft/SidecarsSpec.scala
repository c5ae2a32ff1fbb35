package graft

import org.apache.hadoop.fs.Path
import graft.sources.{Sidecars, Snapshots}

/** The shared maintenance plumbing both maintained indexes now lean
  * on: the tombstone fold must be semantics-identical (per-key max)
  * and crash-recoverable by name at every step, and the marker
  * helpers must round-trip exactly — a drifted copy of either was the
  * r10 review finding that motivated the extraction. */
class SidecarsSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sidecars_$name").toString

  test("foldTombstones folds to the per-key max and leaves no work dirs") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp("fold")}/tomb"
    // three appends with superseded generations and duplicates — the
    // shape applyChangeFeed accretes between compactions
    Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "gen")
      .write.mode("append").parquet(dir)
    Seq((1L, 3L), (3L, 2L)).toDF("doc_id", "gen")
      .write.mode("append").parquet(dir)
    Seq((1L, 3L)).toDF("doc_id", "gen") // replayed duplicate
      .write.mode("append").parquet(dir)
    Sidecars.foldTombstones(spark, dir, "doc_id")
    val got = spark.read.parquet(dir)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (2L, 1L), (3L, 2L)), s"fold diverged: $got")
    val f = Snapshots.fs(spark, dir)
    assert(!f.exists(new Path(s"$dir._folding")) &&
      !f.exists(new Path(s"$dir._old")),
      "work dirs must be gone after a clean fold")
    // a leftover ._old from a crashed prior fold must not block the next
    f.mkdirs(new Path(s"$dir._old"))
    Sidecars.foldTombstones(spark, dir, "doc_id")
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().toSet == got)
    assert(!f.exists(new Path(s"$dir._old")))
    // absent sidecar: a clean no-op
    Sidecars.foldTombstones(spark, s"$dir-never-written", "doc_id")
  }

  test("a fold crashed between its renames self-heals; deleted keys stay masked") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp("crash")}/tomb"
    val f = Snapshots.fs(spark, dir)
    // fabricate the ONLY missing-dir crash state the fold sequence
    // can produce: original parked at ._old, completed fold at
    // ._folding, published name absent
    Seq((1L, 1L), (1L, 3L), (2L, 2L)).toDF("doc_id", "gen")
      .write.parquet(s"$dir._old")
    Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "gen")
      .write.parquet(s"$dir._folding")
    assert(!f.exists(new Path(dir)))
    // a reader-side recovery restores the completed fold under the
    // published name — reading "no tombstones" here would resurrect
    // every deleted key
    assert(Sidecars.recoverTombstones(spark, dir))
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().toSet ==
      Set((1L, 3L), (2L, 2L)))
    assert(!f.exists(new Path(s"$dir._old")) &&
      !f.exists(new Path(s"$dir._folding")),
      "recovery must consume the work dirs")
    assert(!Sidecars.recoverTombstones(spark, dir), "idempotent once healed")
    // aside-only variant (staged copy lost): the original still heals
    val dir2 = s"${tmp("crash2")}/tomb"
    Seq((9L, 9L)).toDF("doc_id", "gen").write.parquet(s"$dir2._old")
    assert(Sidecars.recoverTombstones(spark, dir2))
    assert(spark.read.parquet(dir2).as[(Long, Long)].collect().toSet ==
      Set((9L, 9L)))
    // truly absent sidecar: no recovery, no error
    assert(!Sidecars.recoverTombstones(spark, s"$dir2-never"))
  }

  test("markers round-trip, overwrite, and read None when absent") {
    val p = s"${tmp("marker")}/m"
    assert(Sidecars.readMarker(spark, p).isEmpty)
    Sidecars.writeMarker(spark, p, "sig-a")
    assert(Sidecars.readMarker(spark, p).contains("sig-a"))
    Sidecars.writeMarker(spark, p, "sig-b")
    assert(Sidecars.readMarker(spark, p).contains("sig-b"))
  }
}

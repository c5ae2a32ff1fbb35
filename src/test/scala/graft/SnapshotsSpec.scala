package graft

import org.apache.spark.sql.functions._
import graft.sources.{Compaction, Merge, Snapshots}

/** The transactional story of the maintenance rewrites (r8 verdict
  * item 1): a reader concurrent with — or arriving after a killed —
  * rewrite must see exactly the old or the new snapshot, never a
  * mix; and snapshot reuse must key on the SOURCE DATA, not a marker
  * file (r7 advice: stale `_done` markers served old rows after the
  * source was regenerated at the same path). */
class SnapshotsSpec extends SparkSpec {

  private def tmpRoot(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_snap_$name").toString

  private def writeDocs(path: String, ids: Seq[Long]): Unit = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(path)
  }

  test("commit publishes atomically: no manifest, no version") {
    val root = tmpRoot("atomic")
    assert(Snapshots.current(spark, root).isEmpty)
    val snap = Snapshots.commit(spark, root, "fp1") { p => writeDocs(p, 0L to 9L) }
    assert(snap.version == 1)
    val cur = Snapshots.current(spark, root).get
    assert(cur == snap)
    assert(spark.read.parquet(cur.dataPath).count() == 10)
  }

  test("a killed rewrite leaves the previous snapshot exactly intact") {
    val root = tmpRoot("killed")
    Snapshots.commit(spark, root, "v1") { p => writeDocs(p, 0L to 9L) }
    val before = Snapshots.current(spark, root).get

    // simulate a writer killed MID-REWRITE: the next version's data
    // dir exists (even partially valid parquet) but the crash happened
    // before the manifest rename — the single commit point
    writeDocs(s"$root/v000000002", 100L to 102L)

    val after = Snapshots.current(spark, root).get
    assert(after == before, "an uncommitted data dir must be invisible")
    val rows = spark.read.parquet(after.dataPath)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == (0L to 9L), "reader must see the OLD version, whole")
  }

  test("a new commit never touches the files a live reader resolved") {
    val root = tmpRoot("immutable")
    Snapshots.commit(spark, root, "v1") { p => writeDocs(p, 0L to 9L) }
    val v1 = Snapshots.current(spark, root).get
    val fs = Snapshots.fs(spark, root)
    def listing(path: String): Seq[(String, Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        buf += ((st.getPath.toString, st.getLen, st.getModificationTime))
      }
      buf.sortBy(_._1).toSeq
    }
    val v1Files = listing(v1.dataPath)

    // a reader that resolved v1 is now "running" — commit v2 under it
    val v2 = Snapshots.commit(spark, root, "v2") { p => writeDocs(p, 10L to 29L) }
    assert(v2.version == 2)

    // v1's files: same names, same lengths, same mtimes — immutable
    assert(listing(v1.dataPath) == v1Files,
      "a rewrite must never modify a committed version's files")
    // the in-flight reader finishes fine off v1...
    assert(spark.read.parquet(v1.dataPath).count() == 10)
    // ...while a new reader resolves exactly v2
    val cur = Snapshots.current(spark, root).get
    assert(cur.version == 2 &&
      spark.read.parquet(cur.dataPath).count() == 20)
  }

  test("ensure keys on the source fingerprint, not a marker: regenerated source rebuilds") {
    val root = tmpRoot("fp")
    val src = s"${tmpRoot("fp_src")}/documents.parquet"
    writeDocs(src, 0L to 4L)

    val p1 = Snapshots.ensure(spark, root, Snapshots.fingerprint(spark, src)) { p =>
      spark.read.parquet(src).write.parquet(p)
    }
    // same source state: served from the SAME snapshot, no rebuild
    val p2 = Snapshots.ensure(spark, root, Snapshots.fingerprint(spark, src)) { p =>
      fail("must not rebuild while the fingerprint matches")
    }
    assert(p1 == p2)

    // regenerate the source AT THE SAME PATH (the r7 stale-marker
    // scenario: new seed/scale, old markers) — ensure must rebuild
    writeDocs(src, 0L to 14L)
    val p3 = Snapshots.ensure(spark, root, Snapshots.fingerprint(spark, src)) { p =>
      spark.read.parquet(src).write.parquet(p)
    }
    assert(p3 != p1, "a changed source must commit a new version")
    assert(spark.read.parquet(p3).count() == 15,
      "the resolved snapshot must serve the REGENERATED rows")
  }

  test("snapshot_scan reads through the manifest and matches the layout twins") {
    val viaManifest = Compaction.snapshotScan(spark, Sf001)
    val viaCompacted = Compaction.compactedScan(spark, Sf001)
    assert(viaManifest.exceptAll(viaCompacted).isEmpty &&
      viaCompacted.exceptAll(viaManifest).isEmpty,
      "the snapshot access path must not change query results")
    // the versioned root resolves the compaction as current (the
    // fragmented v1 may already be expired by an earlier JVM's run of
    // the retention test — version numbers keep counting regardless)
    val vroot = Compaction.ensureSnapshotHistory(spark, Sf001)
    val cur = Snapshots.current(spark, vroot).get
    assert(cur.version >= 2 && cur.fingerprint.startsWith("compacted:"))
  }

  test("time travel resolves pinned versions until retention expires them") {
    // private two-version history (the shared fixture persists across
    // JVMs, so its v1 may legitimately be gone already)
    val root = tmpRoot("timetravel")
    Snapshots.commit(spark, root, "landing") { p => writeDocs(p, 0L to 9L) }
    Snapshots.commit(spark, root, "rewritten") { p => writeDocs(p, 0L to 9L) }
    val cur = Snapshots.current(spark, root).get
    assert(cur.version == 2 && cur.fingerprint == "rewritten")
    // version 1 stays queryable as a plain parquet read while it
    // survives retention, and holds the same rows (rewrite invariant)
    val v1 = Snapshots.at(spark, root, 1).get
    assert(v1.fingerprint == "landing")
    assert(spark.read.parquet(v1.dataPath).count() ==
      spark.read.parquet(cur.dataPath).count())
    // retention: expiring history down to current removes v1's
    // resolution and leaves current reads fully intact
    Snapshots.expire(spark, root, keepVersions = 1)
    assert(Snapshots.at(spark, root, 1).isEmpty,
      "an expired version must resolve to nothing, not stale paths")
    assert(Snapshots.current(spark, root).get == cur)
    assert(spark.read.parquet(cur.dataPath).count() == 10)
  }

  test("the compaction commit records per-file stats in the manifest, matching the footers") {
    // hermetic sf-dir: a snapshot committed BEFORE the stats feature
    // (or by another writer) legitimately lacks stat lines —
    // skippingScan falls back to footer reads for those — so this
    // test must drive a fresh commit, not reuse a cached root
    val s = spark
    import s.implicits._
    val dir = tmpRoot("statsdir")
    (0L until 120L).map(i => (i, s"text $i ${"y" * (i % 23).toInt}", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(3).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val compacted = Compaction.ensureCompacted(spark, dir)
    val root = new org.apache.hadoop.fs.Path(compacted).getParent.toString
    val manifest = Snapshots.fileStats(spark, root)
      .map(s => (new java.net.URI(s.path).getPath.split('/').last,
        s.minKey, s.maxKey, s.nRows)).sortBy(_._1)
    assert(manifest.nonEmpty, "compaction commit must record file stats")
    val footers = Compaction.skippingIndex(spark, compacted).collect()
      .map(r => (new java.net.URI(r.getAs[String]("file")).getPath.split('/').last,
        r.getAs[Long]("min_id"), r.getAs[Long]("max_id"), r.getAs[Long]("n_rows")))
      .sortBy(_._1).toSeq
    assert(manifest == footers,
      "manifest-recorded stats must equal a fresh footer read of the same files")
    // and the stats are genuinely consumed: the skipping scan planned
    // from the manifest equals the full-layout scan
    val viaManifest = Compaction.skippingScan(spark, dir)
    val (lo, hi) = Compaction.sliceBounds(manifest.map(_._3).max)
    import org.apache.spark.sql.functions.{count, length, lit, sum}
    val fullStats = spark.read.parquet(compacted)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
    assert(viaManifest.exceptAll(fullStats).isEmpty &&
      fullStats.exceptAll(viaManifest).isEmpty)
  }

  test("fingerprint reuse holds when the manifest carries file stats") {
    // regression: stat lines share the manifest file with the header;
    // a parse that swallowed them into the fingerprint made every
    // ensure() silently rebuild (reuse never matched again)
    val root = tmpRoot("fpstats")
    val src = s"${tmpRoot("fpstats_src")}/documents.parquet"
    writeDocs(src, 0L to 9L)
    val statsFor = (p: String) =>
      Seq(Snapshots.FileStat("part-0.parquet", 0L, 9L, 10L),
        Snapshots.FileStat("part-1.parquet", 3L, 7L, 5L))
    val fp = Snapshots.fingerprint(spark, src)
    val p1 = Snapshots.ensure(spark, root, fp, statsFor) { p =>
      spark.read.parquet(src).write.parquet(p)
    }
    assert(Snapshots.current(spark, root).get.fingerprint == fp,
      "stat lines must not leak into the parsed fingerprint")
    val p2 = Snapshots.ensure(spark, root, fp, statsFor) { _ =>
      fail("must not rebuild while the fingerprint matches")
    }
    assert(p1 == p2)
    assert(Snapshots.fileStats(spark, root).map(_.nRows).sorted == Seq(5L, 10L))
  }

  test("concurrent in-JVM commits serialize: both land, distinct versions, no corruption") {
    val root = tmpRoot("race")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Snapshots.Snapshot] {
          def call(): Snapshots.Snapshot =
            Snapshots.commit(spark, root, s"writer$i") { p =>
              writeDocs(p, 0L until (i * 5L))
            }
        })
      }
      val snaps = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(snaps.map(_.version).sorted == Seq(1, 2),
        "the per-root lock must serialize commits into consecutive versions")
      val cur = Snapshots.current(spark, root).get
      assert(cur.version == 2)
      // both versions' data fully readable (immutability held under race)
      snaps.foreach(sn => assert(
        spark.read.parquet(sn.dataPath).count() == sn.fingerprint.last.asDigit * 5L))
    } finally pool.shutdownNow()
  }

  test("a cross-process publish race retries content-idempotent commits onto the new parent") {
    val root = tmpRoot("race")
    Snapshots.commit(spark, root, "v1") { p => writeDocs(p, 0L to 9L) }

    // simulate a FOREIGN process winning version 2 while our commit's
    // write is in flight: from inside the write callback, fabricate
    // the other writer's data dir and manifest by hand (no lock
    // re-entry — this is exactly the interleaving two JVMs produce)
    val fs = Snapshots.fs(spark, root)
    def foreignCommit(version: Int, dataDir: String, ids: Seq[Long]): Unit = {
      writeDocs(s"$root/$dataDir", ids)
      val m = new org.apache.hadoop.fs.Path(s"$root/_manifests/${"%09d".format(version)}")
      val out = fs.create(m, false)
      try out.write(s"$dataDir\tforeign".getBytes("UTF-8")) finally out.close()
    }

    val snap = Snapshots.commit(spark, root, "mine") { p =>
      writeDocs(p, 100L to 109L)
      foreignCommit(2, "vforeign02", 50L to 59L)
    }
    // the loser re-resolved the parent and landed one past the winner
    assert(snap.version == 3, s"expected retry to land v3, got v${snap.version}")
    assert(Snapshots.current(spark, root).get == snap)
    // both versions' rows are correct and independently resolvable
    assert(spark.read.parquet(Snapshots.at(spark, root, 2).get.dataPath)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == (50L to 59L))
    assert(spark.read.parquet(snap.dataPath)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == (100L to 109L))

    // a commit whose content DEPENDS on the parent (carries files)
    // must not silently rebase: it fails naming the version it lost to
    val ex = intercept[Snapshots.CommitConflict] {
      Snapshots.commit(spark, root, "rebased",
        carry = Seq(Snapshots.FileStat("v000000003/part-x", 0L, 1L, 1L)),
        retryOnConflict = Some(false)) { p =>
        writeDocs(p, 200L to 204L)
        foreignCommit(4, "vforeign04", 60L to 69L)
      }
    }
    assert(ex.version == 4)
    assert(Snapshots.current(spark, root).get.version == 4,
      "the foreign winner stays current after the conflict")
  }

  test("an in-flight writer holding the pretty data-dir name never decides the race") {
    // the residual lost-update window of the first r9 commit loop:
    // writer A renamed its data to v000000002 but has NOT published
    // manifest 2 yet. Writer B must not treat the name collision as
    // \"the parent advanced\" (it did not — A may still lose), nor
    // silently skip to v3 with stale content: B falls back to a
    // unique-suffixed dir and the MANIFEST rename alone decides.
    val root = tmpRoot("inflight")
    Snapshots.commit(spark, root, "v1") { p => writeDocs(p, 0L to 9L) }
    // A: data dir parked at the pretty name, no manifest
    writeDocs(s"$root/v000000002", 100L to 104L)

    // B: a parent-pinned commit (the merge shape) — parent is STILL
    // v1, so this must SUCCEED as v2 under a suffixed dir name
    val snap = Snapshots.commit(spark, root, "writerB",
      retryOnConflict = Some(false), expectedParent = Some(1)) { p =>
      writeDocs(p, 200L to 204L)
    }
    assert(snap.version == 2)
    assert(snap.dataPath.matches(".*/v\\d{9}_[0-9a-f]{8}"),
      s"expected a suffixed fallback dir, got ${snap.dataPath}")
    assert(spark.read.parquet(Snapshots.current(spark, root).get.dataPath)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == (200L to 204L))
    // A's parked dir is now an orphan a later expire sweeps — but
    // only past the orphan GRACE window (a fresh unreferenced dir
    // could be an in-flight commit's work)
    Snapshots.expire(spark, root, keepVersions = 1)
    assert(Snapshots.fs(spark, root)
      .exists(new org.apache.hadoop.fs.Path(root, "v000000002")),
      "a fresh orphan inside the grace window must survive expire")
    spark.conf.set("spark.graft.manifest.orphanGraceMs", "0")
    try Snapshots.expire(spark, root, keepVersions = 1)
    finally spark.conf.unset("spark.graft.manifest.orphanGraceMs")
    assert(!Snapshots.fs(spark, root)
      .exists(new org.apache.hadoop.fs.Path(root, "v000000002")),
      "the in-flight loser's parked dir is reclaimed as an orphan")
  }

  test("manifest growth: a 10k-file stats+bloom manifest parses in catalog time") {
    // the r8 verdict's growth question: fileStats is O(files) per plan
    // — at 100 TB / 128 MB-files that's ~800k lines. Measure the
    // harness-scale proxy (10k files, full 512-byte blooms ≈ 7 MB
    // manifest) and bound it: parse cost must stay in the tens of
    // milliseconds so even 80× this size stays well under a second —
    // the point where a Delta-style parquet checkpoint of the log
    // becomes worthwhile (documented in DESIGN.md).
    val root = tmpRoot("manifest10k")
    val fs = Snapshots.fs(spark, root)
    val bloom = graft.sources.KeyBloom.encode(Array.fill(64)(-1L))
    val n = 10000
    val lines = (0 until n).map { i =>
      s"\nv000000001/part-$i.parquet\t${i * 100}\t${i * 100 + 99}\t100\t$bloom"
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v000000001"))
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$root/_manifests/000000001"), true)
    try out.write((s"v000000001\tfp" + lines.mkString).getBytes("UTF-8"))
    finally out.close()

    // cold = the real text parse; steady = the manifest-identity cache
    // (sound: published manifests are immutable) plus current()'s
    // remaining full-file header read
    val tc = System.nanoTime()
    Snapshots.fileStats(spark, root)
    val coldMs = (System.nanoTime() - tc) / 1e6
    val t0 = System.nanoTime()
    val stats = Snapshots.fileStats(spark, root)
    val ms = (System.nanoTime() - t0) / 1e6
    info(f"fileStats COLD parse over $n files with blooms: $coldMs%.1f ms")
    assert(stats.size == n)
    assert(stats.head.minKey == 0L && stats.last.maxKey == (n - 1) * 100L + 99)
    info(f"fileStats over $n files with blooms: $ms%.1f ms")
    assert(ms < 2000, f"10k-file manifest parse took $ms%.1f ms — checkpoint the log")
    // current() stays a listing + header read, independent of stats size
    val t1 = System.nanoTime()
    Snapshots.current(spark, root)
    info(f"current(): ${(System.nanoTime() - t1) / 1e6}%.1f ms")

    // the CHECKPOINTED form of the same 10k-file catalog: one parquet
    // sidecar instead of 7 MB of text — measure the plan-time parse
    // side by side and pin equality of the resolved stats
    val rootCp = tmpRoot("manifest10kcp")
    spark.conf.set("spark.graft.manifest.checkpointFiles", "1")
    try Snapshots.commit(spark, rootCp, "fp",
      statsFor = _ => (0 until n).map(i => Snapshots.FileStat(
        s"part-$i.parquet", i * 100L, i * 100L + 99, 100L, bloom))) { p =>
      Snapshots.fs(spark, p).mkdirs(new org.apache.hadoop.fs.Path(p))
    } finally spark.conf.unset("spark.graft.manifest.checkpointFiles")
    val tcc = System.nanoTime()
    Snapshots.fileStats(spark, rootCp) // cold: the real sidecar read
    val cpColdMs = (System.nanoTime() - tcc) / 1e6
    val t2 = System.nanoTime()
    val cpStats = Snapshots.fileStats(spark, rootCp)
    val cpMs = (System.nanoTime() - t2) / 1e6
    assert(cpStats.size == n)
    assert(cpStats.map(_.copy(path = "")).toSet == stats.map(_.copy(path = "")).toSet,
      "checkpointed stats must carry identical intervals/counts/blooms")
    info(f"fileStats via checkpoint COLD: $cpColdMs%.1f ms (inline cold: $coldMs%.1f ms)")
    info(f"fileStats via checkpoint steady: $cpMs%.1f ms (inline steady: $ms%.1f ms)")
    assert(cpMs < 2000, f"checkpointed 10k-file parse took $cpMs%.1f ms")

    // the READ path (dataFiles) projects the bloom column away — the
    // columnar payoff: the blooms are ~95% of the catalog's bytes and
    // a path-only resolve should not pay for them
    Snapshots.dataFiles(spark, rootCp) // warm
    val t3 = System.nanoTime()
    val files = Snapshots.dataFiles(spark, rootCp)
    val leanMs = (System.nanoTime() - t3) / 1e6
    assert(files.size == n)
    info(f"dataFiles via checkpoint (bloom column projected away): $leanMs%.1f ms")
    // and current() on the checkpointed root reads a header-sized file
    val t4 = System.nanoTime()
    Snapshots.current(spark, rootCp)
    info(f"current() on checkpointed manifest: ${(System.nanoTime() - t4) / 1e6}%.1f ms")

    // DELTA COMMIT at a 50k-file catalog: the O(delta) receipt. A
    // 20-file change against a 50k-entry sidecar must commit a
    // header-sized manifest (inline delta lines only) and reuse the
    // sidecar byte-for-byte — commit-time catalog I/O tracks the
    // batch, not the table.
    val rootD = tmpRoot("manifest50kdelta")
    val fsD = Snapshots.fs(spark, rootD)
    val big = 50000
    val bigStats = (0 until big).map(i => Snapshots.FileStat(
      s"part-$i.parquet", i * 100L, i * 100L + 99, 100L, bloom))
    val mkdirsOnly = (p: String) =>
      { Snapshots.fs(spark, p).mkdirs(new org.apache.hadoop.fs.Path(p)); () }
    spark.conf.set("spark.graft.manifest.checkpointFiles", "1")
    try {
      val tFull = System.nanoTime()
      Snapshots.commit(spark, rootD, "base",
        statsFor = _ => bigStats)(mkdirsOnly)
      val fullMs = (System.nanoTime() - tFull) / 1e6
      val cpName = Snapshots.extras(spark, rootD)("statscp")
      val cpLen = fsD.getFileStatus(new org.apache.hadoop.fs.Path(
        s"$rootD/_manifests/$cpName")).getLen
      // the delta: carry all but 10, add 10 fresh
      val rootUri = new org.apache.hadoop.fs.Path(rootD).toUri.getPath
      val carried = Snapshots.fileStats(spark, rootD).drop(10).map { s =>
        val p = new org.apache.hadoop.fs.Path(s.path).toUri.getPath
        s.copy(path = p.stripPrefix(rootUri).stripPrefix("/"))
      }
      val tDelta = System.nanoTime()
      Snapshots.commit(spark, rootD, "delta", carry = carried,
        statsFor = _ => (big until big + 10).map(i => Snapshots.FileStat(
          s"part-$i.parquet", i * 100L, i * 100L + 99, 100L, bloom)),
        retryOnConflict = Some(false))(mkdirsOnly)
      val deltaMs = (System.nanoTime() - tDelta) / 1e6
      assert(Snapshots.extras(spark, rootD)("statscp") == cpName,
        "the 20-entry delta must reuse the 50k-entry sidecar")
      val mLen = fsD.getFileStatus(new org.apache.hadoop.fs.Path(
        s"$rootD/_manifests/000000002")).getLen
      info(f"50k-file catalog: full-sidecar commit $fullMs%.0f ms ($cpLen%d B sidecar); " +
        f"20-entry delta commit $deltaMs%.0f ms ($mLen%d B manifest)")
      assert(mLen < 32768,
        s"a 20-entry delta manifest must stay header-sized, got $mLen B")
      assert(Snapshots.fileStats(spark, rootD).size == big)
    } finally spark.conf.unset("spark.graft.manifest.checkpointFiles")
  }

  test("stats checkpoint: above the threshold the manifest stays header-sized and round-trips") {
    // the Delta checkpoint pattern, implemented at the r9-measured
    // threshold: inline text stats are O(files) parsed per plan
    // (~560 MB at the 100 TB / 800k-file shape); above the threshold
    // the stats block lands in ONE parquet sidecar written
    // driver-side, the manifest keeps its one-line header, and
    // fileStats resolves through the sidecar transparently.
    val stats = (0 until 200).map(i => Snapshots.FileStat(
      s"part-$i.parquet", i * 10L, i * 10L + 9, 10L,
      graft.sources.KeyBloom.encode(Array.fill(8)(i.toLong))))
    def committed(root: String, threshold: String): Seq[Snapshots.FileStat] = {
      spark.conf.set("spark.graft.manifest.checkpointFiles", threshold)
      try {
        Snapshots.commit(spark, root, "fp", statsFor = _ => stats) { p =>
          Snapshots.fs(spark, p).mkdirs(new org.apache.hadoop.fs.Path(p))
        }
        Snapshots.fileStats(spark, root)
      } finally spark.conf.unset("spark.graft.manifest.checkpointFiles")
    }
    val inline = committed(tmpRoot("cp_inline"), "100000")
    val rootCp = tmpRoot("cp_on")
    val viaCp = committed(rootCp, "10")

    // identical resolved stats, path prefix aside (different roots)
    def rel(s: Seq[Snapshots.FileStat]) =
      s.map(st => st.copy(path = st.path.split('/').takeRight(2).mkString("/")))
    assert(rel(viaCp) == rel(inline),
      "checkpointed fileStats must equal the inline form exactly")

    val fs = Snapshots.fs(spark, rootCp)
    val mpath = new org.apache.hadoop.fs.Path(s"$rootCp/_manifests/000000001")
    val raw = {
      val in = fs.open(mpath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val lines = raw.trim.split('\n')
    assert(lines.count(!_.startsWith("#")) == 1,
      s"checkpointed manifest must hold ONLY the header line: ${lines.take(3).toSeq}")
    assert(lines.exists(_.startsWith("#statscp\t")),
      "manifest must reference its sidecar")
    val cpFiles = fs.listStatus(new org.apache.hadoop.fs.Path(rootCp, "_manifests"))
      .map(_.getPath.getName).filter(_.startsWith("cp_"))
    assert(cpFiles.length == 1, s"exactly one sidecar: ${cpFiles.toSeq}")
    // extras still parse (the sidecar ref IS an extra line)
    assert(Snapshots.extras(spark, rootCp).contains("statscp"))
  }

  test("delta manifests reuse the parent sidecar until the delta outgrows it") {
    // the Delta log+checkpoint shape: a commit whose catalog differs
    // from the parent's sidecar by a small fraction references the
    // SAME immutable sidecar plus inline add/`-` remove lines —
    // commit-time catalog I/O tracks the DELTA, not the table; a big
    // divergence rotates to a fresh sidecar
    val root = tmpRoot("cp_delta")
    val fs = Snapshots.fs(spark, root)
    val bloom = graft.sources.KeyBloom.encode(Array.fill(8)(7L))
    def mk(i: Int) = Snapshots.FileStat(s"part-$i.parquet", i * 10L, i * 10L + 9, 10L, bloom)
    def relativized(): Seq[Snapshots.FileStat] = {
      val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
      Snapshots.fileStats(spark, root).map { s =>
        val p = new org.apache.hadoop.fs.Path(s.path).toUri.getPath
        s.copy(path = p.stripPrefix(rootUri).stripPrefix("/"))
      }
    }
    def rawManifest(v: Int): Seq[String] = {
      val in = fs.open(new org.apache.hadoop.fs.Path(f"$root/_manifests/$v%09d"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.split('\n').toSeq
      finally in.close()
    }
    val mkdirsOnly = (p: String) =>
      { Snapshots.fs(spark, p).mkdirs(new org.apache.hadoop.fs.Path(p)); () }
    spark.conf.set("spark.graft.manifest.checkpointFiles", "5")
    try {
      Snapshots.commit(spark, root, "v1",
        statsFor = _ => (0 until 100).map(mk))(mkdirsOnly)
      val cp1 = Snapshots.extras(spark, root)("statscp")

      // v2: drop 2 carried files, add 3 fresh — small delta, REUSE
      val carry2 = relativized().drop(2)
      Snapshots.commit(spark, root, "v2", carry = carry2,
        statsFor = _ => (200 until 203).map(mk),
        retryOnConflict = Some(false))(mkdirsOnly)
      assert(Snapshots.extras(spark, root)("statscp") == cp1,
        "a small delta must reuse the parent's sidecar")
      val m2 = rawManifest(2)
      assert(m2.count(l => l.startsWith("-\t")) == 2, s"2 remove lines: $m2")
      assert(m2.count(l => !l.startsWith("#") && !l.startsWith("-\t")) == 1 + 3,
        s"header + 3 add lines: $m2")
      val got2 = Snapshots.fileStats(spark, root).map(_.path.split('/').last).toSet
      val want2 = ((2 until 100) ++ (200 until 203)).map(i => s"part-$i.parquet").toSet
      assert(got2 == want2, "delta-resolved stats diverged")

      // v3: keep only 10 files — delta > 10% of the base, ROTATE
      val carry3 = relativized().take(10)
      Snapshots.commit(spark, root, "v3", carry = carry3,
        retryOnConflict = Some(false))(mkdirsOnly)
      val cp3 = Snapshots.extras(spark, root)("statscp")
      assert(cp3 != cp1, "an outgrown delta must rotate to a fresh sidecar")
      assert(rawManifest(3).count(l => !l.startsWith("#")) == 1,
        "a rotated manifest holds only its header")
      assert(Snapshots.fileStats(spark, root).size == 10)

      // retention: v3 references only cp3; expire drops cp1 with v1/v2
      Snapshots.expire(spark, root, keepVersions = 1)
      val cps = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_manifests"))
        .map(_.getPath.getName).filter(_.startsWith("cp_")).toSeq
      assert(cps == Seq(cp3), s"only the live sidecar survives: $cps")
    } finally spark.conf.unset("spark.graft.manifest.checkpointFiles")
  }

  test("property: random commit chains resolve identically inline, checkpointed and delta") {
    // the delta arithmetic (base − removes − overridden + adds) and
    // the rotation rule must be INVISIBLE: whatever sequence of
    // commits (fresh stats, carries, drops, re-adds), fileStats must
    // equal a model that never heard of sidecars. Random chains at
    // threshold 1 force every commit through the checkpoint/delta
    // machinery; the same chains at threshold ∞ stay inline — both
    // must match the model exactly.
    val rnd = new scala.util.Random(1234)
    val bloomOf = (i: Int) =>
      graft.sources.KeyBloom.encode(Array.fill(8)(i.toLong * 31 + 7))
    for (trial <- 0 until 3; checkpointed <- Seq(true, false)) {
      val root = tmpRoot(s"cp_prop${trial}_$checkpointed")
      if (checkpointed) spark.conf.set("spark.graft.manifest.checkpointFiles", "1")
      try {
        // model: version -> the relative stat set that version holds
        var model = Map.empty[String, Snapshots.FileStat]
        var nextId = 0
        for (step <- 1 to 6) {
          // random carry subset of the current model + random fresh stats
          val keep = model.values.filter(_ => rnd.nextBoolean() || model.size <= 2).toSeq
          val freshN = 1 + rnd.nextInt(4)
          val fresh = (0 until freshN).map { _ =>
            nextId += 1
            Snapshots.FileStat(s"part-$nextId.parquet",
              nextId * 100L, nextId * 100L + 99, 100L, bloomOf(nextId))
          }
          Snapshots.commit(spark, root, s"fp$step",
            statsFor = _ => fresh, carry = keep,
            retryOnConflict = Some(false)) { p =>
            Snapshots.fs(spark, p).mkdirs(new org.apache.hadoop.fs.Path(p))
          }
          val ver = Snapshots.current(spark, root).get.version
          val dataDir = new org.apache.hadoop.fs.Path(
            Snapshots.current(spark, root).get.dataPath).getName
          model = (keep.map(s => s.path -> s) ++
            fresh.map(s => s"$dataDir/${s.path}" ->
              s.copy(path = s"$dataDir/${s.path}"))).toMap
          assert(ver == step)
          // resolved stats (relativized) must equal the model — both
          // bloomful and the projected lean form
          val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
          def rel(stats: Seq[Snapshots.FileStat]) = stats.map { s =>
            val p = new org.apache.hadoop.fs.Path(s.path).toUri.getPath
            s.copy(path = p.stripPrefix(rootUri).stripPrefix("/"))
          }.map(s => s.path -> s).toMap
          val got = rel(Snapshots.fileStats(spark, root))
          assert(got == model,
            s"trial=$trial cp=$checkpointed step=$step: stats diverged " +
              s"(missing=${(model.keySet -- got.keySet).take(3)}, " +
              s"extra=${(got.keySet -- model.keySet).take(3)})")
          val lean = Snapshots.dataFilesAt(spark, root,
            Snapshots.current(spark, root).get)
          assert(lean.map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath
            .stripPrefix(rootUri).stripPrefix("/")).toSet == model.keySet)
        }
      } finally if (checkpointed)
        spark.conf.unset("spark.graft.manifest.checkpointFiles")
    }
  }

  test("expire follows checkpointed carries and sweeps expired and orphan sidecars") {
    val root = tmpRoot("cp_expire")
    val fs = Snapshots.fs(spark, root)
    spark.conf.set("spark.graft.manifest.checkpointFiles", "1")
    try {
      // v1: real files, stats checkpointed
      Snapshots.commit(spark, root, "v1",
        statsFor = p => Merge.statsWithBlooms(spark, p)) { p =>
        writeDocs(p, 0L to 9L)
      }
      val v1stats = Snapshots.fileStats(spark, root)
      assert(v1stats.nonEmpty)
      // v2: carries v1's files BY REFERENCE — the carry list lives
      // only in v2's parquet sidecar, not inline
      val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
      val carried = v1stats.map { s =>
        val p = new org.apache.hadoop.fs.Path(s.path).toUri.getPath
        s.copy(path = p.stripPrefix(rootUri).stripPrefix("/"))
      }
      Snapshots.commit(spark, root, "v2", carry = carried,
        retryOnConflict = Some(false)) { p =>
        fs.mkdirs(new org.apache.hadoop.fs.Path(p))
      }
      // an orphan sidecar (a lost race / killed writer leftover)
      val orphan = new org.apache.hadoop.fs.Path(s"$root/_manifests/cp_deadbeefdeadbeef.parquet")
      val out = fs.create(orphan, true); out.write(Array[Byte](1)); out.close()

      // inside the grace window the orphan could be an IN-FLIGHT
      // commit's sidecar — expire must leave it alone
      Snapshots.expire(spark, root, keepVersions = 2)
      assert(fs.exists(orphan), "a fresh orphan sidecar survives the grace window")
      spark.conf.set("spark.graft.manifest.orphanGraceMs", "0")
      try Snapshots.expire(spark, root, keepVersions = 1)
      finally spark.conf.unset("spark.graft.manifest.orphanGraceMs")
      // v1's DATA DIR must survive: v2's checkpointed carry references it
      assert(fs.exists(new org.apache.hadoop.fs.Path(root, "v000000001")),
        "expire must not delete a dir referenced only via a checkpointed carry")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_manifests/000000001")),
        "v1's manifest is past retention")
      assert(!fs.exists(orphan), "orphan sidecars are swept")
      val cpLeft = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_manifests"))
        .map(_.getPath.getName).filter(_.startsWith("cp_"))
      // (with delta reuse v2's carry-all references v1's OWN sidecar —
      // the shared file must survive v1's manifest expiring)
      assert(cpLeft.length == 1, s"only the live sidecar survives: ${cpLeft.toSeq}")
      // and the table still reads whole through the carried references
      val rows = spark.read.parquet(Snapshots.dataFiles(spark, root): _*)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L to 9L))
    } finally spark.conf.unset("spark.graft.manifest.checkpointFiles")
  }

  test("expire retains the newest versions, removes old data dirs and orphans") {
    val root = tmpRoot("expire")
    (1 to 3).foreach { i =>
      Snapshots.commit(spark, root, s"fp$i") { p => writeDocs(p, 0L until (i * 10L)) }
    }
    // an orphan from a killed writer (no manifest references it)
    writeDocs(s"$root/v000000099", 0L to 1L)
    val fs = Snapshots.fs(spark, root)
    def dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("v")).sorted.toSeq

    assert(dirs.size == 4)
    spark.conf.set("spark.graft.manifest.orphanGraceMs", "0")
    val deleted = try Snapshots.expire(spark, root, keepVersions = 2)
      finally spark.conf.unset("spark.graft.manifest.orphanGraceMs")
    assert(deleted == Seq(1), s"only v1 is past the retention window: $deleted")
    assert(dirs == Seq("v000000002", "v000000003"),
      "expire must drop v1 AND the unreferenced orphan (grace 0)")
    // current still resolves, with its data intact
    val cur = Snapshots.current(spark, root).get
    assert(cur.version == 3 && spark.read.parquet(cur.dataPath).count() == 30)
    // expiring down to 1 keeps exactly the newest
    assert(Snapshots.expire(spark, root, keepVersions = 1) == Seq(2))
    assert(dirs == Seq("v000000003"))
    assert(Snapshots.current(spark, root).get.version == 3)
  }

  test("the maintenance ensure* paths survive a source regenerated at the same path") {
    val s = spark
    import s.implicits._
    // a private "sf dir" whose documents.parquet we control
    val dir = tmpRoot("sfdir")
    def gen(n: Int): Unit =
      (0 until n).map(i => (i.toLong, s"text $i ${"x" * (i % 37)}", "en", "web", 10L + i))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    gen(40)
    assert(spark.read.parquet(Compaction.ensureCompacted(spark, dir)).count() == 40)
    gen(70) // regenerated at the same path — the stale-marker trap
    assert(spark.read.parquet(Compaction.ensureCompacted(spark, dir)).count() == 70,
      "compacted layout served stale rows after the source changed")
  }
}

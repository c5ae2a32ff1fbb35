package graft

import org.apache.spark.sql.functions._
import graft.operators.{EmbeddingSim, Salting}

class SaltingIvfSpec extends SparkSpec {

  test("salted join equals plain join") {
    val s = spark
    import s.implicits._
    val big = (1L to 1000L).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("v", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Salting.saltedEquiJoin(big, small, "k", col("v"))
      .select("v", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("a hot key's rows scatter across multiple salts (row-varying salt source)") {
    val s = spark
    import s.implicits._
    // one key owns every row — the skew case salting exists for
    val big = (1L to 1000L).map(i => (42L, i)).toDF("k", "v")
    val salted = big.withColumn("_salt", pmod(xxhash64(col("v")), lit(8)).cast("int"))
    val distinctSalts = salted.select("_salt").distinct().count()
    assert(distinctSalts == 8L)
  }

  test("ivf topk returns ranked neighbors on real embeddings") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val out = EmbeddingSim.ivfTopK(emb, k = 3).collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= 3))
    // ranks are 1..n and cosine is non-increasing within a query
    perQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // high recall vs brute force on the (vec_id % 100 == 0) queries
    val brute = EmbeddingSim.cosineTopK(emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfForQ = out.map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 100 == 0).toSet
    val recall = brute.intersect(ivfForQ).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf recall vs brute force too low: $recall")
  }

  test("ivf model round-trips through parquet and serves a NEW session identically") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-model").toString
    val fitted = EmbeddingSim.ivfFit(emb, nCells = 8)
    fitted.save(spark, s"$dir/model")
    // a separate session (fresh session state — the "second JVM" of
    // the fit-once/serve-many lifecycle) loads the artifact
    val s2 = spark.newSession()
    val loaded = EmbeddingSim.IvfModel.load(s2, s"$dir/model")
    assert(loaded.nCells == fitted.nCells)
    loaded.centroids.zip(fitted.centroids).foreach { case ((ci, cv, c2), (fi, fv, f2)) =>
      assert(ci == fi && c2 == f2 && cv.toSeq == fv.toSeq)
    }
    val a = EmbeddingSim.ivfProbe(emb, fitted).collect().map(_.toSeq).toSet
    val b = EmbeddingSim.ivfProbe(emb, loaded).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("ivf incremental append: probes see post-fit vectors; drift gate trips on a shifted batch") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0)
    EmbeddingSim.ivfIndexBuild(base, s"$dir/model", s"$dir/index", nCells = 8)
    val res = EmbeddingSim.ivfAppend(fresh, s"$dir/model", s"$dir/index", batchId = 1L)
    assert(res.appended == fresh.count())
    // same-distribution batch: the drift gate must NOT trip
    assert(!res.needsRefit, s"same-distribution append flagged refit (meanD2=${res.meanD2})")
    // a probe from the combined index can return appended vectors as
    // neighbors — and must, for a query whose true nearest lives in
    // the appended slice (every appended id is a candidate in its cell)
    val probed = EmbeddingSim.ivfProbeIndex(emb.filter(col("vec_id") % 100 === 0),
      s"$dir/model", s"$dir/index", k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probed.nonEmpty)
    val appendedNeighbors = probed.filter { case (_, n) => n % 10 == 0 }
    assert(appendedNeighbors.nonEmpty,
      "no appended vector ever surfaced as a neighbor — the index append is not visible to probes")
    // drift: an obviously shifted batch (embeddings scaled far away)
    // must trip the refit gate
    val shifted = fresh.select(col("vec_id") + 1000000L as "vec_id",
      transform(col("embedding"), x => x * lit(50.0f)).as("embedding"))
    val res2 = EmbeddingSim.ivfAppend(shifted, s"$dir/model", s"$dir/index", batchId = 2L)
    assert(res2.needsRefit, s"shifted batch did not trip the drift gate (meanD2=${res2.meanD2})")
  }

  test("ivfTopKPersisted fits+saves on first call, then serves from the artifact") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-persist").toString
    val first = EmbeddingSim.ivfTopKPersisted(emb, s"$dir/model").collect().map(_.toSeq).toSet
    assert(new java.io.File(s"$dir/model").exists())
    val modelFiles = spark.read.parquet(s"$dir/model").inputFiles.toSeq
    val second = EmbeddingSim.ivfTopKPersisted(emb, s"$dir/model").collect().map(_.toSeq).toSet
    assert(first == second && first.nonEmpty)
    // second call must NOT have refit/rewritten the artifact
    assert(spark.read.parquet(s"$dir/model").inputFiles.toSeq == modelFiles)
  }

  test("ivf fit cache refits when data at the same path is rewritten") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-stale").toString
    def write(shift: Double): Unit =
      (0L until 64L).map(i => (i, Array.tabulate(4)(j => (i % 8 + j + shift).toFloat)))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/emb")
    write(0.0)
    val before = EmbeddingSim.ivfTopK(s.read.parquet(s"$dir/emb"), k = 2, nCells = 4)
      .collect().map(_.toSeq).toSet
    Thread.sleep(1100) // ensure a distinct mod-time second on coarse filesystems
    write(100.0) // same path, very different geometry
    val after = EmbeddingSim.ivfTopK(s.read.parquet(s"$dir/emb"), k = 2, nCells = 4)
      .collect().map(_.toSeq).toSet
    // a stale plan-keyed cache would score the new vectors against the
    // OLD centroids; with per-file signatures the refit sees the new
    // data, so the result matches a fresh fit+probe exactly
    val fresh = EmbeddingSim.ivfProbe(
      s.read.parquet(s"$dir/emb"),
      EmbeddingSim.ivfFit(s.read.parquet(s"$dir/emb"), nCells = 4), k = 2)
      .collect().map(_.toSeq).toSet
    assert(after == fresh, "cache served stale centroids after the data changed")
    assert(before != after || before == fresh)
  }
}

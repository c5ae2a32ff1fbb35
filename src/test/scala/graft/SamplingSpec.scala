package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

class SamplingSpec extends SparkSpec {

  test("training pipeline output is the intersection of its three stages") {
    import graft.operators.{Dedup, Sampling, TextAnalysis, TrainingPipeline}
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = TrainingPipeline.kept(docs).collect().map(_.getLong(0)).toSet
    val kept = Dedup.nearDupKeep(docs).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityFilter(docs).collect().map(_.getLong(0)).toSet
    val sample = Sampling.hashSample(docs).collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty && out == (kept & quality & sample))
  }

  test("budget pipeline: members come from the filtered pool, budget respected") {
    import graft.operators.{Dedup, TextAnalysis, TrainingPipeline}
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val budget = 500L
    val rows = TrainingPipeline.keptBudget(docs, budget).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val kept = Dedup.nearDupKeep(docs).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityFilter(docs).collect().map(_.getLong(0)).toSet
    assert(rows.forall { case (id, _, _) => kept(id) && quality(id) })
    // every kept span ends inside the budget
    assert(rows.forall { case (_, n, before) => before + n <= budget })
    assert(rows.map(_._2).sum <= budget)
  }

  private def realDocs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("hash sample is deterministic, ~pct-sized, and repartition-invariant") {
    val a = Sampling.hashSample(realDocs, 10).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(realDocs.repartition(7), 10)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "membership must not depend on layout")
    val n = realDocs.count()
    assert(a.length > 0 && a.length < n / 4, s"${a.length} of $n sampled")
  }

  test("mixture sample: oversized sources shrink to ~quota, small sources keep all") {
    val s = spark
    import s.implicits._
    // srcBig: 100 docs; srcSmall: 3 docs (< quota -> all kept)
    val d = ((1L to 100L).map(i => (i, s"text $i", "srcBig")) ++
      Seq((201L, "a", "srcSmall"), (202L, "b", "srcSmall"), (203L, "c", "srcSmall")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixtureSample(d, quota = 10).collect()
      .map(r => r.getString(1) -> r.getLong(0))
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc("srcSmall") == 3)
    // hash mod 100 < 10 keeps ~10 of 100 (exact count is hash-dependent
    // but must be well under the source size and non-empty)
    assert(bySrc("srcBig") >= 3 && bySrc("srcBig") <= 25, s"got $bySrc")
    // deterministic: same membership under repartition
    val again = Sampling.mixtureSample(d.repartition(7), quota = 10)
      .collect().map(_.getLong(0)).sorted
    assert(again.sameElements(out.map(_._2).sorted))
  }

  test("temperature sample: kept counts grow as sqrt(source size)") {
    val s = spark
    import s.implicits._
    // sources of 400 / 100 / 4 docs: sqrt scaling keeps ~2*20 / ~2*10
    // / ~2*2 — the big source shrinks RELATIVELY (10% vs 20% vs 100%)
    val d = ((1L to 400L).map(i => (i, s"t$i", "big")) ++
      (1001L to 1100L).map(i => (i, s"t$i", "mid")) ++
      (2001L to 2004L).map(i => (i, s"t$i", "tiny")))
      .toDF("doc_id", "text", "source")
    val bySrc = Sampling.temperatureSample(d).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // thresholds: 2*floor(sqrt(n)) of n -> expected 40/400, 20/100, 4/4
    assert(bySrc("tiny") == 4, s"tiny source must keep everything: $bySrc")
    assert(bySrc("mid") >= 10 && bySrc("mid") <= 30, s"got $bySrc")
    assert(bySrc("big") >= 25 && bySrc("big") <= 55, s"got $bySrc")
    // relative shrink is monotone in source size
    assert(bySrc("big").toDouble / 400 < bySrc("mid").toDouble / 100)
    assert(bySrc("mid").toDouble / 100 < 1.0)
  }

  test("budget select: highest-score docs first, spans fit entirely in budget") {
    val s = spark
    import s.implicits._
    // scores (distinct tokens): doc1=5, doc2=3, doc3=2; tokens 5/3/2
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "f g h"),
      (3L, "i j")).toDF("doc_id", "text")
    // budget 8: doc1 (5, before=0) + doc2 (3, before=5) fit; doc3 (before=8) doesn't
    val kept = Sampling.budgetSelect(d, budgetTokens = 8L).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(kept == Map(1L -> 0L, 2L -> 5L))
    // budget 10: all three fit (doc3 spans [8, 10])
    assert(Sampling.budgetSelect(d, budgetTokens = 10L).count() == 3)
  }

  test("sequence packing: bins respect the streaming first-fit rule per bucket") {
    val s = spark
    import s.implicits._
    // one bucket (ids ≡ 0 mod 32), token counts 3, 2, 4 -> with
    // budget 5: offsets 0, 3, 5 -> bins 0, 0, 1
    val d = Seq((0L, "a b c"), (32L, "d e"), (64L, "f g h i"))
      .toDF("doc_id", "text")
    val out = graft.operators.Sampling.sequencePacking(d, budget = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(0L -> (0L, 0L), 32L -> (0L, 3L), 64L -> (1L, 5L)), s"got $out")
  }

  test("doc chunks: overlapping windows cover all tokens with the right stride") {
    val d = docsDf(1L -> (1 to 30).map(i => s"t$i").mkString(" "), 2L -> "")
    val chunks = graft.operators.TextAnalysis.docChunks(d, chunkTokens = 16, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(chunks.forall(_._1 == 1L)) // empty doc yields no chunks
    val byIdx = chunks.sortBy(_._2)
    // 30 tokens, stride 12: starts 0, 12, 24 -> sizes 16, 16, 6
    assert(byIdx.map(c => (c._3, c._4)).toSeq == Seq((0L, 16L), (12L, 16L), (24L, 6L)))
    assert(byIdx.head._5.startsWith("t1 t2 ") && byIdx.last._5 == "t25 t26 t27 t28 t29 t30")
    // consecutive chunks overlap by exactly 4 tokens
    assert(byIdx(0)._5.split(" ").takeRight(4).toSeq == byIdx(1)._5.split(" ").take(4).toSeq)
  }

  test("stratified sample keeps at most n per stratum, deterministically") {
    val out = Sampling.stratifiedSample(realDocs, 5)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 5), s"$perLang")
    assert(perLang.values.exists(_ == 5), "populated strata must fill their quota")
    val again = Sampling.stratifiedSample(realDocs, 5).collect().toSet
    assert(out.collect().toSet == again)
  }

  test("normalized dedup collapses case/punctuation variants") {
    val d = docsDf(
      7L -> "Hello, World!",
      3L -> "hello world",
      5L -> "HELLO   world.",
      9L -> "different text")
    val groups = Dedup.normalizedGroups(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(groups.length == 2)
    val hw = groups.find(_._1 == "hello world").get
    assert(hw._2 == 3L && hw._3 == 3L)
  }

  test("quality filter applies integer-threshold gates") {
    val d = docsDf(
      1L -> "the of a in and the of a in and",            // all stopwords -> fails ratio
      2L -> "short",                                       // too few tokens/chars
      3L -> "orders stream through the data table pipeline every day")
    val kept = TextAnalysis.qualityFilter(d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"got $kept")
  }

  test("simhash keep drops the larger id of each hamming-close pair") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val d = docsDf(
      1L -> base,
      2L -> (base + " now"), // near-dup of 1 at bigram level
      3L -> "completely unrelated words about database storage engines and columns")
    val kept = TextAnalysis.simHashKeep(d).collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(3L) && !kept.contains(2L), s"got $kept")
  }

  test("split assignment is an exhaustive deterministic partition with the documented arithmetic") {
    val docs = realDocs
    val rows = Sampling.splitAssign(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == docs.count())
    // recompute each split independently from the shared constants
    val (a, b) = Config.coeffs(4)
    rows.foreach { case (id, bucket, split) =>
      val h = ((a * java.lang.Math.floorMod(id, Config.P) + b) % Config.P) % 100
      assert(bucket == h, s"doc $id bucket")
      val expected =
        if (h < Sampling.TrainPct) "train"
        else if (h < Sampling.TrainPct + Sampling.ValPct) "val"
        else "test"
      assert(split == expected, s"doc $id split")
    }
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"all three splits must be populated at 500 docs: $bySplit")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("release pipeline is the stage intersection with the split stamped on") {
    import graft.operators.TrainingPipeline
    val docs = realDocs
    val out = TrainingPipeline.release(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val blocked = TextAnalysis.blocklistFilter(docs).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityFilter(docs).collect().map(_.getLong(0)).toSet
    val kept = Dedup.nearDupKeep(docs).collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty && out.keySet == (blocked & quality & kept))
    val splits = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach { case (id, s) => assert(s == splits(id)) }
  }

  test("curriculum order equals the naive global ranking, bijectively") {
    val docs = realDocs
    val out = Sampling.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == docs.count())
    // ranks are a permutation of 1..n
    assert(out.map(_._3).sorted.toSeq == (1L to out.length).toSeq)
    // the two-phase rank must equal the naive (score desc, id) sort
    val naive = out.sortBy { case (id, score, _) => (-score, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, _, rank) =>
      assert(rank == naive(id), s"doc $id rank $rank != naive ${naive(id)}")
    }
  }

  test("shard assignment equals the naive global cumsum and balances shards") {
    import graft.Config
    val docs = realDocs
    val budget = 500L
    val out = Sampling.shardAssign(docs, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == docs.count())
    // the two-phase bucket cumsum must equal ONE running sum in the
    // global hash order (the order a naive single-window form uses)
    val (a, b) = Config.coeffs(5)
    def h(id: Long): Long = (a * java.lang.Math.floorMod(id, Config.P) + b) % Config.P
    var run = 0L
    out.sortBy { case (id, _, _, _) => (h(id), id) }.foreach {
      case (id, n, before, shard) =>
        assert(before == run, s"doc $id tokens_before $before != naive $run")
        assert(shard == before / budget)
        run += n
    }
    // every shard except the last is filled to within one doc of the
    // budget (streaming cut: a shard closes when its offset crosses)
    val maxDoc = out.map(_._2).max
    val byShard = out.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    val last = byShard.keys.max
    byShard.foreach { case (s, toks) =>
      if (s != last)
        assert(toks + maxDoc >= budget, s"shard $s underfilled: $toks")
    }
  }

  test("sharded write: one file per shard directory, identity through the layout") {
    import graft.sources.Shards
    val root = Shards.ensureShardedTable(spark, Sf0001)
    val shardDirs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${d.getName}: ${files.length} files — the pre-write cluster should make one")
    }
    val back = Shards.shardedRoundTrip(spark, Sf0001)
    assert(back.columns.toSeq == Seq("doc_id", "n_tokens", "tokens_before", "shard"))
    val direct = Sampling.shardAssign(spark.read.parquet(s"$Sf0001/documents.parquet"))
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty,
      "the layout must not change the assignment rows")
    // the one-shard read prunes at the PARTITION level: the scan's
    // PartitionFilters carry the shard predicate, no data filter
    val one = Shards.shardRead(spark, Sf0001, 0L)
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    assert(scan.partitionFilters.exists(_.toString.contains("shard")),
      s"shard predicate must be a partition filter, was: ${scan.partitionFilters}")
    assert(one.collect().forall(_.getLong(3) == 0L))
  }

  test("split leakage reports exactly the cross-split near-dup pairs") {
    import graft.operators.MinHashLsh
    val docs = realDocs
    val splits = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = MinHashLsh.similarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val leak = Sampling.splitLeakage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    leak.foreach { case (l, r, sl, sr) =>
      assert(pairs((l, r)), s"($l,$r) not a verified near-dup pair")
      assert(splits(l) == sl && splits(r) == sr && sl != sr)
    }
    val expected = pairs.filter { case (l, r) => splits(l) != splits(r) }
    assert(leak.map(t => (t._1, t._2)).toSet == expected)
  }
}

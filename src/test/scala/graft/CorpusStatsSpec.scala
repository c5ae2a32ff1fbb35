package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, MinHashLsh, TextAnalysis}

class CorpusStatsSpec extends SparkSpec {

  test("vocab top-k: ranks are dense, counts non-increasing, df <= tf") {
    val d = docsDf(
      1L -> "a a a b b c",
      2L -> "a b d",
      3L -> "a c c")
    val rows = CorpusStats.vocabTopK(d, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: 5 occurrences in 3 docs; c: 3 in 2; b: 3 in 2 (tie -> b before c)
    assert(rows.toSeq == Seq(("a", 5L, 3L, 1L), ("b", 3L, 2L, 2L), ("c", 3L, 2L, 3L)))
  }

  test("heavy hitters: estimates carry the one-sided CMS guarantee and recompute") {
    val d = docsDf(
      1L -> "a a a a a b b b c c",
      2L -> "a a b c d e",
      3L -> "a d d f g")
    val rows = CorpusStats.heavyHitters(d, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (-t._2, t._1))
    // exact: a=8 b=4 d=3 c=3; top-4 with ties broken by token asc
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", 8L), ("b", 4L), ("c", 3L), ("d", 3L)))
    // one-sided guarantee: est >= exact, overcount = est - exact >= 0
    rows.foreach { case (tok, exact, est, over) =>
      assert(est >= exact && over == est - exact && over >= 0,
        s"CMS guarantee violated for '$tok': exact=$exact est=$est")
    }
    // model the sketch directly: est == min over rows of the summed
    // counters of colliding tokens (linearity of the build)
    val exact = Map("a" -> 8L, "b" -> 4L, "c" -> 3L, "d" -> 3L,
      "e" -> 1L, "f" -> 1L, "g" -> 1L)
    def h(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % Config.P)
    def bucket(r: Int, tok: String) = {
      val (a, b) = Config.coeffs(r)
      ((a * h(tok) + b) % Config.P) % CorpusStats.CmsWidth
    }
    rows.foreach { case (tok, _, est, _) =>
      val model = (0 until CorpusStats.CmsDepth).map { r =>
        exact.collect { case (t, c) if bucket(r, t) == bucket(r, tok) => c }.sum
      }.min
      assert(est == model, s"'$tok': est=$est model=$model")
    }
  }

  test("unigram score: common-token docs outscore rare-token docs; score recomputes") {
    val d = docsDf(
      1L -> "a a a a", // all most-common token
      2L -> "x y z w", // all singletons
      3L -> "a a x y")
    val rows = CorpusStats.unigramScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val total = 12.0 // 12 token occurrences overall
    // doc 1: each 'a' has ctf 6 -> sum_tf 24
    assert(rows(1L)._2 == 24L)
    assert(rows(1L)._3 == (24.0 / 4.0) / total)
    // doc 2: four singleton-ish tokens: x,y have ctf 2 (appear in doc 3 too), z,w ctf 1
    assert(rows(2L)._2 == 2 + 2 + 1 + 1)
    assert(rows(1L)._3 > rows(2L)._3)
  }

  test("bigram fluency: word order matters, ppm recomputes, short docs zero-fill") {
    val d = docsDf(
      1L -> "the cat sat", // the canonical order, repeated by doc 2
      2L -> "the cat sat",
      3L -> "sat cat the", // same unigrams, scrambled order
      4L -> "x")           // < 2 tokens
    val rows = CorpusStats.bigramFluency(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // bigram stream: (the,cat)x2 (cat,sat)x2 (sat,cat) (cat,the)
    // c(the,.)=2 c(cat,.)=3 c(sat,.)=1
    // P(cat|the)=2/2 P(sat|cat)=2/3 P(cat|sat)=1/1 P(the|cat)=1/3
    val pCatSat = 1000000L * 2 / 3
    val pTheCat = 1000000L / 3
    assert(rows(1L) == ((2L, 1000000L + pCatSat, (1000000L + pCatSat) / 2)))
    assert(rows(1L) == rows(2L))
    assert(rows(3L)._2 == 1000000L + pTheCat)
    assert(rows(1L)._3 > rows(3L)._3,
      "a scrambled doc must score below the canonical order it shares unigrams with")
    assert(rows(4L) == ((0L, 0L, 0L)), "sub-bigram docs surface with zero counts")
  }

  test("source overlap: identical sources have jaccard 1, disjoint pairs absent") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "abcdefgh", "s1"),
      (2L, "abcdefgh", "s2"), // same text as s1 -> identical shingle sets
      (3L, "zzzzzzzz", "s3")  // shares no 3-shingle with the others
    ).toDF("doc_id", "text", "source")
    val rows = CorpusStats.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(rows == Map(("s1", "s2") -> 1.0)) // s3 pairs have zero overlap -> absent
  }

  test("chunk dedup: one row per distinct chunk, keep-first, copy counts add up") {
    // docs 1 and 2 are identical -> every chunk duplicated; doc 3 unique
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = docsDf(1L -> text, 2L -> text, 3L -> "solo chunk here")
    val all = TextAnalysis.docChunks(d).count()
    val kept = CorpusStats.chunkDedup(d)
    val rows = kept.collect()
    assert(rows.map(_.getAs[Long]("chunk_hash")).distinct.length == rows.length)
    assert(rows.map(_.getAs[Long]("n_copies")).sum == all)
    // doc 2's chunks are all dups of doc 1's -> doc 2 contributes nothing
    assert(!rows.map(_.getAs[Long]("doc_id")).contains(2L))
  }

  test("span dedup: repeated spans vanish from later docs; unique spans survive in order") {
    // doc 1 owns two 16-token spans A B; doc 2 = A + unique span C;
    // doc 3 = B alone. Keep-first: doc 2 keeps only C, doc 3 keeps nothing.
    val a = (1 to 16).map(i => s"a$i").mkString(" ")
    val b = (1 to 16).map(i => s"b$i").mkString(" ")
    val c = (1 to 16).map(i => s"c$i").mkString(" ")
    val d = docsDf(1L -> s"$a $b", 2L -> s"$a $c", 3L -> b)
    val rows = CorpusStats.spanDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows(1L) == ((2L, 0L, s"$a $b")))
    assert(rows(2L) == ((2L, 1L, c)))
    assert(rows(3L) == ((1L, 1L, "")))
  }

  test("span dedup invariants on the real corpus: global uniqueness and conservation") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = CorpusStats.spanDedup(docs).collect()
    val chunks = graft.operators.TextAnalysis.docChunks(docs, 16, overlap = 0)
    val totalChunks = chunks.count()
    val distinctTexts = chunks.select("chunk_text").distinct().count()
    // conservation: every chunk is either kept or dropped, and the
    // kept count across the corpus equals the number of DISTINCT spans
    val kept = out.map(r => r.getLong(1) - r.getLong(2)).sum
    val dropped = out.map(_.getLong(2)).sum
    assert(kept + dropped == totalChunks)
    assert(kept == distinctTexts,
      s"kept $kept != distinct spans $distinctTexts — keep-first must keep exactly one per span")
    // global uniqueness: no span text appears twice among the cleaned docs
    val keptSpans = out.flatMap(r => r.getString(3).split(" ").grouped(16).map(_.mkString(" ")))
      .filter(_.nonEmpty)
    assert(keptSpans.length == keptSpans.distinct.length,
      "a span survived in two documents")
  }

  test("containment pairs: a short doc embedded in a long one is caught at cont ~1") {
    val shortT = "the quick brown fox jumps over the lazy dog"
    val longT = shortT + " while the calm owl watches from a tall oak tree nearby tonight"
    val d = docsDf(1L -> shortT, 2L -> longT,
      3L -> "completely different words qqq www eee rrr ttt yyy")
    val rows = CorpusStats.containmentPairs(d, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 1)
    val (l, r, contL, contR) = rows.head
    assert((l, r) == (1L, 2L))
    assert(contL > 0.95) // nearly every shingle of the short doc is in the long one
    assert(contR < 0.8)  // but not vice versa
    // symmetric Jaccard under-scores this pair: it is NOT in similar_pairs at 0.8
    assert(MinHashLsh.similarPairs(d, threshold = 0.8).count() == 0)
  }

  test("containment prefix filter: ZERO false negatives vs brute force on random docs") {
    // small vocabulary forces heavy overlap; seeded -> reproducible
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = (1L to 30L).map { i =>
      val n = 8 + rnd.nextInt(16)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // plant embedded docs: contiguous token slices of earlier docs
    // (every trigram of a slice is a trigram of its source -> cont 1.0)
    val planted = (31L to 40L).map { i =>
      val (_, src) = base(rnd.nextInt(base.length))
      val toks = src.split(" ").toSeq
      val len = 5 + rnd.nextInt(math.max(1, toks.length - 5))
      val off = rnd.nextInt(math.max(1, toks.length - len + 1))
      i -> toks.slice(off, off + len).mkString(" ")
    }
    val docs = base ++ planted
    val d = docsDf(docs: _*)
    val got = CorpusStats.containmentPairs(d, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(4), r.getDouble(5))).toMap
    // brute force: distinct word trigrams per doc, all pairs
    def grams(t: String): Set[Seq[String]] = {
      val toks = t.split(" ").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Set.empty else toks.sliding(3).map(_.toSeq).toSet
    }
    val gs = docs.map { case (id, t) => id -> grams(t) }.toMap
    var expected = 0
    for (a <- docs.map(_._1); b <- docs.map(_._1) if a < b) {
      val (ga, gb) = (gs(a), gs(b))
      if (ga.nonEmpty && gb.nonEmpty) {
        val inter = (ga & gb).size.toDouble
        val (cl, cr) = (inter / ga.size, inter / gb.size)
        if (math.max(cl, cr) >= 0.8) {
          expected += 1
          assert(got.contains((a, b)),
            s"missed pair ($a,$b) cont=($cl,$cr) — prefix filter recall broken")
          val (gl, gr) = got((a, b))
          assert(math.abs(gl - cl) < 1e-12 && math.abs(gr - cr) < 1e-12,
            s"pair ($a,$b): got ($gl,$gr) expected ($cl,$cr)")
        }
      }
    }
    // the fixture must actually exercise the property
    assert(expected >= 3, s"weak fixture: only $expected qualifying pairs")
    assert(got.size == expected, s"got ${got.size} pairs, brute force says $expected")
  }

  test("bm25: equal-length docs rank by tf, df counts containing docs, top-k bounds") {
    val d = docsDf(
      1L -> "dup dup dup filler words here",
      2L -> "dup filler words here again now",
      3L -> "no match tokens in this one",
      4L -> "dup dup filler words here too")
    val out = CorpusStats.bm25TopK(d, Seq("dup"), topK = 3).collect()
    assert(out.length == 3, "doc 3 has tf 0 and must not appear")
    assert(out.forall(_.getAs[Long]("df") == 3L))
    // all matching docs have dl = 6, so score order IS tf order
    val ranked = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(ranked == Seq(1L, 4L, 2L), s"got $ranked")
    assert(out.forall(r => r.getAs[Double]("score") > 0.0))
  }

  test("bm25: rarer terms score higher at equal tf and length") {
    val d = docsDf(
      1L -> "rare common filler words here",
      2L -> "common filler words here also",
      3L -> "common filler words here again")
    val out = CorpusStats.bm25TopK(d, Seq("rare", "common"), topK = 1).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Double]("score")).toMap
    assert(out("rare") > out("common"),
      s"idf must favor the rarer term: $out")
  }

  test("hybrid rerank: anchor tops its own list, candidates come from bm25 retrieval") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val retrieved = CorpusStats.bm25TopK(docs, topK = CorpusStats.HybridRetrieveK)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"))).toSet
    val out = CorpusStats.hybridRerank(docs, emb).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val term = r.getAs[String]("term")
      assert(retrieved((term, r.getAs[Long]("doc_id"))),
        "reranked docs must be bm25-retrieved candidates")
      assert(r.getAs[Long]("rerank") <= CorpusStats.HybridTopK)
    }
    // the bm25 rank-1 doc is the cosine anchor: cos(anchor, anchor)=1
    out.filter(_.getAs[Long]("bm25_rank") == 1L).foreach { r =>
      assert(r.getAs[Long]("rerank") == 1L,
        s"anchor must rerank first for term ${r.getAs[String]("term")}")
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-12)
    }
  }

  test("source quality report: counts conserve and quality matches the gate") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = CorpusStats.sourceQuality(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_quality"),
          r.getAs[Long]("total_tokens"), r.getAs[Double]("mean_tokens"))).toMap
    assert(out.values.map(_._1).sum == docs.count())
    val gate = TextAnalysis.qualityFilter(docs).select("doc_id")
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    out.foreach { case (src, (n, q, tot, mean)) =>
      assert(q == gate.getOrElse(src, 0L), s"$src quality count")
      assert(q <= n && mean == tot.toDouble / n.toDouble)
    }
  }

  test("corpus manifest aggregates the dataset-card numbers exactly") {
    val d = docsDf(1L -> "a b c", 2L -> "d e")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s1"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = CorpusStats.corpusManifest(d).collect().head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_sources") == 1L && r.getAs[Long]("n_langs") == 1L)
    assert(r.getAs[Long]("total_tokens") == 5L)
    assert(r.getAs[Long]("total_chars") == 8L)
    assert(r.getAs[Long]("min_tokens") == 2L && r.getAs[Long]("max_tokens") == 3L)
  }

  test("length histogram buckets integer token counts exactly") {
    val d = docsDf(
      1L -> "a b c",
      2L -> Seq.fill(20)("w").mkString(" "),
      3L -> "x y")
    val out = CorpusStats.lengthHistogram(d, width = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set((0L, 2L, 5L, 2L, 3L), (1L, 1L, 20L, 20L, 20L)), s"got $out")
  }

  test("boilerplate strip: chunks in >= 3 docs vanish everywhere, rare chunks survive") {
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val unique = (1 to 16).map(i => s"u$i").mkString(" ")
    val d = docsDf(
      1L -> s"$boiler $unique",
      2L -> boiler,
      3L -> boiler,
      4L -> "short unique text")
    val rows = CorpusStats.boilerplateStrip(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((2L, 1L, unique)))     // boiler chunk stripped, unique kept
    assert(rows(2L) == ((1L, 1L, "")))          // no copy survives anywhere
    assert(rows(3L) == ((1L, 1L, "")))
    assert(rows(4L) == ((1L, 0L, "short unique text")))
  }

  test("intra dedup: later in-doc repeats drop; the plan is shuffle-free") {
    val c1 = (1 to 16).map(i => s"a$i").mkString(" ")
    val c2 = (1 to 16).map(i => s"z$i").mkString(" ")
    val d = docsDf(
      1L -> Seq(c1, c2, c1).mkString(" "), // 3rd chunk repeats the 1st
      2L -> c2)                            // same chunk in ANOTHER doc is untouched
    val res = CorpusStats.intraDedup(d)
    val rows = res.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((3L, 1L, s"$c1 $c2")))
    assert(rows(2L) == ((1L, 0L, c2)))
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a narrow shuffle-free plan:\n$plan")
  }

  test("corpus diff: statuses partition the union of both snapshots") {
    val d = docsDf((0L until 70L).map(i => i -> s"text number $i"): _*)
    val rows = CorpusStats.corpusDiff(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val changed = (0L until 70L).count(i => i % 7 == 2 && i % 10 != 3 && i % 10 != 7)
    assert(rows("added") == 7L)    // %10==3: absent from old
    assert(rows("removed") == 7L)  // %10==7: absent from new
    assert(rows("changed") == changed.toLong)
    assert(rows.values.sum == 70L) // every id is in at least one snapshot
  }

  test("skew report flags a planted hot key at rank 1 with the exact ratio") {
    val s = spark
    import s.implicits._
    // 99% of rows on key 7, the remainder spread over 100 cold keys
    val rows = (1L to 9900L).map(_ => 7L) ++ (0L until 100L).filter(_ != 7L)
    val df = rows.toDF("user_id")
    val rep = CorpusStats.skewReport(df, topK = 5).collect()
    assert(rep.length == 5)
    val first = rep.head
    assert(first.getLong(0) == 1L && first.getLong(1) == 7L)
    assert(first.getLong(2) == 9900L)
    // 100 distinct keys, 9999 rows: 9900 * 100 * 1000 div 9999
    assert(first.getLong(3) == 9900L * 100L * 1000L / 9999L)
    // cold keys report ~1/100 of the mean at permille scale
    assert(rep.tail.forall(r => r.getLong(2) == 1L && r.getLong(3) < 150L))
  }

  test("table stats: one exact row per column, keys ndv, numeric min/max") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val n = docs.count()
    val stats = CorpusStats.tableStats(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.keySet ==
      (CorpusStats.StatsNumCols ++ CorpusStats.StatsStrCols).toSet)
    stats.values.foreach { r =>
      assert(r.getLong(1) == n)        // n_rows
      assert(r.getLong(2) == 0L)       // no nulls in the testdata
    }
    val id = stats("doc_id")
    assert(id.getLong(3) == n)         // doc_id is a key: ndv == rows
    assert(id.getLong(4) == 0L && id.getLong(5) == n - 1) // dense ids
    assert(stats("text").isNullAt(4) && stats("text").isNullAt(5))
    assert(stats("lang").getLong(3) < n) // categorical: ndv << rows
  }

  test("composition view maintained from the change feed equals a recompute at every step") {
    val s = spark
    import s.implicits._
    import graft.sources.{Merge, Snapshots}
    spark.conf.set("spark.graft.merge.changeFeed", "true")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_ivm").toString
      def row(id: Long, src: String, lang: String, text: String) =
        (id, src, lang, text.length.toLong, text)
      val base = Seq(
        row(1L, "web", "en", "alpha beta gamma"),
        row(2L, "web", "en", "delta epsilon"),
        row(3L, "web", "de", "zeta eta theta iota"),
        row(4L, "books", "en", "kappa lambda"))
        .toDF("doc_id", "source", "lang", "n_chars", "text")
      Snapshots.commit(spark, root, "base",
        statsFor = p => Merge.statsWithBlooms(spark, p)) { p =>
        base.coalesce(2).write.parquet(p)
      } // v1
      var state = CorpusStats.compositionOf(Merge.readCurrent(spark, root))

      def check(tagS: String): Unit = {
        val fresh = CorpusStats.compositionOf(Merge.readCurrent(spark, root))
        assert(state.exceptAll(fresh).isEmpty && fresh.exceptAll(state).isEmpty,
          s"$tagS: maintained composition diverged from recompute " +
            s"(state=${state.collect().mkString(",")} " +
            s"fresh=${fresh.collect().mkString(",")})")
      }

      // v2: an update that MOVES doc 3 to (web, en) — debit (web, de)
      // to zero and credit (web, en) — plus an insert in a new group
      Merge.merge(spark, root, Seq(
        (3L, "web", "en", 9L, "mu nu xi.", Merge.UpsertOp),
        (9L, "wiki", "fr", 11L, "omicron pi.", Merge.UpsertOp))
        .toDF("doc_id", "source", "lang", "n_chars", "text", "op"), "m1")
      state = CorpusStats.compositionApplyFeed(state,
        Merge.changeFeed(spark, root, 1, 2))
      check("after group-moving update + insert")
      assert(state.filter(col("lang") === "de").isEmpty,
        "a group whose last doc moved away must drop out")

      // v3: a COW delete and a token-count-changing in-place update
      Merge.merge(spark, root, Seq(
        (4L, "books", "en", 0L, "", Merge.DeleteOp),
        (2L, "web", "en", 21L, "rho sigma tau upsilon", Merge.UpsertOp))
        .toDF("doc_id", "source", "lang", "n_chars", "text", "op"), "m2")
      state = CorpusStats.compositionApplyFeed(state,
        Merge.changeFeed(spark, root, 2, 3))
      check("after delete + in-place update")
      assert(state.filter(col("source") === "books").isEmpty,
        "a group whose last doc was deleted must drop out")

      // the exactly-once contract is enforced by the feed path, not
      // the arithmetic — but a violation must be VISIBLE: a
      // double-applied span drives the deleted group NEGATIVE and the
      // row is kept, never silently dropped
      val corrupted = CorpusStats.compositionApplyFeed(state,
        Merge.changeFeed(spark, root, 2, 3))
      assert(corrupted.filter(col("source") === "books")
        .select("n_docs").head().getLong(0) == -1L,
        "a double-applied delete must surface as a negative count")
    } finally spark.conf.unset("spark.graft.merge.changeFeed")
  }
}

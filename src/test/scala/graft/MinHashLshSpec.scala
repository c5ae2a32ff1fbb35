package graft

import org.apache.spark.sql.functions._
import graft.operators.{MinHashLsh, Shingling}

class MinHashLshSpec extends SparkSpec {

  test("narrow per-row signatures equal the aggregated formulation on sf0.001") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val narrow = MinHashLsh.signatures(docs).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    val agg = MinHashLsh.signaturesAgg(docs).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(narrow == agg)
  }

  private val nearDup = docsDf(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat", // near-dup of 1
    3L -> "completely different content with nothing shared zzz qqq",
    4L -> "the quick brown fox jumps over the lazy dog" // exact dup of 1
  )

  test("signatures are deterministic across runs and have S columns") {
    val a = MinHashLsh.signatures(nearDup).orderBy("doc_id").collect()
    val b = MinHashLsh.signatures(nearDup).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.head.length == 1 + Config.NumHashes)
  }

  test("identical docs have identical signatures; disjoint docs differ") {
    val sigs = MinHashLsh.signatures(nearDup).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (1 to Config.NumHashes).map(r.getLong)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
  }

  test("bands: B entries per doc, band index part of the key (fixes Q5)") {
    val b = MinHashLsh.bands(nearDup)
    assert(b.groupBy("doc_id").count().collect().forall(_.getLong(1) == Config.Bands))
    assert(b.select("band").distinct().count() == Config.Bands)
  }

  test("exact dup pair is always a candidate; verified with jaccard 1.0") {
    val cand = MinHashLsh.candidatePairs(nearDup).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 4L)))
    val sim = MinHashLsh.similarPairs(nearDup).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sim((1L, 4L)) == 1.0)
    // disjoint doc 3 never pairs
    assert(!sim.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("similar pairs are a subset of candidates and meet the threshold") {
    val cand = MinHashLsh.candidatePairs(nearDup).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = MinHashLsh.similarPairs(nearDup).collect()
    assert(sim.forall(r => cand.contains((r.getLong(0), r.getLong(1)))))
    assert(sim.forall(_.getDouble(2) >= Config.Threshold))
  }

  test("minhash estimate approximates exact jaccard (within 0.2 at S=60)") {
    val est = MinHashLsh.estimatedPairs(nearDup).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = Shingling.shingleSets(nearDup).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    est.foreach { case ((l, r), e) =>
      val t = sets(l).intersect(sets(r)).size.toDouble / sets(l).union(sets(r)).size
      assert(math.abs(e - t) < 0.2, s"pair ($l,$r): est $e vs true $t")
    }
  }

  test("symmetric output contains both directions with texts") {
    val sym = MinHashLsh.pairsSymmetric(nearDup).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sym.contains((1L, 4L)) && sym.contains((4L, 1L)))
  }

  test("maxBucket cap drops degenerate buckets but keeps small ones") {
    val many = docsDf((1L to 20L).map(i => i -> "identical text shared by everyone"): _*)
    val capped = MinHashLsh.candidatePairs(many, maxBucket = Some(5)).count()
    val uncapped = MinHashLsh.candidatePairs(many).count()
    assert(uncapped == 20L * 19 / 2)
    assert(capped == 0)
  }

  test("group sketch UDAF equals per-column min of member signatures, repartition-invariant") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val viaUdaf = MinHashLsh.groupSketch(docs).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    val viaMin = MinHashLsh.signatures(docs)
      .groupBy((col("doc_id") % 50).as("g"))
      .agg(min(Config.sigCol(0)).as(Config.sigCol(0)),
        (1 until Config.NumHashes).map(i => min(Config.sigCol(i)).as(Config.sigCol(i))): _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(viaUdaf.nonEmpty && viaUdaf == viaMin)
    val shuffled = MinHashLsh.groupSketch(docs.repartition(13)).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(shuffled == viaUdaf)
  }

  test("collision counts cover exactly the candidate set, bounded by Bands, exact dups at max") {
    val counts = MinHashLsh.collisionCounts(nearDup).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cand = MinHashLsh.candidatePairs(nearDup).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(counts.keySet == cand)
    assert(counts.values.forall(n => n >= 1 && n <= Config.Bands))
    assert(counts((1L, 4L)) == Config.Bands) // exact dup collides in every band
  }

  test("incremental candidates equal full-corpus candidates touching the batch") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val split = 50L
    val corpus = docs.filter(col("doc_id") < split)
    val batch = docs.filter(col("doc_id") >= split)
    val inc = MinHashLsh.incrementalCandidates(MinHashLsh.bands(corpus), batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = MinHashLsh.candidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (l, r) => l >= split || r >= split }.toSet
    assert(inc.nonEmpty && inc == full)
  }

  test("pure-SQL signatures equal the DataFrame formulation") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val viaSql = MinHashLsh.signaturesSql(docs).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    val viaDf = MinHashLsh.signatures(docs).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(viaSql.nonEmpty && viaSql == viaDf)
  }

  test("rowwise (streaming) bands equal the aggregated formulation") {
    val agg = MinHashLsh.bands(nearDup).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val row = MinHashLsh.rowwiseBands(nearDup).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).map(t => (t._3, t._1, t._2)).toSet
    assert(row == agg)
  }

  test("reference-corpus parity: the two golden clusters, both directions, nothing else") {
    // The reference's ONLY committed semantic expectation: its 5-doc
    // corpus (src/main/resources/documents.txt:1-5) must yield the
    // two near-dup clusters in results/pairs/part-r-00000:2-5 —
    // (apple, orange) and (nothing-in-common, lot-in-common) — and
    // must NOT pair "I went to the Apple." with anything. Exact
    // char-3-gram Jaccard: golden pairs 0.409 / 0.451, loudest
    // non-pair 0.167, so any threshold in (0.167, 0.409] separates
    // them; we run t=0.3 for margin both ways. (The reference's own
    // jaccardThreshold=0.8 at Main.java:57 only "passed" its golden
    // because MinHashLSH.java:177 compares a member with ITSELF —
    // SURVEY Q1; under correct verification 0.8 yields no pairs on
    // this corpus, asserted below.) The operating point (30 bands x
    // 2 rows) gives band recall ~1 at J>=0.4 — the reference's own
    // 2x2-band mod-5-bucket scheme (Main.java:55-56) collides near
    // everything and leans on the broken verify to keep it.
    val refDocs = docsDf(
      1L -> "I ate an apple.",
      2L -> "I went to the Apple.",
      3L -> "I ate an orange.",
      4L -> "This has nothing in common with the other sentences.",
      5L -> "This sentence has a lot in common with the previous sentence.")
    val got = MinHashLsh.pairsSymmetric(refDocs, threshold = 0.3,
        bands = 30, rowsPerBand = 2)
      .select("text_a", "text_b").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    val golden = Set( // results/pairs/part-r-00000 lines 2-5, verbatim
      "I ate an apple." -> "I ate an orange.",
      "I ate an orange." -> "I ate an apple.",
      "This has nothing in common with the other sentences." ->
        "This sentence has a lot in common with the previous sentence.",
      "This sentence has a lot in common with the previous sentence." ->
        "This has nothing in common with the other sentences.")
    assert(got == golden,
      s"engine must reproduce exactly the reference's committed pairs, got $got")
    // and at the reference's COMMITTED threshold, correct verification
    // finds nothing — the golden only existed through the Q1 bug
    assert(MinHashLsh.pairsSymmetric(refDocs, threshold = 0.8,
      bands = 30, rowsPerBand = 2).isEmpty)
  }

  test("threshold-derived prefilter reproduces the calibrated default and scales down") {
    assert(Config.estPrefilterMinCount(Config.Threshold) == Config.EstPrefilterMinCount)
    assert(Config.estPrefilterMinCount(0.3) < Config.EstPrefilterMinCount)
    assert(Config.estPrefilterMinCount(0.0) == 0)
    // monotone in t: a higher bar never loosens the prefilter
    val pts = Seq(0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
      .map(Config.estPrefilterMinCount)
    assert(pts == pts.sorted)
  }

  test("flagship on sf0.001 finds the planted near-dup pairs") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val n = MinHashLsh.similarPairs(docs).count()
    assert(n > 0)
  }
}

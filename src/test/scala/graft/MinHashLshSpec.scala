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

  test("flagship on sf0.001 finds the planted near-dup pairs") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val n = MinHashLsh.similarPairs(docs).count()
    assert(n > 0)
  }
}

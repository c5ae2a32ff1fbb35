package graft

import graft.operators.{MinHashLsh, Shingling}
import org.apache.spark.sql.functions._

/** Property-style statistical checks of the LSH machinery on
  * generated corpora (SURVEY.md §5 item 2): candidate recall follows
  * the banding curve, the minhash estimate tracks exact Jaccard, and
  * the pipeline is bit-deterministic across runs. Seeded generation —
  * failures are reproducible, not flaky. */
class LshPropertySpec extends SparkSpec {

  /** Corpus of near-dup pairs with controlled overlap: base sentences
    * plus mutated twins (replace a fraction of words). */
  private def mutatedCorpus(seed: Long, nPairs: Int, mutateWords: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    (0 until nPairs).flatMap { i =>
      val words = Vector.fill(12)(vocab(rnd.nextInt(vocab.size)))
      val mutated = (0 until mutateWords).foldLeft(words) { (w, _) =>
        w.updated(rnd.nextInt(w.size), vocab(rnd.nextInt(vocab.size)))
      }
      Seq((2L * i, words.mkString(" ")), (2L * i + 1, mutated.mkString(" ")))
    }
  }

  test("high-similarity twins are candidates at near-certain rate (banding curve)") {
    val docs = docsDf(mutatedCorpus(seed = 1, nPairs = 60, mutateWords = 1): _*)
    val cand = MinHashLsh.candidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact jaccard of each planted twin pair
    val sets = Shingling.shingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val planted = (0 until 60).map(i => (2L * i, 2L * i + 1))
    val eligible = planted.filter { case (a, b) =>
      val j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
      j >= 0.8 // P(candidate) = 1-(1-J^6)^10 >= 0.95 at J=0.8
    }
    assert(eligible.nonEmpty)
    val caught = eligible.count(cand.contains)
    assert(caught.toDouble / eligible.size >= 0.9,
      s"recall $caught/${eligible.size} below the banding-curve expectation")
  }

  test("minhash estimate tracks exact jaccard within 4 sigma on candidates") {
    val docs = docsDf(mutatedCorpus(seed = 2, nPairs = 40, mutateWords = 2): _*)
    val est = MinHashLsh.estimatedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = Shingling.shingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val sigma = 0.07 // sqrt(J(1-J)/S) maxes at ~0.065 for S=60
    est.foreach { case ((a, b), e) =>
      val j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
      assert(math.abs(e - j) <= 4 * sigma,
        s"pair ($a,$b): estimate $e vs exact $j deviates > 4 sigma")
    }
  }

  test("the verified-pair pipeline is bit-deterministic across runs") {
    val docs = docsDf(mutatedCorpus(seed = 3, nPairs = 30, mutateWords = 1): _*)
    def run() = MinHashLsh.similarPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(run().toSeq == run().toSeq)
  }
}

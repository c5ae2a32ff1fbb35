package graft

/** Engine-wide plan audit, two gates over ONE planning pass of every
  * SparkEntry query at sf0.001 (planning shapes are scale-independent
  * here: join strategies may flip between broadcast and sort-merge
  * with stats, but a cartesian at any SF means the logical shape
  * itself is wrong):
  *
  *  1. ABSOLUTE: no query may plan a CartesianProduct or (outside the
  *     bounded-by-construction allowlist) a BroadcastNestedLoopJoin —
  *     the silent scale-killers.
  *  2. RELATIVE (r11 verdict item 4 — the automated successor to the
  *     hand-diffed PLANS_r{N} directories): each query's SHUFFLE
  *     EXCHANGE count must not exceed the committed baseline in
  *     `PLAN_DIGESTS.json`. A new Exchange in a registered query is
  *     exactly the regression the per-round digest diff kept
  *     catching by hand; now it fails the suite instead. Intentional
  *     plan changes regenerate the baseline:
  *
  *       GRAFT_UPDATE_PLAN_DIGESTS=1 sbt "Test/testOnly graft.PlanAuditSpec"
  *
  *     and the regenerated file is reviewed like any diff (a shrink
  *     is an improvement; a growth needs a reason in the commit).
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries where a BroadcastNestedLoopJoin is the DESIGN, with a
    * broadcast side bounded by construction (not by data luck):
    * - cosine_topk: brute-force baseline, a fixed small query set
    *   broadcast against the corpus (the scale paths are
    *   ann_buckets/ann_topk/ann_ivf_topk).
    * - ann_ivf_topk: probe set x fixed centroid list (numCentroids
    *   is a constant).
    * - ann_ivf_append: same fixed-centroid broadcast, in the
    *   build/assign/probe stages of the incremental index lifecycle.
    * - tfidf_top_terms: the corpus doc-count scalar (1 row) crossed
    *   into the per-term stream.
    * - q11_important_suppliers: the global revenue total (1 row)
    *   crossed into the per-supplier frame.
    * - unigram_score: the corpus total-token-count scalar (1 row)
    *   crossed into the per-doc frame.
    * - bm25_topk: the corpus (sum_dl, n_docs) scalar (1 row) crossed
    *   into the per-term postings stream.
    * - hybrid_rerank: contains bm25's scalar cross join; its own
    *   anchor-vector join is a |terms|-row broadcast.
    * - skew_report: the (total_rows, n_keys) scalar (1 row) crossed
    *   into the k-row top-keys frame. */
  private val boundedByConstruction =
    Set("cosine_topk", "ann_ivf_topk", "ann_ivf_append", "tfidf_top_terms",
      "q11_important_suppliers", "unigram_score", "bm25_topk", "hybrid_rerank",
      "skew_report")

  private val DigestFile = java.nio.file.Paths.get("PLAN_DIGESTS.json")

  private case class Digest(shuffles: Int, cartesian: Int, bnlj: Int)

  private val ShuffleRe =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)".r

  private def digestOf(plan: String): Digest = Digest(
    shuffles = ShuffleRe.findAllIn(plan).size,
    cartesian = "CartesianProduct".r.findAllIn(plan).size,
    bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size)

  /** One planning pass for both gates. Construction may build
    * fixtures and checkpoint internals — released per query so 200+
    * constructions don't pin executor storage across the audit. */
  private lazy val digests: Seq[(String, Digest)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
      Caches.releaseAll(spark)
      name -> digestOf(plan)
    }

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = digests.flatMap { case (name, d) =>
      val bad =
        (if (d.cartesian > 0) Seq("CartesianProduct") else Nil) ++
          (if (d.bnlj > 0 && !boundedByConstruction(name))
            Seq("BroadcastNestedLoopJoin") else Nil)
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, s"quadratic join shapes in:\n${offenders.mkString("\n")}")
  }

  test("plan digests match the committed baseline (no unexplained new shuffle)") {
    def render: String = digests.map { case (n, d) =>
      s""" "$n": {"shuffles": ${d.shuffles}, "cartesian": ${d.cartesian}, "bnlj": ${d.bnlj}}"""
    }.mkString("{\n", ",\n", "\n}\n")
    if (sys.env.contains("GRAFT_UPDATE_PLAN_DIGESTS")) {
      java.nio.file.Files.writeString(DigestFile, render)
      info(s"regenerated $DigestFile (${digests.size} queries)")
    } else {
      assert(java.nio.file.Files.exists(DigestFile),
        s"missing $DigestFile — regenerate with GRAFT_UPDATE_PLAN_DIGESTS=1")
      val Line = """\s*"([^"]+)": \{"shuffles": (\d+), "cartesian": (\d+), "bnlj": (\d+)\},?""".r
      val baseline = java.nio.file.Files.readString(DigestFile).linesIterator
        .collect { case Line(n, s, c, b) => n -> Digest(s.toInt, c.toInt, b.toInt) }
        .toMap
      assert(baseline.nonEmpty, s"$DigestFile parsed to nothing — regenerate it")
      val currentNames = digests.map(_._1).toSet
      val missing = currentNames -- baseline.keySet
      val stale = baseline.keySet -- currentNames
      val regressed = digests.flatMap { case (name, d) =>
        baseline.get(name).flatMap { b =>
          val grew =
            (if (d.shuffles > b.shuffles)
              Seq(s"shuffles ${b.shuffles} -> ${d.shuffles}") else Nil) ++
              (if (d.cartesian > b.cartesian)
                Seq(s"cartesian ${b.cartesian} -> ${d.cartesian}") else Nil) ++
              (if (d.bnlj > b.bnlj) Seq(s"bnlj ${b.bnlj} -> ${d.bnlj}") else Nil)
          if (grew.nonEmpty) Some(s"$name: ${grew.mkString(", ")}") else None
        }
      }
      assert(regressed.isEmpty && missing.isEmpty && stale.isEmpty,
        s"""plan digest drift vs $DigestFile —
           |regressions (a NEW Exchange/cartesian/BNLJ needs a reason, then regenerate):
           |${regressed.mkString("\n")}
           |queries missing from baseline: ${missing.mkString(", ")}
           |stale baseline entries: ${stale.mkString(", ")}
           |regenerate with GRAFT_UPDATE_PLAN_DIGESTS=1 sbt "Test/testOnly graft.PlanAuditSpec"""".stripMargin)
    }
  }
}

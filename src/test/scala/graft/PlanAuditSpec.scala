package graft

/** Engine-wide plan audit: every SparkEntry query must plan without
  * quadratic join shapes (CartesianProduct / BroadcastNestedLoopJoin)
  * — the silent scale-killers. Runs at sf0.001 (planning shapes are
  * scale-independent here: join strategies may flip between
  * broadcast and sort-merge with stats, but a cartesian at any SF
  * means the logical shape itself is wrong). */
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

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
      val disallowed = Seq("CartesianProduct") ++
        (if (boundedByConstruction(name)) Nil else Seq("BroadcastNestedLoopJoin"))
      val bad = disallowed.filter(plan.contains)
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, s"quadratic join shapes in:\n${offenders.mkString("\n")}")
  }
}

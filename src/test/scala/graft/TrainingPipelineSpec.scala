package graft

import graft.operators.TrainingPipeline

/** The composed pipelines are oracle-checked end-to-end (pipeline_kept,
  * pipeline_budget, release_pipeline); this spec pins the funnel's
  * stage semantics on a planted corpus where every stage drops a
  * known document. */
class TrainingPipelineSpec extends SparkSpec {

  test("funnel: each stage drops exactly the planted doc, basis points exact") {
    val s = spark
    import s.implicits._
    val d = Seq(
      // survives everything
      (1L, "the quick brown fox jumps over lazy dogs tonight", "en", "web"),
      // blocked term "dup" -> fails stage 1 (quality would pass)
      (2L, "dup data column table row value entry field item record", "en", "web"),
      // too short -> passes blocklist, fails the quality gate
      (3L, "tiny", "en", "web"),
      // near-dup pair: 5 is the larger id of an identical text -> dropped at stage 3
      (4L, "identical corpus paragraphs repeated verbatim for the dedup stage check", "en", "web"),
      (5L, "identical corpus paragraphs repeated verbatim for the dedup stage check", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = TrainingPipeline.funnel(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("0_corpus") == ((5L, 10000L)))
    assert(rows("1_blocklist") == ((4L, 8000L)))
    assert(rows("2_quality") == ((3L, 6000L)))
    assert(rows("3_near_dup") == ((2L, 4000L)))
    assert(rows.size == 4)
  }
}

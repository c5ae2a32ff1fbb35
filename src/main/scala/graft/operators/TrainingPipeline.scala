package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data selection pipeline — the capstone
  * composition of the engine's stages in ONE lazy lineage:
  *
  *   near-dup removal (drop the larger id of each verified
  *   MinHash/LSH pair) → quality gate (integer-threshold token/char
  *   ratios) → 10% deterministic hash sample
  *
  * Stage-order note: near-dup detection runs against the FULL corpus
  * — sampling first would split dup pairs across the sample boundary
  * and leak near-dups into the output; the quality gate and sample
  * predicates are row-local so their relative order is free and
  * Catalyst fuses them into one scan of the survivors. Output is the
  * kept-manifest with provenance stats, the thing a training run
  * consumes (write it with Sinks.writePartitionedParquet by lang).
  */
object TrainingPipeline {

  def kept(docs: DataFrame): DataFrame = {
    val keptIds = Dedup.nearDupKeep(docs).select(col("kept_id").as("doc_id"))
    val quality = TextAnalysis.qualityFilter(docs)
      .select("doc_id", "n_chars", "n_tokens")
    Sampling.hashSample(docs).select("doc_id", "lang")
      .join(quality, Seq("doc_id"))
      .join(keptIds, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "n_chars", "n_tokens")
  }

  /** Variant with token-BUDGET selection as the final stage instead
    * of the flat 10% sample: near-dup removal → quality gate →
    * "best docs until the token budget fills". Same stage-order
    * rule (dedup sees the full corpus); the budget phases run over
    * the filtered pool only. */
  def keptBudget(docs: DataFrame, budgetTokens: Long = 5000L): DataFrame = {
    val keptIds = Dedup.nearDupKeep(docs).select(col("kept_id").as("doc_id"))
    val pool = docs
      .join(TextAnalysis.qualityFilter(docs).select("doc_id"), Seq("doc_id"), "left_semi")
      .join(keptIds, Seq("doc_id"), "left_semi")
    Sampling.budgetSelect(pool, budgetTokens)
  }

  /** The corpus-RELEASE manifest: content blocklist ∧ quality gate ∧
    * near-dup removal, then the deterministic train/val/test split
    * stamped on every survivor — the per-document manifest a dataset
    * release ships (write it with Sinks.writePartitionedParquet by
    * split). Same stage-order rule as [[kept]]: dedup sees the FULL
    * corpus (splitting or filtering first would leak near-dups
    * across the release boundary); blocklist/quality/split are
    * row-local and fuse into one scan of the survivors. */
  /** Stage names of [[funnel]] — ordinal prefix pins the reading
    * order without relying on result ordering. */
  val FunnelStages: Seq[String] =
    Seq("0_corpus", "1_blocklist", "2_quality", "3_near_dup")

  /** Pipeline FUNNEL: cumulative survivor counts through the
    * [[release]] stages (corpus → blocklist → ∧ quality → ∧ near-dup
    * keep) with integer basis-point retention — the monitoring view
    * a corpus release publishes next to its manifest. Each flag
    * comes from the REAL stage function (semi-join on ids), so the
    * funnel can never drift from what release() ships. Scale: three
    * id-only joins, then a single map-side-combinable aggregate to
    * ONE row, unpivoted driver-free into 4 rows. */
  def funnel(docs: DataFrame): DataFrame = {
    val blocked = TextAnalysis.blocklistFilter(docs)
      .select(col("doc_id"), lit(1L).as("b"))
    val quality = TextAnalysis.qualityFilter(docs)
      .select(col("doc_id"), lit(1L).as("q"))
    val keptIds = Dedup.nearDupKeep(docs)
      .select(col("kept_id").as("doc_id"), lit(1L).as("k"))
    val counts = docs.select("doc_id")
      .join(blocked, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"), "left")
      .join(keptIds, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("c0"),
        sum(coalesce(col("b"), lit(0L))).as("c1"),
        sum(when(col("b") === 1 && col("q") === 1, 1L).otherwise(0L)).as("c2"),
        sum(when(col("b") === 1 && col("q") === 1 && col("k") === 1, 1L)
          .otherwise(0L)).as("c3"))
    val stages = FunnelStages.zip(Seq("c0", "c1", "c2", "c3")).map {
      case (name, c) => struct(lit(name).as("stage"), col(c).as("n_docs"))
    }
    counts.select(explode(array(stages: _*)).as("s"), col("c0"))
      .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"),
        when(col("c0") > 0, expr("s.n_docs * 10000 div c0")).as("pct_bp"))
  }

  def release(docs: DataFrame): DataFrame = {
    val keptIds = Dedup.nearDupKeep(docs).select(col("kept_id").as("doc_id"))
    val blocked = TextAnalysis.blocklistFilter(docs).select("doc_id")
    val quality = TextAnalysis.qualityFilter(docs).select("doc_id", "n_tokens")
    val splits = Sampling.splitAssign(docs).select("doc_id", "split")
    docs.select("doc_id", "lang", "source")
      .join(quality, Seq("doc_id"))
      .join(blocked, Seq("doc_id"), "left_semi")
      .join(keptIds, Seq("doc_id"), "left_semi")
      .join(splits, Seq("doc_id"))
      .select("doc_id", "lang", "source", "split", "n_tokens")
  }
}

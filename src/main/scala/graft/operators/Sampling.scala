package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Config

/** Deterministic sampling operators for a training-data pipeline.
  *
  * Why hash-based and not `df.sample()`: at 100 TB a sample must be
  * (a) reproducible across runs/retries (Spark's sample is seeded
  * per-partition, so it changes under repartitioning), (b) stable
  * under data re-layout, and (c) consistent across engines so
  * membership can be replayed (e.g. to re-derive the exact training
  * subset later). A fixed affine hash of the row KEY gives all three
  * — membership is a pure function of the row, not the plan. Both
  * operators are narrow (filter / per-group top-n); no full-data
  * shuffle at any scale factor.
  */
object Sampling {

  /** Operator defaults, shared with the DuckDB oracle — oracle/
    * Sql.scala interpolates THESE constants into its SQL, so a
    * changed default can't silently desynchronize engine and
    * oracle. */
  val DefaultPct: Int = 10
  val DefaultPackBudget: Int = 256
  val DefaultPackBuckets: Int = 32
  val DefaultQuota: Int = 10
  val DefaultBudgetTokens: Long = 5000L
  val DefaultPerStratum: Int = 50
  val DefaultShardTokens: Long = 2000L
  val ShardOrderBuckets: Int = 64

  /** Keep ~pct% of docs: (a·doc_id + b) mod P mod 100 < pct, with
    * (a, b) = the seeded affine family's member 0 — replayed exactly
    * by the oracle. */
  def hashSample(docs: DataFrame, pct: Int = DefaultPct): DataFrame = {
    val (a, b) = Config.coeffs(0)
    // doc_id reduced mod P BEFORE the multiply: a*(P-1)+b fits signed
    // 64-bit (PortableHash.affine's bound), a raw 2^32+ id would not
    val h = pmod(col("doc_id"), lit(Config.P))
    docs
      .filter(((lit(a) * h + lit(b)) % lit(Config.P)) % 100 < pct)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** SEQUENCE PACKING assignment: pack documents into fixed
    * token-budget training bins, streaming first-fit within hash
    * buckets. Each doc lands in the bin its running token offset
    * falls into (bin = floor(tokens-before / budget)) — the standard
    * streaming pack (a bin may overflow by at most one doc, never
    * split one). Buckets are the parallelism unit: packing is
    * inherently sequential PER STREAM, so the corpus is hash-split
    * into independent streams first — at 100 TB each bucket packs
    * locally after one exchange, no global order needed. */
  def sequencePacking(docs: DataFrame, budget: Int = DefaultPackBudget,
                      buckets: Int = DefaultPackBuckets): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    docs
      .select(col("doc_id"),
        size(TextAnalysis.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets)).cast("int"))
      .withColumn("tokens_before",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"tokens_before div $budget").as("bin"), col("tokens_before"))
  }

  /** Domain MIXING resample: bring every `source` down to ~`quota`
    * docs (sources under quota keep everything) — the "data mixture"
    * step that rebalances a crawl before training. Membership is
    * deterministic: keep doc iff hash(doc_id) mod count_source <
    * quota, so P(keep) ~= quota/count (approximately — folding the
    * hash by a modulus that does not divide P over-represents low
    * residues by one part in floor(P/count)), all integer arithmetic
    * (the affine family's member 2 — members 0/1 belong to
    * [[hashSample]]/[[stratifiedSample]], keeping the samples
    * independent). One
    * broadcast join against the per-source counts (bounded: one row
    * per source), then a narrow filter — no shuffle of the corpus. */
  def mixtureSample(docs: DataFrame, quota: Int = DefaultQuota): DataFrame = {
    val (a, b) = Config.coeffs(2)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
    val h = (lit(a) * pmod(col("doc_id"), lit(Config.P)) + lit(b)) % lit(Config.P)
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(counts), Seq("source"))
      .filter(h % col("n_source") < quota)
      .select(col("doc_id"), col("source"), col("n_source"))
  }

  /** TEMPERATURE mixing (α = 0.5): resample each `source` down to
    * ~scale·sqrt(count) docs, so the sampled size grows as count^α —
    * the standard rebalance for heavy-tailed source distributions
    * (huge sources shrink relatively, small ones keep more; quota
    * mixing [[mixtureSample]] is the α = 0 endpoint of the same
    * family). Membership: hash(doc_id) mod count < scale·floor(
    * sqrt(count)) — deterministic, and replayable because IEEE sqrt
    * is correctly rounded in BOTH engines, so floor(sqrt(n)) is the
    * same integer (no other float enters the decision). Affine
    * member 3 keeps this sample independent of the other three.
    * Same scale shape as mixtureSample: one broadcast of the bounded
    * per-source counts, then a narrow filter. */
  val DefaultTempScale: Int = 2

  def temperatureSample(docs: DataFrame, scale: Int = DefaultTempScale): DataFrame = {
    val (a, b) = Config.coeffs(3)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
    val h = (lit(a) * pmod(col("doc_id"), lit(Config.P)) + lit(b)) % lit(Config.P)
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(counts), Seq("source"))
      .filter(h % col("n_source") <
        lit(scale.toLong) * floor(sqrt(col("n_source").cast("double"))).cast("long"))
      .select(col("doc_id"), col("source"), col("n_source"))
  }

  /** Token-BUDGET data selection: keep the highest-quality documents
    * whose token spans fit entirely inside a global token budget
    * (quality = distinct-token count, ties by doc_id) — "take the
    * best N tokens", the selection step after scoring/dedup. Scalable
    * two-phase shape: the global running sum is NOT a corpus-wide
    * single-partition window. Phase 1 aggregates token totals per
    * quality SCORE (bucket table bounded by the score range, e.g.
    * <= max tokens per doc) and cumulates across buckets — the only
    * unpartitioned window runs over that bounded bucket table.
    * Phase 2 ranks docs WITHIN their score bucket (hash-partitioned
    * window) and offsets by the bucket's cumulative start. */
  def budgetSelect(docs: DataFrame,
                   budgetTokens: Long = DefaultBudgetTokens): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    val scored = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("score"))
    // phase 1: per-score token totals, cumulated best-score-first
    // (one row per distinct score — the window input is bounded)
    val buckets = scored.groupBy("score")
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    val wB = Window.orderBy(col("score").desc)
    val bcum = buckets.withColumn("bucket_before",
      coalesce(sum(col("bucket_tokens"))
        .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // phase 2: rank within the score bucket only
    val wD = Window.partitionBy("score").orderBy("doc_id")
    scored.join(broadcast(bcum.select("score", "bucket_before")), Seq("score"))
      .withColumn("tokens_before",
        col("bucket_before") + sum(col("n_tokens")).over(wD) - col("n_tokens"))
      .filter(col("tokens_before") + col("n_tokens") <= budgetTokens)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("tokens_before"))
  }

  /** CURRICULUM ordering: a deterministic global training order —
    * highest-quality documents first (score = distinct-token count,
    * the budgetSelect metric), ties broken by doc_id. The naive form
    * is one corpus-wide row_number window (single partition — the
    * scale-killer); instead the same two-phase trick as
    * [[budgetSelect]]: per-score-bucket COUNTS cumulate over the
    * bounded bucket table, then each doc ranks only within its score
    * bucket, so the global rank is bucket_offset + in-bucket rank and
    * no window ever sees the corpus. */
  def curriculumOrder(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    val scored = docs.select(col("doc_id"),
      size(array_distinct(toks)).cast("long").as("score"))
    val buckets = scored.groupBy("score").agg(count(lit(1)).as("bucket_docs"))
    val wB = Window.orderBy(col("score").desc)
    val bcum = buckets.withColumn("docs_before",
      coalesce(sum(col("bucket_docs"))
        .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wD = Window.partitionBy("score").orderBy("doc_id")
    scored.join(broadcast(bcum.select("score", "docs_before")), Seq("score"))
      .select(col("doc_id"), col("score"),
        (col("docs_before") + row_number().over(wD)).as("train_order"))
  }

  /** Equal-token training SHARD assignment: write-side partitioning
    * of a training corpus into shards of ~[[DefaultShardTokens]]
    * tokens each, in the deterministic hash-shuffled training order
    * (the global shuffle a dataloader expects, as a pure function of
    * doc_id — affine member 5, independent of the other samples).
    * shard = floor(tokens-before-in-order / budget), so shards are
    * contiguous spans of the shuffled order and every shard except
    * the last carries ≥ budget - max_doc_tokens tokens — balanced
    * output files without a global sort.
    *
    * Scale shape: the running token sum is NOT a corpus-wide window.
    * The hash space splits into [[ShardOrderBuckets]] CONTIGUOUS
    * ranges (bucket = h div ceil(P/buckets), monotone in h, so
    * bucket order ∘ in-bucket order = global hash order); per-bucket
    * token totals cumulate over that bounded table, then each doc
    * ranks only within its bucket — the budgetSelect/curriculumOrder
    * two-phase trick applied to the shard cut. */
  def shardAssign(docs: DataFrame,
                  shardTokens: Long = DefaultShardTokens): DataFrame = {
    val (a, b) = Config.coeffs(5)
    val h = (lit(a) * pmod(col("doc_id"), lit(Config.P)) + lit(b)) % lit(Config.P)
    val bucketW = (Config.P + ShardOrderBuckets - 1) / ShardOrderBuckets
    val scored = docs.select(col("doc_id"),
      size(TextAnalysis.tokensCol(col("text"))).cast("long").as("n_tokens"),
      h.as("shuffle_h"))
      .withColumn("hb", expr(s"shuffle_h div $bucketW"))
    val buckets = scored.groupBy("hb").agg(sum("n_tokens").as("bucket_tokens"))
    val wB = Window.orderBy("hb")
    val bcum = buckets.withColumn("bucket_before",
      coalesce(sum(col("bucket_tokens"))
        .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wD = Window.partitionBy("hb").orderBy(col("shuffle_h"), col("doc_id"))
    scored.join(broadcast(bcum.select("hb", "bucket_before")), Seq("hb"))
      .withColumn("tokens_before",
        col("bucket_before") + sum(col("n_tokens")).over(wD) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"),
        expr(s"tokens_before div $shardTokens").as("shard"))
  }

  /** Deterministic stratified sample: the n docs per stratum (lang)
    * with the smallest affine hash of doc_id — an order-free,
    * replayable "random n per class" (class-balancing downsample).
    * Per-stratum top-n is a window over the stratum only; at scale
    * the heavy strata sort locally after one hash-partition exchange
    * on lang. */
  def stratifiedSample(docs: DataFrame,
                       perStratum: Int = DefaultPerStratum): DataFrame = {
    val (a, b) = Config.coeffs(1)
    val h = (lit(a) * pmod(col("doc_id"), lit(Config.P)) + lit(b)) % lit(Config.P)
    val w = Window.partitionBy("lang").orderBy(h, col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"), h.as("sample_h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perStratum)
      .select("doc_id", "lang", "rn")
  }

  /** Train percentage of the deterministic corpus split; val takes
    * the next [[ValPct]] percent, test the remainder. */
  val TrainPct: Int = 90
  val ValPct: Int = 5

  /** Deterministic train/val/test SPLIT assignment — the same
    * affine-hash membership as [[hashSample]] (plan-independent,
    * replayable, stable under re-layout), carved into three
    * contiguous percent ranges so the split is a pure function of
    * doc_id. Narrow per-row work, no shuffle at any scale. */
  def splitAssign(docs: DataFrame): DataFrame = {
    val (a, b) = Config.coeffs(4)
    val h = pmod(col("doc_id"), lit(Config.P))
    val bucket = ((lit(a) * h + lit(b)) % lit(Config.P)) % 100
    docs.select(
      col("doc_id"),
      bucket.cast("long").as("bucket"),
      when(bucket < TrainPct, "train")
        .when(bucket < TrainPct + ValPct, "val")
        .otherwise("test").as("split"))
  }

  /** Cross-split LEAKAGE check: verified near-duplicate pairs
    * ([[MinHashLsh.similarPairs]], exact Jaccard >= threshold) whose
    * members landed in DIFFERENT splits — each row is an eval
    * contamination: a val/test doc whose near-copy is trained on.
    * The pair stream is the already-bucketed LSH pipeline; the split
    * columns join in by doc_id (broadcast-sized per-id frame at the
    * oracle sf, plain equi-join at scale) — no new join shapes. */
  def splitLeakage(docs: DataFrame): DataFrame = {
    val splits = splitAssign(docs).select(col("doc_id"), col("split"))
    MinHashLsh.similarPairs(docs)
      .join(splits.select(col("doc_id").as("id_l"), col("split").as("split_l")), "id_l")
      .join(splits.select(col("doc_id").as("id_r"), col("split").as("split_r")), "id_r")
      .filter(col("split_l") =!= col("split_r"))
      .select("id_l", "id_r", "split_l", "split_r", "jaccard")
  }
}

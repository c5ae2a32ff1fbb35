package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Caches.CheckpointSyntax
import graft.Config
import graft.functions.PortableHash

/** Corpus-level statistics for a training-data pipeline: global
  * vocabulary (BPE/tokenizer prep), unigram-LM document scoring,
  * cross-source overlap reporting, and cross-document chunk-level
  * exact dedup. All built-in expressions (codegen'd, no UDFs); all
  * mirrored bit-exactly by DuckDB oracle SQL (graft.oracle.Sql).
  *
  * Reference analog: none (the reference is a 5-sentence minhash
  * pipeline, Main.java:45-90) — these are the north-star extensions
  * a 100 TB text corpus needs before/alongside dedup.
  */
object CorpusStats {

  /** Default vocab size — shared with the oracle (Sql.vocabTopK
    * interpolates this constant). */
  val DefaultVocabTopK: Int = 100

  /** Global token vocabulary, top-k by occurrence count — the
    * tokenizer-training / vocab-pruning shape. Ranks are assigned
    * AFTER a distributed top-k (TakeOrderedAndProject), so the
    * single-partition row_number window only ever sees `topK` rows —
    * never the full vocabulary (100M+ types at corpus scale). */
  def vocabTopK(docs: DataFrame, topK: Int = DefaultVocabTopK): DataFrame = {
    val counts = docs
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("token"),
        col("doc_id"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
    // distributed top-k (per-partition heads + driver merge of k rows
    // each), THEN rank over the k survivors
    val top = counts
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(topK)
    top.withColumn("rank",
      row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("token").asc))
        .cast("long"))
  }

  /** Count-Min sketch depth (hash rows) — shared with the oracle. */
  val CmsDepth: Int = 5
  /** Count-Min sketch width (counters per row) — shared with the
    * oracle. eps = e/width ≈ 0.27% of total mass at 1024. */
  val CmsWidth: Int = 1024
  /** Heavy-hitter report size. */
  val HeavyHittersK: Int = 20

  /** The d (row, bucket) probe coordinates of a token-hash column —
    * row r's bucket is affine_r(h) mod width, the seeded family from
    * [[Config.coeffs]]. Pure integer arithmetic, oracle-replayable. */
  private[graft] def cmsProbes(h: org.apache.spark.sql.Column, depth: Int, width: Int) =
    array((0 until depth).map(r =>
      struct(lit(r).as("r"),
        (PortableHash.affine(r, h) % width).as("bucket"))): _*)

  /** The CMS grid built from an OCCURRENCE stream (one row per token
    * occurrence): each occurrence increments its d probed counters.
    * One stateful aggregation over the bounded (r, bucket) domain —
    * the streaming-legal form ([[graft.streaming.StreamingQueries]]
    * maintains exactly this grid as its query state). */
  private[graft] def cmsGridFromOccurrences(occurrences: DataFrame,
                                            depth: Int = CmsDepth,
                                            width: Int = CmsWidth): DataFrame =
    occurrences
      .select(explode(cmsProbes(
        PortableHash.charFoldHash(col("token")), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("counter"))

  /** Probe a (r, bucket, counter) grid for `top` (token, exact_cnt)
    * rows: estimate = min over the token's d counters. Both join
    * sides are broadcast-sized at any corpus scale (k*d probes vs
    * <= d*width grid rows). */
  private[graft] def probeSketch(sketch: DataFrame, top: DataFrame,
                                 depth: Int = CmsDepth,
                                 width: Int = CmsWidth): DataFrame = {
    val probed = top
      .select(col("token"), col("exact_cnt"),
        explode(cmsProbes(
          PortableHash.charFoldHash(col("token")), depth, width)).as("rb"))
      .select(col("token"), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    broadcast(probed).join(sketch, Seq("r", "bucket"))
      .groupBy("token", "exact_cnt")
      .agg(min("counter").as("cms_est"))
      .select(col("token"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
  }

  /** Exact term-frequency top-k (distributed TakeOrderedAndProject,
    * ties broken by token text) — the head the sketch is probed
    * for. */
  private[graft] def tokenTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token").asc).limit(k)

  /** Heavy hitters via a Count-Min sketch — the frequency-estimation
    * primitive a 100 TB corpus needs where exact per-token counts
    * are kept only for the head: the sketch is a FIXED d×w integer
    * grid (5×1024 longs here), built with one map-side-combinable
    * aggregation and mergeable across partitions, days, or streams
    * by plain element-wise addition. Estimates carry the classic
    * one-sided guarantee (est ≥ true; est ≤ true + eps·N w.h.p.).
    *
    * Build cost trick: the sketch aggregates the TERM-FREQUENCY
    * table (|vocab| rows), not the occurrence stream — counter(r,b)
    * = Σ exact_cnt over tokens hashing to b, identical by linearity
    * but |vocab| ≪ n_occurrences. Per top-k token the estimate is
    * min over its d probed counters. Everything — the fold hash, the
    * affine family, the min — is integer arithmetic, so the DuckDB
    * oracle replays the ESTIMATES bit-exactly (not just an
    * error-bound bit): output is token, exact count, CMS estimate,
    * and the non-negative overcount. */
  def heavyHitters(docs: DataFrame, k: Int = HeavyHittersK,
                   depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    val counts = docs
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
    // the sketch: groupBy over a bounded (r, bucket) domain — the
    // partial hash agg does the merging map-side, the exchange moves
    // at most d*width rows (built from the TYPE table: by linearity
    // identical to the occurrence-stream grid at |vocab| cost)
    val sketch = counts
      .select(explode(cmsProbes(
        PortableHash.charFoldHash(col("token")), depth, width)).as("rb"),
        col("exact_cnt"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum("exact_cnt").as("counter"))
    // distributed top-k of the exact counts (TakeOrderedAndProject),
    // then probe: k*d rows vs <= d*width — both broadcast-sized at
    // ANY corpus scale
    val top = counts.orderBy(col("exact_cnt").desc, col("token").asc).limit(k)
    probeSketch(sketch, top, depth, width)
  }

  /** Unigram-LM document quality score: the mean corpus probability
    * of the document's tokens — the cheap stand-in for "LM
    * perplexity" filtering. All shuffle-side arithmetic is INTEGER
    * (sum of corpus term frequencies per doc); the only floating
    * point is two exact final divisions, so the score is bit-portable
    * to the oracle with no log/libm involved:
    *   score = (sum_tf / n_tokens) / total_tf
    * where sum_tf = Σ_occurrences corpusCount(token). Higher =
    * more in-distribution text. The per-token corpus counts join is
    * an equi-join on token (both sides partitioned by token); the
    * corpus-total scalar is a 1-row cross join (bounded by
    * construction, same shape as tfidf's doc-count scalar). */
  def unigramScore(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    // vocabulary-sized and read twice (per-token join + total scalar)
    // — materialize once instead of re-aggregating the token stream
    val counts = tok.groupBy("token").agg(count(lit(1)).as("ctf"))
      .graftCheckpoint()
    val total = counts.agg(sum(col("ctf")).as("total_tf"))
    tok.join(counts, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("ctf")).as("sum_tf"))
      .crossJoin(total)
      .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
        ((col("sum_tf").cast("double") / col("n_tokens").cast("double"))
          / col("total_tf").cast("double")).as("unigram_score"))
  }

  /** Bigram-LM fluency score — the word-ORDER quality signal
    * [[unigramScore]] can't see (a scrambled document keeps its
    * unigram score but loses its bigrams): per document, the mean
    * corpus conditional probability of its adjacent token pairs,
    *   P(b|a) ≈ c(a,b) / c(a,·)
    * scaled to integer parts-per-million with floor division, so
    * every shuffle-side value is a LONG and the score hash-matches
    * the oracle with no log/libm. This is the cheap stand-in for
    * CCNet's LM-perplexity filter: low mean_ppm = improbable word
    * sequences. Shapes: the bigram count tables are corpus-bounded
    * aggregates with map-side combine; the conditional table joins
    * back to the pair stream on its (a, b) key — all equi-joins on
    * token keys, no windows, no driver reads. Documents with fewer
    * than two tokens surface with zero counts (stage-total). */
  def bigramFluency(docs: DataFrame): DataFrame = {
    // ordered, NON-distinct adjacent pairs (frequency matters here,
    // unlike wordNgramJaccard's distinct feature sets). zip_with over
    // two slices walks the token array LINEARLY — an element_at-in-
    // transform formulation re-evaluates the split() chain per index
    // (measured quadratic per doc: 8.8 s -> 1.0 s at sf0.1).
    // Checkpointed: three consumers (both count tables via cab + the
    // scoring join) read the materialized stream, not the lineage.
    val nPairs = greatest(size(col("toks")) - 1, lit(0))
    val pairs = docs
      .select(col("doc_id"), TextAnalysis.tokensCol(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(zip_with(slice(col("toks"), lit(1), nPairs),
          slice(col("toks"), lit(2), nPairs),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .graftCheckpoint()
    val cab = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    // c(a,·) = count of bigrams STARTING with a — derived from cab
    // (vocab²-bounded) instead of re-aggregating the pair stream
    val ca = cab.groupBy("a").agg(sum(col("cab")).as("ca"))
    // conditional table keyed (a, b): floor-ppm of P(b|a); rows sum
    // to <= 1e6 per a
    val cond = cab.join(ca, "a")
      .select(col("a"), col("b"), expr("(1000000 * cab) div ca").as("ppm"))
    val scored = pairs.join(cond, Seq("a", "b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("sum_ppm"))
      .withColumn("mean_ppm", expr("sum_ppm div n_bigrams"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_ppm"), lit(0L)).as("sum_ppm"),
        coalesce(col("mean_ppm"), lit(0L)).as("mean_ppm"))
  }

  /** Cross-source overlap report: exact shingle-set Jaccard between
    * every pair of `source` values that share at least one shingle.
    * Intersections come from an EQUI-JOIN on the shingle hash over
    * the distinct (source, h) pairs — per-source sets are never
    * materialized as arrays, and each hash contributes at most
    * |sources|^2 join rows, so the shape holds when per-source sets
    * have billions of shingles. Source pairs with zero shared
    * shingles (impossible-to-join) are intentionally absent: the
    * report lists observed overlap. */
  def sourceOverlap(docs: DataFrame, k: Int = Config.K): DataFrame = {
    // read three times (sizes + both join sides) — materialize the
    // distinct (source, h) stream once
    val sh = docs
      .select(col("source"),
        explode(Shingling.shingleHashArray(col("text"), k)).as("h"))
      .distinct()
      .graftCheckpoint()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("source").as("src_l"), col("h"))
      .join(sh.select(col("source").as("src_r"), col("h")), Seq("h"))
      .filter(col("src_l") < col("src_r"))
      .groupBy("src_l", "src_r")
      .agg(count(lit(1)).as("n_inter"))
    // sizes has one row per source — broadcast both lookups
    inter
      .join(broadcast(sizes.select(col("source").as("src_l"), col("n").as("n_l"))), Seq("src_l"))
      .join(broadcast(sizes.select(col("source").as("src_r"), col("n").as("n_r"))), Seq("src_r"))
      .select(col("src_l"), col("src_r"), col("n_l"), col("n_r"), col("n_inter"),
        (col("n_inter").cast("double") /
          (col("n_l") + col("n_r") - col("n_inter")).cast("double")).as("jaccard"))
  }

  /** Asymmetric CONTAINMENT join: c(A in B) = |A∩B| / |A| — catches
    * a short document embedded in a longer one, which symmetric
    * Jaccard under-scores (a doc 1/4 the size of its container has
    * J <= 0.25 but containment 1.0), so minhash-band candidate
    * generation would MISS it (band recall is Jaccard-shaped).
    * Candidates instead come from a PREFIX FILTER with guaranteed
    * recall: each doc probes on its n - ceil(t*n) + 1 globally-RAREST
    * gram hashes (rarity = corpus doc frequency), with the bound
    * computed in EXACT integer arithmetic from the rational t =
    * ThresholdPct/100 — the float form floor((1-t)*n)+1 under-counts
    * by one whenever (1-t)*n is an integer, because 1.0-0.8 is
    * 0.19999999999999996 in doubles. If containment >= t then
    * |A∩B| >= ceil(t*n), so A misses at most n - ceil(t*n) grams
    * from B and a prefix one longer must intersect — no true pair is
    * ever dropped. Rare-first ordering keeps the candidate equi-join
    * fan-out bounded (the hot grams everyone shares are probed only
    * by docs that have nothing rarer). Sets are hashed word
    * TRIGRAMS, not char shingles: containment is about embedded
    * passages, and word n-grams are discriminative where char-3
    * shingles of a small vocabulary saturate (nearly every doc
    * "contains" every other). Exact verification on sorted hash
    * sets, both directions reported.
    * Output: id_l, id_r, n_l, n_r, cont_l_in_r, cont_r_in_l for
    * pairs where either direction >= threshold. */
  def containmentPairs(docs: DataFrame, n: Int = 3,
                       threshold: Double = Config.Threshold): DataFrame = {
    val gramHashes = array_distinct(transform(
      TextAnalysis.wordNgramsCol(col("text"), n),
      g => PortableHash.charFoldHash(g)))
    // distinct (doc_id, gram-hash) pairs — the set representation;
    // read three times (doc frequencies, rarity ranking, candidate
    // probe side) — materialize once
    val dh = docs.select(col("doc_id"), explode(gramHashes).as("h"))
      .graftCheckpoint()
    val dfreq = dh.groupBy("h").agg(count(lit(1)).as("df"))
    // per-doc rarity rank and set size in one window pass
    val wRank = Window.partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)
    val wAll = Window.partitionBy("doc_id")
    val ranked = dh.join(dfreq, Seq("h"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
    // prefix length n - ceil(t*n) + 1 in pure integer arithmetic:
    // ceil(pct*n/100) = (pct*n + 99) div 100, so no FP rounding can
    // shave the recall bound
    val tPct = math.round(threshold * 100).toInt
    require(tPct / 100.0 == threshold,
      s"containment threshold must be a whole percent for exact prefix arithmetic, got $threshold")
    val ceilTn = expr(s"(${tPct}L * n + 99L) div 100L")
    val prefix = ranked
      .filter(col("rn") <= col("n") - ceilTn + lit(1L))
      .select(col("doc_id").as("id_a"), col("h"))
    // candidate = A's prefix shingle appears ANYWHERE in B
    // materialized: consumed twice below (survivor ids + verify join)
    val cand = prefix
      .join(dh.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_l"),
        greatest(col("id_a"), col("id_b")).as("id_r"))
      .distinct()
      .graftCheckpoint()
    // exact verify on sorted sets — built ONLY for candidate
    // survivors (semi-join on the id list), so the O(text)-sized set
    // projection never runs corpus-wide. NO broadcast hint: unlike
    // MinHashLsh's sketch-gated survivors this list has no agreement
    // prefilter bounding it, so on a templated corpus it can approach
    // corpus size — Catalyst/AQE picks broadcast only when it fits
    val candIds = cand.select(col("id_l").as("doc_id"))
      .union(cand.select(col("id_r").as("doc_id"))).distinct()
    val sets = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), sort_array(gramHashes).as("hset"))
    val inter = PortableHash.sortedIntersectCount(col("l.hset"), col("r.hset"))
    cand
      .join(sets.as("l"), col("id_l") === col("l.doc_id"))
      .join(sets.as("r"), col("id_r") === col("r.doc_id"))
      .select(col("id_l"), col("id_r"),
        size(col("l.hset")).cast("long").as("n_l"),
        size(col("r.hset")).cast("long").as("n_r"),
        (inter.cast("double") / size(col("l.hset"))).as("cont_l_in_r"),
        (inter.cast("double") / size(col("r.hset"))).as("cont_r_in_l"))
      .filter(greatest(col("cont_l_in_r"), col("cont_r_in_l")) >= threshold)
  }

  /** Cross-document chunk-level exact dedup (keep-first): hash every
    * context-window chunk (TextAnalysis.docChunks), keep one copy
    * per distinct chunk text — the earliest by (doc_id, chunk_idx) —
    * and report how many copies existed. Implemented as a min-struct
    * AGGREGATE (not a row_number window): partial aggregation
    * combines map-side, so a boilerplate chunk repeated millions of
    * times never lands on a single reducer the way a window
    * partition would. */
  /** SPAN-LEVEL cross-document dedup (keep-first): split every doc
    * into NON-overlapping token chunks, find each distinct chunk
    * text's earliest occurrence, DROP every later occurrence, and
    * re-assemble each document from its surviving chunks in order —
    * the "repeated substring removal" pass a web-scale corpus needs
    * (boilerplate repeated across millions of pages survives only at
    * its first occurrence; whole-doc dedup never sees it).
    *
    * Scale shape: ownership is a min-struct AGGREGATE over
    * (hash, text) — map-side combinable, text in the key so fold-hash
    * collisions cannot merge distinct chunks (the chunkDedup rule);
    * reassembly is a per-doc collect bounded by document size, never
    * corpus-wide. Output: doc_id, n_chunks, n_dropped, cleaned_text. */
  def spanDedup(docs: DataFrame, chunkTokens: Int = 16): DataFrame = {
    val chunks = TextAnalysis.docChunks(docs, chunkTokens, overlap = 0)
      .withColumn("chunk_hash", PortableHash.charFoldHash(col("chunk_text")))
      .graftCheckpoint() // two consumers: owner map + per-doc reassembly
    val owners = chunks.groupBy("chunk_hash", "chunk_text")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("own"))
      .select(col("chunk_hash"), col("chunk_text"),
        col("own.doc_id").as("own_doc"), col("own.chunk_idx").as("own_idx"))
    val flagged = chunks.join(owners, Seq("chunk_hash", "chunk_text"))
      .withColumn("kept",
        col("doc_id") === col("own_doc") && col("chunk_idx") === col("own_idx"))
    flagged.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
      array_join(transform(
        array_sort(collect_list(when(col("kept"),
          struct(col("chunk_idx"), col("chunk_text"))))),
        s => s.getField("chunk_text")), " ").as("cleaned_text"))
  }

  def chunkDedup(docs: DataFrame, chunkTokens: Int = 16,
                 overlap: Int = 4): DataFrame = {
    val hashed = TextAnalysis.docChunks(docs, chunkTokens, overlap)
      .withColumn("chunk_hash", PortableHash.charFoldHash(col("chunk_text")))
    // group key carries the TEXT, not just the 31-bit hash: distinct
    // chunks colliding under the fold hash (expected past ~65k
    // distinct chunks, certain at corpus scale) must NOT merge — the
    // hash only spreads the shuffle, the text decides identity
    hashed
      .groupBy("chunk_hash", "chunk_text")
      .agg(
        min(struct(col("doc_id"), col("chunk_idx"), col("start_tok"),
          col("n_chunk_tokens"))).as("first"),
        count(lit(1)).as("n_copies"))
      .select(col("first.doc_id").as("doc_id"),
        col("first.chunk_idx").as("chunk_idx"),
        col("first.start_tok").as("start_tok"),
        col("first.n_chunk_tokens").as("n_chunk_tokens"),
        col("chunk_text"), col("chunk_hash"), col("n_copies"))
  }

  /** BM25 defaults, shared with the oracle. k1/b are carried as
    * integer rationals (tenths / hundredths) — both engines derive
    * the double by the SAME division, so the constants can't drift
    * through decimal-literal typing (DuckDB parses 1.2 as DECIMAL). */
  val Bm25QueryTerms: Seq[String] = Seq("dup", "spark", "window")
  val Bm25K1Tenths: Int = 12
  val Bm25BHundredths: Int = 75
  val Bm25TopK: Int = 5

  /** BM25 top-k retrieval for a fixed query-term set — the "find the
    * documents most about X" surface a corpus engine needs (dedup
    * picks what to keep; retrieval finds what to inspect). Scoring is
    * per (term, doc) with NO cross-term float sum — each term ranks
    * its own top-k, so the only FP is the mirrored expression tree
    * (idf and the tf saturation ratio), bit-portable to the oracle:
    *
    *   idf   = (N - df + 0.5) / (df + 0.5)       [rational surrogate:
    *           log is libm, not bit-portable — monotone in the same
    *           direction, so ranks are BM25's ranks per term]
    *   score = idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
    *
    * Shapes at scale: tf is narrow per-row work; df is a |terms|-row
    * aggregate broadcast back; avgdl is a 1-row scalar cross join
    * (bounded by construction — whitelisted in PlanAuditSpec); the
    * final top-k is a per-term window over |terms| partitions AFTER
    * a distributed rank-by-score, each partition seeing only that
    * term's postings. */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = Bm25QueryTerms,
               topK: Int = Bm25TopK): DataFrame = {
    val k1 = lit(Bm25K1Tenths.toDouble) / lit(10.0)
    val b = lit(Bm25BHundredths.toDouble) / lit(100.0)
    val toks = TextAnalysis.tokensCol(col("text"))
    val perDoc = docs.select(col("doc_id"),
      size(toks).cast("long").as("dl"), toks.as("toks"))
    val tf = perDoc
      .select(col("doc_id"), col("dl"),
        explode(array(terms.map(lit): _*)).as("term"), col("toks"))
      .select(col("doc_id"), col("dl"), col("term"),
        size(filter(col("toks"), t => t === col("term"))).cast("long").as("tf"))
      .filter(col("tf") > 0)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scalars = perDoc.agg(sum(col("dl")).as("sum_dl"),
      count(lit(1)).as("n_docs"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val score = idf *
      ((col("tf").cast("double") * (k1 + lit(1.0))) /
        (col("tf").cast("double") +
          k1 * (lit(1.0) - b + b * (col("dl").cast("double") / avgdl))))
    val w = Window.partitionBy("term")
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(scalars))
      .select(col("term"), col("doc_id"), col("tf"), col("df"),
        score.as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Hybrid-retrieval defaults, shared with the oracle. */
  val HybridRetrieveK: Int = 10
  val HybridTopK: Int = 5

  /** Hybrid retrieval — the sparse→dense RAG shape: BM25 retrieves
    * retrieveK candidates per term (cheap, inverted-index-shaped),
    * then the candidate set is RERANKED by embedding cosine to the
    * term's top-1 BM25 doc vector (the anchor). Only |terms| ×
    * retrieveK rows ever touch float vectors — at 100 TB the dense
    * stage stays candidate-sized while the corpus-wide work remains
    * the integer BM25 postings scan. Anchor vectors and the candidate
    * frame are both tiny: broadcast equi-joins against the embeddings
    * table, no new join shapes. */
  def hybridRerank(docs: DataFrame, emb: DataFrame,
                   retrieveK: Int = HybridRetrieveK,
                   topK: Int = HybridTopK): DataFrame = {
    val retrieved = bm25TopK(docs, topK = retrieveK)
      .select(col("term"), col("doc_id"), col("rank").as("bm25_rank"))
    val vecs = emb.select(col("vec_id").as("doc_id"), col("embedding"))
    val anchors = retrieved.filter(col("bm25_rank") === 1)
      .join(vecs, "doc_id")
      .select(col("term"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("term")
      .orderBy(col("cosine").desc, col("doc_id"))
    retrieved.join(vecs, "doc_id")
      .join(broadcast(anchors), Seq("term"))
      .select(col("term"), col("doc_id"), col("bm25_rank"),
        EmbeddingSim.cosine(col("q_emb"), col("embedding")).as("cosine"))
      .withColumn("rerank", row_number().over(w).cast("long"))
      .filter(col("rerank") <= topK)
  }

  /** Per-source quality report: doc counts, quality-gate pass
    * counts, and token mass per source — the corpus-composition
    * dashboard a mixing/selection decision reads. One integer
    * aggregate over |sources| groups; the only float is the final
    * exact mean division. The gate flag comes from the SAME
    * qualityFilter stage the pipeline uses (left-semi flag join on
    * doc_id), so this report can't drift from the real gate. */
  def sourceQuality(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      size(TextAnalysis.tokensCol(col("text"))).cast("long").as("n_tokens"))
    val quality = TextAnalysis.qualityFilter(docs)
      .select(col("doc_id"), lit(1L).as("q"))
    base.join(quality, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("q"), lit(0L))).as("n_quality"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("n_quality"),
        col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"))
  }

  /** Per-(source, lang) corpus COMPOSITION (docs, tokens, chars) —
    * the dashboard slice whose aggregates are all ABELIAN (counts and
    * sums, no min/max/distinct), which is exactly what makes it
    * incrementally maintainable from a change feed
    * ([[compositionApplyFeed]]). */
  def compositionOf(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("lang"), col("n_chars"),
        size(TextAnalysis.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))

  /** INCREMENTAL VIEW MAINTENANCE over the change feed: absorb one
    * feed span ([[graft.sources.Merge.changeFeed]] output over a
    * documents-shaped table) into a maintained [[compositionOf]]
    * state with O(changed docs) work — postimages and inserts count
    * +1, preimages and deletes −1, so an update that MOVES a doc
    * between (source, lang) groups debits the old group and credits
    * the new one with no special casing. Groups whose live count
    * reaches exactly zero drop out (their sums are exactly zero too —
    * the arithmetic is integer throughout). CONTRACT: spans must be
    * applied exactly once and in order — the abelian arithmetic has
    * no replay defense (unlike the tombstoned index consumers), so
    * the caller feeds this from the exactly-once relay/stream path.
    * A contract violation is VISIBLE, not hidden: a double-applied
    * delete drives a group's count negative and the row is kept
    * (only `== 0` rows drop), so any dashboard or recompute-compare
    * flags it. The result is lineage-truncated per call — a polling
    * loop reassigning its state would otherwise accrete one union +
    * aggregation per poll until plan analysis dominates. At 100 TB
    * this is the difference between a dataset card that rescans the
    * corpus per release and one a feed poll keeps current. */
  def compositionApplyFeed(state: DataFrame, feed: DataFrame): DataFrame = {
    import graft.Caches.CheckpointSyntax
    val signed = feed.select(col("source"), col("lang"), col("n_chars"),
      size(TextAnalysis.tokensCol(col("text"))).cast("long").as("n_tokens"),
      when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L).as("sgn"))
    val delta = signed.groupBy("source", "lang")
      .agg(sum(col("sgn")).as("n_docs"),
        sum(col("sgn") * col("n_tokens")).as("total_tokens"),
        sum(col("sgn") * col("n_chars")).as("total_chars"))
    state.unionByName(delta)
      .groupBy("source", "lang")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("total_chars")).as("total_chars"))
      .filter(col("n_docs") =!= 0)
      .graftCheckpoint()
  }

  /** q:`composition_view` — incremental view maintenance on the
    * registered surface: the composition of the CDF chain's BASE
    * state, maintained to the final (v4) state PURELY by
    * [[compositionApplyFeed]] over the chain's change feed. The
    * oracle recomputes the composition on the final state, so a wrong
    * debit/credit flips the hash — and the [40%,42%) band (updated to
    * lang 'zz' at v2, deleted at v4) pins the drop-at-exactly-zero
    * arithmetic: its (source,'zz') groups must vanish, not linger as
    * zeros or go negative. */
  def compositionView(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    val vroot = graft.sources.Merge.ensureCdfChain(spark, dir)
    val base = graft.sources.Merge.readAt(spark, vroot, 1)
    compositionApplyFeed(compositionOf(base),
      graft.sources.Merge.changeFeed(spark, vroot, 1, 4))
  }

  /** One-row corpus MANIFEST: the dataset-card numbers (doc/source/
    * language counts, token and char mass, length extremes) a corpus
    * release ships with. Single global aggregate with map-side
    * partial combine — a constant-size result at any scale. */
  def corpusManifest(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("lang"), col("n_chars"),
        size(TextAnalysis.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** Histogram bucket width (tokens) — shared with the oracle. */
  val LengthBucketTokens: Int = 16

  /** Sequence-length distribution: docs and token mass per
    * fixed-width token-count bucket — the packing/curriculum
    * diagnostic (how much of the corpus fits a context window, where
    * the padding waste is). Pure integer arithmetic; one narrow agg
    * over ~hundreds of buckets at any scale. */
  def lengthHistogram(docs: DataFrame,
                      width: Int = LengthBucketTokens): DataFrame = {
    val n = size(TextAnalysis.tokensCol(col("text"))).cast("long")
    // `div`, not `/`: Column./ is always DOUBLE division in Spark
    docs.select(n.as("n_tokens"))
      .select(expr(s"n_tokens div $width").as("bucket"), col("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"), max(col("n_tokens")).as("max_tokens"))
  }

  /** Boilerplate threshold — a chunk appearing in >= this many
    * DISTINCT documents is boilerplate (shared with the oracle). */
  val BoilerplateMinDocs: Int = 3

  /** CCNet-style boilerplate removal: a chunk whose text appears in
    * >= minDocs distinct documents (nav bars, license headers, cookie
    * banners at web scale) is stripped from EVERY document — unlike
    * spanDedup's keep-first, no copy survives. Frequency is computed
    * once by a chunk-text groupBy (16-byte-ish keys + text, never
    * full docs), rejoined by equi-join, and docs are reassembled from
    * surviving chunks. The group key carries the text alongside the
    * 31-bit fold hash so colliding chunk texts cannot pool their
    * document counts. */
  def boilerplateStrip(docs: DataFrame,
                       minDocs: Int = BoilerplateMinDocs): DataFrame = {
    val chunks = TextAnalysis.docChunks(docs, chunkTokens = 16, overlap = 0)
      .withColumn("chunk_hash", PortableHash.charFoldHash(col("chunk_text")))
      .graftCheckpoint() // two consumers: frequency table + reassembly
    val freq = chunks.groupBy("chunk_hash", "chunk_text")
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(freq, Seq("chunk_hash", "chunk_text"))
      .withColumn("kept", col("nd") < lit(minDocs))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_boilerplate"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("chunk_idx"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("cleaned_text"))
  }

  /** WITHIN-document repeated-chunk removal: keep the first
    * occurrence of each distinct chunk inside a doc, drop later
    * repeats (model-generated loops, copy-pasted sections). Entirely
    * row-local — chunking, first-occurrence detection
    * (array_position = index of FIRST match), and reassembly are
    * array HOFs over one row, so the operator is a narrow map with
    * ZERO shuffle at any scale. The O(chunks²) first-occurrence scan
    * is bounded by a doc's own chunk count, not the corpus. */
  def intraDedup(docs: DataFrame, chunkTokens: Int = 16): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    val base = docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
    val n = size(col("toks"))
    // exact for any realistic doc: double division of ints < 2^53
    val nChunks = floor((n + lit(chunkTokens - 1)).cast("double") / chunkTokens)
      .cast("int")
    val withChunks = base.select(col("doc_id"),
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(col("toks"), i * chunkTokens + 1,
          lit(chunkTokens)))).as("chunks"))
    val keptIdx = filter(
      sequence(lit(0), size(col("chunks")) - 1),
      i => array_position(col("chunks"), element_at(col("chunks"), i + 1))
        === (i + 1).cast("long"))
    withChunks.select(col("doc_id"),
      size(col("chunks")).cast("long").as("n_chunks"),
      (size(col("chunks")) - size(keptIdx)).cast("long").as("n_dropped"),
      array_join(transform(keptIdx, i => element_at(col("chunks"), i + 1)),
        " ").as("cleaned_text"))
  }

  /** Corpus snapshot DIFF — the dataset-versioning audit between two
    * releases: which docs were added, removed, changed (by content
    * digest, not id), or untouched. Snapshots here are derived
    * deterministically from the one documents table so the oracle
    * can replay them: "old" drops doc_id%10==3, "new" drops
    * doc_id%10==7 and edits (uppercases) doc_id%7==2. The diff is a
    * digest-only full-outer equi-join on doc_id — 16-byte md5 keys
    * shuffle, never payloads — feeding a 4-group aggregate. */
  def corpusDiff(docs: DataFrame): DataFrame = {
    val prev = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      .select(col("doc_id"), md5(col("text")).as("old_md5"))
    val next = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      .select(col("doc_id"),
        md5(when(pmod(col("doc_id"), lit(7)) === 2, upper(col("text")))
          .otherwise(col("text"))).as("new_md5"))
    prev.join(next, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  /** Skew report size. */
  val SkewTopK: Int = 20

  /** JOIN-KEY SKEW REPORT: the top-k hottest keys of a prospective
    * join/aggregation column with integer hotness ratios — the
    * diagnostic that decides whether a key needs the
    * [[Salting.saltedEquiJoin]] treatment (its planted-skew fixture
    * is exactly a key this report would flag at rank 1). Per-key
    * counts are one hash aggregate; the global top-k is the
    * [[vocabTopK]] shape (distributed per-partition heads + driver
    * merge of k rows, THEN a rank window over only the k survivors —
    * no single-partition pass ever sees the key space). The hotness
    * ratio is integer permille of the mean key load (count × n_keys
    * × 1000 / total), so the report replays bit-exactly. The triple
    * product is widened to decimal before the division: in long
    * arithmetic a 1e9-row hot key over 1e8 keys is ~1e20 > 2^63 and
    * Spark would wrap silently — exactly the 100 TB regime this
    * diagnostic serves (r7 advice). */
  def skewReport(events: DataFrame, topK: Int = SkewTopK): DataFrame = {
    val counts = events.groupBy("user_id").agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts
      .orderBy(col("n_rows").desc, col("user_id").asc)
      .limit(topK)
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_rows").desc, col("user_id").asc)).cast("long"))
      .select(col("rank"), col("user_id"), col("n_rows"),
        expr("CAST(n_rows AS DECIMAL(38,0)) * n_keys * 1000 div total_rows")
          .as("permille_of_mean"))
  }

  /** Numeric / string column split of the documents schema — min and
    * max are emitted only for the numeric columns (string min/max
    * would pin a collation contract the two engines don't share). */
  val StatsNumCols: Seq[String] = Seq("doc_id", "n_chars")
  val StatsStrCols: Seq[String] = Seq("text", "lang", "source")

  /** ANALYZE-style per-column TABLE STATS in one pass: row count,
    * null count, exact distinct count, and (numeric columns) min and
    * max — the catalog statistics a cost-based optimizer, a skew
    * advisor, or the [[graft.sources.Compaction]] skipping index all
    * start from. One aggregate over the table (count_distinct
    * expands the input ×|columns| map-side — the cadence of an
    * ANALYZE, not a hot path; continuous monitoring at 100 TB swaps
    * in the HLL sketch the approx_distinct query already carries),
    * then a stack() unpivot of the single result row — driver-side
    * work is one row regardless of table size. */
  def tableStats(docs: DataFrame): DataFrame = {
    val cols = StatsNumCols ++ StatsStrCols
    val aggs = cols.flatMap { c =>
      val mm =
        if (StatsNumCols.contains(c))
          Seq(min(col(c)).cast("long").as(s"min_$c"),
            max(col(c)).cast("long").as(s"max_$c"))
        else
          Seq(lit(null).cast("long").as(s"min_$c"),
            lit(null).cast("long").as(s"max_$c"))
      Seq(count(col(c)).as(s"cnt_$c"),
        count_distinct(col(c)).as(s"ndv_$c")) ++ mm
    } :+ count(lit(1)).as("n_rows")
    val row = docs.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', cnt_$c, ndv_$c, min_$c, max_$c").mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_non_null, n_distinct, min_long, max_long)")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_long"), col("max_long"))
  }
}

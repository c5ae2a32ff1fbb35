package graft.oracle

import graft.Config

/** DuckDB oracle SQL for every oracle-checkable query in
  * SparkEntry.queries. Each statement replays the Spark computation
  * with IDENTICAL integer/IEEE arithmetic (same fold order, same
  * affine constants from Config.coeffs, integer-cents money math),
  * so the driver's hash compare matches bit-for-bit — no rounding
  * tolerances needed anywhere.
  */
object Sql {
  private val P = Config.P
  private val K = Config.K
  private val S = Config.NumHashes
  private val B = Config.Bands
  private val R = Config.RowsPerBand
  private val T = Config.Threshold
  private val Tpct = Config.ThresholdPct
  // operator defaults — interpolated, never re-typed as literals, so
  // engine and oracle stay pinned to one definition
  private val SamplePct = graft.operators.Sampling.DefaultPct
  private val PackBudget = graft.operators.Sampling.DefaultPackBudget
  private val PackBuckets = graft.operators.Sampling.DefaultPackBuckets
  private val MixQuota = graft.operators.Sampling.DefaultQuota
  private val BudgetTokens = graft.operators.Sampling.DefaultBudgetTokens
  private val PerStratum = graft.operators.Sampling.DefaultPerStratum
  private val VocabTopK = graft.operators.CorpusStats.DefaultVocabTopK

  /** DuckDB fold hash over the characters of an expression —
    * mirrors PortableHash.charFoldHash. */
  private def foldHash(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, length($e)), " +
      s"i -> ascii(substr($e, i, 1))::BIGINT)), (acc, x) -> (acc * ${Config.CharBase} + x) % $P)"

  private def sigCols: Seq[String] = (0 until S).map(Config.sigCol)

  /** Shared CTE block for the documents/minhash pipeline. DuckDB
    * only evaluates CTEs actually referenced by the final SELECT. */
  private val docCtes: String = {
    val mins = (0 until S).map { i =>
      val (a, b) = Config.coeffs(i)
      s"min(($a * h + $b) % $P) AS ${Config.sigCol(i)}"
    }.mkString(",\n    ")
    val bandSelects = (0 until B).map { j =>
      val cols = (j * R until (j + 1) * R).map(Config.sigCol).mkString(", ")
      s"SELECT doc_id, $j AS band, concat_ws(',', $cols) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val jac = "len(list_intersect(x.hs, y.hs))::DOUBLE / len(list_distinct(list_concat(x.hs, y.hs)))"
    val nAgree = sigCols.map(c => s"(CASE WHEN l.$c = r.$c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH shings AS (
  SELECT doc_id, CASE WHEN i + ${K - 1} <= length(text) THEN substr(text, i, $K)
                      ELSE substr(text, i, $K) || ' ' END AS shingle
  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) t
),
hashed AS (
  SELECT doc_id, ${foldHash("shingle")} AS h FROM shings
),
sig AS (
  SELECT doc_id,
    $mins
  FROM hashed GROUP BY doc_id
),
bands AS (
  $bandSelects
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
hset AS (
  SELECT doc_id, list(DISTINCT h) AS hs FROM hashed GROUP BY doc_id
),
prefilt AS (
  SELECT c.id_l, c.id_r
  FROM cand c JOIN sig l ON c.id_l = l.doc_id JOIN sig r ON c.id_r = r.doc_id
  WHERE ($nAgree) >= ${Config.EstPrefilterMinCount}
),
simpairs AS (
  SELECT id_l, id_r, $jac AS jaccard
  FROM prefilt JOIN hset x ON id_l = x.doc_id JOIN hset y ON id_r = y.doc_id
  WHERE $jac >= $T
),
toktab AS (
  SELECT doc_id, text, lang, source, n_chars,
         list_filter(string_split(text, ' '), tk -> tk <> '') AS toks
  FROM documents
)"""
  }

  private def docQ(sel: String): String = s"$docCtes\n$sel"

  /** The proportional corpus/batch frontier CTE — mirrors
    * IncrementalIngest.frontierId ((max_id + 1) * 80 // 100). */
  private val frontierCte: String =
    ", fr AS (SELECT (max(doc_id) + 1) * " +
      s"${graft.operators.IncrementalIngest.FrontierPct} // 100 AS f FROM documents)"

  /** Integer cents of an exact-2-decimal double column. */
  private def cents(e: String): String = s"CAST(round($e * 100) AS BIGINT)"
  private def money(sumExpr: String): String = s"CAST($sumExpr AS DOUBLE) / 100.0"

  private def listIn(lst: String, words: Seq[String]): String =
    s"CAST(len(list_filter($lst, tk -> tk IN (${words.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"

  // ---------------- minhash / documents pipeline ----------------

  val shingles: String = docQ("SELECT doc_id, shingle FROM shings")

  val shingleDict: String = docQ(
    """SELECT shingle, string_agg(DISTINCT doc_id, ',' ORDER BY doc_id) AS doc_ids,
      count(DISTINCT doc_id)::BIGINT AS n_docs
    FROM shings GROUP BY shingle""")

  val groupSketch: String = docQ(
    s"SELECT doc_id % 50 AS g, ${sigCols.map(c => s"min($c) AS $c").mkString(", ")} FROM sig GROUP BY 1")

  val minhashSignatures: String =
    docQ(s"SELECT doc_id, ${sigCols.mkString(", ")} FROM sig")

  val lshBands: String = docQ("SELECT doc_id, band, band_key FROM bands")

  val candidatePairs: String = docQ("SELECT id_l, id_r FROM cand")

  /** candidatePairs with the degenerate-bucket guard ON: buckets
    * holding more than m members contribute no pairs — the scale
    * posture's skew cap, replayed exactly. */
  def candidatePairsCapped(m: Int): String = docQ(
    s"""SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
    FROM (SELECT band, band_key FROM bands
          GROUP BY band, band_key HAVING count(*) <= $m) ok
    JOIN bands l ON l.band = ok.band AND l.band_key = ok.band_key
    JOIN bands r ON r.band = ok.band AND r.band_key = ok.band_key
      AND l.doc_id < r.doc_id""")

  val collisionCounts: String = docQ(
    """SELECT l.doc_id AS id_l, r.doc_id AS id_r, count(*)::BIGINT AS n_collisions
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    GROUP BY 1, 2""")

  /** Ingest filtering (IncrementalIngest.filterBatch with corpus =
    * doc_id < 400): a batch doc survives iff NO bucket-colliding
    * partner (corpus or earlier batch id) reaches exact hash-set
    * Jaccard >= t. No sketch prefilter here (filterBatch verifies
    * every candidate directly), so the oracle drops via cand + hset,
    * not via simpairs. */
  val ingestFilter: String = docQ(
    s"""$frontierCte
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d, fr
    WHERE d.doc_id >= f AND d.doc_id NOT IN (
      SELECT c.id_r FROM cand c
      JOIN hset x ON c.id_l = x.doc_id
      JOIN hset y ON c.id_r = y.doc_id
      WHERE len(list_intersect(x.hs, y.hs))::DOUBLE
            / len(list_distinct(list_concat(x.hs, y.hs))) >= $T)""")

  /** Incremental ingest: corpus = doc_id < 400, batch = the rest —
    * incremental candidates are exactly the full-corpus candidates
    * touching the batch. */
  val incrementalPairs: String =
    docQ(s"""$frontierCte
    SELECT id_l, id_r FROM cand, fr WHERE id_l >= f OR id_r >= f""")

  /** Capped-INDEX incremental probe replay: corpus buckets with
    * occupancy > m never enter the index, so corpus×batch candidates
    * form only through kept buckets; within-batch pairs are
    * unaffected (the cap governs the index, not the batch). */
  def incrementalPairsIndexCapped(m: Int): String = docQ(
    s"""$frontierCte,
    idx AS (SELECT band, band_key, doc_id FROM bands, fr WHERE doc_id < f),
    keepb AS (SELECT band, band_key FROM idx
              GROUP BY band, band_key HAVING count(*) <= $m),
    nb AS (SELECT band, band_key, doc_id FROM bands, fr WHERE doc_id >= f),
    crossp AS (SELECT least(i.doc_id, n.doc_id) AS id_l,
                      greatest(i.doc_id, n.doc_id) AS id_r
               FROM idx i
               JOIN keepb k ON i.band = k.band AND i.band_key = k.band_key
               JOIN nb n ON i.band = n.band AND i.band_key = n.band_key
               WHERE i.doc_id <> n.doc_id),
    within AS (SELECT l.doc_id AS id_l, r.doc_id AS id_r
               FROM nb l JOIN nb r
                 ON l.band = r.band AND l.band_key = r.band_key
                    AND l.doc_id < r.doc_id)
    SELECT DISTINCT id_l, id_r
    FROM (SELECT * FROM crossp UNION ALL SELECT * FROM within)""")

  val similarPairs: String = docQ("SELECT id_l, id_r, jaccard FROM simpairs")

  val pairsSymmetric: String = docQ(
    """SELECT s.id_a, s.id_b, ta.text AS text_a, tb.text AS text_b
    FROM (SELECT id_l AS id_a, id_r AS id_b FROM simpairs
          UNION ALL SELECT id_r AS id_a, id_l AS id_b FROM simpairs) s
    JOIN documents ta ON s.id_a = ta.doc_id
    JOIN documents tb ON s.id_b = tb.doc_id""")

  val minhashEstimate: String = {
    val eq = sigCols.map(c => s"(CASE WHEN l.$c = r.$c THEN 1 ELSE 0 END)").mkString(" + ")
    docQ(s"""SELECT c.id_l, c.id_r, ($eq)::DOUBLE / $S AS est_jaccard
    FROM cand c JOIN sig l ON c.id_l = l.doc_id JOIN sig r ON c.id_r = r.doc_id""")
  }

  /** Asymmetric containment with prefix-filter candidates over
    * hashed word TRIGRAMS: each doc probes on its n - ceil(T*n) + 1
    * rarest distinct gram hashes (rarity = corpus doc frequency,
    * ties by hash), the bound in exact integer arithmetic from
    * T = Tpct/100 (mirrors CorpusStats.containmentPairs — FP would
    * shave it when (1-T)*n is integral); a pair sharing none of the
    * prefix provably has containment < T. Verification: |A∩B|/|A|
    * and |A∩B|/|B| on the full distinct-hash sets, kept when either
    * >= T. */
  val containmentPairs: String = docQ(
    s""", tg AS (SELECT doc_id, CASE WHEN len(toks) >= 3
            THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
            ELSE []::VARCHAR[] END AS grams FROM toktab),
    tgr AS (SELECT doc_id, unnest(grams) AS g FROM tg),
    dh AS (SELECT DISTINCT doc_id, ${foldHash("g")} AS h FROM tgr),
    chset AS (SELECT doc_id, list(DISTINCT h) AS hs FROM dh GROUP BY doc_id),
    dfq AS (SELECT h, count(*)::BIGINT AS df FROM dh GROUP BY h),
    rk AS (SELECT d.doc_id, d.h,
             row_number() OVER (PARTITION BY d.doc_id ORDER BY f.df, d.h) AS rn,
             count(*) OVER (PARTITION BY d.doc_id) AS n
           FROM dh d JOIN dfq f ON d.h = f.h),
    pfx AS (SELECT doc_id, h FROM rk
            WHERE rn <= n - (($Tpct * n + 99) // 100) + 1),
    ccand AS (SELECT DISTINCT least(p.doc_id, b.doc_id) AS id_l,
                greatest(p.doc_id, b.doc_id) AS id_r
              FROM pfx p JOIN dh b ON p.h = b.h AND p.doc_id <> b.doc_id)
    SELECT id_l, id_r,
      CAST(len(x.hs) AS BIGINT) AS n_l, CAST(len(y.hs) AS BIGINT) AS n_r,
      len(list_intersect(x.hs, y.hs))::DOUBLE / len(x.hs) AS cont_l_in_r,
      len(list_intersect(x.hs, y.hs))::DOUBLE / len(y.hs) AS cont_r_in_l
    FROM ccand JOIN chset x ON id_l = x.doc_id JOIN chset y ON id_r = y.doc_id
    WHERE greatest(len(list_intersect(x.hs, y.hs))::DOUBLE / len(x.hs),
                   len(list_intersect(x.hs, y.hs))::DOUBLE / len(y.hs)) >= $T""")

  // ---------------- dedup ----------------

  val dedupExact: String =
    """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
    FROM documents GROUP BY md5(text)"""

  val dedupNearKeep: String = docQ(
    """SELECT doc_id AS kept_id FROM documents
    WHERE doc_id NOT IN (SELECT id_r FROM simpairs)""")

  /** Quality-ranked near-dup keep: a doc is dropped iff some verified
    * partner has more tokens (smaller doc_id breaks ties). */
  val dedupKeepBest: String = docQ(
    """, sym AS (
      SELECT id_l AS a, id_r AS b FROM simpairs
      UNION ALL SELECT id_r, id_l FROM simpairs
    ),
    tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toktab)
    SELECT t.doc_id AS kept_id, t.n_tokens FROM tk t
    WHERE NOT EXISTS (
      SELECT 1 FROM sym s JOIN tk x ON s.b = x.doc_id
      WHERE s.a = t.doc_id
        AND (x.n_tokens > t.n_tokens OR (x.n_tokens = t.n_tokens AND s.b < s.a)))""")

  /** Shared chunk-generation SELECT body (stride 12 = 16 - overlap
    * 4) — one definition so docChunks and chunkDedup cannot
    * desynchronize from the Spark constants. */
  private def chunkSelectFor(chunkTokens: Int, overlap: Int): String = {
    val stride = chunkTokens - overlap
    s"""SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS chunk_idx,
      CAST((t.i - 1) * $stride AS BIGINT) AS start_tok,
      CAST(len(toks[(t.i - 1) * $stride + 1 : least((t.i - 1) * $stride + $chunkTokens, len(toks))]) AS BIGINT) AS n_chunk_tokens,
      array_to_string(toks[(t.i - 1) * $stride + 1 : least((t.i - 1) * $stride + $chunkTokens, len(toks))], ' ') AS chunk_text
    FROM toktab,
      LATERAL (SELECT unnest(generate_series(1,
        CAST(ceil(len(toks) / $stride.0) AS BIGINT))) AS i) t
    WHERE len(toks) > 0"""
  }

  private val chunkSelect: String = chunkSelectFor(16, 4)

  /** Overlapping token chunks: chunk i covers tokens
    * [i*12, i*12 + 16) (stride 12 = 16 - overlap 4). */
  val docChunks: String = docQ(chunkSelect)

  /** Cross-document chunk dedup keep-first: replay docChunks, fold-
    * hash each chunk text, keep the (doc_id, chunk_idx)-earliest row
    * per DISTINCT TEXT (the hash only spreads the shuffle — colliding
    * texts stay separate) with its copy count. */
  /** Span-level keep-first dedup + per-doc reassembly — mirrors
    * CorpusStats.spanDedup: non-overlapping 16-token chunks, keep the
    * (doc_id, chunk_idx)-earliest row per distinct text, rebuild each
    * doc from its kept chunks in order. Sums cast ::BIGINT (DuckDB
    * widens to HUGEINT otherwise); all-dropped docs get ''. */
  val spanDedup: String = docQ(
    s""", chunks AS (${chunkSelectFor(16, 0)}),
    fl AS (SELECT doc_id, chunk_idx, chunk_text,
        row_number() OVER (PARTITION BY chunk_text
          ORDER BY doc_id, chunk_idx) = 1 AS kept
      FROM chunks)
    SELECT doc_id, count(*)::BIGINT AS n_chunks,
      CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
      coalesce(string_agg(CASE WHEN kept THEN chunk_text END, ' '
        ORDER BY chunk_idx), '') AS cleaned_text
    FROM fl GROUP BY doc_id""")

  val chunkDedup: String = docQ(
    s""", chunks AS ($chunkSelect),
    chash AS (SELECT *, ${foldHash("chunk_text")} AS chunk_hash FROM chunks)
    SELECT doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text, chunk_hash,
      n_copies::BIGINT AS n_copies
    FROM (SELECT *,
            row_number() OVER (PARTITION BY chunk_hash, chunk_text ORDER BY doc_id, chunk_idx) AS rn,
            count(*) OVER (PARTITION BY chunk_hash, chunk_text) AS n_copies
          FROM chash)
    WHERE rn = 1""")

  /** Global vocabulary top-k by occurrence count (ties broken by
    * token text), with document frequency. */
  val vocabTopK: String = docQ(
    s""", tok AS (SELECT doc_id, unnest(toks) AS token FROM toktab),
    vc AS (SELECT token, count(*)::BIGINT AS n_occurrences,
             count(DISTINCT doc_id)::BIGINT AS n_docs
           FROM tok GROUP BY token),
    rk AS (SELECT token, n_occurrences, n_docs,
             CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT) AS "rank"
           FROM vc)
    SELECT token, n_occurrences, n_docs, "rank" FROM rk WHERE "rank" <= $VocabTopK""")

  /** Count-Min heavy hitters replay: the ENTIRE sketch — fold hash,
    * seeded affine rows mod width, counter sums, per-token min — is
    * integer arithmetic, so the oracle rebuilds the d×w grid and
    * reproduces the ESTIMATES bit-exactly (CorpusStats.heavyHitters;
    * DuckDB sum widens to HUGEINT, hence the BIGINT casts). */
  val heavyHitters: String = {
    val d = graft.operators.CorpusStats.CmsDepth
    val w = graft.operators.CorpusStats.CmsWidth
    val k = graft.operators.CorpusStats.HeavyHittersK
    val coefValues = (0 until d).map { r =>
      val (a, b) = Config.coeffs(r); s"($r, ${a}::BIGINT, ${b}::BIGINT)"
    }.mkString(", ")
    docQ(s""", tok AS (SELECT unnest(toks) AS token FROM toktab),
    vc AS (SELECT token, count(*)::BIGINT AS exact_cnt FROM tok GROUP BY token),
    hh_hash AS (SELECT token, exact_cnt, ${foldHash("token")} AS h FROM vc),
    coef(r, a, b) AS (VALUES $coefValues),
    hh_rb AS (SELECT token, exact_cnt, r, ((a * h + b) % $P) % $w AS bucket
           FROM hh_hash CROSS JOIN coef),
    sketch AS (SELECT r, bucket, CAST(sum(exact_cnt) AS BIGINT) AS counter
               FROM hh_rb GROUP BY r, bucket),
    top AS (SELECT token, exact_cnt FROM vc
            ORDER BY exact_cnt DESC, token LIMIT $k)
    SELECT t.token, t.exact_cnt,
      CAST(min(s.counter) AS BIGINT) AS cms_est,
      CAST(min(s.counter) - t.exact_cnt AS BIGINT) AS overcount
    FROM top t
    JOIN hh_rb ON hh_rb.token = t.token
    JOIN sketch s ON s.r = hh_rb.r AND s.bucket = hh_rb.bucket
    GROUP BY t.token, t.exact_cnt""")
  }

  /** Unigram-LM score: integer per-doc sum of corpus term
    * frequencies, two exact double divisions at the end (no log). */
  val unigramScore: String = docQ(
    """, tok AS (SELECT doc_id, unnest(toks) AS token FROM toktab),
    ctf AS (SELECT token, count(*)::BIGINT AS ctf FROM tok GROUP BY token),
    tot AS (SELECT sum(ctf)::BIGINT AS total_tf FROM ctf),
    perdoc AS (SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                 sum(c.ctf)::BIGINT AS sum_tf
               FROM tok t JOIN ctf c USING (token) GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, sum_tf,
      (sum_tf::DOUBLE / n_tokens::DOUBLE) / total_tf::DOUBLE AS unigram_score
    FROM perdoc CROSS JOIN tot""")

  /** Bigram-LM fluency replay (CorpusStats.bigramFluency): same
    * floor-ppm conditional arithmetic over the NON-distinct adjacent
    * pair stream; sum(BIGINT) widens to HUGEINT here, so cast before
    * the type-sensitive hash. Docs with < 2 tokens null-fill to 0. */
  val bigramFluency: String = docQ(
    """, bgidx AS (SELECT doc_id, toks,
        unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i FROM toktab),
    bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM bgidx),
    cab AS (SELECT a, b, count(*)::BIGINT AS cab FROM bg GROUP BY a, b),
    ca AS (SELECT a, count(*)::BIGINT AS ca FROM bg GROUP BY a),
    cond AS (SELECT a, b, (1000000 * cab) // ca AS ppm FROM cab JOIN ca USING (a)),
    perdoc AS (SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
                 CAST(sum(ppm) AS BIGINT) AS sum_ppm
               FROM bg JOIN cond USING (a, b) GROUP BY bg.doc_id)
    SELECT d.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
      coalesce(sum_ppm, 0)::BIGINT AS sum_ppm,
      coalesce(sum_ppm // n_bigrams, 0)::BIGINT AS mean_ppm
    FROM documents d LEFT JOIN perdoc ON d.doc_id = perdoc.doc_id""")

  /** Cross-source shingle-set Jaccard (pairs sharing >= 1 shingle):
    * intersections via equi-join on the hash over distinct
    * (source, h) pairs — mirrors the Spark shape. */
  val sourceOverlap: String = docQ(
    """, srch AS (SELECT DISTINCT d.source AS source, hx.h AS h
        FROM hashed hx JOIN documents d ON hx.doc_id = d.doc_id),
    ssz AS (SELECT source, count(*)::BIGINT AS n FROM srch GROUP BY source),
    sint AS (SELECT l.source AS src_l, r.source AS src_r, count(*)::BIGINT AS n_inter
             FROM srch l JOIN srch r ON l.h = r.h AND l.source < r.source
             GROUP BY 1, 2)
    SELECT src_l, src_r, a.n AS n_l, b.n AS n_r, n_inter,
      n_inter::DOUBLE / (a.n + b.n - n_inter)::DOUBLE AS jaccard
    FROM sint JOIN ssz a ON src_l = a.source JOIN ssz b ON src_r = b.source""")

  /** Streaming first-fit packing: bin = tokens-before div budget
    * within each doc_id-ordered hash bucket. DuckDB widens window
    * sum(BIGINT) to HUGEINT (int128) — the driver's hash is
    * type-sensitive, so CAST back to BIGINT before it reaches an
    * output column. */
  val sequencePacking: String = docQ(
    s"""SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(doc_id % $PackBuckets AS INTEGER) AS bucket,
      (CAST(sum(len(toks)::BIGINT) OVER w AS BIGINT) - len(toks)::BIGINT) // $PackBudget AS bin,
      CAST(sum(len(toks)::BIGINT) OVER w AS BIGINT) - len(toks)::BIGINT AS tokens_before
    FROM toktab
    WINDOW w AS (PARTITION BY doc_id % $PackBuckets ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")

  /** CTE chain for the feature-hashed document embedding + sign-LSH
    * dedup (DocEmbedding.scala) — appended after docCtes, so `hashed`
    * is in scope. Mirrors: distinct hashes → 64 signed conditional
    * sums → per-table hyperplane buckets → bucket self-join →
    * integer dot / (sqrt·sqrt) cosine ≥ τ. */
  private val embedCtes: String = {
    import graft.operators.DocEmbedding.{Dim, Tables, Planes, CosThreshold}
    val sums = (0 until Dim).map { j =>
      f"coalesce(sum(CASE WHEN h %% $Dim = $j THEN (CASE WHEN (h // $Dim) %% 2 = 0 THEN 1 ELSE -1 END) END), 0)::BIGINT AS v_$j%02d"
    }.mkString(",\n    ")
    val arr = (0 until Dim).map(j => f"v_$j%02d").mkString("[", ", ", "]")
    val n2 = (0 until Dim).map(j => f"v_$j%02d * v_$j%02d").mkString(" + ")
    val tableSelects = (0 until Tables).map { t =>
      val dots = (0 until Planes).map { j =>
        val p = t * Planes + j
        s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, $Dim), " +
          s"i -> v[i] * (CASE WHEN ((i * 131 + ${p * 37}) % 97) % 2 = 0 THEN 1 ELSE -1 END))), " +
          f"(a, x) -> a + x) AS pd_$j%02d"
      }.mkString(",\n      ")
      val bucket = (0 until Planes).map(j =>
        f"(CASE WHEN pd_$j%02d > 0 THEN ${1L << j}%d ELSE 0 END)").mkString(" + ")
      s"""SELECT doc_id, $t AS tbl, CAST($bucket AS BIGINT) AS bucket FROM (
      SELECT doc_id, $dots FROM ven)"""
    }.mkString("\n  UNION ALL\n  ")
    val dot = s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, $Dim), " +
      "i -> a.v[i] * b.v[i])), (x, y) -> x + y)"
    s""",
edh AS (SELECT DISTINCT doc_id, h FROM hashed),
evec AS (
  SELECT doc_id,
    $sums
  FROM edh GROUP BY doc_id
),
ven AS (
  SELECT doc_id, $arr AS v, sqrt(($n2)::DOUBLE) AS nrm FROM evec
),
ebkt AS (
  $tableSelects
),
ecand AS (
  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
  FROM ebkt l JOIN ebkt r ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
epairs AS (
  SELECT id_l, id_r, $dot::DOUBLE / (a.nrm * b.nrm) AS cosine
  FROM ecand JOIN ven a ON id_l = a.doc_id JOIN ven b ON id_r = b.doc_id
  WHERE $dot::DOUBLE / (a.nrm * b.nrm) >= $CosThreshold
)"""
  }

  val embedDedupPairs: String =
    docCtes + embedCtes + "\nSELECT id_l, id_r, cosine FROM epairs"

  val embedDedupKeep: String =
    docCtes + embedCtes +
      "\nSELECT doc_id AS kept_id FROM documents WHERE doc_id NOT IN (SELECT id_r FROM epairs)"

  val simhash: String = {
    val bits = 30
    val sums = (0 until bits).map(j =>
      f"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j%02d").mkString(",\n      ")
    val fp = (0 until bits).map(j =>
      f"(CASE WHEN s_$j%02d > 0 THEN ${1L << j}%d ELSE 0 END)").mkString(" + ")
    docQ(s"""SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM (
      SELECT doc_id, $sums
      FROM (SELECT DISTINCT doc_id, h FROM hashed) GROUP BY doc_id)""")
  }

  /** Word-bigram simhash + Manku-style blocked near-dup pairs —
    * mirrors TextAnalysis.wordSimHash/simHashPairs (30 bits, blocks
    * of widths 8/8/7/7, hamming <= 3). Shared by the pairs and keep
    * queries. */
  private val simhashCtes: String = {
    val bits = 30
    val maxHamming = 3
    val sums = (0 until bits).map(j =>
      f"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j%02d").mkString(",\n      ")
    val fp = (0 until bits).map(j =>
      f"(CASE WHEN s_$j%02d > 0 THEN ${1L << j}%d ELSE 0 END)").mkString(" + ")
    val nBlocks = maxHamming + 1
    val widths = (0 until nBlocks).map(i => bits / nBlocks + (if (i < bits % nBlocks) 1 else 0))
    val los = widths.scanLeft(0)(_ + _)
    val blockSelects = (0 until nBlocks).map { i =>
      s"SELECT doc_id, $i AS blk, (f >> ${los(i)}) & ${(1L << widths(i)) - 1} AS bval FROM wsh"
    }.mkString("\n  UNION ALL\n  ")
    s""", wbg AS (
  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
    THEN list_distinct(list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1]))
    ELSE []::VARCHAR[] END) AS bg
  FROM toktab
),
wbh AS (SELECT doc_id, ${foldHash("bg")} AS h FROM wbg),
wsh AS (
  SELECT doc_id, CAST($fp AS BIGINT) AS f FROM (
    SELECT doc_id,
      $sums
    FROM wbh GROUP BY doc_id)
),
sblk AS (
  $blockSelects
),
scand AS (
  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
  FROM sblk l JOIN sblk r ON l.blk = r.blk AND l.bval = r.bval AND l.doc_id < r.doc_id
),
spairs AS (
  SELECT id_l, id_r, CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
  FROM scand JOIN wsh a ON id_l = a.doc_id JOIN wsh b ON id_r = b.doc_id
  WHERE bit_count(xor(a.f, b.f)) <= $maxHamming
)"""
  }

  val simhashDedupPairs: String =
    docQ(simhashCtes + "\nSELECT id_l, id_r, hamming FROM spairs")

  val simhashDedupKeep: String =
    docQ(simhashCtes +
      "\nSELECT doc_id AS kept_id FROM documents WHERE doc_id NOT IN (SELECT id_r FROM spairs)")

  /** Connected near-dup components — min reachable doc_id per node
    * over the symmetric verified-pair graph, via a recursive CTE
    * (UNION dedup bounds the closure; components here are tiny).
    * Mirrors Dedup.nearDupGroups' min-label-propagation fixpoint. */
  val nearDupGroups: String =
    docQ(s""", gedges AS (
  SELECT id_l AS a, id_r AS b FROM simpairs
  UNION ALL
  SELECT id_r AS a, id_l AS b FROM simpairs
),
gnodes AS (SELECT DISTINCT a AS doc_id FROM gedges),
reach AS (
  SELECT doc_id, doc_id AS r FROM gnodes
  UNION
  SELECT reach.doc_id, e.b AS r FROM reach JOIN gedges e ON reach.r = e.a
)
SELECT doc_id, min(r) AS group_id FROM reach GROUP BY doc_id""")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Cluster-level keep-best: the connected-component labels (same
    * recursive CTE as nearDupGroups) arg-maxed per group on
    * (n_tokens desc, doc_id asc). */
  val nearDupGroupsKeepBest: String =
    docQ(s""", gedges AS (
  SELECT id_l AS a, id_r AS b FROM simpairs
  UNION ALL
  SELECT id_r AS a, id_l AS b FROM simpairs
),
gnodes AS (SELECT DISTINCT a AS doc_id FROM gedges),
reach AS (
  SELECT doc_id, doc_id AS r FROM gnodes
  UNION
  SELECT reach.doc_id, e.b AS r FROM reach JOIN gedges e ON reach.r = e.a
),
glab AS (SELECT doc_id, min(r) AS group_id FROM reach GROUP BY doc_id),
gq AS (SELECT g.doc_id, g.group_id, CAST(len(t.toks) AS BIGINT) AS n_tokens
       FROM glab g JOIN toktab t ON g.doc_id = t.doc_id)
SELECT group_id, doc_id AS kept_id, n_tokens, group_size::BIGINT AS group_size
FROM (SELECT *,
        row_number() OVER (PARTITION BY group_id ORDER BY n_tokens DESC, doc_id) AS rn,
        count(*) OVER (PARTITION BY group_id) AS group_size
      FROM gq)
WHERE rn = 1""")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  val fingerprint: String = docQ(
    s"""SELECT doc_id, ${foldHash("text")} AS fingerprint,
      CAST(length(text) AS BIGINT) AS n_chars_text, n_chars AS n_chars_meta
    FROM documents""")

  /** Stub-decoded media features (Multimodal.StubDecoder is a pure
    * function of the payload bytes; the corpus is ASCII, so bytes ==
    * code points and the checksum is the portable fold hash). */
  val mediaFeatures: String =
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      'image/stub' AS kind,
      CAST(CASE WHEN length(text) > 0 THEN 64 + (ascii(substr(text, 1, 1)) & 63) ELSE 0 END AS INTEGER) AS width,
      CAST(CASE WHEN length(text) > 1 THEN 64 + (ascii(substr(text, 2, 1)) & 63) ELSE 0 END AS INTEGER) AS height,
      ${foldHash("text")} AS checksum
    FROM documents"""

  /** REAL PNG round trip (encodePng → ImageIO decode): the raster is
    * a 16-wide grayscale image with pixel i = char i (zero-padded to
    * the last row), so the decoded dimensions and the fold over the
    * decoded pixels re-derive from the text alone — PNG is lossless,
    * making the checksum independent of the encoder's byte stream
    * (which is why n_bytes is NOT part of this query's output). */
  val mediaDecode: String = {
    val h = "greatest(1, (length(text) + 15) // 16)"
    val pixelFold =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 16 * $h), " +
        s"i -> CASE WHEN i <= length(text) THEN ascii(substr(text, i, 1))::BIGINT % 256 " +
        s"ELSE 0::BIGINT END)), (acc, x) -> (acc * 31 + x) % $P)"
    s"""SELECT doc_id, 'image/png' AS kind, CAST(16 AS INTEGER) AS width,
      CAST($h AS INTEGER) AS height, $pixelFold AS checksum
    FROM documents"""
  }

  /** media_audio replay: the WAV fixture is lossless by construction
    * (sample i = char i mod 256 in the LOW byte of a 16-bit LE
    * frame), so the decoded-PCM checksum re-derives from the text —
    * fold over the byte stream [c1, 0, c2, 0, ...]: odd positions
    * carry the char, even positions the zero high byte. The decoder
    * reports PCM_SIGNED and the encode-time rate/frame count. */
  val mediaAudio: String = {
    val pcmFold =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 2 * length(text)), " +
        s"i -> CASE WHEN i % 2 = 1 THEN ascii(substr(text, (i + 1) // 2, 1))::BIGINT % 256 " +
        s"ELSE 0::BIGINT END)), (acc, x) -> (acc * 31 + x) % $P)"
    s"""SELECT doc_id, 'audio/pcm_signed' AS kind,
      CAST(8000 AS INTEGER) AS sample_rate,
      length(text)::BIGINT AS n_frames, $pcmFold AS checksum
    FROM documents"""
  }

  /** media_video_meta replay: the MP4 fixture derives every container
    * field from the text (Mp4Writer — timescale 1000, 40 ticks per
    * one-byte sample, 16-wide display raster, 'mp4v' entry, mdat =
    * the text bytes; odd doc_ids take the mvhd-v1/largesize framing,
    * which changes the BYTES but not the parsed VALUES), so the
    * structural parse round-trips to plain arithmetic over
    * documents.text — proving Mp4Parser read the real boxes. */
  val mediaVideoMeta: String =
    s"""SELECT doc_id, 'isom' AS brand,
      CAST(doc_id % 2 AS INTEGER) AS mvhd_version,
      CAST(1000 AS BIGINT) AS timescale,
      CAST(40 * length(text) AS BIGINT) AS duration,
      CAST(1 AS INTEGER) AS n_tracks, CAST(16 AS INTEGER) AS width,
      CAST(greatest(1, (length(text) + 15) // 16) AS INTEGER) AS height,
      'mp4v' AS codec, length(text)::BIGINT AS n_samples,
      length(text)::BIGINT AS mdat_bytes, ${foldHash("text")} AS checksum
    FROM documents"""

  /** media_video_frames replay: the AVI fixture stores each 64-char
    * text slice as an uncompressed 16×4 gray DIB frame (pixel = char
    * mod 256, zero-padded; min one frame), losslessly — so the
    * decoded per-frame pixel checksums re-derive from the text:
    * frame f folds chars [64f+1, 64f+64] in raster order. */
  val mediaVideoFrames: String = {
    val nFrames = "greatest(1, (length(text) + 63) // 64)"
    val pixelFold =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 64), " +
        s"i -> CASE WHEN (f - 1) * 64 + i <= length(text) " +
        s"THEN ascii(substr(text, (f - 1) * 64 + i, 1))::BIGINT % 256 " +
        s"ELSE 0::BIGINT END)), (acc, x) -> (acc * 31 + x) % $P)"
    s"""SELECT doc_id, CAST(f - 1 AS INTEGER) AS frame_idx,
      CAST(16 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
      $pixelFold AS checksum
    FROM (SELECT doc_id, text,
            unnest(generate_series(1, $nFrames)) AS f
          FROM documents)"""
  }

  /** media_mjpeg replay: the MJPEG codec is LOSSY, so unlike the
    * other media round trips the decoded pixels can't be re-derived
    * bit-exactly from the text — the engine instead verifies every
    * decoded frame against the source raster IN-ENGINE and emits a
    * within-tolerance bit (the sketch_error_gate discipline). The
    * oracle replays the frame geometry exactly (one row per frame,
    * 16×4, frame count from the text length) and expects every
    * tolerance bit to be 1: a broken codec path (wrong quant, wrong
    * subsampling, byte-copy instead of decode) flips bits and fails
    * the hash. */
  val mediaMjpeg: String = {
    val nFrames = "greatest(1, (length(text) + 63) // 64)"
    s"""SELECT doc_id, CAST(f - 1 AS INTEGER) AS frame_idx,
      CAST(16 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
      CAST(1 AS INTEGER) AS within_tol
    FROM (SELECT doc_id, unnest(generate_series(1, $nFrames)) AS f
          FROM documents)"""
  }

  /** approx_distinct replay (r6 verdict item 7 — [oracle] now): the
    * exact distinct counts are plain SQL; the sketch-health bits are
    * expected 1 (a precision regression flips them in Spark's output
    * and fails the hash, the sketch_error_gate contract). */
  val approxDistinct: String =
    """SELECT p.l_returnflag, exact_parts, exact_supps,
      CAST(1 AS BIGINT) AS parts_within, CAST(1 AS BIGINT) AS supps_within
    FROM (SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS exact_parts
          FROM lineitem GROUP BY 1) p
    JOIN (SELECT l_returnflag, count(DISTINCT l_suppkey)::BIGINT AS exact_supps
          FROM lineitem GROUP BY 1) s ON p.l_returnflag = s.l_returnflag"""

  /** Expected state of the HLL error gate: every group within the
    * bound (mirrors Relational.sketchErrorGate — a sketch-precision
    * regression flips a bit in Spark's output and fails the hash). */
  val sketchErrorGate: String = {
    val pct = graft.operators.Relational.SketchMaxErrPct
    s"""SELECT l_returnflag, CAST($pct AS BIGINT) AS max_err_pct,
      CAST(1 AS BIGINT) AS parts_within, CAST(1 AS BIGINT) AS supps_within
    FROM (SELECT DISTINCT l_returnflag FROM lineitem)"""
  }

  /** Quantile gate replay: the sketch value isn't replayable, its
    * rank-error contract holding is (sketch_error_gate pattern). */
  val quantileErrorGate: String =
    """SELECT * FROM (VALUES (CAST(5000 AS BIGINT), CAST(1 AS BIGINT)),
      (9000, 1), (9900, 1)) t(quantile_bp, "within")"""

  /** Sink→source round trips must reproduce the table exactly — the
    * oracle is the identity over the written columns. */
  val docsIdentity: String =
    "SELECT doc_id, lang, source, text FROM documents"

  /** PII masking over the planted-pii corpus — mirrors
    * TextAnalysis.piiMask exactly: same four patterns (Java-regex ∩
    * RE2 common subset, so they read identically here), same
    * replacement ORDER (email → ip → phone → id), counts from
    * regexp_extract_all on the pre-mask text. DuckDB regexp_replace
    * needs the 'g' flag to match Spark's replace-all. */
  val piiMask: String = {
    import graft.operators.TextAnalysis.{EmailPattern, Ipv4Pattern, PhonePattern, IdPattern}
    def cnt(pat: String) = s"len(regexp_extract_all(text, '$pat'))::BIGINT"
    s"""WITH planted AS (
      SELECT doc_id,
        text || ' contact user' || doc_id || '@mail.example.com from 10.'
          || (doc_id % 200) || '.0.' || (doc_id % 250)
          || ' call +1 555 ' || (doc_id + 100000000)
          || ' acct ' || (doc_id + 9000000000) AS text
      FROM documents)
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, '$EmailPattern', '<EMAIL>', 'g'),
            '$Ipv4Pattern', '<IP>', 'g'),
          '$PhonePattern', '<PHONE>', 'g'),
        '$IdPattern', '<ID>', 'g') AS masked_text,
      ${cnt(EmailPattern)} AS n_emails,
      ${cnt(Ipv4Pattern)} AS n_ips,
      ${cnt(PhonePattern)} AS n_phones
    FROM planted"""
  }

  /** The ANN quality gate's EXPECTED state: one row per approximate
    * family with meets_floor = 1. The quantizer/hash-family results
    * themselves aren't SQL-replayable, but the quality claim is a
    * bit — Spark computes real recall vs the exact formulation and
    * emits 0 when it dips below the floor, which fails this hash
    * check. Floors interpolate the SAME constants the gate uses. */
  val annRecall: String = {
    import graft.operators.AnnRecall.{IvfFloorPct, IvfMaintainedFloorPct,
      MlFloorPct, MlPairsFloorPct}
    s"""SELECT 'ivf' AS family, CAST($IvfFloorPct AS BIGINT) AS floor_pct,
      CAST(1 AS BIGINT) AS meets_floor
    UNION ALL
    SELECT 'ivf_maintained', CAST($IvfMaintainedFloorPct AS BIGINT), CAST(1 AS BIGINT)
    UNION ALL
    SELECT 'ml_minhash', CAST($MlFloorPct AS BIGINT), CAST(1 AS BIGINT)
    UNION ALL
    SELECT 'ml_pairs', CAST($MlPairsFloorPct AS BIGINT), CAST(1 AS BIGINT)"""
  }

  /** GIF/BMP/WBMP round trips (encodeImage → ImageIO decode) on the
    * doc_id % 5 = 0 fifth of the corpus — the mediaDecode
    * re-derivation pattern per format: gif/bmp decode to the same
    * gray raster as png (pixel i = char i mod 256); wbmp is 1-bit by
    * spec, pixel i = (char i mod 2) decoding to 0 / 255. */
  val mediaDecodeFormats: String = {
    val h = "greatest(1, (length(text) + 15) // 16)"
    def fold(pixel: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 16 * $h), " +
        s"i -> CASE WHEN i <= length(text) THEN $pixel ELSE 0::BIGINT END)), " +
        s"(acc, x) -> (acc * 31 + x) % $P)"
    val grayFold = fold("ascii(substr(text, i, 1))::BIGINT % 256")
    val bitFold = fold("(ascii(substr(text, i, 1))::BIGINT % 2) * 255")
    val branches = Seq("gif" -> grayFold, "bmp" -> grayFold, "wbmp" -> bitFold)
      .map { case (fmt, f) =>
        s"""SELECT doc_id, 'image/$fmt' AS kind, CAST(16 AS INTEGER) AS width,
          CAST($h AS INTEGER) AS height, $f AS checksum
        FROM documents WHERE doc_id % 5 = 0"""
      }
    branches.mkString("\nUNION ALL\n")
  }

  /** Fixed-size chunking (frame-sampling shape): one row per 64-byte
    * chunk with its offset and fold hash. */
  val mediaFrames: String =
    s"""SELECT doc_id, CAST(t.i AS INTEGER) AS frame_idx,
      CAST(t.i * 64 AS BIGINT) AS "offset",
      CAST(length(substr(text, t.i * 64 + 1, 64)) AS BIGINT) AS frame_bytes,
      ${foldHash("substr(text, t.i * 64 + 1, 64)")} AS frame_hash
    FROM documents,
      LATERAL (SELECT unnest(generate_series(0,
        CAST(ceil(length(text) / 64.0) AS INTEGER) - 1)) AS i) t"""

  /** resizeStub(factor=4) → frameSample(64): the resized payload
    * keeps every 4th byte (texts are ASCII, so byte i = char i+1);
    * frames then chunk the RESIZED string exactly like mediaFrames. */
  val mediaResize: String =
    s"""WITH resized AS (
      SELECT doc_id,
        string_agg(substr(text, (i - 1) * 4 + 1, 1), '' ORDER BY i) AS rtext
      FROM documents,
        LATERAL (SELECT unnest(generate_series(1,
          CAST(ceil(length(text) / 4.0) AS INTEGER))) AS i) t
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(t.i AS INTEGER) AS frame_idx,
      CAST(t.i * 64 AS BIGINT) AS "offset",
      CAST(length(substr(rtext, t.i * 64 + 1, 64)) AS BIGINT) AS frame_bytes,
      ${foldHash("substr(rtext, t.i * 64 + 1, 64)")} AS frame_hash
    FROM resized,
      LATERAL (SELECT unnest(generate_series(0,
        CAST(ceil(length(rtext) / 64.0) AS INTEGER) - 1)) AS i) t"""

  val arrayFuncs: String =
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      embedding[1] AS first_val,
      embedding[len(embedding)] AS last_val,
      list_max(embedding) AS max_val,
      list_min(embedding) AS min_val,
      CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS idx_of_max
    FROM embeddings"""

  // ---------------- text analysis ----------------

  val tokenStats: String = docQ(
    """SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
      CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_no_space,
      CASE WHEN len(toks) > 0
           THEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS avg_token_len
    FROM toktab""")

  val quality: String = {
    val stop = listIn("toks", Seq("the", "a", "of", "in", "and"))
    docQ(s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
      $stop AS n_stopwords,
      CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS type_token_ratio,
      CASE WHEN len(toks) > 0 THEN CAST($stop AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio
    FROM toktab""")
  }

  /** Non-negative residue mirroring Spark's pmod (DuckDB % keeps the
    * dividend's sign, so a bare % diverges on negative ids). */
  private def pmodP(e: String): String = s"((($e) % $P) + $P) % $P"

  val hashSample: String = {
    val (a, b) = Config.coeffs(0)
    s"""SELECT doc_id, lang, source, n_chars FROM documents
    WHERE (($a * ${pmodP("doc_id")} + $b) % $P) % 100 < $SamplePct"""
  }

  val stratifiedSample: String = {
    val (a, b) = Config.coeffs(1)
    s"""SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY ($a * ${pmodP("doc_id")} + $b) % $P, doc_id) AS BIGINT) AS rn
      FROM documents)
    WHERE rn <= $PerStratum"""
  }

  /** Domain-mixing resample: keep iff hash(doc_id) mod count_source
    * < quota (affine member 2) — P(keep) ~= quota/count. */
  val mixtureSample: String = {
    val (a, b) = Config.coeffs(2)
    s"""WITH mcnt AS (SELECT source, count(*)::BIGINT AS n_source
           FROM documents GROUP BY source)
    SELECT d.doc_id, d.source, m.n_source
    FROM documents d JOIN mcnt m ON d.source = m.source
    WHERE (($a * ${pmodP("d.doc_id")} + $b) % $P) % m.n_source < $MixQuota"""
  }

  /** Temperature (α = 0.5) mixing — mirrors
    * Sampling.temperatureSample: keep iff hash mod count <
    * scale·floor(sqrt(count)); IEEE sqrt is correctly rounded in
    * both engines so the threshold integer is identical. */
  val temperatureSample: String = {
    val (a, b) = Config.coeffs(3)
    val scale = graft.operators.Sampling.DefaultTempScale
    s"""WITH mcnt AS (SELECT source, count(*)::BIGINT AS n_source
           FROM documents GROUP BY source)
    SELECT d.doc_id, d.source, m.n_source
    FROM documents d JOIN mcnt m ON d.source = m.source
    WHERE (($a * ${pmodP("d.doc_id")} + $b) % $P) % m.n_source
      < $scale * CAST(floor(sqrt(m.n_source::DOUBLE)) AS BIGINT)"""
  }

  /** Deterministic train/val/test split — affine member 4, percent
    * ranges from Sampling.TrainPct/ValPct. */
  private def splitCase(idExpr: String): String = {
    import graft.operators.Sampling.{TrainPct, ValPct}
    val (a, b) = Config.coeffs(4)
    val bucket = s"(($a * ${pmodP(idExpr)} + $b) % $P) % 100"
    s"""CASE WHEN $bucket < $TrainPct THEN 'train'
         WHEN $bucket < ${TrainPct + ValPct} THEN 'val'
         ELSE 'test' END"""
  }

  val splitAssign: String = {
    val (a, b) = Config.coeffs(4)
    val bucket = s"(($a * ${pmodP("doc_id")} + $b) % $P) % 100"
    s"""SELECT doc_id, CAST($bucket AS BIGINT) AS bucket,
      ${splitCase("doc_id")} AS split
    FROM documents"""
  }

  /** Cross-split leakage: the verified near-dup pairs (simpairs)
    * whose members land in different splits. */
  val splitLeakage: String = docQ(
    s"""SELECT id_l, id_r,
      ${splitCase("id_l")} AS split_l,
      ${splitCase("id_r")} AS split_r, jaccard
    FROM simpairs
    WHERE ${splitCase("id_l")} <> ${splitCase("id_r")}""")

  /** Budget-selection CTE chain over a (doc_id, toks) source CTE —
    * ONE definition of the per-score bucket cumsum (budget 5000) for
    * budgetSelect and pipelineBudget. */
  private def budgetCumsum(srcCte: String): String =
    s""", bsc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(toks)) AS BIGINT) AS score FROM $srcCte),
    bkt AS (SELECT score, sum(n_tokens)::BIGINT AS bucket_tokens
            FROM bsc GROUP BY score),
    bcum AS (SELECT score, coalesce(sum(bucket_tokens) OVER (
               ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS bucket_before FROM bkt),
    brk AS (SELECT s.doc_id, s.score, s.n_tokens,
             b.bucket_before
               + sum(s.n_tokens) OVER (PARTITION BY s.score ORDER BY s.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - s.n_tokens AS tokens_before
            FROM bsc s JOIN bcum b ON s.score = b.score)
    SELECT doc_id, score, n_tokens, tokens_before::BIGINT AS tokens_before
    FROM brk WHERE tokens_before + n_tokens <= $BudgetTokens"""

  /** Token-budget selection: per-score bucket totals cumulated
    * best-first, docs ranked within their bucket, kept while the
    * span fits inside the budget. */
  val budgetSelect: String = docQ(budgetCumsum("toktab"))

  /** Equal-token shard assignment replay: the engine's two-phase
    * bucket cumsum equals ONE global running sum in hash order
    * (bucket = h div w is monotone in h), which is what DuckDB runs
    * here. Affine member 5, shard budget interpolated from the
    * shared constant. */
  val shardAssign: String = {
    val (a, b) = Config.coeffs(5)
    docQ(s""", shord AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        (($a * ${pmodP("doc_id")} + $b) % $P) AS h FROM toktab),
    shcum AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS tokens_before
      FROM shord)
    SELECT doc_id, n_tokens, tokens_before,
      (tokens_before // ${graft.operators.Sampling.DefaultShardTokens})::BIGINT AS shard
    FROM shcum""")
  }

  /** One-shard read replay: shard 0 = running token offset below one
    * budget in the global hash order (the shardAssign cumsum with a
    * WHERE on the shard quotient). */
  val shardRead: String = {
    val (a, b) = Config.coeffs(5)
    val budget = graft.operators.Sampling.DefaultShardTokens
    docQ(s""", shord AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        (($a * ${pmodP("doc_id")} + $b) % $P) AS h FROM toktab),
    shcum AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS tokens_before
      FROM shord)
    SELECT doc_id, n_tokens, tokens_before,
      (tokens_before // $budget)::BIGINT AS shard
    FROM shcum WHERE tokens_before // $budget = 0""")
  }

  /** DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all semantics. */
  val dedupNormalized: String =
    """SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
      min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
    FROM documents GROUP BY 1"""

  /** The quality-gate predicate over a toktab row — ONE definition
    * for qualityFilter and both pipeline composites. */
  private val qualityPred: String = {
    val stop = listIn("toks", Seq("the", "a", "of", "in", "and"))
    s"""len(toks) >= 5 AND length(text) >= 20 AND length(text) <= 10000
      AND $stop * 2 <= len(toks)
      AND len(list_distinct(toks)) * 10 >= len(toks) * 3"""
  }

  val qualityFilter: String = {
    val stop = listIn("toks", Seq("the", "a", "of", "in", "and"))
    docQ(s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
      $stop AS n_stopwords
    FROM toktab
    WHERE $qualityPred""")
  }

  /** The composed training pipeline: quality gate ∧ 10% hash sample
    * ∧ near-dup keep — each predicate replayed from its stage's
    * oracle form. */
  val pipelineKept: String = {
    val (a, b) = Config.coeffs(0)
    docQ(s"""SELECT q.doc_id, d.lang, q.n_chars, q.n_tokens
    FROM (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
            CAST(len(toks) AS BIGINT) AS n_tokens
          FROM toktab
          WHERE $qualityPred) q
    JOIN documents d ON q.doc_id = d.doc_id
    WHERE (($a * ${pmodP("q.doc_id")} + $b) % $P) % 100 < $SamplePct
      AND q.doc_id NOT IN (SELECT id_r FROM simpairs)""")
  }

  /** The corpus-release manifest: blocklist ∧ quality ∧ near-dup
    * keep, with the split stamped on every survivor — each predicate
    * replayed from its stage's oracle form. */
  val releasePipeline: String = {
    val listLit = graft.operators.TextAnalysis.BlockedTerms
      .map(t => s"'$t'").mkString("[", ", ", "]")
    docQ(s"""SELECT t.doc_id, d.lang, d.source,
      ${splitCase("t.doc_id")} AS split, t.n_tokens
    FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks
          FROM toktab WHERE $qualityPred) t
    JOIN documents d ON t.doc_id = d.doc_id
    WHERE len(list_intersect(t.toks, $listLit)) = 0
      AND t.doc_id NOT IN (SELECT id_r FROM simpairs)""")
  }

  /** Pipeline funnel — mirrors TrainingPipeline.funnel (cumulative
    * survivor counts through the release stages, integer basis-point
    * retention). Sums are CAST to BIGINT (DuckDB widens aggregate
    * sums to HUGEINT, which fails the physical-type hash). */
  val pipelineFunnel: String = {
    val listLit = graft.operators.TextAnalysis.BlockedTerms
      .map(t => s"'$t'").mkString("[", ", ", "]")
    val stages = graft.operators.TrainingPipeline.FunnelStages
    docQ(s""", flg AS (
      SELECT doc_id,
        CASE WHEN len(list_intersect(toks, $listLit)) = 0 THEN 1 ELSE 0 END AS b,
        CASE WHEN $qualityPred THEN 1 ELSE 0 END AS q,
        CASE WHEN doc_id NOT IN (SELECT id_r FROM simpairs) THEN 1 ELSE 0 END AS k
      FROM toktab),
    agg AS (
      SELECT count(*)::BIGINT AS c0, sum(b)::BIGINT AS c1,
        sum(b * q)::BIGINT AS c2, sum(b * q * k)::BIGINT AS c3
      FROM flg)
    SELECT stage, n_docs,
      CASE WHEN c0 > 0 THEN n_docs * 10000 // c0 ELSE NULL END AS pct_bp
    FROM (
      SELECT '${stages(0)}' AS stage, c0 AS n_docs, c0 FROM agg
      UNION ALL SELECT '${stages(1)}', c1, c0 FROM agg
      UNION ALL SELECT '${stages(2)}', c2, c0 FROM agg
      UNION ALL SELECT '${stages(3)}', c3, c0 FROM agg)""")
  }

  /** Quality-gate calibration — mirrors TextAnalysis
    * .qualityCalibration (fixed 100-permille type-token-ratio
    * buckets vs the real gate decision, all integer `//` division). */
  val qualityCalibration: String = docQ(
    s""", cal AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CASE WHEN len(toks) > 0
          THEN (CAST(len(list_distinct(toks)) AS BIGINT) * 1000) // CAST(len(toks) AS BIGINT)
          ELSE 0 END AS ttr_pm,
        CASE WHEN $qualityPred THEN 1 ELSE 0 END AS pass
      FROM toktab)
    SELECT ttr_pm // 100 AS bucket, count(*)::BIGINT AS n_docs,
      sum(pass)::BIGINT AS n_pass, sum(n_tokens)::BIGINT AS sum_tokens,
      min(ttr_pm) AS min_ttr_pm, max(ttr_pm) AS max_ttr_pm
    FROM cal GROUP BY 1""")

  /** Pipeline variant with token-BUDGET selection as the final
    * stage: dedup-survivors ∧ quality gate feed the same per-score
    * bucket cumsum as budgetSelect. */
  val pipelineBudget: String = docQ(
    s""", pool AS (SELECT doc_id, toks FROM toktab
      WHERE $qualityPred
        AND doc_id NOT IN (SELECT id_r FROM simpairs))
    ${budgetCumsum("pool")}""")

  val langId: String = {
    import graft.operators.TextAnalysis._
    val en = listIn("toks", EnMarkers)
    val es = listIn("toks", EsMarkers)
    val zh = listIn("toks", ZhMarkers)
    docQ(s"""SELECT doc_id, lang AS lang_actual,
      $en AS score_en, $es AS score_es, $zh AS score_zh,
      CASE WHEN $en >= $es AND $en >= $zh THEN 'en'
           WHEN $es >= $zh THEN 'es' ELSE 'zh' END AS lang_pred
    FROM toktab""")
  }

  /** Benchmark decontamination: corpus docs sharing >= 3 distinct
    * word 5-grams with a benchmark doc (doc_id % 97 == 0). */
  val contaminationPairs: String = docQ(
    s""", grams AS (
      SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
        THEN list_distinct(list_transform(generate_series(1, len(toks) - 4),
          i -> array_to_string(toks[i:i+4], ' ')))
        ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM toktab
    )
    SELECT c.doc_id, b.bench_id, count(*)::BIGINT AS n_shared
    FROM (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0) c
    JOIN (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id % 97 = 0) b USING (gram)
    GROUP BY 1, 2
    HAVING count(*) >= 3""")

  /** Repetition signals: longest same-token run via gaps-and-islands
    * (Spark computes it as a one-pass fold — same integers). */
  val repetitionStats: String = docQ(
    s""", pos AS (
      SELECT doc_id, toks[i] AS tok, i
      FROM toktab, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) t
    ),
    runs AS (
      SELECT doc_id, max(cnt) AS max_run FROM (
        SELECT doc_id, count(*) AS cnt FROM (
          SELECT doc_id, tok, i,
            i - row_number() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
          FROM pos)
        GROUP BY doc_id, tok, grp)
      GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
      COALESCE(r.max_run, 0)::BIGINT AS max_run,
      CAST(CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS BIGINT) AS n_bigrams,
      CAST(CASE WHEN len(toks) >= 2 THEN len(list_distinct(list_transform(
        generate_series(1, len(toks) - 1), i -> array_to_string(toks[i:i+1], ' '))))
        ELSE 0 END AS BIGINT) AS n_distinct_bigrams
    FROM toktab t LEFT JOIN runs r ON t.doc_id = r.doc_id""")

  /** Mirrors the Spark side's HASHED bigram sets: same fold hash per
    * bigram, distinct-ed, so |A∩B| / (|A|+|B|-|A∩B|) is bit-equal. */
  val wordNgramJaccard: String = docQ(
    s""", bgtab AS (SELECT doc_id, CASE WHEN len(toks) >= 2
            THEN list_distinct(list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1]))
            ELSE []::VARCHAR[] END AS bg FROM toktab),
bgrows AS (SELECT doc_id, unnest(bg) AS g FROM bgtab),
bghagg AS (SELECT doc_id, list_sort(list_distinct(list(${foldHash("g")}))) AS hs FROM bgrows GROUP BY doc_id),
bgset AS (SELECT t.doc_id, coalesce(b.hs, []::BIGINT[]) AS hs
          FROM toktab t LEFT JOIN bghagg b ON t.doc_id = b.doc_id)
SELECT c.id_l, c.id_r,
  CASE WHEN (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) > 0
       THEN len(list_intersect(x.hs, y.hs))::DOUBLE
            / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))
       ELSE 0.0 END AS word_jaccard
FROM cand c
JOIN bgset x ON c.id_l = x.doc_id
JOIN bgset y ON c.id_r = y.doc_id""")

  /** TF-IDF top terms — integer tf/df/N with one exact double
    * division, no log (libm would not be bit-portable). */
  val tfidfTopTerms: String = docQ(
    """, tftok AS (SELECT doc_id, unnest(toks) AS token FROM toktab),
tfq AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tftok GROUP BY doc_id, token),
dfq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM tftok GROUP BY token),
ndocs AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
tscored AS (
  SELECT doc_id, token, tf, df, (tf * n_docs)::DOUBLE / df AS score
  FROM tfq JOIN dfq USING (token) CROSS JOIN ndocs
)
SELECT doc_id, token, tf, df, score, CAST(rnk AS BIGINT) AS "rank"
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
      FROM tscored)
WHERE rnk <= 3""")

  /** The BM25 CTE chain (mirrors CorpusStats.bm25TopK's expression
    * tree exactly: rational idf, k1/b derived by the same integer
    * divisions, no libm, no cross-term float sum), ending in a
    * `branked` CTE — shared by bm25TopK and hybridRerank. */
  private val bm25Ctes: String = {
    import graft.operators.CorpusStats.{Bm25QueryTerms, Bm25K1Tenths, Bm25BHundredths}
    val k1 = s"($Bm25K1Tenths::DOUBLE / 10::DOUBLE)"
    val b = s"($Bm25BHundredths::DOUBLE / 100::DOUBLE)"
    val termVals = Bm25QueryTerms.map(t => s"('$t')").mkString(", ")
    s""", bterms(term) AS (SELECT * FROM (VALUES $termVals)),
btf AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, term,
    CAST(len(list_filter(toks, tk -> tk = term)) AS BIGINT) AS tf
  FROM toktab CROSS JOIN bterms
),
btfpos AS (SELECT * FROM btf WHERE tf > 0),
bdf AS (SELECT term, count(*)::BIGINT AS df FROM btfpos GROUP BY term),
bstat AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS sum_dl,
                 count(*)::BIGINT AS n_docs FROM toktab),
bscored AS (
  SELECT t.term, t.doc_id, t.tf, d.df,
    (((s.n_docs - d.df)::DOUBLE + 0.5::DOUBLE) / (d.df::DOUBLE + 0.5::DOUBLE)) *
    ((t.tf::DOUBLE * ($k1 + 1.0::DOUBLE)) /
     (t.tf::DOUBLE + $k1 * ((1.0::DOUBLE - $b) +
        $b * (t.dl::DOUBLE / (s.sum_dl::DOUBLE / s.n_docs::DOUBLE))))) AS score
  FROM btfpos t JOIN bdf d USING (term) CROSS JOIN bstat s
),
branked AS (
  SELECT *, row_number() OVER (PARTITION BY term
      ORDER BY score DESC, doc_id) AS rnk FROM bscored
)"""
  }

  val bm25TopK: String = {
    val topK = graft.operators.CorpusStats.Bm25TopK
    docQ(s"""$bm25Ctes
SELECT term, doc_id, tf, df, score, CAST(rnk AS BIGINT) AS "rank"
FROM branked
WHERE rnk <= $topK""")
  }

  /** Hybrid retrieval: BM25 retrieve-K per term, then rerank by
    * embedding cosine to the term's rank-1 doc vector (the sparse →
    * dense RAG shape). Cosine mirrors cosineTopK's formulation. */
  val hybridRerank: String = {
    import graft.operators.CorpusStats.{HybridRetrieveK, HybridTopK}
    docQ(s"""$bm25Ctes,
brk AS (SELECT term, doc_id, CAST(rnk AS BIGINT) AS bm25_rank
        FROM branked WHERE rnk <= $HybridRetrieveK),
bq AS (SELECT b.term, e.embedding AS q_emb
       FROM brk b JOIN embeddings e ON b.doc_id = e.vec_id
       WHERE b.bm25_rank = 1),
bcos AS (
  SELECT c.term, c.doc_id, c.bm25_rank,
    ${dotSql("q.q_emb", "e.embedding")} /
      (sqrt(${norm2Sql("q.q_emb")}) * sqrt(${norm2Sql("e.embedding")})) AS cosine
  FROM brk c JOIN embeddings e ON c.doc_id = e.vec_id
  JOIN bq q ON c.term = q.term
)
SELECT term, doc_id, bm25_rank, cosine, CAST(rr AS BIGINT) AS rerank
FROM (SELECT *, row_number() OVER (PARTITION BY term
        ORDER BY cosine DESC, doc_id) AS rr FROM bcos)
WHERE rr <= $HybridTopK""")
  }

  /** Global curriculum order — the oracle may use the naive
    * corpus-wide window (DuckDB is single-node); the engine's
    * two-phase bucket rank must equal it exactly. */
  val curriculumOrder: String = docQ(
    s""", cur AS (SELECT doc_id,
        CAST(len(list_distinct(toks)) AS BIGINT) AS score FROM toktab)
    SELECT doc_id, score,
      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS train_order
    FROM cur""")

  /** One-row corpus manifest (dataset-card numbers). */
  val corpusManifest: String = docQ(
    s"""SELECT count(*)::BIGINT AS n_docs,
      count(DISTINCT source)::BIGINT AS n_sources,
      count(DISTINCT lang)::BIGINT AS n_langs,
      CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
      CAST(sum(n_chars) AS BIGINT) AS total_chars,
      CAST(min(len(toks)) AS BIGINT) AS min_tokens,
      CAST(max(len(toks)) AS BIGINT) AS max_tokens
    FROM toktab""")

  /** Per-source corpus quality report — qualityPred replayed as a
    * conditional count, one exact double division for the mean. */
  val sourceQuality: String = docQ(
    s"""SELECT source, count(*)::BIGINT AS n_docs,
      CAST(sum(CASE WHEN $qualityPred THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
      (CAST(sum(len(toks)) AS BIGINT)::DOUBLE / count(*)::BIGINT::DOUBLE) AS mean_tokens
    FROM toktab GROUP BY source""")

  /** Token-blocklist gate: keep docs with no blocked token (toktab
    * doesn't carry `source`, so tokenize inline from documents). */
  val blocklistFilter: String = {
    val listLit = graft.operators.TextAnalysis.BlockedTerms
      .map(t => s"'$t'").mkString("[", ", ", "]")
    s"""SELECT doc_id, lang, source FROM documents
    WHERE len(list_intersect(
      list_filter(string_split(text, ' '), tk -> tk <> ''), $listLit)) = 0"""
  }

  /** Sequence-length histogram: integer-division buckets. */
  val lengthHistogram: String = {
    val w = graft.operators.CorpusStats.LengthBucketTokens
    docQ(s"""SELECT CAST(CAST(len(toks) AS BIGINT) // $w AS BIGINT) AS bucket,
      count(*)::BIGINT AS n_docs,
      CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
      CAST(min(len(toks)) AS BIGINT) AS min_tokens,
      CAST(max(len(toks)) AS BIGINT) AS max_tokens
    FROM toktab GROUP BY 1""")
  }

  val mediaMeta: String =
    s"""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      CAST(length(text) AS BIGINT) AS n_chars,
      ${foldHash("substr(text, 1, 16)")} AS header_hash
    FROM documents"""

  // ---------------- embeddings ----------------

  /** Ordered-fold dot product of two list expressions (both cast to
    * double per element, summed left-to-right — matches Spark). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len($a)), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, v) -> acc + v)"

  private def norm2Sql(a: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform($a, x -> x::DOUBLE * x::DOUBLE)), (acc, v) -> acc + v)"

  val embeddingNorms: String =
    s"""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      ${norm2Sql("embedding")} AS norm2
    FROM embeddings"""

  /** Symmetric int8 quantization — mirrors EmbeddingSim.quantizeInt8:
    * ordered max-abs fold, one exact double division for the scale,
    * floor(x*scale + 0.5) codes (no `round`, whose tie rule could
    * differ between engines). */
  val embedQuantize: String = {
    val maxAbs = "list_reduce(list_prepend(0.0::DOUBLE, " +
      "list_transform(embedding, x -> abs(x::DOUBLE))), (a, b) -> greatest(a, b))"
    s"""WITH qm AS (SELECT vec_id, embedding, $maxAbs AS max_abs FROM embeddings),
    qs AS (SELECT vec_id, embedding,
      CASE WHEN max_abs > 0.0::DOUBLE THEN 127.0::DOUBLE / max_abs
           ELSE 1.0::DOUBLE END AS q_scale FROM qm)
    SELECT vec_id, q_scale, CAST(t.i - 1 AS BIGINT) AS idx,
      CAST(floor(embedding[t.i]::DOUBLE * q_scale + 0.5::DOUBLE) AS BIGINT) AS code
    FROM qs, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t"""
  }

  val cosineTopK: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
        ${dotSql("q.q_emb", "e.embedding")} / (sqrt(${norm2Sql("q.q_emb")}) * sqrt(${norm2Sql("e.embedding")})) AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS "rank",
        cosine
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", cosine FROM ranked WHERE "rank" <= 5"""

  private def sgnSql(j: Int): String =
    s"(CASE WHEN ((i * 131 + ${j * 37}) % 97) % 2 = 0 THEN 1.0 ELSE -1.0 END)"

  private def planeDot(vec: String, j: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len($vec)), " +
      s"i -> $vec[i]::DOUBLE * ${sgnSql(j)})), (acc, v) -> acc + v)"

  val annBuckets: String = {
    val dots = (0 until 8).map(j => f"${planeDot("embedding", j)} AS dot_$j%02d").mkString(",\n      ")
    val bucket = (0 until 8).map(j => f"(CASE WHEN dot_$j%02d > 0 THEN ${1L << j}%d ELSE 0 END)").mkString(" + ")
    s"""SELECT vec_id, CAST($bucket AS BIGINT) AS bucket FROM (
      SELECT vec_id, $dots FROM embeddings)"""
  }

  val annTopK: String = {
    val dots = (0 until 8).map(j => f"${planeDot("embedding", j)} AS dot_$j%02d").mkString(",\n      ")
    val bucket = (0 until 8).map(j => f"(CASE WHEN dot_$j%02d > 0 THEN ${1L << j}%d ELSE 0 END)").mkString(" + ")
    s"""WITH wb AS (
      SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS bucket FROM (
        SELECT vec_id, embedding, $dots FROM embeddings)
    ),
    scored AS (
      SELECT l.vec_id AS query_id, r.vec_id AS neighbor_id,
        ${dotSql("l.embedding", "r.embedding")} / (sqrt(${norm2Sql("l.embedding")}) * sqrt(${norm2Sql("r.embedding")})) AS cosine
      FROM wb l JOIN wb r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS "rank",
        cosine
      FROM scored
    )
    SELECT query_id, neighbor_id, "rank", cosine FROM ranked WHERE "rank" <= 3"""
  }

  // ---------------- events ----------------

  val eventsFunnel: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    c AS (SELECT user_id, min(us) AS click_us FROM ev WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
      SELECT c.user_id, c.click_us,
        CASE WHEN EXISTS (SELECT 1 FROM ev p
               WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                 AND p.us > c.click_us AND p.us <= c.click_us + 3600000000)
             THEN 1 ELSE 0 END AS converted
      FROM c)
    SELECT (click_us // 1000000) // 86400 AS click_day,
      count(*)::BIGINT AS n_users, CAST(sum(converted) AS BIGINT) AS n_converted
    FROM conv GROUP BY 1"""

  val eventsRetention: String =
    """WITH days AS (
      SELECT DISTINCT user_id, (epoch_us(ts) // 1000000) // 86400 AS day FROM events
    ),
    active AS (SELECT day, count(*)::BIGINT AS n_active FROM days GROUP BY day),
    retained AS (
      SELECT a.day, count(*)::BIGINT AS n_retained
      FROM days a JOIN days b ON a.user_id = b.user_id AND b.day = a.day + 1
      GROUP BY a.day)
    SELECT a.day, a.n_active, coalesce(r.n_retained, 0)::BIGINT AS n_retained
    FROM active a LEFT JOIN retained r ON a.day = r.day"""

  val eventsWindowAgg: String =
    s"""SELECT event_type, window_start_sec, count(*)::BIGINT AS n_events,
      ${money(s"sum(${cents("value")})")} AS sum_value
    FROM (SELECT event_type, (epoch_us(ts) // 1000000) // 600 * 600 AS window_start_sec, value FROM events)
    GROUP BY event_type, window_start_sec"""

  /** Streaming windowCounts in complete mode = the batch GROUP BY;
    * Spark's window() is epoch-aligned floor to the window length. */
  val streamWindowCounts: String =
    s"""SELECT window_start_us, event_type, count(*)::BIGINT AS n_events,
      ${money(s"sum(${cents("value")})")} AS sum_value
    FROM (SELECT event_type, epoch_us(ts) // 600000000 * 600000000 AS window_start_us, value FROM events)
    GROUP BY window_start_us, event_type"""

  /** Streaming nearDupStream with an uncapped bucket = band-collision
    * candidates verified at EXACT hash-set Jaccard >= t (no sketch
    * prefilter — the stream verifies every collision directly). */
  val streamNearDup: String = {
    val jac = "len(list_intersect(x.hs, y.hs))::DOUBLE / len(list_distinct(list_concat(x.hs, y.hs)))"
    docQ(s"""SELECT c.id_l, c.id_r, $jac AS jaccard
    FROM cand c JOIN hset x ON c.id_l = x.doc_id JOIN hset y ON c.id_r = y.doc_id
    WHERE $jac >= $T""")
  }

  /** Streaming session_window sessions: merge at <= gap (an event at
    * exactly last+gap EXTENDS the session — verified empirically), so
    * a new session starts iff the micros gap strictly exceeds 30 min;
    * session end = last event + gap. */
  val streamSessionWindows: String =
    s"""WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, ${cents("value")} AS c FROM events
    ),
    f AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                     THEN 1::BIGINT ELSE 0::BIGINT END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      FROM f
    )
    SELECT user_id, min(us) AS session_start_us, max(us) + 1800000000 AS session_end_us,
      count(*)::BIGINT AS n_events, ${money("sum(c)")} AS sum_value
    FROM s GROUP BY user_id, sid"""

  /** Stream-static enrichment = plain left join to the customer dim. */
  val streamEnrich: String =
    """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment, c.c_nationkey
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"""

  /** Stream-stream interval join: one-sided 600 s window (clicks at
    * or before the purchase). */
  val streamRangeJoin: String =
    """SELECT t.user_id, t.target_id, m.match_id, t.target_us, m.match_us
    FROM (SELECT user_id, event_id AS target_id, epoch_us(ts) AS target_us
          FROM events WHERE event_type = 'purchase') t
    JOIN (SELECT user_id, event_id AS match_id, epoch_us(ts) AS match_us
          FROM events WHERE event_type = 'click') m
      ON t.user_id = m.user_id
     AND m.match_us >= t.target_us - 600 * 1000000
     AND m.match_us <= t.target_us"""

  /** Keep-first-per-text restriction shared by the two dedup-stream
    * oracles: the harness feeds only the min-doc_id representative of
    * each distinct text (corpus duplicates would race intra-batch in
    * dropDuplicatesWithinWatermark — see StreamingQueries.dedupFeed),
    * so the oracle applies the same rule. Identity where texts are
    * all distinct (sf0.01). */
  private val firstPerText =
    "doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)"

  /** Streaming exact dedup over the doc∪shifted-copy feed: every copy
    * is dropped (its original arrived in an earlier micro-batch), so
    * the kept set is exactly the fed originals. */
  val streamExactDedup: String =
    s"""SELECT doc_id, (3600 + doc_id) * 1000000 AS us, md5(text) AS text_md5
    FROM documents WHERE $firstPerText"""

  /** Streaming pipeline = exact dedup (drops only the copies) ∘
    * quality gate ∘ 10% hash sample — the batch gate + sample
    * predicates over the original documents. */
  val streamPipeline: String = {
    val (a, b) = Config.coeffs(0)
    val stop = listIn("toks", Seq("the", "a", "of", "in", "and"))
    docQ(s"""SELECT doc_id, (3600 + doc_id) * 1000000 AS us,
      CAST(length(text) AS BIGINT) AS n_chars, CAST(len(toks) AS BIGINT) AS n_tokens
    FROM toktab
    WHERE len(toks) >= 5 AND length(text) >= 20 AND length(text) <= 10000
      AND $stop * 2 <= len(toks)
      AND len(list_distinct(toks)) * 10 >= len(toks) * 3
      AND (($a * ${pmodP("doc_id")} + $b) % $P) % 100 < $SamplePct
      AND $firstPerText""")
  }

  /** Custom-state streaming sessionization: gap chaining in MICROS
    * (`diff > gap` starts a new session), bounds floored to seconds. */
  val streamSessionize: String =
    s"""WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, ${cents("value")} AS c FROM events
    ),
    f AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                     THEN 1::BIGINT ELSE 0::BIGINT END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      FROM f
    )
    SELECT user_id, min(us) // 1000000 AS start_sec, max(us) // 1000000 AS end_sec,
      count(*)::BIGINT AS n_events, ${money("sum(c)")} AS sum_value
    FROM s GROUP BY user_id, sid"""

  val eventsSessionize: String =
    s"""WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) // 1000000 AS sec, ${cents("value")} AS c FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
                     THEN 1::BIGINT ELSE 0::BIGINT END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*)::BIGINT AS n_events,
      min(sec) AS start_sec, max(sec) AS end_sec,
      max(sec) - min(sec) AS duration_sec,
      ${money("sum(c)")} AS sum_value
    FROM sessions GROUP BY user_id, session_idx"""

  /** cdc_merge replay (ChangeData.cdcMerge): same synthesized feed —
    * v1 upsert at %7, v2 upsert at %11, v3 delete at %13 over a
    * version-0 snapshot — merged latest-wins with a row_number
    * window (the declarative twin of Spark's max_by aggregate;
    * versions are distinct per key so both pick the same row). */
  val cdcMerge: String =
    """WITH feed AS (
      SELECT doc_id, lang, source, n_chars, text, 0::BIGINT AS version, 'I' AS op
      FROM documents
      UNION ALL
      SELECT doc_id, lang, source, n_chars + 7, text || ' [rev1]', 1, 'U'
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id, lang, source, n_chars + 7, text || ' [rev2]', 2, 'U'
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id, lang, source, n_chars, text, 3, 'D'
      FROM documents WHERE doc_id % 13 = 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn,
        max(version) OVER (PARTITION BY doc_id) AS latest_version,
        count(*) OVER (PARTITION BY doc_id) AS n_revs
      FROM feed
    )
    SELECT doc_id, latest_version, n_revs::BIGINT AS n_revs,
      lang, source, n_chars, text
    FROM ranked WHERE rn = 1 AND op <> 'D'"""

  /** scd2_history replay (ChangeData.scd2History): identical window
    * arithmetic — per user ordered by (us, event_id), consecutive
    * duplicate states collapsed, lead() closing each interval. */
  val scd2History: String =
    """WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
    ),
    changes AS (
      SELECT user_id, us, event_id, event_type
      FROM (SELECT *, lag(event_type) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS prev_state FROM e)
      WHERE prev_state IS NULL OR prev_state <> event_type
    )
    SELECT user_id, event_type AS state, us AS valid_from_us,
      event_id AS from_event,
      lead(us) OVER w AS valid_to_us,
      CASE WHEN lead(us) OVER w IS NULL THEN 1::BIGINT ELSE 0::BIGINT END AS is_current
    FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)"""

  val eventsAsOfJoin: String =
    """SELECT event_id, user_id, us AS target_us, prev_match_id, prev_match_us,
      us - prev_match_us AS gap_us
    FROM (
      SELECT event_id, user_id, event_type, us,
        last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER w AS prev_match_id,
        last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS) OVER w AS prev_match_us
      FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ) WHERE event_type = 'purchase'"""

  val eventsRangeJoin: String =
    """SELECT t.user_id, t.target_id, m.match_id, t.target_us, m.match_us,
      m.match_us - t.target_us AS delta_us
    FROM (SELECT user_id, event_id AS target_id, epoch_us(ts) AS target_us
          FROM events WHERE event_type = 'purchase') t
    JOIN (SELECT user_id, event_id AS match_id, epoch_us(ts) AS match_us
          FROM events WHERE event_type = 'click') m
      ON t.user_id = m.user_id
     AND abs(t.target_us - m.match_us) <= 600 * 1000000"""

  val eventsJsonDeciles: String =
    """SELECT k // 10 AS k_decile, count(*)::BIGINT AS n_events,
      count(DISTINCT event_type)::BIGINT AS n_types,
      min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type,
            CASE WHEN json_valid(props) AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                 THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
          FROM events)
    GROUP BY k // 10"""

  val eventsPropsAgg: String =
    """SELECT event_type, count(*)::BIGINT AS n_events,
      CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type, CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) AS k FROM events)
    GROUP BY event_type"""

  // ---------------- relational ----------------

  private val revC4 = s"${cents("l_extendedprice")} * (100 - ${cents("l_discount")})"

  val q1PricingSummary: String =
    s"""SELECT l_returnflag, l_linestatus,
      ${money("sum(qty_c)")} AS sum_qty,
      ${money("sum(base_c)")} AS sum_base_price,
      CAST(sum(disc_c4) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(sum(charge_c6) AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(sum(qty_c) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_qty,
      CAST(sum(base_c) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_price,
      CAST(sum(disc_pct) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_disc,
      count(*)::BIGINT AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
        ${cents("l_quantity")} AS qty_c,
        ${cents("l_extendedprice")} AS base_c,
        ${cents("l_extendedprice")} * (100 - ${cents("l_discount")}) AS disc_c4,
        ${cents("l_extendedprice")} * (100 - ${cents("l_discount")}) * (100 + ${cents("l_tax")}) AS charge_c6,
        ${cents("l_discount")} AS disc_pct
      FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '2000-01-01'
    ) GROUP BY l_returnflag, l_linestatus"""

  val q3ShippingPriority: String =
    s"""SELECT l_orderkey, CAST(sum($revC4) AS DOUBLE) / 10000.0 AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      AND CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  val q5RegionRevenue: String =
    s"""SELECT n_name, CAST(sum($revC4) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name"""

  val q4OrderPriority: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority"""

  val q22NoOrders: String =
    s"""SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
      ${money(s"sum(${cents("c_acctbal")})")} AS sum_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment"""

  val q6ForecastRevenue: String =
    s"""SELECT CAST(sum(${cents("l_extendedprice")} * ${cents("l_discount")}) AS DOUBLE) / 10000.0 AS revenue,
      count(*)::BIGINT AS n_items
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_quantity < 24
      AND ${cents("l_discount")} BETWEEN 5 AND 7"""

  val q10ReturnedRevenue: String =
    s"""SELECT c_custkey, c_name, c_mktsegment,
      CAST(sum($revC4) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  val q14PromoShare: String =
    s"""SELECT
      100.0 * CAST(promo_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS promo_share_pct,
      CAST(promo_c4 AS DOUBLE) / 10000.0 AS promo_revenue,
      CAST(total_c4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM (
      SELECT sum(CASE WHEN p_type = 'PROMO' THEN $revC4 ELSE 0 END) AS promo_c4,
        sum($revC4) AS total_c4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-10-01')"""

  val q17SmallQuantity: String =
    s"""SELECT ${money("sum(rev_c)")} AS small_qty_revenue, count(*)::BIGINT AS n_small
    FROM (
      SELECT ${cents("l.l_extendedprice")} AS rev_c
      FROM lineitem l
      JOIN (SELECT l_partkey AS pk, sum(${cents("l_quantity")}) AS sum_qty_c,
              count(*)::BIGINT AS n_li
            FROM lineitem GROUP BY l_partkey) p ON l.l_partkey = p.pk
      WHERE ${cents("l.l_quantity")} * 5 * n_li < sum_qty_c)"""

  val q18LargeOrders: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
      ${money("qty_c")} AS total_qty
    FROM (SELECT l_orderkey, sum(${cents("l_quantity")}) AS qty_c
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(${cents("l_quantity")}) > 25000)
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey"""

  val windowTopOrders: String =
    """SELECT o_custkey, o_orderkey, rnk, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      FROM orders) WHERE rnk <= 3"""

  val windowRunningTotal: String =
    s"""SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      CAST(CAST(sum(${cents("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE) / 100.0 AS running_total
    FROM orders"""

  val rollupSales: String =
    s"""SELECT coalesce(y, -1) AS y, coalesce(m, -1) AS m,
      count(*)::BIGINT AS n_orders, ${money("sum(c)")} AS total_sales
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
            ${cents("o_totalprice")} AS c FROM orders)
    GROUP BY ROLLUP(y, m)"""

  val cubeSales: String =
    s"""SELECT coalesce(y, -1) AS y, coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
      count(*)::BIGINT AS n_orders, ${money("sum(c)")} AS total_sales
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderstatus,
            ${cents("o_totalprice")} AS c FROM orders)
    GROUP BY CUBE(y, o_orderstatus)"""

  val medianByStatus: String =
    s"""SELECT o_orderstatus,
      CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS median_price
    FROM (
      SELECT o_orderstatus, c,
        row_number() OVER (PARTITION BY o_orderstatus ORDER BY c, o_orderkey) AS rn,
        count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      FROM (SELECT o_orderstatus, o_orderkey, ${cents("o_totalprice")} AS c FROM orders))
    WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
    GROUP BY o_orderstatus"""

  val editDistancePairs: String = {
    val lev = "levenshtein(tl.text, tr.text)"
    val mx = "greatest(length(tl.text), length(tr.text))"
    docQ(s"""SELECT p.id_l, p.id_r, CAST($lev AS BIGINT) AS edit_dist,
      CAST($mx AS BIGINT) AS max_len,
      CASE WHEN $mx > 0 THEN 1.0 - $lev::DOUBLE / $mx ELSE 1.0 END AS edit_sim
    FROM simpairs p
    JOIN documents tl ON p.id_l = tl.doc_id
    JOIN documents tr ON p.id_r = tr.doc_id""")
  }

  val regexTokenStats: String =
    """SELECT doc_id,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces,
      CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_distinct_pieces
    FROM documents"""

  val topKOrders: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  val setOps: String =
    """SELECT 'both' AS tag, nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS tag, nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)"""

  val scalarFuncs: String =
    """SELECT p_partkey,
      upper(p_brand) AS brand_upper, lower(p_type) AS type_lower,
      substr(p_name, 1, 5) AS name_prefix,
      p_brand || '#' || p_type AS brand_type,
      CAST(length(p_name) AS BIGINT) AS name_len,
      p_size % 7 AS size_mod7,
      abs(p_size - 25) AS size_dev,
      sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
      CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
    FROM part"""

  /** Plain join+agg — the salted join must produce identical results. */
  val saltedJoinSales: String =
    s"""SELECT o_orderstatus, count(*)::BIGINT AS n_items,
      ${money(s"sum(${cents("l_extendedprice")})")} AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus"""

  /** One oracle for BOTH skew-fixture variants (salted and unsalted
    * are result-identical by construction). */
  val skewJoin: String =
    s"""WITH li AS (
      SELECT CASE WHEN l_orderkey % 100 < 99 THEN 0 ELSE l_orderkey % 1000 END AS hk,
        ${cents("l_extendedprice")} AS price_c
      FROM lineitem
    ),
    dim AS (
      SELECT h.hk, r.rep FROM generate_series(0, 999) h(hk), generate_series(0, 127) r(rep)
    )
    SELECT (li.hk + rep) % 7 AS grp, count(*)::BIGINT AS n_rows,
      ${money("sum(price_c * (rep + 1))")} AS total
    FROM li JOIN dim ON li.hk = dim.hk
    GROUP BY 1"""

  val windowLagLead: String =
    s"""SELECT o_custkey, o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      ${money("c")} AS price,
      ${money("lag(c, 1) OVER w")} AS prev_price,
      strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d') AS next_orderdate,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS BIGINT) AS year_rank
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, ${cents("o_totalprice")} AS c FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  val stringFuncs: String =
    """SELECT p_partkey,
      lpad(p_brand, 12, '*') AS brand_lpad,
      rpad(p_brand, 12, '-') AS brand_rpad,
      regexp_replace(p_type, 'O', '0', 'g') AS type_zeroed,
      CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
      repeat(p_brand, 2) AS brand_twice,
      reverse(p_name) AS name_rev,
      substr(p_name, 1, 3) AS name_left3,
      split_part(p_brand, '#', 2) AS brand_num,
      translate(p_type, 'AEO', 'aeo') AS type_translated,
      CAST(contains(p_name, 'or') AS INTEGER) AS has_or,
      CAST(starts_with(p_type, 'S') AS INTEGER) AS starts_s,
      CAST(ends_with(p_name, 'e') AS INTEGER) AS ends_e
    FROM part"""

  val dateFuncs: String =
    """SELECT o_orderkey,
      CAST(year(o_orderdate) AS BIGINT) AS y,
      CAST(month(o_orderdate) AS BIGINT) AS m,
      CAST(day(o_orderdate) AS BIGINT) AS dom,
      CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      CAST(quarter(o_orderdate) AS BIGINT) AS q,
      CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_1999,
      strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
      strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
      strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders"""

  val pivotSales: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      ${money(s"coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN ${cents("o_totalprice")} END), 0)")} AS sales_f,
      ${money(s"coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN ${cents("o_totalprice")} END), 0)")} AS sales_o,
      ${money(s"coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN ${cents("o_totalprice")} END), 0)")} AS sales_p
    FROM orders GROUP BY 1"""

  val groupingSetsSales: String =
    s"""SELECT coalesce(y, -1) AS y, coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
      count(*)::BIGINT AS n_orders, ${money("sum(c)")} AS total_sales
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus,
            ${cents("o_totalprice")} AS c FROM orders)
    GROUP BY GROUPING SETS ((y), (o_orderstatus), ())"""

  val q7VolumeShipping: String =
    s"""SELECT supp_nation, cust_nation, l_year,
      CAST(sum(rev_c4) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS BIGINT) AS l_year, $revC4 AS rev_c4
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
    GROUP BY supp_nation, cust_nation, l_year"""

  val q8MarketShare: String =
    s"""SELECT o_year,
      CAST(nation_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS mkt_share,
      CAST(total_c4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        sum(CASE WHEN n1.n_name = 'NATION_3' THEN $revC4 ELSE 0 END) AS nation_c4,
        sum($revC4) AS total_c4
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      GROUP BY 1)"""

  val q9ProfitByNation: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(sum($revC4 - ${cents("l_quantity")} * ${cents("p_retailprice")}) AS DOUBLE) / 10000.0 AS margin,
      count(*)::BIGINT AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2"""

  val q13OrderDistribution: String =
    """SELECT c_count, count(*)::BIGINT AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      FROM customer
      LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                       WHERE o_orderpriority <> '1-URGENT') o
        ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count"""

  val q15TopSupplier: String =
    s"""WITH rev AS (
      SELECT l_suppkey, sum($revC4) AS rev_c4
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT l_suppkey AS s_suppkey, s_name,
      CAST(rev_c4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM rev
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_c4 = (SELECT max(rev_c4) FROM rev)"""

  val q16SupplierCounts: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size"""

  val q19Disjunctive: String =
    s"""SELECT CAST(sum($revC4) AS DOUBLE) / 10000.0 AS revenue,
      count(*)::BIGINT AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""

  val q21SoleReturns: String =
    """SELECT s_suppkey, s_name, numwait
    FROM (
      SELECT l_suppkey, count(*)::BIGINT AS numwait
      FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_returnflag = 'R') l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY l_suppkey)
    JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 20"""

  val q2MinCostSupplier: String =
    s"""SELECT p_partkey, p_name, s_suppkey, s_name, nation,
      CAST(min_price_c AS DOUBLE) / 100.0 AS min_price
    FROM (
      SELECT p_partkey, p_name, s_suppkey, s_name, nation, min_price_c,
        min(min_price_c) OVER (PARTITION BY p_partkey) AS part_min_c
      FROM (
        SELECT p_partkey, p_name, s_suppkey, s_name, n_name AS nation,
          min(${cents("l_extendedprice")}) AS min_price_c
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
          AND p_name LIKE '%gear%' AND p_size IN (5, 15, 25, 35, 45)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY 1, 2, 3, 4, 5))
    WHERE min_price_c = part_min_c"""

  val q11ImportantSuppliers: String =
    s"""WITH rev AS (
      SELECT l_suppkey, sum($revC4) AS rev_c4 FROM lineitem GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rev_c4 AS DOUBLE) / 10000.0 AS revenue
    FROM rev
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_c4 > (SELECT sum(rev_c4) FROM rev) // 1000"""

  val q20DominantSuppliers: String =
    s"""SELECT DISTINCT s_suppkey, s_name
    FROM (
      SELECT l_partkey, l_suppkey, qty_c,
        sum(qty_c) OVER (PARTITION BY l_partkey) AS total_c,
        count(*) OVER (PARTITION BY l_partkey) AS n_supp
      FROM (
        SELECT l_partkey, l_suppkey, sum(${cents("l_quantity")}) AS qty_c
        FROM lineitem GROUP BY 1, 2))
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE qty_c * n_supp > total_c * 2"""

  val q12LateShipping: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
      sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
    GROUP BY 1"""

  val statsMoments: String =
    s"""SELECT l_returnflag, n,
      CAST(sq AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS mean_qty,
      (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0 AS var_qty,
      sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0) AS std_qty,
      (CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS corr_qty_disc
    FROM (
      SELECT l_returnflag, count(*)::BIGINT AS n,
        sum(${cents("l_quantity")}) AS sq,
        sum(${cents("l_quantity")} * ${cents("l_quantity")}) AS sqq,
        sum(${cents("l_discount")}) AS sd,
        sum(${cents("l_discount")} * ${cents("l_discount")}) AS sdd,
        sum(${cents("l_quantity")} * ${cents("l_discount")}) AS sqd
      FROM lineitem
      GROUP BY l_returnflag)"""

  val distinctCounts: String =
    """SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
      count(DISTINCT o_custkey)::BIGINT AS n_customers,
      count(DISTINCT year(o_orderdate))::BIGINT AS n_years,
      min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus"""

  /** CCNet-style boilerplate strip — mirrors
    * CorpusStats.boilerplateStrip: non-overlapping 16-token chunks,
    * a chunk text in >= BoilerplateMinDocs DISTINCT docs is dropped
    * from every doc, docs reassembled in chunk order. */
  val boilerplateStrip: String = {
    val minDocs = graft.operators.CorpusStats.BoilerplateMinDocs
    docQ(
      s""", chunks AS (${chunkSelectFor(16, 0)}),
      fr AS (SELECT chunk_text, count(DISTINCT doc_id) AS nd
             FROM chunks GROUP BY chunk_text),
      fl AS (SELECT c.doc_id, c.chunk_idx, c.chunk_text, fr.nd < $minDocs AS kept
             FROM chunks c JOIN fr USING (chunk_text))
      SELECT doc_id, count(*)::BIGINT AS n_chunks,
        CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_boilerplate,
        coalesce(string_agg(CASE WHEN kept THEN chunk_text END, ' '
          ORDER BY chunk_idx), '') AS cleaned_text
      FROM fl GROUP BY doc_id""")
  }

  /** Within-doc repeated-chunk removal — mirrors
    * CorpusStats.intraDedup (first occurrence of each distinct chunk
    * per doc survives; the engine's array_position formulation is
    * equivalent to this keep-rank-1 window). */
  val intraDedup: String = docQ(
    s""", chunks AS (${chunkSelectFor(16, 0)}),
    fl AS (SELECT doc_id, chunk_idx, chunk_text,
        row_number() OVER (PARTITION BY doc_id, chunk_text
          ORDER BY chunk_idx) = 1 AS kept
      FROM chunks)
    SELECT doc_id, count(*)::BIGINT AS n_chunks,
      CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
      coalesce(string_agg(CASE WHEN kept THEN chunk_text END, ' '
        ORDER BY chunk_idx), '') AS cleaned_text
    FROM fl GROUP BY doc_id""")

  /** Snapshot diff — mirrors CorpusStats.corpusDiff's derived
    * old/new snapshots and digest-based status classification. */
  val corpusDiff: String =
    """WITH oldv AS (SELECT doc_id, md5(text) AS old_md5
           FROM documents WHERE doc_id % 10 <> 3),
    newv AS (SELECT doc_id,
           md5(CASE WHEN doc_id % 7 = 2 THEN upper(text) ELSE text END) AS new_md5
           FROM documents WHERE doc_id % 10 <> 7),
    j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_md5, n.new_md5
          FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id)
    SELECT CASE WHEN old_md5 IS NULL THEN 'added'
                WHEN new_md5 IS NULL THEN 'removed'
                WHEN old_md5 <> new_md5 THEN 'changed'
                ELSE 'unchanged' END AS status,
      count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM j GROUP BY 1"""

  /** Lang-id confusion matrix — mirrors TextAnalysis.langIdConfusion
    * (the langId scoring grouped by actual × predicted). */
  val langIdConfusion: String = {
    import graft.operators.TextAnalysis._
    val en = listIn("toks", EnMarkers)
    val es = listIn("toks", EsMarkers)
    val zh = listIn("toks", ZhMarkers)
    docQ(s""", pred AS (SELECT doc_id, lang AS lang_actual,
      CASE WHEN $en >= $es AND $en >= $zh THEN 'en'
           WHEN $es >= $zh THEN 'es' ELSE 'zh' END AS lang_pred
    FROM toktab)
    SELECT lang_actual, lang_pred, count(*)::BIGINT AS n_docs,
      min(doc_id) AS example_doc
    FROM pred GROUP BY lang_actual, lang_pred""")
  }

  /** Per-label embedding outliers — mirrors EmbeddingSim.embedOutliers
    * (integer n²·distance² to the label centroid, top-k per label). */
  val embedOutliers: String = {
    val topK = graft.operators.EmbeddingSim.OutlierTopK
    val maxAbs = "list_reduce(list_prepend(0.0::DOUBLE, " +
      "list_transform(embedding, x -> abs(x::DOUBLE))), (a, b) -> greatest(a, b))"
    s"""WITH qm AS (SELECT label::BIGINT AS label, vec_id, embedding,
        $maxAbs AS max_abs FROM embeddings),
    qs AS (SELECT label, vec_id, embedding,
      CASE WHEN max_abs > 0.0::DOUBLE THEN 127.0::DOUBLE / max_abs
           ELSE 1.0::DOUBLE END AS q_scale FROM qm),
    codes AS (SELECT label, vec_id, CAST(t.i - 1 AS BIGINT) AS idx,
        CAST(floor(embedding[t.i]::DOUBLE * q_scale + 0.5::DOUBLE) AS BIGINT) AS code
      FROM qs, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
    cent AS (SELECT label, idx, sum(code)::BIGINT AS csum
             FROM codes GROUP BY label, idx),
    cnt AS (SELECT label, count(*)::BIGINT AS n FROM qm GROUP BY label),
    dev AS (SELECT c.label, c.vec_id,
        sum((t.n * c.code - ct.csum) * (t.n * c.code - ct.csum))::BIGINT AS dev2
      FROM codes c
      JOIN cent ct ON c.label = ct.label AND c.idx = ct.idx
      JOIN cnt t ON c.label = t.label
      GROUP BY c.label, c.vec_id),
    rk AS (SELECT label, vec_id, dev2,
        CAST(row_number() OVER (PARTITION BY label
          ORDER BY dev2 DESC, vec_id) AS BIGINT) AS "rank"
      FROM dev)
    SELECT label, vec_id, dev2, "rank" FROM rk WHERE "rank" <= $topK"""
  }

  /** Per-label int8-centroid cosine matrix — mirrors
    * EmbeddingSim.centroidSim (embedQuantize's quantization, integer
    * centroid sums/dots/norms, one mirrored double cosine). */
  val centroidSim: String = {
    val maxAbs = "list_reduce(list_prepend(0.0::DOUBLE, " +
      "list_transform(embedding, x -> abs(x::DOUBLE))), (a, b) -> greatest(a, b))"
    s"""WITH qm AS (SELECT label::BIGINT AS label, embedding, $maxAbs AS max_abs
        FROM embeddings),
    qs AS (SELECT label, embedding,
      CASE WHEN max_abs > 0.0::DOUBLE THEN 127.0::DOUBLE / max_abs
           ELSE 1.0::DOUBLE END AS q_scale FROM qm),
    codes AS (SELECT label, CAST(t.i - 1 AS BIGINT) AS idx,
        CAST(floor(embedding[t.i]::DOUBLE * q_scale + 0.5::DOUBLE) AS BIGINT) AS code
      FROM qs, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
    cent AS (SELECT label, idx, sum(code)::BIGINT AS csum
             FROM codes GROUP BY label, idx),
    norms AS (SELECT label, sum(csum * csum)::BIGINT AS n2 FROM cent GROUP BY label),
    dots AS (SELECT a.label AS label_l, b.label AS label_r,
               sum(a.csum * b.csum)::BIGINT AS dot
             FROM cent a JOIN cent b ON a.idx = b.idx AND a.label < b.label
             GROUP BY a.label, b.label)
    SELECT label_l, label_r, dot, x.n2 AS n2_l, y.n2 AS n2_r,
      dot::DOUBLE / (sqrt(x.n2::DOUBLE) * sqrt(y.n2::DOUBLE)) AS cosine
    FROM dots JOIN norms x ON label_l = x.label JOIN norms y ON label_r = y.label"""
  }

  /** Bucketed-layout join (graft.sources.Bucketed): the layout changes
    * WHERE bytes live, never the result — the oracle replays the same
    * fact-fact join + integer cents×bp aggregation from the flat
    * tables. Window/plain sums over BIGINT widen to HUGEINT in DuckDB,
    * so the output sum is cast back (the sequence_packing lesson). */
  val bucketedOrderRevenue: String =
    s"""SELECT o_orderkey, o_orderpriority,
      CAST(sum($revC4) AS BIGINT) AS revenue_c4
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderpriority"""

  /** CBO pair replay (CatalogStats): per-segment count + integer-
    * cents revenue of the high-value order tail joined to customer.
    * ONE oracle for both twins — catalog statistics drive the join
    * strategy (CatalogStatsSpec pins broadcast-vs-shuffle), never
    * the answer. Sum over BIGINT widens to HUGEINT in DuckDB, cast
    * back before the money division. */
  val cboJoin: String = {
    val floor = graft.operators.CatalogStats.PriceFloor
    s"""SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
      ${money(s"CAST(sum(${cents("o_totalprice")}) AS BIGINT)")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > $floor
    GROUP BY c_mktsegment"""
  }

  /** Bloom-pruned join replay: the bloom prefilter has no false
    * negatives and the join drops its false positives, so the result
    * IS the plain dim-filtered join (Relational.bloomPrunedJoin). */
  val bloomPrunedJoin: String =
    s"""SELECT p_brand, count(*)::BIGINT AS n_items,
      CAST(sum($revC4) AS BIGINT) AS revenue_c4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size = 1
    GROUP BY p_brand"""

  /** Partition-pruned per-language stats: pruning is a scan property,
    * so the oracle is the plain filtered aggregate. */
  val partitionPrunedStats: String =
    """SELECT lang, source, count(*)::BIGINT AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE lang IN ('en', 'de')
    GROUP BY lang, source"""

  /** The DSv2 line-format connector must reproduce the table exactly
    * (escape/unescape round trip) with its pushed bound applied. */
  val dsv2TextScan: String =
    "SELECT doc_id, text FROM documents WHERE doc_id >= 100"

  /** Schema-evolution replay: which era a row landed in (and so
    * whether its lang is null-filled) is exactly the batch split.
    * The ELSE coalesces too: the Spark side buckets by lang NULLNESS
    * after the merge, so an evolved-era row that genuinely has NULL
    * lang lands in 'pre_evolution' there — mirror that here or a
    * NULL-lang row in the table becomes a data-dependent mismatch. */
  val evolvedIngestStats: String =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN 'pre_evolution'
        ELSE coalesce(lang, 'pre_evolution') END AS lang_merged,
      count(*)::BIGINT AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1"""

  /** Dynamic partition pruning replay: the same dim join, statically —
    * pruning is an execution strategy, the result is this join. */
  /** Z-order / linear layout twins replay: clustering changes WHERE
    * bytes live, never WHAT the box query returns — same raw-table
    * SQL for both (ZOrder.boxFilter's integer bound arithmetic,
    * DuckDB `//` = integer division). */
  val zorderBoxStats: String =
    s"""WITH mx AS (SELECT max(user_id) AS mu, max(event_id) AS me FROM events)
    SELECT event_type, count(*)::BIGINT AS n_events,
      CAST(sum(${cents("value")}) AS BIGINT) AS sum_value_cents
    FROM events, mx
    WHERE user_id >= (mu + 1) * 20 // 100 AND user_id < (mu + 1) * 30 // 100
      AND event_id >= (me + 1) * 50 // 100 AND event_id < (me + 1) * 60 // 100
    GROUP BY event_type"""

  val dppFamilyStats: String =
    """SELECT dim.lang AS lang, family, count(*)::BIGINT AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    JOIN (VALUES ('de','latin'), ('en','latin'), ('es','latin'),
                 ('fr','latin'), ('zh','cjk')) AS dim(lang, family)
      ON documents.lang = dim.lang
    WHERE family = 'cjk'
    GROUP BY dim.lang, family"""

  /** Compaction layout twins replay: bin-packing the small-files
    * table changes file counts, never the per-language aggregate —
    * one raw-table SQL for both small_files_scan and compacted_scan
    * (the zorder/linear twin discipline). */
  val compactionScan: String =
    """SELECT lang, count(*)::BIGINT AS n_docs,
      CAST(sum(length(text)) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang"""

  /** Skew report replay: per-key counts, totals, rank by (count
    * desc, key), integer permille-of-mean hotness. The triple product
    * runs in HUGEINT — the twin of the engine's DECIMAL(38,0) widening
    * (in BIGINT a 1e9-row key over 1e8 keys overflows; DuckDB would
    * error where Spark wraps — r7 advice). */
  val skewReport: String = {
    val k = graft.operators.CorpusStats.SkewTopK
    s"""WITH kc AS (SELECT user_id, count(*)::BIGINT AS n_rows
         FROM events GROUP BY user_id),
    tot AS (SELECT sum(n_rows)::BIGINT AS total_rows,
         count(*)::BIGINT AS n_keys FROM kc),
    rk AS (SELECT user_id, n_rows,
         row_number() OVER (ORDER BY n_rows DESC, user_id ASC) AS rank
         FROM kc)
    SELECT rank::BIGINT AS rank, user_id, n_rows,
      (n_rows::HUGEINT * n_keys * 1000 // total_rows)::BIGINT AS permille_of_mean
    FROM rk, tot WHERE rank <= $k"""
  }

  /** ANALYZE replay: one UNION ALL branch per column, the same
    * row/null/exact-distinct/min/max stats; string columns carry
    * NULL min/max (no shared collation contract). Column lists
    * interpolated from the operator's own definition. */
  val tableStats: String = {
    val num = graft.operators.CorpusStats.StatsNumCols
    val str = graft.operators.CorpusStats.StatsStrCols
    val branches = (num ++ str).map { c =>
      val mm =
        if (num.contains(c)) s"min($c)::BIGINT AS min_long, max($c)::BIGINT AS max_long"
        else "NULL::BIGINT AS min_long, NULL::BIGINT AS max_long"
      s"""SELECT '$c' AS col_name, n_rows,
        (n_rows - count($c))::BIGINT AS n_nulls,
        count(DISTINCT $c)::BIGINT AS n_distinct, $mm
      FROM nr LEFT JOIN documents ON true GROUP BY n_rows"""
    }
    s"""WITH nr AS (SELECT count(*)::BIGINT AS n_rows FROM documents)
    ${branches.mkString("\n    UNION ALL\n    ")}"""
  }

  /** Copy-on-write MERGE replay (batch 1): the storage layer deletes
    * the [10%,13%) id band, re-languages [40%,42%) and inserts 100
    * docs above max id — range-localized so only key-intersecting
    * files rewrite; but the CONTENT is pure merge semantics, so
    * DuckDB replays it off the raw table with no knowledge of
    * snapshots or file layout (graft.sources.Merge.band's
    * sliceBounds-style integer arithmetic). */
  val mergeScan: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i)
      FROM mx, range(1, 101) t(i)
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids
    FROM m GROUP BY lang, source"""

  /** Batch 2 chained on batch 1 (delete the [70%,72%) band, re-source
    * [20%,22%)): two merges deep, carried file references and all —
    * same oracle discipline, replayed as two stacked CTE rewrites. */
  val mergeIncremental: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i)
      FROM mx, range(1, 101) t(i)
    ),
    m2 AS (
      SELECT m.doc_id, m.lang,
        CASE WHEN m.doc_id >= (mi+1)*20//100 AND m.doc_id < (mi+1)*22//100
             THEN 'rev2' ELSE m.source END AS source, m.n_chars
      FROM m, mx
      WHERE NOT (m.doc_id >= (mi+1)*70//100 AND m.doc_id < (mi+1)*72//100)
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids
    FROM m2 GROUP BY lang, source"""

  /** Catalog-pruned RANGE read replay: the two-batch merged table
    * filtered to the [5%, 45%) doc_id band — the engine opens only
    * interval-hit files, but the RESULT is a plain range predicate
    * over the merged state (mergeIncremental's CTE stack). */
  val mergeRangeRead: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i)
      FROM mx, range(1, 101) t(i)
    ),
    m2 AS (
      SELECT m.doc_id, m.lang,
        CASE WHEN m.doc_id >= (mi+1)*20//100 AND m.doc_id < (mi+1)*22//100
             THEN 'rev2' ELSE m.source END AS source, m.n_chars
      FROM m, mx
      WHERE NOT (m.doc_id >= (mi+1)*70//100 AND m.doc_id < (mi+1)*72//100)
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids
    FROM m2, mx
    WHERE doc_id >= (mi+1)*5//100 AND doc_id < (mi+1)*45//100
    GROUP BY lang, source"""

  /** Catalog-pruned POINT-LOOKUP replay: the same merged state
    * filtered to the doc_id ≡ 0 (mod 97) congruence class — the key
    * frame the engine probes is a superset of the class (it stops at
    * mi+199; inserts stop at mi+100), so the semi-join equals the
    * plain modulus predicate. */
  val mergePointRead: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i)
      FROM mx, range(1, 101) t(i)
    ),
    m2 AS (
      SELECT m.doc_id, m.lang,
        CASE WHEN m.doc_id >= (mi+1)*20//100 AND m.doc_id < (mi+1)*22//100
             THEN 'rev2' ELSE m.source END AS source, m.n_chars
      FROM m, mx
      WHERE NOT (m.doc_id >= (mi+1)*70//100 AND m.doc_id < (mi+1)*72//100)
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids
    FROM m2 WHERE doc_id % 97 = 0
    GROUP BY lang, source"""

  /** Schema-evolution replay: batch 2's upserts (the re-sourced
    * [20%,22%) band) carry a `rev = 2` column the table never had;
    * every other surviving row null-fills it. Identical CTE stack to
    * mergeIncremental plus the widened column — the storage layer's
    * carried-file null-fill must be indistinguishable from computing
    * the column on the raw table. */
  val mergeEvolve: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i)
      FROM mx, range(1, 101) t(i)
    ),
    m2 AS (
      SELECT m.doc_id, m.lang,
        CASE WHEN m.doc_id >= (mi+1)*20//100 AND m.doc_id < (mi+1)*22//100
             THEN 'rev2' ELSE m.source END AS source, m.n_chars,
        CASE WHEN m.doc_id >= (mi+1)*20//100 AND m.doc_id < (mi+1)*22//100
             THEN 2 ELSE NULL END AS rev
      FROM m, mx
      WHERE NOT (m.doc_id >= (mi+1)*70//100 AND m.doc_id < (mi+1)*72//100)
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids,
      sum(rev)::BIGINT AS sum_rev
    FROM m2 GROUP BY lang, source"""

  /** Merge-on-read replay: batch 1 plus a deletion-list delete of the
    * [55%,57%) band — the storage layer rewrites nothing and filters
    * at read; content is plain merge semantics. */
  val mergeMor: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i)
      FROM mx, range(1, 101) t(i)
    ),
    m3 AS (
      SELECT m.* FROM m, mx
      WHERE NOT (m.doc_id >= (mi+1)*55//100 AND m.doc_id < (mi+1)*57//100)
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids
    FROM m3 GROUP BY lang, source"""

  /** Shared band CTEs for the change-data-feed replays: the CDF
    * chain's four change bands plus the insert set, all off the raw
    * table with the registered queries' own integer band arithmetic
    * (graft.sources.Merge.band). */
  private val cdfBandCtes: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    b1013 AS (SELECT doc_id, lang, source, n_chars FROM documents, mx
              WHERE doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100),
    b4042 AS (SELECT doc_id, lang, source, n_chars FROM documents, mx
              WHERE doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100),
    b2022 AS (SELECT doc_id, lang, source, n_chars FROM documents, mx
              WHERE doc_id >= (mi+1)*20//100 AND doc_id < (mi+1)*22//100),
    b7072 AS (SELECT doc_id, lang, source, n_chars FROM documents, mx
              WHERE doc_id >= (mi+1)*70//100 AND doc_id < (mi+1)*72//100),
    ins AS (SELECT mi + i AS doc_id, 'new' AS lang, 'merge' AS source,
                   length('merged doc ' || i)::BIGINT AS n_chars
            FROM mx, range(1, 101) t(i))"""

  /** PER-COMMIT change-data-feed replay over the CDF chain
    * (base → batch1 UNLOGGED → batch2 logged → batch3 logged): each
    * commit's row-level diff rebuilt from the batch definitions —
    * commit 2 applies batch 1 to the base, commit 3 applies batch 2
    * to the post-batch-1 state, commit 4 applies batch 3 to the
    * post-batch-2 state (so its [40,42) delete preimages carry the
    * 'zz' intermediate lang and its [20,22) update hops rev2→rev3).
    * The engine serves v2 from the computed catalog-pruned diff and
    * v3/v4 from the write-time log; both paths must replay this. */
  val changeFeedScan: String =
    s"""$cdfBandCtes,
    f AS (
      SELECT 2 AS commit_version, 'delete' AS change_type,
             lang, source, n_chars, doc_id FROM b1013
      UNION ALL SELECT 2, 'update_preimage', lang, source, n_chars, doc_id FROM b4042
      UNION ALL SELECT 2, 'update_postimage', 'zz', source, n_chars, doc_id FROM b4042
      UNION ALL SELECT 2, 'insert', lang, source, n_chars, doc_id FROM ins
      UNION ALL SELECT 3, 'delete', lang, source, n_chars, doc_id FROM b7072
      UNION ALL SELECT 3, 'update_preimage', lang, source, n_chars, doc_id FROM b2022
      UNION ALL SELECT 3, 'update_postimage', lang, 'rev2', n_chars, doc_id FROM b2022
      UNION ALL SELECT 4, 'delete', 'zz', source, n_chars, doc_id FROM b4042
      UNION ALL SELECT 4, 'update_preimage', lang, 'rev2', n_chars, doc_id FROM b2022
      UNION ALL SELECT 4, 'update_postimage', lang, 'rev3', n_chars, doc_id FROM b2022
    )
    SELECT commit_version::BIGINT AS commit_version, change_type, lang, source,
      count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
      sum(doc_id)::BIGINT AS sum_ids
    FROM f GROUP BY 1, 2, 3, 4"""

  /** NET endpoint diff replay (changesBetween v1→v4): the 'zz'
    * intermediate of [40,42) cancels to a plain delete of the
    * ORIGINAL preimage, and [20,22)'s 'rev2' hop cancels to one
    * original→rev3 update pair — exactly where the net diff must
    * disagree with the per-commit feed. */
  val changesBetweenScan: String =
    s"""$cdfBandCtes,
    f AS (
      SELECT 'delete' AS change_type, lang, source, n_chars, doc_id FROM b1013
      UNION ALL SELECT 'delete', lang, source, n_chars, doc_id FROM b4042
      UNION ALL SELECT 'delete', lang, source, n_chars, doc_id FROM b7072
      UNION ALL SELECT 'update_preimage', lang, source, n_chars, doc_id FROM b2022
      UNION ALL SELECT 'update_postimage', lang, 'rev3', n_chars, doc_id FROM b2022
      UNION ALL SELECT 'insert', lang, source, n_chars, doc_id FROM ins
    )
    SELECT change_type, lang, source, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_ids
    FROM f GROUP BY 1, 2, 3"""

  /** Incremental composition-view replay: the maintained view must
    * equal the composition RECOMPUTED on the CDF chain's final state
    * (batch 1, then batch 2, then batch 3 stacked as CTE rewrites —
    * text rides through so token counts replay; updates never touch
    * text). Groups the feed drove to exactly zero (the [40,42) 'zz'
    * band, updated in then deleted) are absent here, which is the
    * drop-at-zero arithmetic the query pins. */
  val compositionView: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents),
    m AS (
      SELECT doc_id,
        CASE WHEN doc_id >= (mi+1)*40//100 AND doc_id < (mi+1)*42//100
             THEN 'zz' ELSE lang END AS lang,
        source, n_chars, text
      FROM documents, mx
      WHERE NOT (doc_id >= (mi+1)*10//100 AND doc_id < (mi+1)*13//100)
      UNION ALL
      SELECT mi + i, 'new', 'merge', length('merged doc ' || i),
             'merged doc ' || i
      FROM mx, range(1, 101) t(i)
    ),
    m2 AS (
      SELECT m.doc_id, m.lang,
        CASE WHEN m.doc_id >= (mi+1)*20//100 AND m.doc_id < (mi+1)*22//100
             THEN 'rev2' ELSE m.source END AS source, m.n_chars, m.text
      FROM m, mx
      WHERE NOT (m.doc_id >= (mi+1)*70//100 AND m.doc_id < (mi+1)*72//100)
    ),
    m3 AS (
      SELECT m2.doc_id, m2.lang,
        CASE WHEN m2.doc_id >= (mi+1)*20//100 AND m2.doc_id < (mi+1)*22//100
             THEN 'rev3' ELSE m2.source END AS source, m2.n_chars, m2.text
      FROM m2, mx
      WHERE NOT (m2.doc_id >= (mi+1)*40//100 AND m2.doc_id < (mi+1)*42//100)
    )
    SELECT source, lang, count(*)::BIGINT AS n_docs,
      sum(len(list_filter(string_split(text, ' '), tk -> tk <> '')))::BIGINT
        AS total_tokens,
      sum(n_chars)::BIGINT AS total_chars
    FROM m3 GROUP BY source, lang"""

  /** Continuous storage-merge replay: the streamed CDC feed
    * (ChangeData.versionedFeed — v1 %7 upsert, v2 %11 upsert, v3 %13
    * delete, highest version wins) applied through the copy-on-write
    * storage layer; the final table is pure merge semantics off the
    * raw documents, whatever files the batches touched. */
  val streamMerge: String =
    """SELECT doc_id, lang, source,
      (CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0
            THEN n_chars + 7 ELSE n_chars END)::BIGINT AS n_chars,
      CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
           WHEN doc_id % 7 = 0 THEN text || ' [rev1]' ELSE text END AS text
    FROM documents WHERE doc_id % 13 <> 0"""

  /** Skipping-index scan replay: the file-level min/max pruning is an
    * access-path optimization over the compacted layout; the result
    * is the plain [20%, 40%) doc_id slice of the raw table
    * (Compaction.sliceBounds' integer arithmetic). */
  val skippingScan: String =
    """WITH mx AS (SELECT max(doc_id) AS mi FROM documents)
    SELECT lang, count(*)::BIGINT AS n_docs,
      CAST(sum(length(text)) AS BIGINT) AS sum_chars
    FROM documents, mx
    WHERE doc_id >= (mi + 1) * 20 // 100 AND doc_id < (mi + 1) * 40 // 100
    GROUP BY lang"""
}

#!/usr/bin/env python3
"""Generate a REALISTIC-VOCABULARY scale corpus for the LSH family.

Companion to gen_scale.py, which extends the driver's sf0.1 corpus
with its own empirical structure — a 31-word vocabulary whose
background char-3-gram Jaccard is ~0.46, far above real text. On that
word-salad, ~11.5% of ALL n^2 pairs are band candidates at the
(b=10, r=6) operating point, so the uncapped candidate/verify family
measures output-quadratic (BENCH_SCALE.json, e=1.7-1.9) even though
the enumeration itself is output-linear.

DESIGN.md argues the blowup is a corpus artifact: with a realistic
vocabulary the background Jaccard collapses and the S-curve admits
essentially only the planted near-dup pairs, which grow LINEARLY in n.
This tool turns that argument into a measurement. It synthesizes a
corpus with the SAME shape as the driver's (same doc count scheme,
same empirical word-length distribution, same lang/source joint, same
~5% planted near-dups: id % 20 == 19 copies id-1 with 5% of word
positions resampled -> word-identity ~0.95, char-3-gram Jaccard ~0.9)
but over a V-word Zipf(1.07) vocabulary of random 3-10-letter words
(V defaults to 10,000). Two sizes of the same corpus, benched with
the gen_scale protocol, give per-query scaling exponents on text
whose pair structure matches a real corpus: planted dups + noise, not
everything-similar-to-everything.

All non-document tables are symlinked from the source sf dir;
embeddings too (the LSH family under test is document-domain).
Driver-side tooling only — never part of the Scala engine. Output
goes to /tmp; the read-only /root/testdata is never written.

Usage: gen_realistic.py /root/testdata/sf0.1 /tmp/graft_real5 5 [vocab]
  -> factor x 5000 docs over a `vocab`-word Zipfian vocabulary.
"""
import os
import string
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_vocab(size):
    """Deterministic vocabulary: `size` distinct random lowercase words
    of length 3-10, with Zipf(1.07) sampling probabilities."""
    rng = np.random.default_rng(611)
    letters = np.array(list(string.ascii_lowercase))
    words, seen = [], set()
    while len(words) < size:
        n = int(rng.integers(3, 11))
        w = "".join(rng.choice(letters, size=n))
        if w not in seen:
            seen.add(w)
            words.append(w)
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks ** 1.07
    return np.array(words), p / p.sum()


def gen_documents(con, src, out, factor, vocab_size):
    df = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' ORDER BY doc_id"
    ).df()
    n0 = len(df)
    # empirical word-length distribution and lang/source joint from the
    # source corpus — only the vocabulary is replaced
    lengths = np.array([len(t.split(" ")) for t in df.text.values])
    langsrc = df[["lang", "source"]].value_counts(normalize=True)
    ls_keys = list(langsrc.index)
    ls_p = langsrc.values
    vocab, freq = make_vocab(vocab_size)
    # million-doc scalability (r13): rng.choice with p= recomputes the
    # cumulative distribution per call (O(V) each — 10^10 ops at 1M
    # docs); precompute the CDFs once and sample via searchsorted, the
    # identical inverse-CDF draw in O(n log V)
    vocab_cdf = np.cumsum(freq)
    ls_cdf = np.cumsum(ls_p)
    # float cumsum can end an ulp below 1.0, and a draw landing in
    # [cdf[-1], 1.0) would searchsorted to len(vocab) — an IndexError
    # whose odds scale with draw count (~1e9 draws at 1M docs). Pinning
    # the last edge to exactly 1.0 changes no other draw's outcome.
    vocab_cdf[-1] = 1.0
    ls_cdf[-1] = 1.0

    ids, texts, langs, sources = [], [], [], []
    prev_words = None  # only doc did-1 is ever consulted — a dict of
    # every doc's word list is O(corpus) driver memory (tens of GB at 1M)
    for did in range(n0 * factor):
        rng = np.random.default_rng((did * 2654435761 + 42) % 2**32)
        if did % 20 == 19 and prev_words is not None:
            base = prev_words
            repl = rng.random(len(base))
            picks = np.searchsorted(vocab_cdf, rng.random(len(base)))
            ws = [w if repl[i] >= 0.05 else vocab[picks[i]]
                  for i, w in enumerate(base)]
        else:
            n = int(rng.choice(lengths))
            ws = list(vocab[np.searchsorted(vocab_cdf, rng.random(n))])
        prev_words = ws
        li, si = ls_keys[int(np.searchsorted(ls_cdf, rng.random()))]
        ids.append(did)
        texts.append(" ".join(ws))
        langs.append(li)
        sources.append(si)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: {len(ids)} over a {vocab_size}-word vocabulary")


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    vocab_size = int(sys.argv[4]) if len(sys.argv) > 4 else 10000
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con, src, out, factor, vocab_size)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    print(f"done: {out} (non-document tables symlinked from {src})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate a larger-sf documents+embeddings pair for SCALE BENCHING
(r6 verdict item 5): /root/testdata tops out at sf0.1, so extrapolated
100-TB claims need at least one measured point above it. This tool
extends the driver's sf0.1 tables by an integer factor with the SAME
empirical structure (measured from the originals, not assumed):

  documents: 31-word vocabulary word-salad, empirical word frequencies
    and length distribution, lang/source sampled from the empirical
    joint, ~5% planted near-duplicates (id % 20 == 19 copies id-1 with
    5% of word positions resampled -> char-3-gram Jaccard ~0.9, above
    the 0.8 verify threshold, below exact-dup).
  embeddings: unit-normalized 64-dim, weak label clusters (mean cosine
    to own-label centroid ~0.07, mirroring the measured originals) and
    ~4% planted near-identical vectors (id % 25 == 24 perturbs id-1).

The original rows are kept verbatim as a prefix (ids 0..N-1), so the
scaled corpus is a superset and per-doc statistics match by
construction. All other tables are symlinked from the source sf dir
(the scale subset is document/embedding-domain). Driver-side tooling
only -- never part of the Scala engine. Output goes to /tmp; the
read-only /root/testdata is never written.

Usage: python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf0.5 5
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen_documents(con, src, out, factor):
    df = con.sql(f"SELECT doc_id, text, lang, source, n_chars FROM '{src}/documents.parquet' ORDER BY doc_id").df()
    n0 = len(df)
    words_per_doc = [t.split(" ") for t in df.text.values]
    vocab, counts = np.unique(np.concatenate(words_per_doc), return_counts=True)
    freq = counts / counts.sum()
    lengths = np.array([len(w) for w in words_per_doc])
    langsrc = df[["lang", "source"]].value_counts(normalize=True)
    ls_keys = list(langsrc.index)
    ls_p = langsrc.values

    ids, texts, langs, sources = list(df.doc_id), list(df.text), list(df.lang), list(df.source)
    gen_words = {}
    for did in range(n0, n0 * factor):
        rng = np.random.default_rng((did * 2654435761 + 42) % 2**32)
        if did % 20 == 19 and (did - 1) in gen_words:
            base = gen_words[did - 1]
            mut = [w if rng.random() >= 0.05 else vocab[rng.choice(len(vocab), p=freq)]
                   for w in base]
            ws = mut
        else:
            n = int(rng.choice(lengths))
            ws = list(vocab[rng.choice(len(vocab), size=n, p=freq)])
        gen_words[did] = ws
        li, si = ls_keys[rng.choice(len(ls_keys), p=ls_p)]
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
    print(f"documents: {n0} -> {len(ids)}")


def gen_embeddings(con, src, out, factor):
    df = con.sql(f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' ORDER BY vec_id").df()
    n0 = len(df)
    E = np.vstack([np.asarray(e, dtype=np.float64) for e in df.embedding.values])
    dim = E.shape[1]
    labels = sorted(set(df.label.values))
    # one fixed unit direction per label, seeded: the weak-cluster axis
    dirs = {}
    for l in labels:
        r = np.random.default_rng(1000 + l)
        d = r.standard_normal(dim)
        dirs[l] = d / np.linalg.norm(d)
    vecs = [np.asarray(e, dtype=np.float32) for e in df.embedding.values]
    labs = list(df.label.values)
    ids = list(df.vec_id)
    for vid in range(n0, n0 * factor):
        rng = np.random.default_rng((vid * 40503 + 7) % 2**32)
        if vid % 25 == 24:
            base = np.asarray(vecs[vid - 1], dtype=np.float64)
            u = base + rng.standard_normal(dim) * 0.02
            lab = labs[vid - 1]
        else:
            lab = int(rng.integers(0, len(labels)))
            # a = 0.56 gives mean cosine ~0.07 to the label axis at dim 64
            u = rng.standard_normal(dim) + 0.56 * dirs[labels[lab]]
        v = (u / np.linalg.norm(u)).astype(np.float32)
        ids.append(vid)
        vecs.append(v)
        labs.append(lab)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([int(l) for l in labs], pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {n0} -> {len(ids)}")


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con, src, out, factor)
    gen_embeddings(con, src, out, factor)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    print(f"done: {out} (non-document tables symlinked from {src})")


if __name__ == "__main__":
    main()

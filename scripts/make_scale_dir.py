"""Synthesize a larger-SF testdata dir (default sf1.0 = 10x sf0.1).

The driver only ships sf{0.001,0.01,0.1}; the round-6 scale-step bench
(VERDICT r5 item 2) needs one 10x point to validate the O(n) claims where
they can actually bend.  This generates `documents` and `embeddings` at
FACTOR x the sf0.1 row counts, deterministically (seed 42), mirroring the
driver tables' observed structure so per-query time ratios are an honest
scale signal rather than a distribution-shift artifact:

  documents (5,000 -> 50,000 rows at factor 10):
    * text      — word soup over the EXACT sf0.1 vocabulary (read from the
                  parquet, 31 words), uniform 10..100 words/doc (observed
                  min/max), so shingle/minhash/simhash characteristics match
    * lang      — drawn with sf0.1's observed lang frequencies
    * source    — src{doc_id % 20} (observed: exactly uniform over 20)
    * n_chars   — len(text) (observed invariant)
    * exact-dup plant — sf0.1 has 8 copy-of-an-earlier-doc events per
                  5,000 docs (8 dup groups of size 2); the same copy-event
                  RATE is planted (rng draw < 8/5000 -> copy a previous
                  doc's text), so exact/near-dup cluster structure scales
                  linearly instead of quadratically
  embeddings (2,000 -> 20,000 rows at factor 10):
    * 10 labels with sf0.1's observed per-label means and per-dim stddevs
      (vectors = mean[label] + N(0, std[label])), so IVF/ANN cluster
      geometry is preserved at 10x occupancy

All other tables (region..lineitem, events) are copied from sf0.1 verbatim —
no headline query reads them, but the dir stays complete so any query runs.

Usage: python scripts/make_scale_dir.py [--out /tmp/eel_sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42
# sf0.1 has 8 duplicate-text groups of size 2 per 5,000 docs, i.e. 8 docs
# that are a COPY of an earlier doc — the copy-event rate this generator's
# "dup_draw < DUP_RATE -> copy a previous doc" mechanism models.  (16/5000
# would double the per-doc duplicate density: 16 is the count of docs
# INVOLVED in a dup group, not the count of copy events.)
DUP_RATE = 8 / 5000


def make_documents(out_dir: str, factor: int) -> int:
    src = pq.read_table(f"{SRC}/documents.parquet")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    vocab = sorted({w for t in texts[:500] for w in t.split()})
    lang_vals, lang_counts = np.unique(np.array(langs), return_counts=True)
    lang_p = lang_counts / lang_counts.sum()

    n = len(texts) * factor
    rng = np.random.default_rng(SEED)
    n_words = rng.integers(10, 101, size=n)
    lang_pick = rng.choice(lang_vals, size=n, p=lang_p)
    dup_draw = rng.random(size=n)

    out_texts: list[str] = []
    for i in range(n):
        if i > 0 and dup_draw[i] < DUP_RATE:
            out_texts.append(out_texts[int(rng.integers(0, i))])
        else:
            out_texts.append(" ".join(
                rng.choice(vocab, size=int(n_words[i]))))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(out_texts, type=pa.string()),
        "lang": pa.array(lang_pick.tolist(), type=pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)],
                           type=pa.string()),
        "n_chars": pa.array([len(t) for t in out_texts], type=pa.int64()),
    })
    pq.write_table(tbl, f"{out_dir}/documents.parquet")
    return n


def make_embeddings(out_dir: str, factor: int) -> int:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(src.column("label").to_pylist())
    uniq = np.unique(labels)
    means = {int(l): emb[labels == l].mean(axis=0) for l in uniq}
    stds = {int(l): emb[labels == l].std(axis=0) for l in uniq}

    n = len(labels) * factor
    rng = np.random.default_rng(SEED + 1)
    new_labels = rng.choice(uniq, size=n)
    vecs = np.stack([
        means[int(l)] + rng.standard_normal(emb.shape[1]) * stds[int(l)]
        for l in new_labels]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array(new_labels.astype(np.int32)),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/eel_sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    nd = make_documents(args.out, args.factor)
    ne = make_embeddings(args.out, args.factor)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{args.out}/{t}.parquet")
    print(f"wrote {args.out}: documents={nd} embeddings={ne} "
          f"(factor {args.factor} over {SRC})")


if __name__ == "__main__":
    main()

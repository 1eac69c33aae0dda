"""Distribution-faithfulness guards for the scale-corpus generator.

scripts/make_scale_dir.py synthesizes the sf1.0 corpus behind the 10x
scale-step bench (SCALE_STEP.json).  Its whole value is that per-query
time ratios are a SCALE signal, not a distribution-shift artifact — which
means every generated distribution must be pinned against what sf0.1
actually contains, not against what the generator's constants claim.
Round 6 shipped (and self-caught) exactly that bug class: the exact-dup
plant used 16/5000 (docs involved in a dup group) where sf0.1's observed
copy-event rate is 8/5000, doubling duplicate density and inflating every
dedup-stage ratio.  These tests regenerate a small corpus (pure
numpy/pyarrow, no Spark) and compare each distribution to the REAL sf0.1
parquet, so a faithfulness regression fails in CI instead of in a 35-min
bench run.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import make_scale_dir  # noqa: E402

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="driver testdata not present")

# factor 4 = 20,000 docs: big enough that the planted copy-event count
# (expected 32, sd ~5.7) cleanly separates the correct 8/5000 rate from
# the round-6 bug's 16/5000 (deterministic ~64 at seed 42), small enough
# to generate in ~2 s.
FACTOR = 4


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale_dir"))
    make_scale_dir.make_documents(out, FACTOR)
    make_scale_dir.make_embeddings(out, FACTOR)
    return out


def test_dup_density_matches_sf01_observed(gen_dir):
    """Copy-event density is measured the same way on BOTH corpora
    (rows minus distinct texts) and compared — the generator's DUP_RATE
    constant never appears here, so a wrong constant cannot self-certify."""
    src = pq.read_table(f"{SF01}/documents.parquet", columns=["text"])
    src_events = src.num_rows - len(set(src.column("text").to_pylist()))
    gen = pq.read_table(f"{gen_dir}/documents.parquet", columns=["text"])
    gen_events = gen.num_rows - len(set(gen.column("text").to_pylist()))
    expected = src_events / src.num_rows * gen.num_rows
    # 4-sigma Poisson band: [9, 55] at expected 32; the 2x-rate bug lands
    # near 64 and fails, an accidental 0-rate lands at 0 and fails too
    tol = 4 * np.sqrt(expected)
    assert abs(gen_events - expected) <= tol, (
        f"generated {gen_events} copy-events, sf0.1-faithful expectation "
        f"{expected:.1f} +/- {tol:.1f}")


def test_document_fields_match_sf01_structure(gen_dir):
    src = pq.read_table(f"{SF01}/documents.parquet")
    gen = pq.read_table(f"{gen_dir}/documents.parquet")
    assert gen.num_rows == src.num_rows * FACTOR
    assert gen.schema.names == src.schema.names

    texts = gen.column("text").to_pylist()
    # vocabulary closure: shingle/minhash/simhash collision behavior
    # depends on the word universe, so no invented words allowed
    src_vocab = {w for t in src.column("text").to_pylist() for w in t.split()}
    gen_vocab = {w for t in texts for w in t.split()}
    assert gen_vocab <= src_vocab

    # words/doc inside sf0.1's observed [10, 100] envelope
    lens = [len(t.split()) for t in texts]
    assert min(lens) >= 10 and max(lens) <= 100

    # n_chars invariant and source uniform over 20, as observed at sf0.1
    n_chars = gen.column("n_chars").to_pylist()
    assert all(c == len(t) for c, t in zip(n_chars[:1000], texts[:1000]))
    sources = gen.column("source").to_pylist()
    vals, counts = np.unique(np.array(sources), return_counts=True)
    assert len(vals) == 20 and counts.min() == counts.max()

    # lang frequencies within 2% absolute of sf0.1's observed frequencies
    def freq(tbl):
        langs = np.array(tbl.column("lang").to_pylist())
        v, c = np.unique(langs, return_counts=True)
        return dict(zip(v.tolist(), (c / c.sum()).tolist()))
    sf, gf = freq(src), freq(gen)
    assert set(gf) <= set(sf)
    assert all(abs(gf.get(k, 0.0) - p) < 0.02 for k, p in sf.items())


def test_embedding_cluster_geometry_matches_sf01(gen_dir):
    """IVF/ANN ratios are only a scale signal if the label clusters sit
    where sf0.1's do: per-label means must be close relative to the
    label's own dispersion."""
    src = pq.read_table(f"{SF01}/embeddings.parquet")
    gen = pq.read_table(f"{gen_dir}/embeddings.parquet")
    assert gen.num_rows == src.num_rows * FACTOR

    s_emb = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    s_lab = np.array(src.column("label").to_pylist())
    g_emb = np.array(gen.column("embedding").to_pylist(), dtype=np.float32)
    g_lab = np.array(gen.column("label").to_pylist())
    assert set(np.unique(g_lab)) == set(np.unique(s_lab))
    for lab in np.unique(s_lab):
        mu_s = s_emb[s_lab == lab].mean(axis=0)
        sd_s = s_emb[s_lab == lab].std(axis=0).mean()
        mu_g = g_emb[g_lab == lab].mean(axis=0)
        # mean-of-N sampling error ~ sd/sqrt(N); allow a wide 6x margin —
        # this guards against swapped/shifted clusters, not sampling noise
        n_g = int((g_lab == lab).sum())
        assert np.linalg.norm(mu_g - mu_s) < 6 * sd_s / np.sqrt(n_g) * \
            np.sqrt(s_emb.shape[1]), f"label {lab} cluster drifted"

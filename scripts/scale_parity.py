"""Value-check the 10x scale point: driver-style Spark-vs-DuckDB parity at
the synthesized sf1.0 dir (scripts/make_scale_dir.py).

SCALE_STEP.json proves the headline queries stay O(n) at 10x data; this
proves they stay CORRECT there — same comparator as the driver gate
(tests/parity.py), run over the scale-relevant heavy queries plus the core
KG chain.  Queries with corpus-size-derived dials are pinned by their
registry definitions, so the oracle contract is scale-independent by
construction; this run is the evidence.

Usage: python scripts/scale_parity.py [--sf1-dir /tmp/eel_sf1.0]
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

# scale-relevant heavy queries + the core extract->link->triples chain +
# ANN/IVF (embedding-side) + corpus stats
NAMES = [
    "q03_mentions", "q11_entities", "q12_triples",
    "q20_dedup_exact", "q21_fingerprint", "q22_minhash_sig",
    "q23_lsh_pairs", "q24_jaccard_pairs", "q25_language_id",
    "q27_token_counts", "q28_ann_topk", "q33_curate",
    "q42_simhash_near_dups", "q46_simhash",
    "q49_ivf_assign", "q50_ivf_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/eel_sf1.0")
    args = ap.parse_args()

    if not os.path.exists(f"{args.sf1_dir}/documents.parquet"):
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "scripts", "make_scale_dir.py"),
                        "--out", args.sf1_dir], check=True)

    from parity import run_parity
    from entity_extractor_linker_api_v2_spark.session import get_spark

    spark = get_spark(app_name="scale-parity", master="local[32]",
                      shuffle_partitions=32)
    t0 = time.perf_counter()
    probs = run_parity(spark, args.sf1_dir, names=NAMES)
    bad = {k: v for k, v in probs.items() if v}
    for k in NAMES:
        print(f"{k:28s} {'OK' if not probs.get(k) else probs[k]}")
    print(f"{len(NAMES) - len(bad)}/{len(NAMES)} queries value-match the "
          f"DuckDB oracle at 10x data ({time.perf_counter() - t0:.0f}s)")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""State-axis scale evidence for BOTH streaming folds (round 7).

STREAM_RATE.json measures the folds on the DOCS axis (10x the feed);
this measures the STATE axis: the same FIXED batch folded into a small
state and a ~10x state.  Per-batch fold cost must track the batch and its
affected/probed slice, not the accumulated state.

* canonicalize_fold — state = N five-member components (comp = member
  minimum, the production CC label) in comps/batch_id=0; fixed batch =
  40 edges pairing the first 80 components + 20 edges attaching brand-new
  nodes.  Round-7 change under test: ``affected_components_state`` prunes
  the RAW delta scan with semi-joins BEFORE the latest-wins aggregation —
  through round 6 the fold materialized the full latest-wins state every
  micro-batch (O(state) shuffle + checkpoint), which this measurement
  would have shown growing linearly.
* neardup_fold — history written directly in the fold's on-disk shape
  (simhash -> bit-bands -> bkey-partitioned write + commit marker; see
  build_neardup_history — equivalent state to folding batch 0, minus
  batch 0's self-pair join, which is quadratic in bucket size and not
  the thing under measurement); fixed batch = 500 fresh documents, 50 of
  them exact text twins of history documents (guaranteed pair
  emissions).  Measured with the default write-time bucket_cap=64
  (history bounded at <=1024 bkeys x cap rows -> expect FLAT) and
  bucket_cap=0 (exact mode, history grows with the corpus -> the honest
  claim is cost proportional to bucket MEMBERSHIP, which the 10x corpus
  makes ~10x).

Usage: python scripts/state_scale_check.py [--small 60000] [--factor 10]
       [--repeats 2]
Prints one JSON line per (fold, size) + a summary line (-> STATE_SCALE.json).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

MEMBERS = 5
VOCAB = [f"w{i:02d}" for i in range(64)]


def make_canon_state(spark, n_components: int, state_dir: str) -> int:
    """comps/batch_id=0 of n five-member components, comp = member min."""
    (spark.range(n_components * MEMBERS)
     .select(F.format_string("c%08dm%d", (F.col("id") / MEMBERS)
                             .cast("long"), F.col("id") % MEMBERS)
             .alias("node"),
             F.format_string("c%08dm0", (F.col("id") / MEMBERS)
                             .cast("long")).alias("comp"))
     .write.mode("overwrite").parquet(f"{state_dir}/comps/batch_id=0"))
    return n_components * MEMBERS


def canon_batch(spark):
    """Fixed batch: 40 pairing edges over the first 80 components + 20
    edges attaching new nodes — identical at every state size."""
    pair = [(f"c{2 * i:08d}m1", f"c{2 * i + 1:08d}m2") for i in range(40)]
    new = [(f"newnode{i:04d}", f"c{i:08d}m3") for i in range(20)]
    return spark.createDataFrame(pair + new, "a string, b string")


def synth_text(id_col):
    """Deterministic 30-word text from a 64-word vocabulary — enough
    entropy that simhash band keys spread over their full 1024-key space."""
    arr = F.array(*[F.lit(w) for w in VOCAB])
    return F.concat_ws(" ", *[
        F.element_at(arr, (F.pmod(F.xxhash64(id_col * F.lit(131 + 7 * i)),
                                  F.lit(64)) + 1).cast("int"))
        for i in range(30)])


def synth_docs(spark, n: int, id_offset: int = 0, text_seed_offset: int = 0):
    """(doc_id, text) where text derives from id - text_seed_offset, so a
    batch can carry exact text twins of history docs under fresh ids."""
    return (spark.range(id_offset, id_offset + n)
            .select(F.col("id").alias("doc_id"),
                    synth_text(F.col("id") - F.lit(text_seed_offset))
                    .alias("text")))


def fresh(*dirs):
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def build_neardup_history(spark, docs, state_dir: str, cap: int) -> None:
    """Write batch-0 history DIRECTLY in the fold's on-disk shape (banded
    rows, bkey-partitioned, commit marker) — byte-equivalent state to
    running neardup_fold(batch_id=0) but WITHOUT batch 0's self-pair join,
    which is quadratic in bucket size and irrelevant to the state axis
    being measured (only batch 1's fold is timed)."""
    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        _mark_committed)
    from pyspark.sql import Window

    nb = (dedup.simhash_bands(dedup.simhash(docs, "doc_id", "text"),
                              carry=("simhash",))
          .withColumn("bkey", F.concat_ws("_", "band_id", "band_key"))
          .select("doc_id", "simhash", "bkey"))
    if cap:
        w = Window.partitionBy("bkey").orderBy("doc_id")
        nb = (nb.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= cap).drop("_rn"))
    nb.write.partitionBy("bkey").mode("overwrite") \
        .parquet(f"{state_dir}/hist/batch_id=0")
    _mark_committed(spark, f"{state_dir}/commits", 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=60_000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from entity_extractor_linker_api_v2_spark.session import get_spark
    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        canonicalize_fold, neardup_fold)

    spark = get_spark(app_name="state-scale-check", master="local[32]",
                      shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="state_scale_")
    sizes = {"S": args.small, "10S": args.small * args.factor}
    out = {"small": args.small, "factor": args.factor, "folds": {}}

    # ---- canonicalize fold vs component-state size -----------------------
    canon = {}
    for tag, n_docs in sizes.items():
        n_comps = n_docs  # one component per "document-sized" unit
        sdir = f"{tmp}/canon_{tag}"
        rows = make_canon_state(spark, n_comps, sdir)
        edges = canon_batch(spark).localCheckpoint()
        walls = []
        for _ in range(args.repeats):
            fresh(f"{sdir}/comps/batch_id=1", f"{sdir}/commits/batch_id=1")
            t0 = time.perf_counter()
            canonicalize_fold(spark, edges, 1, sdir, compact_every=1000)
            walls.append(round(time.perf_counter() - t0, 3))
        delta_rows = spark.read.parquet(f"{sdir}/comps/batch_id=1").count()
        canon[tag] = {"state_rows": rows, "fold_sec": min(walls),
                      "fold_sec_all": walls, "delta_rows": delta_rows}
        print(json.dumps({"canonicalize": {tag: canon[tag]}}), flush=True)
    canon["ratio_10x"] = round(canon["10S"]["fold_sec"]
                               / canon["S"]["fold_sec"], 2)
    out["folds"]["canonicalize"] = canon

    # ---- neardup fold vs banded-history size -----------------------------
    for cap_tag, cap in (("cap64", 64), ("cap0_exact", 0)):
        nd = {}
        for tag, n_docs in sizes.items():
            sdir, pdir = f"{tmp}/nd_{cap_tag}_{tag}", f"{tmp}/ndp_{cap_tag}_{tag}"
            hist0 = synth_docs(spark, n_docs)
            t0 = time.perf_counter()
            build_neardup_history(spark, hist0, sdir, cap)
            build_sec = round(time.perf_counter() - t0, 3)
            hist_rows = spark.read.parquet(f"{sdir}/hist").count()
            bkeys = len(os.listdir(f"{sdir}/hist/batch_id=0"))
            # fixed probe batch: 450 fresh docs + 50 text twins of history
            batch = (synth_docs(spark, 450, id_offset=10_000_000)
                     .unionByName(synth_docs(spark, 50,
                                             id_offset=20_000_000,
                                             text_seed_offset=20_000_000))
                     .localCheckpoint())
            walls = []
            for _ in range(args.repeats):
                fresh(f"{sdir}/hist/batch_id=1", f"{pdir}/batch_id=1",
                      f"{sdir}/commits/batch_id=1")
                t0 = time.perf_counter()
                neardup_fold(spark, batch, 1, sdir, pdir, bucket_cap=cap,
                             compact_every=1000)
                walls.append(round(time.perf_counter() - t0, 3))
            pairs = spark.read.parquet(f"{pdir}/batch_id=1").count()
            nd[tag] = {"hist_docs": n_docs, "hist_rows": hist_rows,
                       "hist_bkey_partitions": bkeys,
                       "hist_build_sec": build_sec,
                       "fold_sec": min(walls), "fold_sec_all": walls,
                       "pairs_emitted": pairs}
            print(json.dumps({f"neardup_{cap_tag}": {tag: nd[tag]}}),
                  flush=True)
        nd["ratio_10x"] = round(nd["10S"]["fold_sec"] / nd["S"]["fold_sec"], 2)
        out["folds"][f"neardup_{cap_tag}"] = nd

    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

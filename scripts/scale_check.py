#!/usr/bin/env python
"""Empirical scale-linearity check for the dedup/curation chain.

Builds a 1x and a 4x corpus of DISTINCT documents (each replica k rewrites
the text with a vowel rotation, so replicas are neither exact nor near
duplicates of each other — cross-block LSH candidates stay ~zero and the
candidate count scales linearly with the corpus) and times
jaccard_pairs + curate_corpus on both.  A super-linear (toward quadratic)
chain would show a 4x corpus costing ~16x; the capped-LSH + semi-join
design should stay ~4x.  Run solo:  python scripts/scale_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def vowel_rot(col, k: int):
    src = "aeiou"
    dst = src[k % 5:] + src[:k % 5]
    return F.translate(col, src, dst)


def corpus(spark, sf_dir: str, copies: int):
    from entity_extractor_linker_api_v2_spark.plans.queries import _dedup_corpus
    base = _dedup_corpus(spark, sf_dir)
    parts = [base.select((F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                         vowel_rot(F.col("text"), k).alias("text"))
             for k in range(copies)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> float:
    """Times CONSTRUCTION + execution: jaccard/curate materialize their
    stage checkpoints eagerly at DataFrame-build time, so the build must be
    inside the timer."""
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-check", master="local[32]",
                      shuffle_partitions=32)
    # warm codegen/workers on the 1x corpus shape first
    timed(lambda: dedup.jaccard_pairs(corpus(spark, sf_dir, 1)))
    out = {}
    for copies in (1, 4):
        out[f"jaccard_{copies}x"] = timed(
            lambda: dedup.jaccard_pairs(corpus(spark, sf_dir, copies)))
        out[f"curate_{copies}x"] = timed(
            lambda: dedup.curate_corpus(corpus(spark, sf_dir, copies)))
    out["jaccard_ratio"] = round(out["jaccard_4x"] / out["jaccard_1x"], 2)
    out["curate_ratio"] = round(out["curate_4x"] / out["curate_1x"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump `.explain('formatted')` for every headline query into
plans/r08/<query>_<tag>.txt (round-8 optimization evidence).

Usage: python scripts/dump_r08_plans.py before|after [q03_mentions,...]
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = ["q03_mentions", "q11_entities", "q12_triples", "q59_nodes",
            "q14_types_distribution", "q60_top10_categories", "q16_top10_all",
            "q17_linked_stats", "q19_canonicalize", "q20_dedup_exact",
            "q24_jaccard_pairs", "q28_ann_topk", "q44_kb_build",
            "q46_simhash", "q50_ivf_topk", "q33_curate",
            "q42_simhash_near_dups"]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else HEADLINE
    from entity_extractor_linker_api_v2_spark.plans.queries import QUERIES
    from entity_extractor_linker_api_v2_spark.session import get_spark

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-r08-{tag}", master="local[4]",
                      shuffle_partitions=4)
    try:
        for name in names:
            df = QUERIES[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("wrote", name, tag)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

"""Round-8 optimization measurement harness (bench.py is FROZEN for the
driver; this file exists so optimization work can time queries with repeats
and isolation without touching the measured artifact).

Methodology mirrors bench.py's query loop exactly: one SparkSession on
local[$SPARK_GRAFT_CPUS], pilot warmup at sf0.001 (q11 + q24), then each
headline query noop-sunk in bench.py's order.  Extras:

  * --passes N     run the whole headline pass N times; the session-scoped
                   entity cache is EVICTED between passes so every pass
                   reproduces the driver's cold-cache q11 (and warm-cache
                   chain queries) exactly.  Reported: per-query min/median.
  * --queries a,b  restrict to a subset (isolation runs).
  * --all          also time every non-headline registered query once.

Prints one JSON line; detail to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = ["q03_mentions", "q11_entities", "q12_triples", "q59_nodes",
            "q14_types_distribution", "q60_top10_categories", "q16_top10_all",
            "q17_linked_stats", "q19_canonicalize", "q20_dedup_exact",
            "q24_jaccard_pairs", "q28_ann_topk", "q44_kb_build",
            "q46_simhash", "q50_ivf_topk", "q33_curate",
            "q42_simhash_near_dups"]


def _evict_entity_cache(spark) -> None:
    """Unpersist + drop the session's entity-cache entries so the next pass
    rebuilds them exactly like a fresh driver run."""
    from entity_extractor_linker_api_v2_spark.plans import queries as Q
    per = Q._ENTITY_CACHE.pop(spark, None)
    if per:
        for entry in per.values():
            Q._unpersist_entry(entry)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--queries", type=str, default=None)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from entity_extractor_linker_api_v2_spark.plans.queries import QUERIES
    from entity_extractor_linker_api_v2_spark.session import get_spark

    names = list(HEADLINE)
    if args.queries:
        names = [n for n in args.queries.split(",") if n]
    if args.all:
        names += [k for k in QUERIES if k not in names]

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    samples: dict[str, list[float]] = {n: [] for n in names}
    try:
        for warm in ("q11_entities", "q24_jaccard_pairs"):
            QUERIES[warm](spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        _evict_entity_cache(spark)

        def read_steal() -> int:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            return int(parts[8]) if len(parts) > 8 else 0

        steal: list[int] = []
        for p in range(args.passes):
            s0 = read_steal()
            for name in names:
                spark.sparkContext.setJobDescription(f"pass{p}:{name}")
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR) \
                    .write.format("noop").mode("overwrite").save()
                samples[name].append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            steal.append(read_steal() - s0)
            _evict_entity_cache(spark)
    finally:
        spark.stop()

    def med(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    result = {
        "sf_dir": SF_DIR, "passes": args.passes,
        "steal_ticks_per_pass": steal,
        "queries_med": {n: round(med(v), 3) for n, v in samples.items()},
        "queries_min": {n: min(v) for n, v in samples.items()},
        "value_med": round(sum(med(v) for v in samples.values()
                               if samples and v), 3),
        "value_min": round(sum(min(v) for v in samples.values() if v), 3),
        "samples": samples,
    }
    print(json.dumps(result, indent=1), file=sys.stderr)
    print(json.dumps({k: result[k] for k in
                      ("value_med", "value_min", "queries_med")}))


if __name__ == "__main__":
    main()

"""Skew evidence for the salted link path (SURVEY §5.5, round-5 item 5).

`linking.join_back(n_salt>0)` exists for the cluster regime where the
resolved-page dimension cannot broadcast and one head entity ("Berlin",
planted in ~50% of pages by the corpus derivation) funnels a quarter of the
mention fact table through one reducer.  It is equivalence-TESTED
(tests/test_pipeline_spark.py::test_salted_join_matches_broadcast) but was
never MEASURED under the planted hot key.  This measures it:

  corpus   sf0.1 documents x REPLICATE (default 400 -> 2M pages, heavy=1),
           fused-extracted once and persisted (~4M mention rows, ~26% of
           them the hot label)
  join     mentions LEFT JOIN resolved ON (label, link_lang) with
           autoBroadcastJoinThreshold=-1 (the beyond-broadcast regime)
  variants plain   — SortMergeJoin, AQE skew handling OFF (the naive plan)
           aqe     — AQE skew-join ON, thresholds lowered so the optimizer
                     can see this corpus's skew (defaults need a 256MB
                     partition; the hot partition here is ~100MB — on the
                     real 100TB corpus the DEFAULTS trigger)
           salted  — join_back(n_salt=8), AQE skew handling OFF
  metrics  wall seconds (min of REPEATS fresh actions), joined row count
           (must be identical), and per-task executorRunTime quantiles of
           the heaviest post-marker stage from the local UI REST API —
           the straggler signature is max >> p50.

Usage: python scripts/skew_check.py [--replicate 400] [--repeats 2]
Prints one JSON line per variant + a summary table (goes into BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _ui(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1{path}", timeout=10) as r:
        return json.loads(r.read().decode())


def task_quantiles(spark, min_stage_id: int) -> dict:
    """executorRunTime quantiles of the heaviest completed stage newer than
    `min_stage_id` (the join stage — identified as max total task time)."""
    app = _ui(spark, "/applications")[0]["id"]
    stages = [s for s in _ui(spark, f"/applications/{app}/stages?status=COMPLETE")
              if s["stageId"] > min_stage_id]
    if not stages:
        return {}
    heaviest = max(stages, key=lambda s: s.get("executorRunTime", 0))
    q = _ui(spark, f"/applications/{app}/stages/{heaviest['stageId']}"
                   f"/{heaviest['attemptId']}/taskSummary"
                   f"?quantiles=0.5,0.95,1.0")
    p50, p95, mx = (round(v / 1000.0, 3) for v in q["executorRunTime"])
    return {"stage": heaviest["stageId"], "tasks": heaviest["numCompleteTasks"],
            "task_sec_p50": p50, "task_sec_p95": p95, "task_sec_max": mx,
            "straggle_max_over_p50": round(mx / p50, 2) if p50 else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=400)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from entity_extractor_linker_api_v2_spark import fixtures
    from entity_extractor_linker_api_v2_spark.operators import linking
    from entity_extractor_linker_api_v2_spark.operators.extract import (
        extract_and_detect)
    from entity_extractor_linker_api_v2_spark.session import get_spark
    from entity_extractor_linker_api_v2_spark.sources import tables

    spark = get_spark(app_name="skew-check", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # see module docstring: generator corpus needs lowered AQE thresholds
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    base = tables.load(spark, "/root/testdata/sf0.1", "documents") \
        .repartition(64)
    docs = tables.derive_docs(
        tables.replicate_documents(base, args.replicate, heavy=1))
    ments = extract_and_detect(docs, dedup=True, max_entities=10).persist()
    n_m = ments.count()
    hot = ments.groupBy("label").count().orderBy(F.desc("count")).first()
    print(f"mentions={n_m}  hot_label={hot['label']}  "
          f"hot_share={hot['count'] / n_m:.2%}", flush=True)

    resolved = linking.resolve_label_universe(
        spark, [lbl for _, lbl, _ in fixtures.GAZETTEER]).persist()
    resolved.count()

    variants = [
        ("plain_smj", {"spark.sql.adaptive.skewJoin.enabled": "false"},
         dict(n_salt=0)),
        ("aqe_skew", {"spark.sql.adaptive.skewJoin.enabled": "true"},
         dict(n_salt=0)),
        # round-7: hot-key-only salt (SURVEY §4 design) is the default;
        # the round-6 all-keys shape is kept for measured contrast
        ("salted_hot_8", {"spark.sql.adaptive.skewJoin.enabled": "false"},
         dict(n_salt=8)),
        ("salted_all_8", {"spark.sql.adaptive.skewJoin.enabled": "false"},
         dict(n_salt=8, salt_all=True)),
    ]
    results = {}
    counts = {}
    for name, confs, salt_kw in variants:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # plan construction is timed too: the hot-only variant's frequency
        # sketch collects inside join_back, a real once-per-job cost that
        # must not hide outside the walls below
        t_b = time.perf_counter()
        joined = linking.join_back(ments, resolved,
                                   broadcast_resolved=False, **salt_kw)
        build_sec = round(time.perf_counter() - t_b, 3)
        best, quant = None, {}
        for _ in range(args.repeats):
            last_stage = max((s["stageId"] for s in _ui(
                spark, f"/applications/{_ui(spark, '/applications')[0]['id']}"
                       "/stages")), default=-1)
            t0 = time.perf_counter()
            joined.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if best is None or el < best:
                best = el
                quant = task_quantiles(spark, last_stage)
        counts[name] = joined.count()
        results[name] = {"wall_sec": round(best, 3),
                         "plan_build_sec": build_sec, **quant}
        print(json.dumps({name: results[name]}), flush=True)

    assert len(set(counts.values())) == 1, f"variant row counts differ: {counts}"
    print(json.dumps({"replicate": args.replicate, "mentions": n_m,
                      "hot_share": round(hot["count"] / n_m, 4),
                      "rows": counts["plain_smj"], "variants": results}))
    spark.stop()


if __name__ == "__main__":
    main()

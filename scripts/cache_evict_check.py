"""Measured eviction evidence for the session entity cache (round 7).

The sf1.0 scale step's cached-prefix timings (q11 at 1.1x under 10x data)
depend on `plans.queries._ENTITY_CACHE` pinning the mention + entity
relations per corpus.  VERDICT r6 item 6: prove the cap EVICTS under
corpus churn instead of accumulating ~GBs of persisted lineage per
corpus.  This cycles TWO tagged sf1.0 corpora (same data, distinct path
strings via a symlink) through a cap of 1 and reads the block manager's
actual pinned bytes after each build:

  expected: pinned bytes after corpus B ~= pinned bytes after corpus A
  (A was evicted and unpersisted), NOT ~2x; the control pass with the
  cap lifted shows the ~2x accumulation the cap prevents.

Usage: python scripts/cache_evict_check.py [--sf-dir /tmp/eel_sf1.0]
(regenerate the sf1.0 dir first with scripts/make_scale_dir.py if absent)
Prints one JSON line (numbers go into BENCH.md's scale section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pinned(spark) -> tuple[int, int]:
    """(#persisted RDDs, total bytes in memory+disk) from the block manager
    — ground truth, not our own bookkeeping."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return (len(infos),
            sum(i.memSize() + i.diskSize() for i in infos))


def cycle(spark, dirs, cap: int) -> list[dict]:
    from entity_extractor_linker_api_v2_spark.plans import queries as Q
    # fresh cache state per pass
    per = Q._ENTITY_CACHE.get(spark, {})
    for d in list(per):
        Q._unpersist_entry(per.pop(d))
    old_cap, Q._MAX_DIRS_PER_SESSION = Q._MAX_DIRS_PER_SESSION, cap
    try:
        steps = []
        for tag, d in dirs:
            n = Q._entities(spark, d).count()
            n_rdds, n_bytes = pinned(spark)
            steps.append({"corpus": tag, "entities": n,
                          "pinned_rdds": n_rdds,
                          "pinned_mb": round(n_bytes / 2**20, 1)})
            print(json.dumps({f"cap{cap}": steps[-1]}), flush=True)
        return steps
    finally:
        Q._MAX_DIRS_PER_SESSION = old_cap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/eel_sf1.0")
    args = ap.parse_args()
    if not os.path.isdir(args.sf_dir):
        sys.exit(f"{args.sf_dir} missing - run scripts/make_scale_dir.py")

    from entity_extractor_linker_api_v2_spark.session import get_spark

    spark = get_spark(app_name="cache-evict-check", master="local[32]",
                      shuffle_partitions=32)
    twin = os.path.join(tempfile.mkdtemp(prefix="cache_evict_"), "sf1.0_twin")
    os.symlink(os.path.abspath(args.sf_dir), twin)
    dirs = [("A", args.sf_dir), ("B", twin)]

    capped = cycle(spark, dirs, cap=1)
    control = cycle(spark, dirs, cap=10)
    grow_capped = round(capped[1]["pinned_mb"]
                        / max(capped[0]["pinned_mb"], 0.1), 2)
    grow_control = round(control[1]["pinned_mb"]
                         / max(control[0]["pinned_mb"], 0.1), 2)
    print(json.dumps({
        "sf_dir": args.sf_dir, "capped": capped, "control": control,
        "pinned_growth_capped": grow_capped,
        "pinned_growth_uncapped": grow_control,
        "eviction_works": grow_capped < 1.5 <= grow_control,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

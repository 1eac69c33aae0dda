"""Pure-JVM scaling CONTROL for the two-cluster-size evidence in BENCH.md.

The north rule's N->4N efficiency is measured on the KG pipeline (bench.py).
On this single-host sandbox the big-core sides (local[8], local[32]) run
into a machine ceiling — shared memory bandwidth + host steal — that is NOT
a property of our plans.  This script makes that claim reproducible: it
runs a job with ZERO Python workers and ZERO shuffle — spark.range ->
xxhash64 chain -> sum aggregate, fully inside one WholeStageCodegen span —
at the same pinned core counts with the same estimator as bench.py
(fresh JVM per attempt, best warm repeat per JVM, median across attempts).

If per-core throughput degrades here too (it does: measured ~15-25% from
1 active core to 8 on this box), the pipeline's 2->8 shortfall is
machine-bound, not plan-bound: a real cluster's 4N executors are 4x
separate JVMs on separate hosts — the regime the pinned 1->4 pair models.

Usage: python scripts/jvm_scaling_control.py [rows] [sides...]
Prints one JSON line: per-side rows/sec, per-core rate, efficiencies.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
cores = json.loads(sys.argv[1])
rows = int(sys.argv[2])
repeats = int(sys.argv[3])
os.sched_setaffinity(0, set(cores))  # inherited by the JVM
n = len(cores)
from entity_extractor_linker_api_v2_spark.session import get_spark
spark = get_spark(app_name=f"jvmctl-{n}", master=f"local[{n}]",
                  shuffle_partitions=n)
from pyspark.sql import functions as F


def job():
    # chained xxhash64 over range(): no Python workers, no shuffle, one
    # WholeStageCodegen span per partition + a partial/final sum — pure
    # JVM compute bound, the control for "does this box scale at all".
    df = spark.range(0, rows, 1, n * 2)
    c = F.col("id")
    for _ in range(8):
        c = F.xxhash64(c)
    # bit_xor, not sum: ANSI mode raises on long overflow of summed hashes
    return df.select(c.alias("h")).agg(F.expr("bit_xor(h)")).collect()[0][0]


def read_steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


job()  # warm codegen/JIT
runs = []
for _ in range(repeats):
    s0, t0 = read_steal(), time.perf_counter()
    job()
    el = time.perf_counter() - t0
    runs.append({"rps": rows / el, "steal_ticks": read_steal() - s0})
print("CTL_JSON " + json.dumps(
    {"runs": runs, "affinity_ok": os.sched_getaffinity(0) == set(cores)}))
spark.stop()
"""


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def side(n_cores: int, total: int, rows: int, attempts: int = 3,
         repeats: int = 2) -> dict:
    cores = list(range(total - n_cores, total))  # same pinning as bench.py
    vals, all_runs, pinned = [], [], True
    for _ in range(attempts):
        out = subprocess.run(
            [sys.executable, "-c", CHILD, json.dumps(cores), str(rows),
             str(repeats)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [l for l in out.stdout.splitlines()
                if l.startswith("CTL_JSON ")][-1]
        d = json.loads(line[len("CTL_JSON "):])
        vals.append(max(r["rps"] for r in d["runs"]))  # best warm repeat
        all_runs.extend(d["runs"])
        pinned = pinned and d["affinity_ok"]
    return {"rps": median(vals), "per_core": median(vals) / n_cores,
            "attempts": [round(r["rps"], 0) for r in all_runs],
            "steal": [r["steal_ticks"] for r in all_runs], "pinned": pinned}


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000_000
    sides = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8]
    total = os.cpu_count() or 32
    res = {f"local{n}": side(n, total, rows) for n in sides}
    out = {"rows": rows, "sides": {k: {kk: (round(vv, 1) if isinstance(
        vv, float) else vv) for kk, vv in v.items()} for k, v in res.items()}}
    for a, b in [(1, 4), (2, 8), (1, 2), (4, 8)]:
        ka, kb = f"local{a}", f"local{b}"
        if ka in res and kb in res:
            out[f"eff_{a}_to_{b}"] = round(
                res[kb]["rps"] / (res[ka]["rps"] * (b / a)), 3)
    print("JVMCTL " + json.dumps(out))


if __name__ == "__main__":
    main()

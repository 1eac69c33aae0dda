"""Round-6 scale-step bench: the same jobs at sf0.1 and sf1.0 (10x).

Every number through round 5 was measured at sf0.1; this runs (a) the
headline operator queries and (b) the flagship pipeline-throughput job at
BOTH sf0.1 and the synthesized sf1.0 dir (scripts/make_scale_dir.py), in
fresh pinned-free JVMs, and reports the per-query time ratio.  A query
whose time grows >10x at 10x data has a super-linear term the sf0.1 bench
could not see (shuffle spill, cache pressure, candidate blow-up); the table
lands in BENCH.md as the scale-evidence row.

The pipeline job runs sf1.0 x REPLICATE(200) = 10M pages (~70 GB of
generated page text streamed through the fused map-only path) vs sf0.1
x 200 = 1M pages.

Usage: python scripts/scale_step.py [--sf1-dir /tmp/eel_sf1.0]
Writes SCALE_STEP.json next to the repo's bench artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "200"))
HEAVY = int(os.environ.get("SPARK_GRAFT_HEAVY", "24"))

_QUERIES_SNIPPET = r"""
import json, sys, time
sf_dir, cpus = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])
from bench import HEADLINE
from entity_extractor_linker_api_v2_spark.plans.queries import QUERIES
from entity_extractor_linker_api_v2_spark.session import get_spark
spark = get_spark(app_name="scale-step", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
# same pilot as bench.py: JIT/python-worker warmup is spawn overhead, not
# operator work
for warm in ("q11_entities", "q24_jaccard_pairs"):
    QUERIES[warm](spark, "/root/testdata/sf0.001") \
        .write.format("noop").mode("overwrite").save()
out = {}
for name in HEADLINE:
    best = None
    for _ in range(2):  # min-of-2: one steal burst cannot set a ratio cell
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    out[name] = round(best, 3)
print("SCALE_JSON " + json.dumps(out))
spark.stop()
"""


def _run(snippet: str, *args: str, timeout: int = 3600) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", snippet, *args],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT)
    for line in proc.stdout.splitlines():
        if line.startswith("SCALE_JSON "):
            return json.loads(line[len("SCALE_JSON "):])
    raise RuntimeError(f"scale-step run failed:\n{proc.stderr[-3000:]}")


def _pipeline(sf_dir: str, replicate: int, repeats: int = 3) -> dict:
    sys.path.insert(0, ROOT)
    from bench import _THROUGHPUT_SNIPPET
    # the sf1.0 x200 leg streams ~70 GB of generated page text through one
    # local-mode JVM; the 16g session default OOMs it — default the driver
    # heap up unless the caller already chose one
    env = {**os.environ,
           "SPARK_DRIVER_MEMORY": os.environ.get("SPARK_DRIVER_MEMORY", "48g")}
    proc = subprocess.run(
        [sys.executable, "-c", _THROUGHPUT_SNIPPET, f"local[{CPUS}]", "-",
         sf_dir, str(replicate), str(HEAVY), str(repeats)],
        capture_output=True, text=True, timeout=7200, cwd=ROOT, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_JSON "):
            return json.loads(line[len("BENCH_JSON "):])
    raise RuntimeError(f"pipeline run failed:\n{proc.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/eel_sf1.0")
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    print("== headline queries @ sf0.1 ==", flush=True)
    q01 = _run(_QUERIES_SNIPPET, "/root/testdata/sf0.1", str(CPUS), ROOT)
    print(json.dumps(q01), flush=True)
    print("== headline queries @ sf1.0 ==", flush=True)
    q10 = _run(_QUERIES_SNIPPET, args.sf1_dir, str(CPUS), ROOT)
    print(json.dumps(q10), flush=True)

    result = {"sf0.1": q01, "sf1.0": q10,
              "ratio": {k: round(q10[k] / q01[k], 2) for k in q01},
              "cpus": CPUS}

    if not args.skip_pipeline:
        print("== pipeline @ sf0.1 x200 (1M pages) ==", flush=True)
        p01 = _pipeline("/root/testdata/sf0.1", REPLICATE)
        print(json.dumps({k: p01[k] for k in
                          ("pages", "pages_per_sec", "runs")}), flush=True)
        print("== pipeline @ sf1.0 x200 (10M pages) ==", flush=True)
        p10 = _pipeline(args.sf1_dir, REPLICATE)
        print(json.dumps({k: p10[k] for k in
                          ("pages", "pages_per_sec", "runs")}), flush=True)
        result["pipeline"] = {
            "sf0.1": {"pages": p01["pages"], "pps": p01["pages_per_sec"],
                      "runs": p01["runs"]},
            "sf1.0": {"pages": p10["pages"], "pps": p10["pages_per_sec"],
                      "runs": p10["runs"]},
            "pps_ratio_10x": round(p10["pages_per_sec"] / p01["pages_per_sec"], 3),
        }

    with open(os.path.join(ROOT, "SCALE_STEP.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    hdr = f"{'query':28s} {'sf0.1':>8s} {'sf1.0':>8s} {'ratio':>6s}"
    print(hdr)
    for k in sorted(q01):
        print(f"{k:28s} {q01[k]:8.2f} {q10[k]:8.2f} {result['ratio'][k]:6.2f}")


if __name__ == "__main__":
    main()

"""Scale evidence for affected-component pruning in incremental CC.

Folds a FIXED 2-edge batch into synthetic component states of growing size
(5-member chains, comp = min member) and times:

  * pruned  — ``merge_components_delta`` (round-5 code): CC iterations run
    only over the one component the batch touches; the state is streamed
    through broadcast semi-probes.
  * full-CC — the pre-round-5 formulation (star-CC over the ENTIRE state's
    star relation union the batch), reconstructed inline for contrast.

At 100 TB the state is the full entity universe and a micro-batch touches a
vanishing fraction of it: per-batch cost must track the BATCH, not the
state.  Pruned time should stay ~flat from S to 4S while full-CC grows
~linearly (it re-iterates every star edge each batch).

Run: python scripts/merge_scale_check.py   (prints one JSON line)
"""

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from entity_extractor_linker_api_v2_spark.operators.canonicalize import (  # noqa: E402
    connected_components_star, merge_components_delta)
from entity_extractor_linker_api_v2_spark.session import get_spark  # noqa: E402

MEMBERS = 5


def make_state(spark, n_components, path):
    """(node, comp) state of n_components 5-member components, comp = the
    member-minimum (…m0) as the production CC emits.  Routed through
    parquet like the real streaming state: a raw Range-sourced plan trips a
    Spark 4.1 optimizer NoSuchElementException (key not found: a#N) inside
    the star loop's localCheckpoint — constraint propagation from the Range
    relation through the self-joined union; a parquet scan carries no such
    constraints (and is the production shape anyway)."""
    (spark.range(n_components * MEMBERS)
     .select(F.format_string("c%08dm%d", (F.col("id") / MEMBERS)
                             .cast("long"), F.col("id") % MEMBERS)
             .alias("node"),
             F.format_string("c%08dm0", (F.col("id") / MEMBERS)
                             .cast("long")).alias("comp"))
     .write.mode("overwrite").parquet(path))
    return spark.read.parquet(path)


def full_cc_merge_delta(comps, new_edges):
    """Pre-round-5 shape: star-CC over the WHOLE state + batch."""
    stars = (comps.filter(F.col("node") != F.col("comp"))
             .select(F.col("node").alias("a"), F.col("comp").alias("b")))
    res = connected_components_star(
        stars.unionByName(new_edges.select("a", "b")).distinct())
    prev = comps.withColumnRenamed("comp", "old_comp")
    return (res.join(prev, "node", "left")
            .filter(F.col("old_comp").isNull()
                    | (F.col("comp") != F.col("old_comp")))
            .select("node", "comp"))


def main():
    import tempfile

    spark = get_spark(master="local[32]")
    batch = spark.createDataFrame(
        [("c00000000m4", "znew1"), ("znew1", "znew2")], "a string, b string")
    out = {"members_per_component": MEMBERS, "batch_edges": 2, "sizes": {}}
    tmp = tempfile.mkdtemp(prefix="merge_scale_")
    for n_comp in (100_000, 400_000):
        comps = make_state(spark, n_comp, f"{tmp}/state_{n_comp}")
        timings = {}
        for name, fn in (("pruned", merge_components_delta),
                         ("full_cc", full_cc_merge_delta)):
            reps = []
            for _ in range(3):
                t0 = time.time()
                rows = fn(comps, batch).collect()
                reps.append(round(time.time() - t0, 3))
            assert {r["node"] for r in rows} >= {"znew1", "znew2"}, rows
            timings[name] = {"reps": reps, "best": min(reps)}
        out["sizes"][str(n_comp * MEMBERS)] = timings
    s, l = (out["sizes"][k] for k in sorted(out["sizes"], key=int))
    out["growth_4x_state"] = {
        name: round(l[name]["best"] / s[name]["best"], 3)
        for name in ("pruned", "full_cc")}
    spark.stop()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

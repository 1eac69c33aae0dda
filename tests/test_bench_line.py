"""bench.py output contract: the driver captures only the TAIL of stdout
(~2 kB) and parses the LAST JSON line — round 4's single fat line overflowed
it and the round lost its machine-parsed bench artifact.  These tests pin
(a) the headline projection's size under a worst-case field population and
(b) the _entities() cache-event instrumentation that replaced the
source-text grep for entity_cache_hit labeling."""

import json

from conftest import SF_SMALL


def test_headline_line_fits_driver_tail():
    import bench

    # worst-case-ish: 20 long query names, every scaling field present,
    # plus bulky detail-only fields that must be projected OUT
    result = {
        "metric": "kg_pipeline_headline_queries",
        "value": 123.456, "unit": "sec", "sf": 0.1, "pages": 1_000_000,
        "pipeline_sec": 25.437, "pages_per_sec": 39412.7,
        "repeat_spread": 1.234,
        "pipeline_windows": [{"sec": 25.437, "pps": 39412.7,
                              "spread": 1.234, "runs": [38000.1] * 6,
                              "steal": [0] * 6}] * 2,
        "scaling_efficiency": 0.812, "scaling_pair": "local[1]->local[4]",
        "scaling_efficiency_1_to_4": 0.812,
        "scaling_efficiency_2_to_8": 0.803, "scaling_pinned": True,
        "queries": {f"q{i:02d}_some_longish_query_name": 12.345
                    for i in range(20)},
        # detail-only payloads (the round-4 overflow sources)
        "entity_cache_hit": {f"q{i:02d}_some_longish_query_name": True
                             for i in range(20)},
        "pipeline_runs": [38000.1] * 6,
        "scaling_attempts": {"local1": [2500.1] * 6, "local4": [9300.2] * 6,
                             "local2": [4900.3] * 6, "local8": [15500.4] * 6},
        "scaling_steal_ticks": {"local1": [0] * 6, "local4": [12] * 6,
                                "local2": [0] * 6, "local8": [7] * 6},
        "scaling_estimator": "symmetric median of 3 fresh-JVM attempts",
    }
    line = json.dumps(bench.headline_line(result))
    assert len(line) < 1500, len(line)
    assert "entity_cache_hit" not in line
    assert "scaling_attempts" not in line
    assert "pipeline_runs" not in line
    assert "pipeline_windows" not in line
    parsed = json.loads(line)
    assert parsed["value"] == 123.456
    assert parsed["scaling_efficiency"] == 0.812
    assert len(parsed["queries"]) == 20


def test_entity_cache_events_label_hits(spark):
    from entity_extractor_linker_api_v2_spark.plans.queries import (
        QUERIES, drain_entity_cache_events, entity_cache_populated)

    pre = entity_cache_populated(spark, SF_SMALL)
    drain_entity_cache_events()
    QUERIES["q17_linked_stats"](spark, SF_SMALL).collect()
    ev1 = drain_entity_cache_events()
    # the chain query consulted the cache exactly as populated beforehand
    assert ev1 and all(e == pre for e in ev1), (pre, ev1)
    QUERIES["q17_linked_stats"](spark, SF_SMALL).collect()
    ev2 = drain_entity_cache_events()
    assert ev2 and all(ev2), ev2
    # a non-chain query records no events at all
    QUERIES["q20_dedup_exact"](spark, SF_SMALL).collect()
    assert drain_entity_cache_events() == []

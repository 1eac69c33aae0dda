"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() twin via DuckDB, at sf0.001 (driver runs sf0.01)."""

import pytest

import parity
from conftest import SF_SMALL
from entity_extractor_linker_api_v2_spark.plans.oracle import ORACLE
from entity_extractor_linker_api_v2_spark.plans.queries import QUERIES


def test_every_query_has_oracle_or_is_declared():
    from entity_extractor_linker_api_v2_spark.plans.queries import ROWS_ONLY
    missing = [k for k in QUERIES if k not in ORACLE and k not in ROWS_ONLY]
    assert not missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, name):
    if name not in ORACLE:
        pytest.skip("non-SQL-expressible; rows-only check at driver")
    res = parity.run_parity(spark, SF_SMALL, names=[name])
    assert res[name] == [], f"{name}: {res[name]}"

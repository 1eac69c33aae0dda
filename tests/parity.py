"""Local mirror of the driver's Spark-vs-DuckDB correctness gate.

Runs a queries() callable and its oracle_sql() twin on the same sf dir,
normalizes both to pandas (columns sorted by name, rows sorted by all
columns), and compares values (exact for strings/ints, atol 1e-9 for
floats).  Used by tests/test_oracle_parity.py and ad-hoc during dev.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns list of problems; empty == match.

    NOTE (round-1 q11 lesson): the driver hashes REPRESENTATIONS — a
    bit-identical unrounded double can still hash-mismatch across engines.
    Compared projections must round (computed) or stringify (stored) float
    columns on both sides; this tolerance-based compare cannot catch that."""
    probs: list[str] = []
    s = normalize(spark_df.toPandas())
    o = normalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return [f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        probs.append(f"row count differs: spark={len(s)} oracle={len(o)}")
        return probs
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            bad = 0
            for a, b in zip(sv, ov):
                an, bn = (a is None or (isinstance(a, float) and math.isnan(a))), \
                         (b is None or (isinstance(b, float) and math.isnan(b)))
                if an != bn or (not an and abs(float(a) - float(b)) > 1e-9):
                    bad += 1
            if bad:
                probs.append(f"col {c}: {bad} float mismatches")
        else:
            # NB: fillna("\0") is a TRAP — pandas 2.x turns the NUL char into
            # '' so NULL compared equal to empty string, masking the exact
            # delta that failed the round-1 driver hash (DuckDB
            # array_to_string([]) is NULL, Spark array_join([]) is '').
            sentinel = "<␀NULL␀>"
            neq = (sv.fillna(sentinel) != ov.fillna(sentinel))
            if neq.any():
                i = int(neq.idxmax())
                probs.append(f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                             f"spark={sv[i]!r} oracle={ov[i]!r}")
    return probs


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from entity_extractor_linker_api_v2_spark.plans.oracle import ORACLE
    from entity_extractor_linker_api_v2_spark.plans.queries import QUERIES
    con = duck_con(sf_dir)
    out: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        if name not in ORACLE:
            out[name] = ["<no oracle>"]
            continue
        try:
            oracle_pdf = con.execute(ORACLE[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            out[name] = [f"oracle error: {e}"]
            continue
        try:
            out[name] = compare(fn(spark, sf_dir), oracle_pdf)
        except Exception as e:  # noqa: BLE001
            out[name] = [f"spark error: {e}"]
    return out

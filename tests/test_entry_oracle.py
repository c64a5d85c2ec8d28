"""Driver-harness mimic: every queries() entry vs its oracle_sql()
DuckDB result at sf0.001 (order-insensitive value comparison, the
same shape as the driver's CORRECTNESS gate)."""

from __future__ import annotations

import datetime
import math

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
# the IVF oracle recomputes the deterministic centroids from the
# corpus; point it at the mimic's scale (driver default: sf0.01)
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check
        return
    spark_df = q(spark, SF_DIR)
    got = _rows([tuple(r) for r in spark_df.collect()])
    con = _duck(SF_DIR)
    want = _rows(con.execute(sql).fetchall())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    mismatches = [
        (g, w) for g, w in zip(got, want) if g != w
    ]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {r["lang"] for r in rows} == {"en", "de", "fr", "es", "zh"}

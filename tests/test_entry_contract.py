"""Replicates the driver's correctness gate locally: every queries()
entry runs on Spark at sf0.01 and its oracle_sql() twin runs in DuckDB
on the same parquet; row counts, column names and (order-insensitive)
values must match."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from zh_ner_tf_spark.config import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("∅")
            elif isinstance(v, float):
                # driver hashes values; we require agreement to 9 dp —
                # all engine outputs are rounded to <= 6 dp by design
                row.append(f"{v:.9f}")
            elif hasattr(v, "item"):
                row.append(str(v.item()))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


QUERIES = sorted(entrymod.queries().keys())


def test_every_query_has_an_oracle():
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = q(spark, SF_DIR).toPandas()
    want = duck.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    # case-SENSITIVE: the driver's compare may not fold case
    assert sorted(got.columns) == sorted(
        want.columns
    ), f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    g, w = _normalize(got), _normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"mention", "etype", "freq"}

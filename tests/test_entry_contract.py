"""Self-check of the driver contract: run every queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.001 and compare sorted
values exactly (mimics the driver's CORRECTNESS gate)."""

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).fetchall(), [d[0] for d in con.description]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # stringify for the sort only (rollup/grouping rows carry NULLs,
    # which have no order vs str) — equality still compares _norm'd
    # tuples, so "1" (str) never collides with 1 (int)
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows),
                  key=lambda t: tuple((v is None, str(type(v)), str(v))
                                      for v in t))


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    drows, dcols = _duck(ORACLES[name])
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    a = _normalize(srows, scols)
    b = _normalize(drows, dcols)
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first diffs {mism}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_multimodal_rows_only(spark):
    df = QUERIES["multimodal_features"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 64
    assert all(r["digest"] for r in rows)

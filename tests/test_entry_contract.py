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


def test_bare_session_contract_subset():
    """The driver's session sets NO configs (no arrow flag, no
    timezone): every query must match its oracle there too. The
    conftest session sets arrow.pyspark.enabled, which would mask a
    config-dependence regression (the r3 multimodal red). Runs the
    queries with non-trivial machinery (localCheckpoint two-phase
    ops, mapInPandas, the composed pipeline, regex scrub) in a fresh
    interpreter with a bare session against DuckDB at sf0.001."""
    import subprocess
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(f"""
        import sys, math, datetime
        sys.path.insert(0, {repo!r})
        import duckdb
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .appName("bare-contract")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        import __spark_entry__ as em
        SF = {SF_DIR!r}
        con = duckdb.connect()
        for t in {TABLES!r}:
            import os
            p = f"{{SF}}/{{t}}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{p}}')")
        def norm(v):
            if isinstance(v, float):
                return "nan" if math.isnan(v) else round(v, 9)
            if isinstance(v, datetime.datetime):
                return v.replace(tzinfo=None).isoformat()
            return v
        qs, osql = em.queries(), em.oracle_sql()
        for name in ["curation_pipeline", "curation_budget_pack",
                     "curation_pack_sequences",
                     "curation_training_shuffle",
                     "curation_pii_scrub", "ann_quantize",
                     "graph_pagerank", "streaming_intake",
                     "analytics_quantiles", "spans_profile",
                     "dedup_semantic", "curation_prototype_prune"]:
            sdf = qs[name](spark, SF)
            cols = sorted(sdf.columns)
            srows = sorted(tuple(norm(r[c]) for c in cols)
                           for r in sdf.collect())
            d = con.execute(osql[name])
            dcols = [x[0] for x in d.description]
            order = sorted(range(len(dcols)), key=lambda i: dcols[i])
            drows = sorted(tuple(norm(r[i]) for i in order)
                           for r in d.fetchall())
            assert srows == drows, (name, srows[:2], drows[:2])
            print(name, "MATCH", len(srows))
        print("ALL_OK")
        spark.stop()
    """)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "ALL_OK" in out.stdout

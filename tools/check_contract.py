#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark at sf0.01 AND its
oracle_sql() on DuckDB over the same parquet, then compares:
  - row count
  - column-name set
  - value hash over rows sorted by all columns, columns sorted by name
Prints one line per query: OK / MISMATCH(kind) / ERROR.
"""
from __future__ import annotations

import hashlib
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def frame_digest(df):
    """df: pandas DataFrame. Sort columns by name, rows by values."""
    cols = sorted(df.columns)
    rows = [tuple(canon_value(v) for v in rec)
            for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16], len(rows), cols


def main():
    only = set(sys.argv[1:])
    import duckdb
    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("contract-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = em.queries()
    oracles = em.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            s_dig, s_n, s_cols = frame_digest(sdf)
        except Exception:
            print(f"{name}: SPARK-ERROR")
            traceback.print_exc()
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({s_n} rows, cols={s_cols})")
            n_ok += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
            d_dig, d_n, d_cols = frame_digest(ddf)
        except Exception:
            print(f"{name}: DUCKDB-ERROR")
            traceback.print_exc()
            n_bad += 1
            continue
        if s_cols != d_cols:
            print(f"{name}: MISMATCH(schema) spark={s_cols} duck={d_cols}")
            n_bad += 1
        elif any(sdf[c].dtype.kind != ddf[c].dtype.kind for c in s_cols):
            # the driver hashes engine-native values: a DuckDB HUGEINT
            # (object/float64 in pandas) vs Spark int64 stringifies
            # differently even when values agree -> flag as bad here.
            kinds = {c: (str(sdf[c].dtype), str(ddf[c].dtype))
                     for c in s_cols
                     if sdf[c].dtype.kind != ddf[c].dtype.kind}
            print(f"{name}: MISMATCH(dtype-kind) {kinds}")
            n_bad += 1
        elif s_n != d_n:
            print(f"{name}: MISMATCH(rows) spark={s_n} duck={d_n}")
            n_bad += 1
        elif s_dig != d_dig:
            print(f"{name}: MISMATCH(values) n={s_n}")
            # show first differing rows for debugging
            scmp = sorted(tuple(canon_value(v) for v in r)
                          for r in sdf[sorted(sdf.columns)]
                          .itertuples(index=False, name=None))
            dcmp = sorted(tuple(canon_value(v) for v in r)
                          for r in ddf[sorted(ddf.columns)]
                          .itertuples(index=False, name=None))
            shown = 0
            for a, b in zip(scmp, dcmp):
                if a != b and shown < 3:
                    print(f"   spark: {a}\n   duck : {b}")
                    shown += 1
            n_bad += 1
        else:
            print(f"{name}: OK ({s_n} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

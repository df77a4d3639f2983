"""Vectorized pandas UDFs wrapping the parity kernels.

Every per-URL computation crosses the JVM/Python boundary in Arrow
batches (no per-row Python UDFs anywhere in the pipeline, per the
BASELINE input_hint). The kernels are pure functions, so the UDFs are
deterministic and safe to re-execute on task retry.

Fast path: most URLs need no canonicalizer state machine; a vectorized
pandas pre-screen routes only the odd ones through the exact kernel.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.hashes import content_hash, ip_hash, site_hash, url_hash
from ..kernels.robots import is_allowed, parse_robots
from ..kernels.urlfilter import filter1
from ..kernels.urlnorm import parse_url

CANON_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("port", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("valid", T.BooleanType()),
])


def _canon_one(raw: Optional[str], base_host, base_port, base_path):
    if raw is None:
        return (None, None, None, None, False)
    base = None
    if base_host is not None:
        from ..kernels.urlnorm import ParsedUrl
        base = ParsedUrl(base_host, int(base_port), base_path, 0)
    p = parse_url(raw, 0, base)
    if p is None:
        return (None, None, None, None, False)
    return (p.host, p.port, p.path, p.url, True)


@pandas_udf(CANON_SCHEMA)
def canonicalize_udf(raw: pd.Series, base_host: pd.Series,
                     base_port: pd.Series, base_path: pd.Series) -> pd.DataFrame:
    """Absolute-or-relative URL canonicalization (O-3)."""
    rows = [
        _canon_one(r, bh, bp, bf)
        for r, bh, bp, bf in zip(raw, base_host, base_port, base_path)
    ]
    return pd.DataFrame(rows, columns=["host", "port", "path", "url", "valid"])


@pandas_udf(T.LongType())
def url_bucket_udf(host: pd.Series, port: pd.Series, path: pd.Series,
                   hash_size: pd.Series) -> pd.Series:
    """url::hashCode bucket (the seen-set key, O-6) — numpy fast path
    (kernels/vectorized.py), parity-pinned to the scalar kernel."""
    from ..kernels.vectorized import url_hash_np
    return pd.Series(url_hash_np(host, port, path, int(hash_size.iloc[0])),
                     dtype="int64")


@pandas_udf(T.IntegerType())
def site_hash_udf(host: pd.Series) -> pd.Series:
    from ..kernels.vectorized import site_hash_np
    return pd.Series(site_hash_np(host), dtype="int32")


@pandas_udf(T.IntegerType())
def ip_hash_udf(ip: pd.Series) -> pd.Series:
    return pd.Series([ip_hash(x) if x is not None else 0 for x in ip],
                     dtype="int32")


@pandas_udf(T.LongType())
def content_bucket_udf(text: pd.Series, dup_size: pd.Series) -> pd.Series:
    return pd.Series([content_hash(t or "", int(s))
                      for t, s in zip(text, dup_size)], dtype="int64")


@pandas_udf(T.BooleanType())
def filter1_udf(host: pd.Series, path: pd.Series, domains_csv: pd.Series,
                exts_csv: pd.Series) -> pd.Series:
    """checker.cxx filter1 (O-5); list args come in as csv literals so
    one broadcast value serves the whole batch."""
    out = []
    for h, p, dom, ext in zip(host, path, domains_csv, exts_csv):
        domains = dom.split("|") if dom else None
        exts = ext.split("|") if ext else None
        out.append(filter1(h or "", p or "", domains, exts))
    return pd.Series(out, dtype="bool")


@pandas_udf(T.BooleanType())
def robots_allowed_udf(path: pd.Series, forbidden: pd.Series,
                       ignore_robots: pd.Series) -> pd.Series:
    """NamedSite::testRobots over a joined disallow-array column."""
    out = []
    for p, forb, ign in zip(path, forbidden, ignore_robots):
        lst = list(forb) if forb is not None else []
        out.append(is_allowed(p or "", lst, bool(ign)))
    return pd.Series(out, dtype="bool")


@pandas_udf(T.ArrayType(T.StringType()))
def parse_robots_udf(body: pd.Series, user_agent: pd.Series) -> pd.Series:
    return pd.Series([
        parse_robots(b or "", ua) for b, ua in zip(body, user_agent)
    ])

"""Distributed k-hash Bloom filter over the URL-seen key space.

The north-star design names a "distributed bloom/cuckoo URL-seen
filter" as the replacement for Larbin's in-memory hashTable bitmap
(src/fetch/hash_table.cxx:36-125). The AUTHORITATIVE seen set in this
engine stays the exact, range-sharded `seen` bucket table (SCALE.md
§3) — a probabilistic structure can never carry test-and-set
semantics alone — but a Bloom filter earns its place as a MAP-SIDE
PRE-FILTER in front of the exact anti-join:

  * no false negatives: `maybe_seen = false` PROVES the key is new,
    so those rows bypass the anti-join shuffle entirely and are
    routed straight to the novel side;
  * false positives only send extra novel rows through the exact
    join — correctness never depends on the filter.

At 10^10 seen URLs the exact bitmap (hash_size 2^40 -> 128 GB) can't
be broadcast, while a Bloom filter trades size for false-positive
rate freely: m = 2^36 bits (8 GB, executor-memory-feasible as a
torrent broadcast at real-cluster executor RAM; halve m and double
the FP rate to fit smaller boxes). k hash probes derive from ONE md5
via double hashing — pos_i = (h1 + i*h2) mod m — so build and probe
cost one digest per key, and the whole construction is
engine-portable: the DuckDB oracle reproduces every bit position
(contract query `crawl_bloom_prefilter`).

Why Bloom and not cuckoo: a cuckoo filter's win over Bloom is
deletion support and ~30% space at low FP targets, paid for with
insert-time eviction chains — inherently sequential, a poor fit for
a distributed OR-reduce build. The URL-seen set is GROW-ONLY (a
crawled URL never becomes uncrawled; the reference's hashTable has
no delete either), so deletions buy nothing here, and the OR-reduce
build (each partition ORs its keys into a local bitmap, the driver
ORs the partials — associative, commutative, one pass) is exactly
the merge a Bloom bitmap supports for free.

Build is distributed and reuses the membership OR-reduce; the probe
is one Arrow-vectorized numpy pass per batch (no per-row Python).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_double_hash(col: Column, m_bits: int) -> Tuple[Column, Column]:
    """(h1 mod m, h2 mod m) from ONE md5 of the key: h1 = int value
    of hex chars 1-15, h2 = 2*int(hex chars 17-31) + 1 (odd, so the
    probe sequence covers the bit space even for power-of-two m).
    Both operands stay < 2^61 and m <= 2^55 keeps (h1m + i*h2m)
    overflow-free in signed 64-bit — identical arithmetic on DuckDB."""
    hx = F.md5(F.encode(col, "utf-8"))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long") * 2 + 1
    return h1 % m_bits, h2 % m_bits


def bloom_position_col(col: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for a key column (JVM-side,
    codegen'd; one md5 per key)."""
    h1m, h2m = _md5_double_hash(col, m_bits)
    return F.array(*[(h1m + F.lit(i) * h2m) % m_bits for i in range(k)])


def bloom_positions(df: DataFrame, col: str, m_bits: int,
                    k: int) -> DataFrame:
    """(pos: long) — every bit position the keys of `df[col]` set.
    The build relation; also the cross-engine parity surface."""
    return df.select(F.explode(bloom_position_col(F.col(col), m_bits, k))
                     .alias("pos"))


def bloom_build(df: DataFrame, col: str, m_bits: int,
                k: int) -> np.ndarray:
    """Distributed Bloom build: positions computed JVM-side, then the
    same per-partition OR-reduce as the exact membership bitmap
    (operators/membership.py) — one pass, no shuffle."""
    from .membership import seen_bitmap
    return seen_bitmap(bloom_positions(df, col, m_bits, k), m_bits,
                       bucket_col="pos")


def bloom_probe(df: DataFrame, bitmap: np.ndarray, col: str,
                m_bits: int, k: int,
                out_col: str = "maybe_seen") -> DataFrame:
    """Map-side probe: out_col = AND over the k bit tests against the
    broadcast bitmap. false PROVES the key was never inserted."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap.tobytes())

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, np.uint8)
        if not len(pos):
            return pd.Series([], dtype=bool)
        p = np.stack([np.asarray(a, np.int64) for a in pos])
        hit = (bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return df.withColumn(
        out_col, _test(bloom_position_col(F.col(col), m_bits, k)))


def bloom_prefilter(candidates: DataFrame, seen: DataFrame, col: str,
                    seen_col: str, m_bits: int, k: int) -> DataFrame:
    """The pre-filter composition: candidates whose Bloom probe says
    `maybe_seen = false` bypass the exact anti-join (provably novel);
    only the maybe-seen rows shuffle into the anti-join against the
    exact seen table. Returns `candidates` columns + `is_new`."""
    bm = bloom_build(seen, seen_col, m_bits, k)
    probed = bloom_probe(candidates, bm, col, m_bits, k)
    definitely_new = probed.filter(~F.col("maybe_seen")) \
        .withColumn("is_new", F.lit(True))
    maybe = probed.filter(F.col("maybe_seen"))
    checked = maybe.join(
        seen.select(F.col(seen_col).alias(col)).distinct()
        .withColumn("_hit", F.lit(True)),
        col, "left") \
        .withColumn("is_new", F.col("_hit").isNull()).drop("_hit")
    return definitely_new.unionByName(checked).drop("maybe_seen")

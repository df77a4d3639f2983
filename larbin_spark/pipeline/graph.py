"""Link-graph ranking over the crawl's document graph.

Larbin itself never ranks — its ordering is pure FIFO arrival plus
the 4-queue priority scheme (SURVEY §2 O-21; src/fetch/sequencer.cxx
has no comparator anywhere) — but an LLM-training-data pipeline built
on a crawl needs a page-importance signal for quality weighting and
sampling: the PageRank family. This module adds it Spark-first.

Two design rules keep it oracle-able and scale-safe:

1. ORDER-FREE INTEGER ARITHMETIC. Ranks are int64 fixed-point
   (``scale`` micro-mass units, default 1e12 total); the 0.85 damping
   is the integer mul+div ``(rank * 85) div (100 * fanout)``; the
   teleport term is ``(15 * scale) div (100 * n)``. Integer sums are
   associative/commutative, so the result is bit-identical across
   partitionings, executor counts, AND engines — the DuckDB oracle
   (iterations unrolled as CTEs) hash-matches exactly. A float
   PageRank could never promise that (summation-order divergence).

2. EVERY node emits exactly ``fanout`` edges, so outdegree is uniform
   and there is no dangling-mass special case to keep in sync across
   engines. The driver tables carry no link column, so edges are
   derived deterministically: ``dst_j = md5_32(text || '#j') % n``
   — the same one-md5-then-integer-ops idiom the minhash family uses
   (pipeline/dedup.py), portable bit-for-bit to DuckDB.

Scale shape (10^10 nodes): edges are built in ONE scan of documents
(explode of a constant-width array) and localCheckpoint'd once —
each of the K iterations is then exactly one shuffle of (src ⨝ rank)
with map-side partial aggregation on dst, plus a bounded left join
back to the node set; no window, no cartesian, no driver loop over
rows. K is a constant (3 here), so lineage stays shallow; for K ≳ 8
pass ``checkpoint_every`` to truncate lineage the way
``dedup.connected_components`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10 ** 12  # total rank mass in fixed-point units


def _md5_32(col, salt: str):
    """First 32 bits of md5(text || salt) as a non-negative int64 —
    Spark side of the engine-portable hash (DuckDB mirrors it with a
    strpos digit-sum over the same 8 hex chars)."""
    hx = F.md5(F.encode(F.concat(col, F.lit(salt)), "utf-8"))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")


def derived_edges(documents: DataFrame, fanout: int = 2) -> DataFrame:
    """Deterministic doc->doc edges: node doc_id links to
    ``md5_32(text||'#j') % n + min_id`` for j in 1..fanout. One scan,
    constant fan-out explode. Returns (src, dst) with every src
    appearing exactly ``fanout`` times (uniform outdegree)."""
    meta = documents.agg(F.count("*").alias("_n"),
                         F.min("doc_id").alias("_mn"))
    dsts = [(_md5_32(F.col("text"), f"#{j}") % F.col("_n") + F.col("_mn"))
            .alias(f"d{j}") for j in range(1, fanout + 1)]
    return (documents.select("doc_id", "text")
            .join(F.broadcast(meta))  # 1-row meta, same idiom as ring_histogram
            .select(F.col("doc_id").alias("src"),
                    F.explode(F.array(*dsts)).alias("dst")))


def pagerank(documents: DataFrame, k_iters: int = 3, fanout: int = 2,
             scale: int = PR_SCALE, checkpoint_every: int = 0) -> DataFrame:
    """Fixed-point integer PageRank, K synchronous iterations.

    r0(v)   = scale div n
    r_k(v)  = (15*scale) div (100*n)
              + Σ_{(u,v) ∈ E} (r_{k-1}(u) * 85) div (100 * fanout)

    Truncation loses a few mass units per edge per iteration (both
    engines truncate identically — Spark ``div`` and DuckDB ``//``
    both truncate toward zero, and every operand here is ≥ 0), so
    ranks are exact in the fixed-point semantics, not an
    approximation of float PageRank that happens to match.

    Returns (doc_id, rank_e12) ordered by doc_id.
    """
    # one metadata aggregate + ONE corpus scan regardless of K: the
    # checkpointed base carries both the per-node edge targets
    # (pre-explode) and the node set, so the iterations never re-read
    # documents or re-run the md5 hashing
    meta = documents.agg(F.count("*").alias("_n"),
                         F.min("doc_id").alias("_mn"))
    dsts = [(_md5_32(F.col("text"), f"#{j}") % F.col("_n") + F.col("_mn"))
            .alias(f"d{j}") for j in range(1, fanout + 1)]
    base = (documents.select("doc_id", "text")
            .join(F.broadcast(meta))
            .select("doc_id", "_n", F.array(*dsts).alias("_dsts")))
    base = base.localCheckpoint(eager=False)
    edges = base.select(F.col("doc_id").alias("src"),
                        F.explode("_dsts").alias("dst"))
    nodes = base.select(F.col("doc_id").alias("node"), "_n")
    r = nodes.select("node", "_n",
                     F.expr(f"{scale} div _n").alias("rank"))
    per_edge = f"(rank * 85) div {100 * fanout}"
    tel = f"{15 * scale} div (100 * _n)"
    for k in range(1, k_iters + 1):
        contrib = (edges.join(r, edges.src == r.node)
                   .groupBy("dst")
                   .agg(F.sum(F.expr(per_edge)).alias("c")))
        r = (nodes.join(contrib, nodes.node == contrib.dst, "left")
             .select("node", "_n",
                     (F.expr(tel) + F.coalesce("c", F.lit(0)))
                     .alias("rank")))
        if checkpoint_every and k % checkpoint_every == 0:
            r = r.localCheckpoint(eager=False)
    return (r.select(F.col("node").alias("doc_id"),
                     F.col("rank").alias("rank_e12"))
            .orderBy("doc_id"))


def link_stats(documents: DataFrame, fanout: int = 2) -> DataFrame:
    """In-degree distribution of the derived graph — the bounded
    aggregate a crawl operator dashboard wants next to PageRank.
    Returns (in_degree, n_nodes) including the 0-in-degree row."""
    edges = derived_edges(documents, fanout)
    indeg = edges.groupBy("dst").agg(F.count("*").alias("in_degree"))
    nodes = documents.select(F.col("doc_id").alias("node"))
    return (nodes.join(indeg, nodes.node == indeg.dst, "left")
            .select(F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
            .groupBy("in_degree").agg(F.count("*").alias("n_nodes"))
            .orderBy("in_degree"))

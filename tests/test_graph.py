"""Semantics pins for the link-graph ranking operators
(larbin_spark.pipeline.graph) on constructed inputs — the
cross-engine contract rows (graph_pagerank / graph_indegree) prove
Spark==DuckDB; these prove both equal the intended math."""

import pytest
from pyspark.sql import functions as F

from larbin_spark.pipeline.graph import (PR_SCALE, derived_edges, link_stats,
                                         pagerank)

N_DOCS = 40
FANOUT = 2


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"synthetic body {i} " + "tok " * (i % 5)) for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_derived_edges_uniform_outdegree_and_range(docs):
    e = derived_edges(docs, FANOUT).collect()
    assert len(e) == N_DOCS * FANOUT
    by_src = {}
    for r in e:
        by_src[r.src] = by_src.get(r.src, 0) + 1
        assert 0 <= r.dst < N_DOCS
    assert all(v == FANOUT for v in by_src.values())
    assert len(by_src) == N_DOCS


def test_pagerank_mass_conserved_up_to_truncation(docs):
    out = pagerank(docs, k_iters=3, fanout=FANOUT).collect()
    assert len(out) == N_DOCS
    total = sum(r.rank_e12 for r in out)
    # every truncating div loses < 1 unit: the r0 split loses < n,
    # each iteration loses < (n_edges + n) units
    max_loss = N_DOCS + 3 * (N_DOCS * FANOUT + N_DOCS)
    assert total <= PR_SCALE
    assert total >= PR_SCALE - max_loss
    assert all(r.rank_e12 > 0 for r in out)


def test_pagerank_one_iteration_closed_form(docs):
    """After one iteration from the uniform start, rank is EXACTLY
    tel + indeg * ((r0 * 85) div (100 * fanout)) — uniform outdegree
    makes every in-edge contribute the same integer amount."""
    r0 = PR_SCALE // N_DOCS
    tel = (15 * PR_SCALE) // (100 * N_DOCS)
    per_edge = (r0 * 85) // (100 * FANOUT)
    indeg = {r.src: 0 for r in derived_edges(docs, FANOUT).collect()}
    for r in derived_edges(docs, FANOUT).collect():
        indeg[r.dst] = indeg.get(r.dst, 0) + 1
    expect = {d: tel + indeg.get(d, 0) * per_edge for d in range(N_DOCS)}
    got = {r.doc_id: r.rank_e12
           for r in pagerank(docs, k_iters=1, fanout=FANOUT).collect()}
    assert got == expect


def test_pagerank_partitioning_invariant(docs):
    """Integer arithmetic -> bit-identical ranks regardless of input
    partitioning (the claim the 100 TB story rests on)."""
    a = pagerank(docs.repartition(7), k_iters=3).collect()
    b = pagerank(docs.coalesce(1), k_iters=3).collect()
    assert sorted((r.doc_id, r.rank_e12) for r in a) == \
        sorted((r.doc_id, r.rank_e12) for r in b)


def test_pagerank_checkpoint_every_same_result(docs):
    a = pagerank(docs, k_iters=4).collect()
    b = pagerank(docs, k_iters=4, checkpoint_every=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_link_stats_counts_nodes(docs):
    st = link_stats(docs, FANOUT).collect()
    assert sum(r.n_nodes for r in st) == N_DOCS
    assert sum(r.in_degree * r.n_nodes for r in st) == N_DOCS * FANOUT

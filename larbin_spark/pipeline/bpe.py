"""Distributed BPE-style tokenizer merge induction.

The tokenizer-training primitive of an LLM data pipeline (Sennrich et
al., arXiv:1508.07909): repeatedly (1) count adjacent token pairs
across the whole corpus, (2) pick the most frequent pair, (3) rewrite
every document by greedily merging that pair left-to-right. Real BPE
runs thousands of rounds over byte vocabularies; this module runs K
fixed rounds over word tokens — the DATAFLOW per round is identical
and that is what has to scale.

Scale shape per round:
- pair counting: one corpus scan, explode of the zipped adjacent
  slices, hash-agg with map-side partial counts — shuffle payload is
  O(distinct pairs), not O(tokens);
- top-pair selection: global TakeOrdered (count DESC, pair ASC
  tie-break) of the pair-count table — never a full sort;
- the merge rewrite: a pure per-row FOLD over the token array with
  the winning pair as a literal — zero exchanges, fused into the
  next round's counting scan.
The driver holds one (pair, count) row per round — O(K), bounded.

Cross-engine exactness: counts are integers; the greedy rewrite is
the same left-to-right non-overlapping fold on both engines (Spark
``F.aggregate`` seeded with the first token; DuckDB ``list_reduce``
over single-element lists, whose implicit init is exactly that
seed); tokenization is an engine-portable ``[^a-z0-9]+`` split.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_expr(text_col: Column) -> Column:
    """Lowercase alphanumeric word tokens (portable regex split)."""
    return F.filter(
        F.split(F.lower(F.coalesce(text_col, F.lit(""))), TOKEN_SPLIT),
        lambda x: x != "")


def _adjacent_pairs(toks: Column) -> Column:
    """array<struct<a,b>> of adjacent token pairs (empty when <2)."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1), F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def pair_counts(docs_tok: DataFrame, tok_col: str = "toks") -> DataFrame:
    """(a, b, cnt) adjacent-pair corpus counts: one scan, partial
    map-side counting, shuffle O(distinct pairs)."""
    return (docs_tok
            .select(F.explode(_adjacent_pairs(F.col(tok_col))).alias("pr"))
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def merge_pair_expr(toks: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of the pair (a, b) -> a||b.
    Non-overlapping exactly like classic BPE ("a b a b" merges twice,
    "a a b" once); a fresh merge result never re-merges within the
    same round.

    Two implementations with identical semantics:
    - a != b (the common case): merge sites cannot overlap — a start
      at i requires t[i]=a, a start at i+1 requires t[i+1]=a, but a
      start at i forces t[i+1]=b != a. So the rewrite is POSITIONAL:
      each index either starts a merge, was consumed by the previous
      index's merge, or passes through — an O(n) transform+filter
      (the fold alternative copies its accumulator array per token,
      O(n^2) per document — measurably slow already at 300-token
      docs and disqualifying at 1k+).
    - a == b (self-pair, e.g. "the the"): run parity makes merge
      sites sequentially dependent, so use the O(n^2) fold — rare,
      and bounded by the longest same-token run in practice."""
    if a != b:
        m = a + b
        t = toks

        def g(i):  # 1-based element access, NULL out of bounds
            return F.get(t, i - 1)

        merged = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size(t)),
                lambda i: F.when(
                    (i > 1) & (g(i - 1) == F.lit(a))
                    & (g(i) == F.lit(b)),
                    F.lit(None).cast("string"))
                .when((g(i) == F.lit(a)) & (g(i + 1) == F.lit(b)),
                      F.lit(m))
                .otherwise(g(i))),
            lambda x: x.isNotNull())
    else:
        merged = F.aggregate(
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 1, 1),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(a + b)))
            ).otherwise(F.concat(acc, F.array(x))))
    return F.when(F.size(toks) < 2, toks).otherwise(merged)


def top_pair(docs_tok: DataFrame, tok_col: str = "toks",
             probe_key: str | None = None) -> Tuple[str, str, int]:
    """The corpus-wide most frequent adjacent pair (count DESC, then
    lexicographic pair ASC — fully deterministic). One bounded
    driver row (TakeOrdered), the only driver traffic per round.
    These plans are consumed at build time, so callers pass a
    probe_key to keep them auditable (PLAN_PROBE convention)."""
    lim = (pair_counts(docs_tok, tok_col)
           .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
           .limit(1))
    if probe_key is not None:
        from ..operators.sequence import PLAN_PROBE
        PLAN_PROBE[probe_key] = lim
    row = lim.first()
    if row is None:
        raise ValueError("no adjacent pairs in corpus (all docs <2 tokens)")
    return row["a"], row["b"], int(row["cnt"])


def bpe_merge_rounds(documents: DataFrame, k_rounds: int = 3,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """K rounds of corpus-level BPE merge induction. Returns one row
    per document: (doc_id, n_tok0, n_tok{K}) plus, per round r, the
    learned merge literal m{r} = a||b and its corpus count cnt{r}
    (constant columns — the learned table rides along so the whole
    result is one cross-engine-hashable frame).

    Each round's rewrite chains as a nested fold expression over the
    previous round's — K scans of the corpus total (one per counting
    pass), zero extra shuffles for the rewrites."""
    from ..operators.sequence import PLAN_PROBE

    for key in [x for x in PLAN_PROBE if x.startswith("bpe:")]:
        del PLAN_PROBE[key]  # stale probes must fail loud in the audit

    cur = (documents
           .select(F.col(id_col).alias("doc_id"),
                   tokens_expr(F.col(text_col)).alias("toks"))
           .withColumn("n_tok0", F.size("toks")))
    merges: List[Tuple[str, str, int]] = []
    for r in range(1, k_rounds + 1):
        a, b, cnt = top_pair(cur, probe_key=f"bpe:top{r}")
        merges.append((a, b, cnt))
        # n_tok0 rides along so the result needs no self-join;
        # column pruning drops it from the counting scans
        cur = cur.select("doc_id", "n_tok0",
                         merge_pair_expr(F.col("toks"), a, b).alias("toks"))
    res = cur.select(
        F.col("doc_id"), F.col("n_tok0"),
        F.size("toks").alias(f"n_tok{k_rounds}"))
    for r, (a, b, cnt) in enumerate(merges, start=1):
        res = res.withColumn(f"m{r}", F.lit(a + b)) \
                 .withColumn(f"cnt{r}", F.lit(cnt).cast("long"))
    return res.orderBy("doc_id")

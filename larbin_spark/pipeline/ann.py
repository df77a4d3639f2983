"""Approximate-nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the exactness baseline, plus an
LSH-bucketed variant (random-hyperplane signs derived from md5, so
both engines compute identical buckets) as the scale path: at 100 TB
the crossJoin is impossible, but hyperplane-LSH buckets shuffle
uniformly and candidate verification touches only same-bucket pairs.

All arithmetic in double precision inside the JVM (F.aggregate /
F.zip_with — no Python in the hot path), rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a, b):
    """JVM-side cosine via zip_with + aggregate (whole-stage codegen;
    no UDF). Accepts column names or Column expressions; this is THE
    engine-parity-critical cosine fold — semantic.py's k-means shares
    it rather than re-deriving the fold order."""
    ac = F.transform(F.col(a) if isinstance(a, str) else a,
                     lambda x: x.cast("double"))
    bc = F.transform(F.col(b) if isinstance(b, str) else b,
                     lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ac, bc, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ac, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(bc, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(embeddings: DataFrame, n_queries: int = 5,
                     k: int = 10) -> DataFrame:
    """Top-k cosine neighbors of the first n_queries vectors (by
    vec_id) against the whole table."""
    q = (embeddings.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("embedding").alias("c_emb"))
    pairs = (F.broadcast(q).crossJoin(c)
             .filter(F.col("query_id") != F.col("neighbor_id")))
    pairs = pairs.withColumn("cos", F.round(cosine_expr("q_emb", "c_emb"), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos")
            .orderBy("query_id", "rank"))


def infer_dim(embeddings: DataFrame, col: str = "embedding") -> int:
    """Dimensionality of the embedding column (first row; O(1)).

    The hyperplane coefficient arrays MUST match the vector length:
    a mismatch makes zip_with pad with NULLs, the dot aggregate goes
    NULL, every bucket collapses to the same value and the 'LSH'
    silently degenerates to an all-pairs join — wrong recall AND a
    quadratic blowup at scale. Callers that don't know dim statically
    infer it from the data."""
    row = embeddings.select(F.size(F.col(col)).alias("d")).first()
    return int(row["d"]) if row is not None else 0


def _bucket_expr(n_planes: int, dim: int, plane_offset: int = 0):
    """Sign-LSH bucket expression over planes
    [plane_offset, plane_offset + n_planes): plane p's pseudo-random
    coefficient for dimension d is derived from md5(f"{p}:{d}") ->
    first 8 hex chars -> uint32 -> centered. Pure column arithmetic,
    portable (the DuckDB oracles inline identical coefficients)."""
    import hashlib
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucket = None
    for i in range(n_planes):
        p = plane_offset + i
        coeffs = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            coeffs.append((h - 0x7FFFFFFF) / float(0x7FFFFFFF))
        arr = F.array(*[F.lit(c) for c in coeffs])
        dot = F.aggregate(F.zip_with(emb, arr, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def hyperplane_lsh_buckets(embeddings: DataFrame, n_planes: int = 8,
                           dim: int = 64,
                           plane_offset: int = 0) -> DataFrame:
    """Sign-LSH bucket per vector (see _bucket_expr)."""
    return embeddings.select(
        "vec_id", _bucket_expr(n_planes, dim, plane_offset).alias("bucket"))


def hyperplane_band_keys(embeddings: DataFrame, n_bands: int = 4,
                         planes_per_band: int = 4,
                         dim: int = 64) -> DataFrame:
    """Multi-table (banded) sign-LSH: band b hashes with its own
    disjoint plane set [b*r, (b+1)*r). Two vectors are candidates if
    they collide in ANY band — P(candidate) = 1 - (1 - p^r)^B with
    p = 1 - theta/pi, the classic OR-of-ANDs amplification (same
    shape as MinHash banding). One scan computes every band key;
    returns (vec_id, band, key)."""
    cols = [F.struct(F.lit(b).alias("band"),
                     _bucket_expr(planes_per_band, dim,
                                  b * planes_per_band).alias("key"))
            for b in range(n_bands)]
    return (embeddings
            .select("vec_id", F.explode(F.array(*cols)).alias("bk"))
            .select("vec_id", F.col("bk.band").alias("band"),
                    F.col("bk.key").alias("key")))


def lsh_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
             n_planes: int = 8) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates: the
    shuffle is by bucket (uniform), never all-pairs."""
    dim = infer_dim(embeddings)
    b = hyperplane_lsh_buckets(embeddings, n_planes, dim)
    e = embeddings.join(b, "vec_id")
    q = (e.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"), "bucket"))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("c_emb"), "bucket")
    pairs = (q.join(c, "bucket")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    pairs = pairs.withColumn("cos", F.round(cosine_expr("q_emb", "c_emb"), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos")
            .orderBy("query_id", "rank"))


def ivf_assign(embeddings: DataFrame, n_cells: int = 8) -> DataFrame:
    """IVF coarse quantizer: cell = argmax-cosine centroid. Centroids
    are the first n_cells vectors by vec_id — a deterministic,
    training-free quantizer so both engines compute identical cells
    (production would k-means; the pipeline shape is the same).
    Assignment is a broadcast crossJoin (every IVF assignment is
    O(N*C)); cosine rounded to 6 decimals before the argmax so FP
    last-bit differences can't flip a tie across engines."""
    cent = (embeddings.filter(F.col("vec_id") < n_cells)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("c_emb")))
    pairs = embeddings.crossJoin(F.broadcast(cent))
    pairs = pairs.withColumn("ccos", F.round(cosine_expr("embedding", "c_emb"), 6))
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    return (pairs.withColumn("crn", F.row_number().over(w))
            .filter(F.col("crn") == 1)
            .select("vec_id", F.col("cid").alias("cell")))


def ivf_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
             n_cells: int = 8, nprobe: int = 2) -> DataFrame:
    """IVF ANN top-k: queries probe their nprobe closest cells and
    rank only the vectors assigned to those cells. The candidate join
    shuffles on the cell id — bounded fan-out, never all-pairs; at
    10^10 vectors the inverted lists are the partitioning."""
    cent = (embeddings.filter(F.col("vec_id") < n_cells)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("c_emb")))
    q = (embeddings.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    probes = q.crossJoin(F.broadcast(cent))
    probes = probes.withColumn("pcos",
                               F.round(cosine_expr("q_emb", "c_emb"), 6))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("cid"))
    probes = (probes.withColumn("prn", F.row_number().over(wp))
              .filter(F.col("prn") <= nprobe)
              .select("query_id", "q_emb", F.col("cid").alias("cell")))

    assign = ivf_assign(embeddings, n_cells)
    cand = (embeddings.join(assign, "vec_id")
            .select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("n_emb"), "cell"))
    pairs = (probes.join(cand, "cell")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    pairs = pairs.withColumn("cos", F.round(cosine_expr("q_emb", "n_emb"), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("int").alias("rank"),
                    "neighbor_id", "cos")
            .orderBy("query_id", "rank"))


def quantize_embeddings(embeddings: DataFrame, levels: int = 127,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8-style per-vector quantization (the storage
    path an ANN index at 100 TB actually serves from): each vector
    is scaled by its own max-|x| to `levels` integer steps. Returns
    per vector: dimension count, the scale (maxabs, e9-integerized),
    the quantized-component sum, and the total absolute
    reconstruction error (e9-integerized per element BEFORE summing,
    so the aggregate is an order-free integer sum — exact on both
    engines regardless of fold order).

    Scale: pure JVM higher-order array functions (transform /
    aggregate) in whole-stage codegen — one pass, no shuffle, no
    Python; pairs with ann.py's LSH/IVF candidate generation as the
    compressed storage tier."""
    lv = F.lit(float(levels))
    v = F.col(vec_col).cast("array<double>")
    out = embeddings.select(F.col(id_col), v.alias("_v"))
    ma = F.array_max(F.transform(F.col("_v"), lambda x: F.abs(x)))
    out = out.withColumn("_ma", ma)
    mac = F.col("_ma")
    zero = F.lit(0).cast("long")
    # degenerate vectors (empty / all-null -> array_max NULL, or
    # all-zero) quantize to zeros; NULL elements are skipped in the
    # sums (coalesce in the fold) — both choices mirror DuckDB's
    # list_sum NULL-skipping so the oracle stays exact on any input
    degenerate = mac.isNull() | (mac == F.lit(0.0))
    qsum = F.when(degenerate, zero).otherwise(F.aggregate(
        F.transform(F.col("_v"),
                    lambda x: F.floor(x * lv / mac + 0.5).cast("long")),
        zero, lambda a, x: a + F.coalesce(x, zero)))
    err = F.when(degenerate, zero).otherwise(F.aggregate(
        F.transform(
            F.col("_v"),
            lambda x: F.floor(
                F.abs(x - F.floor(x * lv / mac + 0.5) * mac / lv)
                * 1_000_000_000.0 + 0.5).cast("long")),
        zero, lambda a, x: a + F.coalesce(x, zero)))
    return (out.select(
        F.col(id_col),
        F.size(F.col("_v")).cast("int").alias("n_dims"),
        F.floor(F.coalesce(mac, F.lit(0.0)) * 1_000_000_000.0 + 0.5)
        .cast("long").alias("maxabs_e9"),
        qsum.alias("qsum"),
        err.alias("err_e9_sum"))
        .orderBy(id_col))

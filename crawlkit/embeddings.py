"""Embedding similarity operators: cosine, brute-force ANN top-k,
hyperplane-LSH bucketing, and embedding near-duplicate pairs.

Scale design: the brute-force path is the correctness baseline (one
broadcast of the query vector, a narrow map, a top-k — no shuffle of
the embedding column beyond the final limit).  The scale path buckets
vectors by a P-bit random-hyperplane signature so candidate generation
joins only within buckets (the same shuffle shape as MinHash-LSH in
``dedupe.py``); multi-probe = also probing 1-bit-flipped signatures.

All arithmetic is double-precision and built-in (``zip_with`` +
``aggregate`` — JVM-side, codegen); hyperplane weights derive from
``md5i60`` so the DuckDB oracle reproduces signatures exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .dedupe import assert_block_sizes, spread


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    na, nb = F.sqrt(dot(a, a)), F.sqrt(dot(b, b))
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def ann_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k vs. the vector with id == query_id.

    The single query row is broadcast; the scan stays narrow (no
    shuffle of embeddings); top-k is a TakeOrderedAndProject.
    Deterministic tie-break on id.
    """
    q = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )
    return (
        spread(df.where(F.col(id_col) != query_id))
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 3).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_matrix(n_planes: int, n_dims: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplane weights in [-1, 1):
    w[p, d] = md5i60(f"{p},{d}") / 2^59 - 1.0.  md5-derived so the
    DuckDB oracle generates identical planes; the weights depend only
    on (plane, dim), so they are computed ONCE driver/worker-side —
    never per row (the per-row md5 recompute was planes×dims md5s per
    vector in interpreted HOF evaluation)."""
    w = np.empty((n_planes, n_dims), dtype=np.float64)
    for p in range(n_planes):
        for d in range(n_dims):
            h = int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:15], 16)
            w[p, d] = h / float(2**59) - 1.0
    return w


def lsh_signature_udf(n_planes: int = 8):
    """Arrow-vectorized P-bit sign signature (BIGINT bucket id).

    Bit-identical to the spec fold (and the DuckDB oracle twin): the
    products are float64(vec[d]) * w[p, d] and the per-plane dot is
    accumulated in SEQUENTIAL dim order (np.cumsum — a running sum),
    matching DuckDB's list_sum fold rounding exactly; the sign cut is
    then made on identical doubles.  Weight matrices are cached per
    vector length."""
    cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(T.LongType())
    def udf(vecs: pd.Series) -> pd.Series:
        bit = np.arange(n_planes, dtype=np.int64)

        def sig_of(v) -> int | None:
            if v is None:
                return None
            x = np.asarray(v, dtype=np.float64)
            w = cache.get(x.size)
            if w is None:
                w = cache[x.size] = hyperplane_matrix(n_planes, x.size)
            if x.size == 0:
                return 0
            dots = np.cumsum(w * x[None, :], axis=1)[:, -1]
            return int((((dots > 0).astype(np.int64)) << bit).sum())

        return vecs.map(sig_of)

    return udf


def lsh_signature(vec_col: Column, n_planes: int = 8) -> Column:
    """P-bit sign signature as a BIGINT bucket id (vectorized UDF)."""
    return lsh_signature_udf(n_planes)(vec_col)


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket histogram of the hyperplane-LSH signature — the partition
    layout of the scale-path ANN (candidates join within bucket)."""
    return (
        spread(df)
        .select(lsh_signature(F.col(vec_col), n_planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def ann_topk_lsh(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path ANN: probe only the query's bucket plus 1-bit-flipped
    neighbor buckets (multi-probe), then exact cosine within candidates.
    Approximate — recall depends on n_planes; baseline is ann_topk."""
    sig = spread(df).withColumn("bucket", lsh_signature(F.col(vec_col), n_planes))
    qrow = sig.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    probes = qrow.select(
        "qvec",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << p).cast("long"))
                    for p in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    return (
        sig.where(F.col(id_col) != query_id)
        .join(F.broadcast(probes), "bucket")
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 3).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dups(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int = 10_000,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) within a
    blocking key — the quadratic-within-block fallback.  Guarded: any
    block larger than ``max_block_rows`` raises before the O(n²) join
    can be scheduled (a single 10⁹-row block would be a 10¹⁸-pair
    join); at that size use :func:`lsh_signature` buckets as the
    blocking key instead."""
    assert_block_sizes(
        df, block_col, max_block_rows,
        hint="use lsh_signature(embedding) buckets as block_col",
    )
    base = spread(df).select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.blk").alias(block_col),
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 3).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )

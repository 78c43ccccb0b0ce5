"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Scale design (the point at 100 TB):

- **Exact**: groupBy on a 128-bit content hash — one shuffle keyed by
  the hash, map-side partial agg; survivors picked by deterministic
  ``min(doc_id)`` so the result is invariant under partitioning.
- **MinHash + LSH**: per-doc signature (K min-hashes over word
  shingles) computed JVM-side in one narrow pass; banding explodes each
  doc into B small (band_id, band_key) rows — the only shuffle is the
  self-join on band buckets, which touches candidate pairs only
  (O(docs·B) rows, never O(docs²)).  Exact Jaccard verification runs
  only on LSH candidates.  Mega-bucket skew (boilerplate pages sharing
  a band) is handled by AQE skew-join splitting; bucket size can be
  capped upstream with a count filter if a corpus has degenerate
  boilerplate.
- **SimHash**: 60-bit signature per doc, candidate pairs via equal
  signature (or banded sub-keys) — same shuffle shape as LSH.
- **n-gram Jaccard**: exact pairwise within a blocking key (here: same
  ``lang``) — the quadratic fallback, only for small blocks.

All hashing uses :func:`crawlkit.textops.md5i60` so the DuckDB oracle
reproduces every signature bit-for-bit (no engine-private hash in any
checked output).  Reference analog: the URL-level dedupe is
`src/db/model.ts:115-128`; content-level dedupe has no reference analog
and is part of the corpus-pipeline surface.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from .textops import md5i60, tokens


def _size_suffix_bytes(v: str) -> int:
    """Parse Spark size confs ('134217728b', '128m', '128mb', '1g')
    to bytes — two-letter suffixes checked before their one-letter
    prefixes so '128mb' doesn't strip only the 'b'."""
    v = v.strip().lower()
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("tb", 1 << 40), ("k", 1 << 10), ("m", 1 << 20),
                   ("g", 1 << 30), ("t", 1 << 40), ("b", 1)):
        if v.endswith(suf):
            return int(v[: -len(suf)]) * m
    return int(v)


_IN_MEMORY = "in_memory"
_UNKNOWN = "unknown"


def estimated_scan_splits(df: DataFrame) -> int | str:
    """Driver-side estimate of the file-scan partition count, without
    touching ``df.rdd`` (which would pin a non-AQE plan and can force
    upstream materialization on joined frames).  Mirrors Spark's public
    split math (``FilePartition.maxSplitBytes``): splitsize =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism)).

    Returns an int estimate for local file scans, ``_IN_MEMORY`` for
    sources with no input files (driver-built frames — tiny), or
    ``_UNKNOWN`` for remote/unstatable filesystems (don't guess)."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return _UNKNOWN
    if not files:
        return _IN_MEMORY
    sizes = []
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            return _UNKNOWN  # remote FS — let the scan decide
        try:
            sizes.append(os.path.getsize(p.path))
        except OSError:
            return _UNKNOWN
    conf = df.sparkSession.conf
    open_cost = _size_suffix_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    max_pb = _size_suffix_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    total = sum(s + open_cost for s in sizes)
    split = min(max_pb, max(open_cost, total // max(parallelism, 1)))
    return max(1, -(-total // max(split, 1)))


def spread(df: DataFrame) -> DataFrame:
    """Rebalance ONLY under-parallel inputs before expensive per-row
    compute.  Small parquet inputs arrive as one split (file <
    maxPartitionBytes), which would serialize hash/signature work onto
    a single core.  Inputs whose scans already have >= session
    parallelism splits (the cluster-scale case) pass through untouched
    — repartitioning a 100 TB scan would be a catastrophic shuffle —
    and so do scans whose size can't be estimated (remote filesystems):
    when in doubt, never add a shuffle.  Only driver-built in-memory
    frames (tiny by construction) repartition unconditionally."""
    target = df.sparkSession.sparkContext.defaultParallelism
    est = estimated_scan_splits(df)
    if est == _UNKNOWN:
        return df
    if est == _IN_MEMORY or est < target:
        return df.repartition(target)
    return df


def assert_block_sizes(
    df: DataFrame, block_col: str, max_block_rows: int, hint: str = ""
) -> None:
    """Guard for quadratic-within-block operators: fail fast (one cheap
    narrow count-agg, nothing wide materialized) if any block exceeds
    the cap, instead of scheduling an O(n²)-pair join.  A corpus where
    one language holds 10⁹ docs must route to the LSH path, never
    silently run block² pairs."""
    over = (
        df.groupBy(block_col)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_block_rows)
        .select(block_col, "n")
        .limit(3)
        .collect()
    )
    if over:
        desc = ", ".join(f"{r[0]!r}:{r[1]}" for r in over)
        raise ValueError(
            f"quadratic fallback refused: block(s) over {max_block_rows} "
            f"rows ({desc}); use the LSH scale path instead"
            + (f" — {hint}" if hint else "")
        )


# ---------------------------------------------------------------------------
# shingles

def shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), [] when < n tokens."""
    toks = tokens(c)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_udf(n: int = 3):
    """Arrow-vectorized twin of :func:`shingles` (first-occurrence
    distinct word n-grams).  Interpreted HOF lambdas re-evaluate the
    tokenizing split per element — Python-side generation is ~20×
    faster and set-identical, so every consumer (signatures, Jaccard)
    is unaffected."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def udf(texts: pd.Series) -> pd.Series:
        def sh_of(t):
            toks = t.split() if isinstance(t, str) else []
            if len(toks) < n:
                return []
            return list(dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ))

        return texts.map(sh_of)

    return udf


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two pre-distinct string arrays, as double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# exact dedupe

def exact_dedupe(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per exact content hash (md5)."""
    keyed = df.withColumn("content_md5", F.md5(F.col(text_col)))
    survivors = keyed.groupBy("content_md5").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )
    return survivors


# ---------------------------------------------------------------------------
# MinHash + LSH

MERSENNE31 = 2147483647  # 2^31 - 1

# Boilerplate mega-bucket cap; the DuckDB oracle twin in queries.py is
# generated from THIS constant so engine and oracle always agree.
DEFAULT_MAX_BUCKET_ROWS = 1000


def shingle_hashes(shingle_col: Column) -> Column:
    """31-bit base hash per shingle: ONE md5 each; the K permutations
    derive from this by universal hashing (no repeated md5)."""
    return F.transform(
        shingle_col, lambda x: md5i60(x).bitwiseAND(F.lit(MERSENNE31))
    )


def minhash_signature(hash_col: Column, k: int = 16) -> Column:
    """K-element MinHash signature over pre-hashed 31-bit shingles:
    sig[s] = min over h of (a_s * h + b_s) mod (2^31 - 1) with
    a_s = (1103515245*(s+1) + 12345) mod p, b_s = (69069*(s+1) + 1)
    mod p.  All intermediates < 2^62 — no 64-bit overflow in either
    engine (DuckDB raises on BIGINT overflow; Spark silently wraps, so
    staying in range is a correctness requirement, not just parity).
    Empty shingle set → null mins (filter upstream)."""
    def perm_min(s: Column) -> Column:
        a = (F.lit(1103515245).cast("long") * (s + 1) + 12345) % MERSENNE31
        b = (F.lit(69069).cast("long") * (s + 1) + 1) % MERSENNE31
        return F.array_min(
            F.transform(hash_col, lambda h: (a * h + b) % MERSENNE31)
        )

    return F.transform(F.sequence(F.lit(0), F.lit(k - 1)), perm_min)


def band_keys_udf(k: int, bands: int, rows: int):
    """Arrow-vectorized twin of ``lsh_bands(minhash_signature(
    shingle_hashes(sh)))``: one hashlib-md5 per shingle, numpy for the
    K universal-hash permutations.  Bit-identical to the column-expr
    path (same constants, same mod arithmetic — products stay < 2^62,
    inside int64) but ~10× faster than interpreted HOF lambdas."""
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("band_id", T.IntegerType(), False),
                T.StructField("band_key", T.StringType(), False),
            ]
        )
    )
    s = np.arange(1, k + 1, dtype=np.int64)
    a = (1103515245 * s + 12345) % MERSENNE31
    b = (69069 * s + 1) % MERSENNE31

    def bands_of(sh) -> list:
        hs = np.array(
            [
                int(hashlib.md5(x.encode()).hexdigest()[:15], 16) & MERSENNE31
                for x in sh
            ],
            dtype=np.int64,
        )
        sig = ((a[:, None] * hs[None, :] + b[:, None]) % MERSENNE31).min(axis=1)
        return [
            (
                bi,
                hashlib.md5(
                    ",".join(str(v) for v in sig[bi * rows : (bi + 1) * rows]).encode()
                ).hexdigest(),
            )
            for bi in range(bands)
        ]

    @F.pandas_udf(schema)
    def udf(sh_series: pd.Series) -> pd.Series:
        return sh_series.map(bands_of)

    return udf


def lsh_bands(sig_col: Column, bands: int, rows: int) -> Column:
    """Array of (band_id, band_key) structs; band_key = md5 of the
    comma-joined signature slice for that band."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig_col, b * rows + 1, rows),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("band_key"),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidate generation + exact-Jaccard
    verification.  Output: (id_a, id_b, jacc) with id_a < id_b and
    jacc >= threshold (rounded to 4 so the oracle compares exactly).

    Degenerate boilerplate buckets (a band_key shared by more than
    ``max_bucket_rows`` docs — identical nav chrome, parked domains)
    are dropped before pair generation: a 10⁶-doc bucket would emit
    5·10¹¹ candidate pairs from one band.  True near-dups inside a
    dropped bucket usually still pair via their other B-1 bands; the
    cap is mirrored in the DuckDB oracle so the check stays exact.
    """
    rows = k // bands
    docs = (
        spread(df)
        .select(F.col(id_col).alias("did"),
                shingles_udf(shingle_n)(F.col(text_col)).alias("sh"))
        .where(F.size("sh") > 0)
        # Referenced 3x in the DAG (bands, sh_a, sh_b): materialize
        # once.  localCheckpoint (not persist): the block is freed by
        # the ContextCleaner when the plan is unreferenced, so repeated
        # operator calls in one session can't accumulate cache entries.
        .localCheckpoint(eager=False)
    )
    # Narrow band rows only — the expensive md5-per-shingle pass runs
    # once per doc; the self-join shuffles (did, band_id, band_key)
    # rows, never the shingle arrays.
    band_rows = (
        docs.select(
            "did",
            F.explode(band_keys_udf(k, bands, rows)(F.col("sh"))).alias("b"),
        )
        .select("did", F.col("b.band_id").alias("band_id"),
                F.col("b.band_key").alias("band_key"))
    )
    # Bucket-grouped pair generation in place of the former band-rows
    # self-join (two sorted shuffles of the same rows).  The mega-bucket
    # cap is applied with a WINDOW COUNT *before* any collect_list, so
    # a degenerate 10⁹-row boilerplate bucket is filtered as narrow
    # rows and never materializes an aggregation buffer; the follow-up
    # groupBy reuses the window's hash partitioning (no extra
    # exchange), keeping this one effective shuffle.
    bucket_w = Window.partitionBy("band_id", "band_key")
    buckets = (
        band_rows.withColumn("bn", F.count("*").over(bucket_w))
        .where((F.col("bn") >= 2) & (F.col("bn") <= max_bucket_rows))
        .groupBy("band_id", "band_key")
        .agg(F.collect_list("did").alias("dids"))
    )
    cand = (
        buckets.select(F.explode("dids").alias("id_a"), "dids")
        .select("id_a", F.explode("dids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = docs.select(F.col("did").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("did").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jacc", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .where(F.col("jacc") >= threshold)
        .select("id_a", "id_b", "jacc")
    )


# ---------------------------------------------------------------------------
# SimHash

# 60-bit simhash over the distinct-token-hash array column {col}: for
# each bit, majority vote (+1/-1) across token hashes.  Pure Spark SQL
# so it stays inside whole-stage codegen; DuckDB twin in queries.py.
_SIMHASH_EXPR = """
aggregate(
  sequence(0, 59),
  cast(0 as bigint),
  (acc, b) -> acc + if(
    aggregate({col}, cast(0 as bigint),
              (a, h) -> a + if((shiftright(h, b) & 1) = 1,
                               cast(1 as bigint), cast(-1 as bigint))) > 0,
    shiftleft(cast(1 as bigint), b),
    cast(0 as bigint)))
"""


def simhash_udf():
    """Arrow-vectorized 60-bit SimHash: distinct token hashes via
    hashlib-md5 (identical to ``md5i60``), bit-majority via numpy.
    Integer math — bit-identical to ``_SIMHASH_EXPR`` / the SQL twin."""
    bit_idx = np.arange(60, dtype=np.int64)

    @F.pandas_udf(T.LongType())
    def udf(texts: pd.Series) -> pd.Series:
        def sim_of(t):
            toks = t.split() if isinstance(t, str) else []
            if not toks:
                return None
            hs = np.fromiter(
                (
                    int(hashlib.md5(x.encode()).hexdigest()[:15], 16)
                    for x in dict.fromkeys(toks)
                ),
                dtype=np.int64,
            )
            votes = (2 * ((hs[:, None] >> bit_idx) & 1) - 1).sum(axis=0)
            return int(((votes > 0).astype(np.int64) << bit_idx).sum())

        return texts.map(sim_of)

    return udf


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document over distinct token hashes."""
    return (
        spread(df)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard within a blocking key (quadratic fallback)

def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.12,
    max_block_rows: int = 10_000,
) -> DataFrame:
    """All pairs within a block with shingle-Jaccard >= threshold.
    Only safe when blocks are small — guarded by ``max_block_rows``
    (raises before the O(n²) join is scheduled); the scale path is
    :func:`minhash_lsh_pairs`."""
    assert_block_sizes(df, block_col, max_block_rows,
                       hint="use minhash_lsh_pairs for large corpora")
    base = spread(df).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("did"),
        shingles_udf(shingle_n)(F.col(text_col)).alias("sh"),
    ).where(F.size("sh") > 0).localCheckpoint(eager=False)
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.did") < F.col("b.did")))
        .select(
            F.col("a.blk").alias(block_col),
            F.col("a.did").alias("id_a"),
            F.col("b.did").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 4).alias("jacc"),
        )
        .where(F.col("jacc") >= threshold)
    )

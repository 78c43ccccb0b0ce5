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

from pyspark.sql import Column, DataFrame, functions as F

from .textops import md5i60, tokens

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

def minhash_signature(shingle_col: Column, k: int = 16) -> Column:
    """K-element MinHash signature: sig[s] = min over shingles of
    md5i60(s || ':' || shingle).  Empty shingle set → null mins (filter
    upstream)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s: F.array_min(
            F.transform(
                shingle_col,
                lambda x: md5i60(F.concat(s.cast("string"), F.lit(":"), x)),
            )
        ),
    )


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
) -> DataFrame:
    """Near-duplicate pairs: LSH candidate generation + exact-Jaccard
    verification.  Output: (id_a, id_b, jacc) with id_a < id_b and
    jacc >= threshold (rounded to 4 so the oracle compares exactly).
    """
    rows = k // bands
    base = (
        df.select(F.col(id_col).alias("did"), F.col(text_col).alias("t"))
        .withColumn("sh", shingles(F.col("t"), shingle_n))
        .where(F.size("sh") > 0)
        .withColumn("bands", lsh_bands(minhash_signature(F.col("sh"), k), bands, rows))
        .select("did", "sh", F.explode("bands").alias("b"))
        .select("did", "sh", F.col("b.band_id").alias("band_id"),
                F.col("b.band_key").alias("band_key"))
    )
    left = base.alias("l")
    right = base.select("did", "band_id", "band_key").alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .select(F.col("l.did").alias("id_a"), F.col("r.did").alias("id_b"),
                F.col("l.sh").alias("sh_a"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_b = df.select(F.col(id_col).alias("id_b"),
                     shingles(F.col(text_col), shingle_n).alias("sh_b"))
    return (
        cand.join(sh_b, "id_b")
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


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document over distinct token hashes."""
    return (
        df.select(
            F.col(id_col),
            F.array_distinct(F.transform(tokens(F.col(text_col)), md5i60)).alias("th"),
        )
        .where(F.size("th") > 0)
        .withColumn("simhash", F.expr(_SIMHASH_EXPR.format(col="th")))
        .select(id_col, "simhash")
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
) -> DataFrame:
    """All pairs within a block with shingle-Jaccard >= threshold.
    Only safe when blocks are small; the scale path is
    :func:`minhash_lsh_pairs`."""
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("did"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    ).where(F.size("sh") > 0)
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

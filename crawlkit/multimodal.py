"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batching, partitioning, UDF
signatures) is real and tested; the actual codec step is stubbed behind
``decode_image_stub`` because image/audio libraries are not in this
container — swap in PIL/librosa per modality by replacing that one
function.  Batch shape: one Arrow record batch in, one out; the binary
column never crosses a shuffle (features are extracted before any
groupBy/join).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode. REPLACE with a real codec (e.g. PIL)
    where available; raise NotImplementedError for unsupported types.

    The fake derives metadata purely from the byte length so tests and
    the DuckDB oracle can verify the full pipeline deterministically.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "format": "png" if n % 2 == 0 else "jpeg",
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
    }


def as_media(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text table: payload = utf-8
    bytes of the text (a deterministic stand-in for image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                    "format": feats.map(lambda f: f["format"]),
                    "width": feats.map(lambda f: f["width"]),
                    "height": feats.map(lambda f: f["height"]),
                }
            )

    from .dedupe import spread

    return spread(media).mapInPandas(batches, FEATURES_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The codec is a real pure-Python image *header* parser (no image library
needed for format/width/height): PNG IHDR, JPEG SOFn marker scan, and
the GIF logical screen descriptor.  Pixel decode (which would need
PIL/libjpeg) is out of scope for this container and is the one step a
deployment would swap in.  Batch shape: one Arrow record batch in, one
out; the binary column never crosses a shuffle (features are extracted
before any groupBy/join).

``as_media`` doubles as the deterministic synthetic-payload generator:
it prepends a REAL image header (valid PNG signature+IHDR+CRC, JFIF
APP0+SOF0, or GIF89a descriptor) whose planted dimensions derive from
``doc_id`` — so the DuckDB oracle predicts width/height arithmetically
while the Spark path must actually parse the bytes to recover them.
"""

from __future__ import annotations

import struct
import zlib
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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Fixed header sizes emitted by the synthetic generator (the DuckDB
# oracle adds these constants to octet_length(text) to predict n_bytes).
PNG_HEADER_LEN = 33   # 8 signature + 4 len + 4 'IHDR' + 13 data + 4 crc
JPEG_HEADER_LEN = 39  # 2 SOI + 20 APP0/JFIF + 17 SOF0 (3 components)
GIF_HEADER_LEN = 13   # 6 'GIF89a' + 7 logical screen descriptor


def png_header(width: int, height: int) -> bytes:
    """Valid PNG signature + IHDR chunk (8-bit RGB) with a real CRC."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    return _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", crc)


def jpeg_header(width: int, height: int) -> bytes:
    """SOI + JFIF APP0 + baseline SOF0 (3 components)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return b"\xff\xd8" + app0 + sof0


def gif_header(width: int, height: int) -> bytes:
    """GIF89a signature + logical screen descriptor (little-endian)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + bytes([0x70, 0, 0])


# JPEG SOFn markers carrying frame dimensions: C0-CF except C4 (DHT),
# C8 (JPG extension), CC (DAC).
_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Marker-segment scan for the first SOFn frame header."""
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:  # desynced (not at a marker) — bail out
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length field
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seglen = struct.unpack_from(">H", b, i + 2)[0]
        if seglen < 2 or i + 2 + seglen > n:
            return None
        if marker in _SOF_MARKERS:
            if seglen < 7:
                return None
            height, width = struct.unpack_from(">HH", b, i + 5)
            return width, height
        i += 2 + seglen
    return None


def decode_image(payload: bytes) -> dict:
    """Sniff format and parse width/height from real image headers.

    PNG: IHDR width/height (big-endian u32 at bytes 16-24, after
    verifying the 8-byte signature and the IHDR chunk tag).  JPEG:
    marker-segment scan to the first SOFn (height then width,
    big-endian u16).  GIF: logical screen descriptor (little-endian
    u16 at bytes 6-10).  Unrecognized or truncated payloads yield
    ``format='unknown'`` with null dimensions rather than raising, so
    one corrupt blob cannot kill a whole Spark task (same per-row
    error contract as the converter registry).
    """
    n = len(payload)
    out = {"n_bytes": n, "format": "unknown", "width": None, "height": None}
    if n >= 24 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", payload, 16)
        out.update(format="png", width=w, height=h)
    elif n >= 4 and payload[:2] == b"\xff\xd8":
        out["format"] = "jpeg"
        dims = _jpeg_dims(payload)
        if dims is not None:
            out.update(width=dims[0], height=dims[1])
    elif n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        out.update(format="gif", width=w, height=h)
    return out


def planted_dims(media_id: int) -> tuple[str, int, int]:
    """Deterministic (format, width, height) planted by ``as_media`` —
    the arithmetic the DuckDB oracle replicates."""
    fmt = ("png", "jpeg", "gif")[media_id % 3]
    return fmt, media_id % 640 + 1, (media_id * 7) % 480 + 1


def as_media(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text table: payload = a REAL
    image header (dims planted from the id) + the utf-8 text bytes as
    the opaque body.  Vectorized header construction (Arrow batch in,
    binary column out)."""

    @F.pandas_udf(T.BinaryType())
    def payload_udf(ids: pd.Series, texts: pd.Series) -> pd.Series:
        builders = {"png": png_header, "jpeg": jpeg_header, "gif": gif_header}

        def build(row) -> bytes:
            mid, text = row
            fmt, w, h = planted_dims(int(mid))
            return builders[fmt](w, h) + str(text).encode("utf-8")

        return pd.Series(map(build, zip(ids, texts)))

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload_udf(F.col(id_col), F.col(text_col)).alias("payload"),
        F.lit("image").alias("media_type"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(decode_image)
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

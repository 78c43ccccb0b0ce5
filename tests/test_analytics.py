"""Tests for the corpus-pipeline operators (textops / dedupe /
embeddings / multimodal) and the driver-contract oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# ---------------------------------------------------------------------------
# textops

def test_langid_text_pure():
    from crawlkit.textops import langid_text

    assert langid_text("the quick fox and the dog is here") == "eng"
    assert langid_text("der hund und die katze ist nicht da") == "deu"
    assert langid_text("xyzzy plugh") == "und"
    assert langid_text("") == "und"


def test_quality_and_fingerprint(spark):
    from crawlkit import textops

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat today ok"),
         (2, "the cat sat on the mat today never"),
         (3, "completely different words entirely here now"),
         (4, "")],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id",
        textops.token_count("text").alias("n"),
        textops.quality_score("text").alias("q"),
        textops.fingerprint("text", 5).alias("fp"),
    ).toPandas().set_index("doc_id")
    assert out.loc[4, "n"] == 0
    assert 0.0 <= out.loc[1, "q"] <= 1.0
    # docs 1 and 2 share their first-5-token prefix → same fingerprint
    assert out.loc[1, "fp"] == out.loc[2, "fp"]
    assert out.loc[1, "fp"] != out.loc[3, "fp"]


# ---------------------------------------------------------------------------
# dedupe

@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("kappa", "lambda", 1)
    rows = [(0, base, "en"), (1, base, "en"), (2, near, "en"),
            (3, "one two three four five six seven eight nine ten", "en"),
            (4, "uno dos tres cuatro cinco seis siete ocho nueve diez", "de")]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedupe(spark, dup_docs):
    from crawlkit.dedupe import exact_dedupe

    out = exact_dedupe(dup_docs).toPandas()
    assert len(out) == 4  # 0 and 1 collapse
    grp = out[out.n_copies > 1]
    assert len(grp) == 1 and grp.iloc[0]["doc_id"] == 0


def test_minhash_finds_planted_dups(spark, dup_docs):
    from crawlkit.dedupe import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(dup_docs, threshold=0.5).toPandas()
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert (0, 1) in got  # identical
    assert (0, 2) in got and (1, 2) in got  # near-dup
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in got)
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert float(exact.jacc.iloc[0]) == 1.0


def test_minhash_partition_invariance(spark, dup_docs):
    from crawlkit.dedupe import minhash_lsh_pairs

    def run():
        return sorted(
            map(tuple, minhash_lsh_pairs(dup_docs, threshold=0.5)
                .toPandas().values.tolist())
        )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = run()
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        many = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert one == many


def test_simhash_properties(spark, dup_docs):
    from crawlkit.dedupe import simhash

    out = simhash(dup_docs).toPandas().set_index("doc_id")["simhash"]
    assert out.loc[0] == out.loc[1]  # identical text → identical signature
    ham = bin(out.loc[0] ^ out.loc[2]).count("1")
    assert ham <= 12  # near-dup → few differing bits
    far = bin(out.loc[0] ^ out.loc[3]).count("1")
    assert far > ham


def test_ngram_jaccard_pairs(spark, dup_docs):
    from crawlkit.dedupe import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(dup_docs, threshold=0.5).toPandas()
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_size_suffix_parsing():
    from crawlkit.dedupe import _size_suffix_bytes

    assert _size_suffix_bytes("134217728b") == 134217728
    assert _size_suffix_bytes("128m") == 128 << 20
    assert _size_suffix_bytes("128mb") == 128 << 20  # two-letter suffix
    assert _size_suffix_bytes("4kb") == 4096
    assert _size_suffix_bytes("1g") == 1 << 30
    assert _size_suffix_bytes(" 42 ") == 42


def test_quadratic_fallback_guard_raises(spark, dup_docs):
    """A block over the cap must error BEFORE the O(n²) join can run
    (VERDICT r1: unguarded quadratic fallbacks are scale-killers)."""
    from crawlkit.dedupe import ngram_jaccard_pairs

    with pytest.raises(ValueError, match="quadratic fallback refused"):
        ngram_jaccard_pairs(dup_docs, threshold=0.5, max_block_rows=2)

    big = spark.range(10_050).selectExpr(
        "id AS doc_id", "'en' AS lang",
        "concat('tok', id, ' filler words for shingles here') AS text",
    )
    with pytest.raises(ValueError, match="quadratic fallback refused"):
        ngram_jaccard_pairs(big, threshold=0.5)  # default cap 10_000


def test_embedding_near_dups_guard_raises(spark, vecs):
    from crawlkit.embeddings import embedding_near_dups

    with pytest.raises(ValueError, match="quadratic fallback refused"):
        embedding_near_dups(vecs, threshold=0.9, max_block_rows=5)


def test_minhash_mega_bucket_cap(spark):
    """Boilerplate mega-buckets are dropped from pair generation when
    they exceed max_bucket_rows; normal corpora are unaffected."""
    from crawlkit.dedupe import minhash_lsh_pairs

    same = "copy of the very same boilerplate nav chrome text " * 3
    df = spark.createDataFrame(
        [(i, same) for i in range(6)], ["doc_id", "text"]
    )
    capped = minhash_lsh_pairs(df, threshold=0.5, max_bucket_rows=5).toPandas()
    assert len(capped) == 0  # every band bucket holds all 6 docs > cap
    full = minhash_lsh_pairs(df, threshold=0.5).toPandas()
    assert len(full) == 15  # all C(6,2) identical pairs survive default cap


# ---------------------------------------------------------------------------
# language dimension

REF_LANG_JSON = "/root/reference/src/languages.json"


@pytest.mark.skipif(not __import__("os").path.exists(REF_LANG_JSON),
                    reason="reference table not present")
def test_langdim_matches_reference_linear_scan():
    """Every name form of every reference row must normalize to the
    same iso639-3 the reference's lang639_3 returns (linear scan,
    first match in array order wins — src/lang.ts:3-17)."""
    import json

    from crawlkit.langdim import form_map, lang639_3

    entries = json.load(open(REF_LANG_JSON))
    assert len(entries) == 158

    def ref_lang639_3(lang: str) -> str:  # the reference, re-read
        l = lang.lower()
        for iso1, iso3, english, native in entries:
            if l in (iso1, iso3, english.lower(), native.lower()):
                return iso3
        return ""

    fm = form_map()
    for iso1, iso3, english, native in entries:
        for form in (iso1, iso3, english, english.upper(), native):
            assert lang639_3(form) == ref_lang639_3(form), form
    # unmatched input behaves like the reference ('' not a hit)
    assert lang639_3("not-a-language") == ""
    assert len(fm) >= 600


def test_langdim_rtl_matches_reference():
    from crawlkit.langdim import RTL_CODES_3, is_rtl

    # src/lang.ts:19-27 verbatim membership
    assert set(RTL_CODES_3) == {"ara", "heb", "fas", "urd",
                                "kas", "pus", "uig", "snd"}


def test_normalize_lang_spark(spark):
    from crawlkit.langdim import normalize_lang

    df = spark.createDataFrame(
        [(1, "en"), (2, "German"), (3, "Português"), (4, "zho"),
         (5, "xx-nope"), (6, " ARABIC ")],
        ["doc_id", "lang"],
    )
    out = {r.doc_id: r.lang3 for r in normalize_lang(df).collect()}
    assert out == {1: "eng", 2: "deu", 3: "por", 4: "zho",
                   5: None, 6: "ara"}


# ---------------------------------------------------------------------------
# embeddings

@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    base = rng.normal(size=8)
    for i in range(40):
        if i < 3:  # a tight cluster around `base`
            v = base + rng.normal(scale=0.01, size=8)
        else:
            v = rng.normal(size=8)
        rows.append((i, [float(x) for x in v], i % 2))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_ann_topk_exact(spark, vecs):
    from crawlkit.embeddings import ann_topk

    out = ann_topk(vecs, query_id=0, k=5).toPandas()
    assert list(out.vec_id[:2]) == [1, 2]  # cluster mates rank first
    assert out.sim.iloc[0] > 0.99
    assert list(out.sim) == sorted(out.sim, reverse=True)


def test_ann_lsh_recall_of_near_dups(spark, vecs):
    from crawlkit.embeddings import ann_topk_lsh

    out = ann_topk_lsh(vecs, query_id=0, k=5, n_planes=8).toPandas()
    # near-identical vectors share the bucket → multi-probe must find them
    assert {1, 2} <= set(out.vec_id)


def test_lsh_bucket_histogram_total(spark, vecs):
    from crawlkit.embeddings import lsh_buckets

    out = lsh_buckets(vecs, n_planes=4).toPandas()
    assert out.n_vectors.sum() == 40


# ---------------------------------------------------------------------------
# multimodal

def test_decode_image_real_headers():
    """decode_image parses genuine PNG/JPEG/GIF bytes, not planted ids."""
    import zlib
    from crawlkit.multimodal import decode_image, gif_header, jpeg_header

    # A complete, valid 1x1 white PNG (signature/IHDR/IDAT/IEND, real CRCs).
    def chunk(tag, data):
        import struct
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    import struct
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00\xff\xff\xff")
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
    got = decode_image(png)
    assert (got["format"], got["width"], got["height"]) == ("png", 1, 1)

    # Baseline JPEG with APP0 before SOF0, and a progressive SOF2 variant.
    jp = jpeg_header(123, 45) + b"\xff\xda\x00\x02" + b"entropy" + b"\xff\xd9"
    got = decode_image(jp)
    assert (got["format"], got["width"], got["height"]) == ("jpeg", 123, 45)
    sof2 = bytearray(jpeg_header(320, 240))
    sof2[sof2.index(b"\xff\xc0") + 1] = 0xC2
    got = decode_image(bytes(sof2))
    assert (got["format"], got["width"], got["height"]) == ("jpeg", 320, 240)

    got = decode_image(gif_header(640, 480) + b"tail")
    assert (got["format"], got["width"], got["height"]) == ("gif", 640, 480)

    # Malformed payloads degrade per-row instead of raising.
    for bad in (b"", b"not an image", b"\xff\xd8\xff", png[:20]):
        got = decode_image(bad)
        assert got["n_bytes"] == len(bad)
        if got["format"] in ("unknown", "jpeg"):
            assert got["width"] is None and got["height"] is None


def test_multimodal_plumbing_roundtrip(spark):
    """as_media plants real headers; extract_features must recover the
    planted dims by parsing the bytes through the Arrow pipeline."""
    from crawlkit.multimodal import as_media, extract_features, planted_dims

    rows = [(i, "x" * (i + 3)) for i in range(9)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = extract_features(as_media(df)).toPandas().set_index("media_id")
    hdr_len = {"png": 33, "jpeg": 39, "gif": 13}
    for mid, text in rows:
        fmt, w, h = planted_dims(mid)
        assert out.loc[mid, "format"] == fmt
        assert out.loc[mid, "width"] == w
        assert out.loc[mid, "height"] == h
        assert out.loc[mid, "n_bytes"] == hdr_len[fmt] + len(text.encode())


# ---------------------------------------------------------------------------
# oracle parity (driver-gate replica on a representative subset)

PARITY_SUBSET = [
    "agg_pricing_summary",
    "j8_copartition_join",
    "w2_topk_per_group",
    "f_json_extract",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_lsh_buckets",
    "multimodal_features",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", PARITY_SUBSET)
def test_oracle_parity(spark, name):
    from crawlkit.queries import REGISTRY

    fn, sql = REGISTRY[name]
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{SF}/{tname}.parquet')"
        )
    s = _norm(fn(spark, SF).toPandas())
    d = _norm(con.execute(sql).df())
    assert len(s) == len(d)
    assert list(s.columns) == list(d.columns)
    pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)

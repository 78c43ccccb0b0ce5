"""Cuckoo-filter URL-seen tests: structure properties, duck-type parity
with the bloom, crawl-engine equivalence under ``seen_filter="cuckoo"``,
and in-place eviction (`urlseen.evicted_seen_partitions`).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawlkit import schema
from crawlkit.cuckoo import SLOTS_PER_BUCKET, CuckooPartition, buckets_for
from crawlkit.storage import Warehouse

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


# ---------------------------------------------------------------- unit


@settings(max_examples=40, deadline=None)
@given(items=st.lists(i64, max_size=300, unique=True),
       probes=st.lists(i64, max_size=100))
def test_cuckoo_never_false_negative(items, probes):
    cp = CuckooPartition.sized_for(len(items))
    cp.add(np.array(items, dtype=np.int64))
    if items:
        assert cp.might_contain(np.array(items, dtype=np.int64)).all()
    # probes must not crash and return one verdict per probe
    got = cp.might_contain(np.array(probes, dtype=np.int64))
    assert len(got) == len(probes)


@settings(max_examples=25, deadline=None)
@given(items=st.lists(i64, min_size=1, max_size=300, unique=True),
       data=st.data())
def test_cuckoo_delete_then_no_false_negative_for_survivors(items, data):
    n_del = data.draw(st.integers(min_value=0, max_value=len(items)))
    arr = np.array(items, dtype=np.int64)
    cp = CuckooPartition.sized_for(len(arr))
    cp.add(arr)
    removed = cp.delete(arr[:n_del])
    assert removed.all()  # every inserted item's copy is found
    survivors = arr[n_del:]
    if len(survivors):
        assert cp.might_contain(survivors).all()
    # deleted items may still collide-positive, but a full wipe empties
    cp.delete(survivors)
    assert cp.n_items == 0
    assert not cp.slots.any()


def test_cuckoo_roundtrip_and_dispatch():
    from crawlkit.bloom import BloomPartition
    from crawlkit.urlseen import filter_from_bytes

    rng = np.random.default_rng(7)
    arr = rng.integers(-2**63, 2**63 - 1, size=10_000, dtype=np.int64)
    cp = CuckooPartition.sized_for(len(arr))
    cp.add(arr)
    back = filter_from_bytes(cp.to_bytes())
    assert isinstance(back, CuckooPartition)
    assert back.n_buckets == cp.n_buckets and back.n_items == cp.n_items
    assert (back.slots == cp.slots).all()

    bp = BloomPartition.sized_for(100)
    bp.add(arr[:100])
    assert isinstance(filter_from_bytes(bp.to_bytes()), BloomPartition)


def test_cuckoo_high_load_insert_and_readd_after_delete():
    """Fill to the design load, delete half, re-add — exercises the
    front-contiguity compaction `_bulk_place` depends on."""
    rng = np.random.default_rng(11)
    n_buckets = 1024
    n = int(n_buckets * SLOTS_PER_BUCKET * 0.80)
    arr = np.unique(rng.integers(-2**63, 2**63 - 1, size=n, dtype=np.int64))
    cp = CuckooPartition(n_buckets)
    cp.add(arr)
    assert cp.might_contain(arr).all()
    half = len(arr) // 2
    assert cp.delete(arr[:half]).all()
    cp.add(arr[:half])
    assert cp.might_contain(arr).all()
    assert cp.n_items == len(arr)


def test_cuckoo_overflow_raises():
    cp = CuckooPartition(256)  # capacity 1024 slots
    rng = np.random.default_rng(3)
    too_many = np.unique(
        rng.integers(-2**63, 2**63 - 1, size=1200, dtype=np.int64)
    )
    with pytest.raises(OverflowError):
        cp.add(too_many)


def test_buckets_for_is_pow2_and_fits():
    for n in (1, 100, 4096, 1_000_000):
        b = buckets_for(n)
        assert b & (b - 1) == 0
        assert b * SLOTS_PER_BUCKET * 0.85 >= n


# ------------------------------------------------------- engine parity


def _seen_set(spark, wh_dir):
    wh = Warehouse(wh_dir)
    seen = wh.read(spark, "urlseen_exact", schema.URLSEEN_EXACT_SCHEMA)
    return {(r["round"], r["url_canon"])
            for r in seen.select("round", "url_canon").collect()}


def test_cuckoo_crawl_matches_bloom_crawl(spark, ref_crawl, cuckoo_crawl):
    """Same corpus, same seeds: the per-round URL-seen set is identical
    whichever filter structure backs the probe (exact-confirm keeps the
    set exact; the filter only prices the probe)."""
    bloom_seen = _seen_set(spark, ref_crawl[2])
    cuckoo_seen = _seen_set(spark, cuckoo_crawl[2])
    assert bloom_seen == cuckoo_seen
    assert len(cuckoo_seen) > 0


def test_cuckoo_crawl_persists_cuckoo_payloads(spark, cuckoo_crawl):
    wh = Warehouse(cuckoo_crawl[2])
    payloads = [bytes(r["bloom_bytes"]) for r in
                wh.read(spark, "urlseen_bloom", schema.URLSEEN_BLOOM_SCHEMA)
                .select("bloom_bytes").collect()]
    assert payloads
    assert all(CuckooPartition.is_cuckoo_payload(p) for p in payloads)


# ------------------------------------------------------------ eviction


def test_evicted_seen_partitions_inplace(spark):
    """Evicted hashes probe as unseen again; survivors stay seen; the
    cuckoo path ships no exact rows."""
    from crawlkit.urlseen import (evicted_seen_partitions, latest_blooms,
                                  probe_unseen, updated_bloom_partitions)

    n_part = 8
    hashes = list(range(-500, 500, 3))
    df = spark.createDataFrame([(h,) for h in hashes], "url_hash long")
    empty_state = spark.createDataFrame([], schema.URLSEEN_BLOOM_SCHEMA)
    empty_exact = df.limit(0)

    state = updated_bloom_partitions(
        df, empty_state, empty_exact, n_part, round_no=1, kind="cuckoo"
    ).persist()
    assert state.count() > 0

    evict = df.where(F.col("url_hash") < 0)
    new_state = latest_blooms(
        state.unionByName(
            evicted_seen_partitions(evict, state, empty_exact, n_part,
                                    round_no=2, kind="cuckoo")
        )
    ).persist()

    # exact set after eviction = survivors only
    survivors = df.where(F.col("url_hash") >= 0)
    unseen = probe_unseen(df, new_state, survivors, n_part)
    got = {r["url_hash"] for r in unseen.collect()}
    want = {h for h in hashes if h < 0}
    assert got == want
    state.unpersist()
    new_state.unpersist()


def test_evicted_seen_partitions_bloom_rebuild(spark):
    """kind='bloom' eviction rebuilds from exact-minus-evicted and the
    result has no false negatives for survivors."""
    from crawlkit.urlseen import (evicted_seen_partitions, latest_blooms,
                                  probe_unseen, updated_bloom_partitions)

    n_part = 8
    hashes = list(range(0, 3000, 7))
    df = spark.createDataFrame([(h,) for h in hashes], "url_hash long")
    empty_state = spark.createDataFrame([], schema.URLSEEN_BLOOM_SCHEMA)

    state = updated_bloom_partitions(
        df, empty_state, df.limit(0), n_part, round_no=1, kind="bloom"
    ).persist()
    evict = df.where(F.col("url_hash") % 2 == 0)
    survivors = df.where(F.col("url_hash") % 2 == 1)
    new_state = latest_blooms(
        state.unionByName(
            evicted_seen_partitions(evict, state, df, n_part,
                                    round_no=2, kind="bloom")
        )
    ).persist()
    unseen = probe_unseen(df, new_state, survivors, n_part)
    got = {r["url_hash"] for r in unseen.collect()}
    want = {h for h in hashes if h % 2 == 0}
    assert got == want
    state.unpersist()
    new_state.unpersist()

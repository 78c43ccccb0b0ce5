"""URL-seen set: partitioned bloom pre-filter + exact confirm (J2).

Replaces the reference's LWT row lock + freshness probe
(``/root/reference/src/db/model.ts:115-128,161-191``) with batch
semantics (SURVEY.md §4.2):

* ``urlseen_bloom``: P bloom partitions (P **must be a power of two**
  so the JVM-side ``pmod(xxhash64, P)`` equals the numpy unsigned mod),
  each a byte-serialized numpy bit array.  Latest row per partition_id
  wins (state is replaced per round for touched partitions only).
* ``urlseen_exact``: the exact hash set, used to confirm bloom hits so
  the final URL-seen set is *exactly* the reference's — bloom false
  positives cost an extra join probe, never a lost URL.

Scale shape: candidates are co-grouped with their bloom partition
(``cogroup.applyInPandas`` — only the touched partitions move), the
bloom knocks out the ~99% already-seen mass, and only surviving hits
pay the exact anti-join.  Bloom partitions rebuild from the exact set
only when over-full (amortized O(1) per insert).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .bloom import BloomPartition, optimal_bits, optimal_hashes
from .schema import URLSEEN_BLOOM_SCHEMA

MIN_CAPACITY = 4096
FILL_REBUILD_RATIO = 0.6


def _check_pow2(n: int) -> None:
    if n & (n - 1) or n <= 0:
        raise ValueError(f"n_partitions must be a power of two, got {n}")


def with_partition_id(df: DataFrame, n_partitions: int,
                      hash_col: str = "url_hash") -> DataFrame:
    _check_pow2(n_partitions)
    return df.withColumn(
        "partition_id", F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int")
    )


def latest_blooms(bloom_history: DataFrame) -> DataFrame:
    """Current bloom state = max-round row per partition (A1 pattern)."""
    return (
        bloom_history.groupBy("partition_id")
        .agg(F.max_by(F.struct("bloom_bytes", "n_items", "round"), "round").alias("s"))
        .select("partition_id", "s.bloom_bytes", "s.n_items", "s.round")
    )


def probe_unseen(
    candidates: DataFrame,
    bloom_state: DataFrame,
    exact_seen: DataFrame,
    n_partitions: int,
) -> DataFrame:
    """Return the candidate rows whose url_hash is NOT in the seen set.

    Two-phase: vectorized bloom probe per co-partition, then exact
    anti-join for the (few) bloom hits.  No false negatives by bloom
    construction; exact-confirm removes false positives.
    """
    cand = with_partition_id(candidates, n_partitions)
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if right.empty:
            left["maybe_seen"] = False
            return left
        bp = BloomPartition.from_bytes(bytes(right["bloom_bytes"].iloc[0]))
        left["maybe_seen"] = bp.might_contain(left["url_hash"].to_numpy())
        return left

    probed = (
        cand.groupBy("partition_id")
        .cogroup(bloom_state.groupBy("partition_id"))
        .applyInPandas(probe, out_schema)
    )
    definitely_new = probed.where(~F.col("maybe_seen"))
    confirmed_new = probed.where(F.col("maybe_seen")).join(
        exact_seen.select("url_hash"), "url_hash", "left_anti"
    )
    drop = ["partition_id", "maybe_seen"]
    return definitely_new.drop(*drop).unionByName(confirmed_new.drop(*drop))


def updated_bloom_partitions(
    new_hashes: DataFrame,
    bloom_state: DataFrame,
    exact_seen: DataFrame,
    n_partitions: int,
    round_no: int,
) -> DataFrame:
    """New bloom rows for the partitions touched by ``new_hashes``.

    Each touched partition either absorbs the new hashes in place
    (capacity permitting) or rebuilds from exact ∪ new at 2× capacity.
    Only touched partitions are rewritten — per-round state delta stays
    proportional to the round's discoveries, not the total seen set.
    """
    _check_pow2(n_partitions)
    new_tagged = with_partition_id(
        new_hashes.select("url_hash").withColumn("is_new", F.lit(True)),
        n_partitions,
    )
    touched = new_tagged.select("partition_id").distinct()
    old_tagged = (
        with_partition_id(exact_seen.select("url_hash"), n_partitions)
        .join(touched, "partition_id")
        .withColumn("is_new", F.lit(False))
    )
    hashes = new_tagged.unionByName(old_tagged)

    def rebuild(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or not left["is_new"].any():
            return pd.DataFrame(
                columns=["partition_id", "bloom_bytes", "n_items", "round"]
            )
        pid = int(left["partition_id"].iloc[0])
        new_vals = left.loc[left["is_new"], "url_hash"].to_numpy()
        bp = (
            BloomPartition.from_bytes(bytes(right["bloom_bytes"].iloc[0]))
            if not right.empty
            else None
        )
        total = int(len(left))
        if bp is None or (bp.n_items + len(new_vals)) > FILL_REBUILD_RATIO * _capacity(bp):
            cap = max(MIN_CAPACITY, 2 * total)
            m = optimal_bits(cap)
            bp = BloomPartition(m, optimal_hashes(m, cap))
            bp.add(left["url_hash"].to_numpy())
            bp.n_items = total
        else:
            bp.add(new_vals)
        return pd.DataFrame(
            {
                "partition_id": [pid],
                "bloom_bytes": [bp.to_bytes()],
                "n_items": [int(bp.n_items)],
                "round": [round_no],
            }
        )

    return (
        hashes.groupBy("partition_id")
        .cogroup(bloom_state.groupBy("partition_id"))
        .applyInPandas(rebuild, URLSEEN_BLOOM_SCHEMA)
    )


def _capacity(bp: BloomPartition) -> int:
    """Approximate design capacity from geometry (m = -n ln p /(ln2)^2)."""
    import math

    return max(int(bp.m_bits * (math.log(2) ** 2) / -math.log(0.01)), 1)

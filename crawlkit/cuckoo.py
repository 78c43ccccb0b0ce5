"""Partitioned cuckoo filter — the deletable URL-seen alternative.

The north-star design calls for a "partitioned bloom/cuckoo URL-seen
filter".  `bloom.py` carries the bloom half; this module is the cuckoo
half (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public construction), duck-type compatible with
``BloomPartition`` (``from_bytes`` / ``to_bytes`` / ``add`` /
``might_contain`` / ``n_items``) so `urlseen.py` can treat the two
interchangeably, plus the one operation blooms cannot do: ``delete``.

Why deletion matters at crawl scale: re-crawl eviction.  With a bloom,
expiring a stale URL from the seen set means rebuilding the whole
partition from the exact table (O(partition)); a cuckoo filter evicts
in place (O(evicted)).  `urlseen.evicted_seen_partitions` uses exactly
that asymmetry.

Geometry: B buckets (power of two) x 4 slots of 16-bit fingerprints
(0 = empty).  From the 64-bit ``xxhash64`` url hash (the same JVM-side
hash the bloom uses):

* ``fp  = (h >> 48) % 0xFFFF + 1``            (never 0)
* ``i1  = h & (B - 1)``
* ``i2  = i1 ^ (fp * 0x5bd1e995) & (B - 1)``  (partial-key cuckoo;
  self-inverse, so either bucket reaches its alternate without the key)

All probe / bulk-insert / delete paths are numpy-vectorized; the only
per-item Python is the eviction random walk for the residue of a bulk
insert that both target buckets rejected (a few per million at the
0.84 design load).
"""

from __future__ import annotations

import numpy as np

SLOTS_PER_BUCKET = 4
DESIGN_LOAD = 0.84  # standard (4-slot) cuckoo-filter design load factor
MAX_KICKS = 500
MIN_BUCKETS = 256
_MAGIC = 0xFFFFFFFF  # payload discriminant; bloom's k field is <= 16
_SPREAD = np.uint64(0x5BD1E995)


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def buckets_for(n_items: int) -> int:
    """Bucket count so ``n_items`` fits at the design load factor."""
    need = max(int(n_items), 1) / (SLOTS_PER_BUCKET * DESIGN_LOAD)
    return max(_next_pow2(int(np.ceil(need))), MIN_BUCKETS)


class CuckooPartition:
    """One partition's slot table; stored as bytes in the urlseen table."""

    __slots__ = ("slots", "n_buckets", "n_items")

    def __init__(self, n_buckets: int, slots: np.ndarray | None = None,
                 n_items: int = 0) -> None:
        if n_buckets & (n_buckets - 1) or n_buckets <= 0:
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.n_buckets = n_buckets
        self.slots = (slots if slots is not None
                      else np.zeros((n_buckets, SLOTS_PER_BUCKET), dtype=np.uint16))
        self.n_items = n_items

    # -- serialization (layout: 4B magic | 8B n_items | 4B n_buckets | slots)

    @classmethod
    def sized_for(cls, n_items: int) -> "CuckooPartition":
        return cls(buckets_for(n_items))

    @classmethod
    def from_bytes(cls, payload: bytes) -> "CuckooPartition":
        if int.from_bytes(payload[:4], "little") != _MAGIC:
            raise ValueError("not a cuckoo-filter payload")
        n_items = int.from_bytes(payload[4:12], "little")
        n_buckets = int.from_bytes(payload[12:16], "little")
        slots = np.frombuffer(payload[16:], dtype="<u2").astype(np.uint16)
        return cls(n_buckets, slots.reshape(n_buckets, SLOTS_PER_BUCKET).copy(),
                   n_items)

    def to_bytes(self) -> bytes:
        return (
            _MAGIC.to_bytes(4, "little")
            + int(self.n_items).to_bytes(8, "little")
            + int(self.n_buckets).to_bytes(4, "little")
            + self.slots.astype("<u2").tobytes()
        )

    @staticmethod
    def is_cuckoo_payload(payload: bytes) -> bool:
        return int.from_bytes(payload[:4], "little") == _MAGIC

    # -- hashing

    def _derive(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        mask = np.uint64(self.n_buckets - 1)
        fp = ((h >> np.uint64(48)) % np.uint64(0xFFFF) + np.uint64(1)).astype(np.uint16)
        i1 = (h & mask).astype(np.int64)
        i2 = self._alt_bucket(i1, fp)
        return fp, i1, i2

    def _alt_bucket(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mask = np.uint64(self.n_buckets - 1)
        return (bucket.astype(np.uint64)
                ^ (fp.astype(np.uint64) * _SPREAD & mask)).astype(np.int64)

    # -- probe

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized probe -> bool array (no false negatives)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._derive(hashes)
        f = fp[:, None]
        return ((self.slots[i1] == f).any(axis=1)
                | (self.slots[i2] == f).any(axis=1))

    # -- insert

    def add(self, hashes: np.ndarray) -> None:
        """Bulk insert; raises ``OverflowError`` when the table is full
        (caller rebuilds at a larger geometry, exactly like an over-full
        bloom partition)."""
        if len(hashes) == 0:
            return
        fp, i1, _ = self._derive(np.asarray(hashes))
        n = len(fp)
        # pass 1: primary buckets; pass 2: alternates of the rejects
        fp_r, b_r = self._bulk_place(fp, i1)
        if len(fp_r):
            fp_r, b_r = self._bulk_place(fp_r, self._alt_bucket(b_r, fp_r))
        if len(fp_r):
            rng = np.random.default_rng(0xC0FFEE)  # deterministic walks
            for f, b in zip(fp_r.tolist(), b_r.tolist()):
                if not self._kick_insert(f, b, rng):
                    raise OverflowError("cuckoo partition full")
        self.n_items += n

    def _bulk_place(self, fp: np.ndarray, bucket: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
        """Place as many (fp, bucket) pairs as the buckets' free slots
        allow, fully vectorized; return the rejected remainder."""
        if len(fp) == 0:
            return fp, bucket
        order = np.argsort(bucket, kind="stable")
        b_sorted, f_sorted = bucket[order], fp[order]
        # rank of each item within its bucket group
        first = np.searchsorted(b_sorted, b_sorted, side="left")
        rank = np.arange(len(b_sorted)) - first
        occ = (self.slots[b_sorted] != 0).sum(axis=1)
        slot = occ + rank
        ok = slot < SLOTS_PER_BUCKET
        self.slots[b_sorted[ok], slot[ok]] = f_sorted[ok]
        rej = ~ok
        return f_sorted[rej], b_sorted[rej]

    def _kick_insert(self, fp: int, bucket: int, rng: np.random.Generator) -> bool:
        """Sequential random-walk eviction for one rejected item."""
        cur_fp, cur_b = np.uint16(fp), int(bucket)
        for _ in range(MAX_KICKS):
            row = self.slots[cur_b]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = cur_fp
                return True
            victim = int(rng.integers(SLOTS_PER_BUCKET))
            cur_fp, row[victim] = row[victim], cur_fp
            cur_b = int(self._alt_bucket(np.array([cur_b]), np.array([cur_fp]))[0])
        return False

    # -- delete

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per hash; returns a bool array
        (True = a copy was found and removed).

        Standard cuckoo-filter contract: only delete items that were
        actually inserted.  Deleting a never-inserted item usually
        returns False (no copy found), but on a fingerprint+bucket
        collision it would evict the collider's copy and create a false
        negative for it — callers must source deletions from the exact
        seen table (`urlseen.evicted_seen_partitions` does).

        Vectorized: each pass resolves every deletion whose target cell
        is unique this pass; collided deletions (two distinct hashes
        mapping to the same bucket AND slot — rare) retry next pass
        against the updated table, so each removes a distinct copy.
        """
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._derive(hashes)
        removed = np.zeros(len(fp), dtype=bool)
        pending = np.arange(len(fp))
        while len(pending):
            pfp, p1, p2 = fp[pending], i1[pending], i2[pending]
            f = pfp[:, None]
            m1 = self.slots[p1] == f
            m2 = self.slots[p2] == f
            hit1 = m1.any(axis=1)
            hit2 = ~hit1 & m2.any(axis=1)
            tgt_bucket = np.where(hit1, p1, p2)
            tgt_slot = np.where(hit1, m1.argmax(axis=1), m2.argmax(axis=1))
            found = hit1 | hit2
            if not found.any():
                break
            # one winner per distinct (bucket, slot) cell this pass
            cell = tgt_bucket * SLOTS_PER_BUCKET + tgt_slot
            cell[~found] = -1
            _, winner_idx = np.unique(cell, return_index=True)
            winner = np.zeros(len(pending), dtype=bool)
            winner[winner_idx] = True
            winner &= found
            self.slots[tgt_bucket[winner], tgt_slot[winner]] = 0
            removed[pending[winner]] = True
            self.n_items -= int(winner.sum())
            self._compact_rows(np.unique(tgt_bucket[winner]))
            pending = pending[found & ~winner]
        return removed

    def _compact_rows(self, buckets: np.ndarray) -> None:
        """Push surviving fingerprints to the front of each row.

        ``_bulk_place`` derives free-slot positions from the occupancy
        COUNT, which is only valid while occupied slots are
        front-contiguous — deletion punches holes, compaction restores
        the invariant.  Slot order within a bucket carries no meaning.
        """
        if len(buckets) == 0:
            return
        rows = self.slots[buckets]
        order = np.argsort(rows == 0, axis=1, kind="stable")
        self.slots[buckets] = np.take_along_axis(rows, order, axis=1)

"""Partial-key cuckoo filter (from scratch, numpy-backed).

The URL-seen probe structure mandated by the north star: insert / contains /
delete over 64-bit key hashes, 16-bit fingerprints, 4-slot buckets, 2-choice
placement with kickout. The bucket array is a flat numpy uint16 matrix so
batch ``contains`` is fully vectorized (two gathers + compares per batch) and
serialization for checkpoints is ``tobytes()`` of the matrix.

Replaces the reference's exact in-memory id set (``index.keys()`` dup check,
``/root/reference/crawl4ai_llm/storage/json_storage.py:195-197,244-254``) as
the *scalable probe*; a positive answer is confirmed against the exact
:class:`~crawl4ai_llm_ray.state.u64set.U64Set` (cuckoo false-positive rate with
16-bit fingerprints is ~2^-13 per lookup — too high to silently drop URLs when
the correctness contract is exact seen-set equality).

Design notes for 10^10 scale: one filter per frontier partition; with P=4096
partitions and ~2.4M URLs per shard, a shard filter is 4M slots x 2B = 8 MB.
(Structure follows the classic partial-key cuckoo filter of Fan et al.,
CoNEXT 2014, as surveyed in PAPERS.md's "Learned Cuckoo Filter" entry —
pattern only, implemented from scratch.)
"""

from __future__ import annotations

import numpy as np

_MUL = np.uint64(0x5BD1E995)  # odd multiplier decorrelating fp from index


class CuckooFilter:
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16, bucket_size: int = 4):
        # power-of-two bucket count so the XOR alternate-index trick is involutive
        nb = 1
        while nb * bucket_size < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.bucket_size = bucket_size
        self.buckets = np.zeros((nb, bucket_size), dtype=np.uint16)  # 0 == empty
        self.count = 0

    # --- fingerprint / index math (vectorized) -----------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty sentinel
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.nbuckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = np.bitwise_xor(
            i1.astype(np.uint64), (fp.astype(np.uint64) * _MUL)
        ) & np.uint64(self.nbuckets - 1)
        return alt.astype(np.int64)

    # --- batch ops ----------------------------------------------------------
    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe. hashes: uint64 ndarray → bool ndarray."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64, copy=False)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        b1 = self.buckets[i1]  # (n, bucket_size) gather
        b2 = self.buckets[i2]
        return ((b1 == fp[:, None]).any(axis=1)) | ((b2 == fp[:, None]).any(axis=1))

    def insert_batch(self, hashes: np.ndarray) -> int:
        """Insert every hash (idempotence is the caller's concern). Returns #inserted.

        Raises RuntimeError when the filter is too full to place an item
        (caller should grow / fall back to bloom+exact).

        Vectorized fast path: for each (bucket-choice, slot) pair, every
        pending item whose target slot is empty is placed in one scatter —
        first-writer-wins on within-batch bucket collisions via
        np.unique(return_index). At sane load factors this settles ~all of
        the batch in 2×bucket_size numpy passes; only items whose both
        buckets are full fall through to the scalar kickout loop. (This is
        the frontier-ingest hot path — the original per-item Python loop
        dominated drain ingest at 4× the bench corpus.)"""
        h = hashes.astype(np.uint64, copy=False)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        buckets = self.buckets
        bs = self.bucket_size
        pending = np.arange(len(h), dtype=np.int64)
        for cand in (i1, i2):
            for s in range(bs):
                if not len(pending):
                    break
                idx = cand[pending]
                empty = buckets[idx, s] == 0
                if not empty.any():
                    continue
                rows = pending[empty]
                u, first = np.unique(idx[empty], return_index=True)
                winners = rows[first]
                buckets[u, s] = fp[winners]
                keep = np.ones(len(pending), dtype=bool)
                keep[np.searchsorted(pending, winners)] = False
                pending = pending[keep]
        for j in pending:  # both buckets full: scalar kickout path
            self._kick_insert(int(i1[j]), int(fp[j]))
        self.count += len(h)
        return len(h)

    def _kick_insert(self, idx: int, f: int) -> None:
        # seed MUST be nonzero: 0 is the xorshift fixed point (idx == f can
        # produce it), which would degenerate victim choice to slot 0 forever
        # and cycle to a spurious "filter full" at low load — force the MSB
        # on so the state is nonzero for every (idx, f)
        rng_state = (np.uint64(idx) ^ np.uint64(f)) | np.uint64(1) << np.uint64(63)
        buckets = self.buckets
        bs = self.bucket_size
        for _ in range(self.MAX_KICKS):
            # deterministic pseudo-random victim slot (xorshift) — no global RNG
            rng_state ^= rng_state << np.uint64(13) & np.uint64(0xFFFFFFFFFFFFFFFF)
            rng_state ^= rng_state >> np.uint64(7)
            rng_state ^= rng_state << np.uint64(17) & np.uint64(0xFFFFFFFFFFFFFFFF)
            slot = int(rng_state % np.uint64(bs))
            victim = int(buckets[idx, slot])
            buckets[idx, slot] = f
            if victim == 0:
                return
            f = victim
            idx = int(
                (np.uint64(idx) ^ (np.uint64(f) * _MUL)) & np.uint64(self.nbuckets - 1)
            )
            row = buckets[idx]
            for s in range(bs):
                if row[s] == 0:
                    row[s] = f
                    return
        raise RuntimeError("cuckoo filter full (kickout limit reached)")

    def delete_batch(self, hashes: np.ndarray) -> int:
        h = hashes.astype(np.uint64, copy=False)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        removed = 0
        for j in range(len(h)):
            f = fp[j]
            done = False
            for idx in (i1[j], i2[j]):
                row = self.buckets[idx]
                for s in range(self.bucket_size):
                    if row[s] == f:
                        row[s] = 0
                        removed += 1
                        done = True
                        break
                if done:
                    break
        self.count -= removed
        return removed

    @property
    def load_factor(self) -> float:
        return self.count / (self.nbuckets * self.bucket_size)

    # --- checkpoint serialization ------------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.nbuckets, self.bucket_size, self.count], dtype=np.int64)
        return header.tobytes() + self.buckets.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        nb, bs, count = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.nbuckets = int(nb)
        obj.bucket_size = int(bs)
        obj.count = int(count)
        obj.buckets = (
            np.frombuffer(data[24:], dtype=np.uint16).reshape(int(nb), int(bs)).copy()
        )
        return obj

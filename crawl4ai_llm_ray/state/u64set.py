"""Exact uint64 set with LSM-style layout: a sorted base array + a small
unsorted pending buffer, compacted when the buffer grows. Batch membership is
``searchsorted`` on the base + ``isin`` on the pending — fully vectorized.

This is the *confirmation* layer behind the cuckoo/bloom probe in the frontier
seen-set (probe says "maybe seen" → confirm here), making dedup exact while the
probe keeps the common case (definitely-new URL) a single vectorized pass.
Memory: 8 bytes/URL/shard — ~20 MB/shard at 10^10 URLs over 4096 shards.
"""

from __future__ import annotations

import numpy as np

_COMPACT_AT = 65536


class U64Set:
    def __init__(self) -> None:
        self.base = np.empty(0, dtype=np.uint64)      # sorted, unique
        self.pending = np.empty(0, dtype=np.uint64)   # unsorted, may dup base

    def __len__(self) -> int:
        self._compact()
        return len(self.base)

    def _compact(self) -> None:
        if len(self.pending):
            merged = np.concatenate([self.base, self.pending])
            self.base = np.unique(merged)
            self.pending = np.empty(0, dtype=np.uint64)

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        out = np.zeros(len(h), dtype=bool)
        if len(self.base):
            idx = np.searchsorted(self.base, h)
            idx_c = np.clip(idx, 0, len(self.base) - 1)
            out |= self.base[idx_c] == h
        if len(self.pending):
            out |= np.isin(h, self.pending)
        return out

    def add_batch(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        if len(h) == 0:
            return
        self.pending = np.concatenate([self.pending, h])
        if len(self.pending) >= _COMPACT_AT:
            self._compact()

    def to_numpy(self) -> np.ndarray:
        self._compact()
        return self.base

    def to_bytes(self) -> bytes:
        self._compact()
        return self.base.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "U64Set":
        obj = cls()
        obj.base = np.frombuffer(data, dtype=np.uint64).copy()
        return obj


def _lookup_sorted(h_sorted: np.ndarray, v_sorted: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Values for query hashes against one sorted (hash, value) run; -inf
    where absent. Fully vectorized (searchsorted)."""
    out = np.full(len(q), -np.inf, dtype=np.float32)
    if len(h_sorted):
        idx = np.searchsorted(h_sorted, q)
        idxc = np.clip(idx, 0, len(h_sorted) - 1)
        m = h_sorted[idxc] == q
        out[m] = v_sorted[idxc[m]]
    return out


class U64MaxMap:
    """uint64 → max(float32) map with the same LSM layout as U64Set: a sorted
    base run plus small sorted pending runs (each ``add_batch`` is one run,
    deduped keep-max within the batch). ``get_batch`` is a searchsorted per
    run — vectorized, no Python dict.

    Used by the frontier's wave staging buffer to decide whether a same-wave
    re-offer of an already-staged URL carries a strictly higher priority
    (only genuine upgrades are restaged — equal-priority duplicates are
    dropped, keeping staging bounded by unique URLs per wave)."""

    _MAX_RUNS = 8
    _MAX_PENDING = 16384

    def __init__(self) -> None:
        self.base_h = np.empty(0, dtype=np.uint64)
        self.base_v = np.empty(0, dtype=np.float32)
        self.runs: list[tuple[np.ndarray, np.ndarray]] = []
        self._pending_rows = 0

    def add_batch(self, hashes: np.ndarray, values: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        v = values.astype(np.float32, copy=False)
        order = np.lexsort((-v, h))  # hash asc, value desc
        hs, vs = h[order], v[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        self.runs.append((hs[first], vs[first]))
        self._pending_rows += int(first.sum())
        if len(self.runs) > self._MAX_RUNS or self._pending_rows > self._MAX_PENDING:
            self._compact()

    def get_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Max value per query hash; -inf where the hash is absent."""
        q = hashes.astype(np.uint64, copy=False)
        best = _lookup_sorted(self.base_h, self.base_v, q)
        for h, v in self.runs:
            np.maximum(best, _lookup_sorted(h, v, q), out=best)
        return best

    def _compact(self) -> None:
        if not self.runs:
            return
        h = np.concatenate([self.base_h] + [r[0] for r in self.runs])
        v = np.concatenate([self.base_v] + [r[1] for r in self.runs])
        order = np.lexsort((-v, h))
        hs, vs = h[order], v[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        self.base_h, self.base_v = hs[first], vs[first]
        self.runs = []
        self._pending_rows = 0

    def to_bytes(self) -> bytes:
        self._compact()
        return self.base_h.tobytes() + self.base_v.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "U64MaxMap":
        obj = cls()
        n = len(data) // 12  # 8 bytes hash + 4 bytes value
        obj.base_h = np.frombuffer(data[: n * 8], dtype=np.uint64).copy()
        obj.base_v = np.frombuffer(data[n * 8 : n * 12], dtype=np.float32).copy()
        return obj

def keep_max_per_hash(hashes, prios):
    """Selection indices keeping ONE row per hash — the max-prio one, ties
    broken deterministically by the lexsort's stable first-occurrence — the
    order-independence-critical resolve shared by FrontierShard.offer,
    _flush_staging and U64MaxMap (a single implementation so the
    determinism contract cannot silently diverge between copies)."""
    import numpy as np

    order = np.lexsort((-prios, hashes))  # hash asc, prio desc
    hs = hashes[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = hs[1:] != hs[:-1]
    return order[first]

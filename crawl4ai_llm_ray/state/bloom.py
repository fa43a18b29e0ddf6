"""Bloom filter (numpy bit array, double hashing) — the cold-shard fallback
for the URL-seen probe (north star: "bloom fallback for cold shards").

Fully vectorized add/contains via Kirsch–Mitzenmacher double hashing:
g_i(x) = h1(x) + i*h2(x). h1 is the key hash itself (already FNV-1a-64);
h2 is a cheap bijective remix, so no second string pass is needed.
"""

from __future__ import annotations

import numpy as np


def _remix(h: np.ndarray) -> np.ndarray:
    """xorshift-multiply remix (splitmix64 finalizer) of a uint64 vector."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


class BloomFilter:
    def __init__(self, capacity: int = 1 << 16, fpp: float = 1e-4):
        m = int(-capacity * np.log(fpp) / (np.log(2) ** 2))
        m = max(64, (m + 63) & ~63)  # round up to whole uint64 words
        self.nbits = m
        self.k = max(1, int(round(m / capacity * np.log(2))))
        self.words = np.zeros(m // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = _remix(h1) | np.uint64(1)  # odd → full-period stepping
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            pos = (h1[None, :] + i * h2[None, :]) % np.uint64(self.nbits)
        return pos  # (k, n)

    def add_batch(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.words, word, bit)
        self.count += len(hashes)

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)  # (k, n)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit = (self.words[word] & bit) != 0
        return hit.all(axis=0)

    def to_bytes(self) -> bytes:
        header = np.array([self.nbits, self.k, self.count], dtype=np.int64)
        return header.tobytes() + self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        nbits, k, count = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.nbits = int(nbits)
        obj.k = int(k)
        obj.count = int(count)
        obj.words = np.frombuffer(data[24:], dtype=np.uint64).copy()
        return obj

"""HyperLogLog distinct-count sketch (from scratch, numpy-backed, mergeable).

The canonical sketch-aggregation pattern for 100 TB: each map_batches task
folds its batch into a fixed-size register array (2^p bytes), emits ONE
serialized sketch row, and a tiny final stage merges sketches with an
elementwise max — no shuffle of raw keys at any point.

Standard HLL with the bias-corrected estimator (Flajolet et al. 2007's
alpha_m, linear counting for small cardinalities); register index = low p
bits of the 64-bit key hash, rho = leading-zero rank of the remaining bits.
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Fold a batch of uint64 key hashes into the registers (vectorized)."""
        h = hashes.astype(np.uint64, copy=False)
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        rest = h >> np.uint64(self.p)
        # rho = position of first set bit in the remaining 64-p bits (1-based);
        # all-zero rest → max rank
        nbits = 64 - self.p
        rho = np.full(len(h), nbits + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # count trailing zeros via float64 mantissa trick on lowest set bit
            low = rest[nz] & (~rest[nz] + np.uint64(1))
            tz = np.log2(low.astype(np.float64)).astype(np.uint8)
            rho[nz] = tz + 1
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        np.maximum(self.registers, other.registers, out=out.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        if raw <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return raw

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        obj = cls(int(data[0]))
        obj.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return obj

"""Stable 64-bit hashing (vectorized FNV-1a).

The reference derives URL ids with Python's builtin ``hash()``
(``/root/reference/crawl4ai_llm/storage/json_storage.py:87``), which is
process-salted and therefore non-deterministic across workers/runs — a bug we
must NOT port (SURVEY.md §8 n.6).  This module *specifies* the stable hash for
the whole engine: FNV-1a 64-bit over UTF-8 bytes, with an optional seed XORed
into the offset basis.  It is self-contained (no third-party hash lib), stable
forever across processes, machines and library versions — a hard requirement
because hashes are persisted in checkpoints (cuckoo-filter fingerprints,
URL-seen sets) and must survive resume.

The vectorized form runs column-at-a-time over the Arrow string buffer with
numpy (one pass per byte position, masked), ~40 ms per 64k URLs — faster than
shipping bytes through a Python loop by ~2 orders of magnitude.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_BASIS = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a64_scalar(s: str | bytes, seed: int = 0) -> int:
    """Reference scalar implementation (spec). Returns uint64 as Python int."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = (_FNV_BASIS ^ seed) & _MASK64
    for b in s:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def _as_binary_array(arr) -> pa.Array:
    """Normalize input to a single contiguous pyarrow binary/large_binary array."""
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t):
        arr = arr.cast(pa.binary())
    elif pa.types.is_large_string(t):
        arr = arr.cast(pa.large_binary())
    elif not (pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        arr = arr.cast(pa.string()).cast(pa.binary())
    return arr


def fnv1a64(arr, seed: int = 0) -> np.ndarray:
    """Vectorized FNV-1a-64 over a pyarrow string/binary array (or list/ndarray).

    Nulls hash as the empty string. Returns ``np.ndarray`` of dtype uint64,
    byte-for-byte equal to ``fnv1a64_scalar`` on every element.
    """
    arr = _as_binary_array(arr)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        arr = arr.fill_null(b"")
    # After fill_null / combine_chunks the array may still carry an offset.
    if arr.offset:
        arr = pa.concat_arrays([arr])  # force re-slice to offset 0
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1).astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    lens = offsets[1:] - offsets[:-1]
    starts = offsets[:-1]
    maxlen = int(lens.max()) if n else 0

    h = np.full(n, np.uint64((_FNV_BASIS ^ seed) & _MASK64))
    prime = np.uint64(_FNV_PRIME)
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            mask = lens > i
            if not mask.any():
                break
            idx = starts[mask] + i
            hm = h[mask]
            hm = (hm ^ data[idx].astype(np.uint64)) * prime
            h[mask] = hm
    return h


def hash_columns(*arrays, seed: int = 0) -> np.ndarray:
    """Combined hash of several string columns (row-wise), order-sensitive.

    Equivalent to hashing ``col0 + "\\x1f" + col1 + ...`` — used for composite
    keys (e.g. host+path buckets) without building the concatenated string.
    """
    import pyarrow.compute as pc

    if len(arrays) == 1:
        return fnv1a64(arrays[0], seed=seed)
    cols = [a.cast(pa.string()) if not pa.types.is_string(a.type) else a for a in map(_as_chunkless, arrays)]
    joined = pc.binary_join_element_wise(*cols, "\x1f")
    return fnv1a64(joined, seed=seed)


def _as_chunkless(a):
    if isinstance(a, pa.ChunkedArray):
        return a.combine_chunks()
    if isinstance(a, (list, np.ndarray)):
        return pa.array(a, type=pa.string())
    return a

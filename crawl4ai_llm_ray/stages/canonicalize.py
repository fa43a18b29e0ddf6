"""Canonicalize+hash: the stateless map_batches stage that turns raw URL rows
into routed frontier rows (FRONTIER_SCHEMA).

This is the engine's version of the reference's id-derivation step
(``/root/reference/crawl4ai_llm/storage/json_storage.py:61-90`` —
``"url_" + hash(url)``), with the process-salted builtin ``hash`` replaced by
the stable FNV-1a-64 spec (SURVEY §8 n.6) and extended with host extraction
and partition routing. Fully vectorized; invalid URLs are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv1a64, fnv1a64_scalar
from ..functions.urlnorm import canonicalize_urls, host_of
from ..schema import FRONTIER_SCHEMA


def salted_partition_scalar(
    host: str, url_hash: int, n_partitions: int, salted_hosts: dict[str, int] | None
) -> int:
    """Shared routing spec (oracle + engine): a hot host listed in
    ``salted_hosts`` with s sub-shards routes URL u to partition
    ``fnv("{host}#{u.hash % s}") % P`` — spreading its frontier state across
    up to s shards; unsalted hosts route by ``fnv(host) % P``."""
    s = (salted_hosts or {}).get(host, 1)
    if s <= 1:
        return fnv1a64_scalar(host) % n_partitions
    return fnv1a64_scalar(f"{host}#{url_hash % s}") % n_partitions


def _salted_partition_vec(
    host: pa.Array,
    host_hash: np.ndarray,
    url_hash: np.ndarray,
    n_partitions: int,
    salted_hosts: dict[str, int] | None,
) -> np.ndarray:
    pid = (host_hash % np.uint64(n_partitions)).astype(np.int32)
    if not salted_hosts:
        return pid
    hosts_np = np.asarray(host.to_pylist(), dtype=object)
    for h, s in salted_hosts.items():
        m = hosts_np == h
        if not m.any() or s <= 1:
            continue
        salt = (url_hash[m] % np.uint64(s)).astype(np.int64)
        keys = pc.binary_join_element_wise(
            pa.array([h] * int(m.sum())),
            "#",
            pc.cast(pa.array(salt), pa.string()),
            "",
        )
        pid[m] = (fnv1a64(keys) % np.uint64(n_partitions)).astype(np.int32)
    return pid


def canonicalize_batch(
    batch: pa.Table,
    n_partitions: int,
    url_col: str = "url",
    default_priority: float | None = None,
    default_depth: int | None = None,
    salted_hosts: dict[str, int] | None = None,
) -> pa.Table:
    """raw (url, priority?, depth?) rows → FRONTIER_SCHEMA rows.

    priority/depth are passed through when present, else filled with the
    defaults (discovered links get priority = 1/(1+depth) upstream).
    ``salted_hosts`` activates hot-host salting (see salted_partition_scalar).
    """
    canon = canonicalize_urls(batch[url_col])
    valid = pc.is_valid(canon)
    if not pc.all(valid).as_py():
        keep = pc.fill_null(valid, False)
        batch = batch.filter(keep)
        canon = canon.filter(keep)
    n = len(canon)
    url_hash = fnv1a64(canon)
    host = host_of(canon)
    host_hash = fnv1a64(host)
    partition_id = _salted_partition_vec(
        host, host_hash, url_hash, n_partitions, salted_hosts
    )

    if "priority" in batch.column_names:
        priority = batch["priority"].cast(pa.float32())
    else:
        priority = pa.array(np.full(n, default_priority, dtype=np.float32))
    if "depth" in batch.column_names:
        depth = batch["depth"].cast(pa.int32())
    else:
        depth = pa.array(np.full(n, default_depth, dtype=np.int32))

    return pa.table(
        {
            "url_canon": canon,
            "url_hash": pa.array(url_hash),
            "host": host,
            "host_hash": pa.array(host_hash),
            "partition_id": pa.array(partition_id),
            "priority": priority,
            "depth": depth,
        },
        schema=FRONTIER_SCHEMA,
    )

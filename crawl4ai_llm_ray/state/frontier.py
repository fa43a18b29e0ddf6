"""Frontier shard: the stateful heart of the crawl scheduler.

One shard owns one ``host_hash % P`` partition of URL space and holds, per the
north star: the partitioned URL-seen set (cuckoo-filter probe + exact u64
confirm, bloom fallback for cold shards), the per-host priority queues, the
per-host politeness clock (reference contract: ``delay`` seconds between
same-host requests, ``/root/reference/crawl4ai_llm/config.py:56``), the robots
gate, per-wave metrics, and checkpoint/restore.

Replaces the reference's single global ``index.json`` seen-set
(``/root/reference/crawl4ai_llm/storage/json_storage.py:195-197,244-254``)
with partition-owned state: each partition is owned by exactly one actor, so
no cross-actor locking exists anywhere (vs the reference's asyncio.Lock).

Determinism contract (shared with the oracle crawler, see oracle/crawler.py):
  * offer-time in-batch dedup keeps the max-priority row per url_hash
    (order-independent — priority is a pure function of depth, so ties are
    exact);
  * seen/robots checks at offer time; robots-blocked URLs are marked seen and
    counted once;
  * wave ``t`` drains, per host, up to ``max(1, floor(wave_duration/delay))``
    URLs in (priority desc, url_hash asc) order, scheduled at
    ``t*wave_duration + k*delay`` — consecutive same-host fetches are always
    ≥ delay apart (the politeness invariant);
  * global crawl order = sort by (scheduled_t, host, url_hash).

The class is plain Python (unit-testable); the crawl pipeline wraps it with
``ray.remote``.
"""

from __future__ import annotations

import heapq
import os
import pickle
import tempfile

import numpy as np
import pyarrow as pa

from ..schema import WAVE_SCHEMA
from .bloom import BloomFilter
from .cuckoo import CuckooFilter
from .u64set import U64Set

# A shard whose expected URL count is below this uses a bloom probe instead of
# a cuckoo filter ("bloom fallback for cold shards") — the bloom is smaller and
# needs no kickout bookkeeping; exactness still comes from the U64Set confirm.
COLD_SHARD_THRESHOLD = 4096


class FrontierShard:
    def __init__(
        self,
        partition_id: int,
        n_partitions: int,
        robots: dict[str, tuple[tuple[str, ...], float]],
        expected_urls: int = 1 << 16,
        default_delay: float = 1.0,
        restore_from: str | None = None,
    ):
        if restore_from is not None:
            # checkpoint restore path (used by the crawl driver's resume —
            # ray.remote classes construct via __init__ only)
            other = FrontierShard.restore(restore_from)
            self.__dict__.update(other.__dict__)
            return
        self.partition_id = partition_id
        self.n_partitions = n_partitions
        self.robots = robots
        self.default_delay = default_delay
        if expected_urls < COLD_SHARD_THRESHOLD:
            self.probe = BloomFilter(capacity=max(1024, expected_urls * 4))
        else:
            self.probe = CuckooFilter(capacity=expected_urls * 2)
        self.exact = U64Set()
        # host -> heap of (-priority, url_hash, url_canon, depth)
        self.queues: dict[str, list] = {}
        self.wave = 0
        self.metrics_rows: list[dict] = []
        self._wave_counts = self._zero_counts()

    # ------------------------------------------------------------------ utils
    def _zero_counts(self):
        return {"offered": 0, "admitted": 0, "deduped": 0, "robots_blocked": 0, "fetched": 0}

    def _probe_insert(self, hashes: np.ndarray) -> None:
        if isinstance(self.probe, BloomFilter):
            self.probe.add_batch(hashes)
        else:
            try:
                self.probe.insert_batch(hashes)
            except RuntimeError:
                # cuckoo overfull → grow into a bloom overlay is complex; the
                # exact set keeps correctness, so rebuild a bigger cuckoo.
                newf = CuckooFilter(capacity=self.probe.nbuckets * self.probe.bucket_size * 2)
                newf.insert_batch(self.exact.to_numpy())
                newf.insert_batch(hashes)
                self.probe = newf
        self.exact.add_batch(hashes)

    def _seen_mask(self, hashes: np.ndarray) -> np.ndarray:
        maybe = self.probe.contains_batch(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        if maybe.any():
            # confirm probe positives against the exact set (cuckoo/bloom FPs
            # must not silently drop URLs — exact seen-set equality is the
            # correctness contract)
            idx = np.flatnonzero(maybe)
            out[idx] = self.exact.contains_batch(hashes[idx])
        return out

    # ------------------------------------------------------------------ offer
    def offer(self, table: pa.Table) -> dict:
        """Offer canonicalized frontier rows (FRONTIER_SCHEMA columns) to this
        shard. Dedups against the seen set, applies the robots gate, enqueues
        survivors. Returns this call's counters."""
        n = table.num_rows
        counts = {"offered": n, "admitted": 0, "deduped": 0, "robots_blocked": 0}
        if n == 0:
            return counts
        url_hash = table["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        priority = table["priority"].to_numpy(zero_copy_only=False)

        # in-batch dedup: keep the max-priority row per url_hash
        order = np.lexsort((-priority, url_hash))  # by hash, then priority desc
        uh_sorted = url_hash[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = uh_sorted[1:] != uh_sorted[:-1]
        keep_idx = order[first]
        keep_idx.sort()  # stable-ish; selection only, order irrelevant below
        counts["deduped"] += n - len(keep_idx)

        sub_hash = url_hash[keep_idx]
        seen = self._seen_mask(sub_hash)
        counts["deduped"] += int(seen.sum())
        new_idx = keep_idx[~seen]
        if len(new_idx) == 0:
            self._merge_counts(counts)
            return counts

        urls = table["url_canon"].take(pa.array(new_idx)).to_pylist()
        hosts = table["host"].take(pa.array(new_idx)).to_pylist()
        prios = priority[new_idx]
        depths = table["depth"].to_numpy(zero_copy_only=False)[new_idx]
        hashes = url_hash[new_idx]

        # robots gate (per-host Disallow prefixes)
        blocked = np.zeros(len(new_idx), dtype=bool)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            prefixes = self.robots.get(h, ((), self.default_delay))[0]
            if prefixes:
                path = u.split("/", 3)[3] if u.count("/") >= 3 else ""
                path = "/" + path
                if any(path.startswith(p) for p in prefixes):
                    blocked[i] = True
        counts["robots_blocked"] = int(blocked.sum())

        # mark everything (admitted + robots-blocked) seen; enqueue admitted
        self._probe_insert(hashes)
        for i in np.flatnonzero(~blocked):
            h = hosts[i]
            heapq.heappush(
                self.queues.setdefault(h, []),
                (-float(prios[i]), int(hashes[i]), urls[i], int(depths[i])),
            )
        counts["admitted"] = int((~blocked).sum())
        self._merge_counts(counts)
        return counts

    def _merge_counts(self, counts: dict) -> None:
        for k, v in counts.items():
            self._wave_counts[k] = self._wave_counts.get(k, 0) + v

    # -------------------------------------------------------------- next_wave
    def next_wave(self, wave_duration: float = 8.0) -> pa.Table:
        """Drain the politeness-eligible top of every host queue for the next
        wave. Returns a WAVE_SCHEMA table sorted by (scheduled_t, host,
        url_hash); advances the shard's wave counter and seals metrics."""
        t = self.wave
        wave_start = t * wave_duration
        urls, hashes, hosts, prios, depths, sched = [], [], [], [], [], []
        for h in sorted(k for k, q in self.queues.items() if q):
            q = self.queues[h]
            delay = self.robots.get(h, ((), self.default_delay))[1]
            budget = max(1, int(wave_duration // delay))
            k = 0
            while q and k < budget:
                negp, uh, u, d = heapq.heappop(q)
                urls.append(u)
                hashes.append(uh)
                hosts.append(h)
                prios.append(-negp)
                depths.append(d)
                sched.append(wave_start + k * delay)
                k += 1
        self._wave_counts["fetched"] = len(urls)
        self.metrics_rows.append(
            {"partition_id": self.partition_id, "wave": t, **self._wave_counts}
        )
        self._wave_counts = self._zero_counts()
        self.wave = t + 1

        tbl = pa.table(
            {
                "url_canon": pa.array(urls, type=pa.string()),
                "url_hash": pa.array(np.array(hashes, dtype=np.uint64)),
                "host": pa.array(hosts, type=pa.string()),
                "partition_id": pa.array(
                    np.full(len(urls), self.partition_id, dtype=np.int32)
                ),
                "priority": pa.array(np.array(prios, dtype=np.float32)),
                "depth": pa.array(np.array(depths, dtype=np.int32)),
                "wave": pa.array(np.full(len(urls), t, dtype=np.int32)),
                "scheduled_t": pa.array(np.array(sched, dtype=np.float64)),
            },
            schema=WAVE_SCHEMA,
        )
        if tbl.num_rows:
            idx = pa.compute.sort_indices(
                tbl,
                sort_keys=[
                    ("scheduled_t", "ascending"),
                    ("host", "ascending"),
                    ("url_hash", "ascending"),
                ],
            )
            tbl = tbl.take(idx)
        return tbl

    # ------------------------------------------------------------------ state
    def queue_size(self) -> int:
        return sum(len(q) for q in self.queues.values())

    def seen_hashes(self) -> np.ndarray:
        return self.exact.to_numpy()

    def metrics_table(self) -> pa.Table:
        from ..schema import METRICS_SCHEMA

        cols = {name: [] for name in METRICS_SCHEMA.names}
        for row in self.metrics_rows:
            for name in cols:
                cols[name].append(row[name])
        return pa.table(cols, schema=METRICS_SCHEMA)

    # ------------------------------------------------------------- checkpoint
    def checkpoint(self, ckpt_dir: str) -> str:
        """Atomically write this shard's full state for its current wave."""
        os.makedirs(ckpt_dir, exist_ok=True)
        state = {
            "partition_id": self.partition_id,
            "n_partitions": self.n_partitions,
            "default_delay": self.default_delay,
            "probe_kind": "bloom" if isinstance(self.probe, BloomFilter) else "cuckoo",
            "probe": self.probe.to_bytes(),
            "exact": self.exact.to_bytes(),
            "queues": self.queues,
            "wave": self.wave,
            "metrics_rows": self.metrics_rows,
            "robots": self.robots,
        }
        path = os.path.join(ckpt_dir, f"shard_{self.partition_id:05d}.ckpt")
        fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)  # atomic commit point (vs reference's non-atomic
        # file-then-index write, json_storage.py:199-221 — SURVEY §8 n.5)
        return path

    @classmethod
    def restore(cls, ckpt_path: str) -> "FrontierShard":
        with open(ckpt_path, "rb") as f:
            state = pickle.load(f)
        obj = cls.__new__(cls)
        obj.partition_id = state["partition_id"]
        obj.n_partitions = state["n_partitions"]
        obj.default_delay = state["default_delay"]
        obj.robots = state["robots"]
        if state["probe_kind"] == "bloom":
            obj.probe = BloomFilter.from_bytes(state["probe"])
        else:
            obj.probe = CuckooFilter.from_bytes(state["probe"])
        obj.exact = U64Set.from_bytes(state["exact"])
        obj.queues = state["queues"]
        obj.wave = state["wave"]
        obj.metrics_rows = state["metrics_rows"]
        obj._wave_counts = obj._zero_counts()
        return obj

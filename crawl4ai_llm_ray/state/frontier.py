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
        max_queue_rows: int | None = None,
        spill_dir: str | None = None,
        salted_hosts: dict[str, int] | None = None,
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
        # hot-host salting (north star): hosts listed here spread their
        # frontier over s sub-queues keyed "host#j" (j = url_hash % s),
        # routed to different shards by the canonicalize stage; politeness
        # stays exact because sub-queue j only fills wave slots
        # (j + wave) % s, (..)+s, ... on the host's shared delay grid —
        # no two sub-shards ever emit fetches closer than `delay`
        self.salted_hosts = salted_hosts or {}
        if expected_urls < COLD_SHARD_THRESHOLD:
            self.probe = BloomFilter(capacity=max(1024, expected_urls * 4))
        else:
            self.probe = CuckooFilter(capacity=expected_urls * 2)
        self.exact = U64Set()
        # host -> list of "runs": (prio:f32[], hash:u64[], url:obj[], depth:i32[])
        # appended vectorized at offer time, merged+sorted once per wave at
        # drain time (replaces a per-item python heap — ~20x less CPU/url)
        self.queues: dict[str, list] = {}
        self.wave = 0
        self.metrics_rows: list[dict] = []
        self._wave_counts = self._zero_counts()
        # bounded per-actor queues (north star): when in-memory queued rows
        # exceed max_queue_rows, whole host runs spill to disk as immutable
        # pickle files and are reloaded lazily at drain time. Spill files are
        # never mutated, so checkpoint/restore (which snapshots the stubs)
        # stays exact even across a re-run of a partially-executed wave.
        self.max_queue_rows = max_queue_rows
        self.spill_dir = spill_dir
        self._mem_rows = 0
        self._spill_seq = 0
        self.spilled: dict[str, list[tuple[str, int]]] = {}  # host → [(path, rows)]

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

        urls = np.asarray(
            table["url_canon"].take(pa.array(new_idx)).to_pylist(), dtype=object
        )
        hosts = np.asarray(
            table["host"].take(pa.array(new_idx)).to_pylist(), dtype=object
        )
        prios = priority[new_idx].astype(np.float32)
        depths = table["depth"].to_numpy(zero_copy_only=False)[new_idx].astype(np.int32)
        hashes = url_hash[new_idx]

        # robots gate + enqueue, grouped by host (vectorized per group)
        blocked_total = 0
        uniq_hosts, inv = np.unique(hosts, return_inverse=True)
        for gi, h in enumerate(uniq_hosts):
            g = np.flatnonzero(inv == gi)
            prefixes = self.robots.get(h, ((), self.default_delay))[0]
            if prefixes:
                pref_full = tuple(f"http://{h}{p}" for p in prefixes)
                keep = np.fromiter(
                    (not u.startswith(pref_full) for u in urls[g]),
                    dtype=bool,
                    count=len(g),
                )
                blocked_total += int((~keep).sum())
                g = g[keep]
            if len(g):
                s_count = self.salted_hosts.get(h, 1)
                if s_count <= 1:
                    self.queues.setdefault(h, []).append(
                        (prios[g], hashes[g], urls[g], depths[g])
                    )
                else:
                    salt = (hashes[g] % np.uint64(s_count)).astype(np.int64)
                    for j in np.unique(salt):
                        sub = g[salt == j]
                        self.queues.setdefault(f"{h}#{j}", []).append(
                            (prios[sub], hashes[sub], urls[sub], depths[sub])
                        )
                self._mem_rows += len(g)
        counts["robots_blocked"] = blocked_total
        counts["admitted"] = len(new_idx) - blocked_total
        # mark everything (admitted + robots-blocked) seen
        self._probe_insert(hashes)
        self._maybe_spill()
        self._merge_counts(counts)
        return counts

    def _maybe_spill(self) -> None:
        if self.max_queue_rows is None or self._mem_rows <= self.max_queue_rows:
            return
        os.makedirs(self.spill_dir, exist_ok=True)
        # spill the largest hosts' in-memory runs until back under the bound
        by_size = sorted(
            self.queues.items(), key=lambda kv: -sum(len(r[0]) for r in kv[1])
        )
        for h, runs in by_size:
            if self._mem_rows <= self.max_queue_rows:
                break
            rows = sum(len(r[0]) for r in runs)
            path = os.path.join(
                self.spill_dir, f"s{self.partition_id:05d}_{self._spill_seq:08d}.pkl"
            )
            self._spill_seq += 1
            with open(path, "wb") as f:
                pickle.dump(runs, f, protocol=pickle.HIGHEST_PROTOCOL)
            self.spilled.setdefault(h, []).append((path, rows))
            del self.queues[h]
            self._mem_rows -= rows

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
        u_parts, h_parts, host_parts, p_parts, d_parts, s_parts = [], [], [], [], [], []
        hosts_with_rows = {k for k, q in self.queues.items() if q} | set(self.spilled)
        for qkey in sorted(hosts_with_rows):
            h, _, saltpart = qkey.partition("#")
            runs = list(self.queues.get(qkey, ()))
            for path, _rows in self.spilled.pop(qkey, ()):
                with open(path, "rb") as f:
                    runs.extend(pickle.load(f))
            prio = np.concatenate([r[0] for r in runs])
            uh = np.concatenate([r[1] for r in runs])
            uu = np.concatenate([r[2] for r in runs])
            dd = np.concatenate([r[3] for r in runs])
            # (priority desc, url_hash asc) — one vectorized sort per host per
            # wave instead of per-item heap ops
            order = np.lexsort((uh, -prio))
            delay = self.robots.get(h, ((), self.default_delay))[1]
            budget = max(1, int(wave_duration // delay))
            if saltpart:
                # sub-shard j of s fills interleaved slots on the host's
                # politeness grid, rotated per wave for fairness
                j = int(saltpart)
                s_count = self.salted_hosts.get(h, 1)
                offset = (j + t) % s_count
                slots = np.arange(offset, budget, s_count, dtype=np.int64)
            else:
                slots = np.arange(budget, dtype=np.int64)
            take = order[: len(slots)]
            rest = order[len(slots):]
            self._mem_rows -= sum(len(r[0]) for r in self.queues.get(qkey, ()))
            if len(rest):
                self.queues[qkey] = [(prio[rest], uh[rest], uu[rest], dd[rest])]
                self._mem_rows += len(rest)
            else:
                self.queues.pop(qkey, None)
            k = len(take)
            u_parts.append(uu[take])
            h_parts.append(uh[take])
            host_parts.append(np.full(k, h, dtype=object))
            p_parts.append(prio[take])
            d_parts.append(dd[take])
            s_parts.append(wave_start + slots[:k].astype(np.float64) * delay)
        if u_parts:
            urls = np.concatenate(u_parts)
            hashes = np.concatenate(h_parts)
            hosts = np.concatenate(host_parts)
            prios = np.concatenate(p_parts)
            depths = np.concatenate(d_parts)
            sched = np.concatenate(s_parts)
        else:
            urls = hashes = hosts = prios = depths = sched = np.empty(0)
        self._wave_counts["fetched"] = len(urls)
        self.metrics_rows.append(
            {"partition_id": self.partition_id, "wave": t, **self._wave_counts}
        )
        self._wave_counts = self._zero_counts()
        self.wave = t + 1

        tbl = pa.table(
            {
                "url_canon": pa.array(list(urls), type=pa.string()),
                "url_hash": pa.array(hashes.astype(np.uint64)),
                "host": pa.array(list(hosts), type=pa.string()),
                "partition_id": pa.array(
                    np.full(len(urls), self.partition_id, dtype=np.int32)
                ),
                "priority": pa.array(prios.astype(np.float32)),
                "depth": pa.array(depths.astype(np.int32)),
                "wave": pa.array(np.full(len(urls), t, dtype=np.int32)),
                "scheduled_t": pa.array(sched.astype(np.float64)),
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

    def next_wave_blocks(self, wave_duration: float = 8.0, max_block_rows: int = 1 << 30):
        """Generator form of next_wave for ``num_returns="dynamic"`` actor
        calls: yields the wave table in ≤max_block_rows slices so a hot
        shard's wave fans out across many fetch tasks instead of one."""
        tbl = self.next_wave(wave_duration)
        if tbl.num_rows == 0:
            return
        for i in range(0, tbl.num_rows, max_block_rows):
            yield tbl.slice(i, max_block_rows)

    # ------------------------------------------------------------------ state
    def queue_size(self) -> int:
        mem = sum(len(r[0]) for q in self.queues.values() for r in q)
        spilled = sum(rows for lst in self.spilled.values() for _, rows in lst)
        return mem + spilled

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
            "max_queue_rows": self.max_queue_rows,
            "spill_dir": self.spill_dir,
            "spill_seq": self._spill_seq,
            "spilled": self.spilled,
            "salted_hosts": self.salted_hosts,
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
        obj.max_queue_rows = state.get("max_queue_rows")
        obj.spill_dir = state.get("spill_dir")
        obj._spill_seq = state.get("spill_seq", 0)
        obj.spilled = state.get("spilled", {})
        obj.salted_hosts = state.get("salted_hosts", {})
        obj._mem_rows = sum(len(r[0]) for q in obj.queues.values() for r in q)
        return obj

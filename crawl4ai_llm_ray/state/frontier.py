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
  * offers land in a per-wave STAGING buffer; the wave barrier (next_wave)
    flushes staging into the queues with a max-priority-per-hash resolve, so
    the same URL discovered by two concurrent fetch tasks in the same wave at
    different depths resolves identically regardless of offer arrival order
    (matches the oracle's whole-wave batched offer);
  * seen/robots checks at offer time; robots rules match on the URL *path*
    (scheme-independent); robots-blocked URLs are marked seen and counted once;
  * wave ``t`` drains, per host, up to ``max(1, floor(wave_duration/delay))``
    URLs in (priority desc, url_hash asc) order, scheduled at
    ``t*wave_duration + k*delay``; a host with ``delay > wave_duration``
    fetches only on every ``ceil(delay/wave_duration)``-th wave — consecutive
    same-host fetches are always ≥ delay apart (the politeness invariant);
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
from .u64set import U64MaxMap, U64Set, keep_max_per_hash

# A shard whose expected URL count is below this uses a bloom probe instead of
# a cuckoo filter ("bloom fallback for cold shards") — the bloom is smaller and
# needs no kickout bookkeeping; exactness still comes from the U64Set confirm.
COLD_SHARD_THRESHOLD = 4096


def _take_urls_hosts(table: pa.Table, idx: np.ndarray):
    """Take (url_canon, host) rows by index, keeping URLs as an Arrow string
    Array and hosts as (int32 codes, unique-host list) via dictionary
    encoding — the offer path never materializes per-row Python strings."""
    take = pa.array(idx)
    urls = table["url_canon"].take(take)
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    hosts = table["host"].take(take)
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    hd = hosts.dictionary_encode()
    return urls, np.asarray(hd.indices), hd.dictionary.to_pylist()


def _concat_url_runs(runs) -> pa.Array:
    """Concatenate the Arrow url arrays of queue runs (single-run fast path)."""
    if len(runs) == 1:
        return runs[0][2]
    return pa.concat_arrays([r[2] for r in runs])


def _compact_runs(runs) -> list:
    """Materialize compact copies of runs' url arrays before PICKLING.
    Staging/queue runs hold zero-copy SLICES of the offer batch (the fast
    path), but pickling an Arrow slice serializes the slice's whole parent
    buffer (measured: 470 KB for an 8-row slice of an 8k-row batch) — spill
    files and checkpoints compact first. numpy views already pickle compact."""
    out = []
    for p, h, u, d in runs:
        out.append((p, h, u.take(pa.array(np.arange(len(u), dtype=np.int64))), d))
    return out


def _url_path(url: str) -> str:
    """Path component of a canonical URL ("/" when absent) — the scalar SPEC
    for the vectorized Arrow path extraction in ``offer``. Robots disallow
    prefixes match on the PATH, scheme-independently — matching the oracle
    (oracle/crawler.py) and real robots.txt semantics (an https URL must not
    bypass a '/private' disallow)."""
    return "/" + (url.split("/", 3)[3] if url.count("/") >= 3 else "")


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
        # per-WAVE staging: offers accumulate here and are flushed into
        # `queues` at the wave barrier with a max-priority-per-hash resolve —
        # concurrent fetch tasks' offer order cannot affect queue state.
        # stage_prio maps hashes admitted this wave to their best staged
        # priority, so a same-wave re-offer re-enters staging ONLY when it is
        # a strict priority upgrade (equal-priority duplicates are dropped).
        self.staging: dict[str, list] = {}
        self.stage_spilled: dict[str, list[tuple[str, int]]] = {}  # host → [(path, rows)]
        self.stage_prio = U64MaxMap()
        self._stage_rows = 0
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
        keep_idx = keep_max_per_hash(url_hash, priority)
        keep_idx.sort()  # stable-ish; selection only, order irrelevant below
        counts["deduped"] += n - len(keep_idx)

        sub_hash = url_hash[keep_idx]
        seen = self._seen_mask(sub_hash)
        counts["deduped"] += int(seen.sum())
        new_idx = keep_idx[~seen]
        # same-wave re-offers: a seen row re-enters staging iff its hash was
        # staged this wave AND it carries a strictly higher priority — the
        # wave barrier then resolves max-priority per hash order-independently
        # (the oracle batches a whole wave's discoveries into one offer with
        # in-batch max-priority dedup). Equal/lower-priority duplicates are
        # dropped here, keeping staging bounded by unique URLs per wave.
        restage_idx = np.empty(0, dtype=keep_idx.dtype)
        if seen.any():
            s_pos = np.flatnonzero(seen)
            best = self.stage_prio.get_batch(sub_hash[s_pos])
            upgrade = (best > -np.inf) & (
                priority[keep_idx[s_pos]].astype(np.float32) > best
            )
            restage_idx = keep_idx[s_pos[upgrade]]
        if len(new_idx) == 0 and len(restage_idx) == 0:
            self._merge_counts(counts)
            return counts

        depths_all = table["depth"].to_numpy(zero_copy_only=False)

        if len(new_idx):
            import pyarrow.compute as pc

            # URLs and hosts stay ARROW from offer to wave emission — no
            # .to_pylist()/object-array churn on the ingest hot path (the
            # drain's largest phase). Hosts are dictionary-encoded once per
            # offer: grouping below compares int32 codes, and only the few
            # UNIQUE host strings per batch become Python objects.
            urls_pa, host_codes, uniq_hosts = _take_urls_hosts(table, new_idx)
            prios = priority[new_idx].astype(np.float32)
            depths = depths_all[new_idx].astype(np.int32)
            hashes = url_hash[new_idx]

            # robots gate (match by PATH — scheme-independent, like the
            # oracle): paths extracted once per offer with one Arrow regex
            # kernel, per-host prefix checks via vectorized starts_with
            blocked_total = 0
            keep_rows = np.ones(len(new_idx), dtype=bool)
            if any(
                self.robots.get(h, ((), self.default_delay))[0] for h in uniq_hosts
            ):
                paths_pa = pc.replace_substring_regex(
                    urls_pa, r"^https?://[^/]*", ""
                )
                paths_pa = pc.if_else(
                    pc.equal(paths_pa, ""), pa.scalar("/"), paths_pa
                )
                for gi, h in enumerate(uniq_hosts):
                    prefixes = self.robots.get(h, ((), self.default_delay))[0]
                    if not prefixes:
                        continue
                    g = np.flatnonzero(host_codes == gi)
                    pg = paths_pa.take(pa.array(g))
                    blocked = np.zeros(len(g), dtype=bool)
                    for pref in prefixes:
                        blocked |= pc.starts_with(pg, pref).to_numpy(
                            zero_copy_only=False
                        )
                    blocked_total += int(blocked.sum())
                    keep_rows[g[blocked]] = False
            counts["robots_blocked"] = blocked_total
            counts["admitted"] = len(new_idx) - blocked_total
            k = np.flatnonzero(keep_rows)
            if len(k):
                if blocked_total:
                    urls_k = urls_pa.take(pa.array(k))
                    codes_k = host_codes[k]
                else:
                    urls_k, codes_k = urls_pa, host_codes
                self._enqueue_staging(
                    codes_k, uniq_hosts, prios[k], hashes[k], urls_k, depths[k]
                )
                self.stage_prio.add_batch(hashes[k], prios[k])
            # mark everything (admitted + robots-blocked) seen
            self._probe_insert(hashes)

        if len(restage_idx):
            r_urls, r_codes, r_uniq = _take_urls_hosts(table, restage_idx)
            r_prios = priority[restage_idx].astype(np.float32)
            self._enqueue_staging(
                r_codes,
                r_uniq,
                r_prios,
                url_hash[restage_idx],
                r_urls,
                depths_all[restage_idx].astype(np.int32),
            )
            self.stage_prio.add_batch(url_hash[restage_idx], r_prios)
        self._maybe_spill()
        self._merge_counts(counts)
        return counts

    def _enqueue_staging(
        self, host_codes, uniq_hosts, prios, hashes, urls, depths
    ) -> None:
        """Append rows to the wave's staging buffer, grouped by host (salted
        hosts spread over sub-queues keyed host#j). Hosts arrive as int32
        dictionary codes + the unique-host list; ``urls`` is an Arrow string
        Array — runs store (f32[], u64[], pa.Array, i32[]).

        Grouping is ONE stable sort by host code + contiguous zero-copy
        slices (numpy views / Arrow .slice), not a per-host index scan +
        take — with ~1000 hosts per offer batch the per-host loop was 70% of
        offer() wall. Slices are compacted at the pickle boundaries
        (_compact_runs) so spill/checkpoint sizes stay logical."""
        n = len(prios)
        if n == 0:
            return
        if len(uniq_hosts) == 1:
            bounds = np.array([0], dtype=np.int64)
            ends = np.array([n], dtype=np.int64)
        else:
            order = np.argsort(host_codes, kind="stable")
            host_codes = host_codes[order]
            prios, hashes, depths = prios[order], hashes[order], depths[order]
            urls = urls.take(pa.array(order))
            bounds = np.flatnonzero(np.r_[True, host_codes[1:] != host_codes[:-1]])
            ends = np.r_[bounds[1:], n]
        for b, e in zip(bounds, ends):
            h = uniq_hosts[int(host_codes[b])] if len(uniq_hosts) > 1 else uniq_hosts[0]
            b, e = int(b), int(e)
            cnt = e - b
            s_count = self.salted_hosts.get(h, 1)
            if s_count <= 1:
                self.staging.setdefault(h, []).append(
                    (prios[b:e], hashes[b:e], urls.slice(b, cnt), depths[b:e])
                )
            else:
                gh = hashes[b:e]
                salt = (gh % np.uint64(s_count)).astype(np.int64)
                for j in np.unique(salt):
                    sub = np.flatnonzero(salt == j) + b
                    self.staging.setdefault(f"{h}#{j}", []).append(
                        (
                            prios[sub],
                            hashes[sub],
                            urls.take(pa.array(sub)),
                            depths[sub],
                        )
                    )
            self._stage_rows += cnt

    def _flush_staging(self) -> None:
        """Wave barrier: resolve staged offers (max-priority per url_hash,
        order-independent) into the drain queues. Staged hashes are disjoint
        from already-queued hashes (the seen-set admits each hash once), so
        the resolve never needs to look at `queues`."""
        for qkey in sorted(set(self.staging) | set(self.stage_spilled)):
            runs = list(self.staging.get(qkey, ()))
            for path, _rows in self.stage_spilled.pop(qkey, ()):
                with open(path, "rb") as f:
                    runs.extend(pickle.load(f))
            prio = np.concatenate([r[0] for r in runs])
            uh = np.concatenate([r[1] for r in runs])
            uu = _concat_url_runs(runs)
            dd = np.concatenate([r[3] for r in runs])
            if len(runs) > 1:
                sel = keep_max_per_hash(uh, prio)
                prio, uh, dd = prio[sel], uh[sel], dd[sel]
                uu = uu.take(pa.array(sel))
            self.queues.setdefault(qkey, []).append((prio, uh, uu, dd))
            self._mem_rows += len(prio)
        self.staging = {}
        self.stage_prio = U64MaxMap()
        self._stage_rows = 0
        self._maybe_spill()

    def _maybe_spill(self) -> None:
        if self.max_queue_rows is None:
            return
        total = self._mem_rows + self._stage_rows
        if total <= self.max_queue_rows:
            return
        os.makedirs(self.spill_dir, exist_ok=True)
        # spill the largest in-memory hosts' runs (queued AND staged) until
        # back under the bound; spill files are immutable, reloaded at drain
        # (queues) or at the wave-barrier flush (staging)
        cands = [("q", h, runs) for h, runs in self.queues.items()] + [
            ("s", h, runs) for h, runs in self.staging.items()
        ]
        cands.sort(key=lambda kv: -sum(len(r[0]) for r in kv[2]))
        for kind, h, runs in cands:
            if total <= self.max_queue_rows:
                break
            rows = sum(len(r[0]) for r in runs)
            path = os.path.join(
                self.spill_dir, f"s{self.partition_id:05d}_{self._spill_seq:08d}.pkl"
            )
            self._spill_seq += 1
            with open(path, "wb") as f:
                pickle.dump(_compact_runs(runs), f, protocol=pickle.HIGHEST_PROTOCOL)
            if kind == "q":
                self.spilled.setdefault(h, []).append((path, rows))
                del self.queues[h]
                self._mem_rows -= rows
            else:
                self.stage_spilled.setdefault(h, []).append((path, rows))
                del self.staging[h]
                self._stage_rows -= rows
            total -= rows

    def _merge_counts(self, counts: dict) -> None:
        for k, v in counts.items():
            self._wave_counts[k] = self._wave_counts.get(k, 0) + v

    # -------------------------------------------------------------- next_wave
    def next_wave(self, wave_duration: float = 8.0) -> pa.Table:
        """Drain the politeness-eligible top of every host queue for the next
        wave. Returns a WAVE_SCHEMA table sorted by (scheduled_t, host,
        url_hash); advances the shard's wave counter and seals metrics."""
        import math

        t = self.wave
        self._flush_staging()
        wave_start = t * wave_duration
        u_parts, h_parts, p_parts, d_parts, s_parts = [], [], [], [], []
        host_names, host_counts = [], []
        hosts_with_rows = {k for k, q in self.queues.items() if q} | set(self.spilled)
        for qkey in sorted(hosts_with_rows):
            h, _, saltpart = qkey.partition("#")
            delay = self.robots.get(h, ((), self.default_delay))[1]
            n_rows = sum(len(r[0]) for r in self.queues.get(qkey, ())) + sum(
                rows for _, rows in self.spilled.get(qkey, ())
            )
            # politeness stride: a host with delay > wave_duration fetches only
            # on every ceil(delay/wave_duration)-th wave (slot at wave start) —
            # consecutive fetches land stride*wave_duration ≥ delay apart.
            # Pure function of (t, delay): no cross-wave or cross-shard state,
            # so salted sub-shards on different shards agree without talking.
            # A robots "Crawl-delay: 0" (valid, means unconstrained) drains
            # the whole queue this wave instead of dividing by zero.
            if delay <= 0:
                stride, budget, delay = 1, n_rows, 0.0
            else:
                stride = math.ceil(delay / wave_duration)
                budget = max(1, int(wave_duration // delay))
            if stride > 1 and t % stride != 0:
                continue
            # never materialize more slots than queued rows — budget is
            # wave_duration/delay, which a virtual-time caller can make
            # astronomically large (np.arange(1e9) would allocate 8 GB)
            if saltpart:
                # sub-shard j of s fills interleaved slots on the host's
                # politeness grid, rotated per FETCH OPPORTUNITY (t // stride)
                # for fairness — rotating by t itself would alias with the
                # stride for slow hosts (stride == s_count ⇒ one sub-queue
                # gets every slot and the others starve forever)
                j = int(saltpart)
                s_count = self.salted_hosts.get(h, 1)
                offset = (j + t // stride) % s_count
                n_slots = max(0, -(-(budget - offset) // s_count)) if budget > offset else 0
                n_slots = min(n_slots, n_rows)
                slots = offset + np.arange(n_slots, dtype=np.int64) * s_count
            else:
                slots = np.arange(min(budget, n_rows), dtype=np.int64)
            if len(slots) == 0:
                # this sub-queue gets no fetch slot this opportunity: skip
                # BEFORE touching spilled runs — loading + re-spilling them
                # for a zero-row take is pure I/O churn (the stub stays put)
                continue
            runs = list(self.queues.get(qkey, ()))
            for path, _rows in self.spilled.pop(qkey, ()):
                with open(path, "rb") as f:
                    runs.extend(pickle.load(f))
            prio = np.concatenate([r[0] for r in runs])
            uh = np.concatenate([r[1] for r in runs])
            uu = _concat_url_runs(runs)
            dd = np.concatenate([r[3] for r in runs])
            # (priority desc, url_hash asc) — one vectorized sort per host per
            # wave instead of per-item heap ops
            order = np.lexsort((uh, -prio))
            take = order[: len(slots)]
            rest = order[len(slots):]
            self._mem_rows -= sum(len(r[0]) for r in self.queues.get(qkey, ()))
            if len(rest):
                self.queues[qkey] = [
                    (prio[rest], uh[rest], uu.take(pa.array(rest)), dd[rest])
                ]
                self._mem_rows += len(rest)
            else:
                self.queues.pop(qkey, None)
            k = len(take)
            u_parts.append(uu.take(pa.array(take)))
            h_parts.append(uh[take])
            host_names.append(h)
            host_counts.append(k)
            p_parts.append(prio[take])
            d_parts.append(dd[take])
            s_parts.append(wave_start + slots[:k].astype(np.float64) * delay)
        if u_parts:
            # URLs stayed Arrow end-to-end: the wave column is a zero-copy
            # concat of the per-host takes. The host column is #unique-hosts
            # Python strings repeated, never one object per row.
            urls_col = pa.concat_arrays(u_parts)
            hashes = np.concatenate(h_parts)
            hosts_col = pa.array(
                np.repeat(np.array(host_names, dtype=object), host_counts),
                type=pa.string(),
            )
            prios = np.concatenate(p_parts)
            depths = np.concatenate(d_parts)
            sched = np.concatenate(s_parts)
        else:
            urls_col = pa.array([], type=pa.string())
            hosts_col = pa.array([], type=pa.string())
            hashes = prios = depths = sched = np.empty(0)
        n_out = len(urls_col)
        self._wave_counts["fetched"] = n_out
        self.metrics_rows.append(
            {"partition_id": self.partition_id, "wave": t, **self._wave_counts}
        )
        self._wave_counts = self._zero_counts()
        self.wave = t + 1

        tbl = pa.table(
            {
                "url_canon": urls_col,
                "url_hash": pa.array(hashes.astype(np.uint64)),
                "host": hosts_col,
                "partition_id": pa.array(
                    np.full(n_out, self.partition_id, dtype=np.int32)
                ),
                "priority": pa.array(prios.astype(np.float32)),
                "depth": pa.array(depths.astype(np.int32)),
                "wave": pa.array(np.full(n_out, t, dtype=np.int32)),
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
        spilled = sum(
            rows
            for d in (self.spilled, self.stage_spilled)
            for lst in d.values()
            for _, rows in lst
        )
        return mem + spilled + self._stage_rows

    def seen_hashes(self) -> np.ndarray:
        return self.exact.to_numpy()

    def persist_seen(self, out_dir: str) -> str:
        """Write this shard's seen-set as its own parquet partition. At scale
        the driver must never concatenate raw hashes (~80 GB at 10^10 URLs);
        each shard owns `seen/part-{pid}.parquet` and the union is just the
        directory."""
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"part-{self.partition_id:05d}.parquet")
        tmp = path + f".tmp{self.partition_id}"
        pq.write_table(
            pa.table({"url_hash": pa.array(self.exact.to_numpy())}), tmp
        )
        os.replace(tmp, path)
        return path

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
            # compact url slices before pickling (see _compact_runs)
            "queues": {h: _compact_runs(r) for h, r in self.queues.items()},
            "wave": self.wave,
            "metrics_rows": self.metrics_rows,
            "robots": self.robots,
            "max_queue_rows": self.max_queue_rows,
            "spill_dir": self.spill_dir,
            "spill_seq": self._spill_seq,
            "spilled": self.spilled,
            "salted_hosts": self.salted_hosts,
            "staging": {h: _compact_runs(r) for h, r in self.staging.items()},
            "stage_spilled": self.stage_spilled,
            "stage_prio": self.stage_prio.to_bytes(),
            # in-flight counters offered since the last wave seal: without
            # them a resume seals the next metrics row with zeros and the
            # metrics artifact diverges from an uninterrupted run
            "wave_counts": self._wave_counts,
        }
        path = os.path.join(ckpt_dir, f"shard_{self.partition_id:05d}.ckpt")
        fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)  # atomic commit point (vs reference's non-atomic
        # file-then-index write, json_storage.py:199-221 — SURVEY §8 n.5)
        self._gc_spill_files()
        return path

    def _gc_spill_files(self) -> None:
        """Delete this shard's spill files not referenced by the CURRENT
        (just-committed) checkpoint state. The checkpoint is the only safe
        GC point: any resume reads the latest checkpoint, so files absent
        from it are unreachable — consumed runs otherwise accumulate one
        orphan .pkl per spill for the lifetime of a long bounded-memory
        crawl (each respill of the same rows writes a NEW file)."""
        if not self.spill_dir or not os.path.isdir(self.spill_dir):
            return
        live = {
            os.path.basename(p)
            for stubs in list(self.spilled.values())
            + list(self.stage_spilled.values())
            for p, _ in stubs
        }
        mine = f"s{self.partition_id:05d}_"
        for name in os.listdir(self.spill_dir):
            if name.startswith(mine) and name not in live:
                try:
                    os.remove(os.path.join(self.spill_dir, name))
                except OSError:
                    pass

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
        obj._wave_counts = state.get("wave_counts") or obj._zero_counts()
        obj.max_queue_rows = state.get("max_queue_rows")
        obj.spill_dir = state.get("spill_dir")
        obj._spill_seq = state.get("spill_seq", 0)
        obj.spilled = state.get("spilled", {})
        obj.salted_hosts = state.get("salted_hosts", {})
        obj.staging = state.get("staging", {})
        obj.stage_spilled = state.get("stage_spilled", {})
        obj.stage_prio = U64MaxMap.from_bytes(state.get("stage_prio", b""))
        obj._stage_rows = sum(len(r[0]) for q in obj.staging.values() for r in q)
        obj._mem_rows = sum(len(r[0]) for q in obj.queues.values() for r in q)
        return obj

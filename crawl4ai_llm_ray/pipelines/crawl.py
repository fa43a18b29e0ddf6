"""Wave-based distributed crawl driver (the flagship pipeline).

Replaces the reference's implied single-process crawl loop (SURVEY §3 E0;
contract at ``/root/reference/crawl4ai_llm/config.py:35-62``) with:

  seeds → canonicalize+hash (vectorized) → route by host_hash % P
    → P frontier-shard actors (cuckoo/bloom+exact seen set, robots gate,
       per-host politeness clock, priority queues)
    → per wave: shards emit politeness-ordered WAVE tables (zero driver
       materialization — ``ray.data.from_arrow_refs`` over actor-returned
       Arrow tables)
    → fetch+span-decompose via map_batches; discovered links loop back to
       the shards from inside the stage
    → docs written as wave-partitioned parquet (atomic tmp→rename)
    → start-of-wave checkpoints + manifest ⇒ exact resume.

Checkpoint protocol: at the top of wave ``t`` every shard snapshots its state
(before draining) and the manifest records ``next_wave = t`` plus lineage for
completed waves. A crash anywhere inside wave ``t`` resumes by restoring the
snapshots, deleting any partial wave-``t`` output, and re-running the wave —
deterministic, so the rerun is byte-identical. This fixes the reference's
non-atomic write-file-then-index crash window
(``/root/reference/crawl4ai_llm/storage/json_storage.py:199-221``).

Scale notes (10^10 frontier): P is the unit of state partitioning (4096 at
full scale → ~2.4M URLs/shard ≈ 8 MB cuckoo + 20 MB exact set); wave tables
are narrow (5 small cols + url string); docs stream straight to parquet and
never accumulate; hot hosts are bounded by the politeness budget per wave
(a host can contribute at most floor(wave_duration/delay) rows per wave —
built-in skew clamp), and queue growth is bounded by the seen-set dedup.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..sources.synth import SynthWebConfig, _pages_per_host, robots_rules, seed_table
from ..stages.canonicalize import canonicalize_batch
from ..stages.fetch import FetcherWorker
from ..state.frontier import FrontierShard


@dataclass
class CrawlResult:
    out_dir: str
    n_waves: int
    n_docs: int
    seen_dir: str  # partitioned per-shard seen-set ("" when not persisted)
    metrics: pa.Table
    wave_counts: list[int] = field(default_factory=list)
    phase_secs: dict = field(default_factory=dict)  # telemetry: where time went

    @property
    def seen_hashes(self) -> np.ndarray:
        """Sorted union of all shards' seen hashes. Loads the partitioned
        parquet — test/small-scale convenience only; at 10^10 URLs consume
        the `seen_dir` partitions as a Dataset instead."""
        import pyarrow.parquet as pq

        if not self.seen_dir or not os.path.isdir(self.seen_dir):
            return np.empty(0, dtype=np.uint64)
        t = pq.read_table(self.seen_dir, columns=["url_hash"])
        return np.sort(t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64))


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_ckpt", "MANIFEST.json")


def _wave_name_re(template: str):
    """Regex matching directory names produced by ``template`` with the wave
    number captured — e.g. 'wave_{wave:05d}' → ^wave_(\\d+)$. The engine's
    analog of the reference's ``filename_template`` ('{product_id}.json',
    ``/root/reference/crawl4ai_llm/config.py:29``) applied to wave-partitioned
    output dirs."""
    import re

    return re.compile(
        "^" + re.sub(r"\\\{wave[^}]*\\\}", r"(\\d+)", re.escape(template)) + "$"
    )


def run_crawl(
    cfg: SynthWebConfig,
    out_dir: str,
    n_partitions: int = 8,
    wave_duration: float = 8.0,
    fetch_concurrency: int = 4,
    batch_size: int = 1024,
    max_waves: int | None = None,
    resume: bool = False,
    expected_urls_per_shard: int = 1 << 15,
    checkpoint_interval: int = 1,
    wave_block_rows: int = 4096,
    inline_wave_rows: int = 2000,
    small_wave_rows: int = 40000,
    max_queue_rows: int | None = None,
    max_retries: int = 3,
    salted_hosts: dict[str, int] | None = None,
    wave_dir_template: str = "wave_{wave:05d}",
    fetch_fn=None,
    extra_seed_urls: list[str] | None = None,
) -> CrawlResult:
    """Run (or resume) the crawl. Ray must already be initialised.

    ``wave_dir_template`` names each wave's output directory (must contain a
    ``{wave...}`` field) — the engine analog of the reference's
    ``filename_template`` storage option. ``fetch_fn`` swaps the transport
    (default: deterministic synthetic web; stages/http_fetch.HttpFetchFn for
    real HTTP). ``extra_seed_urls`` (resume only) injects NEW seeds into a
    restored frontier at depth 0 — the continuous-crawl path: already-seen
    URLs dedupe against the restored seen set, new ones join the next wave's
    priority drain; the final fetched-URL set equals a from-scratch crawl of
    the union seed list (fetched-SET order-independence is the engine's
    determinism invariant — asserted in test_crawl_parity)."""
    import re as _re

    import ray
    import ray.data as rd

    if not _re.search(r"\{wave[^}]*\}", wave_dir_template):
        # without a {wave...} field every wave targets the same dir (the
        # atomic os.replace onto a non-empty dir fails) and resume's
        # _wave_name_re has no capture group — fail fast instead
        raise ValueError(
            "wave_dir_template must contain a '{wave...}' format field, "
            f"got {wave_dir_template!r}"
        )

    robots = robots_rules(cfg)
    ckpt_dir = os.path.join(out_dir, "_ckpt")
    docs_dir = os.path.join(out_dir, "docs")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(docs_dir, exist_ok=True)

    # shard actors are short-burst bookkeeping: reserve NO CPU so P shards
    # never starve the fetch stage of scheduling slots (they would deadlock a
    # small cluster otherwise); their vectorized work is brief enough that
    # oversubscription is harmless
    ShardActor = ray.remote(num_cpus=0)(FrontierShard)

    manifest = None
    if resume and os.path.exists(_manifest_path(out_dir)):
        with open(_manifest_path(out_dir)) as f:
            manifest = json.load(f)
    if extra_seed_urls and manifest is None:
        raise ValueError(
            "extra_seed_urls requires resume=True over an existing checkpoint "
            "(fresh runs take their seeds from cfg)"
        )

    if manifest is None:
        # fresh (non-resume) start into a possibly-dirty out_dir: wipe stale
        # wave output, checkpoints and lineage from any earlier run — else the
        # atomic tmp→rename wave commit hits an existing non-empty wave dir
        # and stale artifacts (seen parts, lineage) leak into the new run's
        # results (ADVICE r2)
        shutil.rmtree(docs_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        os.makedirs(docs_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        shards = [
            ShardActor.remote(
                p,
                n_partitions,
                robots,
                expected_urls=expected_urls_per_shard,
                max_queue_rows=max_queue_rows,
                spill_dir=os.path.join(ckpt_dir, "spill"),
                salted_hosts=salted_hosts,
            )
            for p in range(n_partitions)
        ]
        # seed the frontier: canonicalize+route on the driver (seeds are tiny;
        # at real scale this is a map_batches over a seed parquet — same code)
        seeds = canonicalize_batch(
            seed_table(cfg), n_partitions, salted_hosts=salted_hosts
        )
        pid = seeds["partition_id"].to_numpy(zero_copy_only=False)
        ray.get(
            [
                shards[int(p)].offer.remote(seeds.filter(pa.array(pid == p)))
                for p in np.unique(pid)
            ]
        )
        start_wave = 0
    else:
        assert manifest["n_partitions"] == n_partitions, (
            "resume must use the checkpointed partition count"
        )
        start_wave = manifest["next_wave"]
        shards = []
        for p in range(n_partitions):
            path = os.path.join(ckpt_dir, f"shard_{p:05d}.ckpt")
            shards.append(_restore_shard_actor(ShardActor, path))
        # wipe any output at/after the checkpointed wave (with
        # checkpoint_interval > 1 several completed-but-unckpt'ed waves are
        # deterministically re-run)
        wave_re = _wave_name_re(wave_dir_template)
        for name in os.listdir(docs_dir):
            m = wave_re.match(name)
            if name.startswith(".tmp_") or (m and int(m.group(1)) >= start_wave):
                shutil.rmtree(os.path.join(docs_dir, name), ignore_errors=True)
        if extra_seed_urls:
            # continuous crawl: new depth-0 seeds into the restored frontier,
            # through the same canonicalize+route+offer path as fresh seeds
            # (the restored seen set dedupes re-offered URLs)
            from ..schema import SEED_SCHEMA

            extra = pa.table(
                {
                    "url": pa.array(extra_seed_urls, type=pa.string()),
                    "priority": np.ones(len(extra_seed_urls), dtype=np.float32),
                    "depth": np.zeros(len(extra_seed_urls), dtype=np.int32),
                },
                schema=SEED_SCHEMA,
            )
            new_seeds = canonicalize_batch(
                extra, n_partitions, salted_hosts=salted_hosts
            )
            pid = new_seeds["partition_id"].to_numpy(zero_copy_only=False)
            ray.get(
                [
                    shards[int(p)].offer.remote(new_seeds.filter(pa.array(pid == p)))
                    for p in np.unique(pid)
                ]
            )

    import time as _time

    phase = {"queue_poll": 0.0, "checkpoint": 0.0, "drain": 0.0, "fetch_write": 0.0, "bookkeep": 0.0}
    wave_counts: list[int] = []
    t = start_wave
    stopped_early = False
    while True:
        if max_waves is not None and t >= start_wave + max_waves:
            stopped_early = True
            break
        t0 = _time.time()
        qs = ray.get([s.queue_size.remote() for s in shards])
        phase["queue_poll"] += _time.time() - t0
        if sum(qs) == 0:
            break
        # Tail waves (BFS stragglers) are not worth a Dataset execution's
        # fixed cost (executor spin-up ~0.2-1s): tiny waves run inline on the
        # driver, mid-size waves as plain Ray tasks over the same blocks and
        # the same FetcherWorker — identical semantics, cheaper launch. Big
        # waves use the Dataset path (streaming executor + backpressure).
        inline_wave = sum(qs) <= inline_wave_rows
        small_wave = sum(qs) <= small_wave_rows

        # --- start-of-wave checkpoint (atomic) + manifest ---
        t0 = _time.time()
        if t % checkpoint_interval == 0:
            ray.get([s.checkpoint.remote(ckpt_dir) for s in shards])
            _write_manifest(out_dir, {"next_wave": t, "n_partitions": n_partitions})
        phase["checkpoint"] += _time.time() - t0

        worker = FetcherWorker(
            cfg,
            shards=shards,
            n_partitions=n_partitions,
            max_retries=max_retries,
            salted_hosts=salted_hosts,
            fetch_fn=fetch_fn,
        )
        wave_name = wave_dir_template.format(wave=t)
        tmp = os.path.join(docs_dir, f".tmp_{wave_name}")
        final = os.path.join(docs_dir, wave_name)
        shutil.rmtree(tmp, ignore_errors=True)

        if inline_wave:
            import pyarrow.parquet as pq

            from ..schema import WAVE_SCHEMA

            t0 = _time.time()
            tables = ray.get([s.next_wave.remote(wave_duration) for s in shards])
            nonempty = [x for x in tables if x.num_rows]
            # a wave can drain 0 rows with non-empty queues (every host
            # politeness-stride-skipped) — still commit an (empty) wave dir so
            # wave numbering/lineage stay dense and the crawl advances
            wave_tbl = (
                pa.concat_tables(nonempty) if nonempty else WAVE_SCHEMA.empty_table()
            )
            phase["drain"] += _time.time() - t0
            t0 = _time.time()
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(worker(wave_tbl), os.path.join(tmp, "part-0.parquet"))
            os.replace(tmp, final)
            phase["fetch_write"] += _time.time() - t0
        elif small_wave:
            t0 = _time.time()
            gens = [
                s.next_wave_blocks.options(num_returns="dynamic").remote(
                    wave_duration, wave_block_rows
                )
                for s in shards
            ]
            refs = [r for g in ray.get(gens) for r in g]
            phase["drain"] += _time.time() - t0
            t0 = _time.time()
            os.makedirs(tmp, exist_ok=True)
            ray.get(
                [
                    _fetch_block_task.remote(
                        worker, r, os.path.join(tmp, f"part-{i}.parquet")
                    )
                    for i, r in enumerate(refs)
                ]
            )
            os.replace(tmp, final)
            phase["fetch_write"] += _time.time() - t0
        else:
            # --- drain wave t from every shard (politeness-ordered) ---
            # dynamic returns: a hot shard's wave arrives as several blocks so
            # the fetch stage's parallelism isn't capped at n_partitions
            t0 = _time.time()
            gens = [
                s.next_wave_blocks.options(num_returns="dynamic").remote(
                    wave_duration, wave_block_rows
                )
                for s in shards
            ]
            refs = [r for g in ray.get(gens) for r in g]
            phase["drain"] += _time.time() - t0

            t0 = _time.time()
            os.makedirs(tmp, exist_ok=True)
            if refs:
                # fused fetch+encode+write into the tmp wave dir (see
                # _FetchWriteTask); the atomic tmp→rename wave commit below is
                # unchanged, so a crash mid-wave still leaves no partial wave
                fetched = rd.from_arrow_refs(refs).map_batches(
                    _FetchWriteTask(worker, tmp),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    concurrency=fetch_concurrency,
                )
                fetched.sum("rows")
            os.replace(tmp, final)  # atomic wave commit
            phase["fetch_write"] += _time.time() - t0
            if os.environ.get("GRAFT_CRAWL_DEBUG"):
                print(f"[wave {t}] rows={sum(qs)} fetch_write={_time.time()-t0:.2f}s")
                if t == 6 and refs:
                    print(fetched.stats())
        t0 = _time.time()
        wave_counts.append(_count_wave_rows(final))
        _append_lineage(out_dir, t, final)
        phase["bookkeep"] += _time.time() - t0
        t += 1

    # seal trailing metrics (links offered during the final wave's fetch are
    # attributed to wave t, matching the oracle's labeling) — queues are
    # empty at a natural stop, so this drains nothing. Seal exactly ONCE per
    # completed crawl: a no-op resume of an already-sealed crawl must not
    # append another (zero) metrics row, and the manifest's next_wave must
    # track the shards' post-seal wave counter so a later extra-seed resume
    # stamps WAVE_SCHEMA rows with the same wave number the driver uses for
    # the output directory (they desynced by one before).
    already_sealed = bool(manifest and manifest.get("sealed"))
    do_seal = (not stopped_early) and (t > start_wave or not already_sealed)
    if do_seal:
        ray.get([s.next_wave.remote(wave_duration) for s in shards])
    # seal final checkpoint so a subsequent resume is a no-op continue
    ray.get([s.checkpoint.remote(ckpt_dir) for s in shards])
    _write_manifest(
        out_dir,
        {
            # post-seal the shards' wave counter sits at t+1 — the manifest
            # must match so a later extra-seed resume numbers its output
            # directory the same as the rows it stamps
            "next_wave": t + 1 if do_seal else t,
            "n_partitions": n_partitions,
            "sealed": not stopped_early,
        },
    )

    metrics = pa.concat_tables(ray.get([s.metrics_table.remote() for s in shards]))
    # per-shard seen persistence: each shard writes its own partition — raw
    # hashes never transit or concatenate on the driver (≈80 GB at 10^10 URLs).
    # Clear the dir first: a rerun into an existing out_dir with FEWER
    # partitions would otherwise leave stale part files that get unioned into
    # seen_hashes / crawl_seen_set
    seen_dir = os.path.join(out_dir, "seen")
    shutil.rmtree(seen_dir, ignore_errors=True)
    ray.get([s.persist_seen.remote(seen_dir) for s in shards])
    for s in shards:
        ray.kill(s)
    # persist the small summary tables (queryable artifacts of the run)
    import pyarrow.parquet as pq

    pq.write_table(metrics, os.path.join(out_dir, "metrics.parquet"))
    wave_re = _wave_name_re(wave_dir_template)
    n_docs = sum(
        _count_wave_rows(os.path.join(docs_dir, d))
        for d in os.listdir(docs_dir)
        if wave_re.match(d)
    )
    return CrawlResult(
        out_dir=out_dir,
        n_waves=t,
        n_docs=int(n_docs),
        seen_dir=seen_dir,
        metrics=metrics,
        wave_counts=wave_counts,
        phase_secs={k: round(v, 2) for k, v in phase.items()},
    )


class _FetchWriteTask:
    """Fused fetch + span-decompose + parquet-encode + write for one batch.

    Ray Data does NOT fuse the capped MapBatches(FetcherWorker) operator with
    the Write operator here (both carry explicit concurrency), so the wide
    interleaved span table (~12 MB per 8k-row block, ~1 GB per drain) would
    make a full object-store round-trip between the two operators — on this
    box's ~140 MB/s fresh-page path that inter-operator hop alone costs more
    than fetch + encode combined. Writing inside the stage keeps each block
    in the worker's heap from fetch to file; the stage emits only a tiny
    (path, rows) manifest row, which also makes the output layout resumable
    per block. Dictionary encoding and statistics are off: span text/refs are
    high-cardinality (dictionary build is pure overhead) and the docs table
    is scanned, not predicate-pruned, downstream.

    File names are deterministic per block content (first url_hash + row
    count — blocks partition disjoint URL sets, so the first hash is unique
    across blocks), written tmp→rename so a re-run of a failed task can never
    leave a torn file."""

    _EMPTY = pa.table(
        {"path": pa.array([], type=pa.string()), "rows": pa.array([], type=pa.int64())}
    )

    def __init__(self, worker: FetcherWorker, out_dir: str):
        self.worker = worker
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = self.worker(batch)
        n = out.num_rows
        if n == 0:
            return self._EMPTY
        name = f"part-{int(out['url_hash'][0].as_py()):016x}-{n}.parquet"
        path = os.path.join(self.out_dir, name)
        pq.write_table(
            out,
            path + ".tmp",
            compression="snappy",
            use_dictionary=False,
            write_statistics=False,
        )
        os.replace(path + ".tmp", path)
        return pa.table({"path": [path], "rows": pa.array([n], type=pa.int64())})


import ray as _ray


@_ray.remote
def _fetch_block_task(worker, tbl: pa.Table, path: str) -> int:
    """Raw-task fetch of one wave block (small-wave path): same FetcherWorker
    body as the Dataset path, one parquet fragment per block."""
    import pyarrow.parquet as pq

    out = worker(tbl)
    pq.write_table(out, path)
    return out.num_rows


def _restore_shard_actor(ShardActor, ckpt_path: str):
    """Construct a shard actor from a checkpoint (restore happens inside the
    actor process — the checkpoint bytes never transit the driver)."""
    return ShardActor.remote(0, 1, {}, restore_from=ckpt_path)


def _write_manifest(out_dir: str, data: dict) -> None:
    path = _manifest_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, path)


def _append_lineage(out_dir: str, wave: int, wave_dir: str) -> None:
    """Per-wave lineage record: which output fragments wave t produced."""
    files = sorted(os.listdir(wave_dir))
    with open(os.path.join(out_dir, "_ckpt", "LINEAGE.jsonl"), "a") as f:
        f.write(json.dumps({"wave": wave, "dir": wave_dir, "files": files}) + "\n")


def _count_wave_rows(wave_dir: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(wave_dir):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(wave_dir, name)).metadata.num_rows
    return total


def run_frontier_drain(
    cfg: SynthWebConfig,
    out_dir: str,
    n_partitions: int = 16,
    wave_duration: float = 65536.0,
    fetch_concurrency: int = 32,
    batch_size: int = 4096,
    wave_block_rows: int = 4096,
    dup_factor: float = 0.25,
    expected_urls_per_shard: int = 1 << 17,
) -> CrawlResult:
    """Drain benchmark (the BASELINE.json headline metric shape): a known
    frontier of every corpus URL — plus ``dup_factor`` duplicate messy
    variants — is ingested through canonicalize+hash → shard-routed seen-set
    dedup (the fetched+DEDUPED part of the metric), then drained in
    politeness-ordered waves through the fetch+span-decompose stage with no
    link loopback. Pure streaming: frontier ingest is a Dataset map_batches
    that offers to shards; the drain is the same wave machinery as run_crawl.
    """
    import time as _time

    import ray
    import ray.data as rd

    robots = robots_rules(cfg)
    docs_dir = os.path.join(out_dir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    ShardActor = ray.remote(num_cpus=0)(FrontierShard)
    shards = [
        ShardActor.remote(p, n_partitions, robots, expected_urls=expected_urls_per_shard)
        for p in range(n_partitions)
    ]
    phase = {"ingest": 0.0, "drain": 0.0, "fetch_write": 0.0}

    # --- frontier ingest: enumerate all URLs + dup variants, canonicalize,
    # route, offer (the dedup stage) ---
    t0 = _time.time()
    npages = _pages_per_host(cfg)
    bounds = np.concatenate([[0], np.cumsum(npages)])
    total = int(bounds[-1])
    bounds_ref = ray.put(bounds)
    shards_ref = ray.put(shards)

    def make_urls(batch: dict) -> pa.Table:
        import pyarrow.compute as pc

        b = ray.get(bounds_ref)
        ids = batch["id"]
        hi = (np.searchsorted(b, ids, side="right") - 1).astype(np.int64)
        pj = (ids - b[hi]).astype(np.int64)
        # vectorized URL assembly (no per-row Python strings)
        hostpart = pc.binary_join_element_wise(
            "h", pc.utf8_lpad(pc.cast(pa.array(hi), pa.string()), 3, "0"), ".test", ""
        )
        urls = pc.binary_join_element_wise(
            "http://", hostpart, "/p/", pc.cast(pa.array(pj), pa.string()), ""
        )
        # dup_factor messy variants appended (dedup work for the seen set),
        # variant class chosen deterministically per id
        ndup = int(len(ids) * dup_factor)
        sel = slice(0, ndup)
        vkind = (ids[sel] % 4).astype(np.int64)
        upper_v = pc.binary_join_element_wise(
            "http://",
            pc.utf8_upper(hostpart.slice(0, ndup)),
            "/p/",
            pc.cast(pa.array(pj[sel]), pa.string()),
            "",
        )
        port_v = pc.binary_join_element_wise(
            "http://",
            hostpart.slice(0, ndup),
            ":80/p/",
            pc.cast(pa.array(pj[sel]), pa.string()),
            "",
        )
        slash_v = pc.binary_join_element_wise(urls.slice(0, ndup), "/", "")
        frag_v = pc.binary_join_element_wise(urls.slice(0, ndup), "#x", "")
        variants = upper_v
        for v, vals in ((1, port_v), (2, slash_v), (3, frag_v)):
            variants = pc.if_else(pa.array(vkind == v), vals, variants)
        all_urls = pa.concat_arrays([urls, variants])
        n = len(all_urls)
        return pa.table(
            {
                "url": all_urls,
                "priority": pa.array(np.ones(n, dtype=np.float32)),
                "depth": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    def route_and_offer(t: pa.Table) -> pa.Table:
        sh = ray.get(shards_ref)
        routed = canonicalize_batch(t, n_partitions)
        pid = routed["partition_id"].to_numpy(zero_copy_only=False)
        refs = [
            sh[int(p)].offer.remote(routed.filter(pa.array(pid == p)))
            for p in np.unique(pid)
        ]
        counts = ray.get(refs)
        return pa.table(
            {
                "offered": pa.array([sum(c["offered"] for c in counts)], type=pa.int64()),
                "admitted": pa.array([sum(c["admitted"] for c in counts)], type=pa.int64()),
            }
        )

    ingest = (
        rd.range(total)
        .map_batches(make_urls, batch_format="numpy", batch_size=batch_size)
        .map_batches(route_and_offer, batch_format="pyarrow", batch_size=batch_size)
        .sum(["offered", "admitted"])
    )
    offered = int(ingest["sum(offered)"])
    phase["ingest"] = _time.time() - t0

    # --- drain ALL waves up front (politeness order is virtual-time columns;
    # with no link loopback, wave t+1 never depends on wave t's fetches), then
    # fetch+decompose+write in ONE Dataset streaming execution — the priority
    # queue drained through the streaming executor with backpressure, no
    # per-wave barriers ---
    worker = FetcherWorker(cfg, shards=None, n_partitions=n_partitions)
    t = 0
    wave_counts = []
    all_refs = []
    t0 = _time.time()
    while True:
        qs = ray.get([s.queue_size.remote() for s in shards])
        if sum(qs) == 0:
            break
        gens = [
            s.next_wave_blocks.options(num_returns="dynamic").remote(
                wave_duration, wave_block_rows
            )
            for s in shards
        ]
        all_refs.extend(r for g in ray.get(gens) for r in g)
        wave_counts.append(sum(qs))
        t += 1
    phase["drain"] += _time.time() - t0

    t0 = _time.time()
    # fused fetch+encode+write (see _FetchWriteTask): one capped task pool
    # does the whole memory-bound path per block; only the tiny (path, rows)
    # manifest flows between operators
    manifest_ds = rd.from_arrow_refs(all_refs).map_batches(
        _FetchWriteTask(worker, docs_dir),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fetch_concurrency,
    )
    n_written = int(manifest_ds.sum("rows") or 0)
    phase["fetch_write"] += _time.time() - t0
    if os.environ.get("GRAFT_DRAIN_STATS"):
        print(manifest_ds.stats())

    metrics = pa.concat_tables(ray.get([s.metrics_table.remote() for s in shards]))
    for s in shards:
        ray.kill(s)
    res = CrawlResult(
        out_dir=out_dir,
        n_waves=t,
        n_docs=n_written,
        seen_dir="",
        metrics=metrics,
        wave_counts=wave_counts,
        phase_secs={k: round(v, 2) for k, v in phase.items()},
    )
    res.phase_secs["offered"] = offered
    return res


def read_docs(out_dir: str):
    """All fetched docs as a Dataset (lazy, streaming)."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, "docs"))


def crawl_order(out_dir: str) -> pa.Table:
    """Global crawl order: (seq, url_canon, wave, host, scheduled_t), the
    deterministic politeness ordering (see frontier.py contract)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(out_dir, "docs"),
        columns=["url_canon", "wave", "host", "scheduled_t", "url_hash"],
    )
    idx = pa.compute.sort_indices(
        tbl,
        sort_keys=[
            ("scheduled_t", "ascending"),
            ("host", "ascending"),
            ("url_hash", "ascending"),
        ],
    )
    tbl = tbl.take(idx)
    seq = pa.array(np.arange(tbl.num_rows, dtype=np.int64))
    return pa.table(
        {
            "seq": seq,
            "url_canon": tbl["url_canon"],
            "wave": tbl["wave"].combine_chunks().cast(pa.int32()),
            "host": tbl["host"],
            "scheduled_t": tbl["scheduled_t"],
        }
    )

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

from ..sources.synth import SynthWebConfig, robots_rules, seed_table
from ..stages.canonicalize import canonicalize_batch
from ..stages.fetch import FetcherWorker
from ..state.frontier import FrontierShard


@dataclass
class CrawlResult:
    out_dir: str
    n_waves: int
    n_docs: int
    seen_hashes: np.ndarray
    metrics: pa.Table
    wave_counts: list[int] = field(default_factory=list)


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_ckpt", "MANIFEST.json")


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
) -> CrawlResult:
    """Run (or resume) the crawl. Ray must already be initialised."""
    import ray
    import ray.data as rd

    robots = robots_rules(cfg)
    ckpt_dir = os.path.join(out_dir, "_ckpt")
    docs_dir = os.path.join(out_dir, "docs")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(docs_dir, exist_ok=True)

    ShardActor = ray.remote(FrontierShard)

    manifest = None
    if resume and os.path.exists(_manifest_path(out_dir)):
        with open(_manifest_path(out_dir)) as f:
            manifest = json.load(f)

    if manifest is None:
        shards = [
            ShardActor.remote(
                p, n_partitions, robots, expected_urls=expected_urls_per_shard
            )
            for p in range(n_partitions)
        ]
        # seed the frontier: canonicalize+route on the driver (seeds are tiny;
        # at real scale this is a map_batches over a seed parquet — same code)
        seeds = canonicalize_batch(seed_table(cfg), n_partitions)
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
        # wipe any partial output of the wave being re-run
        for name in os.listdir(docs_dir):
            if name.startswith(".tmp_wave_") or name == f"wave_{start_wave:05d}":
                shutil.rmtree(os.path.join(docs_dir, name), ignore_errors=True)

    wave_counts: list[int] = []
    t = start_wave
    stopped_early = False
    while True:
        if max_waves is not None and t >= start_wave + max_waves:
            stopped_early = True
            break
        qs = ray.get([s.queue_size.remote() for s in shards])
        if sum(qs) == 0:
            break

        # --- start-of-wave checkpoint (atomic) + manifest ---
        ray.get([s.checkpoint.remote(ckpt_dir) for s in shards])
        _write_manifest(out_dir, {"next_wave": t, "n_partitions": n_partitions})

        # --- drain wave t from every shard (politeness-ordered) ---
        refs = [s.next_wave.remote(wave_duration) for s in shards]
        wave_ds = rd.from_arrow_refs(refs)

        worker = FetcherWorker(cfg, shards=shards, n_partitions=n_partitions)
        fetched = wave_ds.map_batches(
            worker,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=fetch_concurrency,
        )
        tmp = os.path.join(docs_dir, f".tmp_wave_{t:05d}")
        final = os.path.join(docs_dir, f"wave_{t:05d}")
        shutil.rmtree(tmp, ignore_errors=True)
        fetched.write_parquet(tmp)
        os.replace(tmp, final)  # atomic wave commit
        wave_counts.append(_count_wave_rows(final))
        _append_lineage(out_dir, t, final)
        t += 1

    if not stopped_early:
        # seal trailing metrics (links offered during the final wave's fetch
        # are attributed to wave t, matching the oracle's labeling) — queues
        # are empty at a natural stop, so this drains nothing
        ray.get([s.next_wave.remote(wave_duration) for s in shards])
    # seal final checkpoint so a subsequent resume is a no-op continue
    ray.get([s.checkpoint.remote(ckpt_dir) for s in shards])
    _write_manifest(out_dir, {"next_wave": t, "n_partitions": n_partitions})

    metrics = pa.concat_tables(ray.get([s.metrics_table.remote() for s in shards]))
    seen = np.sort(np.concatenate(ray.get([s.seen_hashes.remote() for s in shards])))
    for s in shards:
        ray.kill(s)
    # persist the small summary tables (queryable artifacts of the run)
    import pyarrow.parquet as pq

    pq.write_table(metrics, os.path.join(out_dir, "metrics.parquet"))
    pq.write_table(
        pa.table({"url_hash": pa.array(seen)}), os.path.join(out_dir, "seen.parquet")
    )
    n_docs = sum(
        _count_wave_rows(os.path.join(docs_dir, d))
        for d in os.listdir(docs_dir)
        if d.startswith("wave_")
    )
    return CrawlResult(
        out_dir=out_dir,
        n_waves=t,
        n_docs=int(n_docs),
        seen_hashes=seen,
        metrics=metrics,
        wave_counts=wave_counts,
    )


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

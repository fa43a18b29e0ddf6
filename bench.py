"""Benchmark harness.

Headline: the flagship crawl pipeline — URLs fetched+deduped/sec on a
deterministic synthetic frontier (1000 hosts, Zipf-skewed, ~10^5 pages) —
plus representative data-processing pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "urls_per_sec": ...}

--scaling: runs the same bench twice in fresh processes at num_cpus=8 and 32
and reports both throughputs + scaling efficiency (the sandbox evidence for
the N → 4N cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# This VM faults-in fresh pages at ~140 MB/s; per-batch numpy/Arrow buffers
# must be REUSED, not returned to the OS, or every stage is page-fault-bound
# (measured 50x difference). Set before ray.init so workers inherit.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "filter_project",
    "agg_q1",
    "window_tumbling",
    "broadcast_join_agg",
    "dedup_exact_text",
    "minhash_lsh_pairs",
    "ann_topk",
    "embed_cosine_pairs",
    "asof_join",
    "range_join_count",
    "shared_passage_pairs",
    "tfidf_top_terms",       # r4: corpus-df keyword extraction (2 narrow shuffles)
    "decontaminate_ngrams",  # r4: broadcast benchmark-gram membership
    "bm25_topk",             # r4: two-pass sparse retrieval
    "unigram_logprob",       # r4: term-partitioned LM quality gate
    "kmeans_embed",          # r4: 3 streaming Lloyd's passes, exact int
    "cooccur_parts",         # r4: basket pair expansion over lineitem (largest table)
    "heavy_hitters_cms",     # r4: count-min partial sketches + candidate scan
    "global_rank_orders",    # r4: TeraSort range-partitioned exact ranking
    "weighted_sample_orders",  # late-r4: πps sample, per-batch top-k funnel
    "event_transitions",     # late-r4: user-partitioned ordered-pair counts
    "bloom_semi_join",       # late-r4: mergeable-sketch build + broadcast probe
    "pack_documents",        # late-r4: distributed prefix-sum scan
    "rolling_distinct_users",  # late-r4: interval-union diff-array window distinct
    "skyline_orders",        # late-r4: merge-closed Pareto reduction
]


SCALE = float(os.environ.get("GRAFT_BENCH_SCALE", "1.0"))


def bench_drain() -> dict:
    """Headline (BASELINE.json metric shape): URLs fetched+deduped/sec
    draining a known ~10^6-URL frontier (Zipf host skew, 25% dup variants)
    through canonicalize+hash → sharded cuckoo/exact seen-set dedup →
    politeness-ordered waves → fetch+span-decompose → parquet."""
    from crawl4ai_llm_ray.pipelines.crawl import run_frontier_drain
    from crawl4ai_llm_ray.sources.synth import SynthWebConfig

    cfg = SynthWebConfig(
        seed=42, n_hosts=1000, base_pages=int(120000 * SCALE), zipf_a=1.1
    )
    out = "/dev/shm/bench_drain"
    # shard count scales with the CPU budget (a 4N-node cluster runs 4N× the
    # frontier shards): shard actors are zero-CPU bookkeeping processes, so a
    # FIXED P would hand the low-parallelism run proportionally more
    # out-of-budget actor compute and skew the scaling denominator. Capped at
    # 8 on this box: its shared page-fault path saturates beyond ~8-16
    # concurrent workers (BASELINE.md), so more shards at 32 CPUs measure the
    # box, not the engine; the 2-vs-8 scaling pair stays proportional.
    n_partitions = max(2, min(8, NUM_CPUS))
    # the fetch+span-decompose+write stage is memory-bandwidth-bound on this
    # box (page-zeroing ~140 MB/s shared): size its concurrency to the node's
    # memory path, not the CPU budget. Round 2 (separate fetch and write
    # operators, 2 memory-heavy pools) peaked at 8; round 3's FUSED
    # fetch+encode+write stage halves the memory traffic per row and peaks at
    # 16 (interleaved min-of-3 A/B: 7.15 s @16 vs 8.09 s @8 — BASELINE.md).
    # The 2-vs-8-CPU scaling pair is below the cap either way, so the
    # proportionality of the scaling evidence is unchanged.
    fetch_conc = max(2, min(16, NUM_CPUS))
    # untimed warmup: spawn the worker pool and first-touch heap/plasma pages
    # (this VM zero-fills fresh pages at ~140 MB/s — see BASELINE.md; the
    # guide's "warm the OS page cache with one untimed read" applied to the
    # whole allocation path)
    warm_cfg = SynthWebConfig(seed=42, n_hosts=200, base_pages=3000, zipf_a=1.1)
    shutil.rmtree(out, ignore_errors=True)
    run_frontier_drain(
        warm_cfg, out, n_partitions=n_partitions, fetch_concurrency=fetch_conc, batch_size=8192
    )
    shutil.rmtree(out, ignore_errors=True)
    # min-of-3 timed runs: this box's shared page-fault path adds up to ±2.5x
    # run-to-run variance to memory-heavy pipelines (BASELINE.md env notes —
    # the same code measured 7.2 s and 19.3 s an hour apart); min-of-N is the
    # same low-noise protocol the scaling evidence uses
    dt = float("inf")
    res = None
    for _ in range(3):
        t0 = time.time()
        r = run_frontier_drain(
            cfg,
            out,
            n_partitions=n_partitions,
            fetch_concurrency=fetch_conc,
            batch_size=8192,
            # size per-shard seen-set state to the corpus (a real deployment
            # provisions state for its frontier; an undersized cuckoo regrows
            # by reinserting the shard's whole exact set — measured 10.5x
            # ingest blowup at GRAFT_BENCH_SCALE=4 before this)
            expected_urls_per_shard=max(
                1 << 17, int(120000 * SCALE * 7 * 1.3) // n_partitions
            ),
        )
        d = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)
        if d < dt:
            dt, res = d, r
    offered = res.phase_secs.get("offered", 0)
    return {
        "sec": round(dt, 2),
        "docs": res.n_docs,
        "offered_urls": int(offered),
        "waves": res.n_waves,
        "urls_per_sec": round(res.n_docs / dt, 1),
        "offered_per_sec": round(offered / dt, 1),
        "phases": res.phase_secs,
    }


def bench_crawl() -> dict:
    """Secondary: discovery-mode crawl (BFS via link loopback, checkpoints)."""
    from crawl4ai_llm_ray.pipelines.crawl import run_crawl
    from crawl4ai_llm_ray.sources.synth import SynthWebConfig

    cfg = SynthWebConfig(
        seed=42,
        n_hosts=1000,
        base_pages=12000,
        zipf_a=1.1,
        n_seeds=64,
        p_cross_host=0.25,
    )
    out = "/dev/shm/bench_crawl"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = run_crawl(
        cfg,
        out,
        n_partitions=8,
        wave_duration=4096.0,  # virtual politeness time: big waves, few barriers
        fetch_concurrency=max(2, min(8, NUM_CPUS)),  # memory-path-sized (see bench_drain)
        batch_size=4096,
        expected_urls_per_shard=1 << 16,
        checkpoint_interval=2,
    )
    dt = time.time() - t0
    offered = sum(r["offered"] for r in res.metrics.to_pylist())
    shutil.rmtree(out, ignore_errors=True)
    return {
        "sec": round(dt, 2),
        "docs": res.n_docs,
        "offered_urls": int(offered),
        "waves": res.n_waves,
        "urls_per_sec": round(res.n_docs / dt, 1),
        "offered_per_sec": round(offered / dt, 1),
    }


def bench_http_crawl() -> dict:
    """Wall-clock politeness drain over REAL HTTP (VERDICT r4 item 5): an
    in-process loopback server serves the synthetic web as JSON-lines spans;
    the crawl runs through stages/http_fetch.HttpFetchFn with a real
    ``min_interval_per_host`` pacing clock and per-path first-hit 503s that
    exercise the retry budget under fetch concurrency. Reports measured
    per-host request gaps from the SERVER's own timestamp log (not the
    client's) plus retry accounting — the politeness/retry evidence the
    virtual-time benches can't give."""
    import threading
    from collections import defaultdict
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from crawl4ai_llm_ray.pipelines.crawl import run_crawl
    from crawl4ai_llm_ray.sources.synth import SynthWebConfig, fetch_pages
    from crawl4ai_llm_ray.stages.http_fetch import HttpFetchFn, render_page

    cfg = SynthWebConfig(seed=7, n_hosts=12, base_pages=160, n_seeds=12, p_cross_host=0.2)
    interval = 0.02

    class Handler(BaseHTTPRequestHandler):
        times: dict[str, list] = defaultdict(list)
        counts: dict[str, int] = defaultdict(int)
        lock = threading.Lock()

        def log_message(self, *a):
            pass

        def do_GET(self):
            host = self.path.split("/", 2)[1]
            with self.lock:
                self.counts[self.path] += 1
                n_seen = self.counts[self.path]
                self.times[host].append(time.time())
            # first hit on every 8th page 503s: retry-budget exercise
            if n_seen == 1 and self.path.rsplit("/", 1)[-1].isdigit() and int(self.path.rsplit("/", 1)[-1]) % 8 == 0:
                self.send_response(503)
                self.end_headers()
                return
            out = fetch_pages(cfg, ["http:/" + self.path])
            spans = list(
                zip(
                    out["kind"].to_pylist(),
                    out["text"].to_pylist(),
                    out["media_ref"].to_pylist(),
                    (int(o) for o in out["offset"]),
                )
            )
            body = render_page(spans)
            self.send_response(int(out["status"][0]))
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]

    out = "/tmp/bench_http_crawl"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = run_crawl(
        cfg,
        out,
        n_partitions=2,
        fetch_concurrency=4,
        batch_size=512,
        wave_duration=1024.0,  # big virtual waves: the wall-clock pacing under
        # test is HttpFetchFn's min_interval_per_host, not the wave barrier
        expected_urls_per_shard=1 << 13,
        fetch_fn=HttpFetchFn(
            url_rewrite=lambda u: f"http://127.0.0.1:{port}/" + u.split("//", 1)[1],
            min_interval_per_host=interval,
            backoff=0.01,
            max_conn=4,
        ),
    )
    dt = time.time() - t0
    srv.shutdown()
    srv.server_close()  # release the listening socket (shutdown alone leaks it)
    # per-host observed pacing from the server log: gaps between consecutive
    # same-host requests. The per-worker wall clock only paces within a fetch
    # task (the frontier's virtual-time schedule is the cross-task law), so
    # report the distribution, and the in-window share ≥ interval.
    gaps = []
    for host, ts in Handler.times.items():
        ts = sorted(ts)
        gaps.extend(b - a for a, b in zip(ts, ts[1:]))
    n_503 = sum(1 for p, c in Handler.counts.items() if c > 1)
    total_req = sum(Handler.counts.values())
    shutil.rmtree(out, ignore_errors=True)
    gaps.sort()
    return {
        "sec": round(dt, 2),
        "docs": res.n_docs,
        "waves": res.n_waves,
        "http_requests": total_req,
        "retried_pages": n_503,
        "pacing_interval_s": interval,
        "host_gap_min_s": round(gaps[0], 4) if gaps else None,
        "host_gap_p10_s": round(gaps[len(gaps) // 10], 4) if gaps else None,
        "host_gap_median_s": round(gaps[len(gaps) // 2], 4) if gaps else None,
        "urls_per_sec": round(res.n_docs / dt, 1),
    }


def bench_queries(trials: int = 2) -> dict:
    """Min-of-N per query — the same low-noise protocol as the drain (this
    box's shared page-fault path gives memory-heavy queries ±2.5x single-trial
    variance; one trial is unusable as a number)."""
    import __ray_entry__ as e

    qs = e.queries()
    out = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            res = qs[name](SF_DIR)
            # consume (Datasets are lazy)
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    drain = bench_drain()
    if os.environ.get("GRAFT_BENCH_DRAIN_ONLY"):
        crawl, crawl_http, queries = {}, {}, {}
    else:
        crawl = bench_crawl()
        crawl_http = bench_http_crawl()
        queries = bench_queries()
    ray.shutdown()

    print(
        json.dumps(
            {
                "metric": "frontier drain: URLs fetched+deduped/sec on a ~10^6-URL "
                "synthetic frontier (1000 hosts, Zipf skew, 25% dup variants)",
                "value": drain["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "crawl": drain,
                "crawl_discovery": crawl,
                "crawl_http": crawl_http,
                "urls_per_sec": drain["urls_per_sec"],
            }
        )
    )


def scaling() -> None:
    """N vs 4N evidence for the north_rule scaling criterion. 2 vs 8 CPUs:
    this VM's kernel page-fault path saturates beyond ~8-16 concurrent
    workers (fresh-page zeroing measured at ~140 MB/s shared — see
    BASELINE.md), so 8→32 measures the box, not the engine; at 2→8 the
    drain pipeline is compute-bound and scaling reflects the architecture."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_DRAIN_ONLY="1"
        )
        # scaling pairs run a 2x corpus by default: after the cuckoo-insert
        # vectorization the 1x drain finishes in ~5 s at the hi level, and
        # fixed per-session costs (ray.init, Dataset startup, actor spawn —
        # ~2 s, identical at both levels, amortized away on any real run)
        # dominate the ratio. At 2x the engine's scaling is what's measured:
        # fetch_write alone measures 3.86x at 4x CPUs (BASELINE.md).
        env.setdefault("GRAFT_BENCH_SCALE", "2")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 2, 8
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    # single-VM wall times are noise-dominated (shared kernel page-fault
    # path; ±50% run-to-run observed) — take min-of-N as the low-noise
    # estimate, report all trials
    lo_secs = [run(lo)["crawl"]["sec"] for _ in range(trials)]
    hi_secs = [run(hi)["crawl"]["sec"] for _ in range(trials)]
    t_lo, t_hi = min(lo_secs), min(hi_secs)
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "frontier-drain scaling efficiency (fresh ray.init at "
                f"num_cpus={lo} vs {hi}, same input, min of {trials} trials)",
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "trials_lo": lo_secs,
                "trials_hi": hi_secs,
                "num_cpus_lo": lo,
                "num_cpus_hi": hi,
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()

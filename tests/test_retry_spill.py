"""Retry contract and bounded-queue spilling: both must leave the crawl
byte-identical to the oracle (retries are deterministic; spilling only moves
queue runs to disk)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from crawl4ai_llm_ray.oracle.crawler import oracle_crawl
from crawl4ai_llm_ray.pipelines.crawl import run_crawl
from crawl4ai_llm_ray.sources.synth import SynthWebConfig, fetch_pages
from crawl4ai_llm_ray.state.frontier import FrontierShard


class TestRetryModel:
    CFG = SynthWebConfig(seed=42, n_hosts=8, base_pages=30, p_transient_fail=0.2)

    def test_deterministic_failures(self):
        urls = [self.CFG.url(i % 8, 0) for i in range(8)]
        a = fetch_pages(self.CFG, urls, retries=3)
        b = fetch_pages(self.CFG, urls, retries=3)
        assert np.array_equal(a["status"], b["status"])
        assert np.array_equal(a["attempts"], b["attempts"])

    def test_retry_budget_matters(self):
        # more retries can only turn 503s into 200s, never the reverse
        urls = [
            self.CFG.url(h, p)
            for h in range(8)
            for p in range(self.CFG.n_pages(h))
        ]
        r0 = fetch_pages(self.CFG, urls, retries=0)
        r3 = fetch_pages(self.CFG, urls, retries=3)
        assert (r0["status"] == 503).sum() > (r3["status"] == 503).sum() > 0
        flipped = (r0["status"] == 503) & (r3["status"] == 200)
        assert flipped.any()
        assert not ((r0["status"] == 200) & (r3["status"] != 200)).any()
        # attempts consumed: 1 for clean pages, >1 for retried ones
        assert (r3["attempts"][r3["status"] == 200] >= 1).all()
        assert (r3["attempts"][flipped] > 1).all()

    @pytest.mark.usefixtures("ray_session")
    def test_crawl_parity_with_failures(self, tmp_path):
        golden = oracle_crawl(self.CFG, n_partitions=2)
        res = run_crawl(
            self.CFG,
            str(tmp_path / "out"),
            n_partitions=2,
            fetch_concurrency=2,
            expected_urls_per_shard=1024,
        )
        assert res.seen_hashes.tolist() == golden["seen"]
        tbl = pq.read_table(str(tmp_path / "out" / "docs"))
        # some pages exhausted retries
        assert 503 in set(tbl["status"].to_pylist())
        engine_docs = dict(zip(tbl["url_canon"].to_pylist(), tbl["spans"].to_pylist()))
        for url, gspans in golden["docs"].items():
            got = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in engine_docs[url]
            ]
            assert got == gspans


class TestSpill:
    CFG = SynthWebConfig(seed=42, n_hosts=12, base_pages=20, n_seeds=6)

    @pytest.mark.usefixtures("ray_session")
    def test_crawl_identical_with_tiny_queue_bound(self, tmp_path):
        golden = oracle_crawl(self.CFG, n_partitions=4)
        res = run_crawl(
            self.CFG,
            str(tmp_path / "spill_out"),
            n_partitions=4,
            fetch_concurrency=2,
            expected_urls_per_shard=2048,
            max_queue_rows=8,  # absurdly small → constant spilling
        )
        assert res.seen_hashes.tolist() == golden["seen"]
        assert res.n_docs == len(golden["docs"])
        import os

        spill_dir = str(tmp_path / "spill_out" / "_ckpt" / "spill")
        # the dir is created lazily on the FIRST spill — its existence is the
        # witness that spilling occurred; the final checkpoint then GCs every
        # consumed spill file (queues empty at completion → zero live stubs),
        # so the completed crawl must leave the dir EMPTY, not full of
        # orphaned .pkl files (the pre-GC behavior leaked one per spill)
        assert os.path.isdir(spill_dir)
        assert len(os.listdir(spill_dir)) == 0

    def test_shard_spill_roundtrip(self, tmp_path):
        import pyarrow as pa

        from crawl4ai_llm_ray.functions.hashing import fnv1a64
        from crawl4ai_llm_ray.schema import FRONTIER_SCHEMA

        shard = FrontierShard(
            0,
            1,
            {},
            expected_urls=1024,
            max_queue_rows=10,
            spill_dir=str(tmp_path / "sp"),
        )
        urls = [f"http://hx.test/p/{i}" for i in range(50)]
        ua = pa.array(urls)
        tbl = pa.table(
            {
                "url_canon": ua,
                "url_hash": pa.array(fnv1a64(ua)),
                "host": pa.array(["hx.test"] * 50),
                "host_hash": pa.array(fnv1a64(pa.array(["hx.test"] * 50))),
                "partition_id": pa.array(np.zeros(50, np.int32)),
                "priority": pa.array(np.ones(50, np.float32)),
                "depth": pa.array(np.zeros(50, np.int32)),
            },
            schema=FRONTIER_SCHEMA,
        )
        shard.offer(tbl)
        assert shard.queue_size() == 50
        # bound of 10 forced a spill (offer-time rows sit in the wave staging
        # buffer, so the spill lands in stage_spilled)
        assert shard.spilled or shard.stage_spilled
        # checkpoint → restore keeps spilled rows reachable
        path = shard.checkpoint(str(tmp_path / "ck"))
        restored = FrontierShard.restore(path)
        assert restored.queue_size() == 50
        wave = restored.next_wave(wave_duration=100.0)
        assert wave.num_rows == 50  # budget 100 ≥ queue → full drain incl. spills

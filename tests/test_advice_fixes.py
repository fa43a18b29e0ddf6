"""Regression tests for the round-1 ADVICE findings:

1. robots rules must match by URL *path* (an https URL must not bypass a
   disallow rule that was only being compared against an http:// prefix);
2. same-wave cross-task offers of the same URL must resolve max-priority
   order-independently (wave staging buffer);
3. hosts with crawl_delay > wave_duration fetch on a politeness stride
   (consecutive fetches ≥ delay apart), instead of once per wave;
4. a wave in which every host is stride-skipped (drains 0 rows with
   non-empty queues) must not crash the crawl.
"""

import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_llm_ray.functions.hashing import fnv1a64
from crawl4ai_llm_ray.oracle.crawler import oracle_crawl
from crawl4ai_llm_ray.pipelines.crawl import crawl_order, run_crawl
from crawl4ai_llm_ray.schema import FRONTIER_SCHEMA
from crawl4ai_llm_ray.sources.synth import SynthWebConfig, robots_rules
from crawl4ai_llm_ray.state.frontier import FrontierShard


def _frontier_rows(urls, prios=None, depths=None, host="a.com"):
    n = len(urls)
    ua = pa.array(urls, type=pa.string())
    ha = pa.array([host] * n, type=pa.string())
    return pa.table(
        {
            "url_canon": ua,
            "url_hash": pa.array(fnv1a64(ua)),
            "host": ha,
            "host_hash": pa.array(fnv1a64(ha)),
            "partition_id": pa.array(np.zeros(n, np.int32)),
            "priority": pa.array(
                np.asarray(prios if prios is not None else np.ones(n), np.float32)
            ),
            "depth": pa.array(
                np.asarray(depths if depths is not None else np.zeros(n), np.int32)
            ),
        },
        schema=FRONTIER_SCHEMA,
    )


class TestRobotsPathMatch:
    ROBOTS = {"a.com": (("/private",), 1.0)}

    def test_https_url_is_blocked(self):
        shard = FrontierShard(0, 1, self.ROBOTS, expected_urls=1024)
        c = shard.offer(_frontier_rows(["https://a.com/private/y"]))
        assert c["robots_blocked"] == 1 and c["admitted"] == 0
        assert shard.queue_size() == 0

    def test_http_url_is_blocked_and_allowed_path_admitted(self):
        shard = FrontierShard(0, 1, self.ROBOTS, expected_urls=1024)
        c = shard.offer(
            _frontier_rows(
                ["http://a.com/private/y", "https://a.com/public/z", "http://a.com/ok"]
            )
        )
        assert c["robots_blocked"] == 1 and c["admitted"] == 2
        assert shard.queue_size() == 2


class TestWaveStagingResolve:
    def _drained(self, offer_batches):
        shard = FrontierShard(0, 1, {"a.com": ((), 1.0)}, expected_urls=1024)
        for b in offer_batches:
            shard.offer(b)
        return shard.next_wave(wave_duration=100.0)

    def test_cross_batch_same_wave_priority_resolves_order_independently(self):
        # URL u discovered by two concurrent tasks at depth 3 (prio 0.25)
        # and depth 1 (prio 0.5): final queue state must keep prio 0.5
        # regardless of which offer lands first
        u = "http://a.com/x"
        lo = _frontier_rows([u, "http://a.com/a"], prios=[0.25, 0.9], depths=[3, 0])
        hi = _frontier_rows([u, "http://a.com/b"], prios=[0.5, 0.8], depths=[1, 0])
        w1 = self._drained([lo, hi])
        w2 = self._drained([hi, lo])
        assert w1.equals(w2)
        by_url = dict(zip(w1["url_canon"].to_pylist(), w1["priority"].to_pylist()))
        assert by_url[u] == pytest.approx(0.5)
        d_by_url = dict(zip(w1["url_canon"].to_pylist(), w1["depth"].to_pylist()))
        assert d_by_url[u] == 1

    def test_staging_does_not_upgrade_across_waves(self):
        # matches the oracle: only same-wave offers resolve; a later-wave
        # re-offer of a queued URL is a plain dedup
        u = "http://a.com/x"
        shard = FrontierShard(0, 1, {"a.com": ((), 100.0)}, expected_urls=1024)
        shard.offer(_frontier_rows([u, "http://a.com/a"], prios=[0.25, 0.9]))
        # wave 0 drains only 1 URL (budget 1 at delay=100): /a (higher prio)
        w0 = shard.next_wave(wave_duration=100.0)
        assert w0["url_canon"].to_pylist() == ["http://a.com/a"]
        c = shard.offer(_frontier_rows([u], prios=[0.99]))
        assert c["deduped"] == 1 and c["admitted"] == 0
        w1 = shard.next_wave(wave_duration=100.0)
        assert w1["url_canon"].to_pylist() == [u]
        assert w1["priority"].to_pylist()[0] == pytest.approx(0.25)  # not upgraded


class TestPolitenessStride:
    # hosts with i % 11 == 3 get crawl_delay 30 (> wave_duration 8)
    CFG = SynthWebConfig(
        seed=11, n_hosts=15, base_pages=24, n_seeds=8, slow_host_delay=30.0
    )
    NPART = 3

    @pytest.fixture(scope="class")
    def golden(self):
        return oracle_crawl(self.CFG, n_partitions=self.NPART)

    @pytest.fixture(scope="class")
    def engine(self, ray_session, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("stride") / "out")
        return run_crawl(
            self.CFG,
            out,
            n_partitions=self.NPART,
            fetch_concurrency=2,
            expected_urls_per_shard=2048,
        )

    def test_parity_with_slow_hosts(self, engine, golden):
        assert engine.seen_hashes.tolist() == golden["seen"]
        assert engine.n_docs == len(golden["docs"])
        order = crawl_order(engine.out_dir)
        got = list(
            zip(
                order["seq"].to_pylist(),
                order["url_canon"].to_pylist(),
                order["wave"].to_pylist(),
                order["host"].to_pylist(),
                order["scheduled_t"].to_pylist(),
            )
        )
        assert got == golden["order"]

    def test_politeness_invariant_with_delay_gt_wave(self, engine):
        rules = robots_rules(self.CFG)
        slow_hosts = {h for h, (_, d) in rules.items() if d > 8.0}
        assert slow_hosts, "config must produce at least one slow host"
        order = crawl_order(engine.out_dir)
        by_host = {}
        for host, sched in zip(
            order["host"].to_pylist(), order["scheduled_t"].to_pylist()
        ):
            by_host.setdefault(host, []).append(sched)
        checked = 0
        for host, times in by_host.items():
            delay = rules.get(host, ((), 1.0))[1]
            for a, b in zip(times, times[1:]):
                assert b - a >= delay - 1e-9, (host, delay, a, b)
                if host in slow_hosts:
                    checked += 1
        assert checked > 0, "slow hosts must have fetched more than once"


class TestAllEmptyWave:
    # one slow host (i=3) with several pages: waves where t % stride != 0 and
    # all other hosts are drained produce 0 rows — must not crash (inline path
    # previously raised ArrowInvalid on pa.concat_tables([]))
    CFG = SynthWebConfig(
        seed=3, n_hosts=4, base_pages=40, n_seeds=4, slow_host_delay=30.0
    )

    def test_crawl_survives_empty_waves(self, ray_session, tmp_path):
        golden = oracle_crawl(self.CFG, n_partitions=2)
        res = run_crawl(
            self.CFG,
            str(tmp_path / "out"),
            n_partitions=2,
            fetch_concurrency=2,
            expected_urls_per_shard=2048,
        )
        assert 0 in res.wave_counts, "scenario must actually produce an empty wave"
        assert res.seen_hashes.tolist() == golden["seen"]
        assert res.n_docs == len(golden["docs"])
        assert res.n_waves == golden["n_waves"]


class TestMultiTaskWaveParity:
    """Waves forced through the multi-block raw-task path (inline_wave_rows=0,
    tiny wave_block_rows): concurrent fetch tasks offer the same wave's
    discoveries in nondeterministic order — parity must still be exact
    (exercises the staging resolve end-to-end)."""

    CFG = SynthWebConfig(seed=99, n_hosts=12, base_pages=30, n_seeds=8)

    def test_parity_through_multitask_path(self, ray_session, tmp_path):
        golden = oracle_crawl(self.CFG, n_partitions=4)
        res = run_crawl(
            self.CFG,
            str(tmp_path / "out"),
            n_partitions=4,
            fetch_concurrency=4,
            expected_urls_per_shard=2048,
            inline_wave_rows=0,
            wave_block_rows=16,
        )
        assert res.seen_hashes.tolist() == golden["seen"]
        order = crawl_order(res.out_dir)
        got = list(
            zip(
                order["seq"].to_pylist(),
                order["url_canon"].to_pylist(),
                order["wave"].to_pylist(),
                order["host"].to_pylist(),
                order["scheduled_t"].to_pylist(),
            )
        )
        assert got == golden["order"]


class TestKitchenSinkParity:
    """Every crawl feature at once: transient failures + retry, hot-host
    salting (including a SLOW salted host — politeness stride × salting
    interaction), delay > wave_duration, bounded queues with spilling,
    multi-task wave paths with tiny blocks, checkpoint_interval > 1 and
    resume. Byte-exact parity with the oracle must survive the combination."""

    CFG = SynthWebConfig(
        seed=77,
        n_hosts=22,
        base_pages=40,
        n_seeds=10,
        p_transient_fail=0.15,
        slow_host_delay=20.0,
    )
    SALTED = {"h000.test": 2, "h003.test": 3}  # h003 is also a slow host
    NPART = 5

    def test_full_combination_with_resume(self, ray_session, tmp_path):
        golden = oracle_crawl(
            self.CFG, n_partitions=self.NPART, salted_hosts=self.SALTED
        )
        out = str(tmp_path / "ks")
        partial = run_crawl(
            self.CFG,
            out,
            n_partitions=self.NPART,
            fetch_concurrency=4,
            expected_urls_per_shard=2048,
            salted_hosts=self.SALTED,
            inline_wave_rows=0,
            wave_block_rows=32,
            max_queue_rows=64,
            checkpoint_interval=3,
            max_waves=4,
        )
        assert partial.n_waves == 4
        res = run_crawl(
            self.CFG,
            out,
            n_partitions=self.NPART,
            fetch_concurrency=4,
            expected_urls_per_shard=2048,
            salted_hosts=self.SALTED,
            inline_wave_rows=0,
            wave_block_rows=32,
            max_queue_rows=64,
            checkpoint_interval=3,
            resume=True,
        )
        assert res.seen_hashes.tolist() == golden["seen"]
        assert res.n_docs == len(golden["docs"])
        order = crawl_order(res.out_dir)
        got = list(
            zip(
                order["seq"].to_pylist(),
                order["url_canon"].to_pylist(),
                order["wave"].to_pylist(),
                order["host"].to_pylist(),
                order["scheduled_t"].to_pylist(),
            )
        )
        assert got == golden["order"]
        # politeness invariant incl. the slow salted host
        from crawl4ai_llm_ray.sources.synth import robots_rules

        rules = robots_rules(self.CFG)
        by_host = {}
        for host, sched in zip(
            order["host"].to_pylist(), order["scheduled_t"].to_pylist()
        ):
            by_host.setdefault(host, []).append(sched)
        for host, times in by_host.items():
            delay = rules.get(host, ((), 1.0))[1]
            for a, b in zip(times, times[1:]):
                assert b - a >= delay - 1e-9, (host, delay, a, b)


class TestR5AdviceFixes:
    def test_media_byte_std_no_int64_overflow_big_payload(self):
        """ADVICE r4: eff*sx2 - sx*sx overflows int64 for payloads past
        ~10 MB — the big-row path must produce the exact big-int variance,
        never a negative/NaN std."""
        from crawl4ai_llm_ray.pipelines.multimodal import PayloadDecoder

        rng = np.random.default_rng(7)
        big = rng.integers(0, 256, size=11_000_001, dtype=np.uint8).tobytes()
        small = bytes([1, 2, 3, 4])
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "media_kind": pa.array(["image", "image"]),
                "payload": pa.array([big, small], pa.binary()),
            }
        )
        out = PayloadDecoder()(batch)
        stds = out["byte_std"].to_pylist()
        means = out["byte_mean"].to_pylist()
        assert all(s == s and s >= 0 for s in stds)  # no NaN, no negative
        # exact python-int oracle for the big row
        data = np.frombuffer(big, dtype=np.uint8)
        n = len(data)
        s1 = int(data.astype(np.int64).sum())
        s2 = int((data.astype(np.int64) ** 2).sum())
        var = (n * s2 - s1 * s1) / (n * n)
        assert abs(stds[0] - round(var**0.5, 2)) <= 0.01
        assert abs(means[0] - round(s1 / n, 2)) <= 0.01

    def test_clustered_zero_file_prune_preserves_string_schema(self, tmp_path, ray_session):
        """ADVICE r4: the all-files-pruned path must type requested columns
        from the real parquet footer (a string column typed int64 broke
        downstream unions)."""
        import ray

        import pandas as pd

        from crawl4ai_llm_ray.sources.io import (
            read_clustered_range,
            write_clustered,
        )

        n = 1000
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "key": np.arange(n, dtype=np.int64),
                    "name": [f"row-{i}" for i in range(n)],
                }
            )
        )
        out = str(tmp_path / "clustered_str")
        write_clustered(ds, out, "key", n_ranges=4, sample_stride=8)
        empty, n_read, _ = read_clustered_range(
            out, 10**9, 2 * 10**9, columns=["key", "name"]
        )
        assert n_read == 0
        sch = empty.schema()
        types = dict(zip(sch.names, sch.types))
        assert str(types["name"]) == "string"
        assert str(types["key"]) == "int64"
        # and it unions cleanly with a real read (the failure mode)
        full, _, _ = read_clustered_range(out, 0, 10, columns=["key", "name"])
        assert full.union(empty).count() == 11

    def test_clustered_zero_file_prune_columns_none_full_schema(
        self, tmp_path, ray_session
    ):
        """r5 review: columns=None on the all-pruned path must return the
        FULL footer schema — matching read_parquet(columns=None) on the
        non-empty path — not just the key / predicate columns (callers like
        clustered_lookup pass no column list and then select from the
        result)."""
        import ray

        import pandas as pd

        from crawl4ai_llm_ray.sources.io import (
            read_clustered_box,
            read_clustered_range,
            write_clustered,
            write_zorder,
        )

        n = 1000
        df = pd.DataFrame(
            {
                "key": np.arange(n, dtype=np.int64),
                "aux": np.arange(n, dtype=np.int64) * 2,
                "name": [f"row-{i}" for i in range(n)],
            }
        )
        out = str(tmp_path / "clustered_all_cols")
        write_clustered(
            ray.data.from_pandas(df), out, "key", n_ranges=4, sample_stride=8
        )
        empty, n_read, _ = read_clustered_range(out, 10**9, 2 * 10**9)
        assert n_read == 0
        assert sorted(empty.schema().names) == ["aux", "key", "name"]
        full, _, _ = read_clustered_range(out, 0, 10)
        assert full.union(empty).count() == 11

        # same contract for the box reader's zero-file path
        zout = str(tmp_path / "zorder_all_cols")
        write_zorder(ray.data.from_pandas(df), zout, "key", "aux", n_ranges=4)
        zempty, zn_read, _ = read_clustered_box(
            zout, {"key": (10**9, 2 * 10**9), "aux": (10**9, 2 * 10**9)}
        )
        assert zn_read == 0
        # the zorder layout persists its _z curve key; columns=None must
        # match whatever a NON-empty columns=None read returns
        zfull, _, _ = read_clustered_box(zout, {"key": (0, 10), "aux": (0, 20)})
        assert sorted(zempty.schema().names) == sorted(zfull.schema().names)
        assert zfull.union(zempty).count() == zfull.count()

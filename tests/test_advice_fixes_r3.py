"""Regression tests for the round-2 ADVICE findings:

1. ensure_crawl() must fingerprint the cached crawl artifact (code version +
   config) and rebuild on mismatch — never silently reuse a stale artifact;
2. a fresh (non-resume) rerun into an existing out_dir with FEWER partitions
   must not union stale seen/part-* files into the seen set;
3. run_crawl must reject a wave_dir_template without a {wave...} field at
   entry (instead of failing obscurely at wave commit / resume);
4. get_storage('async', p) and get_storage('arrow'|'json', p) must share ONE
   in-memory index over the same directory.
"""

import os

import pytest

from crawl4ai_llm_ray.pipelines.crawl import run_crawl
from crawl4ai_llm_ray.sources.synth import SynthWebConfig


class TestEnsureCrawlFingerprint:
    def test_stale_fingerprint_triggers_atomic_rebuild(self, ray_session):
        from crawl4ai_llm_ray.pipelines import crawl_queries as cq

        out = cq.ensure_crawl()
        fp_path = os.path.join(out, "FINGERPRINT")
        assert open(fp_path).read() == cq._fingerprint()

        # simulate an artifact produced by older code/config
        marker = os.path.join(out, "stale_marker")
        open(marker, "w").close()
        with open(fp_path, "w") as f:
            f.write("v0|stale")

        out2 = cq.ensure_crawl()
        assert out2 == out
        # rebuilt: correct fingerprint restored, stale dir swapped out whole
        assert open(fp_path).read() == cq._fingerprint()
        assert not os.path.exists(marker)
        assert os.path.exists(os.path.join(out, "metrics.parquet"))

    def test_cached_artifact_reused_when_fingerprint_matches(self, ray_session):
        from crawl4ai_llm_ray.pipelines import crawl_queries as cq

        out = cq.ensure_crawl()
        marker = os.path.join(out, "keep_marker")
        open(marker, "w").close()
        cq.ensure_crawl()
        assert os.path.exists(marker), "matching fingerprint must not rebuild"
        os.remove(marker)


class TestSeenDirRepartitionRerun:
    CFG = SynthWebConfig(seed=5, n_hosts=4, base_pages=10, n_seeds=4)

    def test_fewer_partitions_leaves_no_stale_parts(self, ray_session, tmp_path):
        out = str(tmp_path / "out")
        res4 = run_crawl(
            self.CFG, out, n_partitions=4, fetch_concurrency=2,
            expected_urls_per_shard=1024,
        )
        seen4 = res4.seen_hashes.tolist()
        assert len(os.listdir(res4.seen_dir)) == 4
        # fresh rerun into the SAME out_dir with fewer partitions
        res2 = run_crawl(
            self.CFG, out, n_partitions=2, fetch_concurrency=2,
            expected_urls_per_shard=1024,
        )
        assert len(os.listdir(res2.seen_dir)) == 2, "stale part files survived"
        assert res2.seen_hashes.tolist() == seen4


class TestWaveTemplateValidation:
    def test_template_without_wave_field_rejected(self, ray_session, tmp_path):
        with pytest.raises(ValueError, match="wave_dir_template"):
            run_crawl(
                SynthWebConfig(seed=1, n_hosts=2, base_pages=4, n_seeds=2),
                str(tmp_path / "out"),
                n_partitions=1,
                wave_dir_template="all_waves",
            )


class TestStorageRegistrySharedIndex:
    def test_async_and_sync_share_one_index(self, tmp_path):
        import asyncio

        from crawl4ai_llm_ray.compat.storage import get_storage

        p = str(tmp_path / "store")
        sync = get_storage("arrow", p)
        a = get_storage("async", p)
        assert a.sync is sync, "async facade must wrap the cached sync store"
        assert get_storage("json", p) is sync

        pid = sync.save_product({"title": "t", "url": "http://x.test/1"})
        got = asyncio.run(a.get_product(pid))
        assert got["title"] == "t"
        pid2 = asyncio.run(a.save_product({"title": "u", "url": "http://x.test/2"}))
        assert sync.get_product(pid2)["title"] == "u"

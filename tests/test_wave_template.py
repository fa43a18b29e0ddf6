"""wave_dir_template: user-templated wave output dirs (the engine analog of
the reference's StorageConfig.filename_template, config.py:29) — custom
template produces the expected layout and resume still wipes/re-runs the
right waves."""

import os

import pytest

from crawl4ai_llm_ray.oracle.crawler import oracle_crawl
from crawl4ai_llm_ray.pipelines.crawl import _wave_name_re, run_crawl
from crawl4ai_llm_ray.sources.synth import SynthWebConfig

CFG = SynthWebConfig(seed=5, n_hosts=8, base_pages=16, n_seeds=4)


def test_wave_name_re():
    r = _wave_name_re("wave_{wave:05d}")
    assert r.match("wave_00012").group(1) == "00012"
    assert not r.match(".tmp_wave_00012")
    r2 = _wave_name_re("w{wave}.out")
    assert r2.match("w7.out").group(1) == "7"
    assert not r2.match("w7Xout")


def test_custom_template_crawl_and_resume(ray_session, tmp_path):
    golden = oracle_crawl(CFG, n_partitions=2)
    out = str(tmp_path / "out")
    partial = run_crawl(
        CFG,
        out,
        n_partitions=2,
        fetch_concurrency=2,
        max_waves=2,
        expected_urls_per_shard=1024,
        wave_dir_template="w{wave:03d}",
    )
    assert partial.n_waves == 2
    names = sorted(os.listdir(os.path.join(out, "docs")))
    assert names == ["w000", "w001"]
    full = run_crawl(
        CFG,
        out,
        n_partitions=2,
        fetch_concurrency=2,
        resume=True,
        expected_urls_per_shard=1024,
        wave_dir_template="w{wave:03d}",
    )
    assert full.n_docs == len(golden["docs"])
    assert full.seen_hashes.tolist() == golden["seen"]
    names = sorted(os.listdir(os.path.join(out, "docs")))
    assert names[0] == "w000" and all(n.startswith("w") for n in names)

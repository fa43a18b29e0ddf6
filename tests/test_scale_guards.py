"""Scale guards: operators that are intentionally brute-force oracle
baselines must refuse to run above their documented size threshold instead of
silently broadcasting/materializing at cluster-killing scale."""

import pytest

from crawl4ai_llm_ray.pipelines.dedup import embed_cosine_pairs, minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


def test_embed_cosine_pairs_guard_trips():
    with pytest.raises(ValueError, match="embed_lsh_pairs"):
        embed_cosine_pairs(SF, max_rows=10)


def test_embed_cosine_pairs_runs_below_guard(ray_session):
    ds = embed_cosine_pairs(SF)  # default max_rows far above sf0.001
    assert ds.count() > 0


def test_minhash_threshold_guard():
    with pytest.raises(ValueError, match="threshold"):
        minhash_lsh_pairs(SF, threshold=0.0)

"""HyperLogLog sketch: accuracy, merge semantics, serialization, pipeline."""

import numpy as np
import pytest

from crawl4ai_llm_ray.state.hll import HyperLogLog


def _hashes(n, seed):
    return np.random.default_rng(seed).integers(0, 2**64, size=n, dtype=np.uint64)


class TestHLL:
    @pytest.mark.parametrize("n", [100, 10_000, 500_000])
    def test_estimate_within_expected_error(self, n):
        hll = HyperLogLog(p=12)
        hll.add_hashes(_hashes(n, seed=n))
        est = hll.estimate()
        # standard error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma
        assert abs(est - n) / n < 0.085, est

    def test_duplicates_do_not_inflate(self):
        hll = HyperLogLog(p=12)
        h = _hashes(5000, seed=1)
        for _ in range(5):
            hll.add_hashes(h)
        assert abs(hll.estimate() - 5000) / 5000 < 0.085

    def test_merge_equals_union(self):
        a, b = HyperLogLog(12), HyperLogLog(12)
        ha, hb = _hashes(20000, 1), _hashes(20000, 2)
        a.add_hashes(ha)
        b.add_hashes(hb)
        merged = a.merge(b)
        union = HyperLogLog(12)
        union.add_hashes(np.concatenate([ha, hb]))
        assert np.array_equal(merged.registers, union.registers)

    def test_roundtrip(self):
        hll = HyperLogLog(p=10)
        hll.add_hashes(_hashes(1000, 3))
        back = HyperLogLog.from_bytes(hll.to_bytes())
        assert back.p == 10
        assert np.array_equal(back.registers, hll.registers)


@pytest.mark.usefixtures("ray_session")
def test_hll_pipeline_vs_exact():
    import duckdb

    from crawl4ai_llm_ray.pipelines.relational3 import approx_distinct_hll

    sf = "/root/testdata/sf0.01"
    est = approx_distinct_hll(sf).to_pandas()["approx_distinct_custkeys"].iloc[0]
    exact = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{sf}/orders.parquet'"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.085, (est, exact)

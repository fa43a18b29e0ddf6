import numpy as np
import pytest

from crawl4ai_llm_ray.state import BloomFilter, CuckooFilter, U64Set


def _hashes(n, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


class TestCuckoo:
    def test_insert_contains(self):
        cf = CuckooFilter(capacity=4096)
        h = _hashes(1000)
        cf.insert_batch(h)
        assert cf.contains_batch(h).all()

    def test_no_false_negatives_at_high_load(self):
        cf = CuckooFilter(capacity=2048)
        h = _hashes(1800)  # ~88% load
        cf.insert_batch(h)
        assert cf.contains_batch(h).all()

    def test_low_false_positive_rate(self):
        cf = CuckooFilter(capacity=65536)
        cf.insert_batch(_hashes(30000, seed=1))
        probe = _hashes(30000, seed=2)
        fp_rate = cf.contains_batch(probe).mean()
        assert fp_rate < 0.01

    def test_delete(self):
        cf = CuckooFilter(capacity=1024)
        h = _hashes(100)
        cf.insert_batch(h)
        cf.delete_batch(h[:50])
        assert cf.contains_batch(h[50:]).all()
        # deleted fingerprints mostly gone (fp collisions allowed)
        assert cf.contains_batch(h[:50]).mean() < 0.2

    def test_roundtrip_serialization(self):
        cf = CuckooFilter(capacity=1024)
        h = _hashes(500)
        cf.insert_batch(h)
        cf2 = CuckooFilter.from_bytes(cf.to_bytes())
        assert cf2.count == cf.count
        assert cf2.contains_batch(h).all()
        assert np.array_equal(cf.buckets, cf2.buckets)

    def test_overfull_raises(self):
        cf = CuckooFilter(capacity=256, bucket_size=4)
        with pytest.raises(RuntimeError):
            cf.insert_batch(_hashes(5000))


class TestShardProbeGrowth:
    def test_cuckoo_overflow_rebuilds_and_stays_exact(self, tmp_path):
        """Overflowing the shard's cuckoo probe triggers an in-place rebuild
        at double capacity; dedup stays exact throughout."""
        import pyarrow as pa

        from crawl4ai_llm_ray.functions.hashing import fnv1a64
        from crawl4ai_llm_ray.schema import FRONTIER_SCHEMA
        from crawl4ai_llm_ray.state.frontier import FrontierShard

        shard = FrontierShard(0, 1, {}, expected_urls=5000)  # cuckoo cap 10k
        start_buckets = shard.probe.nbuckets

        def offer(n, base):
            urls = [f"http://hz.test/p/{base + i}" for i in range(n)]
            ua = pa.array(urls)
            return shard.offer(
                pa.table(
                    {
                        "url_canon": ua,
                        "url_hash": pa.array(fnv1a64(ua)),
                        "host": pa.array(["hz.test"] * n),
                        "host_hash": pa.array(fnv1a64(pa.array(["hz.test"] * n))),
                        "partition_id": pa.array(np.zeros(n, np.int32)),
                        "priority": pa.array(np.ones(n, np.float32)),
                        "depth": pa.array(np.zeros(n, np.int32)),
                    },
                    schema=FRONTIER_SCHEMA,
                )
            )

        offer(30000, 0)  # 3x capacity → forced rebuild(s)
        assert shard.probe.nbuckets > start_buckets
        assert shard.queue_size() == 30000
        # all 30k marked seen: re-offering dedups every row
        counts = offer(30000, 0)
        assert counts["admitted"] == 0 and counts["deduped"] == 30000


class TestBloom:
    def test_add_contains(self):
        bf = BloomFilter(capacity=10000, fpp=1e-4)
        h = _hashes(5000)
        bf.add_batch(h)
        assert bf.contains_batch(h).all()

    def test_fpp(self):
        bf = BloomFilter(capacity=10000, fpp=1e-3)
        bf.add_batch(_hashes(10000, seed=1))
        probe = _hashes(50000, seed=9)
        assert bf.contains_batch(probe).mean() < 5e-3

    def test_roundtrip(self):
        bf = BloomFilter(capacity=1000)
        h = _hashes(800)
        bf.add_batch(h)
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert bf2.contains_batch(h).all()
        assert bf2.k == bf.k and bf2.nbits == bf.nbits


class TestU64Set:
    def test_membership_exact(self):
        s = U64Set()
        h = _hashes(10000)
        s.add_batch(h[:6000])
        got = s.contains_batch(h)
        want = np.isin(h, h[:6000])
        assert np.array_equal(got, want)

    def test_compaction_and_len(self):
        s = U64Set()
        for i in range(10):
            s.add_batch(_hashes(20000, seed=i))
        total = len(s)
        allh = np.unique(np.concatenate([_hashes(20000, seed=i) for i in range(10)]))
        assert total == len(allh)

    def test_roundtrip(self):
        s = U64Set()
        h = _hashes(1000)
        s.add_batch(h)
        s2 = U64Set.from_bytes(s.to_bytes())
        assert s2.contains_batch(h).all()
        assert np.array_equal(s.to_numpy(), s2.to_numpy())

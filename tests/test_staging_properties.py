"""Property tests for round-2 state machinery:

- U64MaxMap behaves as a dict[uint64 → max(float32)] under arbitrary
  add/get interleavings (LSM runs + compaction are invisible);
- the frontier's wave staging resolve is ORDER-INDEPENDENT: any
  partitioning + permutation of a wave's offer rows yields an identical
  drained wave table (the determinism contract under concurrent fetch
  tasks).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from crawl4ai_llm_ray.schema import FRONTIER_SCHEMA
from crawl4ai_llm_ray.state.frontier import FrontierShard
from crawl4ai_llm_ray.state.u64set import U64MaxMap


@settings(max_examples=50, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # hash (small space → collisions)
            st.floats(min_value=0.0, max_value=1.0, width=32, allow_nan=False),
        ),
        min_size=0,
        max_size=200,
    ),
    batch_size=st.integers(min_value=1, max_value=17),
)
def test_u64maxmap_matches_dict_model(ops, batch_size):
    m = U64MaxMap()
    model: dict[int, float] = {}
    for i in range(0, len(ops), batch_size):
        chunk = ops[i : i + batch_size]
        h = np.array([c[0] for c in chunk], dtype=np.uint64)
        v = np.array([c[1] for c in chunk], dtype=np.float32)
        m.add_batch(h, v)
        for hh, vv in zip(h.tolist(), v.tolist()):
            model[hh] = max(model.get(hh, -np.inf), vv)
        # interleaved lookups over present + absent keys
        q = np.arange(45, dtype=np.uint64)
        got = m.get_batch(q)
        for k in range(45):
            want = model.get(k, -np.inf)
            assert got[k] == np.float32(want) or (want == -np.inf and got[k] == -np.inf)


def _rows(items):
    """items: list of (url_suffix:int, depth:int). Priority = 1/(2+depth)."""
    from crawl4ai_llm_ray.functions.hashing import fnv1a64

    urls = [f"http://h.test/p/{u}" for u, _ in items]
    depths = np.array([d for _, d in items], dtype=np.int32)
    prios = (1.0 / (2.0 + depths.astype(np.float32))).astype(np.float32)
    ua = pa.array(urls, type=pa.string())
    ha = pa.array(["h.test"] * len(items), type=pa.string())
    return pa.table(
        {
            "url_canon": ua,
            "url_hash": pa.array(fnv1a64(ua)),
            "host": ha,
            "host_hash": pa.array(fnv1a64(ha)),
            "partition_id": pa.array(np.zeros(len(items), np.int32)),
            "priority": pa.array(prios),
            "depth": pa.array(depths),
        },
        schema=FRONTIER_SCHEMA,
    )


@settings(max_examples=40, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # url id (dups likely)
            st.integers(min_value=0, max_value=6),   # depth
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
    n_batches=st.integers(min_value=1, max_value=5),
)
def test_staging_resolve_is_order_independent(items, seed, n_batches):
    rng = np.random.default_rng(seed)

    def run(order, cuts):
        shard = FrontierShard(0, 1, {"h.test": ((), 1.0)}, expected_urls=1024)
        seq = [items[i] for i in order]
        bounds = sorted(cuts) + [len(seq)]
        start = 0
        for b in bounds:
            if b > start:
                shard.offer(_rows(seq[start:b]))
            start = b
        return shard.next_wave(wave_duration=1000.0)

    base_order = list(range(len(items)))
    perm = rng.permutation(len(items)).tolist()
    cuts1 = sorted(rng.integers(0, len(items) + 1, size=n_batches - 1).tolist())
    cuts2 = sorted(rng.integers(0, len(items) + 1, size=n_batches - 1).tolist())
    w1 = run(base_order, cuts1)
    w2 = run(perm, cuts2)
    assert w1.equals(w2), (
        w1.to_pydict(),
        w2.to_pydict(),
    )


@settings(max_examples=60, deadline=None)
@given(
    host=st.from_regex(r"[a-z0-9.\-]{1,12}", fullmatch=True),
    path=st.from_regex(r"(/[a-zA-Z0-9._\-]{0,8}){0,4}", fullmatch=True),
    scheme=st.sampled_from(["http", "https"]),
)
def test_url_path_scalar_spec_matches_vectorized(host, path, scheme):
    """offer()'s Arrow path extraction must agree with the scalar spec."""
    import pyarrow.compute as pc

    from crawl4ai_llm_ray.state.frontier import _url_path

    url = f"{scheme}://{host}{path}"
    arr = pa.array([url], type=pa.string())
    p = pc.replace_substring_regex(arr, r"^https?://[^/]*", "")
    p = pc.if_else(pc.equal(p, ""), pa.scalar("/"), p)
    assert p.to_pylist()[0] == _url_path(url)


def _multi_rows(items):
    """items: list of (host_id:int, url_suffix:int, depth:int)."""
    from crawl4ai_llm_ray.functions.hashing import fnv1a64

    hosts = [f"h{h}.test" for h, _, _ in items]
    urls = [f"http://{h}/p/{u}" for h, (_, u, _) in zip(hosts, items)]
    depths = np.array([d for _, _, d in items], dtype=np.int32)
    prios = (1.0 / (2.0 + depths.astype(np.float32))).astype(np.float32)
    ua = pa.array(urls, type=pa.string())
    ha = pa.array(hosts, type=pa.string())
    return pa.table(
        {
            "url_canon": ua,
            "url_hash": pa.array(fnv1a64(ua)),
            "host": ha,
            "host_hash": pa.array(fnv1a64(ha)),
            "partition_id": pa.array(np.zeros(len(items), np.int32)),
            "priority": pa.array(prios),
            "depth": pa.array(depths),
        },
        schema=FRONTIER_SCHEMA,
    )


@settings(max_examples=25, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # host id (multi-host groups)
            st.integers(min_value=0, max_value=12),  # url id (dups likely)
            st.integers(min_value=0, max_value=6),   # depth
        ),
        min_size=1,
        max_size=60,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
    spill_cap=st.integers(min_value=2, max_value=10),
)
def test_multi_host_spill_checkpoint_equals_plain(items, seed, spill_cap):
    """The r5 sort-slice staging path (zero-copy url slices, compaction at
    the pickle boundaries): a shard driven with a tiny spill cap PLUS a
    checkpoint/restore mid-stream must drain the exact same wave table as a
    plain unbounded shard fed the same offers in a different batching."""
    import tempfile

    rng = np.random.default_rng(seed)
    robots = {f"h{h}.test": ((), 1.0) for h in range(6)}

    plain = FrontierShard(0, 1, robots, expected_urls=1024)
    plain.offer(_multi_rows(items))
    want = plain.next_wave(wave_duration=1000.0)

    with tempfile.TemporaryDirectory() as td:
        shard = FrontierShard(
            0, 1, robots, expected_urls=1024,
            max_queue_rows=spill_cap, spill_dir=f"{td}/spill",
        )
        perm = rng.permutation(len(items)).tolist()
        seq = [items[i] for i in perm]
        cut = int(rng.integers(0, len(seq) + 1))
        if cut:
            shard.offer(_multi_rows(seq[:cut]))
        ckpt = shard.checkpoint(f"{td}/ck")
        shard = FrontierShard.restore(ckpt)
        if cut < len(seq):
            shard.offer(_multi_rows(seq[cut:]))
        got = shard.next_wave(wave_duration=1000.0)
    assert want.equals(got), (want.to_pydict(), got.to_pydict())

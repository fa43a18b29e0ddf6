"""Golden-graph test for the distributed connected-components used by
dedup_clusters (VERDICT r1 item 2): fixed small graph, known components,
computed via the iterated join + groupby-min label propagation — no
driver-side edge loop anywhere."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawl4ai_llm_ray.pipelines.dedup import connected_components


@pytest.mark.usefixtures("ray_session")
def test_connected_components_golden():
    import ray.data as rd

    # components: {1,2,3,8} (chain 1-2, 2-3, 3-8), {5,6}, singletons {4}, {7}
    pairs = [(1, 2), (2, 3), (3, 8), (5, 6)]
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    nodes = rd.from_arrow(pa.table({"node": [1, 2, 3, 4, 5, 6, 7, 8]}))

    labels = connected_components(edges, nodes, num_partitions=2)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 8: 1, 5: 5, 6: 5, 4: 4, 7: 7}


@pytest.mark.usefixtures("ray_session")
def test_connected_components_no_edges():
    import ray.data as rd

    edges = rd.from_arrow(pa.table({"src": pa.array([], type=pa.int64()),
                                    "dst": pa.array([], type=pa.int64())}))
    nodes = rd.from_arrow(pa.table({"node": [3, 1, 2]}))
    labels = connected_components(edges, nodes, num_partitions=2)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {1: 1, 2: 2, 3: 3}


@pytest.mark.usefixtures("ray_session")
def test_connected_components_hash_scale_labels():
    """Labels near 2^62 (the url_hash >> 1 domain): the limb-split fixpoint
    checksum must not overflow int64 and the fixpoint must be exact."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.dedup import connected_components

    base = (1 << 62) + 12345
    ids = [base + i * 7 for i in range(6)]
    # two triangles: {0,1,2} and {3,4,5}
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(
                    [ids[a] for a, b in e] + [ids[b] for a, b in e], pa.int64()
                ),
                "dst": pa.array(
                    [ids[b] for a, b in e] + [ids[a] for a, b in e], pa.int64()
                ),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(ids, pa.int64())}))
    got = (
        connected_components(edges, nodes, num_partitions=2)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert {got[i] for i in ids[:3]} == {min(ids[:3])}
    assert {got[i] for i in ids[3:]} == {min(ids[3:])}


@pytest.mark.usefixtures("ray_session")
def test_crawl_url_clusters_entity_resolution():
    from crawl4ai_llm_ray.pipelines import crawl_queries as cq

    got = cq.crawl_url_clusters().to_pandas()
    docs = cq.crawl_interleaved_docs().to_pandas()
    assert len(got) == len(docs)
    # canonical rows are exactly the distinct canonical urls, each cluster's
    # canonical member is a member of the cluster
    canon = got[got["keep"]]
    assert set(canon["url"]) == set(got["canonical_url"])
    assert int(got["keep"].sum()) == got["canonical_url"].nunique()
    # clusters never span hosts (blocking key is host)
    h = got["url"].str.extract(r"https?://([^/]*)")[0]
    hc = got["canonical_url"].str.extract(r"https?://([^/]*)")[0]
    assert (h == hc).all()
    # the synthetic web's dup variants collapse: strictly fewer entities
    assert got["canonical_url"].nunique() < len(got)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_windowed_candidates_match_bruteforce():
    """The r5 projection-window candidate generation (|Δproj| ≤ L1 ≤ 2k for
    any true pair) must be EXACT: randomized trials vs a plain O(n²)
    Levenshtein brute force over multi-block string sets with dups and
    empty strings."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.dedup import fuzzy_pairs_blocked

    def ed(a, b, k):
        la, lb = len(a), len(b)
        if abs(la - lb) > k:
            return k + 1
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev = dp[0]
            dp[0] = i
            for j in range(1, lb + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[lb]

    rng = np.random.default_rng(7)
    alph = list("abcx")
    for _ in range(8):
        n = int(rng.integers(2, 60))
        k = int(rng.integers(1, 4))
        strs = ["".join(rng.choice(alph, int(rng.integers(0, 9)))) for _ in range(n)]
        blks = [f"b{int(rng.integers(0, 3))}" for _ in range(n)]
        ds = rd.from_pandas(pd.DataFrame({"u": strs, "h": blks}))
        got = fuzzy_pairs_blocked(
            ds, text_col="u", block_col="h", max_dist=k, num_partitions=4
        ).to_pandas()
        got_set = (
            set()
            if len(got) == 0 or "a" not in got.columns
            else set(zip(got["a"], got["b"], got["dist"].astype(int)))
        )
        want = set()
        by_blk = {}
        for s, b in zip(strs, blks):
            by_blk.setdefault(b, set()).add(s)
        for b, ss in by_blk.items():
            ss = sorted(ss)
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    d = ed(ss[i], ss[j], k)
                    if d <= k:
                        want.add((ss[i], ss[j], d))
        assert got_set == want


@pytest.mark.usefixtures("ray_session")
def test_connected_components_random_vs_union_find():
    """Randomized graph vs a trusted driver-side union-find: the batch-local
    contraction pre-pass (_contract_edges_batch) must be connectivity-exact
    across arbitrary block boundaries (edges repartitioned to 6 blocks)."""
    import ray.data as rd

    rng = np.random.default_rng(42)
    n, m = 800, 1500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # expected label = min node id of the component
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {i: comp_min[find(i)] for i in range(n)}

    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([src, dst]), pa.int64()),
                "dst": pa.array(np.concatenate([dst, src]), pa.int64()),
            }
        )
    ).repartition(6)
    nodes = rd.from_arrow(pa.table({"node": pa.array(np.arange(n), pa.int64())}))
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges, nodes, num_partitions=2).take_all()
    }
    assert got == expected


def test_contract_edges_batch_star_shape():
    """The contraction output is a both-direction star set over the batch's
    components: ≤ 2·(distinct nodes − roots) rows, exact connectivity."""
    from crawl4ai_llm_ray.pipelines.dedup import _contract_edges_batch

    # chain 0-1-2-3 plus pair (10,11); both directions in
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]
    t = pa.table(
        {
            "src": pa.array([a for a, b in pairs] + [b for a, b in pairs], pa.int64()),
            "dst": pa.array([b for a, b in pairs] + [a for a, b in pairs], pa.int64()),
        }
    )
    out = _contract_edges_batch(t)
    fwd = {
        (s, d)
        for s, d in zip(out["src"].to_pylist(), out["dst"].to_pylist())
        if s < d
    }
    # members {1,2,3} -> root 0; member {11} -> root 10
    assert fwd == {(0, 1), (0, 2), (0, 3), (10, 11)}
    assert out.num_rows == 2 * len(fwd)

    empty = _contract_edges_batch(t.slice(0, 0))
    assert empty.num_rows == 0 and empty.schema == t.schema

"""Graph-analytics operators: triangle census (oriented-wedge join)."""

import pandas as pd
import pyarrow as pa
import pytest


def _tri(edges_rows):
    import ray

    from crawl4ai_llm_ray.pipelines.graph import triangle_count

    df = pd.DataFrame(edges_rows, columns=["src", "dst"])
    ds = ray.data.from_pandas(df)
    return triangle_count(ds, num_partitions=4).to_pandas().iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_k4():
    # K4 on {a,b,c,d}: 6 edges, C(4,3)=4 triangles; every oriented node has
    # out-degree ≤ 3 and sum k(k-1)/2 wedges = 4 closed + open ones
    nodes = ["a", "b", "c", "d"]
    edges = [(u, v) for u in nodes for v in nodes if u < v]
    r = _tri(edges)
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 4
    # wedges = sum deg*(deg-1)/2 = 4 * C(3,2) = 12; clustering = 3*4/12 = 1
    assert r["n_wedges"] == 12


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_dedup_selfloop_direction():
    # duplicates, reversed copies and self-loops must not change the census;
    # path a-b-c has 1 wedge and 0 triangles
    edges = [
        ("a", "b"),
        ("b", "a"),
        ("a", "b"),
        ("b", "c"),
        ("c", "c"),
    ]
    r = _tri(edges)
    assert r["n_nodes"] == 3
    assert r["n_edges"] == 2
    assert r["n_wedges"] == 1
    assert r["n_triangles"] == 0


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_empty():
    import ray

    from crawl4ai_llm_ray.pipelines.graph import triangle_count

    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([], type=pa.string()),
                  "dst": pa.array([], type=pa.string())})
    )
    r = triangle_count(ds, num_partitions=2).to_pandas().iloc[0]
    assert (r == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_two_disjoint_triangles_plus_chord():
    # two disjoint triangles {a,b,c} and {d,e,f} plus a bridging edge c-d:
    # 7 edges, 2 triangles
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("d", "e"), ("e", "f"), ("d", "f"),
        ("c", "d"),
    ]
    r = _tri(edges)
    assert r["n_nodes"] == 6
    assert r["n_edges"] == 7
    assert r["n_triangles"] == 2
    # degrees a,b,e,f = 2 and c,d = 3 → wedges = 4*1 + 2*3 = 10
    assert r["n_wedges"] == 10


@pytest.mark.usefixtures("ray_session")
def test_crawl_host_linkage_consistency():
    from crawl4ai_llm_ray.pipelines import crawl_queries as cq

    df = cq.crawl_host_linkage().to_pandas()
    assert len(df) > 0
    # every listed host has at least one outgoing edge; fan-out counts
    # distinct hosts so it can never exceed the cross-host edge count
    assert ((df["n_intra"] + df["n_inter"]) > 0).all()
    assert (df["n_hosts_out"] <= df["n_inter"]).all()
    # census consistency with the triangle/pagerank edge domain: total
    # distinct induced edges = sum of intra + inter
    tri = cq.crawl_triangles().to_pandas().iloc[0]
    # crawl_triangles counts UNDIRECTED distinct pairs; the directed count
    # (intra+inter) must be >= that and <= 2x
    directed = int((df["n_intra"] + df["n_inter"]).sum())
    assert tri["n_edges"] <= directed <= 2 * tri["n_edges"]


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_random_graphs_vs_brute_force():
    """Random small graphs: the distributed oriented-wedge census must match
    a brute-force O(n^3) count (seeded, 6 graphs — one Ray pipeline per
    graph keeps this affordable while still exploring structure)."""
    import numpy as np

    rng = np.random.default_rng(123)
    for trial in range(6):
        n = int(rng.integers(4, 12))
        p = rng.uniform(0.2, 0.7)
        adj = np.triu((rng.random((n, n)) < p), k=1)
        names = [f"n{i}" for i in range(n)]
        edges = [
            (names[i], names[j])
            for i in range(n)
            for j in range(n)
            if adj[i, j]
        ]
        if not edges:
            continue
        # brute force over the undirected adjacency
        und = adj | adj.T
        brute = int(
            sum(
                und[i, j] and und[j, k] and und[i, k]
                for i in range(n)
                for j in range(i + 1, n)
                for k in range(j + 1, n)
            )
        )
        deg = und.sum(axis=1).astype(int)
        wedges = int((deg * (deg - 1) // 2).sum())
        r = _tri(edges)
        assert r["n_triangles"] == brute, (trial, edges)
        assert r["n_wedges"] == wedges
        assert r["n_edges"] == len(edges)


@pytest.mark.usefixtures("ray_session")
def test_bfs_distance_hand_built():
    """Diamond + chain + isolated node: exact hop counts, -1 unreachable."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.graph import bfs_distance

    #  s -> a -> b -> c ;  s -> b (shortcut) ; iso unreachable
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(["s", "a", "b", "s"]),
                "dst": pa.array(["a", "b", "c", "b"]),
            }
        )
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(["s", "a", "b", "c", "iso"])})
    )
    got = (
        bfs_distance(edges, nodes, {"s"}, num_partitions=2)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got == {"s": 0, "a": 1, "b": 1, "c": 2, "iso": -1}


@pytest.mark.usefixtures("ray_session")
def test_bfs_distance_multi_source_and_empty_edges():
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.graph import bfs_distance

    nodes = rd.from_arrow(pa.table({"node": pa.array(["x", "y", "z"])}))
    edges = rd.from_arrow(
        pa.table({"src": pa.array(["x"]), "dst": pa.array(["z"])})
    )
    got = (
        bfs_distance(edges, nodes, {"x", "y"}, num_partitions=2)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got == {"x": 0, "y": 0, "z": 1}
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    got2 = (
        bfs_distance(empty, nodes, {"y"}, num_partitions=2)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got2 == {"x": -1, "y": 0, "z": -1}


@pytest.mark.usefixtures("ray_session")
def test_crawl_seed_distance_bounded_by_wave():
    """Link-hop distance from the seed set can never exceed the crawl wave a
    page was fetched in (the crawl discovers each page through a chain of
    fetched parents, one wave per hop at most)."""
    import pandas as pd

    from crawl4ai_llm_ray.pipelines import crawl_queries as cq

    dist = cq.crawl_seed_distance().to_pandas()
    docs = cq.crawl_doc_stats().to_pandas()[["url_canon", "wave"]]
    m = dist.merge(docs, left_on="url", right_on="url_canon")
    assert len(m) == len(dist) > 0
    assert (m["dist"] >= 0).all()
    assert (m["dist"] <= m["wave"]).all()
    # seeds themselves are wave 0 / dist 0
    assert set(m[m["wave"] == 0]["dist"]) == {0}


@pytest.mark.usefixtures("ray_session")
def test_pointer_jump_resolve_chains_in_log_rounds():
    """Chain 5->4->3->2->1->1 plus a self-root 9: all chain nodes resolve to
    1; the doubling fixpoint equals the transitive terminal."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.graph import pointer_jump_resolve

    parents = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([5, 4, 3, 2, 1, 9], pa.int64()),
                "parent": pa.array([4, 3, 2, 1, 1, 9], pa.int64()),
            }
        )
    )
    got = (
        pointer_jump_resolve(parents, num_partitions=2)
        .to_pandas()
        .set_index("node")["root"]
        .to_dict()
    )
    assert got == {5: 1, 4: 1, 3: 1, 2: 1, 1: 1, 9: 9}


@pytest.mark.usefixtures("ray_session")
def test_crawl_redirect_resolve_terminal_targets():
    """Every final_url is a fixpoint (its own target), shares the source's
    host, and is <= the source lexicographically (descending chains)."""
    from crawl4ai_llm_ray.pipelines import crawl_queries as cq

    got = cq.crawl_redirect_resolve().to_pandas()
    docs = cq.crawl_interleaved_docs().to_pandas()
    assert len(got) == len(docs)
    tgt = got.set_index("url")["final_url"].to_dict()
    for u, f in tgt.items():
        assert tgt[f] == f  # terminal
        assert f <= u
    ha = got["url"].str.extract(r"https?://([^/]*)")[0]
    hb = got["final_url"].str.extract(r"https?://([^/]*)")[0]
    assert (ha == hb).all()
    assert (got["url"] != got["final_url"]).any()  # chains actually existed


@pytest.mark.usefixtures("ray_session")
def test_broadcast_path_equals_join_path():
    """The broadcast fast path (labels/ranks ray.put per round + in-map
    pc.index_in lookup) must be bit-identical to the distributed-join path
    for both connected_components and pagerank — forced via
    broadcast_max_rows=0 on the join side. Random graph, string AND int64
    keys (index_in is type-generic)."""
    import numpy as np
    import ray

    from crawl4ai_llm_ray.pipelines.dedup import connected_components
    from crawl4ai_llm_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(41)
    n, m = 800, 2400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # a few edges referencing nodes OUTSIDE the node universe: the join
    # path's union+groupby admits such dst rows into the result, and the
    # broadcast path must reproduce that exactly
    src = np.concatenate([src, [0, 1, n + 5]])
    dst = np.concatenate([dst, [n + 5, n + 9, n + 9]])

    e_cc = pa.table(
        {
            "src": pa.array(np.concatenate([src, dst])),
            "dst": pa.array(np.concatenate([dst, src])),
        }
    )
    nodes = pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    a = (
        connected_components(ray.data.from_arrow(e_cc), ray.data.from_arrow(nodes))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        connected_components(
            ray.data.from_arrow(e_cc),
            ray.data.from_arrow(nodes),
            broadcast_max_rows=0,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)

    df = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    deg = df.groupby("src")["src"].transform("size")
    e_pr = pa.table(
        {
            "src": pa.array("u" + df["src"].astype(str)),
            "dst": pa.array("u" + df["dst"].astype(str)),
            "outdeg": pa.array(deg.to_numpy().astype(np.int64)),
        }
    )
    nodes_s = pa.table(
        {"node": pa.array(["u%d" % i for i in range(n)], pa.string())}
    )
    p1 = (
        pagerank(ray.data.from_arrow(e_pr), ray.data.from_arrow(nodes_s), iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    p2 = (
        pagerank(
            ray.data.from_arrow(e_pr),
            ray.data.from_arrow(nodes_s),
            iters=3,
            broadcast_max_rows=0,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(p1, p2)


@pytest.mark.usefixtures("ray_session")
def test_bfs_and_pointer_jump_broadcast_parity():
    """bfs_distance and pointer_jump_resolve broadcast fast paths must equal
    their distributed-join paths (broadcast_max_rows=0), including the
    inner-join drop of rows whose parent/src is outside the table."""
    import numpy as np
    import ray

    from crawl4ai_llm_ray.pipelines.graph import bfs_distance, pointer_jump_resolve

    rng = np.random.default_rng(17)
    n, m = 600, 1800
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # edges into nodes outside the universe exercise the union semantics
    src = np.concatenate([src, [0, n + 3]])
    dst = np.concatenate([dst, [n + 3, n + 7]])
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    nodes = pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    sources = [0, 5, 17]
    a = (
        bfs_distance(
            ray.data.from_arrow(edges), ray.data.from_arrow(nodes), sources
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        bfs_distance(
            ray.data.from_arrow(edges),
            ray.data.from_arrow(nodes),
            sources,
            broadcast_max_rows=0,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["dist"] == 0).sum() == len(sources)

    # functional graph: chains onto roots, plus rows whose parent is MISSING
    # from the table (the join path silently drops them — parity must too)
    k = 500
    node = np.arange(k, dtype=np.int64)
    parent = np.maximum(node - rng.integers(1, 4, k), 0)
    parent[0] = 0  # root
    node = np.concatenate([node, [10_000]])
    parent = np.concatenate([parent, [20_000]])  # dangling parent
    pt = pa.table({"node": pa.array(node), "parent": pa.array(parent)})
    r1 = (
        pointer_jump_resolve(ray.data.from_arrow(pt))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    r2 = (
        pointer_jump_resolve(ray.data.from_arrow(pt), broadcast_max_rows=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(r1, r2)
    assert (r1["root"] == 0).all()  # every surviving chain ends at the root
    assert 10_000 not in set(r1["node"])  # dangling row dropped by both


@pytest.mark.usefixtures("ray_session")
def test_broadcast_collect_handles_pandas_blocks():
    """to_arrow_refs hands back raw pandas blocks when an upstream
    map_groups produced them (incl. EMPTY ones with no columns) — the
    broadcast collect must coerce instead of crashing (regression: found
    via dedup_clusters at sf0.01)."""
    import numpy as np
    import ray

    from crawl4ai_llm_ray.pipelines.dedup import connected_components

    edges = pa.table(
        {
            "src": pa.array([1, 2, 7, 8], type=pa.int64()),
            "dst": pa.array([2, 1, 8, 7], type=pa.int64()),
            "g": pa.array([0, 0, 1, 2], type=pa.int64()),
        }
    )

    def maybe_empty(df):
        # group 2 yields an EMPTY pandas frame -> an empty pandas block
        if (df["g"] == 2).all():
            return df.iloc[0:0][["src", "dst"]]
        return df[["src", "dst"]]

    e = (
        ray.data.from_arrow(edges)
        .groupby("g")
        .map_groups(maybe_empty, batch_format="pandas")
    )
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([1, 2, 7, 8, 9], type=pa.int64())})
    )
    got = (
        connected_components(e, nodes)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert got == {1: 1, 2: 1, 7: 7, 8: 7, 9: 9}


@pytest.mark.usefixtures("ray_session")
def test_cc_fixpoint_not_fooled_by_checksum_aliasing_growth():
    """Regression (found by review): nodes {0,1,2}, path 0-1-2-9 with 9
    OUTSIDE the node universe, one edge per block so the batch-local
    contraction can't collapse the chain. After round 1 the labels are
    {0:0, 1:0, 2:1, 9:2} — same limb sums as the init {0:0, 1:1, 2:2}, so
    a sum-only fixpoint test exits early with wrong labels. The fixpoint
    state must include the row count; final labels are all 0."""
    import ray

    from crawl4ai_llm_ray.pipelines.dedup import connected_components

    def one_edge_blocks():
        parts = []
        for s, d in [(0, 1), (1, 2), (2, 9)]:
            parts.append(
                ray.data.from_arrow(
                    pa.table(
                        {
                            "src": pa.array([s, d], type=pa.int64()),
                            "dst": pa.array([d, s], type=pa.int64()),
                        }
                    )
                )
            )
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 1, 2], type=pa.int64())})
    )
    for bmr in [None, 0]:  # broadcast path AND join path
        got = (
            connected_components(one_edge_blocks(), nodes, broadcast_max_rows=bmr)
            .to_pandas()
            .set_index("node")["label"]
            .to_dict()
        )
        assert got == {0: 0, 1: 0, 2: 0, 9: 0}, (bmr, got)


@pytest.mark.usefixtures("ray_session")
def test_broadcast_lookup_property_equals_pandas_merge():
    """graph._broadcast_lookup is the in-map inner-join leg shared by the
    Pregel broadcast rounds AND regional_revenue's fast path — pin its
    semantics against a pandas inner merge on arbitrary (unique-key map,
    dup/missing-heavy probe) inputs: row ORDER of the probe is preserved,
    misses are dropped, every hit maps to its unique value."""
    import numpy as np
    import ray
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl4ai_llm_ray.pipelines.graph import _broadcast_lookup

    @given(
        keys=st.lists(
            st.integers(-50, 50), min_size=0, max_size=30, unique=True
        ),
        probe=st.lists(st.integers(-60, 60), min_size=0, max_size=60),
    )
    @settings(max_examples=60, deadline=None)
    def check(keys, probe):
        vals = [k * 7 + 1 for k in keys]  # distinct per key, order-checkable
        ref = ray.put(
            (pa.array(keys, pa.int64()), pa.array(vals, pa.int64()))
        )
        t = pa.table(
            {
                "k": pa.array(probe, pa.int64()),
                "row": pa.array(np.arange(len(probe), dtype=np.int64)),
            }
        )
        got_t, got_vals = _broadcast_lookup(t, ref, "k")
        left = pd.DataFrame({"k": probe, "row": np.arange(len(probe))})
        right = pd.DataFrame({"k": keys, "v": vals})
        want = left.merge(right, on="k", how="inner").sort_values("row")
        assert got_t["row"].to_pylist() == want["row"].tolist()  # order kept
        assert got_vals.to_pylist() == want["v"].tolist()

    check()

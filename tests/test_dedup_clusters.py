"""Golden-graph test for the distributed connected-components used by
dedup_clusters (VERDICT r1 item 2): fixed small graph, known components,
computed via the iterated join + groupby-min label propagation — no
driver-side edge loop anywhere."""

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

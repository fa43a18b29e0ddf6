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

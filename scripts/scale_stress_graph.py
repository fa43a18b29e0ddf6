"""Scale-stress the graph family: triangle_count / pagerank /
connected_components on a deterministic power-law (Zipf-degree) graph at
1x / 4x / 8x edge count — the skew shape where a naive triangle census or
an unsalted join blows up on the hub node ("curse of the last reducer").

Graph: n nodes, m = 10n directed edges; src drawn Zipf-ish via
u ~ splitmix(i) mapped through ranks**(-0.8) cumulative weights, dst
uniform, self-loops dropped. Node ids are strings ("n<id>") so the probe
exercises the same string-keyed path the crawl graph uses.

Usage:  python scripts/scale_stress_graph.py [scales ...]   (default 1 4 8)
Prints one JSON line per (op, scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

BASE_NODES = 20_000
TRIALS = int(os.environ.get("GRAFT_STRESS_TRIALS", "2"))


def build_edges(scale: int):
    n = BASE_NODES * scale
    m = 10 * n
    rng = np.random.default_rng(11)  # deterministic probe corpus
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** -0.8
    cdf = np.cumsum(w) / w.sum()
    src = np.searchsorted(cdf, rng.random(m)).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s = np.char.add("n", src.astype(str)).astype(object)
    d = np.char.add("n", dst.astype(str)).astype(object)
    edges = pa.table(
        {"src": pa.array(s, pa.string()), "dst": pa.array(d, pa.string())}
    )
    node_ids = np.char.add("n", np.arange(n).astype(str)).astype(object)
    nodes = pa.table({"node": pa.array(node_ids, pa.string())})
    return edges, nodes, int(len(src))


def timed(fn, trials=TRIALS):
    best, rows = float("inf"), None
    for _ in range(trials):
        t0 = time.time()
        res = fn()
        nrows = res.count() if hasattr(res, "count") else res.num_rows
        dt = time.time() - t0
        if dt < best:
            best, rows = dt, nrows
    return round(best, 2), rows


def main() -> None:
    import ray

    scales = [int(x) for x in sys.argv[1:]] or [1, 4, 8]
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.dedup import connected_components
    from crawl4ai_llm_ray.pipelines.graph import pagerank, triangle_count

    results = []
    for scale in scales:
        edges_t, nodes_t, m = build_edges(scale)

        def tri():
            return triangle_count(rd.from_arrow(edges_t), num_partitions=16)

        sec, _ = timed(tri)
        results.append({"op": "triangle_count", "scale": scale, "edges": m, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

        def pr():
            import pyarrow.compute as pc

            e = rd.from_arrow(edges_t)

            # distinct + outdeg, partition-local by src hash (same shape as
            # crawl_pagerank's edge prep)
            def prep(t: pa.Table) -> pa.Table:
                import pandas as pd

                df = t.to_pandas().drop_duplicates(["src", "dst"])
                deg = df.groupby("src")["dst"].transform("size")
                return pa.table(
                    {
                        "src": pa.array(df["src"], pa.string()),
                        "dst": pa.array(df["dst"], pa.string()),
                        "outdeg": pa.array(deg.to_numpy().astype(np.int64)),
                    }
                )

            def keyed(t: pa.Table) -> pa.Table:
                from crawl4ai_llm_ray.functions.hashing import fnv1a64

                kp = fnv1a64(t["src"]) % np.uint64(16)
                return t.append_column("kp", pa.array(kp.astype(np.int64)))

            ed = (
                e.map_batches(keyed, batch_format="pyarrow")
                .groupby("kp")
                .map_groups(
                    lambda t: prep(t.drop_columns(["kp"])), batch_format="pyarrow"
                )
            )
            # engine-default num_partitions (label-table-size-aware): the
            # probe measures the real code path, not a hand-tuned override
            return pagerank(ed, rd.from_arrow(nodes_t), iters=3)

        sec, _ = timed(pr)
        results.append({"op": "pagerank_3it", "scale": scale, "edges": m, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

        def cc():
            # connected_components' label arithmetic (limb checksum) is
            # int64-keyed — hash the string ids the same way
            # crawl_url_clusters does (fnv1a64 >> 1)
            from crawl4ai_llm_ray.functions.hashing import fnv1a64

            e = rd.from_arrow(edges_t)

            def both_dirs(t: pa.Table) -> pa.Table:
                hs = (fnv1a64(t["src"]) >> np.uint64(1)).astype(np.int64)
                hd = (fnv1a64(t["dst"]) >> np.uint64(1)).astype(np.int64)
                return pa.table(
                    {
                        "src": pa.array(np.concatenate([hs, hd])),
                        "dst": pa.array(np.concatenate([hd, hs])),
                    }
                )

            def node_ids(t: pa.Table) -> pa.Table:
                h = (fnv1a64(t["node"]) >> np.uint64(1)).astype(np.int64)
                return pa.table({"node": pa.array(h)})

            return connected_components(
                e.map_batches(both_dirs, batch_format="pyarrow"),
                rd.from_arrow(nodes_t).map_batches(node_ids, batch_format="pyarrow"),
            )

        sec, _ = timed(cc)
        results.append({"op": "connected_components", "scale": scale, "edges": m, "sec": sec})
        print(json.dumps(results[-1]), flush=True)
    ray.shutdown()
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()

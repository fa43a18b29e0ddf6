"""Distributed graph analytics over Ray Datasets: PageRank in exact integer
fixed-point arithmetic.

Floating-point PageRank is merge-order-dependent (float addition is not
associative), so a distributed run would drift from any serial oracle and
across cluster sizes. Here ranks are int64 fixed-point (``scale`` = 1.0):

    contrib(u) = pr(u) // outdeg(u)                 (exact floor division)
    pr'(v)     = base + (d_num * inflow(v)) // d_den
    base       = (scale * (d_den - d_num)) // d_den

Every operation is integer add / floor-div, which IS associative and
commutative — the result is bit-identical regardless of partitioning, merge
order, or cluster size, and replays exactly in SQL (the same reason the
HLL / histogram sketches in this repo are oracle-able). Dangling-node mass
is dropped each round (the standard simplification; total mass decays, the
RANKING is what the operator serves).

Execution shape per iteration (the Pregel/GraphX pattern the repo's
connected_components already uses, dedup.py:851):

    msgs   = edges ⋈ ranks on src       (partitioned hash join)
    inflow = (zeros ∪ msgs).groupby(node).sum(contrib)
    ranks  = base + (d_num * inflow) // d_den

so each round is one narrow join plus one narrow aggregate; nothing ever
reaches the driver. ``num_partitions`` defaults to rank-table-size-aware for
the same aggregator-actor-cost reason documented on connected_components.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pagerank(
    edges,
    nodes,
    iters: int = 5,
    scale: int = 1_000_000,
    damping: tuple[int, int] = (85, 100),
    num_partitions: int | None = None,
):
    """``edges``: Dataset (src, dst, outdeg) — DISTINCT directed edges, no
    self-loops, ``outdeg`` = out-degree of ``src`` within this edge set.
    ``nodes``: Dataset (node), distinct. Returns Dataset (node, pr) after
    ``iters`` rounds from a uniform ``pr = scale`` start."""
    d_num, d_den = damping
    base = (scale * (d_den - d_num)) // d_den

    def init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "pr": pa.array(np.full(t.num_rows, scale, dtype=np.int64)),
            }
        )

    def zero(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "inflow": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()
    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = max(2, min(64, ranks.count() // 500_000))
    if edges.count() == 0:
        # no links: every node ends at the fixpoint base + 0 after one round
        def flat(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "pr": pa.array(np.full(t.num_rows, base, dtype=np.int64)),
                }
            )

        return ranks.map_batches(flat, batch_format="pyarrow")
    zeros = nodes.map_batches(zero, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        c = t["pr"].to_numpy() // t["outdeg"].to_numpy()
        return pa.table({"node": t["dst"], "inflow": pa.array(c.astype(np.int64))})

    def renorm(t: pa.Table) -> pa.Table:
        s = t["sum(inflow)"].to_numpy()
        pr = base + (d_num * s.astype(np.int64)) // d_den
        return pa.table({"node": t["node"], "pr": pa.array(pr)})

    for _ in range(iters):
        msgs = edges.join(
            ranks,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(contrib, batch_format="pyarrow")
        ranks = (
            zeros.union(msgs)
            .groupby("node")
            .sum("inflow")
            .map_batches(renorm, batch_format="pyarrow")
            .materialize()
        )
    return ranks

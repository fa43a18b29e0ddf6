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

Below ``BROADCAST_MAX_ROWS`` every Pregel-family op here (pagerank,
bfs_distance, pointer_jump_resolve, and dedup.connected_components)
switches to a zero-shuffle broadcast round: ray.put the node-keyed state,
look it up in-map with pc.index_in over the materialized edge blocks,
pre-aggregate block-locally, and finish the associative integer min/sum as
a driver-side pyarrow C++ group_by over the small partials — bit-identical
to the join rounds (parity-tested) and 9-20× faster at the stress scales,
because Ray's sort-based groupby pays ~25 s/round on low-block-count
inputs (BASELINE.md microbench). Above the threshold the join rounds run
unchanged, so a 100 TB node table never lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _limb_checksum(ds, col: str) -> tuple:
    """Overflow-safe monotone fixpoint metric shared by the Pregel family:
    the exact sum of ``col`` split into 21-bit limbs (value = hi·2^42 +
    mid·2^21 + lo; each limb sum ≤ n·2^21, no int64 overflow below 2^42
    rows; the limb triple is a bijection of the true sum). Valid ONLY for
    monotone quantities (CC min-labels, BFS distances) — see
    pointer_jump_resolve for why non-monotone values need a changed-row
    count instead. All three limb sums come from ONE pipeline execution."""
    import numpy as np
    import pyarrow as pa

    M = np.int64((1 << 21) - 1)

    def limbs(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        return pa.table(
            {
                "hi": pa.array(v >> np.int64(42)),
                "mid": pa.array((v >> np.int64(21)) & M),
                "lo": pa.array(v & M),
            }
        )

    sums = ds.map_batches(limbs, batch_format="pyarrow").sum(["hi", "mid", "lo"])
    return (sums["sum(hi)"], sums["sum(mid)"], sums["sum(lo)"])


# Broadcast fast path (the "broadcast small sides" pattern): when the
# node-keyed state table (ranks / CC labels) fits under this row bound, each
# Pregel round replaces the partitioned edges⋈state hash join with one
# ray.put of the state table + a vectorized pc.index_in lookup inside
# map_batches over the (already materialized) edge blocks — one narrow map
# instead of a two-leg shuffle with per-partition aggregator actors. Above
# the bound the distributed join runs unchanged, so a 100 TB node table
# never lands on the driver. 2M rows ≈ 32 MB as (int64 node, int64 value);
# string-keyed graphs (crawl URLs) run ~100 B/row, still ≤ ~200 MB — one
# object-store copy shared zero-copy by every map task.
BROADCAST_MAX_ROWS = 2_000_000


def _collect_table(ds) -> "pa.Table":
    """Pull a (small, threshold-gated) Dataset to one driver Arrow table.
    to_arrow_refs hands back raw blocks, which can be pandas-format when an
    upstream stage produced them (e.g. an empty pandas block out of a
    map_groups) — coerce those."""
    import ray

    tbls = []
    for t in ray.get(ds.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            tbls.append(t)
    if not tbls:
        return None
    return pa.concat_tables(tbls).combine_chunks()


def _limb_checksum_np(v: np.ndarray) -> tuple:
    """Driver-side twin of _limb_checksum over an int64 numpy array."""
    M = np.int64((1 << 21) - 1)
    return (
        int((v >> np.int64(42)).sum()),
        int(((v >> np.int64(21)) & M).sum()),
        int((v & M).sum()),
    )


def _broadcast_lookup(t: pa.Table, ref, key: str):
    """Inside-map join leg: map t[key] through the broadcast (keys, values)
    pair in ``ref``; rows whose key is absent are dropped (inner-join
    semantics, matching the join path). Returns (filtered table, values)."""
    import pyarrow.compute as pc
    import ray

    keys_a, vals_a = ray.get(ref)
    idx = pc.index_in(t[key], value_set=keys_a)
    if idx.null_count:
        valid = pc.is_valid(idx)
        t = t.filter(valid)
        idx = idx.filter(valid)
    return t, pc.take(vals_a, idx)


def _concat_group(tbls, key: str, col: str, agg: str) -> "pa.Table":
    """Concat + pyarrow C++ group_by (exact integer min/sum — associative,
    so the result is bit-identical to the distributed groupby it replaces).
    Used both as the block-local combiner inside map tasks and as the
    driver-side final combine over the small partials.
    Returns a (key, col) table."""
    merged = (
        pa.concat_tables(tbls)
        .group_by(key)
        .aggregate([(col, agg)])
    )
    return pa.table(
        {key: merged[key], col: merged[f"{col}_{agg}"]}
    ).combine_chunks()


def _broadcast_rounds(
    node_arr,
    val_arr,
    edges_b,
    make_msg_fn,
    col: str,
    agg: str,
    cur_fn,
    update_fn,
    iters: int | None = None,
):
    """The shared driver loop of the Pregel-family broadcast fast path
    (pagerank / connected_components / bfs_distance — one copy so the
    soundness-critical pieces can't drift between them). Per round:

        ref    = ray.put((node_arr, val_arr))           # broadcast state
        parts  = collect(edges_b.map_batches(make_msg_fn(ref)))
                                        # lookup + BLOCK-LOCAL combiner
        merged = _concat_group([cur_fn(node_arr, val_arr)] + parts,
                               "node", col, agg)        # driver C++ group_by
        node_arr, val_arr = update_fn(merged)

    ``iters`` set → exactly that many rounds (pagerank). ``iters=None`` →
    run to the (ROW COUNT, limb sums) fixpoint: the merge step can GROW the
    node set (a dst outside the node universe enters via union semantics),
    and a new row's entering value can exactly offset an in-universe
    decrease in the limb sums — sum-only convergence is unsound on a
    growing set. Count + sums together are sound: each round is a
    deterministic function of (edges, state), and on an UNCHANGED set the
    values are monotone non-increasing under a min combine, so equal sums
    mean no value moved. Returns the final (node_arr, val_arr)."""
    import itertools

    import ray

    if iters is None:
        prev = (len(node_arr), _limb_checksum_np(val_arr.to_numpy()))
    rounds = range(iters) if iters is not None else itertools.count()
    for _ in rounds:
        ref = ray.put((node_arr, val_arr))
        parts = _collect_table(
            edges_b.map_batches(
                make_msg_fn(ref), batch_format="pyarrow", batch_size=None
            )
        )
        merged = _concat_group(
            [cur_fn(node_arr, val_arr)] + ([parts] if parts is not None else []),
            "node",
            col,
            agg,
        )
        node_arr, val_arr = update_fn(merged)
        if iters is None:
            new = (len(node_arr), _limb_checksum_np(val_arr.to_numpy()))
            if new == prev:
                break
            prev = new
    return node_arr, val_arr


def _ensure_min_blocks(ds, target: int):
    """Split-before-shuffle guard. The sort-based groupby sizes its task
    graph from its input block count, so a low-block MATERIALIZED input
    (e.g. a 1-block from_arrow table) serializes the whole exchange
    (BASELINE.md microbench: 30 s on 1 block vs ~4 s on 32 blocks for
    identical rows). Only ever SPLITS: an input already at/above ``target``
    blocks is returned unchanged (an unconditional ``repartition(target)``
    would COALESCE a 256-block parquet read down to ``target``, cutting
    parallelism 4x — the opposite pathology), and a lazy input keeps its
    native read/transform parallelism (its block count is unknowable
    without executing, and read paths are already multi-block)."""
    try:
        n = ds.num_blocks()  # MaterializedDataset only
    except NotImplementedError:
        return ds
    if n < target:
        ds = ds.repartition(target, shuffle=False)
    return ds


def _split_for_map(edges, rows_per_block: int = 128_000):
    """Broadcast-mode edge layout: split a materialized edge Dataset so the
    per-round lookup map has at least a few parallel tasks (a single
    from_arrow block would serialize the whole round)."""
    n = edges.count()
    want = max(1, min(256, n // rows_per_block))
    if edges.num_blocks() < want:
        edges = edges.repartition(want).materialize()
    return edges


def pagerank(
    edges,
    nodes,
    iters: int = 5,
    scale: int = 1_000_000,
    damping: tuple[int, int] = (85, 100),
    num_partitions: int | None = None,
    broadcast_max_rows: int | None = None,
):
    """``edges``: Dataset (src, dst, outdeg) — DISTINCT directed edges, no
    self-loops, ``outdeg`` = out-degree of ``src`` within this edge set.
    ``nodes``: Dataset (node), distinct. Returns Dataset (node, pr) after
    ``iters`` rounds from a uniform ``pr = scale`` start.

    When the rank table AND edge set fit under ``broadcast_max_rows``
    (default BROADCAST_MAX_ROWS), each iteration broadcasts the ranks via
    ray.put, the contribution leg becomes a vectorized in-map lookup +
    block-local pre-sum over the materialized edge blocks, and the final
    sum runs as a driver-side pyarrow C++ group_by over the small partials
    — zero per-iteration all-to-all. Bit-identical to the join path (exact
    integer arithmetic, associative sums; pass ``broadcast_max_rows=0`` to
    force the join, which is also what a >2M-node graph gets
    automatically)."""
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
    n_edges = edges.count()
    if num_partitions is None:
        # per-round cost is driven by the JOIN/GROUPBY volume, which is the
        # edge count, not the node count — size from whichever is larger
        # (measured on the 1.6M-edge Zipf stress graph: P=2 → 131 s,
        # P=16 → 66 s for 3 iterations; tiny graphs stay at P=2 where
        # per-partition aggregator actors dominate)
        num_partitions = max(2, min(64, max(ranks.count(), n_edges) // 100_000))
    if n_edges == 0:
        # no links: every node ends at the fixpoint base + 0 after one round
        def flat(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "pr": pa.array(np.full(t.num_rows, base, dtype=np.int64)),
                }
            )

        return ranks.map_batches(flat, batch_format="pyarrow")

    def contrib(t: pa.Table) -> pa.Table:
        c = t["pr"].to_numpy() // t["outdeg"].to_numpy()
        return pa.table({"node": t["dst"], "inflow": pa.array(c.astype(np.int64))})

    def renorm(t: pa.Table) -> pa.Table:
        s = t["sum(inflow)"].to_numpy()
        pr = base + (d_num * s.astype(np.int64)) // d_den
        return pa.table({"node": t["node"], "pr": pa.array(pr)})

    if broadcast_max_rows is None:
        broadcast_max_rows = BROADCAST_MAX_ROWS
    # driver pull per iteration is bounded by the per-block-distinct partial
    # volume ≤ edge count, so gate on both sides of the exchange
    use_broadcast = (
        ranks.count() <= broadcast_max_rows
        and n_edges <= 4 * broadcast_max_rows
    )

    def contrib_bcast(ref):
        def fn(t: pa.Table) -> pa.Table:
            t, pr = _broadcast_lookup(t, ref, "src")
            c = pr.to_numpy(zero_copy_only=False).astype(np.int64) // t[
                "outdeg"
            ].to_numpy()
            part = pa.table({"node": t["dst"], "inflow": pa.array(c)})
            # block-local combiner: pre-sum per dst before anything moves
            return _concat_group([part], "node", "inflow", "sum")

        return fn

    if use_broadcast:
        # Broadcast mode: no per-iteration all-to-all at all. Each round is
        # one streaming map over the materialized edge blocks (ray.put'd
        # ranks + pc.index_in lookup + block-local pre-sum) and a driver
        # C++ group_by over the small partials (integer sums — associative,
        # bit-identical to the distributed groupby). The framework
        # sort-groupby costs ~25 s PER ROUND on a low-block-count input at
        # the 8× stress scale; this path replaces it outright.
        import ray.data as _rd

        rt = _collect_table(ranks)
        if rt is None:  # no nodes: every iteration is vacuously empty
            return ranks
        edges = _split_for_map(edges)

        def cur_zeros(node_arr, _pr):
            # the running inflow baseline: zero per known node (state lives
            # in pr_arr, re-derived from the merged sums each round)
            return pa.table(
                {
                    "node": node_arr,
                    "inflow": pa.array(np.zeros(len(node_arr), dtype=np.int64)),
                }
            )

        def renorm_update(merged):
            s = merged["inflow"].to_numpy()
            return (
                merged["node"].combine_chunks(),
                pa.array(base + (d_num * s.astype(np.int64)) // d_den),
            )

        node_arr, pr_arr = _broadcast_rounds(
            rt["node"].combine_chunks(),
            rt["pr"].combine_chunks(),
            edges,
            contrib_bcast,
            "inflow",
            "sum",
            cur_zeros,
            renorm_update,
            iters=iters,
        )
        return _rd.from_arrow(pa.table({"node": node_arr, "pr": pr_arr}))

    zeros = nodes.map_batches(zero, batch_format="pyarrow").materialize()
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


def triangle_count(edges, num_partitions: int = 8):
    """Exact triangle counting over a directed edge Dataset (src, dst) via
    the oriented-wedge pattern (node-iterator of Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11 — public
    algorithm). Returns a ONE-ROW pyarrow table
    (n_nodes, n_edges, n_wedges, n_triangles) over the undirected graph.

    Deliberately JOIN-FREE: every stage is hash-partition ``groupby(part)
    .map_groups`` with vectorized pandas/numpy inside — Ray's hash-join
    operator both spawns one aggregator actor per partition per join (3
    chained joins starve the CPU budget, BASELINE.md minhash carry-vs-join
    measurement) and crashes on zero-row partitions (schema-less block in
    the aggregator finalize). The union+tagged-partition shape sidesteps
    both and is the same machinery the dedup connected-components uses.

    1. undirect + distinct: (a, b) = (min, max) endpoint pair; all copies
       share ``a``'s hash → dedup is partition-local.
    2. degree WITHOUT a join: explode each edge into its two (node, a, b)
       halves, partition by node — a node's degree is just its row count
       inside its partition (transform("size")); first-row flags summed give
       n_nodes for free.
    3. re-pair the two halves on ``a``'s partition and orient each edge from
       lower (deg, node) to higher — oriented out-degree is then O(sqrt(m)),
       bounding wedge fan-out independent of hub degree.
    4. wedges: partition on src; one sort + ragged-arange pair expansion
       (pure numpy, no per-src Python loop) emits ordered neighbor pairs.
    5. close: wedges and oriented edges tagged + unioned, partitioned by the
       wedge's first endpoint (= the closing edge's src), counted with one
       in-partition pandas merge. Each triangle {x<y<z by rank} is counted
       exactly once, at apex x.

    ``n_wedges`` is the graph wedge count sum deg(v)*(deg(v)-1)/2 (the
    global-clustering-coefficient denominator: coefficient = 3*n_triangles /
    n_wedges), computed for free in the degree stage; the oriented wedge
    stream itself is never materialized as a dataset-wide statistic. At web scale nodes would
    be dictionary-encoded to u64 ids first; string keys are kept so the
    DuckDB oracle replays byte-for-byte.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64

    P = num_partitions

    def undirect(t: pa.Table) -> pa.Table:
        src, dst = t["src"], t["dst"]
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        m = pc.less(src, dst)
        a = pc.if_else(m, src, dst)
        b = pc.if_else(m, dst, src)
        ep = (fnv1a64(a) % np.uint64(P)).astype(np.int64)
        return pa.table({"a": a, "b": b, "ep": pa.array(ep)})

    und = (
        # guarded split before the shuffle (see _ensure_min_blocks): a
        # 1-block edge table would serialize the groupby exchange; a
        # many-block read must NOT be coalesced
        _ensure_min_blocks(edges, 4 * P)
        .map_batches(undirect, batch_format="pyarrow")
        .groupby("ep")
        .map_groups(
            lambda df: df.drop_duplicates(["a", "b"])[["a", "b"]],
            batch_format="pandas",
        )
        .materialize()
    )

    def zeros_row() -> pa.Table:
        z = pa.array([0], type=pa.int64())
        return pa.table(
            {"n_nodes": z, "n_edges": z, "n_wedges": z, "n_triangles": z}
        )

    n_edges = und.count()
    if n_edges == 0:
        return zeros_row()

    # --- stage 2: endpoint explode; degree = in-partition row count ---
    def explode(t: pa.Table) -> pa.Table:
        a, b = t["a"], t["b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        node = pa.concat_arrays([a, b])
        side = pa.array(
            np.repeat(np.array([0, 1], dtype=np.int64), t.num_rows)
        )
        out = pa.table(
            {
                "node": node,
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([b, b]),
                "side": side,
            }
        )
        np_part = (fnv1a64(out["node"]) % np.uint64(P)).astype(np.int64)
        return out.append_column("np", pa.array(np_part))

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["node", "a", "b", "side"]].copy()
        df["deg"] = df.groupby("node")["node"].transform("size").astype(np.int64)
        first = (~df["node"].duplicated()).astype(np.int64)
        df["first"] = first
        # graph wedge partial: deg*(deg-1)/2 once per node (the denominator
        # of the global clustering coefficient, summed cheaply right here)
        df["wedge"] = (first.to_numpy() * df["deg"].to_numpy()
                       * (df["deg"].to_numpy() - 1) // 2).astype(np.int64)
        return df

    halves = (
        und.map_batches(explode, batch_format="pyarrow")
        .groupby("np")
        .map_groups(attach_deg, batch_format="pandas")
        .materialize()
    )
    n_nodes = int(halves.sum("first"))
    n_wedges = int(halves.sum("wedge"))

    # --- stage 3: re-pair halves on a's hash; orient by (deg, node) ---
    def repartition_a(t: pa.Table) -> pa.Table:
        ep = (fnv1a64(t["a"]) % np.uint64(P)).astype(np.int64)
        return t.select(["a", "b", "side", "deg"]).append_column(
            "ep", pa.array(ep)
        )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        s0 = df[df["side"] == 0][["a", "b", "deg"]].rename(
            columns={"deg": "deg_a"}
        )
        s1 = df[df["side"] == 1][["a", "b", "deg"]].rename(
            columns={"deg": "deg_b"}
        )
        m = s0.merge(s1, on=["a", "b"])  # partition-local, vectorized
        fwd = (m["deg_a"] < m["deg_b"]) | (
            (m["deg_a"] == m["deg_b"]) & (m["a"] < m["b"])
        )
        fv = fwd.to_numpy()
        a = m["a"].to_numpy()
        b = m["b"].to_numpy()
        da = m["deg_a"].to_numpy()
        db = m["deg_b"].to_numpy()
        return pd.DataFrame(
            {
                "src": np.where(fv, a, b),
                "dst": np.where(fv, b, a),
                "ddst": np.where(fv, db, da).astype(np.int64),
            }
        )

    oriented = (
        halves.map_batches(repartition_a, batch_format="pyarrow")
        .groupby("ep")
        .map_groups(orient, batch_format="pandas")
        .materialize()
    )

    if n_wedges == 0:
        return pa.table(
            {
                "n_nodes": pa.array([n_nodes], type=pa.int64()),
                "n_edges": pa.array([n_edges], type=pa.int64()),
                "n_wedges": pa.array([0], type=pa.int64()),
                "n_triangles": pa.array([0], type=pa.int64()),
            }
        )

    # --- stage 4+5: wedge expansion and tagged closing count ---
    def tag_edges(t: pa.Table) -> pd.DataFrame:
        # pandas output: the closing pass unions this with the (pandas-block)
        # wedge stream, and Ray's sort-based groupby refuses mixed block types
        sp = (fnv1a64(t["src"]) % np.uint64(P)).astype(np.int64)
        return pd.DataFrame(
            {
                "v": t["src"].to_numpy(zero_copy_only=False),
                "w": t["dst"].to_numpy(zero_copy_only=False),
                "ddst": t["ddst"].to_numpy(),
                "tag": np.ones(t.num_rows, dtype=np.int64),
                "sp": sp,
            }
        )

    def wedges_from(df: pd.DataFrame) -> pd.DataFrame:
        """Within an sp-partition: expand each src's ordered out-neighbor
        pairs (the wedges) via one sort + ragged-arange — no per-src Python
        loop. Emits wedge rows only; the closing membership check happens in
        the NEXT partition pass (keyed by the pair's lower-rank endpoint =
        the closing edge's src), because the closing edge lives in that
        node's partition, not this one's."""
        e = df[df["tag"] == 1].sort_values(
            ["v", "ddst", "w"], kind="mergesort"
        )
        src = e["v"].to_numpy()
        dst = e["w"].to_numpy()
        n = len(e)
        if n == 0:
            return pd.DataFrame(
                {"v": np.array([], dtype=object), "w": np.array([], dtype=object),
                 "ddst": np.array([], dtype=np.int64),
                 "tag": np.array([], dtype=np.int64),
                 "sp": np.array([], dtype=np.int64)}
            )
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = src[1:] != src[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new_grp, np.arange(n), 0)
        )
        local = np.arange(n) - grp_start
        reps = local
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame(
                {"v": np.array([], dtype=object), "w": np.array([], dtype=object),
                 "ddst": np.array([], dtype=np.int64),
                 "tag": np.array([], dtype=np.int64),
                 "sp": np.array([], dtype=np.int64)}
            )
        w_idx = np.repeat(np.arange(n), reps)
        ragged = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        v_idx = np.repeat(np.arange(n) - local, reps) + ragged
        wv = dst[v_idx]  # lower-rank endpoint of the pair = closing src
        ww = dst[w_idx]
        return pd.DataFrame(
            {
                "v": wv,
                "w": ww,
                "ddst": np.zeros(total, dtype=np.int64),
                "tag": np.zeros(total, dtype=np.int64),
                "sp": np.zeros(total, dtype=np.int64),  # re-keyed below
            }
        )

    wedge_rows = (
        oriented.map_batches(tag_edges, batch_format="pyarrow")
        .groupby("sp")
        .map_groups(wedges_from, batch_format="pandas")
    )

    def rekey_v(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.copy()
        df["sp"] = (
            fnv1a64(pa.array(df["v"].astype(str))) % np.uint64(P)
        ).astype(np.int64)
        return df

    tagged = (
        wedge_rows.map_batches(rekey_v, batch_format="pandas")
        .union(
            oriented.map_batches(tag_edges, batch_format="pyarrow")
        )
    )

    def close_count(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["tag"] == 1][["v", "w"]]
        wd = df[df["tag"] == 0][["v", "w"]]
        if not len(e) or not len(wd):
            return pd.DataFrame({"n": np.array([0], dtype=np.int64)})
        m = wd.merge(e.drop_duplicates(), on=["v", "w"])
        return pd.DataFrame({"n": np.array([len(m)], dtype=np.int64)})

    tri_sum = (
        tagged.groupby("sp")
        .map_groups(close_count, batch_format="pandas")
        .sum("n")
    )
    n_tri = int(tri_sum) if tri_sum is not None else 0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], type=pa.int64()),
            "n_edges": pa.array([n_edges], type=pa.int64()),
            "n_wedges": pa.array([n_wedges], type=pa.int64()),
            "n_triangles": pa.array([n_tri], type=pa.int64()),
        }
    )


def bfs_distance(
    edges,
    nodes,
    source_set,
    num_partitions: int = 4,
    broadcast_max_rows: int | None = None,
):
    """(node, dist) multi-source BFS over a directed edge Dataset: dist =
    minimum hop count from any source, -1 for unreachable nodes. The third
    member of the Pregel family next to pagerank (above) and
    connected_components (dedup.py): per round

        msgs = (edges ⋈ dist on src, dist finite)[dst, dist+1]
        dist = (dist ∪ msgs).groupby(node).min(dist)

    until the global dist sum stops decreasing (distances are monotone
    non-increasing ints, so an unchanged sum IS the fixpoint; rounds ≤
    graph eccentricity of the source set). Every step is a partitioned
    hash join + narrow aggregate — no driver-side edge loop; integer
    arithmetic, so the result is bit-identical across partitionings and
    replays exactly in a recursive-CTE SQL oracle.

    ``source_set``: small broadcastable set of node ids (seed lists are
    dimension-sized by nature — shipped once via closure capture, the
    ray.put broadcast pattern, not re-derived per batch).

    Shares the threshold-gated broadcast fast path with pagerank /
    connected_components: when dist table and edge set fit under
    ``broadcast_max_rows`` (default BROADCAST_MAX_ROWS), each round is one
    in-map lookup + block-local pre-min over the edge blocks and a driver
    C++ group_by — zero per-round all-to-all, bit-identical results
    (integer min is associative). BFS benefits most: its round count is the
    source set's eccentricity, not a contracted diameter."""
    import ray

    SENT = np.int64(1 << 40)  # unreachable sentinel, far above any real dist
    src_ref = ray.put(frozenset(source_set))

    def init(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        srcs = ray.get(src_ref)
        is_src = pc.is_in(
            t["node"], value_set=pa.array(sorted(srcs), t["node"].type)
        ).to_numpy(zero_copy_only=False)
        d = np.where(is_src, np.int64(0), SENT)
        return pa.table({"node": t["node"], "dist": pa.array(d)})

    dist = nodes.map_batches(init, batch_format="pyarrow").materialize()
    edges = edges.materialize()
    if broadcast_max_rows is None:
        broadcast_max_rows = BROADCAST_MAX_ROWS
    use_broadcast = (
        dist.count() <= broadcast_max_rows
        and edges.count() <= 4 * broadcast_max_rows
    )
    if edges.count() == 0:
        prev = dist
    elif use_broadcast:
        import pyarrow.compute as pc
        import ray.data as _rd

        def bump_bcast(ref):
            def fn(t: pa.Table) -> pa.Table:
                t, d = _broadcast_lookup(t, ref, "src")
                keep = pc.less(d, pa.scalar(int(SENT), pa.int64()))
                t = t.filter(keep)
                d = d.filter(keep)
                part = pa.table(
                    {
                        "node": t["dst"],
                        "dist": pc.add(d, pa.scalar(1, pa.int64())),
                    }
                )
                return _concat_group([part], "node", "dist", "min")

            return fn

        dt0 = _collect_table(dist)
        if dt0 is None:
            prev = dist
        else:
            # (count, sums) fixpoint via _broadcast_rounds (shared with
            # connected_components): BFS dists are provably alias-free even
            # on a growing node set (finite values never decrease;
            # SENT→finite moves the mid limb, new rows only add lo), but
            # the count term makes the soundness argument local instead of
            # global — and it's free here.
            node_arr, dist_arr = _broadcast_rounds(
                dt0["node"].combine_chunks(),
                dt0["dist"].combine_chunks(),
                _split_for_map(edges),
                bump_bcast,
                "dist",
                "min",
                lambda n, d: pa.table({"node": n, "dist": d}),
                lambda m: (
                    m["node"].combine_chunks(),
                    m["dist"].combine_chunks(),
                ),
            )
            prev = _rd.from_arrow(
                pa.table({"node": node_arr, "dist": dist_arr})
            )
    else:
        # (count, sums) — see the broadcast loop's comment
        prev_sum = (dist.count(), _limb_checksum(dist, "dist"))
        while True:
            import pyarrow.compute as pc

            def bump(t: pa.Table) -> pa.Table:
                keep = pc.less(t["dist"], pa.scalar(int(SENT), pa.int64()))
                t = t.filter(keep)
                return pa.table(
                    {
                        "node": t["dst"],
                        "dist": pc.add(t["dist"], pa.scalar(1, pa.int64())),
                    }
                )

            msgs = edges.join(
                dist,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("node",),
            ).map_batches(bump, batch_format="pyarrow")
            merged = (
                dist.union(msgs)
                .groupby("node")
                .min("dist")
                .rename_columns({"min(dist)": "dist"})
                .materialize()
            )
            new_sum = (merged.count(), _limb_checksum(merged, "dist"))
            dist = merged
            if new_sum == prev_sum:
                prev = merged
                break
            prev_sum = new_sum

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t["dist"]
        unreached = pc.greater_equal(d, pa.scalar(int(SENT), pa.int64()))
        return pa.table(
            {
                "node": t["node"],
                "dist": pc.if_else(unreached, pa.scalar(-1, pa.int64()), d),
            }
        )

    return prev.map_batches(finish, batch_format="pyarrow")


def pointer_jump_resolve(
    parents, num_partitions: int = 4, broadcast_max_rows: int | None = None
):
    """(node, root): resolve every chain of a FUNCTIONAL graph (each node
    has exactly one parent; roots point at themselves) to its terminal root
    by POINTER DOUBLING: each round replaces parent with parent-of-parent
    via one partitioned self-join, so a chain of length L resolves in
    ⌈log2 L⌉ rounds — the redirect-chain / symlink / union-find-flatten
    primitive at web scale, where naive per-hop iteration would take L
    all-to-all rounds. Fourth member of the Pregel family (pagerank,
    connected_components, bfs_distance) but with a LOGARITHMIC round bound
    instead of diameter.

    ``parents``: Dataset (node:int64, parent:int64). Rounds are bounded by
    the PROVABLE ⌈log2 n⌉ + 1 (a chain is at most n long and doubling
    halves the remaining distance each round; 34 rounds covers 10^10
    nodes), with an EXACT early exit — the per-round count of rows whose
    parent actually moved. A sum/checksum fixpoint test would be wrong
    here: parent VALUES are hash ids, not monotone along a chain, so a
    swap could alias the sums (unlike connected_components' min-labels,
    which are monotone). Integer-exact; recursive-CTE SQL twin.

    Below ``broadcast_max_rows`` (default BROADCAST_MAX_ROWS) the whole
    doubling loop runs driver-side as vectorized pc.index_in / pc.take
    rounds over the pulled table — a functional graph IS its own state
    table, so this is the pagerank/CC broadcast fast path with the edge
    map folded away. Round-for-round identical to the self-join, including
    its inner-join drop of rows whose current parent is absent; pass
    ``broadcast_max_rows=0`` to force the distributed self-join."""
    import math

    cur = parents.materialize()
    n = cur.count()
    if n == 0:
        return cur
    import pyarrow.compute as pc

    if broadcast_max_rows is None:
        broadcast_max_rows = BROADCAST_MAX_ROWS
    if n <= broadcast_max_rows:
        import ray.data as _rd

        ct = _collect_table(cur)
        node_a = ct["node"].combine_chunks()
        par_a = ct["parent"].combine_chunks()
        rounds = max(1, math.ceil(math.log2(max(2, n))) + 1)
        for _ in range(rounds):
            idx = pc.index_in(par_a, value_set=node_a)
            par_full = par_a  # idx positions refer to the PRE-filter table
            if idx.null_count:
                valid = pc.is_valid(idx)
                node_a = node_a.filter(valid)
                par_a = par_a.filter(valid)
                idx = idx.filter(valid)
            gp = pc.take(par_full, idx)
            changed = pc.sum(
                pc.cast(pc.not_equal(par_a, gp), pa.int64())
            ).as_py()
            par_a = gp
            if not changed:
                break
        return _rd.from_arrow(pa.table({"node": node_a, "root": par_a}))

    def hop_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "parent": t["gp"],
                "changed": pc.cast(
                    pc.not_equal(t["parent"], t["gp"]), pa.int64()
                ),
            }
        )

    rounds = max(1, math.ceil(math.log2(max(2, n))) + 1)
    for _ in range(rounds):
        # parent' = parent[parent]: join cur (as child->p) with cur (as p->gp)
        hop = (
            cur.join(
                cur.rename_columns({"node": "p", "parent": "gp"}),
                join_type="inner",
                num_partitions=num_partitions,
                on=("parent",),
                right_on=("p",),
            )
            .map_batches(hop_cols, batch_format="pyarrow")
            .materialize()
        )
        n_changed = hop.sum("changed")
        cur = hop.select_columns(["node", "parent"])
        if not n_changed:  # EXACT early exit: zero rows actually moved
            break

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "root": t["parent"]})

    return cur.map_batches(out, batch_format="pyarrow")

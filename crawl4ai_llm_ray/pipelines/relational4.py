"""Fourth operator batch: the two classic time-join shapes Ray Data has no
native operator for — as-of join and windowed range join — expressed as
composition of map_batches + groupby().map_groups per the engine's design
rules (narrow shuffle rows, vectorized pandas inside groups, partitioning
assumption documented per operator).

The reference has no time joins at all (its only join shape is id-equality
lookup, ``/root/reference/crawl4ai_llm/storage/json_storage.py``); these are
engine extensions in the SURVEY §2.9 streaming/windowing family, exercised
over the synthetic events table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# regional_revenue's broadcast-join gate: when orders AND customer both fit
# under this (footer row counts), the (o_orderkey → regionkey) map is built
# driver-side and broadcast once — the query becomes one shuffle-free pass
# over lineitem. 4M narrow int64 rows ≈ 64 MB in the object store.
REGIONAL_BROADCAST_MAX_ROWS = 4_000_000


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _events_ts_span_us(sf_dir: str) -> int | None:
    """Span of the events ts column in microseconds, from parquet row-group
    STATISTICS only (no data read). None when stats are unavailable."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/events.parquet")
    md = pf.metadata
    lo = hi = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema != "ts":
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                return None
            mn, mx = pd.Timestamp(st.min), pd.Timestamp(st.max)
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
    if lo is None:
        return None
    return int(hi.value // 1000) - int(lo.value // 1000)  # ns → us


def asof_join(sf_dir: str, bucket_us: int | None | str = "auto"):
    """AS-OF join: for each ``purchase`` event, the most recent ``click`` by
    the same user at-or-before it (ties on ts broken by max event_id), inner —
    purchases with no prior click are dropped. Returns
    (purchase_id, user_id, click_id, gap_us), all int64.

    Shape (default): both sides reduce to narrow (user_id, ts_us, event_id,
    is_p) rows in one map_batches, union arrives for free (one filtered
    read), then ONE ``groupby(user_id).map_groups`` does the merge: sort the
    group by (ts_us, is_p, event_id) — clicks sort before purchases at equal
    ts, so a vectorized forward-fill of the click columns IS the as-of
    semantics.

    DEFAULT ("auto"): the segmented-scan variant with a data-span-derived
    bucket (span/64 from parquet row-group statistics — no data read). It is
    both the hot-key-safe shape (no task ever holds a whole hot user — each
    (user, time-bucket) cell is bounded) AND the measured-faster one even on
    unskewed data (2.3×, BASELINE.md): vectorized multi-cell handling beats
    one Python map_groups call per user. Pass an explicit ``bucket_us`` to
    pin the bucket, or ``bucket_us=None`` for the plain per-user-history
    path (kept as the equality-test twin; its partitioning assumption is
    that each user's FULL history fits one worker's heap)."""
    if bucket_us == "auto":
        span = _events_ts_span_us(sf_dir)
        bucket_us = max(1, span // 64) if span else None
    if bucket_us is not None:
        return _asof_join_bucketed(sf_dir, bucket_us)
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def narrow(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("click", "purchase"))]
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "is_p": (df["event_type"] == "purchase").to_numpy().astype(np.int8),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "purchase_id": np.empty(0, np.int64),
            "user_id": np.empty(0, np.int64),
            "click_id": np.empty(0, np.int64),
            "gap_us": np.empty(0, np.int64),
        }
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # positional forward-fill: running max of the last click's row index
        # (pure int — exact for full-range int64 ids, no NaN float round-trip)
        g = g.sort_values(["ts_us", "is_p", "event_id"])
        is_click = g["is_p"].to_numpy() == 0
        pos = np.arange(len(g))
        last = np.maximum.accumulate(np.where(is_click, pos, -1))
        take = (~is_click) & (last >= 0)
        if not take.any():
            return _EMPTY
        eid = g["event_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        src = last[take]
        return pd.DataFrame(
            {
                "purchase_id": eid[take].astype(np.int64),
                "user_id": g["user_id"].to_numpy()[take].astype(np.int64),
                "click_id": eid[src].astype(np.int64),
                "gap_us": (ts[take] - ts[src]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(narrow, batch_format="pandas")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def _asof_join_bucketed(sf_dir: str, bucket_us: int, n_parts: int = 32):
    """The hot-key escape for asof_join — a distributed SEGMENTED SCAN:

    pass 1 (heavy, (key, time-bucket)-partitioned): forward-fill clicks
      within each (user, tb = ts_us // bucket_us) cell; purchases matched
      in-cell are done. Each cell also emits ONE summary row (its last click)
      and its still-unmatched purchases.
    pass 2 (light, key-partitioned): only summaries + unmatched purchases —
      a per-user vectorized searchsorted maps each unmatched purchase to the
      last click of the latest earlier bucket. The per-user reduction handles
      O(buckets + misses) rows, not the full history, which is what makes a
      hot key safe: the heavy sort/ffill never sees more than one time
      bucket of one user at a time.

    Exactly equal to the default path (equality-tested): any in-cell click
    at-or-before the purchase wins in pass 1; otherwise every earlier-bucket
    click has strictly smaller ts, so the latest earlier summary IS the
    as-of match."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def narrow(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("click", "purchase"))]
        ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()  # unit-robust (ns or us storage)
        uid = df["user_id"].to_numpy().astype(np.int64)
        tb = ts // bucket_us
        return pd.DataFrame(
            {
                "user_id": uid,
                "ts_us": ts,
                "event_id": df["event_id"].to_numpy().astype(np.int64),
                "is_p": (df["event_type"] == "purchase").to_numpy().astype(np.int8),
                "tb": tb,
                "kp": (uid * np.int64(1_000_003) + tb) % n_parts,
            }
        )

    _P1_EMPTY = pd.DataFrame(
        {
            "user_id": np.empty(0, np.int64),
            "tb": np.empty(0, np.int64),
            "purchase_id": np.empty(0, np.int64),
            "ts_us": np.empty(0, np.int64),
            "click_id": np.empty(0, np.int64),
            "click_ts": np.empty(0, np.int64),
            "tag": np.empty(0, np.int8),  # 0=matched 1=unmatched 2=summary
        }
    )

    def scan_cells(df: pd.DataFrame) -> pd.DataFrame:
        # all (user, tb) cells of one partition, vectorized together:
        # pandas groupby.ffill does the per-cell forward fill in one pass
        if not len(df):
            return _P1_EMPTY
        df = df.sort_values(["user_id", "tb", "ts_us", "is_p", "event_id"])
        is_click = df["is_p"].to_numpy() == 0
        # per-cell positional forward-fill: grouped running max of the last
        # click's row index (int-exact, one C pass via groupby.cummax)
        pos = np.arange(len(df))
        last = (
            pd.Series(np.where(is_click, pos, -1))
            .groupby([df["user_id"].to_numpy(), df["tb"].to_numpy()], sort=False)
            .cummax()
            .to_numpy()
        )
        is_p = ~is_click
        matched = is_p & (last >= 0)
        unmatched = is_p & (last < 0)
        parts = []
        if matched.any():
            parts.append(
                pd.DataFrame(
                    {
                        "user_id": df["user_id"].to_numpy()[matched],
                        "tb": df["tb"].to_numpy()[matched],
                        "purchase_id": df["event_id"].to_numpy()[matched],
                        "ts_us": df["ts_us"].to_numpy()[matched],
                        "click_id": df["event_id"].to_numpy()[last[matched]].astype(np.int64),
                        "click_ts": df["ts_us"].to_numpy()[last[matched]].astype(np.int64),
                        "tag": np.int8(0),
                    }
                )
            )
        if unmatched.any():
            parts.append(
                pd.DataFrame(
                    {
                        "user_id": df["user_id"].to_numpy()[unmatched],
                        "tb": df["tb"].to_numpy()[unmatched],
                        "purchase_id": df["event_id"].to_numpy()[unmatched],
                        "ts_us": df["ts_us"].to_numpy()[unmatched],
                        "click_id": np.int64(-1),
                        "click_ts": np.int64(-1),
                        "tag": np.int8(1),
                    }
                )
            )
        # one summary per cell that contains any click: its LAST click
        # (cells are sorted, so 'last' under the as-of order is correct)
        cl = df[is_click]
        if len(cl):
            s = cl.groupby(["user_id", "tb"], sort=False, as_index=False).last()
            parts.append(
                pd.DataFrame(
                    {
                        "user_id": s["user_id"].to_numpy(),
                        "tb": s["tb"].to_numpy(),
                        "purchase_id": np.int64(-1),
                        "ts_us": s["ts_us"].to_numpy(),
                        "click_id": s["event_id"].to_numpy(),
                        "click_ts": s["ts_us"].to_numpy(),
                        "tag": np.int8(2),
                    }
                )
            )
        if not parts:
            return _P1_EMPTY
        return pd.concat(parts, ignore_index=True)

    # materialize once: two consumers below (matched pass-through + boundary
    # resolution) would otherwise each re-execute the heavy scan; the scanned
    # rows are result-sized (purchases + one summary per cell), not input-sized
    scanned = (
        ds.map_batches(narrow, batch_format="pandas")
        .groupby("kp")
        .map_groups(scan_cells, batch_format="pandas")
        .materialize()
    )

    _OUT_EMPTY = pd.DataFrame(
        {
            "purchase_id": np.empty(0, np.int64),
            "user_id": np.empty(0, np.int64),
            "click_id": np.empty(0, np.int64),
            "gap_us": np.empty(0, np.int64),
        }
    )

    def emit_matched(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["tag"] == 0]
        if not len(m):
            return _OUT_EMPTY
        return pd.DataFrame(
            {
                "purchase_id": m["purchase_id"].to_numpy(),
                "user_id": m["user_id"].to_numpy(),
                "click_id": m["click_id"].to_numpy(),
                "gap_us": (m["ts_us"] - m["click_ts"]).to_numpy(),
            }
        )

    def resolve_boundaries(df: pd.DataFrame) -> pd.DataFrame:
        # one user's summaries + unmatched purchases (tiny): latest earlier
        # bucket's last click via searchsorted over the sorted summary tbs
        um = df[df["tag"] == 1]
        if not len(um):
            return _OUT_EMPTY
        sm = df[df["tag"] == 2].sort_values("tb")
        if not len(sm):
            return _OUT_EMPTY
        stb = sm["tb"].to_numpy()
        idx = np.searchsorted(stb, um["tb"].to_numpy(), side="left") - 1
        ok = idx >= 0
        if not ok.any():
            return _OUT_EMPTY
        idx = idx[ok]
        return pd.DataFrame(
            {
                "purchase_id": um["purchase_id"].to_numpy()[ok],
                "user_id": um["user_id"].to_numpy()[ok],
                "click_id": sm["click_id"].to_numpy()[idx],
                "gap_us": um["ts_us"].to_numpy()[ok] - sm["click_ts"].to_numpy()[idx],
            }
        )

    matched = scanned.map_batches(emit_matched, batch_format="pandas")
    boundary = (
        scanned.map_batches(
            lambda df: df[df["tag"] != 0], batch_format="pandas"
        )
        .groupby("user_id")
        .map_groups(resolve_boundaries, batch_format="pandas")
    )
    return matched.union(boundary)


def range_join_count(sf_dir: str, window_s: int = 86400, n_parts: int = 32):
    """Windowed RANGE join, aggregated: for every ``error`` event, the number
    of events (any type) by the same user strictly before it and within the
    preceding ``window_s`` seconds. Returns (event_id, user_id, n_win).

    Shape — the banded-bucket trick that turns an unbounded range predicate
    into an equality shuffle: bucket = ts_us // W. Every RIGHT row is
    replicated to buckets (b, b+1); every LEFT row reads only its own bucket,
    where ALL its in-window candidates are then present exactly once (a
    candidate within (t-W, t) has bucket lb or lb-1; the lb-1 rows arrive via
    their +1 replica). One ``groupby((user,bucket) hash % n_parts)`` later,
    the exact range predicate is a vectorized in-partition merge+filter —
    2× right-side shuffle volume buys a single equality shuffle instead of an
    all-to-all time join.

    Partitioning assumption: per-(user, window)-bucket density bounds the
    in-group merge (quadratic within a bucket); hot users at 100 TB get
    salted sub-windows. Zero-count left rows are preserved (LEFT semantics)."""
    W_us = int(window_s) * 1_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()  # unit-robust (ns or us storage)
        eid = df["event_id"].to_numpy().astype(np.int64)
        b = ts // W_us
        is_err = (df["event_type"] == "error").to_numpy()
        # right side: every event, replicated to (b, b+1); left side: errors
        out = pd.DataFrame(
            {
                "user_id": np.concatenate([uid, uid, uid[is_err]]),
                "ts_us": np.concatenate([ts, ts, ts[is_err]]),
                "event_id": np.concatenate([eid, eid, eid[is_err]]),
                "bucket": np.concatenate([b, b + 1, b[is_err]]),
                "side": np.concatenate(
                    [
                        np.zeros(2 * len(df), np.int8),
                        np.ones(int(is_err.sum()), np.int8),
                    ]
                ),
            }
        )
        # one shuffle key: (user, bucket) → partition (groups stay complete
        # because equal (user, bucket) always maps to the same kp)
        out["kp"] = (out["user_id"] * np.int64(1_000_003) + out["bucket"]) % n_parts
        return out

    _EMPTY = pd.DataFrame(
        {
            "event_id": np.empty(0, np.int64),
            "user_id": np.empty(0, np.int64),
            "n_win": np.empty(0, np.int64),
        }
    )

    def count_in_window(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 1]
        if not len(left):
            return _EMPTY
        right = df[df["side"] == 0]
        m = left.merge(
            right, on=["user_id", "bucket"], suffixes=("", "_r"), how="inner"
        )
        m = m[(m["ts_us_r"] < m["ts_us"]) & (m["ts_us_r"] >= m["ts_us"] - W_us)]
        cnt = m.groupby("event_id")["event_id_r"].size()
        n = cnt.reindex(left["event_id"].to_numpy(), fill_value=0)
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy(),
                "user_id": left["user_id"].to_numpy(),
                "n_win": n.to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("kp")
        .map_groups(count_in_window, batch_format="pandas")
    )


def left_join_counts(sf_dir: str, n_agg_parts: int = 16):
    """LEFT OUTER join with zero-fill: every customer with their order count
    and total spend, INCLUDING customers with no orders — the join type the
    rest of the suite doesn't exercise (semi/anti/inner/broadcast live in
    relational.py). The orders side is pre-aggregated to one narrow row per
    customer (combiner partials → partitioned vectorized sum) BEFORE the
    join, so the shuffle joins key-sized tables, not raw orders; the join
    width is sized to the CPU budget (hash-join aggregator actors are one
    per partition — see minhash_lsh_pairs[join] note)."""
    import ray

    import pyarrow.parquet as pq_mod

    n_join_parts = max(2, min(n_agg_parts, int(ray.cluster_resources().get("CPU", 8))))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    if pq_mod.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows == 0:
        # empty right side breaks Ray's hash-join aggregator finalize (and a
        # join against nothing is a constant anyway): zero-fill directly
        def zeros(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "c_custkey": df["c_custkey"].to_numpy(),
                    "c_mktsegment": df["c_mktsegment"].to_numpy(),
                    "n_orders": np.zeros(len(df), np.int64),
                    "total_spent": np.zeros(len(df), np.float64),
                }
            )

        return cust.map_batches(zeros, batch_format="pandas")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            n=("o_totalprice", "size"), t=("o_totalprice", "sum")
        )
        g["kp"] = g["o_custkey"] % n_agg_parts
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            n=("n", "sum"), t=("t", "sum")
        )

    per_cust = (
        orders.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("kp")
        .map_groups(combine, batch_format="pandas")
    )

    joined = cust.join(
        per_cust,
        join_type="left_outer",
        num_partitions=n_join_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].to_numpy(),
                "c_mktsegment": df["c_mktsegment"].to_numpy(),
                "n_orders": df["n"].fillna(0).to_numpy().astype(np.int64),
                "total_spent": df["t"].fillna(0.0).round(2).to_numpy(),
            }
        )

    return joined.map_batches(fill, batch_format="pandas")


def regional_revenue(
    sf_dir: str, n_agg_parts: int = 16, broadcast_max_rows: int | None = None
):
    """TPC-H-Q5-shape 5-table join: revenue (extendedprice·(1−discount)) per
    REGION, through lineitem → orders → customer → nation → region. The
    suite's widest join topology, planned the scale-correct way:

      * lineitem ⋈ orders is the ONE big shuffle join (both sides narrowed
        to 2 columns before the exchange, width sized to the CPU budget);
      * customer→nation→region collapses to a single broadcast int→string
        lookup (dimensions are small by definition) applied in-batch via
        np.searchsorted — never shuffled, shipped once via ray.put;
      * revenue pre-aggregates per region inside each batch (combiner), so
        the finalize sees dimension-sized partials.

    BROADCAST FAST PATH (same threshold-gated pattern as the Pregel family,
    graph.BROADCAST_MAX_ROWS): when BOTH orders and customer fit under
    ``broadcast_max_rows`` (default REGIONAL_BROADCAST_MAX_ROWS; parquet
    footer row counts, no data read), the whole query collapses to ONE
    streaming pass over lineitem — the narrow (o_orderkey → regionkey) map
    is built on the driver, shipped once via ``ray.put``, and each lineitem
    batch does an in-map ``pc.index_in`` inner-join leg + block-local
    combiner (graph._broadcast_lookup). Zero shuffles, and lineitem — the
    only fact-scale table at that gate — never materializes. Above the
    bound the two partitioned hash joins below run unchanged, so a 10^9-row
    customer/orders never lands on the driver.

    Returns (r_name, revenue) rounded to 2 decimals."""
    import ray

    # two shuffle joins share the CPU budget: each spawns one aggregator
    # actor per output partition, so size each to half the budget (the CC
    # join-width lesson: oversubscribed aggregator actors starve the maps)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_join_parts = max(2, min(n_agg_parts, cpus // 2 or 1))

    import pyarrow.parquet as pq_mod

    # genuinely dimension-sized driver reads ONLY: nation (25) and region (5)
    # → a nationkey→regionkey array + regionkey→name map. customer is fact-
    # scale (10^9 at the target) and never touches the driver: it joins
    # distributed below with the tiny nation⋈region lookup applied in-batch.
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    reg = pq_mod.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nk = nat["n_nationkey"].to_numpy()
    order_nk = np.argsort(nk)
    nk_keys = nk[order_nk]
    nk_rk = nat["n_regionkey"].to_numpy()[order_nk]
    rk2name = dict(zip(reg["r_regionkey"].to_list(), reg["r_name"].to_list()))

    from ..functions.agg import final_agg

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "r_name": g["rk"].map(rk2name),
                "revenue": g["revenue"].round(2),
            }
        )

    bound = (
        REGIONAL_BROADCAST_MAX_ROWS
        if broadcast_max_rows is None
        else broadcast_max_rows
    )
    n_orders = pq_mod.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    n_cust = pq_mod.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_orders <= bound and n_cust <= bound:
        import pyarrow.compute as pc

        from .graph import _broadcast_lookup

        # both keyed sides gated small: build (o_orderkey → rk) on the driver
        cust_t = pq_mod.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cidx = np.searchsorted(
            nk_keys, cust_t["c_nationkey"].to_numpy(zero_copy_only=False)
        )
        ord_t = pq_mod.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        oidx = pc.index_in(
            ord_t["o_custkey"], value_set=cust_t["c_custkey"].combine_chunks()
        )
        valid = pc.is_valid(oidx)  # inner: orders without a customer drop
        okey = ord_t["o_orderkey"].filter(valid).combine_chunks()
        ork = pc.take(pa.array(nk_rk[cidx]), oidx.filter(valid))
        ref = ray.put((okey, ork))

        def li_bcast_partial(t: pa.Table) -> pa.Table:
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            narrow = pa.table(
                {"l_orderkey": t["l_orderkey"], "rev": pa.array(price * (1.0 - disc))}
            )
            narrow, rk_vals = _broadcast_lookup(narrow, ref, "l_orderkey")
            g = (
                pa.table({"rk": rk_vals, "rev": narrow["rev"]})
                .group_by(["rk"])
                .aggregate([("rev", "sum")])
            )
            return pa.table({"rk": g["rk"], "rev": g["rev_sum"]})

        li_b = _read(
            sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
        )
        return final_agg(
            li_b.map_batches(li_bcast_partial, batch_format="pyarrow", batch_size=65536),
            keys=["rk"],
            sums={"revenue": "rev"},
            finalize=finalize,
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def tag_region(t: pa.Table) -> pa.Table:
        # zero-copy Arrow fact scan: nationkey → regionkey via the broadcast
        # sorted nation keys (searchsorted), custkey passes through untouched
        idx = np.searchsorted(
            nk_keys, t["c_nationkey"].to_numpy(zero_copy_only=False)
        )
        return pa.table({"c_custkey": t["c_custkey"], "rk": pa.array(nk_rk[idx])})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    # join 1 (narrow): orders ⋈ customer on custkey → (o_orderkey, rk)
    orders_rk = orders.join(
        cust.map_batches(tag_region, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_join_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "rk"])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def narrow_li(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": pa.array(price * (1.0 - disc))}
        )

    # join 2 (the one big exchange): lineitem ⋈ orders on orderkey
    joined = li.map_batches(narrow_li, batch_format="pyarrow").join(
        orders_rk,
        join_type="inner",
        num_partitions=n_join_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["rk"]).aggregate([("rev", "sum")])
        return pa.table({"rk": g["rk"], "rev": g["rev_sum"]})

    return final_agg(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        keys=["rk"],
        sums={"revenue": "rev"},
        finalize=finalize,
    )


_STRATA = {"click": 0.5, "view": 0.25, "purchase": 1.0, "signup": 1.0, "error": 0.1}


def stratified_sample(sf_dir: str, fractions: dict | None = None, seed: int = 11):
    """Stratified (per-class) sampling — the corpus-rebalancing op: keep an
    event iff ``remix(event_id XOR remix(seed)) < fraction[class] * 2^64``.
    Same deterministic hash-threshold spec as random_sample (reproducible
    across engines, cluster sizes and batchings — no RNG streams), but with a
    class-dependent threshold looked up VECTORIZED via ``pc.index_in`` codes,
    so rebalancing a skewed class mix costs one remix pass and no shuffle at
    all. Returns (event_id, event_type). SQL-oracle-checked."""
    import pyarrow.compute as pc

    from ..state.bloom import _remix

    fractions = fractions or _STRATA
    classes = sorted(fractions)
    thr = np.array(
        [min(int(fractions[c] * 2.0**64), 2**64 - 1) for c in classes],
        dtype=np.uint64,
    )
    seed_u = _remix(np.array([seed], dtype=np.uint64))[0]
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def f(t: pa.Table) -> pa.Table:
        keys = _remix(t["event_id"].to_numpy().astype(np.uint64) ^ seed_u)
        codes = pc.index_in(t["event_type"], pa.array(classes)).to_numpy(
            zero_copy_only=False
        )
        known = codes >= 0  # classes outside the plan are dropped
        row_thr = np.zeros(len(keys), dtype=np.uint64)
        row_thr[known] = thr[codes[known].astype(np.int64)]
        return t.filter(pa.array(keys < row_thr))

    return ds.map_batches(f, batch_format="pyarrow")


def approx_quantiles_hist(
    sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9), n_bins: int = 1024
):
    """Approximate per-group quantiles via fixed-grid histograms — the
    documented 100 TB path for ``quantiles_per_group`` (exact quantiles are
    not combinable; histogram counts are, and unlike t-digest/KLL the merge
    is ORDER-INDEPENDENT, which is what makes this sketch bit-deterministic
    and therefore SQL-oracle-checkable).

    Two passes: (1) per-group min/max (combiner partials, dimension-sized
    finalize); (2) per-batch bincounts on the fixed [mn, mx] grid, summed by
    ``final_agg``, finalized to the LOWER EDGE of the first bin whose
    cumulative count reaches ceil(q·n). Error ≤ one bin width = (mx-mn)/1024
    (asserted vs the exact operator in tests). Returns
    (o_orderpriority, p50_hist, p90_hist) rounded to 4 decimals."""
    from ..functions.agg import final_agg

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False)["o_totalprice"].agg(
            ["min", "max"]
        )
        return g.rename(columns={"min": "mn", "max": "mx"})

    _MM_EMPTY = pd.DataFrame({"o_orderpriority": [], "mn": [], "mx": []})

    def mm_final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty input → columnless frame; keep the schema
            return _MM_EMPTY
        return df.groupby("o_orderpriority", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max")
        )

    grid = (
        ds.map_batches(mm_partial, batch_format="pandas", batch_size=65536)
        .repartition(1)
        .map_batches(mm_final, batch_format="pandas", batch_size=None)
        .to_pandas()  # dimension-sized (one row per group) — driver-safe
    )
    if not len(grid):  # empty corpus: Ray may skip map_batches entirely,
        # handing back a columnless frame — return the empty result directly
        return pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                **{
                    f"p{int(q * 100)}_hist": pa.array([], pa.float64())
                    for q in qs
                },
            }
        )
    mn = dict(zip(grid["o_orderpriority"], grid["mn"]))
    mx = dict(zip(grid["o_orderpriority"], grid["mx"]))

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for key, sub in df.groupby("o_orderpriority", sort=False):
            lo, hi = mn[key], mx[key]
            v = sub["o_totalprice"].to_numpy()
            if hi == lo:
                idx = np.zeros(len(v), np.int64)
            else:
                # formula kept in EXACT lockstep with the SQL twin
                idx = np.minimum(
                    n_bins - 1, np.floor((v - lo) / (hi - lo) * n_bins)
                ).astype(np.int64)
            cnt = np.bincount(idx, minlength=n_bins)
            nz = np.flatnonzero(cnt)
            parts.append(
                pd.DataFrame(
                    {"o_orderpriority": key, "bin": nz, "c": cnt[nz].astype(np.int64)}
                )
            )
        return pd.concat(parts, ignore_index=True)

    partials = ds.map_batches(hist_partial, batch_format="pandas", batch_size=65536)

    def finalize(h: pd.DataFrame) -> pd.DataFrame:
        if not len(h):
            return pd.DataFrame(
                {"o_orderpriority": [], **{f"p{int(q * 100)}_hist": [] for q in qs}}
            )
        rows = []
        for key, sub in h.groupby("o_orderpriority"):
            sub = sub.sort_values("bin")
            cum = sub["c"].cumsum().to_numpy()
            n = cum[-1]
            lo, hi = mn[key], mx[key]
            row = {"o_orderpriority": key}
            for q in qs:
                i = int(np.searchsorted(cum, np.ceil(q * n)))
                b = int(sub["bin"].to_numpy()[i])
                row[f"p{int(q * 100)}_hist"] = round(lo + b * (hi - lo) / n_bins, 4)
            rows.append(row)
        return pd.DataFrame(rows)

    return final_agg(
        partials,
        keys=["o_orderpriority", "bin"],
        sums={"c": "c"},
        finalize=finalize,
    )


_STATUSES = ("F", "O", "P")


def pivot_orders(sf_dir: str):
    """PIVOT: order counts and totals per priority, widened by status into
    (o_orderpriority, n_F, n_O, n_P, sum_F, sum_O, sum_P). Pivot over a
    known small category set is conditional aggregation — each batch emits
    one partial row per priority with per-status sums (vectorized crosstab),
    and the dimension-sized finalize sums partials (`final_agg`); the
    category list is part of the operator spec, never discovered at runtime
    (a discovery pass would be a full extra read at 100 TB)."""
    from ..functions.agg import final_agg

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.groupby(["o_orderpriority", "o_orderstatus"])["o_totalprice"].agg(
            ["size", "sum"]
        )
        n = piv["size"].unstack(fill_value=0).reindex(columns=_STATUSES, fill_value=0)
        s = piv["sum"].unstack(fill_value=0.0).reindex(columns=_STATUSES, fill_value=0.0)
        out = pd.DataFrame({"o_orderpriority": n.index})
        for st in _STATUSES:
            out[f"n_{st}"] = n[st].to_numpy().astype(np.int64)
            out[f"sum_{st}"] = s[st].to_numpy()
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        for st in _STATUSES:
            g[f"sum_{st}"] = g[f"sum_{st}"].round(2)
        return g

    return final_agg(
        partials,
        keys=["o_orderpriority"],
        sums={
            c: c
            for st in _STATUSES
            for c in (f"n_{st}", f"sum_{st}")
        },
        finalize=finalize,
    )


def rollup_orders(sf_dir: str):
    """ROLLUP / grouping sets: (priority, status) detail + per-priority
    subtotal + grand total in one result, NULL grouping levels encoded as
    'ALL' (sentinel, not NULL — keeps the result hashable and
    oracle-comparable). One combiner pass builds (priority, status) partials;
    the finalize derives all three grouping levels from those partials with
    plain pandas — the wide data is read once, the rollup itself runs on
    dimension-sized rows."""
    from ..functions.agg import final_agg

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            n=("o_totalprice", "size"), total=("o_totalprice", "sum")
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def finalize(base: pd.DataFrame) -> pd.DataFrame:
        lvl1 = base.groupby("o_orderpriority", as_index=False).agg(
            n=("n", "sum"), total=("total", "sum")
        )
        lvl1["o_orderstatus"] = "ALL"
        lvl0 = pd.DataFrame(
            {
                "o_orderpriority": ["ALL"],
                "o_orderstatus": ["ALL"],
                "n": [base["n"].sum()],
                "total": [base["total"].sum()],
            }
        )
        out = pd.concat([base, lvl1, lvl0], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        out["total"] = out["total"].round(2)
        return out[["o_orderpriority", "o_orderstatus", "n", "total"]]

    return final_agg(
        partials,
        keys=["o_orderpriority", "o_orderstatus"],
        sums={"n": "n", "total": "total"},
        finalize=finalize,
    )


def full_outer_activity(sf_dir: str, n_agg_parts: int = 16):
    """FULL OUTER join with both-sides fill: registered customers vs active
    event users on the shared key domain — customers with no events keep
    n_events=0, event users with no customer row surface as 'unregistered'.
    Completes the join-type family (inner/semi/anti/broadcast/left live in
    relational.py / left_join_counts).

    Shape: the events side is pre-aggregated to one narrow row per user
    (combiner partials → partitioned sum/max) BEFORE the join, so the
    full-outer shuffle joins key-sized tables; per-user max(value) is the
    order-independent float aggregate (a sum's addition order would drift
    between engine and oracle). Join width sized to the CPU budget (one
    aggregator actor per partition)."""
    import ray

    import pyarrow.parquet as pq_mod

    n_join_parts = max(2, min(n_agg_parts, int(ray.cluster_resources().get("CPU", 8))))
    # one segment only, so BOTH outer sides are exercised on real data:
    # segment customers without events (left-only) AND active users outside
    # the segment (right-only) both appear
    import pyarrow.compute as _pc

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(_pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )

    def agg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(
            n=("event_id", "size"), vmax=("value", "max")
        )
        g["kp"] = g["user_id"] % n_agg_parts
        return g

    def agg_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            n=("n", "sum"), vmax=("vmax", "max")
        )

    ev_empty = pq_mod.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows == 0
    cust_empty = pq_mod.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows == 0

    if ev_empty:

        def cust_only(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["c_custkey"].to_numpy(),
                    "segment": df["c_mktsegment"].to_numpy(),
                    "n_events": np.zeros(len(df), np.int64),
                    "vmax": np.zeros(len(df), np.float64),
                }
            )

        return cust.map_batches(cust_only, batch_format="pandas")

    per_user = (
        _read(sf_dir, "events", columns=["user_id", "event_id", "value"])
        .map_batches(agg_partial, batch_format="pandas", batch_size=65536)
        .groupby("kp")
        .map_groups(agg_combine, batch_format="pandas")
    )

    if cust_empty:

        def ev_only(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["user_id"].to_numpy(),
                    "segment": np.full(len(df), "unregistered", dtype=object),
                    "n_events": df["n"].to_numpy(dtype=np.int64),
                    "vmax": df["vmax"].to_numpy(dtype=np.float64),
                }
            )

        return per_user.map_batches(ev_only, batch_format="pandas")

    joined = cust.join(
        per_user,
        join_type="full_outer",
        num_partitions=n_join_parts,
        on=("c_custkey",),
        right_on=("user_id",),
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        # Ray's outer join coalesces the two key columns into the LEFT key
        # name, so c_custkey is already non-null on right-only rows
        return pd.DataFrame(
            {
                "key": df["c_custkey"].to_numpy(dtype=np.int64),
                "segment": df["c_mktsegment"].fillna("unregistered").to_numpy(),
                "n_events": df["n"].fillna(0).to_numpy(dtype=np.int64),
                "vmax": df["vmax"].fillna(0.0).to_numpy(dtype=np.float64),
            }
        )

    return joined.map_batches(fill, batch_format="pandas")


def ntile_orders(sf_dir: str, n_tiles: int = 4):
    """(o_orderkey, o_orderpriority, tile, pct_rank): ntile(n) quartile and
    percent_rank of each order's total price WITHIN its priority class — the
    ranking-window family (ntile / percent_rank) over a total order
    (o_totalprice, o_orderkey ties broken by key, so both engines rank
    identically and percent_rank is one IEEE division of exact ints).

    Scale shape: priority classes are dimension-sized (5), so this is the
    legitimate map_groups-per-key case (the partition-group pattern is for
    data-sized keys); within a group everything is one vectorized sort +
    np.repeat bucket assignment. A data-sized partition key would need the
    distributed-sort rank shape instead (sort → per-block offsets)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def tiles(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], kind="stable"
        ).reset_index(drop=True)
        n = len(df)
        base, rem = divmod(n, n_tiles)
        sizes = np.full(n_tiles, base, dtype=np.int64)
        sizes[:rem] += 1
        df["tile"] = np.repeat(np.arange(1, n_tiles + 1, dtype=np.int64), sizes)
        rn = np.arange(n, dtype=np.float64)  # row_number - 1 (no ties)
        df["pct_rank"] = rn / (n - 1) if n > 1 else 0.0
        return df[["o_orderkey", "o_orderpriority", "tile", "pct_rank"]]

    return ds.groupby("o_orderpriority").map_groups(tiles, batch_format="pandas")


def cooccur_parts(
    sf_dir: str, k: int = 50, max_basket: int = 64, n_parts: int = 16
):
    """Market-basket co-occurrence mining: the top-k part pairs ordered
    together, ``(p1, p2, n_orders)`` with ``p1 < p2``, ranked by
    ``(n_orders DESC, p1, p2)``. The item-item co-occurrence statistic that
    seeds "frequently bought together" / association-rule pipelines — and,
    for an LLM corpus, the same shape as entity/term co-occurrence counting.

    Scale shape: hash-partition on ``l_orderkey`` makes every basket
    partition-complete, so the quadratic pair expansion is partition-local —
    one mergesort + ragged-arange (the triangle-census trick, no per-order
    Python loop) — and pre-aggregated pair partials are the only thing
    shuffled (narrow (p1, p2, n) rows, one more hash partition + sum).
    Baskets larger than ``max_basket`` are dropped BEFORE pairing (the skew
    cap: a 10^4-item basket would emit 10^8 pairs); the cap is part of the
    operator contract and replayed by the SQL oracle, and drops are counted
    into the log. TPC-H baskets are ≤7 items, so at test scale the cap
    never bites."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def part(t: pa.Table) -> pa.Table:
        op = (t["l_orderkey"].to_numpy().astype(np.uint64) % np.uint64(n_parts))
        return t.append_column("op", pa.array(op.astype(np.int64)))

    _EMPTY = pd.DataFrame(
        {
            "p1": np.array([], dtype=np.int64),
            "p2": np.array([], dtype=np.int64),
            "n": np.array([], dtype=np.int64),
            "pp": np.array([], dtype=np.int64),
        }
    )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        df = df.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort"
        )
        sizes = df.groupby("l_orderkey")["l_orderkey"].transform("size")
        over = sizes.to_numpy() > max_basket
        if over.any():
            # no silent caps: the docstring promises dropped baskets are
            # visible in the log
            logging.getLogger(__name__).warning(
                "cooccur_parts: dropped %d over-cap baskets (%d rows, "
                "largest %d items > max_basket=%d)",
                df.loc[over, "l_orderkey"].nunique(), int(over.sum()),
                int(sizes.max()), max_basket,
            )
        df = df[~over]
        ok = df["l_orderkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        n = len(df)
        if n == 0:
            return _EMPTY
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = ok[1:] != ok[:-1]
        grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
        local = np.arange(n) - grp_start
        reps = local
        total = int(reps.sum())
        if total == 0:
            return _EMPTY
        w_idx = np.repeat(np.arange(n), reps)
        ragged = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        v_idx = np.repeat(np.arange(n) - local, reps) + ragged
        out = pd.DataFrame({"p1": pk[v_idx], "p2": pk[w_idx]})
        g = out.groupby(["p1", "p2"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        g["pp"] = (
            (
                g["p1"].to_numpy().astype(np.uint64) * np.uint64(1000003)
                + g["p2"].to_numpy().astype(np.uint64)
            )
            % np.uint64(n_parts)
        ).astype(np.int64)
        return g

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p1", "p2"], as_index=False).agg(n_orders=("n", "sum"))
        g["n_orders"] = g["n_orders"].astype(np.int64)
        # every pair is wholly inside this pp partition, so the global top-k
        # is contained in the union of per-partition top-k — emit only k rows
        # per partition and the final sort sees n_parts*k rows, not the full
        # pair table (kills the third full shuffle; stage-audited in
        # BASELINE.md)
        g = g.sort_values(
            ["n_orders", "p1", "p2"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)
        return g[["p1", "p2", "n_orders"]]

    partials = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("op")
        .map_groups(pair_partials, batch_format="pandas")
    )
    topk = partials.groupby("pp").map_groups(final_sum, batch_format="pandas")
    return topk.sort(
        ["n_orders", "p1", "p2"], descending=[True, False, False]
    ).limit(k)

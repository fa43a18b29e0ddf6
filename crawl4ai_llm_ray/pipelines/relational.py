"""Relational operator suite over the TPC-H-ish testdata tables.

Each function implements one operator family from SURVEY.md §2 as an idiomatic
Ray Data pipeline (vectorized map_batches, partial pre-aggregation before
shuffles, broadcast small sides) and has a matching DuckDB oracle in
``__ray_entry__.oracle_sql``.  These are the engine's general query-layer
equivalents of the reference storage API's filter/sort/paginate/batch
semantics (``/root/reference/crawl4ai_llm/storage/json_storage.py:609-713``).

Scale notes are inline: the structure of every pipeline is chosen so it holds
at 100 TB (no driver-side row loops over big data, shuffles only on
pre-aggregated or dimension-sized data, broadcast joins for small sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from ..functions.agg import isin_sorted, final_agg


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- M3/M4: scan
def filter_project(sf_dir: str):
    """Vectorized predicate + projection, pruned at the read (SURVEY M3/M4).

    Oracle: lineitem WHERE l_shipdate < 1996-01-01 AND l_discount > 0.05."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
            pc.greater(t["l_discount"], 0.05),
        )
        return t.filter(m).select(["l_orderkey", "l_quantity", "l_extendedprice"])

    return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------- A1/A3: agg + combiner
def agg_pushdown_q1(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with partial pre-aggregation inside
    map_batches (combiner) so the groupby shuffle moves one row per
    (batch, group) instead of every input row (SURVEY A1/A3)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "p_sum_qty": g["l_quantity_sum"],
                "p_sum_base": g["l_extendedprice_sum"],
                "p_count": g["l_quantity_count"],
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(4)
        df["sum_qty"] = df["sum_qty"].round(4)
        df["sum_base_price"] = df["sum_base_price"].round(2)
        return df

    return final_agg(
        partials,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": "p_sum_qty", "sum_base_price": "p_sum_base", "count_order": "p_count"},
        finalize,
    )


# ------------------------------------------------------------- O1/O2: ordering
def sort_paginate(sf_dir: str, page: int = 3, page_size: int = 50):
    """Whole-set sort + pagination (reference list_products contract,
    json_storage.py:649-672). Page result is small by definition — the only
    materialized piece."""
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    top = ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(
        page * page_size
    )
    df = top.to_pandas().iloc[(page - 1) * page_size : page * page_size]
    return df.reset_index(drop=True)


def topk(sf_dir: str, k: int = 10):
    """Top-k with deterministic tie-break (SURVEY O2)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


# --------------------------------------------------------------- J1/J3: joins
def _order_custkeys(sf_dir: str, min_total: float | None = None) -> np.ndarray:
    """Distinct o_custkey as a sorted array — the broadcast side of the
    semi/anti join. At 100 TB this set is dimension-sized (distinct customers
    with orders); were it too large, swap in the bloom filter from
    state/bloom.py with an exact confirm pass — same pipeline shape."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def distinct_per_batch(t: pa.Table) -> pa.Table:
        if min_total is not None:
            t = t.filter(pc.greater(t["o_totalprice"], min_total))
        return pa.table({"o_custkey": pc.unique(t["o_custkey"])})

    # per-batch distinct (combiner) → tiny driver-side union
    parts = ds.map_batches(distinct_per_batch, batch_format="pyarrow").to_pandas()
    return np.unique(parts["o_custkey"].to_numpy())


def semi_join(sf_dir: str):
    """Customers WITH orders: broadcast key-set semi-join (SURVEY J1 —
    the reference's get_products existence pre-check, json_storage.py:349-361)."""
    import ray

    keys_ref = ray.put(_order_custkeys(sf_dir))
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def f(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(isin_sorted(keys, ck)))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join(sf_dir: str):
    """Customers WITHOUT any high-value (>400k) order (SURVEY J3 — the
    duplicate-reject anti-join, json_storage.py:194-197). The right side is
    filtered so the result is non-trivial on this corpus."""
    import ray

    keys_ref = ray.put(_order_custkeys(sf_dir, min_total=400_000.0))
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def f(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~isin_sorted(keys, ck)))

    return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------------ D3: union
def union_distinct(sf_dir: str):
    """UNION (distinct) of two sources (SURVEY D3)."""
    a = _read(sf_dir, "nation", columns=["n_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    b = _read(sf_dir, "region", columns=["r_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    u = a.union(b)
    names = sorted(set(u.unique("name")))
    return pa.table({"name": pa.array(names, type=pa.string())})


# ------------------------------------------------------------------ M6: upsert
def upsert_last_writer(sf_dir: str, n_parts: int = 32):
    """Last-writer-wins per key — the reference's shallow dict-merge update
    semantics (json_storage.py:409,484) lifted to a keyed dataset: latest
    event per user, with deterministic tie-break.

    Shape: argmax-per-key is combinable, so the map stage keeps the
    per-batch winner (one row per key per batch); the finalize is a
    PARTITIONED ``groupby(user_id % P).map_groups`` over those partials —
    key cardinality is the op's own domain (per-user latest at 10^9 users),
    so a single-task funnel (repartition(1)) would be the bottleneck;
    each of the P finalize tasks only ever holds its key range's partials."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
            .drop_duplicates("user_id", keep="first")
        )

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        w = latest(g)
        return w.assign(up=w["user_id"].to_numpy() % n_parts)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return (
        partials.groupby("up")
        .map_groups(latest, batch_format="pandas")
        .select_columns(["user_id", "event_type", "value"])
    )


# ----------------------------------------------------------- M1: key derivation
def key_derivation(sf_dir: str):
    """The reference id-derivation concat `f"{store_name}_{sku}"`
    (json_storage.py:83) vectorized with Arrow kernels."""
    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])

    def f(t: pa.Table) -> pa.Table:
        derived = pc.binary_join_element_wise(
            t["s_name"], pc.cast(t["s_suppkey"], pa.string()), "_"
        )
        return pa.table({"s_suppkey": t["s_suppkey"], "derived_id": derived})

    return ds.map_batches(f, batch_format="pyarrow")


# ----------------------------------------- broadcast dimension join + aggregate
def broadcast_join_agg(sf_dir: str):
    """Revenue per nation: fact table joined to two broadcast dimensions
    (ray.put once, numpy lookup per batch — no shuffle join), partial sums per
    batch, tiny final groupby. The canonical star-join shape at 100 TB."""
    import ray
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].to_numpy()
    order_ = np.argsort(ck)
    cust_keys = ck[order_]
    cust_nk = cust["c_nationkey"].to_numpy()[order_]
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk_to_name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    bcast = ray.put((cust_keys, cust_nk))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        keys, nk = ray.get(bcast)
        ok = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ok)
        pos = np.clip(pos, 0, len(keys) - 1)
        valid = keys[pos] == ok
        nations = nk[pos[valid]]
        prices = t["o_totalprice"].to_numpy(zero_copy_only=False)[valid]
        sums = np.bincount(nations, weights=prices, minlength=25)
        nz = np.flatnonzero(sums)
        return pa.table(
            {
                "n_nationkey": pa.array(nz.astype(np.int32)),
                "p_rev": pa.array(sums[nz]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["n_name"] = df["n_nationkey"].map(nk_to_name)
        df["revenue"] = df["revenue"].round(2)
        return df[["n_name", "revenue"]]

    return final_agg(partials, ["n_nationkey"], {"revenue": "p_rev"}, finalize)


# ------------------------------------------------------ §2.9: tumbling windows
def window_tumbling(sf_dir: str):
    """Tumbling 1-hour windows per event_type over the events stream table:
    bucket = floor(epoch_seconds/3600); partial agg per batch then a small
    grouped sum (the streaming-shaped workload from the Ray guide)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bucket = (df["ts"].astype("int64") // 3_600_000_000).astype("int64")
        g = (
            df.assign(bucket=bucket)
            .groupby(["event_type", "bucket"], as_index=False)
            .agg(p_n=("value", "size"), p_sum=("value", "sum"))
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=32768)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(4)
        return df

    return final_agg(
        partials, ["event_type", "bucket"], {"n": "p_n", "sum_value": "p_sum"}, finalize
    )


def count_group(sf_dir: str):
    """Grouped count + sum (SURVEY A1): orders per priority."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            p_n=("o_totalprice", "size"), p_total=("o_totalprice", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=32768)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["total"] = df["total"].round(2)
        return df

    return final_agg(partials, ["o_orderpriority"], {"n": "p_n", "total": "p_total"}, finalize)


# ------------------------------------------- M4: JSON / nested-field predicate
def json_filter(sf_dir: str):
    """Filter on a field inside a JSON column — the reference's
    `metadata.<field>` dot-notation filter (json_storage.py:703-709) over a
    serialized props column. Vectorized regex extract per batch."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"]
            .str.extract(r'"k":\s*(\d+)', expand=False)
            .astype("float")
            .fillna(-1)
            .astype("int64")
        )
        sub = df[k > 50]
        return sub.groupby("event_type", as_index=False).agg(p_n=("props", "size"))

    partials = ds.map_batches(f, batch_format="pandas", batch_size=32768)
    return final_agg(partials, ["event_type"], {"n": "p_n"})


def bloom_semi_join(sf_dir: str, capacity: int = 1 << 16, fpp: float = 1e-4):
    """Customers WITH orders via BLOOM-PUSHDOWN semi-join — the sketch that
    makes a 100 TB semi-join cheap when even the distinct key set is too
    big to broadcast exactly:

    1. per-batch bloom partials over ``o_custkey`` (fixed (m, k) geometry,
       so the uint64 word arrays OR-merge associatively — the same
       mergeable-sketch contract as the HLL / CMS / histogram family),
       merged into one filter in a tiny final stage;
    2. the merged filter (128 KB here; a few GB at 10^10 keys — still
       broadcastable where the exact key set is not) ships once via
       ``ray.put``; customers are prefiltered with the vectorized
       ``contains_batch``;
    3. survivors get an EXACT confirm so false positives never leak into
       the result (here against the broadcast exact key set — at scale this
       is a partitioned hash semi-join that now touches only
       |build| · (hit_rate + fpp) rows instead of every probe row).

    The result is exact, so the oracle is the plain semi-join SQL; the
    false-positive path is exercised separately in tests with a deliberately
    undersized filter. Keys are remixed (splitmix64) before insertion so the
    double-hashing FPP analysis holds for dense integer keys."""
    import ray

    from ..state.bloom import BloomFilter, _remix

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def partial_bloom(t: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity=capacity, fpp=fpp)
        bf.add_batch(_remix(t["o_custkey"].to_numpy().astype(np.uint64)))
        return pa.table({"words": pa.array([bf.words.tobytes()], pa.binary())})

    def or_merge(df) -> "pd.DataFrame":
        import pandas as pd

        blobs = [np.frombuffer(b, dtype=np.uint64) for b in df["words"]]
        merged = (
            np.bitwise_or.reduce(np.stack(blobs))
            if blobs
            else BloomFilter(capacity=capacity, fpp=fpp).words  # empty input
        )
        return pd.DataFrame({"words": [merged.tobytes()]})

    merged_blob = (
        orders.map_batches(partial_bloom, batch_format="pyarrow")
        .repartition(1)
        .map_batches(or_merge, batch_format="pandas", batch_size=None)
        .take_all()[0]["words"]
    )
    bf = BloomFilter(capacity=capacity, fpp=fpp)
    bf.words = np.frombuffer(merged_blob, dtype=np.uint64).copy()
    bloom_ref = ray.put(bf)
    exact_ref = ray.put(_order_custkeys(sf_dir))

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def f(t: pa.Table) -> pa.Table:
        filt: BloomFilter = ray.get(bloom_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        maybe = filt.contains_batch(_remix(ck.astype(np.uint64)))
        t = t.filter(pa.array(maybe))
        if t.num_rows == 0:
            return t
        # exact confirm on the (few) bloom survivors only
        keys = ray.get(exact_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(isin_sorted(keys, ck)))

    return ds.map_batches(f, batch_format="pyarrow")

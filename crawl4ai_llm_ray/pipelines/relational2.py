"""Second batch of relational/streaming operators (SQL-oracle-checked):
3-way joins, HAVING, conditional aggregation, distinct counts, string/date
scalar functions, sliding windows, sessionization. Same design rules as
relational.py: prune at the read, vectorize per batch, pre-aggregate before
any shuffle, broadcast dimension-sized sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from ..functions.agg import final_agg


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def join_3way_topk(sf_dir: str, k: int = 10):
    """TPC-H-Q3-ish: revenue per order for BUILDING-segment customers —
    fact lineitem joined to broadcast orders-subset and customer dimensions,
    partial sums per batch, final small groupby + top-k."""
    import ray
    import pyarrow.parquet as pq

    from ..functions.agg import isin_sorted

    # customer is the DIMENSION side: driver-read is fine. The BUILDING
    # order-key set is built DISTRIBUTED (per-batch semi-filter + distinct
    # partials) — orders is the fact side; reading it whole on the driver
    # contradicted the module's broadcast-dimension-sized-only rule.
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_keys = np.sort(
        cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"].to_numpy()
    )
    seg_ref = ray.put(seg_keys)

    def order_keys_partial(t: pa.Table) -> pa.Table:
        sk = ray.get(seg_ref)
        oc = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"o_orderkey": t["o_orderkey"].filter(pa.array(isin_sorted(sk, oc)))}
        )

    keep_orders = np.sort(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
        .map_batches(order_keys_partial, batch_format="pyarrow")
        .to_pandas()["o_orderkey"]
        .to_numpy()
    )
    keys_ref = ray.put(keep_orders)

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        from ..functions.agg import isin_sorted

        lo = t["l_orderkey"].to_numpy(zero_copy_only=False)
        m = isin_sorted(keys, lo)
        if not m.any():
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()), "p_rev": pa.array([], pa.float64())}
            )
        sub = t.filter(pa.array(m))
        rev = pc.multiply(sub["l_extendedprice"], pc.subtract(1.0, sub["l_discount"]))
        df = pd.DataFrame(
            {"l_orderkey": sub["l_orderkey"].to_numpy(zero_copy_only=False), "rev": rev}
        )
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(
            g.rename(columns={"rev": "p_rev"}), preserve_index=False
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)
        return df

    return (
        final_agg(partials, ["l_orderkey"], {"revenue": "p_rev"}, finalize)
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def having_filter(sf_dir: str, min_count: int = 15):
    """GROUP BY + HAVING: customers with more than min_count orders."""
    ds = _read(sf_dir, "orders", columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(p_n=("o_custkey", "size"))

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    agg = final_agg(partials, ["o_custkey"], {"n": "p_n"})
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n"], min_count)), batch_format="pyarrow"
    )


def case_when_agg(sf_dir: str):
    """Conditional aggregation: per returnflag, high-value vs low-value
    quantity sums (CASE WHEN inside SUM)."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hi = df["l_extendedprice"] > 30000
        return (
            df.assign(
                p_hi_qty=df["l_quantity"].where(hi, 0.0),
                p_lo_qty=df["l_quantity"].where(~hi, 0.0),
            )
            .groupby("l_returnflag", as_index=False)
            .agg(p_hi=("p_hi_qty", "sum"), p_lo=("p_lo_qty", "sum"))
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["hi_qty"] = df["hi_qty"].round(2)
        df["lo_qty"] = df["lo_qty"].round(2)
        return df

    return final_agg(partials, ["l_returnflag"], {"hi_qty": "p_hi", "lo_qty": "p_lo"}, finalize)


def distinct_count(sf_dir: str):
    """COUNT(DISTINCT): suppliers per nation from the supplier table, via
    per-batch distinct pairs (combiner) then a grouped distinct count."""
    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_suppkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    dedup = ds.map_batches(pairs, batch_format="pandas", batch_size=65536)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"s_nationkey": [g["s_nationkey"].iloc[0]], "n_suppliers": [g["s_suppkey"].nunique()]}
        )

    return dedup.groupby("s_nationkey").map_groups(per_group, batch_format="pandas")


def string_funcs(sf_dir: str):
    """Scalar string functions (SURVEY §2.8): upper/substr/length/concat on
    part names — single vectorized Arrow pass."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_upper": pc.utf8_upper(t["p_name"]),
                "name_prefix": pc.utf8_slice_codeunits(t["p_name"], 0, 8),
                "name_len": pc.cast(pc.utf8_length(t["p_name"]), pa.int64()),
                "branded": pc.binary_join_element_wise(t["p_brand"], t["p_name"], ":"),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def date_funcs(sf_dir: str):
    """Scalar date functions: orders per (year, month) with total — Arrow
    temporal kernels + partial aggregation."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        m = pc.month(t["o_orderdate"])
        df = pd.DataFrame(
            {
                "y": y.to_numpy(zero_copy_only=False),
                "m": m.to_numpy(zero_copy_only=False),
                "price": t["o_totalprice"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["y", "m"], as_index=False).agg(
            p_n=("price", "size"), p_total=("price", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["total"] = df["total"].round(2)
        df["y"] = df["y"].astype("int64")
        df["m"] = df["m"].astype("int64")
        return df

    return final_agg(partials, ["y", "m"], {"n": "p_n", "total": "p_total"}, finalize)


def window_sliding(sf_dir: str, size_s: int = 7200, step_s: int = 3600):
    """Sliding windows (size 2h, step 1h) per event_type: each event lands in
    size/step windows — explode to (window_start, type) partials per batch,
    then a small grouped sum. Windows keyed by start-bucket index."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    n_windows = size_s // step_s

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = df["ts"].astype("int64") // 1_000_000
        frames = []
        # the windows containing ts start at floor(sec/step)*step - j*step,
        # j = 0..(size/step - 1)
        for j in range(n_windows):
            start = (sec // step_s) * step_s - j * step_s
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": df["event_type"],
                        "w_start": start,
                        "value": df["value"],
                    }
                )
            )
        allf = pd.concat(frames)
        return allf.groupby(["event_type", "w_start"], as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(4)
        return df

    return final_agg(
        partials, ["event_type", "w_start"], {"n": "p_n", "sum_value": "p_sum"}, finalize
    )


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Sessionization: per-user sessions split at >30-min gaps; returns one
    row per session (user_id, session_start_sec, n_events, sum_value).
    groupby(user).map_groups over ts-sorted groups — the streaming-shaped
    stateful pattern (guide: ordered, partitioned log)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        sec = g["ts"].astype("int64") // 1_000_000
        new_session = (sec.diff().fillna(gap_s + 1) > gap_s).cumsum()
        out = (
            g.assign(sec=sec, sid=new_session)
            .groupby("sid")
            .agg(
                user_id=("user_id", "first"),
                session_start_sec=("sec", "min"),
                n_events=("sec", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["sum_value"] = out["sum_value"].round(4)
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


# ------------------------------------------------------------- BPE-ish tokens
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def token_count_bpe(sf_dir: str):
    """(doc_id, n_bpe): GPT-2-style pre-tokenizer regex (lookahead-free RE2
    form, identical in Arrow and DuckDB) — the 'BPE-ish regex' token counter."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], _BPE_RE)
        return pa.table({"doc_id": t["doc_id"], "n_bpe": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")
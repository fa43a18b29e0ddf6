"""Third operator batch: grouped top-k, exact discrete quantiles, per-group
correlation, rolling windows. Same design rules (combiner partials where the
math allows, map_groups where per-group order matters)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.agg import final_agg


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def topk_per_group(sf_dir: str, k: int = 3):
    """Top-k rows per group (top 3 orders by price per priority class) —
    top-k is combinable: per-batch top-k per group, coalesce, final top-k.
    Deterministic tie-break by o_orderkey."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True],
            )
            .groupby("o_orderpriority", as_index=False)
            .head(k)
        )

    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=65536)
    return partials.repartition(1).map_batches(
        local_topk, batch_format="pandas", batch_size=None
    )


def quantiles_per_group(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)):
    """Exact discrete quantiles per group (median + p90 of order totals per
    priority): DuckDB's quantile_disc semantics — the first sorted element
    whose cumulative fraction ≥ q, i.e. index ceil(q*n)-1. Quantiles are NOT
    combinable exactly, so this is a per-group pass over sorted groups
    (at 100 TB: t-digest/KLL sketch partials instead — mergeable, approximate;
    here exactness is the point of the oracle check)."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["o_totalprice"].to_numpy())
        n = len(v)
        row = {"o_orderpriority": g["o_orderpriority"].iloc[0]}
        for q in qs:
            idx = max(0, math.ceil(q * n) - 1)
            row[f"p{round(q * 100)}"] = round(float(v[idx]), 2)
        return pd.DataFrame([row])

    return ds.groupby("o_orderpriority").map_groups(per_group, batch_format="pandas")


def corr_per_group(sf_dir: str):
    """Pearson correlation of (quantity, extendedprice) per returnflag —
    correlation IS combinable via moment sums (Σx, Σy, Σxy, Σx², Σy², n):
    vectorized partial moments per batch, tiny final combine."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x, y = df["l_quantity"], df["l_extendedprice"]
        return (
            df.assign(sx=x, sy=y, sxy=x * y, sxx=x * x, syy=y * y, n=1.0)
            .groupby("l_returnflag", as_index=False)[["sx", "sy", "sxy", "sxx", "syy", "n"]]
            .sum()
        )

    partials = ds.map_batches(moments, batch_format="pandas", batch_size=65536)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"]
        cov = df["sxy"] - df["sx"] * df["sy"] / n
        vx = df["sxx"] - df["sx"] ** 2 / n
        vy = df["syy"] - df["sy"] ** 2 / n
        df["corr_qty_price"] = (cov / np.sqrt(vx * vy)).round(4)
        return df[["l_returnflag", "corr_qty_price"]]

    return final_agg(
        partials,
        ["l_returnflag"],
        {c: c for c in ("sx", "sy", "sxy", "sxx", "syy", "n")},
        finalize,
    )


def approx_distinct_hll(sf_dir: str, p: int = 12):
    """Approximate distinct o_custkey via mergeable HyperLogLog sketches: one
    serialized sketch per batch, elementwise-max merge in a tiny final stage —
    the sketch-aggregation shape that never shuffles raw keys (rows-only;
    relative error vs exact asserted in tests)."""
    from ..functions.hashing import fnv1a64
    from ..state.hll import HyperLogLog

    ds = _read(sf_dir, "orders", columns=["o_custkey"])

    def sketch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hll = HyperLogLog(p)
        hll.add_hashes(fnv1a64(pc.cast(t["o_custkey"], pa.string())))
        return pa.table({"sketch": pa.array([hll.to_bytes()], type=pa.binary())})

    partials = ds.map_batches(sketch, batch_format="pyarrow", batch_size=65536)

    def merge(t: pa.Table) -> pa.Table:
        from ..state.hll import HyperLogLog as H

        acc = None
        for b in t["sketch"].to_pylist():
            s = H.from_bytes(b)
            acc = s if acc is None else acc.merge(s)
        est = int(round(acc.estimate())) if acc else 0
        return pa.table({"approx_distinct_custkeys": pa.array([est], type=pa.int64())})

    return partials.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=None)


def rolling_mean(sf_dir: str, window: int = 3):
    """Per-user rolling mean of the last `window` event values in ts order —
    the frame-based window function (SQL: AVG OVER (PARTITION BY ... ORDER BY
    ... ROWS 2 PRECEDING)). Ordered state per key ⇒ groupby().map_groups
    over ts-sorted groups."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g["roll_avg"] = g["value"].rolling(window, min_periods=1).mean().round(4)
        return g[["user_id", "event_id", "roll_avg"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

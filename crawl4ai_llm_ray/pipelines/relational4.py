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


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def asof_join(sf_dir: str):
    """AS-OF join: for each ``purchase`` event, the most recent ``click`` by
    the same user at-or-before it (ties on ts broken by max event_id), inner —
    purchases with no prior click are dropped. Returns
    (purchase_id, user_id, click_id, gap_us), all int64.

    Shape: both sides reduce to narrow (user_id, ts_us, event_id, is_p) rows
    in one map_batches, union arrives for free (one filtered read), then ONE
    ``groupby(user_id).map_groups`` does the merge: sort the group by
    (ts_us, is_p, event_id) — clicks sort before purchases at equal ts, so a
    vectorized forward-fill of the click columns IS the as-of semantics.

    Partitioning assumption (documented per the brief): the equality key
    (user_id) co-partitions both sides — the Ray groupby is the one shuffle,
    and each user's full history must fit in a worker's heap for the in-group
    sort. At 100 TB with pathological hot keys: range-partition time within
    the key and stitch with per-boundary carry state (one row per partition —
    the last click before the boundary)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def narrow(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("click", "purchase"))]
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "ts_us": df["ts"].astype("int64").to_numpy(),
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
        g = g.sort_values(["ts_us", "is_p", "event_id"])
        is_click = g["is_p"].to_numpy() == 0
        cid = pd.Series(np.where(is_click, g["event_id"].to_numpy(), -1)).replace(
            -1, np.nan
        ).ffill()
        cts = pd.Series(np.where(is_click, g["ts_us"].to_numpy(), -1)).replace(
            -1, np.nan
        ).ffill()
        take = (~is_click) & cid.notna().to_numpy()
        if not take.any():
            return _EMPTY
        return pd.DataFrame(
            {
                "purchase_id": g["event_id"].to_numpy()[take].astype(np.int64),
                "user_id": g["user_id"].to_numpy()[take].astype(np.int64),
                "click_id": cid.to_numpy()[take].astype(np.int64),
                "gap_us": (g["ts_us"].to_numpy()[take] - cts.to_numpy()[take]).astype(
                    np.int64
                ),
            }
        )

    return (
        ds.map_batches(narrow, batch_format="pandas")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


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
        ts = df["ts"].astype("int64").to_numpy()
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

"""Fifth operator batch: dense-spine gap-fill, count-min-sketch heavy
hitters, and grouped mode — three shapes the earlier relational batches
don't cover (spine *generation*, a second mergeable sketch family next to
HLL/histogram, and argmax-of-counts).

Engine design rules as everywhere else: no Ray Dataset.join (union +
hash-partition groupby instead — empty-partition-safe and no aggregator
actor armies), partial aggregation before every shuffle, integer-exact
arithmetic so DuckDB replays results bit-for-bit.

The reference (702ron/crawl4ai_llm) has no analytics of this kind at all
(storage CRUD only, ``storage/json_storage.py``); these extend the SURVEY
§2.9 engine-extension family over the synthetic events/orders tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_DAY = 86_400_000_000
_GOLDEN = 0x9E3779B97F4A7C15
# count-min sketch geometry: 4 rows x 256 columns; odd multiplicative seeds
# (Knuth/Dietzfelbinger multiply-shift family). Shared with the SQL oracle.
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_SHIFT = 64 - 8  # >> 56 maps the top byte of the mixed hash to 0..255
CMS_SEEDS = tuple(((2 * r + 1) * _GOLDEN) % 2**64 for r in range(CMS_DEPTH))


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _renamed_sum(out_cols: dict):
    """Schema-guarded rename for groupby().sum() outputs: on the empty
    dataset Ray hands the next operator a columnless block — return a typed
    empty table instead of KeyErroring. out_cols maps output name -> (source
    column, pyarrow type)."""
    def fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(
            src not in t.column_names for src, _ in out_cols.values()
        ):
            return pa.table(
                {name: pa.array([], typ) for name, (_, typ) in out_cols.items()}
            )
        return pa.table({name: t[src] for name, (src, _) in out_cols.items()})

    return fix


def _events_day_bounds(sf_dir: str) -> tuple[int, int] | None:
    """(min_day, max_day) of events.ts as epoch-day ints, from parquet
    row-group statistics only — no data read. None if stats missing."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata
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
            mn = pd.Timestamp(st.min).value // 1000  # ns -> us
            mx = pd.Timestamp(st.max).value // 1000
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
    if lo is None:
        return None
    return int(lo // US_PER_DAY), int(hi // US_PER_DAY)


def gapfill_days(sf_dir: str, n_agg_parts: int = 8):
    """(event_type, day, n_events): daily event counts per type with every
    missing (type, day) cell zero-filled over the global [min_day, max_day]
    span — the dense-spine gap-fill every time-series monitor / training-run
    dashboard needs before rates or moving averages make sense.

    Scale shape: per-batch (type, day) partial counts are the only thing
    shuffled from the data side; the zero spine is GENERATED as a distributed
    ``ray.data.range`` over n_types x n_days (never a driver loop), unioned
    with the partials, and summed in one narrow hash aggregate — the
    zeros-union idiom of graph.pagerank, so there is no join and no
    empty-partition hazard. Day bounds come from parquet row-group
    statistics (zero data read; falls back to an aggregate when absent).
    At a 10^6-host per-host spine the range simply gets bigger — still
    generated, never materialized driver-side."""
    import ray.data as rd

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        days = (t["ts"].cast(pa.int64()).to_numpy() // US_PER_DAY).astype(
            np.int64
        )
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False),
             "day": days}
        )
        g = df.groupby(["event_type", "day"], as_index=False).size()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "n": pa.array(g["size"].to_numpy().astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            }
        )

    bounds = _events_day_bounds(sf_dir)
    if bounds is None:
        bounds = (int(partials.min("day")), int(partials.max("day")))
    dmin, dmax = bounds
    n_days = dmax - dmin + 1
    types = sorted(partials.unique("event_type"))  # dimension-sized
    n_types = len(types)

    def spine(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy()
        return pa.table(
            {
                "event_type": pa.array(
                    np.array(types, dtype=object)[i % n_types], pa.string()
                ),
                "day": pa.array((dmin + i // n_types).astype(np.int64)),
                "n": pa.array(np.zeros(len(i), dtype=np.int64)),
            }
        )

    zeros = rd.range(n_days * n_types).map_batches(spine, batch_format="pyarrow")
    return (
        zeros.union(partials)
        .groupby(["event_type", "day"])
        .sum("n")
        .map_batches(
            _renamed_sum(
                {
                    "event_type": ("event_type", pa.string()),
                    "day": ("day", pa.int64()),
                    "n_events": ("sum(n)", pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _cms_cols(keys: np.ndarray, seed: int) -> np.ndarray:
    """Multiply-shift column index for one sketch row: top byte of
    (key+1)*seed mod 2^64. uint64 wraparound matches the SQL replay's
    HUGEINT mod-2^64 arithmetic exactly."""
    with np.errstate(over="ignore"):
        h = (keys.astype(np.uint64) + np.uint64(1)) * np.uint64(seed)
    return (h >> np.uint64(CMS_SHIFT)).astype(np.int64)


def heavy_hitters_cms(sf_dir: str, k: int = 20):
    """(user_id, est_count): top-k users by count-min-sketch estimate of
    their event count. The second mergeable-sketch family in the engine next
    to HLL and the histogram quantiles: per-batch partial sketches are
    (row, col, n) triples (at most depth x width = 1024 live cells), merged
    by a narrow sum — RAW KEYS ARE NEVER SHUFFLED for the counting side,
    which is the whole point at 10^9 keys. CMS is a sum of per-batch
    sketches, so the merge is order-independent and the DuckDB oracle
    replays it bit-for-bit (same multiply-shift hashes, same min-over-rows).

    Candidate scan WITHOUT a distinct shuffle: a user's estimate is a pure
    function of user_id once the sketch is merged, so per-batch
    (unique -> estimate -> top-k) partials provably contain the global
    top-k (if fewer than k users rank above u globally, fewer than k rank
    above u in u's batch). The finalize sees <= k rows per batch —
    dimension-sized, deduped and sorted in one tiny funnel. Raw keys never
    shuffle at all. The merged sketch (1024 cells) is driver-safe and
    broadcast once via ray.put."""
    import ray

    ds = _read(sf_dir, "events", columns=["user_id"])

    def sketch_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        rows, cols, cnts = [], [], []
        for r, seed in enumerate(CMS_SEEDS):
            bc = np.bincount(_cms_cols(u, seed), minlength=CMS_WIDTH)
            nz = np.nonzero(bc)[0]
            rows.append(np.full(len(nz), r, dtype=np.int64))
            cols.append(nz.astype(np.int64))
            cnts.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "r": pa.array(np.concatenate(rows)),
                "col": pa.array(np.concatenate(cols)),
                "n": pa.array(np.concatenate(cnts)),
            }
        )

    merged = (
        ds.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby(["r", "col"])
        .sum("n")
        .to_pandas()  # <= depth*width rows — driver-safe by construction
    )
    counters = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    if len(merged):  # empty corpus -> columnless frame; sketch stays zero
        counters[merged["r"].to_numpy(), merged["col"].to_numpy()] = merged[
            "sum(n)"
        ].to_numpy()
    counters_ref = ray.put(counters)

    def estimate_topk(t: pa.Table) -> pa.Table:
        c = ray.get(counters_ref)
        u = np.unique(t["user_id"].to_numpy())
        est = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        for r, seed in enumerate(CMS_SEEDS):
            est = np.minimum(est, c[r, _cms_cols(u, seed)])
        df = pd.DataFrame({"user_id": u, "est_count": est})
        df = df.sort_values(
            ["est_count", "user_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy()),
                "est_count": pa.array(df["est_count"].to_numpy()),
            }
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": np.array([], dtype=np.int64),
                    "est_count": np.array([], dtype=np.int64),
                }
            )
        df = df.drop_duplicates("user_id")  # same user from several batches
        return df.sort_values(
            ["est_count", "user_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    return (
        ds.map_batches(estimate_topk, batch_format="pyarrow")
        .repartition(1)  # <= k rows per input batch — dimension-sized funnel
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def mode_per_group(sf_dir: str):
    """(o_orderpriority, mode_day, n_orders): the modal order date (as epoch
    days, ties -> earliest) per priority class — argmax-of-counts, the
    grouped statistic quantiles/corr don't cover. Two-stage: per-batch
    (priority, day) partial counts, one narrow sum, then the per-priority
    argmax in a map_groups over the dimension-sized priority key (5 groups —
    the legitimate per-key map_groups case, ntile_orders precedent)."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        # o_orderdate is timestamp[us] in the corpus: epoch-us -> epoch-days
        days = (
            t["o_orderdate"].cast(pa.int64()).to_numpy() // US_PER_DAY
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_numpy(
                    zero_copy_only=False
                ),
                "day": days,
            }
        )
        g = df.groupby(["o_orderpriority", "day"], as_index=False).size()
        return pa.table(
            {
                "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "n": pa.array(g["size"].to_numpy().astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "day"])
        .sum("n")
    )

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["sum(n)", "day"], ascending=[False, True], kind="mergesort"
        )
        top = df.iloc[:1]
        return pd.DataFrame(
            {
                "o_orderpriority": top["o_orderpriority"].to_numpy(),
                "mode_day": top["day"].to_numpy().astype(np.int64),
                "n_orders": top["sum(n)"].to_numpy().astype(np.int64),
            }
        )

    return counts.groupby("o_orderpriority").map_groups(
        argmax, batch_format="pandas"
    )


def global_rank_orders(sf_dir: str, n_ranges: int = 16, sample_stride: int = 1024):
    """(o_orderkey, cents, rnk): exact GLOBAL row_number of every order under
    the total order (o_totalprice, o_orderkey) — the distributed-ranking
    machinery ntile_orders' docstring defers to ("the distributed-sort rank
    shape"), done the TeraSort way:

    1. encode the sort key as ONE int64: cents * 2^24 + orderkey (prices are
       2-decimal, floor(x*100+0.5) is the repo's fixed-point idiom; orderkey
       < 2^24 holds through sf1 — documented bound, widen to two-key encode
       beyond that).
    2. range boundaries from a deterministic stride sample (every
       ``sample_stride``-th key per batch -> driver; ~n/stride values, the
       standard TeraSort sampler). Sample quality affects only BALANCE,
       never correctness.
    3. per-range row counts from per-batch bincount partials (a P-sized
       aggregate — the rows themselves are NOT shuffled for the count pass),
       prefix-summed on the driver into range offsets.
    4. ONE hash shuffle of (key, orderkey) into ranges; local sort + local
       rank + broadcast offset = exact global rank.

    Rank is dense and unique because orderkey is unique. DuckDB replays it
    as row_number() OVER the same fixed-point key order."""
    import ray

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def encode(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        ok = t["o_orderkey"].to_numpy()
        key = cents * (1 << 24) + ok
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "cents": pa.array(cents),
                "key": pa.array(key),
            }
        )

    enc = ds.map_batches(encode, batch_format="pyarrow").materialize()
    if enc.count() == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )

    def sample(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy()
        return pa.table({"key": pa.array(k[::sample_stride])})

    sampled = np.sort(
        enc.map_batches(sample, batch_format="pyarrow")
        .to_pandas()["key"]
        .to_numpy()
    )
    if len(sampled) >= n_ranges:
        q = (np.arange(1, n_ranges) * len(sampled)) // n_ranges
        bounds = np.unique(sampled[q])
    else:
        bounds = np.unique(sampled)[:-1] if len(sampled) > 1 else np.array(
            [], dtype=np.int64
        )
    nb = len(bounds) + 1  # number of ranges

    def assign(t: pa.Table) -> pa.Table:
        rp = np.searchsorted(bounds, t["key"].to_numpy(), side="right")
        return t.append_column("rp", pa.array(rp.astype(np.int64)))

    ranged = enc.map_batches(assign, batch_format="pyarrow").materialize()

    # per-range counts WITHOUT shuffling rows: per-batch bincount partials
    def count_partial(t: pa.Table) -> pa.Table:
        bc = np.bincount(t["rp"].to_numpy(), minlength=nb)
        return pa.table(
            {
                "rp": pa.array(np.arange(nb, dtype=np.int64)),
                "c": pa.array(bc.astype(np.int64)),
            }
        )

    cnt = (
        ranged.map_batches(count_partial, batch_format="pyarrow")
        .groupby("rp")
        .sum("c")
        .to_pandas()  # nb rows — driver-safe
        .sort_values("rp")
    )
    counts = np.zeros(nb, dtype=np.int64)
    counts[cnt["rp"].to_numpy()] = cnt["sum(c)"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offsets_ref = ray.put(offsets)

    def local_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("key", kind="mergesort")
        base = ray.get(offsets_ref)[int(df["rp"].iloc[0])]
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "cents": df["cents"].to_numpy(),
                "rnk": base + 1 + np.arange(len(df), dtype=np.int64),
            }
        )

    return ranged.groupby("rp").map_groups(local_rank, batch_format="pandas")


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_depth(sf_dir: str, n_parts: int = 16, window_us: int = 24 * 3600 * 1_000_000):
    """(depth, n_users): strict-order funnel analysis over the events table —
    for each user, how far they progressed through view -> click -> purchase,
    each step STRICTLY after and within ``window_us`` (default 24 h) of the
    EARLIEST completion of the previous step (the standard windowed
    first-touch funnel). depth 0 rows count users with events but no view.
    Sequential-pattern machinery none of the window/sessionize ops cover.

    Scale shape: hash-partition on user_id makes each user's history
    partition-complete; inside a partition the step chain is THREE vectorized
    merges (per-step groupby-min against the previous step's frontier time),
    not a per-user loop; only (depth, partial_count) rows leave the
    partition."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        up = (t["user_id"].to_numpy().astype(np.uint64) % np.uint64(n_parts))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_type": t["event_type"],
                "up": pa.array(up.astype(np.int64)),
            }
        )

    def depth_partial(df: pd.DataFrame) -> pd.DataFrame:
        users = df["user_id"].drop_duplicates()
        depth = pd.Series(np.zeros(len(users), dtype=np.int64),
                          index=users.to_numpy())
        # frontier[u] = earliest completion time of the last reached step
        frontier = None  # None = step 0 (no time constraint yet)
        for step_i, step in enumerate(FUNNEL_STEPS):
            ev = df[df["event_type"] == step][["user_id", "ts_us"]]
            if frontier is not None:
                ev = ev.merge(frontier, on="user_id")
                ev = ev[
                    (ev["ts_us"] > ev["t_prev"])
                    & (ev["ts_us"] <= ev["t_prev"] + window_us)
                ]
            hit = ev.groupby("user_id", as_index=False)["ts_us"].min()
            if hit.empty:
                break
            depth.loc[hit["user_id"].to_numpy()] = step_i + 1
            frontier = hit.rename(columns={"ts_us": "t_prev"})
        g = pd.DataFrame({"depth": depth.to_numpy()}).groupby(
            "depth", as_index=False
        ).size()
        return pd.DataFrame(
            {
                "depth": g["depth"].to_numpy().astype(np.int64),
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    partials = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("up")
        .map_groups(depth_partial, batch_format="pandas")
    )
    return partials.groupby("depth").sum("n").map_batches(
        _renamed_sum(
            {"depth": ("depth", pa.int64()), "n_users": ("sum(n)", pa.int64())}
        ),
        batch_format="pyarrow",
    )


PROFILE_COLUMNS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def profile_orders(sf_dir: str, n_parts: int = 16):
    """(col, n_rows, n_null, n_distinct): one-pass data-profiling census
    of the orders table — the schema-validation summary every ingestion
    pipeline runs before trusting a new drop of data. Long format, one row
    per column.

    Scale shape: row/null counts are per-batch partials summed in a tiny
    aggregate; exact distinct counts shuffle only PER-BATCH-DISTINCT
    (column, value-hash) pairs — re-deduped per hash partition and counted,
    so the shuffle payload is bounded by distinct cardinality, not row
    count. Values are canonicalized (timestamp→epoch-us, 2-decimal float→
    cents) and FNV-hashed to u64 before leaving the batch; 64-bit collision
    risk is the dedup family's documented accepted risk. At 10^12 rows the
    n_distinct leg swaps to the HLL sketch (approx_distinct_hll) — the
    partials here are already shaped for that swap."""
    ds = _read(sf_dir, "orders", columns=list(PROFILE_COLUMNS))

    from ..functions.hashing import fnv1a64

    def canon(c: pa.Array) -> pa.Array:
        t = c.type
        if pa.types.is_timestamp(t):
            c = c.cast(pa.int64())
        elif pa.types.is_floating(t):
            c = pa.compute.round(pa.compute.multiply(c, 100.0)).cast(
                pa.int64()
            )
        return c.cast(pa.string())

    def partials(t: pa.Table) -> pa.Table:
        ci, h, kind, nr, nn = [], [], [], [], []
        n = t.num_rows
        for idx, name in enumerate(PROFILE_COLUMNS):
            c = t[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            hs = np.unique(fnv1a64(canon(c).drop_null()))
            m = len(hs)
            # kind 0: batch-distinct value hashes of this column
            ci.append(np.full(m, idx, dtype=np.int64))
            h.append(hs.astype(np.int64))
            kind.append(np.zeros(m, dtype=np.int64))
            nr.append(np.zeros(m, dtype=np.int64))
            nn.append(np.zeros(m, dtype=np.int64))
            # kind 1: one meta row with (n_rows, n_null) partials
            ci.append(np.array([idx], dtype=np.int64))
            h.append(np.array([0], dtype=np.int64))
            kind.append(np.array([1], dtype=np.int64))
            nr.append(np.array([n], dtype=np.int64))
            nn.append(np.array([c.null_count], dtype=np.int64))
        return pa.table(
            {
                "ci": pa.array(np.concatenate(ci)),
                "h": pa.array(np.concatenate(h)),
                "kind": pa.array(np.concatenate(kind)),
                "nr": pa.array(np.concatenate(nr)),
                "nn": pa.array(np.concatenate(nn)),
                "hp": pa.array(
                    (
                        np.concatenate(h).astype(np.uint64)
                        % np.uint64(n_parts)
                    ).astype(np.int64)
                ),
            }
        )

    rows = ds.map_batches(partials, batch_format="pyarrow")

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["kind"] == 0].drop_duplicates(["ci", "h"])
        dist = d.groupby("ci", as_index=False).size().rename(
            columns={"size": "n_distinct"}
        )
        meta = df[df["kind"] == 1].groupby("ci", as_index=False).agg(
            n_rows=("nr", "sum"), n_null=("nn", "sum")
        )
        out = dist.merge(meta, on="ci", how="outer").fillna(0)
        return pd.DataFrame(
            {
                "ci": out["ci"].to_numpy().astype(np.int64),
                "n_rows": out["n_rows"].to_numpy().astype(np.int64),
                "n_null": out["n_null"].to_numpy().astype(np.int64),
                "n_distinct": out["n_distinct"].to_numpy().astype(np.int64),
            }
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ci", as_index=False).agg(
            n_rows=("n_rows", "sum"),
            n_null=("n_null", "sum"),
            n_distinct=("n_distinct", "sum"),
        )
        g = g.sort_values("ci")
        return pd.DataFrame(
            {
                "col": [PROFILE_COLUMNS[i] for i in g["ci"]],
                "n_rows": g["n_rows"].to_numpy().astype(np.int64),
                "n_null": g["n_null"].to_numpy().astype(np.int64),
                "n_distinct": g["n_distinct"].to_numpy().astype(np.int64),
            }
        )

    # partition by value hash: each (ci, h) lands in exactly one partition,
    # so per-partition dedup + count sums to the exact global distinct count;
    # meta rows ride the same shuffle (their per-partition sums add up)
    # the finalize funnel sees <= n_parts x n_columns rows (dimension-sized
    # partials — the legitimate repartition(1) case per functions/agg.py)
    return (
        rows.groupby("hp")
        .map_groups(reduce_part, batch_format="pandas")
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


US_PER_WEEK = 7 * US_PER_DAY


def cohort_retention(sf_dir: str, n_parts: int = 16):
    """(cohort_week, week_offset, n_active): classic cohort-retention matrix
    — users grouped by the epoch-week of their FIRST event, counted as
    active in every later week they produce any event. The
    longitudinal-analytics counterpart of funnel_depth (lifecycle rather
    than sequence).

    Scale shape: user-hash partitioning makes each user's history
    partition-complete, so the cohort week (per-user min) is a groupby-min
    inside the partition, the (user, offset) distinct is partition-local,
    and the partition emits pre-aggregated (cohort_week, offset, n) partials
    — users never appear in two partitions, so partial counts sum exactly.
    One narrow final sum."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        up = (t["user_id"].to_numpy().astype(np.uint64) % np.uint64(n_parts))
        return pa.table(
            {
                "user_id": t["user_id"],
                "wk": pa.array(
                    (t["ts"].cast(pa.int64()).to_numpy() // US_PER_WEEK).astype(
                        np.int64
                    )
                ),
                "up": pa.array(up.astype(np.int64)),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cw = df.groupby("user_id")["wk"].transform("min")
        off = df["wk"].to_numpy() - cw.to_numpy()
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "cohort_week": cw.to_numpy(),
                "week_offset": off,
            }
        ).drop_duplicates()
        g = d.groupby(["cohort_week", "week_offset"], as_index=False).size()
        return pd.DataFrame(
            {
                "cohort_week": g["cohort_week"].to_numpy().astype(np.int64),
                "week_offset": g["week_offset"].to_numpy().astype(np.int64),
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    partials = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("up")
        .map_groups(partial, batch_format="pandas")
    )
    return partials.groupby(["cohort_week", "week_offset"]).sum("n").map_batches(
        _renamed_sum(
            {
                "cohort_week": ("cohort_week", pa.int64()),
                "week_offset": ("week_offset", pa.int64()),
                "n_active": ("sum(n)", pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def anomaly_days(sf_dir: str, z: int = 3):
    """(event_type, day, n_events, med, mad): days whose ZERO-FILLED daily
    event count deviates from the per-type median by more than
    z * max(MAD, 1) — robust time-series anomaly detection (median/MAD, not
    mean/std: entirely integer order statistics, so the result is exact,
    partitioning-independent and SQL-replayable; a float z-score would be
    reduction-order-dependent). Composes :func:`gapfill_days` — gap days
    count as 0 and are exactly the outages this op exists to flag.

    Median/MAD use DuckDB's quantile_disc index convention
    (ceil(q*n)-1, the quantiles_per_group precedent). The per-type stats run
    in a map_groups over the dimension-sized event_type key (the legitimate
    per-key case); at a 10^6-key cardinality the stats would come from the
    histogram-sketch quantiles instead."""
    import math

    grid = gapfill_days(sf_dir)
    if isinstance(grid, pa.Table):  # empty corpus: gapfill returned no spine
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "med": pa.array([], pa.int64()),
                "mad": pa.array([], pa.int64()),
            }
        )

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_events"].to_numpy()
        srt = np.sort(n)
        med = int(srt[math.ceil(0.5 * len(srt)) - 1])
        ad = np.abs(n - med)
        sad = np.sort(ad)
        mad = int(sad[math.ceil(0.5 * len(sad)) - 1])
        keep = ad > z * max(mad, 1)
        out = df[keep].copy()
        return pd.DataFrame(
            {
                "event_type": out["event_type"].to_numpy(),
                "day": out["day"].to_numpy().astype(np.int64),
                "n_events": out["n_events"].to_numpy().astype(np.int64),
                "med": np.full(len(out), med, dtype=np.int64),
                "mad": np.full(len(out), mad, dtype=np.int64),
            }
        )

    return grid.groupby("event_type").map_groups(flag, batch_format="pandas")


def winsorize_events(sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95):
    """(event_type, p_lo, p_hi, n, n_clip_lo, n_clip_hi, wsum_cents): per-type
    winsorization summary — clip each event value into the type's
    [quantile_disc(0.05), quantile_disc(0.95)] band and report the clip
    counts plus the EXACT integer cents-sum of the winsorized values (each
    value is fixed-pointed with floor(x*100+0.5) BEFORE summing, so the sum
    is int64-exact and order-free — a float sum would be
    reduction-order-dependent). The outlier-clipping normalization pass a
    training pipeline runs before computing loss weights / mixing ratios.

    Two passes: (1) per-type discrete quantiles (dimension-sized key →
    legitimate per-key map_groups, quantiles_per_group precedent; at
    data-sized keys the histogram sketch supplies the band instead),
    broadcast via ray.put; (2) one vectorized clip + per-batch partials,
    summed in a narrow final aggregate."""
    import math

    import ray

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def qband(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].to_numpy())
        n = len(v)
        lo = v[math.ceil(lo_q * n) - 1]
        hi = v[math.ceil(hi_q * n) - 1]
        return pd.DataFrame(
            {"event_type": df["event_type"].iloc[:1], "p_lo": [lo], "p_hi": [hi]}
        )

    bands = (
        ds.groupby("event_type")
        .map_groups(qband, batch_format="pandas")
        .to_pandas()  # dimension-sized
    )
    if not len(bands):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "p_lo": pa.array([], pa.float64()),
                "p_hi": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
                "n_clip_lo": pa.array([], pa.int64()),
                "n_clip_hi": pa.array([], pa.int64()),
                "wsum_cents": pa.array([], pa.int64()),
            }
        )
    bands_ref = ray.put(
        {
            r.event_type: (r.p_lo, r.p_hi)
            for r in bands.itertuples()
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        bmap = _ray.get(bands_ref)
        out = []
        for t, sub in df.groupby("event_type"):
            blo, bhi = bmap[t]
            x = sub["value"].to_numpy()
            clipped = np.clip(x, blo, bhi)
            out.append(
                (
                    t,
                    len(x),
                    int((x < blo).sum()),
                    int((x > bhi).sum()),
                    int(np.floor(clipped * 100.0 + 0.5).astype(np.int64).sum()),
                )
            )
        g = pd.DataFrame(
            out, columns=["event_type", "n", "n_clip_lo", "n_clip_hi", "wsum_cents"]
        )
        for c in ("n", "n_clip_lo", "n_clip_hi", "wsum_cents"):
            g[c] = g[c].astype(np.int64)
        return g

    sums = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .sum(["n", "n_clip_lo", "n_clip_hi", "wsum_cents"])
        .to_pandas()
    )
    merged = bands.merge(
        sums.rename(
            columns={
                "sum(n)": "n",
                "sum(n_clip_lo)": "n_clip_lo",
                "sum(n_clip_hi)": "n_clip_hi",
                "sum(wsum_cents)": "wsum_cents",
            }
        ),
        on="event_type",
    ).sort_values("event_type")
    return pa.table(
        {
            "event_type": pa.array(merged["event_type"], pa.string()),
            "p_lo": pa.array(merged["p_lo"].to_numpy(), pa.float64()),
            "p_hi": pa.array(merged["p_hi"].to_numpy(), pa.float64()),
            "n": pa.array(merged["n"].to_numpy().astype(np.int64)),
            "n_clip_lo": pa.array(merged["n_clip_lo"].to_numpy().astype(np.int64)),
            "n_clip_hi": pa.array(merged["n_clip_hi"].to_numpy().astype(np.int64)),
            "wsum_cents": pa.array(
                merged["wsum_cents"].to_numpy().astype(np.int64)
            ),
        }
    )


def clustered_lookup(
    sf_dir: str, lo_cents: int = 10_000_00, hi_cents: int = 20_000_00
):
    """(o_orderkey, cents): orders whose fixed-point price falls in
    [lo_cents, hi_cents], served from a range-CLUSTERED parquet layout with
    manifest pruning (sources/io.py write_clustered/read_clustered_range) —
    the storage-layout capability: a clustered sort key + per-file min/max
    manifest turns a range lookup into O(matching files) IO instead of a
    full scan. The pytest asserts files were actually pruned; correctness is
    the oracle's plain range filter."""
    import tempfile

    import ray.data as rd

    from ..sources.io import read_clustered_range, write_clustered

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def encode(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "cents": pa.array(cents)}
        )

    enc = ds.map_batches(encode, batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="clustered_orders_")
    if not write_clustered(enc, out, "cents"):
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        )
    got, _, _ = read_clustered_range(out, lo_cents, hi_cents)
    # materialize (result is the small filtered band) so the scratch layout
    # can be deleted instead of leaking one temp dir per invocation
    got = got.materialize()
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return got


def activity_islands(sf_dir: str, gap_us: int = 1_800_000_000, n_parts: int = 16):
    """One row (n_users, n_islands, active_us): interval-union activity
    accounting — each event opens a ``gap_us`` activity window per user;
    overlapping/adjacent windows merge into ISLANDS (maximal runs with
    inter-event gaps <= gap_us), and the corpus totals are user count,
    island count, and summed island span (last - first + gap_us per
    island). The gaps-and-islands shape (interval merge) that sessionize's
    per-session listing does not reduce to — here the merge is a pure
    segmented numpy scan and only THREE ints leave each partition.

    Scale shape: user-hash partitions make each user's timeline
    partition-complete; one sort + vectorized boundary detection per
    partition; finalize funnels n_parts*3 ints."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        up = (t["user_id"].to_numpy().astype(np.uint64) % np.uint64(n_parts))
        return pa.table(
            {
                "user_id": t["user_id"],
                "t": t["ts"].cast(pa.int64()),
                "up": pa.array(up.astype(np.int64)),
            }
        )

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t"], kind="mergesort")
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "n_users": np.array([0], np.int64),
                    "n_islands": np.array([0], np.int64),
                    "active_us": np.array([0], np.int64),
                }
            )
        new_island = np.empty(n, dtype=bool)
        new_island[0] = True
        new_island[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > gap_us)
        starts = np.nonzero(new_island)[0]
        ends = np.concatenate([starts[1:] - 1, [n - 1]])
        span = int((t[ends] - t[starts] + gap_us).sum())
        return pd.DataFrame(
            {
                "n_users": np.array([len(np.unique(u))], np.int64),
                "n_islands": np.array([len(starts)], np.int64),
                "active_us": np.array([span], np.int64),
            }
        )

    partials = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("up")
        .map_groups(islands, batch_format="pandas")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "n_users": np.array([0], np.int64),
                    "n_islands": np.array([0], np.int64),
                    "active_us": np.array([0], np.int64),
                }
            )
        return pd.DataFrame(
            {
                "n_users": np.array([df["n_users"].sum()], np.int64),
                "n_islands": np.array([df["n_islands"].sum()], np.int64),
                "active_us": np.array([df["active_us"].sum()], np.int64),
            }
        )

    return partials.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


def weighted_sample_orders(sf_dir: str, k: int = 100, seed: int = 23):
    """(o_orderkey, weight_cents, skey): k orders sampled WITHOUT replacement
    with inclusion probability ~ proportional to o_totalprice — sequential
    Poisson sampling (Ohlsson 1998, the πps scheme Sarndal's surveys and
    PostgreSQL's TABLESAMPLE literature use): per-row uniform
    u = remix(orderkey XOR remix(seed)) >> 11 (a 53-bit integer, exactly
    representable as a double), sort key = u / weight_cents, keep the k
    SMALLEST. Every step is an exact IEEE-754 operation (the division of two
    exactly-representable integers is correctly rounded, hence identical in
    numpy and DuckDB), so the sampled SET — not just its distribution — is
    bit-deterministic across engines, batchings and cluster sizes, with no
    RNG stream, no ln(), no quantization grid. This is the weighted sibling
    of the uniform hash-threshold samplers (text.random_sample,
    relational4.stratified_sample): corpus curation at 100 TB wants
    "sample documents ∝ quality score" exactly as often as "sample 10%".

    Scale shape: one remix pass per batch + per-batch k-smallest partials
    (np.argpartition) → a final sort over ≤ k×n_batches rows on the driver
    side of the funnel. The input is never shuffled; the funnel carries only
    (key, id, weight) triples, so k=10^4 over 10^9 rows moves ~n_batches×k
    narrow rows. The reference has no sampling at all (storage CRUD only);
    this extends the §2.9 engine-extension family."""
    from ..state.bloom import _remix

    seed_u = _remix(np.array([seed], dtype=np.uint64))[0]
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial_topk(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy()
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        u = (_remix(ok.astype(np.uint64) ^ seed_u) >> np.uint64(11)).astype(
            np.float64
        )
        skey = u / cents.astype(np.float64)
        if len(skey) > k:
            # exact (skey, o_orderkey) order at the k boundary: a plain
            # argpartition on skey alone could keep the wrong member of an
            # exactly-tied pair straddling k (possible: two quotients
            # rounding to the same double) and diverge from the oracle's
            # ORDER BY skey, o_orderkey
            idx = np.lexsort((ok, skey))[:k]
        else:
            idx = np.arange(len(skey))
        return pa.table(
            {
                "o_orderkey": pa.array(ok[idx]),
                "weight_cents": pa.array(cents[idx]),
                "skey": pa.array(skey[idx]),
            }
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["skey", "o_orderkey"])
        .limit(k)
    )


def event_transitions(sf_dir: str, n_parts: int = 16):
    """(from_type, to_type, n): first-order Markov transition counts over
    each user's time-ordered event stream — the clickstream-model /
    next-action statistic (funnel_depth's strict-order machinery, but
    counting EVERY consecutive pair instead of one milestone chain).

    Scale shape: a user's history is partition-complete under
    user_id % n_parts, so ordering (ts, event_id — the deterministic
    tie-break) and the shift-pair extraction are partition-local; only
    (from, to, partial_n) rows — at most |types|² per partition — leave the
    partition, and the final sum is dimension-sized. SQL twin: lead() OVER
    (PARTITION BY user_id ORDER BY ts, event_id)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "up",
            pa.array((t["user_id"].to_numpy() % n_parts).astype(np.int64)),
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "from_type": pd.Series([], dtype=object),
                    "to_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        et = df["event_type"].to_numpy()
        out = pd.DataFrame(
            {"from_type": et[:-1][same_user], "to_type": et[1:][same_user]}
        )
        g = out.groupby(["from_type", "to_type"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": np.int64})

    partials = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("up")
        .map_groups(pairs, batch_format="pandas")
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "from_type": pd.Series([], dtype=object),
                    "to_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        return (
            df.groupby(["from_type", "to_type"], as_index=False)["n"]
            .sum()
            .astype({"n": np.int64})
        )

    return partials.repartition(1).map_batches(
        agg, batch_format="pandas", batch_size=None
    )


def zorder_lookup(
    sf_dir: str,
    lo_cents: int = 10_000_00,
    hi_cents: int = 20_000_00,
    lo_day: int = 10_000,
    hi_day: int = 10_400,
):
    """(o_orderkey, cents, day): orders inside a 2-D box (price-cents ×
    order-day), served from a Z-ORDER clustered layout with per-file
    column-stats pruning (sources/io.py write_zorder/read_clustered_box) —
    the multi-column extension of clustered_lookup: a single-key clustering
    cannot prune a box predicate on two columns, a space-filling-curve sort
    key can. Pruning is asserted in pytest; correctness is the oracle's
    plain conjunctive range filter, exact regardless of layout quality."""
    import shutil
    import tempfile

    import ray.data as rd

    from ..sources.io import read_clustered_box, write_zorder

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def encode(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        day = (
            t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // US_PER_DAY
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "cents": pa.array(cents),
                "day": pa.array(day),
            }
        )

    enc = ds.map_batches(encode, batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="zorder_orders_")
    try:
        if not write_zorder(enc, out, "cents", "day"):
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                }
            )
        got, _, _ = read_clustered_box(
            out,
            {"cents": (lo_cents, hi_cents), "day": (lo_day, hi_day)},
            columns=["o_orderkey", "cents", "day"],
        )
        return got.materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _agg_state_over(ds, n_agg_parts: int = 4):
    """(o_orderpriority, n, sum_cents) mergeable aggregate state for
    incremental_agg_refresh: per-batch partials → dimension-sized final sum.
    Integer cents so base+delta merge is exact and order-free."""
    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        df = pd.DataFrame(
            {"o_orderpriority": t["o_orderpriority"].to_pylist(), "c": cents}
        )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("c", "size"), sum_cents=("c", "sum")
        )
        return pa.Table.from_pandas(
            g.astype({"n": np.int64, "sum_cents": np.int64}),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum")
        )
        return pa.Table.from_pandas(
            g.astype({"n": np.int64, "sum_cents": np.int64}),
            preserve_index=False,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def incremental_agg_refresh(sf_dir: str, delta_mod: int = 10):
    """(o_orderpriority, n, sum_cents): per-priority order count and exact
    integer revenue, computed INCREMENTALLY — the materialized-view-refresh
    shape every 100 TB pipeline runs nightly: the "base" partition of the
    data (o_orderkey % delta_mod != 0, yesterday's corpus) is aggregated
    once and its mergeable state PERSISTED as parquet; the refresh
    aggregates ONLY the "delta" rows (o_orderkey % delta_mod == 0, today's
    arrivals) and merges state + delta with an integer sum — base rows are
    never re-read. Correctness gate: the oracle recomputes the SAME final
    aggregate from scratch over all rows, so any drift between the
    incremental and full paths fails the hash. Mergeability (exact ints,
    order-free sums) is what makes the sketch/aggregate family
    checkpoint-resumable at scale."""
    import tempfile

    import pyarrow.parquet as pq_mod
    import ray.data as rd

    ds = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def split(want_delta: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t["o_orderkey"].to_numpy() % delta_mod) == 0
            return t.filter(pa.array(m if want_delta else ~m))

        return f

    base = ds.map_batches(split(False), batch_format="pyarrow")
    delta = ds.map_batches(split(True), batch_format="pyarrow")

    state_dir = tempfile.mkdtemp(prefix="agg_state_")
    state_tbl = pa.Table.from_pandas(
        _agg_state_over(base).to_pandas(), preserve_index=False
    )
    pq_mod.write_table(state_tbl, f"{state_dir}/state.parquet")

    # ---- refresh: persisted state ∪ delta partials → merged view ----
    state = rd.read_parquet(f"{state_dir}/state.parquet")
    delta_agg = _agg_state_over(delta)

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum")
        )
        return pa.Table.from_pandas(
            g.astype({"n": np.int64, "sum_cents": np.int64}),
            preserve_index=False,
        )

    try:
        # materialize (the view is dimension-sized) so the scratch state dir
        # can be removed instead of leaking one temp dir per invocation
        return (
            state.union(delta_agg)
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None)
            .materialize()
        )
    finally:
        import shutil

        shutil.rmtree(state_dir, ignore_errors=True)


def rolling_distinct_users(sf_dir: str, window_days: int = 7, n_parts: int = 16):
    """(day, n_users_7d): DISTINCT users active in the trailing
    ``window_days``-day window, for every day of the corpus span — the
    rolling-MAU/WAU statistic. Windowed DISTINCT does not decompose into
    mergeable partials the way counts do; the exact distributed shape is the
    interval-union + difference-array trick:

    1. per user (partition-complete under user-hash): active days → each day
       d covers report-days [d, d+W-1] → merge overlapping/adjacent
       intervals (the activity_islands segmented scan, gap = W);
    2. each merged interval [a, b] emits TWO rows: (+1 at a), (-1 at b+1) —
       a user's whole history collapses to 2×islands narrow diffs;
    3. one dimension-sized sum of diffs per day + a prefix sum over the day
       spine (the pack_documents scan, here driver-side over a spine-sized
       vector) = exact distinct count per window. No day ever sees its
       users' raw ids — only ±1 diffs move.

    SQL twin: spine × events range join with COUNT(DISTINCT user_id)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    bounds = _events_day_bounds(sf_dir)
    if bounds is None:  # stats missing: one aggregate pass over the ts column
        lo = ds.min("ts")
        hi = ds.max("ts")
        if lo is not None and hi is not None:
            bounds = (
                int(pd.Timestamp(lo).value // 1000 // US_PER_DAY),
                int(pd.Timestamp(hi).value // 1000 // US_PER_DAY),
            )

    def part(t: pa.Table) -> pa.Table:
        up = t["user_id"].to_numpy().astype(np.uint64) % np.uint64(n_parts)
        day = (t["ts"].cast(pa.int64()).to_numpy() // US_PER_DAY).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pa.array(day),
                "up": pa.array(up.astype(np.int64)),
            }
        )

    def diffs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"day": pd.Series([], dtype=np.int64),
                 "diff": pd.Series([], dtype=np.int64)}
            )
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        # interval per active day: [d, d + W - 1]; merge per user where the
        # next start <= previous end + 1  <=>  gap in days < W
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap_break = np.concatenate([[True], (d[1:] - d[:-1]) >= window_days])
        start = new_user | gap_break
        sidx = np.nonzero(start)[0]
        eidx = np.concatenate([sidx[1:] - 1, [len(d) - 1]])
        a = d[sidx]                      # interval starts (report days)
        b = d[eidx] + window_days - 1    # interval ends (inclusive)
        out = pd.DataFrame(
            {
                "day": np.concatenate([a, b + 1]),
                "diff": np.concatenate(
                    [np.ones(len(a), np.int64), -np.ones(len(b), np.int64)]
                ),
            }
        )
        return out.groupby("day", as_index=False)["diff"].sum()

    partials = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("up")
        .map_groups(diffs, batch_format="pandas")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or bounds is None:
            return pd.DataFrame(
                {"day": pd.Series([], dtype=np.int64),
                 "n_users_7d": pd.Series([], dtype=np.int64)}
            )
        dmin, dmax = bounds
        g = df.groupby("day")["diff"].sum()
        # spine-sized prefix sum (the scan primitive over n_days numbers)
        days = np.arange(dmin, dmax + 1, dtype=np.int64)
        vec = np.zeros(len(days) + 1, np.int64)
        ks = g.index.to_numpy()
        in_span = (ks >= dmin) & (ks <= dmax + 1)
        vec[ks[in_span] - dmin] = g.to_numpy()[in_span]
        # diffs at day > dmax+1 can't exist (b+1 <= dmax+W); starts before
        # dmin can't exist. Opens whose close lands past the span still
        # count for every in-span day (close clipped away).
        run = np.cumsum(vec[:-1])
        return pd.DataFrame({"day": days, "n_users_7d": run})

    return partials.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


def _skyline_2d(cents: np.ndarray, day: np.ndarray, keys: np.ndarray):
    """Indices of the 2-D Pareto skyline (maximize cents, minimize day) with
    deterministic duplicate handling: sort by (cents DESC, day ASC, key ASC)
    and keep rows strictly below the running day-minimum — plus the first
    row of each (cents, day) tie group... duplicates of a skyline point are
    all kept (SQL's NOT EXISTS keeps every non-strictly-dominated row)."""
    order = np.lexsort((keys, day, -cents))
    c, d = cents[order], day[order]
    # running min of day over all STRICTLY-higher-cents rows seen so far
    keep = np.zeros(len(order), dtype=bool)
    best_day = np.int64(np.iinfo(np.int64).max)
    i = 0
    n = len(order)
    while i < n:
        j = i
        while j < n and c[j] == c[i]:  # cents tie group
            j += 1
        gd = d[i:j].min()
        # survive iff (a) not dominated by any strictly-higher-cents row
        # (gd < best_day) and (b) min-day within the tie group (same-cents
        # smaller-day rows dominate); exact duplicates of the min-day point
        # all survive (strict dominance never holds between equal points)
        keep[i:j] = (d[i:j] == gd) & (gd < best_day)
        if gd < best_day:
            best_day = gd
        i = j
    return order[keep]


def skyline_orders(sf_dir: str, n_parts: int = 16):
    """(o_orderkey, cents, day): the Pareto SKYLINE of orders — rows not
    dominated by any other order in (totalprice: higher is better,
    orderdate: earlier is better). The dominance-reduction (anti-chain)
    shape none of the other aggregates cover; multi-criteria winnowing is
    how curation pipelines pick "best quality AND shortest" exemplars.

    Scale shape: skyline is an IDEMPOTENT, MERGE-CLOSED reduction —
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so each partition
    computes a local skyline (O(n log n) sort + one linear scan, no O(n²)
    dominance tests) and the global pass runs the same kernel over the
    union of local skylines (skyline-sized, typically tiny under any
    correlated data). The per-cents-tie-group loop iterates over DISTINCT
    price levels in the skyline candidate set, not rows. SQL twin: the
    textbook NOT EXISTS strict-dominance predicate."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def encode(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        day = (
            t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // US_PER_DAY
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "cents": pa.array(cents),
                "day": pa.array(day),
            }
        )

    def local_sky(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "cents": pd.Series([], dtype=np.int64),
                    "day": pd.Series([], dtype=np.int64),
                }
            )
        idx = _skyline_2d(
            df["cents"].to_numpy(), df["day"].to_numpy(), df["o_orderkey"].to_numpy()
        )
        return df.iloc[idx][["o_orderkey", "cents", "day"]]

    partials = ds.map_batches(encode, batch_format="pyarrow").map_batches(
        local_sky, batch_format="pandas"
    )
    return partials.repartition(1).map_batches(
        local_sky, batch_format="pandas", batch_size=None
    )


def join_size_estimate(sf_dir: str, n_parts: int = 16):
    """One row (est_pairs, exact_pairs): predicted vs true size of the
    events-on-user_id SELF-join — the sketch-algebra primitive a distributed
    planner runs BEFORE committing to a shuffle join: the count-min inner
    product ``min over rows r of Σ_col cnt[r,col]²`` upper-bound-estimates
    Σ_k f(k)² (AMS/CMS join-size estimation, Alon-Matias-Szegedy '96 /
    Cormode-Muthukrishnan '05) from two mergeable 4×256 sketches without
    touching either side's raw keys. exact_pairs = Σ_k count(k)² computed
    the partitioned way for the verdict; at 10^9 keys a planner has only
    the sketch.

    Both numbers are integer-exact and SQL-replayed (same multiply-shift
    hashes as heavy_hitters_cms), so the driver hash-checks the ESTIMATE
    itself, not just the exact count."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def sketch_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        rows, cols, cnts = [], [], []
        for r, seed in enumerate(CMS_SEEDS):
            bc = np.bincount(_cms_cols(u, seed), minlength=CMS_WIDTH)
            nz = np.nonzero(bc)[0]
            rows.append(np.full(len(nz), r, dtype=np.int64))
            cols.append(nz.astype(np.int64))
            cnts.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "r": pa.array(np.concatenate(rows)),
                "col": pa.array(np.concatenate(cols)),
                "n": pa.array(np.concatenate(cnts)),
            }
        )

    merged = (
        ds.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby(["r", "col"])
        .sum("n")
        .to_pandas()  # <= depth*width rows — driver-safe by construction
    )

    def count_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        df = pd.DataFrame({"user_id": u})
        g = df.groupby("user_id", as_index=False).size()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy()),
                "up": pa.array(
                    (g["user_id"].to_numpy().astype(np.uint64) % n_parts).astype(
                        np.int64
                    )
                ),
                "n": pa.array(g["size"].to_numpy().astype(np.int64)),
            }
        )

    def sq_per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"sq": pd.Series([], dtype=np.int64)})
        tot = df.groupby("user_id")["n"].sum().to_numpy()
        return pd.DataFrame({"sq": np.array([(tot * tot).sum()], np.int64)})

    exact_parts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("up")
        .map_groups(sq_per_part, batch_format="pandas")
        .to_pandas()
    )
    exact = int(exact_parts["sq"].sum()) if len(exact_parts) else 0

    if len(merged):
        counters = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        counters[merged["r"].to_numpy(), merged["col"].to_numpy()] = merged[
            "sum(n)"
        ].to_numpy()
        est = int((counters * counters).sum(axis=1).min())
    else:
        est = 0
    return pa.table(
        {
            "est_pairs": pa.array([est], pa.int64()),
            "exact_pairs": pa.array([exact], pa.int64()),
        }
    )

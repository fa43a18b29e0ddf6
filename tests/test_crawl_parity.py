"""Oracle-equality suite: the Ray engine must reproduce the single-process
oracle crawler exactly — span sequences, crawl order, seen set, metrics —
and resume from checkpoint must be equivalent to an uninterrupted run."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl4ai_llm_ray.oracle.crawler import oracle_crawl
from crawl4ai_llm_ray.pipelines.crawl import crawl_order, run_crawl
from crawl4ai_llm_ray.sources.synth import SynthWebConfig

CFG = SynthWebConfig(seed=42, n_hosts=12, base_pages=20, n_seeds=6)
NPART = 4


def _engine_docs(out_dir):
    tbl = pq.read_table(os.path.join(out_dir, "docs"))
    docs = {}
    urls = tbl["url_canon"].to_pylist()
    spans = tbl["spans"].to_pylist()
    for u, sp in zip(urls, spans):
        docs[u] = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
    return docs


def _normalize_metrics(metrics_tbl):
    out = {}
    for row in metrics_tbl.to_pylist():
        key = (row["partition_id"], row["wave"])
        vals = {
            k: row[k]
            for k in ("offered", "admitted", "deduped", "robots_blocked", "fetched")
        }
        if any(vals.values()):
            cur = out.setdefault(key, dict.fromkeys(vals, 0))
            for k, v in vals.items():
                cur[k] += v
    return out


@pytest.fixture(scope="module")
def golden():
    return oracle_crawl(CFG, n_partitions=NPART)


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl") / "out")
    res = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        batch_size=256,
        expected_urls_per_shard=2048,
    )
    return res


def test_doc_count_and_waves(engine, golden):
    assert engine.n_docs == len(golden["docs"])
    assert engine.n_waves == golden["n_waves"]


def test_seen_set_equality(engine, golden):
    assert engine.seen_hashes.tolist() == golden["seen"]


def test_span_sequence_equality(engine, golden):
    docs = _engine_docs(engine.out_dir)
    assert set(docs) == set(golden["docs"])
    for url, gspans in golden["docs"].items():
        assert docs[url] == gspans, f"span mismatch for {url}"


def test_crawl_order_equality(engine, golden):
    order = crawl_order(engine.out_dir)
    got = list(
        zip(
            order["seq"].to_pylist(),
            order["url_canon"].to_pylist(),
            order["wave"].to_pylist(),
            order["host"].to_pylist(),
            order["scheduled_t"].to_pylist(),
        )
    )
    assert got == golden["order"]


def test_politeness_invariant(engine):
    """Consecutive same-host fetches are ≥ crawl_delay apart."""
    from crawl4ai_llm_ray.sources.synth import robots_rules

    order = crawl_order(engine.out_dir)
    rules = robots_rules(CFG)
    by_host = {}
    for host, sched in zip(
        order["host"].to_pylist(), order["scheduled_t"].to_pylist()
    ):
        by_host.setdefault(host, []).append(sched)
    for host, times in by_host.items():
        delay = rules.get(host, ((), 1.0))[1]
        for a, b in zip(times, times[1:]):
            assert b - a >= delay - 1e-9, (host, a, b)


def test_metrics_equality(engine, golden):
    got = _normalize_metrics(engine.metrics)
    want = {
        k: v for k, v in golden["metrics"].items() if any(v.values())
    }
    assert got == want


def test_resume_with_checkpoint_interval(ray_session, tmp_path, golden):
    """checkpoint_interval=2: the resume point can precede completed waves,
    which must be wiped and deterministically re-run."""
    out = str(tmp_path / "ckpt2_out")
    partial = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        max_waves=3,  # waves 0,1,2 done; last checkpoint at wave 2
        checkpoint_interval=2,
        expected_urls_per_shard=2048,
    )
    assert partial.n_waves == 3
    full = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        resume=True,
        checkpoint_interval=2,
        expected_urls_per_shard=2048,
    )
    assert full.seen_hashes.tolist() == golden["seen"]
    docs = _engine_docs(out)
    assert set(docs) == set(golden["docs"])
    for url, gspans in golden["docs"].items():
        assert docs[url] == gspans


@pytest.mark.parametrize(
    "cfg,npart,salted",
    [
        (SynthWebConfig(seed=7, n_hosts=9, base_pages=25, n_seeds=4), 3, None),
        (
            SynthWebConfig(
                seed=1234, n_hosts=15, base_pages=30, n_seeds=8, p_transient_fail=0.1
            ),
            5,
            {"h000.test": 2},
        ),
    ],
)
def test_parity_fuzz_configs(ray_session, tmp_path, cfg, npart, salted):
    """Parity must hold across corpus shapes, partition counts, failures and
    salting simultaneously."""
    golden = oracle_crawl(cfg, n_partitions=npart, salted_hosts=salted)
    res = run_crawl(
        cfg,
        str(tmp_path / "fuzz"),
        n_partitions=npart,
        fetch_concurrency=2,
        expected_urls_per_shard=2048,
        salted_hosts=salted,
    )
    assert res.seen_hashes.tolist() == golden["seen"]
    docs = _engine_docs(res.out_dir)
    assert set(docs) == set(golden["docs"])
    for url, gspans in golden["docs"].items():
        assert docs[url] == gspans
    order = crawl_order(res.out_dir)
    got = list(
        zip(
            order["seq"].to_pylist(),
            order["url_canon"].to_pylist(),
            order["wave"].to_pylist(),
            order["host"].to_pylist(),
            order["scheduled_t"].to_pylist(),
        )
    )
    assert got == golden["order"]


def test_resume_equivalence(ray_session, tmp_path, golden):
    """Kill after wave 2 (simulated by max_waves), resume, final state equal."""
    out = str(tmp_path / "resume_out")
    partial = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        max_waves=2,
        expected_urls_per_shard=2048,
    )
    assert partial.n_waves == 2
    full = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        resume=True,
        expected_urls_per_shard=2048,
    )
    assert full.n_docs == len(golden["docs"])
    assert full.seen_hashes.tolist() == golden["seen"]
    docs = _engine_docs(out)
    for url, gspans in golden["docs"].items():
        assert docs[url] == gspans
    order = crawl_order(out)
    got = list(
        zip(
            order["seq"].to_pylist(),
            order["url_canon"].to_pylist(),
            order["wave"].to_pylist(),
            order["host"].to_pylist(),
            order["scheduled_t"].to_pylist(),
        )
    )
    assert got == golden["order"]


def test_incremental_crawl_extra_seeds(ray_session, tmp_path):
    """Continuous crawl: resume a checkpointed crawl with NEW seeds; the
    final fetched-URL set and seen set must equal a from-scratch crawl whose
    seed list covers the union (the fetched SET is order-independent —
    injection wave only changes ordering, never membership)."""
    from crawl4ai_llm_ray.pipelines.crawl import run_crawl

    extra = [CFG.url(i, 0) for i in range(CFG.n_seeds, CFG.n_seeds + 3)]

    out_inc = str(tmp_path / "inc")
    run_crawl(CFG, out_inc, n_partitions=NPART, fetch_concurrency=2,
              max_waves=2, expected_urls_per_shard=2048)
    inc = run_crawl(CFG, out_inc, n_partitions=NPART, fetch_concurrency=2,
                    resume=True, expected_urls_per_shard=2048,
                    extra_seed_urls=extra)

    # union baseline: same corpus, seeds = CFG's plus the 3 extra hosts
    # (seed n_seeds=9 covers exactly those page-0 urls; messy variants
    # canonicalize onto the same pages, so the fetched SET is unaffected)
    from dataclasses import replace

    cfg_union = replace(CFG, n_seeds=CFG.n_seeds + 3)
    out_union = str(tmp_path / "union")
    uni = run_crawl(cfg_union, out_union, n_partitions=NPART,
                    fetch_concurrency=2, expected_urls_per_shard=2048)

    inc_urls = sorted(_engine_docs(out_inc))
    uni_urls = sorted(_engine_docs(out_union))
    assert inc_urls == uni_urls
    assert sorted(inc.seen_hashes.tolist()) == sorted(uni.seen_hashes.tolist())
    # span content per URL is url-deterministic — must match too
    inc_docs, uni_docs = _engine_docs(out_inc), _engine_docs(out_union)
    assert inc_docs == uni_docs

    # guard: extra seeds on a fresh (non-resume) run is an error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="extra_seed_urls"):
        run_crawl(CFG, str(tmp_path / "fresh"), n_partitions=NPART,
                  extra_seed_urls=["http://h000.test/p/0"])


def test_resume_discards_partial_wave_output(ray_session, tmp_path, golden):
    """Hard-crash window: a wave dir committed AFTER the last checkpoint
    (manifest still says next_wave == that wave) plus a stale .tmp_ dir must
    both be discarded on resume and the wave re-run — final output byte-
    equal to the golden crawl, no garbage rows surviving."""
    import pyarrow.parquet as pq_mod

    out = str(tmp_path / "crash_out")
    run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        max_waves=2,
        expected_urls_per_shard=2048,
    )
    docs_dir = os.path.join(out, "docs")
    # simulate: crash happened mid-wave-2 — one garbage "committed" wave dir
    # (e.g. from a run whose manifest write never landed) + a torn tmp dir
    garbage = os.path.join(docs_dir, "wave_00002")
    os.makedirs(garbage, exist_ok=True)
    pq_mod.write_table(
        pa.table({"doc_id": pa.array(["GARBAGE"]), "url_canon": pa.array(["x"])}),
        os.path.join(garbage, "part-0.parquet"),
    )
    os.makedirs(os.path.join(docs_dir, ".tmp_torn"), exist_ok=True)

    full = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        resume=True,
        expected_urls_per_shard=2048,
    )
    assert full.n_docs == len(golden["docs"])
    assert full.seen_hashes.tolist() == golden["seen"]
    docs = _engine_docs(out)
    assert "x" not in docs and len(docs) == len(golden["docs"])
    for url, gspans in golden["docs"].items():
        assert docs[url] == gspans
    assert not os.path.exists(os.path.join(docs_dir, ".tmp_torn"))


def test_resume_preserves_in_flight_metrics(ray_session, tmp_path):
    """Counters offered since the last wave seal survive checkpoint/restore:
    a resumed crawl's metrics table equals an uninterrupted run's (the
    pre-fix behavior zeroed offered/admitted/deduped for the first resumed
    wave)."""
    out_a = str(tmp_path / "uninterrupted")
    full = run_crawl(
        CFG, out_a, n_partitions=NPART, fetch_concurrency=2,
        expected_urls_per_shard=2048,
    )
    out_b = str(tmp_path / "resumed")
    run_crawl(
        CFG, out_b, n_partitions=NPART, fetch_concurrency=2, max_waves=2,
        expected_urls_per_shard=2048,
    )
    resumed = run_crawl(
        CFG, out_b, n_partitions=NPART, fetch_concurrency=2, resume=True,
        expected_urls_per_shard=2048,
    )
    a = full.metrics.to_pandas().sort_values(["partition_id", "wave"])
    b = resumed_all = resumed.metrics.to_pandas().sort_values(
        ["partition_id", "wave"]
    )
    # the resumed run's table contains only waves >= the restore point plus
    # restored rows — compare the FULL per-(partition, wave) accounting
    cols = ["partition_id", "wave", "offered", "admitted", "deduped",
            "robots_blocked", "fetched"]
    assert a[cols].reset_index(drop=True).equals(
        b[cols].reset_index(drop=True)
    )

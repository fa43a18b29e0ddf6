"""Hot-host salting: a salted host's frontier spreads across shards while
politeness (≥ delay between ANY two fetches of that host) still holds, and
the engine stays byte-identical to the oracle under the same salting map."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from crawl4ai_llm_ray.oracle.crawler import oracle_crawl
from crawl4ai_llm_ray.pipelines.crawl import crawl_order, run_crawl
from crawl4ai_llm_ray.sources.synth import SynthWebConfig, robots_rules
from crawl4ai_llm_ray.stages.canonicalize import salted_partition_scalar

CFG = SynthWebConfig(seed=42, n_hosts=12, base_pages=40, n_seeds=6)
SALTED = {"h000.test": 3, "h001.test": 2}  # the two hottest hosts
NPART = 4


def test_salted_routing_spreads_partitions():
    parts = {
        salted_partition_scalar("h000.test", u, NPART, SALTED) for u in range(200)
    }
    assert len(parts) > 1  # hot host now lives on several shards
    # unsalted host stays on one
    parts1 = {
        salted_partition_scalar("h005.test", u, NPART, SALTED) for u in range(200)
    }
    assert len(parts1) == 1


@pytest.fixture(scope="module")
def salted_run(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("salt") / "out")
    res = run_crawl(
        CFG,
        out,
        n_partitions=NPART,
        fetch_concurrency=2,
        expected_urls_per_shard=2048,
        salted_hosts=SALTED,
    )
    golden = oracle_crawl(CFG, n_partitions=NPART, salted_hosts=SALTED)
    return res, golden


def test_salted_parity(salted_run):
    res, golden = salted_run
    assert res.seen_hashes.tolist() == golden["seen"]
    assert res.n_docs == len(golden["docs"])
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
    tbl = pq.read_table(res.out_dir + "/docs")
    docs = dict(zip(tbl["url_canon"].to_pylist(), tbl["spans"].to_pylist()))
    for url, gspans in golden["docs"].items():
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in docs[url]
        ]
        assert got_spans == gspans


def test_salted_politeness_invariant(salted_run):
    """Even split across sub-shards, no two fetches of a host are closer
    than its crawl delay."""
    res, _ = salted_run
    order = crawl_order(res.out_dir)
    rules = robots_rules(CFG)
    by_host = {}
    for host, sched in zip(order["host"].to_pylist(), order["scheduled_t"].to_pylist()):
        by_host.setdefault(host, []).append(sched)
    for host, times in by_host.items():
        delay = rules.get(host, ((), 1.0))[1]
        times = sorted(times)
        for a, b in zip(times, times[1:]):
            assert b - a >= delay - 1e-9, (host, a, b)


def test_salted_state_actually_spread(salted_run):
    """The salted hosts' URLs were processed by more than one partition
    (metrics attribute work per partition)."""
    res, _ = salted_run
    m = res.metrics.to_pylist()
    parts_with_work = {r["partition_id"] for r in m if r["fetched"] > 0}
    assert len(parts_with_work) > 1

"""Real-HTTP fetch path: an in-process loopback server serves the same
deterministic synthetic web over actual HTTP (the sandbox has no outbound
network), and the crawl runs through stages/http_fetch.HttpFetchFn — span
parity with the synthetic in-memory fetcher must be exact, and the retry /
politeness behavior of the HTTP client is tested directly."""

import threading
import time
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl4ai_llm_ray.pipelines.crawl import crawl_order, run_crawl
from crawl4ai_llm_ray.sources.synth import SynthWebConfig, fetch_pages
from crawl4ai_llm_ray.stages.http_fetch import HttpFetchFn, render_page

CFG = SynthWebConfig(seed=21, n_hosts=6, base_pages=12, n_seeds=4)


class _SynthHandler(BaseHTTPRequestHandler):
    """Serves http://127.0.0.1:PORT/hNNN.test/p/J by rendering the synthetic
    page for http://hNNN.test/p/J as JSON-lines spans. ``fail_first[path]``
    requests 503 before the page starts serving (retry exercise)."""

    cfg = CFG
    fail_first: dict[str, int] = {}
    counts: dict[str, int] = defaultdict(int)
    seen_headers: dict[str, dict] = {}
    lock = threading.Lock()

    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        with self.lock:
            self.counts[self.path] += 1
            n_seen = self.counts[self.path]
            self.seen_headers[self.path] = dict(self.headers)
        if n_seen <= self.fail_first.get(self.path, 0):
            self.send_response(503)
            self.end_headers()
            return
        url = "http:/" + self.path  # /h003.test/p/7 -> http://h003.test/p/7
        out = fetch_pages(self.cfg, [url])
        if int(out["status"][0]) != 200:
            self.send_response(int(out["status"][0]))
            self.end_headers()
            return
        spans = list(
            zip(
                out["kind"].to_pylist(),
                out["text"].to_pylist(),
                out["media_ref"].to_pylist(),
                (int(o) for o in out["offset"]),
            )
        )
        body = render_page(spans)
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SynthHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def _rewrite_for(port: int):
    def rewrite(url: str) -> str:
        # http://hNNN.test/p/J -> http://127.0.0.1:PORT/hNNN.test/p/J
        return f"http://127.0.0.1:{port}/" + url.split("//", 1)[1]

    return rewrite


def _doc_key_table(out_dir: str):
    t = pq.read_table(
        f"{out_dir}/docs", columns=["url_canon", "wave", "status", "spans"]
    )
    return t.take(pa.compute.sort_indices(t, sort_keys=[("url_canon", "ascending")]))


class TestHttpCrawlParity:
    def test_span_parity_with_synthetic_fetcher(self, ray_session, tmp_path, server):
        synth = run_crawl(
            CFG, str(tmp_path / "synth"), n_partitions=2, fetch_concurrency=2,
            expected_urls_per_shard=1024,
        )
        http = run_crawl(
            CFG, str(tmp_path / "http"), n_partitions=2, fetch_concurrency=2,
            expected_urls_per_shard=1024,
            fetch_fn=HttpFetchFn(url_rewrite=_rewrite_for(server)),
        )
        assert http.n_docs == synth.n_docs and http.n_docs > 0
        assert http.seen_hashes.tolist() == synth.seen_hashes.tolist()
        a, b = _doc_key_table(synth.out_dir), _doc_key_table(http.out_dir)
        assert a.equals(b), "HTTP-fetched spans/status must be byte-identical"
        oa, ob = crawl_order(synth.out_dir), crawl_order(http.out_dir)
        assert oa.equals(ob)


class TestHttpFetchFnUnit:
    def test_retry_until_success_and_exhaustion(self, server):
        f = HttpFetchFn(url_rewrite=_rewrite_for(server))
        ok_url = "http://h000.test/p/1"
        bad_url = "http://h000.test/p/2"
        _SynthHandler.fail_first = {"/h000.test/p/1": 2, "/h000.test/p/2": 5}
        try:
            out = f(pa.array([ok_url, bad_url]), retries=3)
        finally:
            _SynthHandler.fail_first = {}
        assert out["status"].tolist() == [200, 503]
        assert out["attempts"].tolist() == [3, 4]  # 2 fails + 1 ok; 1 + 3 retries
        assert out["span_counts"][0] > 0 and out["span_counts"][1] == 0

    def test_missing_page_is_404_no_spans(self, server):
        f = HttpFetchFn(url_rewrite=_rewrite_for(server))
        out = f(pa.array(["http://h000.test/p/99999"]), retries=1)
        assert out["status"].tolist() == [404]
        assert out["attempts"].tolist() == [1]  # 404 is not retryable
        assert out["span_counts"].tolist() == [0]

    def test_connection_failure_maps_to_599(self):
        f = HttpFetchFn(url_rewrite=lambda u: "http://127.0.0.1:1/x", timeout=0.2)
        out = f(pa.array(["http://h000.test/p/0"]), retries=1)
        assert out["status"].tolist() == [599]
        assert out["attempts"].tolist() == [2]

    def test_headers_and_user_agent_reach_the_wire(self, server):
        """CrawlerSettings fetch knobs (reference config.py:49-59) must
        thread through from_settings onto the actual HTTP request."""
        from crawl4ai_llm_ray.engine import CrawlerSettings

        st = CrawlerSettings(
            user_agent="graft-test-agent/9.9",
            headers={"X-Graft-Token": "tok-123"},
            delay=0.0,
            timeout=5.0,
        )
        f = HttpFetchFn.from_settings(st, url_rewrite=_rewrite_for(server))
        out = f(pa.array(["http://h000.test/p/3"]), retries=0)
        assert out["status"].tolist() == [200]
        # urllib normalizes header-name case (X-graft-token) — compare folded
        hdrs = {
            k.lower(): v
            for k, v in _SynthHandler.seen_headers["/h000.test/p/3"].items()
        }
        assert hdrs.get("user-agent") == "graft-test-agent/9.9"
        assert hdrs.get("x-graft-token") == "tok-123"

    def test_explicit_headers_beat_user_agent_default(self, server):
        f = HttpFetchFn(
            url_rewrite=_rewrite_for(server),
            user_agent="default-ua/1",
            headers={"User-Agent": "explicit-ua/2"},
        )
        out = f(pa.array(["http://h000.test/p/4"]), retries=0)
        assert out["status"].tolist() == [200]
        hdrs = {
            k.lower(): v
            for k, v in _SynthHandler.seen_headers["/h000.test/p/4"].items()
        }
        assert hdrs.get("user-agent") == "explicit-ua/2"

    def test_per_host_min_interval(self, server):
        f = HttpFetchFn(
            url_rewrite=_rewrite_for(server), min_interval_per_host=0.05, max_conn=4
        )
        urls = [f"http://h000.test/p/{j}" for j in range(4)]
        t0 = time.monotonic()
        out = f(pa.array(urls), retries=0)
        assert (time.monotonic() - t0) >= 0.15  # 4 requests, >=3 gaps
        assert out["status"].tolist() == [200] * 4

"""Real-HTTP fetch_fn for FetcherWorker.

The engine's fetch stage is pluggable: ``FetcherWorker(fetch_fn=...)`` accepts
any callable with the page-batch contract

    fetch_fn(urls: pa.StringArray, retries: int) -> dict with per-page arrays
        status:int32, attempts:int32, span_counts:int64
    and flat per-span arrays (page order)
        kind/text/media_ref: Arrow string, offset:int32

(the same contract ``sources.synth.fetch_pages`` implements for the synthetic
web). ``HttpFetchFn`` here is the real-network implementation: it GETs each
URL, parses the body into interleaved spans, retries transient failures
(HTTP 5xx / connection errors) up to ``retries`` extra attempts with the
reference's max_retries semantics (``/root/reference/crawl4ai_llm/config.py:55``),
and optionally enforces a wall-clock per-host minimum interval as a safety
net under the frontier's virtual-time politeness scheduling.

Transport: aiohttp when available (import-gated — not in this container),
else a thread pool over stdlib urllib. One fetch_fn instance lives per fetch
task/actor, so the pool and per-host clocks are per-worker state — at cluster
scale each worker rate-limits only its own politeness slice, which is exactly
the slice the frontier assigned it.

Page format (what the pytest loopback server speaks, and what a real
deployment would replace with an HTML extractor): JSON-lines, one span per
line, ``[kind, text, media_ref, offset]``.
"""

from __future__ import annotations

import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa

try:  # preferred async client — absent in this container
    import aiohttp  # noqa: F401

    _HAVE_AIOHTTP = True
except ImportError:
    _HAVE_AIOHTTP = False


def render_page(spans: list[tuple[str, str, str, int]]) -> bytes:
    """Serialize one page's spans as JSON-lines (server side / test fixture)."""
    return "\n".join(json.dumps(s, separators=(",", ":")) for s in spans).encode()


def parse_page(body: bytes) -> list[tuple[str, str, str, int]]:
    return [tuple(json.loads(ln)) for ln in body.decode().splitlines() if ln]


class HttpFetchFn:
    """fetch_fn over real HTTP. ``url_rewrite`` maps the canonical URL to the
    transport URL (the pytest loopback server rewrites ``http://hNNN.test/...``
    to ``http://127.0.0.1:PORT/hNNN.test/...``; production would pass
    identity)."""

    RETRYABLE = frozenset(range(500, 600))

    def __init__(
        self,
        url_rewrite=None,
        max_conn: int = 8,
        timeout: float = 10.0,
        min_interval_per_host: float = 0.0,
        backoff: float = 0.0,
        user_agent: str | None = None,
        headers: dict[str, str] | None = None,
        proxy: str | None = None,
        verify_ssl: bool = True,
    ):
        import urllib.request

        self.url_rewrite = url_rewrite or (lambda u: u)
        self.max_conn = max_conn
        self.timeout = timeout
        self.min_interval = min_interval_per_host
        self.backoff = backoff
        self._host_lock = threading.Lock()
        self._last_req: dict[str, float] = {}
        # reference CrawlerConfig fetch knobs (config.py:49-59): headers /
        # user_agent go on every Request; proxy and verify_ssl configure ONE
        # opener built here (per fetch worker), not per request
        self.headers = dict(headers or {})
        if user_agent is not None:
            self.headers.setdefault("User-Agent", user_agent)
        handlers = []
        if proxy:
            handlers.append(
                urllib.request.ProxyHandler({"http": proxy, "https": proxy})
            )
        if not verify_ssl:
            import ssl

            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            handlers.append(urllib.request.HTTPSHandler(context=ctx))
        self._opener = urllib.request.build_opener(*handlers)

    @classmethod
    def from_settings(cls, settings, url_rewrite=None, **overrides):
        """Build from an ``engine.CrawlerSettings`` (the reference
        CrawlerConfig surface): timeout / user_agent / headers / proxy /
        verify_ssl all thread through; ``delay`` becomes the wall-clock
        per-host safety net."""
        kw = dict(
            url_rewrite=url_rewrite,
            timeout=settings.timeout,
            user_agent=settings.user_agent,
            headers=getattr(settings, "headers", None),
            proxy=getattr(settings, "proxy", None),
            verify_ssl=getattr(settings, "verify_ssl", True),
            min_interval_per_host=getattr(settings, "delay", 0.0) or 0.0,
        )
        kw.update(overrides)
        return cls(**kw)

    # -------------------------------------------------------------- politeness
    def _wait_host_slot(self, host: str) -> None:
        """Reserve the next wall-clock slot ≥ min_interval after the host's
        previous one (thread-safe; the sleep happens OUTSIDE the lock)."""
        if self.min_interval <= 0:
            return
        with self._host_lock:
            now = time.monotonic()
            slot = max(now, self._last_req.get(host, 0.0) + self.min_interval)
            self._last_req[host] = slot
        if slot > now:
            time.sleep(slot - now)

    # -------------------------------------------------------------- transport
    def _get(self, url: str) -> tuple[int, bytes]:
        import urllib.error
        import urllib.request

        try:
            req = urllib.request.Request(url, headers=self.headers)
            with self._opener.open(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as err:
            return err.code, b""
        except (urllib.error.URLError, OSError, TimeoutError):
            return -1, b""  # connection-level failure → retryable

    def _fetch_one(self, url_canon: str, retries: int):
        host = url_canon.split("/", 3)[2] if "//" in url_canon else url_canon
        target = self.url_rewrite(url_canon)
        attempts = 0
        status, body = -1, b""
        while attempts <= retries:
            self._wait_host_slot(host)
            status, body = self._get(target)
            attempts += 1
            if status != -1 and status not in self.RETRYABLE:
                break
            if self.backoff and attempts <= retries:
                time.sleep(self.backoff * attempts)
        spans = parse_page(body) if status == 200 else []
        return status if status != -1 else 599, attempts, spans

    # ---------------------------------------------------------------- contract
    def __call__(self, urls, retries: int = 3) -> dict:
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        url_list = urls.to_pylist() if isinstance(urls, pa.Array) else list(urls)
        n = len(url_list)
        if n == 0:
            results = []
        elif n == 1:
            results = [self._fetch_one(url_list[0], retries)]
        else:
            with ThreadPoolExecutor(max_workers=min(self.max_conn, n)) as pool:
                results = list(
                    pool.map(lambda u: self._fetch_one(u, retries), url_list)
                )
        status = np.fromiter((r[0] for r in results), np.int32, count=n)
        attempts = np.fromiter((r[1] for r in results), np.int32, count=n)
        span_counts = np.fromiter((len(r[2]) for r in results), np.int64, count=n)
        kinds: list[str] = []
        texts: list[str] = []
        refs: list[str] = []
        offsets: list[int] = []
        for _, _, spans in results:
            for kind, text, ref, off in spans:
                kinds.append(kind)
                texts.append(text)
                refs.append(ref)
                offsets.append(off)
        return {
            "status": status,
            "attempts": attempts,
            "span_counts": span_counts,
            "kind": pa.array(kinds, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "media_ref": pa.array(refs, type=pa.string()),
            "offset": np.asarray(offsets, dtype=np.int32),
        }

"""Deterministic synthetic web corpus (FIXTURES.md F1-F4).

The web is a *pure function* of ``(url, SynthWebConfig)``: page content (span
sequence + outlinks) is generated from a PCG64 stream seeded by the stable
FNV-1a-64 hash of the URL.  This is the key scale property — the fetch stage
can "fetch" any URL on any worker with zero broadcast state (just the ~100-byte
config), exactly like a real fetcher needs only the URL.  The oracle crawler
and the Ray engine therefore see byte-identical pages by construction.

Shape (per FIXTURES.md): hosts with Zipf-skewed page counts (hot-host skew on
purpose), 3-40 spans/doc, ~30% text-only docs, ~5% media-only; link spans
include messy URL variants (case, ports, fragments, unsorted query params,
trailing slashes) that canonicalize to already-seen targets, links to
robots-disallowed paths, dead links (404), and cross-host edges.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64_scalar
from ..schema import ROBOTS_SCHEMA, SEED_SCHEMA

_VOCAB = (
    "the quick brown fox jumps over lazy dog data stream arrow batch shard "
    "frontier crawl fetch parse index store queue host page link media image "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega zero one two three "
    "four five six seven eight nine red green blue cyan magenta yellow black "
    "white north south east west spring summer autumn winter river mountain "
    "valley ocean forest desert island harbor bridge tower castle garden"
).split()


@dataclass(frozen=True)
class SynthWebConfig:
    seed: int = 42
    n_hosts: int = 50
    base_pages: int = 60          # pages on the hottest host; Zipf decay below
    zipf_a: float = 1.3
    p_cross_host: float = 0.20    # link targets on another host
    p_messy_link: float = 0.35    # link emitted as a non-canonical variant
    p_private_link: float = 0.08  # link into a robots-disallowed path
    p_dead_link: float = 0.10     # link to a nonexistent page (404)
    n_seeds: int = 12

    def n_pages(self, host_idx: int) -> int:
        return max(1, int(self.base_pages / (host_idx + 1) ** self.zipf_a))

    def host(self, host_idx: int) -> str:
        return f"h{host_idx:03d}.test"

    def url(self, host_idx: int, page_idx: int) -> str:
        return f"http://{self.host(host_idx)}/p/{page_idx}"

    @property
    def total_pages(self) -> int:
        return sum(self.n_pages(i) for i in range(self.n_hosts))


_URL_RE = re.compile(r"^http://h(\d{3})\.test/p/(\d+)$")


def _rng_for(cfg: SynthWebConfig, url_canon: str) -> np.random.Generator:
    return np.random.Generator(
        np.random.PCG64(fnv1a64_scalar(f"{cfg.seed}|{url_canon}"))
    )


def _messy_variant(url: str, rng: np.random.Generator) -> str:
    """Emit a non-canonical variant of a canonical URL (dedup stress)."""
    host, rest = url.split("//", 1)[1].split("/", 1)
    kind = int(rng.integers(0, 5))
    if kind == 0:
        return f"http://{host.upper()}/{rest}"
    if kind == 1:
        return f"http://{host}:80/{rest}"
    if kind == 2:
        return f"{url}/"
    if kind == 3:
        return f"{url}#sec{int(rng.integers(0, 9))}"
    return f"{url}?b={int(rng.integers(0, 3))}&a=1&b={int(rng.integers(0, 3))}"


def fetch_page(cfg: SynthWebConfig, url_canon: str):
    """Simulated fetch. Returns (status, spans) where spans is a list of
    (kind, text, media_ref, offset) tuples. Links appear as kind="link" spans
    whose media_ref is the (possibly messy) target URL."""
    m = _URL_RE.match(url_canon)
    if not m:
        return 404, []
    hi, pj = int(m.group(1)), int(m.group(2))
    if hi >= cfg.n_hosts or pj >= cfg.n_pages(hi):
        return 404, []
    rng = _rng_for(cfg, url_canon)
    mode = rng.random()
    # doc mode: ~30% text-only, ~5% media-only, rest interleaved
    text_only = mode < 0.30
    media_only = 0.30 <= mode < 0.35
    n_spans = int(rng.integers(3, 41))
    spans = []
    for k in range(n_spans):
        r = rng.random()
        if media_only:
            sp_kind = "image" if r < 0.7 else "link"
        elif text_only:
            sp_kind = "text" if r < 0.8 else "link"  # links are not media
        else:
            sp_kind = "text" if r < 0.55 else ("image" if r < 0.75 else "link")
        if sp_kind == "text":
            nw = int(rng.integers(4, 16))
            words = [_VOCAB[int(w)] for w in rng.integers(0, len(_VOCAB), nw)]
            spans.append(("text", " ".join(words), "", k))
        elif sp_kind == "image":
            img = f"http://cdn{int(rng.integers(0, 4))}.test/img/{hi}_{pj}_{k}.jpg"
            alt = _VOCAB[int(rng.integers(0, len(_VOCAB)))] if rng.random() < 0.5 else ""
            spans.append(("image", alt, img, k))
        else:  # link
            if rng.random() < cfg.p_cross_host:
                th = int(rng.integers(0, cfg.n_hosts))
            else:
                th = hi
            if rng.random() < cfg.p_private_link:
                target = f"http://{cfg.host(th)}/private/p/{int(rng.integers(0, 5))}"
            elif rng.random() < cfg.p_dead_link:
                target = cfg.url(th, cfg.n_pages(th) + int(rng.integers(0, 5)))
            else:
                target = cfg.url(th, int(rng.integers(0, cfg.n_pages(th))))
            if rng.random() < cfg.p_messy_link:
                target = _messy_variant(target, rng)
            anchor = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
            spans.append(("link", anchor, target, k))
    return 200, spans


def robots_rules(cfg: SynthWebConfig) -> dict[str, tuple[tuple[str, ...], float]]:
    """host → (disallow_prefixes, crawl_delay_s). Deterministic per host.

    crawl_delay default 1.0 mirrors the reference politeness contract
    (``/root/reference/crawl4ai_llm/config.py:56``, ``delay: 1.0``)."""
    rules = {}
    for i in range(cfg.n_hosts):
        prefixes = ("/private",) if i % 3 == 0 else ()
        delay = 1.0
        if i % 5 == 1:
            delay = 0.5
        elif i % 7 == 2:
            delay = 2.0
        rules[cfg.host(i)] = (prefixes, delay)
    return rules


def robots_table(cfg: SynthWebConfig) -> pa.Table:
    rules = robots_rules(cfg)
    return pa.table(
        {
            "host": list(rules),
            "disallow_prefixes": [list(p) for p, _ in rules.values()],
            "crawl_delay_s": np.array([d for _, d in rules.values()], dtype=np.float32),
        },
        schema=ROBOTS_SCHEMA,
    )


def seed_table(cfg: SynthWebConfig) -> pa.Table:
    """F2 seed table: page-0 of the top hosts, with messy duplicates mixed in."""
    rng = np.random.Generator(np.random.PCG64(fnv1a64_scalar(f"{cfg.seed}|seeds")))
    urls, prios, depths = [], [], []
    for i in range(min(cfg.n_seeds, cfg.n_hosts)):
        u = cfg.url(i, 0)
        urls.append(u)
        prios.append(1.0)
        depths.append(0)
        if rng.random() < 0.5:  # duplicate seed as a messy variant
            urls.append(_messy_variant(u, rng))
            prios.append(1.0)
            depths.append(0)
    return pa.table(
        {
            "url": urls,
            "priority": np.array(prios, dtype=np.float32),
            "depth": np.array(depths, dtype=np.int32),
        },
        schema=SEED_SCHEMA,
    )


def spans_to_arrow(span_lists: list[list[tuple]]) -> pa.ListArray:
    """Build the Arrow list<struct> spans column from per-doc span tuples."""
    from ..schema import SPAN_STRUCT

    offsets = np.zeros(len(span_lists) + 1, dtype=np.int32)
    kinds, texts, refs, offs = [], [], [], []
    for i, spans in enumerate(span_lists):
        offsets[i + 1] = offsets[i] + len(spans)
        for kind, text, ref, off in spans:
            kinds.append(kind)
            texts.append(text)
            refs.append(ref)
            offs.append(off)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(refs, type=pa.string()),
            pa.array(offs, type=pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    return pa.ListArray.from_arrays(pa.array(offsets), struct)

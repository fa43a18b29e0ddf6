"""Deterministic synthetic web corpus (FIXTURES.md F1-F4).

The web is a *pure function* of ``(url, SynthWebConfig)``: every page's span
sequence and outlinks derive from splitmix64 mixes of the URL's stable
FNV-1a-64 hash — no sequential RNG streams, so page generation is fully
VECTORIZABLE over a batch of URLs (``fetch_pages``).  This is the key scale
property: the fetch stage "fetches" any batch of URLs on any worker with zero
broadcast state, at ~10-30 µs/page, and the oracle crawler sees byte-identical
pages because it calls the same function.

Shape (per FIXTURES.md): hosts with Zipf-skewed page counts (hot-host skew on
purpose), 3-40 spans/doc, ~30% text-only docs, ~5% media-only; link spans
include messy URL variants (case, ports, fragments, unsorted query params,
trailing slashes) that canonicalize to already-seen targets, links to
robots-disallowed paths, dead links (404), and cross-host edges.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv1a64, fnv1a64_scalar
from ..schema import ROBOTS_SCHEMA, SEED_SCHEMA
from ..state.bloom import _remix

_VOCAB = (
    "the quick brown fox jumps over lazy dog data stream arrow batch shard "
    "frontier crawl fetch parse index store queue host page link media image "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega zero one two three "
    "four five six seven eight nine red green blue cyan magenta yellow black "
    "white north south east west spring summer autumn winter river mountain "
    "valley ocean forest desert island harbor bridge tower castle garden"
).split()

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_U64 = np.uint64


def _mix(h: np.ndarray, tag) -> np.ndarray:
    """Deterministic per-(page, span, purpose) stream: splitmix64 finalizer of
    h ^ (tag+1)*GOLDEN. h and tag may broadcast."""
    with np.errstate(over="ignore"):
        t = (np.asarray(tag, dtype=np.uint64) + _U64(1)) * _GOLDEN
        return _remix(np.asarray(h, dtype=np.uint64) ^ t)


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
    # transient-failure model (reference CrawlerConfig.max_retries contract,
    # /root/reference/crawl4ai_llm/config.py:55 — declared there, enforced
    # here): a failing page 503s deterministically for its first
    # `fail_until` attempts
    p_transient_fail: float = 0.0
    max_fail_attempts: int = 4
    # when > 0, every host with i % 11 == 3 declares this Crawl-delay —
    # set it above wave_duration to exercise the politeness stride
    # (frontier.py next_wave / oracle crawler)
    slow_host_delay: float = 0.0

    def n_pages(self, host_idx: int) -> int:
        return max(1, int(self.base_pages / (host_idx + 1) ** self.zipf_a))

    def host(self, host_idx: int) -> str:
        return f"h{host_idx:03d}.test"

    def url(self, host_idx: int, page_idx: int) -> str:
        return f"http://h{host_idx:03d}.test/p/{page_idx}"

    @property
    def total_pages(self) -> int:
        return int(_pages_per_host(self).sum())


@lru_cache(maxsize=8)
def _pages_per_host_cached(seed, n_hosts, base_pages, zipf_a) -> np.ndarray:
    i = np.arange(n_hosts, dtype=np.float64)
    return np.maximum(1, (base_pages / (i + 1) ** zipf_a).astype(np.int64))


def _pages_per_host(cfg: SynthWebConfig) -> np.ndarray:
    return _pages_per_host_cached(cfg.seed, cfg.n_hosts, cfg.base_pages, cfg.zipf_a)


@lru_cache(maxsize=8)
def _token_stream(seed: int):
    """Deterministic pseudo-text stream: 4096 vocab words in a mixed order,
    pre-joined with word-boundary offsets for O(1) span-text slicing.
    Returns (bigtext str, token offsets, byte pool, vocab-word byte ranges):
    the byte pool is bigtext + all vocab words, so every span text (token
    windows, alt words, anchors) is a (start, len) range into ONE static
    buffer — enabling zero-Python-string Arrow assembly."""
    n = 4096
    idx = (_mix(np.full(n, _U64(fnv1a64_scalar(f"{seed}|tokens"))), np.arange(n))
           % _U64(len(_VOCAB))).astype(np.int64)
    words = [_VOCAB[i] for i in idx]
    bigtext = " ".join(words)
    offs = np.zeros(n + 1, dtype=np.int64)
    pos = 0
    for i, w in enumerate(words):
        offs[i] = pos
        pos += len(w) + 1
    offs[n] = pos
    pool = bigtext + " " + " ".join(_VOCAB)
    pool_bytes = np.frombuffer(pool.encode("ascii"), dtype=np.uint8)
    vocab_start = np.zeros(len(_VOCAB), dtype=np.int64)
    vocab_len = np.zeros(len(_VOCAB), dtype=np.int64)
    p = len(bigtext) + 1
    for i, w in enumerate(_VOCAB):
        vocab_start[i] = p
        vocab_len[i] = len(w)
        p += len(w) + 1
    return bigtext, offs, pool_bytes, (vocab_start, vocab_len)


def _gather_ranges(pool: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> pa.Array:
    """Build a pyarrow string array whose i-th value is
    pool[starts[i]:starts[i]+lens[i]] — fully vectorized (repeat/cumsum range
    gather, no per-row Python)."""
    n = len(starts)
    total = int(lens.sum())
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    if total:
        # flat index: for each row, starts[i] + (0..lens[i]-1)
        shift = np.repeat(starts - offsets[:-1], lens)
        idx = np.arange(total, dtype=np.int64) + shift
        data = pool[idx]
    else:
        data = np.empty(0, dtype=np.uint8)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
    )


def _string_array_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], data uint8[]) of a string array (offset-0)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset:
        arr = pa.concat_arrays([arr])
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1).astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    return offs, data


def _compose_scatter(total: int, pieces) -> pa.Array:
    """Scatter several string arrays into one of length ``total`` ("" at
    unfilled positions) without creating Python strings: concatenate the
    source byte buffers into one pool, scatter (start, len) ints with numpy,
    gather once."""
    starts = np.zeros(total, dtype=np.int64)
    lens = np.zeros(total, dtype=np.int64)
    bufs = []
    base = 0
    for idx, arr in pieces:
        offs, data = _string_array_parts(arr)
        starts[idx] = base + offs[:-1]
        lens[idx] = np.diff(offs)
        bufs.append(data)
        base += len(data)
    pool = np.concatenate(bufs) if bufs else np.empty(0, np.uint8)
    return _gather_ranges(pool, starts, lens)


def _seed64(cfg: SynthWebConfig) -> np.uint64:
    return _U64(fnv1a64_scalar(f"{cfg.seed}|corpus"))


_URL_PARSE_RE = r"^http://h(?P<h>\d{3})\.test/p/(?P<p>\d+)$"


def fetch_pages(cfg: SynthWebConfig, urls, retries: int = 3) -> dict:
    """Vectorized simulated fetch of a batch of canonical URLs.

    Returns dict with per-page arrays (status:int32, attempts:int32,
    span_counts:int64) and flat per-span Arrow string arrays
    (kind/text/media_ref) plus offset:int32, in page order — assembled
    entirely from Arrow kernels and numpy byte-pool gathers (zero per-span
    Python strings).

    Retry contract: with ``cfg.p_transient_fail > 0`` a page deterministically
    503s on its first ``fail_until`` attempts; the fetcher retries up to
    ``retries`` extra attempts (reference ``max_retries=3``), so
    status = 200 iff ``fail_until <= retries``; ``attempts`` records the
    attempts consumed (a real HTTP fetcher's retry loop collapses to this
    bookkeeping under a deterministic corpus)."""
    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(list(urls), type=pa.string())
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    n = len(urls)
    if n == 0:
        return {
            "status": np.empty(0, np.int32),
            "attempts": np.empty(0, np.int32),
            "span_counts": np.empty(0, np.int64),
            "kind": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string()),
            "media_ref": pa.array([], type=pa.string()),
            "offset": np.empty(0, np.int32),
        }
    parsed = pc.extract_regex(urls, _URL_PARSE_RE)
    ok = pc.is_valid(parsed).to_numpy(zero_copy_only=False)
    hi = np.full(n, -1, dtype=np.int64)
    pj = np.full(n, -1, dtype=np.int64)
    if ok.any():
        st = parsed.filter(pa.array(ok))
        hi[ok] = np.array(st.field(0).to_pylist(), dtype=np.int64)
        pj[ok] = np.array(st.field(1).to_pylist(), dtype=np.int64)
    npages = _pages_per_host(cfg)
    exists = ok & (hi >= 0) & (hi < cfg.n_hosts)
    exists[exists] &= pj[exists] < npages[hi[exists]]
    status = np.where(exists, 200, 404).astype(np.int32)
    attempts = np.ones(n, dtype=np.int32)

    if cfg.p_transient_fail > 0 and exists.any():
        he = _remix(fnv1a64(urls.take(pa.array(np.flatnonzero(exists)))) ^ _seed64(cfg))
        fr = _mix(he, 97)
        failing = (fr % _U64(1000)) < int(cfg.p_transient_fail * 1000)
        fail_until = np.where(
            failing,
            1 + ((fr >> _U64(10)) % _U64(cfg.max_fail_attempts)).astype(np.int64),
            0,
        )
        ok_after_retry = fail_until <= retries
        att = np.minimum(fail_until, retries).astype(np.int32) + 1
        attempts[exists] = att
        sub_status = np.where(ok_after_retry, 200, 503).astype(np.int32)
        status[exists] = sub_status
        # failed pages produce no spans
        still = exists.copy()
        still[exists] = ok_after_retry
        exists = still

    # --- per existing page streams ---
    e_idx = np.flatnonzero(exists)
    ne = len(e_idx)
    span_counts = np.zeros(n, dtype=np.int64)
    if ne == 0:
        return {
            "status": status,
            "attempts": attempts,
            "span_counts": span_counts,
            "kind": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string()),
            "media_ref": pa.array([], type=pa.string()),
            "offset": np.empty(0, np.int32),
        }
    H = _remix(fnv1a64(urls.take(pa.array(e_idx))) ^ _seed64(cfg))
    n_spans = (3 + (_mix(H, 1) % _U64(38))).astype(np.int64)
    mode = (_mix(H, 2) % _U64(100)).astype(np.int64)  # <30 text-only, <35 media-only
    span_counts[e_idx] = n_spans

    total = int(n_spans.sum())
    Hf = np.repeat(H, n_spans)
    hi_f = np.repeat(hi[e_idx], n_spans)
    pj_f = np.repeat(pj[e_idx], n_spans)
    mode_f = np.repeat(mode, n_spans)
    starts = np.concatenate([[0], np.cumsum(n_spans)[:-1]])
    K = (np.arange(total, dtype=np.int64) - np.repeat(starts, n_spans)).astype(np.uint64)

    r_kind = _mix(Hf, K * _U64(3) + _U64(11)) % _U64(1000)
    # doc modes: text-only (80% text / 20% link), media-only (70% image / 30%
    # link), interleaved (55% text / 20% image / 25% link)
    KIND_TEXT, KIND_IMAGE, KIND_LINK = 0, 1, 2
    kind_code = np.where(
        mode_f < 30,
        np.where(r_kind < 800, KIND_TEXT, KIND_LINK),
        np.where(
            mode_f < 35,
            np.where(r_kind < 700, KIND_IMAGE, KIND_LINK),
            np.select(
                [r_kind < 550, r_kind < 750], [KIND_TEXT, KIND_IMAGE], KIND_LINK
            ),
        ),
    )

    bigtext, toks, pool, (vstart, vlen) = _token_stream(cfg.seed)
    ntok = len(toks) - 1
    empty_start = np.int64(0)

    # ---- text content for ALL spans as (start, len) ranges into the byte
    # pool — one vectorized gather, zero per-span Python strings ----
    txt_start = np.zeros(total, dtype=np.int64)
    txt_len = np.zeros(total, dtype=np.int64)

    is_text = kind_code == KIND_TEXT
    if is_text.any():
        Ht, Kt = Hf[is_text], K[is_text]
        s = (_mix(Ht, Kt * _U64(3) + _U64(12)) % _U64(ntok - 20)).astype(np.int64)
        nw = (4 + (_mix(Ht, Kt * _U64(3) + _U64(13)) % _U64(12))).astype(np.int64)
        txt_start[is_text] = toks[s]
        txt_len[is_text] = toks[s + nw] - 1 - toks[s]

    is_image = kind_code == KIND_IMAGE
    cdn = alt_w = has_alt = None
    if is_image.any():
        Hi, Ki = Hf[is_image], K[is_image]
        cdn = (_mix(Hi, Ki * _U64(3) + _U64(14)) % _U64(4)).astype(np.int64)
        alt_r = _mix(Hi, Ki * _U64(3) + _U64(15))
        alt_w = (alt_r % _U64(len(_VOCAB))).astype(np.int64)
        has_alt = (alt_r % _U64(1000)) < 500
        txt_start[is_image] = np.where(has_alt, vstart[alt_w], empty_start)
        txt_len[is_image] = np.where(has_alt, vlen[alt_w], 0)

    is_link = kind_code == KIND_LINK
    if is_link.any():
        Hl, Kl = Hf[is_link], K[is_link]
        base = Kl * _U64(3) + _U64(16)
        anchor_w = (_mix(Hl, base + _U64(5)) % _U64(len(_VOCAB))).astype(np.int64)
        txt_start[is_link] = vstart[anchor_w]
        txt_len[is_link] = vlen[anchor_w]

    text_arr = _gather_ranges(pool, txt_start, txt_len)

    # ---- kind column: dictionary take (vectorized) ----
    kind_arr = pc.take(
        pa.array(["text", "image", "link"], type=pa.string()),
        pa.array(kind_code.astype(np.int32)),
    )

    # ---- media_ref column: Arrow string kernels (casts, lpad, joins),
    # scattered into place via one byte-pool gather ----
    ref_pieces = []
    if is_image.any():
        ii = np.flatnonzero(is_image)
        img_refs = pc.binary_join_element_wise(
            "http://cdn",
            pc.cast(pa.array(cdn), pa.string()),
            ".test/img/",
            pc.cast(pa.array(hi_f[ii]), pa.string()),
            "_",
            pc.cast(pa.array(pj_f[ii]), pa.string()),
            "_",
            pc.cast(pa.array(K[ii].astype(np.int64)), pa.string()),
            ".jpg",
            "",
        )
        ref_pieces.append((ii, img_refs))
    if is_link.any():
        li = np.flatnonzero(is_link)
        Hl, Kl = Hf[is_link], K[is_link]
        base = Kl * _U64(3) + _U64(16)
        m1 = _mix(Hl, base)            # cross-host decision + target host
        m2 = _mix(Hl, base + _U64(1))  # private/dead decision
        m3 = _mix(Hl, base + _U64(2))  # target page
        m4 = _mix(Hl, base + _U64(3))  # messy decision + variant kind
        m5 = _mix(Hl, base + _U64(4))  # variant params

        cross = (m1 % _U64(1000)) < int(cfg.p_cross_host * 1000)
        th = np.where(
            cross, (m1 >> _U64(10)) % _U64(cfg.n_hosts), hi_f[is_link].astype(np.uint64)
        ).astype(np.int64)
        r2 = m2 % _U64(1000)
        private = (r2 < int(cfg.p_private_link * 1000)).astype(bool)
        dead = (~private) & (
            r2 < int((cfg.p_private_link + cfg.p_dead_link) * 1000)
        ).astype(bool)
        np_th = npages[th]
        tp = (m3 % np_th.astype(np.uint64)).astype(np.int64)
        tp_dead = np_th + (m3 % _U64(5)).astype(np.int64)
        pv = ((m2 >> _U64(10)) % _U64(5)).astype(np.int64)
        messy = (m4 % _U64(1000)) < int(cfg.p_messy_link * 1000)
        variant = ((m4 >> _U64(10)) % _U64(5)).astype(np.int64)
        v5a = (m5 % _U64(3)).astype(np.int64)
        v5b = ((m5 >> _U64(8)) % _U64(3)).astype(np.int64)
        v5c = ((m5 >> _U64(16)) % _U64(9)).astype(np.int64)

        hostpart = pc.binary_join_element_wise(
            "h",
            pc.utf8_lpad(pc.cast(pa.array(th), pa.string()), 3, "0"),
            ".test",
            "",
        )
        page_no = np.where(private, pv, np.where(dead, tp_dead, tp))
        pathpart = pc.binary_join_element_wise(
            pc.if_else(pa.array(private), "/private/p/", "/p/"),
            pc.cast(pa.array(page_no), pa.string()),
            "",
        )
        canon = pc.binary_join_element_wise("http://", hostpart, pathpart, "")
        # messy variants, each fully vectorized
        upper_v = pc.binary_join_element_wise(
            "http://", pc.utf8_upper(hostpart), pathpart, ""
        )
        port_v = pc.binary_join_element_wise(
            "http://", hostpart, ":80", pathpart, ""
        )
        slash_v = pc.binary_join_element_wise(canon, "/", "")
        frag_v = pc.binary_join_element_wise(
            canon, "#sec", pc.cast(pa.array(v5c), pa.string()), ""
        )
        query_v = pc.binary_join_element_wise(
            canon,
            "?b=",
            pc.cast(pa.array(v5a), pa.string()),
            "&a=1&b=",
            pc.cast(pa.array(v5b), pa.string()),
            "",
        )
        target = canon
        for v, vals in enumerate([upper_v, port_v, slash_v, frag_v, query_v]):
            mask = pa.array(messy & (variant == v))
            target = pc.if_else(mask, vals, target)
        ref_pieces.append((li, target))

    ref_arr = _compose_scatter(total, ref_pieces)

    return {
        "status": status,
        "attempts": attempts,
        "span_counts": span_counts,
        "kind": kind_arr,
        "text": text_arr,
        "media_ref": ref_arr,
        "offset": K.astype(np.int32),
    }


def fetch_page(cfg: SynthWebConfig, url_canon: str, retries: int = 3):
    """Scalar fetch (oracle interface): (status, [(kind, text, media_ref,
    offset), ...]). Thin wrapper over the vectorized fetch_pages — batch
    composition cannot change page content (pure per-URL streams)."""
    out = fetch_pages(cfg, [url_canon], retries=retries)
    status = int(out["status"][0])
    spans = [
        (k, t, r, int(o))
        for k, t, r, o in zip(
            out["kind"].to_pylist(),
            out["text"].to_pylist(),
            out["media_ref"].to_pylist(),
            out["offset"],
        )
    ]
    return status, spans


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
        if cfg.slow_host_delay > 0 and i % 11 == 3:
            delay = cfg.slow_host_delay
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
    urls, prios, depths = [], [], []
    for i in range(min(cfg.n_seeds, cfg.n_hosts)):
        u = cfg.url(i, 0)
        urls.append(u)
        prios.append(1.0)
        depths.append(0)
        m = int(_mix(np.array([_seed64(cfg)]), np.uint64(1000 + i))[0])
        if m % 2 == 0:  # duplicate seed as a messy variant
            v = (m >> 8) % 4
            host, rest = u.split("//", 1)[1].split("/", 1)
            variant = [
                f"http://{host.upper()}/{rest}",
                f"http://{host}:80/{rest}",
                f"{u}/",
                f"{u}#top",
            ][v]
            urls.append(variant)
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

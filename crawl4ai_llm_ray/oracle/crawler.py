"""Single-process oracle crawler.

Implements the crawl contract (see state/frontier.py docstring) with plain
Python dicts/heaps/sets — deliberately sharing only the *specs* with the Ray
engine (canonicalize_url scalar spec, fnv1a64_scalar, fetch_page, robots
rules, the deterministic ordering formulas) while using an entirely
independent queue/seen-set/metrics implementation.  The engine must reproduce
this oracle's outputs exactly:

  * golden_docs: per-url span sequences (kind, text, media_ref, offset) —
    the per-row span-sequence-equality invariant (BASELINE.json:input_hint);
  * golden_order: (seq, url_canon, wave, host, scheduled_t);
  * golden_seen: the final URL-seen hash set;
  * golden_metrics: per-(partition, wave) offered/admitted/deduped/
    robots_blocked/fetched counters.

The politeness budget mirrors the reference crawler contract: ≥ delay seconds
between same-host requests (``/root/reference/crawl4ai_llm/config.py:56``,
``delay: 1.0``), duplicate URLs rejected exactly once
(``/root/reference/crawl4ai_llm/storage/json_storage.py:196-197``).
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict

from ..functions.hashing import fnv1a64_scalar
from ..functions.urlnorm import canonicalize_url
from ..sources.synth import SynthWebConfig, fetch_page, robots_rules, seed_table
from ..stages.canonicalize import salted_partition_scalar


def oracle_crawl(
    cfg: SynthWebConfig,
    n_partitions: int = 8,
    wave_duration: float = 8.0,
    max_waves: int | None = None,
    salted_hosts: dict[str, int] | None = None,
):
    """Returns dict with keys: docs (url_canon → list of span tuples),
    order (list of (seq, url_canon, wave, host, scheduled_t)),
    seen (sorted list of url hashes),
    metrics ({(partition_id, wave): {offered, admitted, deduped,
    robots_blocked, fetched}})."""
    robots = robots_rules(cfg)
    seen: set[int] = set()
    queues: dict[str, list] = {}
    docs: dict[str, list] = {}
    order_rows: list[tuple] = []
    metrics: dict[tuple[int, int], dict] = defaultdict(
        lambda: {"offered": 0, "admitted": 0, "deduped": 0, "robots_blocked": 0, "fetched": 0}
    )

    salted_hosts = salted_hosts or {}

    def partition_of(host: str, h: int) -> int:
        return salted_partition_scalar(host, h, n_partitions, salted_hosts)

    def qkey_of(host: str, h: int) -> str:
        s_count = salted_hosts.get(host, 1)
        return host if s_count <= 1 else f"{host}#{h % s_count}"

    def offer(items: list[tuple[str, float, int]], wave_label: int) -> None:
        """items: (raw_url, priority, depth). wave_label attributes metrics."""
        # canonicalize + drop invalid, then in-batch dedup keeping max priority
        canon_items: dict[int, tuple[str, float, int, str]] = {}
        counts_by_part: dict[int, int] = defaultdict(int)
        for raw, prio, depth in items:
            c = canonicalize_url(raw)
            if c is None:
                continue
            h = fnv1a64_scalar(c)
            host = c.split("//", 1)[1].split("/", 1)[0]
            counts_by_part[partition_of(host, h)] += 1
            cur = canon_items.get(h)
            if cur is None or prio > cur[1]:
                canon_items[h] = (c, prio, depth, host)
        for p, n in counts_by_part.items():
            metrics[(p, wave_label)]["offered"] += n
        # count in-batch duplicate occurrences per partition
        occurrence: dict[int, int] = defaultdict(int)
        for raw, prio, depth in items:
            c = canonicalize_url(raw)
            if c is None:
                continue
            h = fnv1a64_scalar(c)
            occurrence[h] += 1
        for h, cnt in occurrence.items():
            if cnt > 1:
                host = canon_items[h][3]
                metrics[(partition_of(host, h), wave_label)]["deduped"] += cnt - 1

        for h, (c, prio, depth, host) in canon_items.items():
            p = partition_of(host, h)
            m = metrics[(p, wave_label)]
            if h in seen:
                m["deduped"] += 1
                continue
            prefixes, _delay = robots.get(host, ((), 1.0))
            path = "/" + (c.split("/", 3)[3] if c.count("/") >= 3 else "")
            if prefixes and any(path.startswith(pref) for pref in prefixes):
                m["robots_blocked"] += 1
                seen.add(h)
                continue
            seen.add(h)
            m["admitted"] += 1
            heapq.heappush(queues.setdefault(qkey_of(host, h), []), (-prio, h, c, depth))

    # seeds → metrics wave 0
    seeds = seed_table(cfg)
    offer(
        list(
            zip(
                seeds["url"].to_pylist(),
                seeds["priority"].to_pylist(),
                seeds["depth"].to_pylist(),
            )
        ),
        wave_label=0,
    )

    t = 0
    while any(queues.values()) and (max_waves is None or t < max_waves):
        wave_start = t * wave_duration
        wave_rows = []
        for qkey in sorted(k for k, q in queues.items() if q):
            host, _, saltpart = qkey.partition("#")
            q = queues[qkey]
            delay = robots.get(host, ((), 1.0))[1]
            # politeness stride (see frontier.py contract): delay > wave
            # duration ⇒ fetch only every ceil(delay/wave_duration)-th wave
            stride = math.ceil(delay / wave_duration)
            if stride > 1 and t % stride != 0:
                continue
            budget = max(1, int(wave_duration // delay))
            if saltpart:
                # rotate by fetch opportunity (see frontier.py): t-rotation
                # aliases with the politeness stride and starves sub-queues
                s_count = salted_hosts.get(host, 1)
                offset = (int(saltpart) + t // stride) % s_count
                slots = list(range(offset, budget, s_count))
            else:
                slots = list(range(budget))
            k = 0
            while q and k < len(slots):
                negp, h, c, depth = heapq.heappop(q)
                sched = wave_start + slots[k] * delay
                wave_rows.append((sched, host, h, c, depth))
                k += 1
        wave_rows.sort(key=lambda r: (r[0], r[1], r[2]))
        discovered: list[tuple[str, float, int]] = []
        for sched, host, h, c, depth in wave_rows:
            metrics[(partition_of(host, h), t)]["fetched"] += 1
            status, spans = fetch_page(cfg, c)
            docs[c] = spans
            order_rows.append((c, t, host, sched))
            for kind, _text, ref, _off in spans:
                if kind == "link":
                    discovered.append((ref, 1.0 / (2.0 + depth), depth + 1))
        # links discovered during wave t are attributed to metrics wave t+1
        offer(discovered, wave_label=t + 1)
        t += 1

    order = [
        (i, c, w, host, sched) for i, (c, w, host, sched) in enumerate(order_rows)
    ]
    return {
        "docs": docs,
        "order": order,
        "seen": sorted(seen),
        "metrics": {k: dict(v) for k, v in metrics.items()},
        "n_waves": t,
    }

"""Fetch + span-decomposition stage.

A ``map_batches`` worker over WAVE_SCHEMA batches: "fetches" each URL (against
the deterministic synthetic web — the fetcher interface takes any
``fetch_fn(url_canon) -> (status, spans)``, so a real HTTP fetcher slots in
later), decomposes pages into the interleaved ``(kind, text, media_ref,
offset)`` span records (BASELINE.json:input_hint), and — the streaming part —
extracts discovered links, canonicalizes+hashes+routes them, and offers them
back to the frontier shard actors *from inside the stage*, so links loop back
without a second pass over fetched data.

Link priority is a pure function of discovery depth (1/(1+depth)) — see
frontier.py's determinism contract.

This replaces the reference's implied crawl loop (external ``crawl4ai`` dep;
contract at ``/root/reference/crawl4ai_llm/config.py:35-62``) and its
"extract → ProductData(title, images[position])" interleaved record model
(``/root/reference/crawl4ai_llm/models.py:32-77``).
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa

from ..schema import FETCHED_SCHEMA
from ..sources.synth import SynthWebConfig, fetch_pages
from .canonicalize import canonicalize_batch


class FetcherWorker:
    """Callable for map_batches. Used as a stateless task via
    ``functools.partial``-style construction per wave, or as an actor pool
    (callable class) — state here is only the config + shard handles, both
    cheap and immutable."""

    def __init__(
        self,
        synth_cfg: SynthWebConfig,
        shards=None,
        n_partitions: int = 1,
        max_retries: int = 3,
        salted_hosts: dict[str, int] | None = None,
        fetch_fn=None,
    ):
        self.cfg = synth_cfg
        self.shards = shards  # list[ActorHandle] | None (no loopback)
        self.n_partitions = n_partitions
        self.max_retries = max_retries  # reference CrawlerConfig.max_retries
        self.salted_hosts = salted_hosts
        # pluggable transport: fetch_fn(urls, retries) -> page-batch dict
        # (stages/http_fetch.HttpFetchFn is the real-HTTP implementation;
        # None = the deterministic synthetic web)
        self.fetch_fn = fetch_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import SPAN_STRUCT

        n = batch.num_rows
        if self.fetch_fn is not None:
            out = self.fetch_fn(batch["url_canon"], self.max_retries)
        else:
            out = fetch_pages(self.cfg, batch["url_canon"], retries=self.max_retries)

        # assemble the spans list<struct> column from the flat batch arrays
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(out["span_counts"], out=offsets[1:])
        struct = pa.StructArray.from_arrays(
            [
                out["kind"],
                out["text"],
                out["media_ref"],
                pa.array(out["offset"], type=pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        spans = pa.ListArray.from_arrays(pa.array(offsets), struct)

        # discovered links (vectorized): child depth = parent depth + 1
        if self.shards is not None and len(out["kind"]):
            import pyarrow.compute as pc

            link_mask = pc.equal(out["kind"], "link").to_numpy(zero_copy_only=False)
            if link_mask.any():
                parent = np.repeat(np.arange(n), out["span_counts"])
                depths = batch["depth"].to_numpy(zero_copy_only=False)
                refs = out["media_ref"].filter(pa.array(link_mask))
                d = depths[parent[link_mask]].astype(np.int32) + 1
                self._offer_links(refs, d)

        import pyarrow.compute as pc

        doc_id = pc.binary_join_element_wise(
            "url_", pc.cast(batch["url_hash"], pa.string()), ""
        )
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        fetched_at = pa.array(
            np.full(n, np.datetime64(now, "us")), type=pa.timestamp("us")
        )
        return pa.table(
            {
                "doc_id": doc_id,
                "url_canon": batch["url_canon"],
                "url_hash": batch["url_hash"],
                "host": batch["host"],
                "wave": batch["wave"],
                "depth": batch["depth"],
                "priority": batch["priority"],
                "scheduled_t": batch["scheduled_t"],
                "status": pa.array(out["status"]),
                "attempts": pa.array(out["attempts"]),
                "spans": spans,
                "fetched_at": fetched_at,
            },
            schema=FETCHED_SCHEMA,
        )

    def _offer_links(self, out_urls: pa.Array, out_depths: np.ndarray) -> None:
        import ray

        link_tbl = pa.table(
            {
                "url": out_urls,
                "depth": pa.array(out_depths.astype(np.int32)),
                "priority": pa.array(
                    (1.0 / (1.0 + out_depths.astype(np.float32))).astype(np.float32)
                ),
            }
        )
        routed = canonicalize_batch(
            link_tbl, self.n_partitions, salted_hosts=self.salted_hosts
        )
        pid = routed["partition_id"].to_numpy(zero_copy_only=False)
        refs = []
        for p in np.unique(pid):
            sub = routed.filter(pa.array(pid == p))
            refs.append(self.shards[int(p)].offer.remote(sub))
        # synchronous: offers must land before the wave barrier; this also
        # backpressures the fetch stage against a slow frontier shard
        ray.get(refs)

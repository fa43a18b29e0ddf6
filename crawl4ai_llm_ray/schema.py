"""Arrow schemas for the engine (see FIXTURES.md and BASELINE.json:input_hint).

The authoritative document model generalizes the reference's ``ProductData``
(text fields + ordered media list, ``/root/reference/crawl4ai_llm/models.py:32-77``)
into an interleaved span table: one row per document, ``spans`` an ordered list
of ``(kind, text, media_ref, offset)`` structs.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "image" | "link"
        ("text", pa.string()),       # text content or alt text; "" for pure media
        ("media_ref", pa.string()),  # canonical URL of media/link target; "" for text
        ("offset", pa.int32()),      # monotone position within the document
    ]
)

# F1 — interleaved document table (BASELINE.json:input_hint)
DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Engine-internal fetched-document table (doc table + crawl provenance)
FETCHED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url_canon", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("wave", pa.int32()),
        ("depth", pa.int32()),
        ("priority", pa.float32()),
        ("scheduled_t", pa.float64()),   # virtual politeness clock (s since crawl start)
        ("status", pa.int32()),          # 200 | 404 | 503 (retries exhausted)
        ("attempts", pa.int32()),        # fetch attempts consumed (retry contract)
        ("spans", pa.list_(SPAN_STRUCT)),
        ("fetched_at", pa.timestamp("us")),
    ]
)

# F2 — seed / frontier table
SEED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
    ]
)

# Canonicalized frontier rows (after the canonicalize+hash map_batches)
FRONTIER_SCHEMA = pa.schema(
    [
        ("url_canon", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("partition_id", pa.int32()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
    ]
)

# Wave table emitted by frontier shards (input to the fetch stage)
WAVE_SCHEMA = pa.schema(
    [
        ("url_canon", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("partition_id", pa.int32()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
        ("wave", pa.int32()),
        ("scheduled_t", pa.float64()),
    ]
)

# F4 — robots / politeness per host
ROBOTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("disallow_prefixes", pa.list_(pa.string())),
        ("crawl_delay_s", pa.float32()),
    ]
)

# Per-partition metrics (north_rule: per-partition fetch/dedup metrics)
METRICS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("wave", pa.int32()),
        ("offered", pa.int64()),
        ("admitted", pa.int64()),
        ("deduped", pa.int64()),
        ("robots_blocked", pa.int64()),
        ("fetched", pa.int64()),
    ]
)

GOLDEN_ORDER_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("url_canon", pa.string()),
        ("wave", pa.int32()),
        ("host", pa.string()),
        ("scheduled_t", pa.float64()),
    ]
)

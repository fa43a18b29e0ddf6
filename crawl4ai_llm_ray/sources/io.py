"""Format-agnostic dataset IO.

The north star stores document tables as **Lance** datasets; ``pylance`` is
not installed in this sandbox, so every path goes through a format switch:
``lance`` when importable, else parquet with identical layout semantics
(directory of fragments, resumable). The engine code is format-agnostic —
call ``write_dataset`` / ``read_dataset`` and the switch picks the backend
(reference storage layout analog: SURVEY §1.3 "stored as a Lance dataset;
Parquet fallback").

Also provides the JSON-compat codec: the reference persists records as
schemaless JSON dicts (``/root/reference/crawl4ai_llm/storage/json_storage.py:
92-102``); these readers/writers bridge that world into Arrow datasets.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def storage_format(requested: str = "auto") -> str:
    if requested == "auto":
        return "lance" if HAVE_LANCE else "parquet"
    if requested == "lance" and not HAVE_LANCE:
        raise RuntimeError("pylance not installed; use format='parquet' or 'auto'")
    return requested


def write_dataset(ds, path: str, format: str = "auto", **kwargs):
    """Write a ray.data.Dataset as a Lance dataset (when available) or a
    parquet fragment directory (resumable layout either way)."""
    fmt = storage_format(format)
    if fmt == "lance":
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)
    return path


def read_dataset(path: str, format: str = "auto", columns=None, **kwargs):
    import ray.data as rd

    fmt = storage_format(format)
    if fmt == "lance" and os.path.exists(os.path.join(path, "_versions")):
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


# ------------------------------------------------------- JSON compat codec
def read_json_records(path: str):
    """Read reference-style JSON record files (one dict per file in a
    directory, or .jsonl) into a Dataset of (id, payload) rows."""
    import ray.data as rd

    if os.path.isdir(path):
        rows = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".json"):
                with open(os.path.join(path, name)) as f:
                    rec = json.load(f)
                rows.append(
                    {"id": str(rec.get("id", name[:-5])), "payload": json.dumps(rec)}
                )
        return rd.from_items(rows)
    return rd.read_json(path)


def json_payload_to_columns(ds, fields: list[str]):
    """Project JSON payload rows to typed columns (vectorized pandas JSON
    parse per batch) — the compat boundary decode (SURVEY §2.8 json.load)."""
    import pandas as pd

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        recs = [json.loads(p) for p in df["payload"]]
        out = {"id": df["id"].values}
        for f in fields:
            out[f] = [r.get(f) for r in recs]
        return pd.DataFrame(out)

    return ds.map_batches(decode, batch_format="pandas")


def write_json_records(ds, path: str):
    """Dataset → directory of JSON-lines files (reference-format export)."""
    ds.write_json(path)
    return path

"""Multimodal column handling: opaque binary payloads + typed metadata, with
decode/feature-extraction as an actor-pool map_batches stage.

The reference's media model is ``ProductImage{url, alt, position}``
(``/root/reference/crawl4ai_llm/models.py:24-29``) — references only. This
module carries actual payload bytes through Arrow ``binary`` columns the way a
real 100 TB image/audio corpus would: small batch sizes (payloads are wide),
actor pool so any codec/model loads once per actor, and a STUBBED decoder —
the image/audio libraries are not in this container, so ``PayloadDecoder``
falls back to a deterministic fake decode (documented below); the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def synth_media_table(sf_dir: str):
    """Derive a deterministic fake-media dataset from the documents table:
    payload = UTF-8 bytes of the text (stands in for encoded image bytes),
    plus typed metadata (media_kind, declared width/height from the content
    hash). One row per doc."""
    import ray.data as rd

    from ..functions.hashing import fnv1a64

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        h = fnv1a64(t["text"])
        width = (h % np.uint64(640)).astype(np.int32) + 64
        height = ((h >> np.uint64(32)) % np.uint64(480)).astype(np.int32) + 64
        payload = t["text"].cast(pa.binary())
        kind = pa.array(
            np.where(h % np.uint64(4) == 0, "audio", "image"), type=pa.string()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media_kind": kind,
                "width": pa.array(width),
                "height": pa.array(height),
                "payload": payload,
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


class PayloadDecoder:
    """Actor-pool stage: decode + feature-extract media payloads.

    __init__ loads the (stubbed) codec ONCE per actor — the pattern a real
    model/codec load follows. __call__ is per batch. With real libraries
    installed, `_decode_real` would do PIL/librosa work; here it raises
    NotImplementedError and the deterministic fake path (byte statistics as
    "features") runs instead, keeping output shape and determinism real.
    """

    def __init__(self, target_size: int = 64):
        self.target_size = target_size
        try:  # real decoder path — not available in this container
            import PIL.Image  # noqa: F401

            self._have_codec = True
        except ImportError:
            self._have_codec = False

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "real image/audio decode requires PIL/librosa — not installed; "
            "the deterministic fake decode below keeps the pipeline testable"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        # deterministic "decoded" byte histogram features
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            b = np.zeros(1, dtype=np.uint8)
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats_mean = np.empty(batch.num_rows)
        feats_std = np.empty(batch.num_rows)
        n_bytes = np.empty(batch.num_rows, dtype=np.int64)
        payloads = batch["payload"].to_pylist()
        for i, p in enumerate(payloads):
            b = self._decode_fake(p)
            feats_mean[i] = round(float(b.mean()), 4)
            feats_std[i] = round(float(b.std()), 4)
            n_bytes[i] = len(p)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_kind": batch["media_kind"],
                "n_bytes": pa.array(n_bytes),
                "byte_mean": pa.array(feats_mean),
                "byte_std": pa.array(feats_std),
            }
        )


def media_features(sf_dir: str):
    """Decode/feature-extract over the fake-media table: actor pool (codec
    loaded once per actor), small batches (payload columns are wide)."""
    media = synth_media_table(sf_dir)
    return media.map_batches(
        PayloadDecoder,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows → small batches
        concurrency=2,
        num_cpus=1,
    )


def media_resize_plan(sf_dir: str):
    """Frame/resize planning stage (pure metadata math, vectorized): compute
    the output geometry for a 256px-max resize without touching payloads —
    the kind of pre-pass a real pipeline runs to budget decode cost."""
    media = synth_media_table(sf_dir)

    def plan(t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = t["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, 256.0 / np.maximum(w, h))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "out_w": pa.array((w * scale).astype(np.int32)),
                "out_h": pa.array((h * scale).astype(np.int32)),
            }
        )

    return media.map_batches(plan, batch_format="pyarrow")

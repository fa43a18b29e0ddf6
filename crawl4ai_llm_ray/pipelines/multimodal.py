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

    def __init__(self, target_size: int = 64, model_settings=None):
        self.target_size = target_size
        # engine.ModelSettings (reference LLMConfig analog): cache_dir is
        # where a real decoder would memoize decoded frames/features
        self.cache_dir = model_settings.cache_dir if model_settings is not None else None
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

    @staticmethod
    def _round_half_away_vec(x: np.ndarray, nd: int = 4) -> np.ndarray:
        # SQL-compatible rounding (DuckDB rounds half away from zero; Python/
        # numpy round half to even — 93.90625 would diverge at 4 decimals)
        scale = 10.0 ** nd
        return np.where(
            x == 0, 0.0, np.floor(np.abs(x) * scale + 0.5) / scale * np.sign(x)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fake-decode path vectorized batch-wide: byte mean/std straight off
        # the Arrow binary column's value buffer + offsets (zero per-row
        # Python). The fake path runs even when the codec imports
        # (self._have_codec) — determinism + oracle parity are the test
        # contract; _decode_real is the per-item socket a real deployment
        # swaps in, and a real codec loop belongs there.
        col = batch["payload"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # binary uses int32 offsets, large_binary int64 — reading int64
        # offsets as int32 pairs would silently corrupt every span
        off_dtype = (
            np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        )
        offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        starts, ends = offs[:-1], offs[1:]
        lens = (ends - starts).astype(np.int64)
        eff = np.where(lens > 0, lens, 1).astype(np.int64)  # empty → [0]
        # EXACT integer sums (cumsum in int64 — float cumsums accumulate
        # rounding across the batch buffer and E[x²]−mean² cancels badly for
        # low-variance payloads; the integer identity n·Σx²−(Σx)² removes
        # the whole float-divergence class, and the single IEEE division +
        # sqrt below are correctly rounded hence bit-identical to the SQL
        # twin computing the same integers)
        di = data.astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(di)])
        cs2 = np.concatenate([[0], np.cumsum(di * di)])
        sx = cs[ends] - cs[starts]
        sx2 = cs2[ends] - cs2[starts]
        means = sx / eff
        # n·Σx²−(Σx)² overflows int64 once eff·sx2 > 2^63 (payloads beyond
        # ~10 MB: eff²·255² > 2^63) — route oversized rows through exact
        # Python big-ints (rare by construction: payload rows are capped by
        # batch sizing long before 10 MB, so the loop is cold)
        big = lens > 10_000_000
        var = np.zeros(len(lens), dtype=np.float64)
        small = ~big
        var[small] = (
            eff[small] * sx2[small] - sx[small] * sx[small]
        ) / (eff[small] * eff[small])  # ≥ 0 exactly (ints)
        for i in np.flatnonzero(big):
            e, s1, s2 = int(eff[i]), int(sx[i]), int(sx2[i])
            var[i] = (e * s2 - s1 * s1) / (e * e)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_kind": batch["media_kind"],
                "n_bytes": pa.array(ends - starts),
                "byte_mean": pa.array(self._round_half_away_vec(means)),
                "byte_std": pa.array(self._round_half_away_vec(np.sqrt(var))),
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


def media_chunks(sf_dir: str, chunk_bytes: int = 64):
    """Audio-style chunking: split each payload into fixed-size windows →
    one row per (doc_id, chunk_idx) with the chunk's byte span — the
    frame/segment-sampling stage shape (vectorized explode, no payload
    copies beyond the slice table)."""
    import pyarrow.compute as pc

    media = synth_media_table(sf_dir)

    def chunk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # np.repeat([0], []) broadcast-crashes below
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int32()),
                    "begin": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        lens = pc.binary_length(t["payload"]).to_numpy(zero_copy_only=False)
        n_chunks = np.maximum(1, -(-lens // chunk_bytes))  # ceil div
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(t.num_rows), n_chunks)
        starts = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        idx = np.arange(int(n_chunks.sum())) - np.repeat(starts, n_chunks)
        begin = idx * chunk_bytes
        end = np.minimum(begin + chunk_bytes, lens[parent])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[parent]),
                "chunk_idx": pa.array(idx.astype(np.int32)),
                "begin": pa.array(begin.astype(np.int64)),
                "n_bytes": pa.array((end - begin).astype(np.int64)),
            }
        )

    return media.map_batches(chunk, batch_format="pyarrow")


class TextEmbedder:
    """Actor-pool 'model inference' stage: deterministic stub embedding model
    (hashed token n-gram projection into d dims, L2-normalized). The real
    pattern: the projection matrix ('model weights') is built ONCE per actor
    in __init__; __call__ embeds a batch with one matmul. Swap _embed for a
    real encoder and nothing else changes."""

    def __init__(
        self,
        dim: int = 32,
        vocab_hash_dim: int = 256,
        seed: int = 42,
        model_settings=None,
    ):
        from ..functions.hashing import fnv1a64_scalar
        from ..state.bloom import _remix

        if model_settings is not None:
            # engine.ModelSettings (reference LLMConfig analog): the model
            # name seeds the deterministic stub — a real encoder would build
            # its provider client from the same fields here (once per actor)
            seed = fnv1a64_scalar(f"model|{model_settings.model}") % (1 << 31)
            dim = int(model_settings.options.get("dim", dim))
            vocab_hash_dim = int(model_settings.options.get("vocab_hash_dim", vocab_hash_dim))
        self.model_settings = model_settings
        self.dim = dim
        self.vh = vocab_hash_dim
        # LLM response-cache analog (reference LLMConfig.cache_dir,
        # config.py:87): memoize embeddings by content hash, once per actor.
        # A real provider client would key API responses the same way and
        # spill to model_settings.cache_dir; the stub keeps it in-actor.
        self._cache: dict[int, np.ndarray] = {}
        self.cache_hits = 0
        self.cache_misses = 0
        raw = _remix(
            (np.arange(vocab_hash_dim * dim, dtype=np.uint64) + np.uint64(1))
            * np.uint64(fnv1a64_scalar(f"embed|{seed}") | 1)
        )
        # NB: divide by a float — float64_array / (python int 2**64) silently
        # produces an OBJECT array on this numpy
        self.proj = (raw.astype(np.float64) / 2.0**64 - 0.5).reshape(vocab_hash_dim, dim)

    def _embed(self, texts: list[str]) -> np.ndarray:
        """Batch embedding: one flatten + one hash pass + one flat bincount
        scatter + ONE matmul for the whole batch (no per-doc loop)."""
        import itertools
        import re

        from ..functions.hashing import fnv1a64

        n = len(texts)
        token_re = re.compile(r"[a-z0-9]+")
        toks = [token_re.findall(t.lower()) for t in texts]
        per_doc = np.array([len(x) for x in toks], dtype=np.int64)
        vecs = np.zeros((n, self.dim))
        if per_doc.sum():
            flat = list(itertools.chain.from_iterable(toks))
            h = (fnv1a64(flat) % np.uint64(self.vh)).astype(np.int64)
            di = np.repeat(np.arange(n, dtype=np.int64), per_doc)
            C = (
                np.bincount(di * self.vh + h, minlength=n * self.vh)
                .reshape(n, self.vh)
                .astype(np.float64)
            )
            V = C @ self.proj
            norms = np.linalg.norm(V, axis=1, keepdims=True)
            vecs = V / np.where(norms > 0, norms, 1.0)
        return vecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64

        n_rows = batch.num_rows
        texts = batch["text"].to_pylist()
        keys = fnv1a64(batch["text"])
        vecs = np.zeros((n_rows, self.dim))
        miss: list[int] = []
        for i in range(n_rows):
            v = self._cache.get(int(keys[i]))
            if v is None:
                miss.append(i)
            else:
                vecs[i] = v
        self.cache_hits += n_rows - len(miss)
        self.cache_misses += len(miss)
        if miss:
            V = self._embed([texts[i] for i in miss])
            if len(self._cache) > 200_000:  # bound per-actor memory
                self._cache.clear()
            for j, i in enumerate(miss):
                vecs[i] = V[j]
                self._cache[int(keys[i])] = V[j]
        flat_vals = vecs.astype(np.float32).ravel()
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(n_rows + 1, dtype=np.int32) * self.dim),
            pa.array(flat_vals),
        )
        return pa.table({"doc_id": batch["doc_id"], "embedding": emb})


def text_embeddings(sf_dir: str):
    """documents → stub-model embeddings: actor pool, weights loaded once per
    actor, batched 'inference' (rows-only; the model is a stand-in)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        TextEmbedder, batch_format="pyarrow", batch_size=1024, concurrency=2, num_cpus=1
    )


def media_resize_plan(sf_dir: str):
    """Frame/resize planning stage (pure metadata math, vectorized): compute
    the output geometry for a 256px-max resize without touching payloads —
    the kind of pre-pass a real pipeline runs to budget decode cost."""
    media = synth_media_table(sf_dir)

    def plan(t: pa.Table) -> pa.Table:
        # EXACT integer geometry: floor(dim * 256.0/maxdim) in float truncates
        # the max side to 255 for 27 of the possible sizes (256/322*322 =
        # 255.999…); round-half-up integer division keeps the contract that
        # the longer side comes out exactly 256
        w = t["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        mx = np.maximum(w, h)
        need = mx > 256
        out_w = np.where(need, (w * 512 + mx) // (2 * mx), w)
        out_h = np.where(need, (h * 512 + mx) // (2 * mx), h)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "out_w": pa.array(out_w.astype(np.int32)),
                "out_h": pa.array(out_h.astype(np.int32)),
            }
        )

    return media.map_batches(plan, batch_format="pyarrow")

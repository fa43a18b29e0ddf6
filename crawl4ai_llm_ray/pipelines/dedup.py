"""Deduplication suite over the documents table — exact, n-gram Jaccard,
MinHash+LSH, SimHash, and embedding-cosine near-dup. The scale-critical
components of a training-data pipeline (each documented with its 100 TB
shuffle strategy).

The frontier's URL-level exact dedup lives in state/frontier.py; these are the
*content-level* dedup operators (the reference has only id-equality dedup,
``/root/reference/crawl4ai_llm/storage/json_storage.py:196-197`` — SURVEY
§2.7 notes near-dup as an engine extension).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

from ..functions.hashing import fnv1a64
from ..state.bloom import _remix

_TOKEN_RE = re.compile(r"[a-z0-9]+")

N_MINHASH = 64
N_BANDS = 8  # 8 bands x 8 rows → catches Jaccard ≳ 0.5 w.h.p.
_MINHASH_SEEDS = np.arange(1, N_MINHASH + 1, dtype=np.uint64) * np.uint64(
    0x9E3779B97F4A7C15
)


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return []
    return list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    sh = _shingles(text, n)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return fnv1a64(pa.array(sh, type=pa.string()))


def _shingle_hashes_positional(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """n-gram shingle hashes IN POSITION ORDER for a whole batch: tokenize
    per doc (C regex), build all n-grams with Arrow take+join over the
    flattened token stream, hash once. Returns (doc_idx, hashes) flat and
    position-ordered per doc, one row per shingle OCCURRENCE (the winnowing
    family needs the rolling sequence; the dedup family dedups below)."""
    import itertools

    toks = [_TOKEN_RE.findall(t.lower()) for t in texts]
    counts = np.array([len(x) for x in toks], dtype=np.int64)
    flat = pa.array(list(itertools.chain.from_iterable(toks)), type=pa.string())
    starts = np.concatenate([[0], np.cumsum(counts)])
    ntri = np.maximum(0, counts - (n - 1))
    total_tri = int(ntri.sum())
    if total_tri == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    tri_doc = np.repeat(np.arange(len(toks)), ntri)
    tri_starts = np.concatenate([[0], np.cumsum(ntri)[:-1]])
    local = np.arange(total_tri) - np.repeat(tri_starts, ntri)
    g = starts[tri_doc] + local
    cols = [flat.take(pa.array(g + k)) for k in range(n)]
    tri = pc.binary_join_element_wise(*cols, " ")
    return tri_doc, fnv1a64(tri)


def _shingle_hashes_batch(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Distinct n-gram shingle hashes for a whole batch of texts in one
    vectorized pass (positional pass + per-doc dedup).

    Returns (doc_idx, hashes): flat arrays sorted by (doc_idx, hash), one row
    per DISTINCT shingle per doc. ~5x faster than per-doc hashing."""
    tri_doc, h = _shingle_hashes_positional(texts, n)
    if len(h) == 0:
        return tri_doc, h
    order = np.lexsort((h, tri_doc))
    td, hs = tri_doc[order], h[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (td[1:] != td[:-1]) | (hs[1:] != hs[:-1])
    return td[first], hs[first]


# ----------------------------------------------------------------- exact dedup
def exact_survivors(docs, num_partitions: int = 32):
    """(doc_id) of the exact-dedup SURVIVORS (min doc_id per text) over any
    (doc_id, text) Dataset — THE exact-content-dedup contract, shared by
    dedup_exact_text and text.curation_over (one implementation so the
    collision handling / partition key cannot drift between the two). The
    canonical hash-partition + per-group-first pattern: rows are routed by
    the 64-bit content hash (so the shuffle key is narrow and never skewed),
    but the per-partition group key is (hash, text) — full text equality is
    confirmed within hash groups, so a hash collision between distinct texts
    cannot merge their groups (exactness vs the GROUP BY text oracle)."""

    def key(t: pa.Table) -> pa.Table:
        k = fnv1a64(t["text"])
        return pa.table(
            {
                "k": pa.array(k.view(np.int64)),
                "kp": pa.array((k % np.uint64(num_partitions)).astype(np.int64)),
                "text": t["text"],
                "doc_id": t["doc_id"],
            }
        )

    def min_per_part(t: pa.Table) -> pa.Table:
        # (k, text): k leads so the hash-groupby stays cheap; text breaks
        # the (astronomically rare, but oracle-visible) 64-bit collisions.
        # Arrow hash aggregation — the wide text column never converts to
        # pandas objects.
        g = t.group_by(["k", "text"]).aggregate([("doc_id", "min")])
        return pa.table({"doc_id": g["doc_id_min"]})

    return (
        docs.map_batches(key, batch_format="pyarrow")
        .groupby("kp")
        .map_groups(min_per_part, batch_format="pyarrow")
    )


def dedup_exact_text(sf_dir: str, num_partitions: int = 32):
    """Exact dedup on full content over the documents table — see
    :func:`exact_survivors` for the contract and scale shape."""
    return exact_survivors(_read_docs(sf_dir), num_partitions)


def dedup_exact_prefix(sf_dir: str, n_tokens: int = 5):
    """Exact dedup on a first-N-tokens prefix key (produces real duplicate
    groups on this corpus). Same shape as dedup_exact_text."""
    ds = _read_docs(sf_dir)

    def key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized prefix key: lowercase → collapse non-alnum runs to one
        # space → trim → first n_tokens via one Arrow regex extract. Same
        # value as " ".join(findall([a-z0-9]+)[:n]) without per-row Python.
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t["text"]), "[^a-z0-9]+", " "
            )
        )
        pref = pc.extract_regex(
            norm, rf"^(?P<p>(?:[a-z0-9]+ ){{0,{n_tokens - 1}}}[a-z0-9]+)"
        )
        k = pc.fill_null(pc.struct_field(pref, "p"), "")
        return pa.table({"k": k, "doc_id": t["doc_id"]})

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


# ------------------------------------------------------- exact n-gram Jaccard
_PAIR_EMPTY = pd.DataFrame(
    {
        "a": np.empty(0, np.int64),
        "b": np.empty(0, np.int64),
        "nsh_a": np.empty(0, np.int64),
        "nsh_b": np.empty(0, np.int64),
        "inter": np.empty(0, np.int64),
        "ap": np.empty(0, np.int64),
    }
)


def ngram_jaccard_pairs(
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.4,
    n_shingle_parts: int = 32,
    n_pair_parts: int = 32,
    max_shingle_df: int | None = None,
):
    """ALL document pairs with 3-gram-shingle Jaccard ≥ threshold, computed
    exactly and fully distributed — no driver materialization, no
    single-partition funnel:

      explode (sh, doc_id, nsh)  [nsh = the doc's shingle-set size, carried
                                  in-row so the Jaccard union needs no
                                  broadcast side at all]
      → groupby(sh % n_shingle_parts): shingle groups are complete within a
        partition, so the in-partition self-join emits exact per-partition
        pair partials (a, b, inter_partial, nsh_a, nsh_b)
      → groupby(a % n_pair_parts): sums partials per (a, b) and applies the
        Jaccard threshold — each stage a Ray-native shuffle, vectorized
        pandas inside.

    Scale strategy: pair emission is quadratic in shingle document-frequency —
    at 100 TB pass ``max_shingle_df`` to drop stop-shingles (df > cap can
    only connect near-identical boilerplate; shingle groups are complete
    within their partition, so the df filter is exact and costs one bincount)
    or pre-cluster with minhash_lsh_pairs and verify candidates only. The
    default (None) keeps the exact form, which doubles as the MinHash oracle."""
    ds = _read_docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        di, hs = _shingle_hashes_batch(df["text"].tolist(), n)
        nsh = np.bincount(di, minlength=len(df)).astype(np.int64)
        return pd.DataFrame(
            {
                "sh": hs.astype(np.int64),
                "doc_id": df["doc_id"].to_numpy()[di],
                "nsh": nsh[di],
                "part": (hs % np.uint64(n_shingle_parts)).astype(np.int64),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pandas")

    def emit_partials(df: pd.DataFrame) -> pd.DataFrame:
        if max_shingle_df is not None:
            # exact df per shingle (groups complete in this partition):
            # stop-shingles above the cap are dropped before the self-join
            df = df[df.groupby("sh")["sh"].transform("size") <= max_shingle_df]
        m = df.merge(df, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return _PAIR_EMPTY
        g = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).agg(
            inter=("sh", "size"), nsh_a=("nsh_x", "first"), nsh_b=("nsh_y", "first")
        )
        g = g.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        g["ap"] = g["a"] % n_pair_parts
        return g[["a", "b", "nsh_a", "nsh_b", "inter", "ap"]]

    partials = exploded.groupby("part").map_groups(
        emit_partials, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).agg(
            inter=("inter", "sum"), nsh_a=("nsh_a", "first"), nsh_b=("nsh_b", "first")
        )
        inter = g["inter"].to_numpy().astype(np.float64)
        union = g["nsh_a"].to_numpy() + g["nsh_b"].to_numpy() - inter
        keep = inter / union >= threshold
        return pd.DataFrame(
            {
                "doc_a": g["a"].to_numpy()[keep],
                "doc_b": g["b"].to_numpy()[keep],
            }
        )

    return partials.groupby("ap").map_groups(finalize, batch_format="pandas")


# ------------------------------------------------------------- MinHash + LSH
def _minhash_sig(sh_hashes: np.ndarray) -> np.ndarray:
    """64 minhashes via seeded splitmix remix of the shingle hashes."""
    if len(sh_hashes) == 0:
        return np.full(N_MINHASH, np.uint64(0xFFFFFFFFFFFFFFFF))
    m = _remix(sh_hashes[None, :] ^ _MINHASH_SEEDS[:, None])
    return m.min(axis=1)


def _band_arrays(t: pa.Table, n: int):
    """Shared band-hash computation for both LSH verify variants: one
    vectorized shingle pass for the whole batch → per-doc 64-minhash
    signatures (minimum.reduceat over the remixed hash matrix) → N_BANDS
    folded band hashes per doc.

    Returns ``(docs_idx, doc_ids, acc, allh, starts_all)``: indices of docs
    with ≥1 shingle, their ids, the (ndocs, N_BANDS) uint64 band-hash matrix,
    and the flat sorted-distinct shingle hashes with per-doc start offsets
    (``allh[starts_all[d] : starts_all[d] + count_d]`` is doc d's list)."""
    texts = t["text"].to_pylist()
    di, allh = _shingle_hashes_batch(texts, n)
    counts = np.bincount(di, minlength=t.num_rows).astype(np.int64)
    docs_idx = np.flatnonzero(counts > 0)
    if len(docs_idx) == 0:
        return docs_idx, None, None, allh, None
    starts_all = np.concatenate([[0], np.cumsum(counts)])
    m = _remix(allh[None, :] ^ _MINHASH_SEEDS[:, None])  # (64, total)
    sigs = np.minimum.reduceat(m, starts_all[docs_idx], axis=1).T
    bands = sigs.reshape(len(docs_idx), N_BANDS, -1)
    acc = np.full((len(docs_idx), N_BANDS), np.uint64(0xCBF29CE484222325))
    for r in range(bands.shape[2]):
        acc = _remix((acc ^ bands[:, :, r]).ravel()).reshape(acc.shape)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[docs_idx]
    return docs_idx, doc_ids, acc, allh, starts_all


def _doc_shingle_list(docs_idx, allh, starts_all) -> pa.ListArray:
    """per-doc (sorted ascending, distinct) shingle-hash list<int64> for the
    docs in docs_idx, zero-copy over the flat hash array."""
    return pa.ListArray.from_arrays(
        pa.array(
            starts_all[np.concatenate([docs_idx, [docs_idx[-1] + 1]])].astype(
                np.int32
            )
        ),
        pa.array(allh.view(np.int64)),
    )


def _doc_shingle_blob(docs_idx, allh, starts_all) -> pa.Array:
    """per-doc shingle-hash list packed as a large_binary blob (the raw int64
    bytes), zero-copy via offset buffers — acero's hash join can carry
    var-length BINARY payloads but not list columns, so the join-verify
    variant ships blobs and ``np.frombuffer``s them back."""
    byte_off = (
        starts_all[np.concatenate([docs_idx, [docs_idx[-1] + 1]])] * 8
    ).astype(np.int64)
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(docs_idx),
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(allh.tobytes())],
    )


def minhash_lsh_pairs(
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.4,
    n_bucket_parts: int = 32,
    n_pair_parts: int = 32,
    max_bucket: int | None = None,
    verify: str = "carry",
):
    """MinHash+LSH near-dup pairs, verified with exact Jaccard — fully
    distributed (no driver-side shingle dict, no single-partition funnel):

      shingle → 64 minhashes → 8 banded signatures, each band row CARRYING
      the doc's (distinct, sorted) shingle-hash list
      → groupby(bucket_hash % n_bucket_parts): (band, bhash) groups are
        complete within a partition, so pair emission AND exact-Jaccard
        verification both happen bucket-locally (the carried lists make the
        verify need no second lookup side)
      → groupby(a % n_pair_parts): drops duplicate pairs found via multiple
        bands. Rows: (doc_a, doc_b); recall vs exact asserted in tests.

    Scale tradeoff (measured, see BASELINE.md): carrying the shingle list
    multiplies band-row shuffle volume by N_BANDS. ``verify="join"`` is the
    alternative — bucket rows carry NOTHING, candidate pairs come out of the
    buckets bare and are verified by a 3-way repartition-join against a
    one-row-per-doc shingle-list table (ships each doc's shingles ~2×
    instead of 8×, at the cost of two extra hash-join shuffles). Both
    variants return identical pairs (equality-tested); the default is the
    bench winner at the tested scale. Hot buckets (identical boilerplate)
    are the LSH-inherent skew: ``max_bucket`` skips buckets above that size
    (members of such buckets are near-identical boilerplate that exact-dedup
    should have removed first; skipped-bucket counts are printed once per
    partition so the drop is never silent). Default None = no cap."""
    if threshold <= 0:
        # the vectorized bucket verify prunes co-bucket pairs sharing zero
        # shingles implicitly — only valid when they can't pass the filter
        raise ValueError("minhash_lsh_pairs requires threshold > 0")
    if verify not in ("carry", "join"):
        raise ValueError(f"verify must be 'carry' or 'join', got {verify!r}")
    if verify == "join":
        return _minhash_lsh_pairs_join(
            sf_dir, n, threshold, n_bucket_parts, n_pair_parts, max_bucket
        )
    ds = _read_docs(sf_dir)

    def band_rows(t: pa.Table) -> pa.Table:
        # batch-vectorized minhash (shared _band_arrays), each band row
        # CARRYING the doc's shingle list for the bucket-local verify
        docs_idx, doc_ids, acc, allh, starts_all = _band_arrays(t, n)
        if len(docs_idx) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int8()),
                    "bhash": pa.array([], type=pa.int64()),
                    "bp": pa.array([], type=pa.int64()),
                    "sh": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        # shingle-less docs are skipped entirely: they can never pass the
        # Jaccard verify, and emitting them would build one giant empty-doc
        # bucket per band
        ndocs = len(docs_idx)
        # per-doc shingle list (sorted ascending), repeated once per band row
        sh_list = _doc_shingle_list(docs_idx, allh, starts_all)
        rep = np.repeat(np.arange(ndocs, dtype=np.int64), N_BANDS)
        bhash = acc.ravel()
        bp = (
            _remix(bhash ^ np.tile(np.arange(N_BANDS, dtype=np.uint64), ndocs))
            % np.uint64(n_bucket_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, N_BANDS).astype(np.int64)),
                "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int8), ndocs)),
                "bhash": pa.array(bhash.view(np.int64)),
                "bp": pa.array(bp),
                "sh": sh_list.take(pa.array(rep)),
            }
        )

    banded = ds.map_batches(band_rows, batch_format="pyarrow")

    _VERIFY_EMPTY = pd.DataFrame(
        {
            "a": np.empty(0, np.int64),
            "b": np.empty(0, np.int64),
            "ap": np.empty(0, np.int64),
        }
    )

    def bucket_verify(df: pd.DataFrame) -> pd.DataFrame:
        # df = all band rows of one bucket partition: (band, bhash) groups are
        # complete here, so candidates AND their exact-Jaccard verdicts are
        # computed bucket-locally from the carried shingle lists — fully
        # vectorized: explode every surviving row's shingles once, self-merge
        # on (group, shingle), then ONE grouped co-occurrence count gives the
        # exact intersection of every candidate pair (the same partial-emit
        # pattern as ngram_jaccard_pairs; no per-pair Python loop). Co-bucket
        # pairs sharing zero shingles are pruned implicitly — with
        # threshold > 0 they could never pass the Jaccard verify.
        if not len(df):
            return _VERIFY_EMPTY
        gid = df.groupby(["band", "bhash"], sort=False).ngroup().to_numpy()
        sizes = np.bincount(gid)
        ok = sizes[gid] >= 2
        if max_bucket is not None:
            big = sizes[gid] > max_bucket
            nbig = len(np.unique(gid[big]))
            if nbig:
                print(
                    f"minhash_lsh_pairs: skipped {nbig} buckets > max_bucket={max_bucket}"
                )
            ok &= ~big
        if not ok.any():
            return _VERIFY_EMPTY
        ids = df["doc_id"].to_numpy()[ok]
        g = gid[ok]
        shl = df["sh"].to_numpy()[ok]
        lens = np.fromiter((len(s) for s in shl), dtype=np.int64, count=len(shl))
        flat = np.concatenate(list(shl)).astype(np.int64, copy=False)
        row = np.repeat(np.arange(len(ids)), lens)
        ex = pd.DataFrame({"g": g[row], "sh": flat, "doc": ids[row]})
        m = ex.merge(ex, on=["g", "sh"])
        m = m[m["doc_x"] < m["doc_y"]]
        if m.empty:
            return _VERIFY_EMPTY
        cnt = m.groupby(["g", "doc_x", "doc_y"], as_index=False).size()
        # (g, doc) is unique (each doc emits one row per band) → safe joins
        sz = pd.DataFrame({"g": g, "doc": ids, "n": lens})
        cnt = cnt.merge(sz.rename(columns={"doc": "doc_x", "n": "na"}), on=["g", "doc_x"])
        cnt = cnt.merge(sz.rename(columns={"doc": "doc_y", "n": "nb"}), on=["g", "doc_y"])
        inter = cnt["size"].to_numpy().astype(np.float64)
        union = cnt["na"].to_numpy() + cnt["nb"].to_numpy() - inter
        keep = inter / union >= threshold
        pr = pd.DataFrame(
            {
                "a": cnt["doc_x"].to_numpy()[keep].astype(np.int64),
                "b": cnt["doc_y"].to_numpy()[keep].astype(np.int64),
            }
        ).drop_duplicates()  # same pair via several buckets of this partition
        a = pr["a"].to_numpy()
        return pd.DataFrame({"a": a, "b": pr["b"].to_numpy(), "ap": a % n_pair_parts})

    verified = banded.groupby("bp").map_groups(bucket_verify, batch_format="pandas")

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["a", "b"])
        return pd.DataFrame(
            {
                "doc_a": g["a"].to_numpy(dtype=np.int64),
                "doc_b": g["b"].to_numpy(dtype=np.int64),
            }
        )

    return verified.groupby("ap").map_groups(dedup_pairs, batch_format="pandas")


def _minhash_lsh_pairs_join(
    sf_dir: str,
    n: int,
    threshold: float,
    n_bucket_parts: int,
    n_pair_parts: int,
    max_bucket: int | None,
):
    """The shingle-shipping alternative verify for minhash_lsh_pairs
    (``verify="join"``): band rows carry NOTHING (doc_id, band, bhash only →
    ~32 B/row instead of shingle-list-sized), candidate pairs come out of the
    bucket groupby bare and deduped, then exact-Jaccard verification is a
    3-way hash join — candidates ⋈ shingle-table on a, ⋈ again on b — so each
    doc's shingle list is shipped ~2× (once per join side it participates in)
    instead of N_BANDS×, at the cost of two extra partitioned shuffles.
    Returns exactly the pairs of the carry variant (equality-tested).

    Join-partition note: Ray's hash join spawns one aggregator actor per
    output partition PER join — two 32-way joins is 64 actors, which on a
    small CPU budget starves the map tasks outright. The join width is
    therefore sized to the runtime CPU budget (like bench.py sizes frontier
    shards), not to n_pair_parts; on a real cluster both scale together."""
    import ray

    n_join_parts = max(
        2, min(n_pair_parts, int(ray.cluster_resources().get("CPU", 8)))
    )
    ds = _read_docs(sf_dir)

    def band_rows_bare(t: pa.Table) -> pa.Table:
        docs_idx, doc_ids, acc, _, _ = _band_arrays(t, n)
        if len(docs_idx) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int8()),
                    "bhash": pa.array([], type=pa.int64()),
                    "bp": pa.array([], type=pa.int64()),
                }
            )
        ndocs = len(docs_idx)
        bhash = acc.ravel()
        bp = (
            _remix(bhash ^ np.tile(np.arange(N_BANDS, dtype=np.uint64), ndocs))
            % np.uint64(n_bucket_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, N_BANDS).astype(np.int64)),
                "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int8), ndocs)),
                "bhash": pa.array(bhash.view(np.int64)),
                "bp": pa.array(bp),
            }
        )

    banded = ds.map_batches(band_rows_bare, batch_format="pyarrow")

    _PAIR_EMPTY = pd.DataFrame(
        {
            "a": np.empty(0, np.int64),
            "b": np.empty(0, np.int64),
            "ap": np.empty(0, np.int64),
        }
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # (band, bhash) groups are partition-complete under groupby("bp"):
        # emit every in-bucket candidate pair (a < b) with one self-merge —
        # no shingles here, the Jaccard verdict comes from the joins below
        if not len(df):
            return _PAIR_EMPTY
        gid = df.groupby(["band", "bhash"], sort=False).ngroup().to_numpy()
        sizes = np.bincount(gid)
        ok = sizes[gid] >= 2
        if max_bucket is not None:
            big = sizes[gid] > max_bucket
            nbig = len(np.unique(gid[big]))
            if nbig:
                print(
                    f"minhash_lsh_pairs[join]: skipped {nbig} buckets > max_bucket={max_bucket}"
                )
            ok &= ~big
        if not ok.any():
            return _PAIR_EMPTY
        d = pd.DataFrame({"g": gid[ok], "doc": df["doc_id"].to_numpy()[ok]})
        m = d.merge(d, on="g")
        m = m[m["doc_x"] < m["doc_y"]]
        if m.empty:
            return _PAIR_EMPTY
        pr = m.drop_duplicates(["doc_x", "doc_y"])
        a = pr["doc_x"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"a": a, "b": pr["doc_y"].to_numpy().astype(np.int64), "ap": a % n_pair_parts}
        )

    def dedup_candidates(df: pd.DataFrame) -> pd.DataFrame:
        # same pair found via several buckets/partitions → keep one
        g = df.drop_duplicates(["a", "b"])
        return pd.DataFrame(
            {
                "a": g["a"].to_numpy(dtype=np.int64),
                "b": g["b"].to_numpy(dtype=np.int64),
            }
        )

    cands = (
        banded.groupby("bp")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("ap")
        .map_groups(dedup_candidates, batch_format="pandas")
    )

    def shingle_rows(side: str):
        # one row per doc: (doc_id, sh_<side>: large_binary blob of the int64
        # shingle hashes, n<side>) — built per join side so post-join column
        # names never collide; blobs because acero joins reject list payloads
        def fn(t: pa.Table) -> pa.Table:
            texts = t["text"].to_pylist()
            di, allh = _shingle_hashes_batch(texts, n)
            counts = np.bincount(di, minlength=t.num_rows).astype(np.int64)
            docs_idx = np.flatnonzero(counts > 0)
            if len(docs_idx) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], type=pa.int64()),
                        f"sh_{side}": pa.array([], type=pa.large_binary()),
                        f"n{side}": pa.array([], type=pa.int64()),
                    }
                )
            starts_all = np.concatenate([[0], np.cumsum(counts)])
            return pa.table(
                {
                    "doc_id": pa.array(
                        t["doc_id"].to_numpy(zero_copy_only=False)[docs_idx].astype(np.int64)
                    ),
                    f"sh_{side}": _doc_shingle_blob(docs_idx, allh, starts_all),
                    f"n{side}": pa.array(counts[docs_idx]),
                }
            )

        return fn

    sh_a = ds.map_batches(shingle_rows("a"), batch_format="pyarrow")
    sh_b = ds.map_batches(shingle_rows("b"), batch_format="pyarrow")

    joined = (
        cands.join(
            sh_a,
            join_type="inner",
            num_partitions=n_join_parts,
            on=("a",),
            right_on=("doc_id",),
        )
        .join(
            sh_b,
            join_type="inner",
            num_partitions=n_join_parts,
            on=("b",),
            right_on=("doc_id",),
        )
    )

    _OUT_EMPTY = pd.DataFrame(
        {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64)}
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # batch-vectorized exact Jaccard: decode both carried blobs back to
        # flat int64 arrays, explode with the pair row index, inner-merge on
        # (row, shingle) → one grouped count gives every pair's intersection
        # (shingle lists are distinct per doc)
        if not len(df):
            return _OUT_EMPTY
        sha = df["sh_a"].to_numpy()
        shb = df["sh_b"].to_numpy()
        la = np.fromiter((len(s) for s in sha), np.int64, len(sha)) // 8
        lb = np.fromiter((len(s) for s in shb), np.int64, len(shb)) // 8
        da = pd.DataFrame(
            {
                "r": np.repeat(np.arange(len(df)), la),
                "sh": np.frombuffer(b"".join(sha), dtype=np.int64),
            }
        )
        db = pd.DataFrame(
            {
                "r": np.repeat(np.arange(len(df)), lb),
                "sh": np.frombuffer(b"".join(shb), dtype=np.int64),
            }
        )
        inter = da.merge(db, on=["r", "sh"]).groupby("r").size()
        iv = np.zeros(len(df), np.float64)
        iv[inter.index.to_numpy()] = inter.to_numpy()
        union = df["na"].to_numpy() + df["nb"].to_numpy() - iv
        keep = iv / union >= threshold
        return pd.DataFrame(
            {
                "doc_a": df["a"].to_numpy()[keep].astype(np.int64),
                "doc_b": df["b"].to_numpy()[keep].astype(np.int64),
            }
        )

    return joined.map_batches(
        verify, batch_format="pandas", batch_size=4096
    ).select_columns(["doc_a", "doc_b"])


# ----------------------------------------------------------------- SimHash
def simhash(sf_dir: str):
    """(doc_id, simhash): 64-bit SimHash over token hashes — per-bit majority
    vote of ±1 contributions, vectorized across the WHOLE batch: one token
    flatten + one hash pass + one ``np.add.reduceat`` over the per-doc
    boundaries of the flattened ±1 bit matrix (no per-doc Python loop).
    Near-dups have small Hamming distance (property-tested)."""
    import itertools

    ds = _read_docs(sf_dir)
    _SHIFTS = np.arange(64, dtype=np.uint64)
    _POWS = np.uint64(1) << _SHIFTS

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = [_TOKEN_RE.findall(t.lower()) for t in df["text"]]
        counts = np.array([len(x) for x in toks], dtype=np.int64)
        out = np.zeros(len(df), dtype=np.uint64)
        nz = np.flatnonzero(counts > 0)
        if len(nz):
            flat = pa.array(
                list(itertools.chain.from_iterable(toks)), type=pa.string()
            )
            h = fnv1a64(flat)
            signs = (
                2 * ((h[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
                - 1
            )  # (total_tokens, 64) in ±1
            starts = np.concatenate([[0], np.cumsum(counts)])[nz]
            votes = np.add.reduceat(signs, starts, axis=0)  # (n_nonzero, 64)
            out[nz] = ((votes > 0).astype(np.uint64) * _POWS).sum(axis=1)
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out.astype(np.int64)})

    return ds.map_batches(f, batch_format="pandas")


def embed_lsh_pairs(
    sf_dir: str,
    threshold: float = 0.35,
    n_planes: int = 3,
    n_tables: int = 8,
    n_bucket_parts: int = 32,
    n_pair_parts: int = 32,
):
    """Embedding near-dup via random-hyperplane LSH — the 10^9-vector scale
    path for embed_cosine_pairs, fully distributed: vectors sharing a
    signature bucket in ANY of ``n_tables`` hash tables become candidates.
    Bucket rows CARRY the normalized vector, so the exact-cosine verify runs
    bucket-locally (vectorized m×m matmul per bucket); a second groupby drops
    pairs found in several tables. The driver touches only the parquet schema
    (embedding dimension) — never the vectors.

    Parameter math: per-plane collision prob p = 1 - arccos(τ)/π; recall ≈
    1-(1-p^b)^T. The defaults (b=3, T=8) give ~0.88 recall at τ=0.35 — note
    that at such LOW similarity thresholds LSH bucketing prunes little (few
    wide buckets); its pruning power kicks in for true near-dups (τ ≥ 0.8 →
    b=12+ planes, tiny buckets). Recall vs brute force asserted in tests;
    rows-only for the driver."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from .ann import list_col_to_matrix

    # embedding dimension from the first batch only (no full driver read)
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    d = len(first["embedding"][0])
    # deterministic hyperplanes from the splitmix stream
    raw = _remix(
        (np.arange(n_tables * n_planes * d, dtype=np.uint64) + _U64_ONE)
        * np.uint64(0x9E3779B97F4A7C15)
    )
    # 2.0**64: float64_array / (python int 2**64) yields an object array
    planes = (raw.astype(np.float64) / 2.0**64 - 0.5).reshape(n_tables, n_planes, d)
    planes_ref = ray.put(planes)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def buckets(t: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        X = list_col_to_matrix(t["embedding"])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        n_rows = len(ids)
        vec = pa.ListArray.from_arrays(
            pa.array(np.arange(n_rows + 1, dtype=np.int32) * d), pa.array(Xn.ravel())
        )
        rows_id, rows_tbl, rows_sig, take_idx = [], [], [], []
        for ti in range(P.shape[0]):
            bits = (Xn @ P[ti].T) > 0  # (n, n_planes)
            sig = (bits @ (1 << np.arange(P.shape[1]))).astype(np.int64)
            rows_id.append(ids)
            rows_tbl.append(np.full(n_rows, ti, dtype=np.int8))
            rows_sig.append(sig)
            take_idx.append(np.arange(n_rows, dtype=np.int64))
        tbl_col = np.concatenate(rows_tbl)
        sig_col = np.concatenate(rows_sig)
        bp = (
            _remix(sig_col.astype(np.uint64) ^ (tbl_col.astype(np.uint64) << np.uint64(48)))
            % np.uint64(n_bucket_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(rows_id)),
                "tbl": pa.array(tbl_col),
                "sig": pa.array(sig_col),
                "bp": pa.array(bp),
                "vec": vec.take(pa.array(np.concatenate(take_idx))),
            }
        )

    bucketed = ds.map_batches(buckets, batch_format="pyarrow", batch_size=8192)

    _V_EMPTY = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "ap": pa.array([], pa.int64()),
        }
    )

    def bucket_verify(t: pa.Table) -> pa.Table:
        # (tbl, sig) groups are complete within a bucket partition. Fully
        # vectorized (no per-bucket Python loop, no per-row list→array
        # conversion): the fixed-width vec column becomes ONE (rows, d)
        # matrix zero-copy; intra-bucket (i<j) pair indices are generated
        # with repeat/cumsum arithmetic over the sorted group run-lengths;
        # the exact-cosine verify is a single einsum over the pair rows —
        # half the flops of the old per-bucket m×m matmuls.
        if t.num_rows < 2:
            return _V_EMPTY
        M = list_col_to_matrix(t["vec"])  # zero-copy (rows, d)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        key = t["tbl"].to_numpy(zero_copy_only=False).astype(np.int64) * np.int64(
            1 << n_planes
        ) + t["sig"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        sizes = np.diff(np.r_[starts, len(ks)])
        # for the row at local position p of a size-m bucket: m-1-p partners
        counts_i = np.repeat(sizes, sizes) - 1 - (
            np.arange(len(ks)) - np.repeat(starts, sizes)
        )
        tot = int(counts_i.sum())
        if tot == 0:
            return _V_EMPTY
        i_idx = np.repeat(np.arange(len(ks)), counts_i)
        run_starts = np.cumsum(counts_i) - counts_i
        j_idx = i_idx + (np.arange(tot) - np.repeat(run_starts, counts_i)) + 1
        gi, gj = order[i_idx], order[j_idx]
        cos = np.einsum("ij,ij->i", M[gi], M[gj])
        keep = cos >= threshold
        ia, jb = ids[gi[keep]], ids[gj[keep]]
        a = np.minimum(ia, jb).astype(np.int64)
        b = np.maximum(ia, jb).astype(np.int64)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "ap": pa.array(a % n_pair_parts)}
        )

    verified = bucketed.groupby("bp").map_groups(bucket_verify, batch_format="pyarrow")

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["a", "b"])
        return pd.DataFrame(
            {
                "vec_a": g["a"].to_numpy(dtype=np.int64),
                "vec_b": g["b"].to_numpy(dtype=np.int64),
            }
        )

    return verified.groupby("ap").map_groups(dedup_pairs, batch_format="pandas")


_U64_ONE = np.uint64(1)


# ----------------------------------------------- near-dup cluster resolution
def _contract_edges_batch(t: pa.Table) -> pa.Table:
    """Batch-local contraction for connected_components: run exact CC on the
    edges INSIDE one batch (vectorized min-label propagation with full
    pointer-jump compression — no Python loop over edges) and replace the
    batch's edges with star edges ``member ↔ batch-local-root``, emitted in
    both directions. The star set is connectivity-equivalent to the batch's
    edges (each member is joined to its local component root, and any node
    shared across batches bridges them), is no larger than the batch's
    distinct-node count, and has radius 1 inside every batch component — so
    the global join rounds start from far shorter label distances. Each
    global round is an all-to-all (hash join + groupby-min); collapsing the
    local structure here converts O(local diameter) of those rounds into one
    narrow map pass."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    st = t.schema.field("src").type
    dt_ = t.schema.field("dst").type
    nodes_u, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    k = len(nodes_u)
    if k == 0:
        return pa.table({"src": pa.array([], st), "dst": pa.array([], dt_)})
    si, di = inv[: len(src)], inv[len(src):]
    lab = np.arange(k, dtype=np.int64)
    while True:
        old = lab
        lab = lab.copy()
        # treat the batch's edges as undirected (callers pass both
        # directions anyway; CC is undirected by definition)
        np.minimum.at(lab, di, lab[si])
        np.minimum.at(lab, si, lab[di])
        while True:  # full path compression: label <- label's label
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    member = lab != np.arange(k)
    mem_ids = nodes_u[member]
    hub_ids = nodes_u[lab[member]]
    return pa.table(
        {
            "src": pa.array(np.concatenate([mem_ids, hub_ids]), st),
            "dst": pa.array(np.concatenate([hub_ids, mem_ids]), dt_),
        }
    )


def connected_components(
    edges,
    nodes,
    num_partitions: int | None = None,
    broadcast_max_rows: int | None = None,
):
    """Distributed connected components by iterated min-label propagation
    (the Pregel/GraphX shape): each round every node's label becomes the min
    of its own label and its neighbors' labels, computed as

        msgs   = edges ⋈ labels on src          (hash join, partitioned)
        labels = (labels ∪ msgs[dst, label]).groupby(node).min(label)

    until the (row count, global label sum) pair stops changing — labels
    are monotone non-increasing on a fixed node set, but the union step can
    ADD rows for dst ids outside ``nodes``, and a new row's label could
    exactly offset a decrease in the sums, so the count is part of the
    fixpoint state. Every step is a partitioned Ray-native shuffle — no
    driver-side edge loop, no full-table materialization.

    When the label table AND contracted edge set fit under
    ``broadcast_max_rows`` (default graph.BROADCAST_MAX_ROWS), the round
    switches to the broadcast fast path: the label table is ray.put once per
    round, the msgs stage becomes a vectorized pc.index_in lookup +
    block-local pre-min over the materialized contracted-edge blocks, and
    the final min runs as a driver-side pyarrow C++ group_by over the small
    partials — zero per-round all-to-all (and the fixpoint checksum comes
    free from the driver table). Results are identical to the join path
    (integer min is associative); pass ``broadcast_max_rows=0`` to force
    the distributed join, which is also what a >2M-node graph gets
    automatically.

    A batch-local contraction pre-pass (``_contract_edges_batch``) first
    replaces each edge block with connectivity-equivalent star edges
    (member ↔ block-local root, exact CC inside the block via vectorized
    min-label + pointer jumping), so the global round count is bounded by
    the diameter of the CONTRACTED graph (≈ how components span blocks),
    not the raw graph diameter — measured 22.4 s → 9.7 s on the 200k-edge
    Zipf stress graph, and at scale it converts O(local diameter)
    all-to-all rounds into one narrow map pass.

    ``edges``: Dataset (src, dst) — pass each undirected edge in both
    directions. ``nodes``: Dataset (node). Returns Dataset (node, label) with
    label = min node id of the component.

    ``num_partitions`` defaults to join-volume-aware (one partition per
    ~100k rows of max(labels, contracted edges), clamped to [2, 64]): the
    per-round cost is the edge⋈label join plus the union-groupby, both
    linear in the contracted edge count, while every hash join spawns one
    aggregator actor per partition PER ROUND, so over-partitioning tiny
    graphs multiplies pure framework cost (measured: P=8 → 54 s,
    P=2 → 27 s for the same 500-node graph)."""

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["node"]})

    from .graph import _limb_checksum

    labels = nodes.map_batches(init_labels, batch_format="pyarrow").materialize()
    edges = edges.materialize()
    if edges.count() == 0:
        return labels
    edges = (
        edges.map_batches(_contract_edges_batch, batch_format="pyarrow")
        .materialize()
    )
    if num_partitions is None:
        # per-round join/groupby volume is the CONTRACTED edge count (msgs =
        # edges ⋈ labels), so size from whichever of labels/edges is larger —
        # same rationale as pagerank's heuristic (graph.py), but measured on
        # the POST-contraction edge set (the pre-pass shrinks the 3.2M-row
        # both-dirs Zipf stress set to ~320k star edges, landing P=3 at 8×;
        # a P∈{2,4,8,16} sweep there was within box noise, 46-62 s, so the
        # divisor mainly protects the two ends: tiny graphs stay at the P=2
        # floor where per-partition aggregator actors dominate (measured:
        # P=8 → 54 s vs P=2 → 27 s on a 500-node graph), and huge contracted
        # graphs keep one partition per ~100k join rows).
        num_partitions = max(
            2, min(64, max(labels.count(), edges.count()) // 100_000)
        )
    from .graph import (
        BROADCAST_MAX_ROWS,
        _broadcast_lookup,
        _broadcast_rounds,
        _collect_table,
        _concat_group,
        _split_for_map,
    )

    if broadcast_max_rows is None:
        broadcast_max_rows = BROADCAST_MAX_ROWS
    # driver pull per round is bounded by the per-block-distinct partial
    # volume ≤ contracted edge count, so gate on both sides of the exchange
    use_broadcast = (
        labels.count() <= broadcast_max_rows
        and edges.count() <= 4 * broadcast_max_rows
    )

    def msgs_bcast(ref):
        def fn(t: pa.Table) -> pa.Table:
            t, lab = _broadcast_lookup(t, ref, "src")
            part = pa.table({"node": t["dst"], "label": lab})
            # block-local combiner: pre-min per dst before anything moves
            return _concat_group([part], "node", "label", "min")

        return fn

    if use_broadcast:
        # Broadcast mode: no per-round all-to-all at all. Each round is one
        # streaming map over the materialized contracted-edge blocks
        # (ray.put'd labels + pc.index_in lookup + block-local pre-min) and
        # a driver C++ group_by over the small partials (integer min —
        # associative, bit-identical to the distributed groupby, including
        # the union semantics that admit dst nodes outside ``nodes``). The
        # framework sort-groupby costs ~25 s PER ROUND on a low-block-count
        # input at the 8× stress scale; this path replaces it outright, and
        # the fixpoint checksum comes free from the driver table.
        import ray.data as _rd

        lt = _collect_table(labels)
        if lt is None:  # no nodes: the fixpoint is the empty label table
            return labels
        # (ROW COUNT, limb sums) fixpoint — the growing-node-set soundness
        # argument lives in graph._broadcast_rounds, shared with
        # bfs_distance so a fix there can't miss this copy
        node_arr, label_arr = _broadcast_rounds(
            lt["node"].combine_chunks(),
            lt["label"].combine_chunks(),
            _split_for_map(edges),
            msgs_bcast,
            "label",
            "min",
            lambda n, l: pa.table({"node": n, "label": l}),
            lambda m: (m["node"].combine_chunks(), m["label"].combine_chunks()),
        )
        return _rd.from_arrow(pa.table({"node": node_arr, "label": label_arr}))

    # (count, limb sums) for the same growing-node-set soundness reason as
    # the broadcast loop above; merged is materialized so count() is free
    prev = (labels.count(), _limb_checksum(labels, "label"))
    while True:
        msgs = edges.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "node"})
        merged = (
            labels.union(msgs)
            .groupby("node")
            .min("label")
            .rename_columns({"min(label)": "label"})
            .materialize()
        )
        new = (merged.count(), _limb_checksum(merged, "label"))
        labels = merged
        if new == prev:
            return labels
        prev = new


def _clusters_from_pairs(pairs, sf_dir: str):
    """(doc_a, doc_b) pair Dataset → (doc_id, cluster_id, keep) via the
    distributed connected_components (shared by the MinHash and exact paths)."""
    nodes = _read_docs(sf_dir, columns=("doc_id",)).map_batches(
        lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow"
    )

    def expand(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks() if isinstance(t["doc_a"], pa.ChunkedArray) else t["doc_a"]
        b = t["doc_b"].combine_chunks() if isinstance(t["doc_b"], pa.ChunkedArray) else t["doc_b"]
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.map_batches(expand, batch_format="pyarrow")
    labels = connected_components(edges, nodes)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["node"],
                "cluster_id": t["label"],
                "keep": pc.equal(t["node"], t["label"]),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def dedup_clusters(sf_dir: str, n: int = 3, threshold: float = 0.4):
    """Connected components over the verified near-dup pair graph → one
    surviving doc per cluster: (doc_id, cluster_id=min doc_id of component,
    keep=True for the minimum member). The canonical last step of near-dedup,
    running the distributed min-label propagation in connected_components
    (golden-graph-tested); the doc table is never pulled to the driver."""
    return _clusters_from_pairs(minhash_lsh_pairs(sf_dir, n=n, threshold=threshold), sf_dir)


def dedup_clusters_exact(sf_dir: str, n: int = 3, threshold: float = 0.4):
    """dedup_clusters over the EXACT ngram_jaccard_pairs graph — identical
    cluster machinery, but SQL-oracle-checkable end to end (the DuckDB twin
    computes the components with a recursive transitive-closure CTE)."""
    return _clusters_from_pairs(ngram_jaccard_pairs(sf_dir, n=n, threshold=threshold), sf_dir)


def embed_dedup_clusters(sf_dir: str, threshold: float = 0.35):
    """SEMANTIC dedup clusters (the SemDeDup shape): connected components
    over the embedding-LSH near-dup pair graph — one surviving vector per
    cosine-similarity cluster: (vec_id, cluster_id = min member, keep).
    Same distributed min-label propagation as the text-side dedup_clusters;
    the pair graph comes from embed_lsh_pairs (bucket-partitioned, exact
    cosine verify), so no vector matrix is ever materialized."""
    import ray.data as rd

    pairs = embed_lsh_pairs(sf_dir, threshold=threshold)
    nodes = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(
        lambda t: pa.table({"node": t["vec_id"]}), batch_format="pyarrow"
    )

    def expand(t: pa.Table) -> pa.Table:
        a = t["vec_a"].combine_chunks() if isinstance(t["vec_a"], pa.ChunkedArray) else t["vec_a"]
        b = t["vec_b"].combine_chunks() if isinstance(t["vec_b"], pa.ChunkedArray) else t["vec_b"]
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    labels = connected_components(pairs.map_batches(expand, batch_format="pyarrow"), nodes)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["node"],
                "cluster_id": t["label"],
                "keep": pc.equal(t["node"], t["label"]),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------- embedding-cosine near-dup
def embed_cosine_pairs(sf_dir: str, threshold: float = 0.35, max_rows: int = 100_000):
    """All embedding pairs with cosine ≥ threshold: brute-force per batch
    against the broadcast normalized matrix (numpy matmul). The broadcast side
    is ray.put ONCE and read per task — never re-shipped per batch.

    This is the documented O(n²) ORACLE BASELINE for embed_lsh_pairs, not a
    scale path: above ``max_rows`` it refuses to run (the full-matrix
    broadcast + n² matmul would be a cluster-killer at 10^9 vectors) and
    points at embed_lsh_pairs, whose bucket-partitioned verify computes the
    same pairs without ever materializing the matrix."""
    import ray
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_rows > max_rows:
        raise ValueError(
            f"embed_cosine_pairs is the brute-force oracle baseline (full-matrix "
            f"broadcast, O(n²) compare): {n_rows} rows > max_rows={max_rows}. "
            "Use embed_lsh_pairs (the distributed LSH scale path) or raise "
            "max_rows explicitly for a deliberate small-corpus run."
        )
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    M = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy()
    ref = ray.put((ids, M))

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        all_ids, allM = ray.get(ref)
        B = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        bids = t["vec_id"].to_numpy(zero_copy_only=False)
        S = B @ allM.T
        bi, aj = np.nonzero(S >= threshold)
        keep = bids[bi] < all_ids[aj]  # each unordered pair once
        return pa.table(
            {
                "vec_a": pa.array(bids[bi][keep]),
                "vec_b": pa.array(all_ids[aj][keep]),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)


# ------------------------------------------------------- fuzzy (edit-distance)
def _padded_bytes(sa) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint8 zero-padded byte matrix + int64 lengths for a pyarrow
    string array — one vectorized scatter from the values buffer, no per-row
    Python. Pad bytes are 0x00, which cannot occur in utf-8 text, so padding
    never aliases a real character."""
    if isinstance(sa, pa.ChunkedArray):
        sa = sa.combine_chunks()
    sa = sa.cast(pa.large_string())
    n = len(sa)
    off = np.frombuffer(sa.buffers()[1], np.int64)[sa.offset : sa.offset + n + 1]
    lens = np.diff(off)
    L = int(lens.max()) if n else 0
    out = np.zeros((n, max(L, 1)), np.uint8)
    if n and off[-1] > off[0]:
        data = np.frombuffer(sa.buffers()[2], np.uint8)[off[0] : off[-1]]
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(data)) - np.repeat(off[:-1] - off[0], lens)
        out[rows, cols] = data
    return out, lens.astype(np.int64)


def _banded_levenshtein(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray, k: int
) -> np.ndarray:
    """Exact Levenshtein distance for every (A[i], B[i]) pair whose distance
    is ≤ k; pairs beyond the band report k+1. Requires |la-lb| ≤ k (callers
    length-prune first). The classic band-limited DP (Ukkonen '85): row i
    keeps dp[i][j] only for the 2k+1 diagonals j-i ∈ [-k, k] — everything
    outside the band is provably > k. Vectorized over ALL pairs at once:
    the Python loops are max_len × (2k+1) numpy steps (≈ a few hundred for
    URLs at k=2), never per-pair or per-row."""
    P, INF, W = A.shape[0], np.int32(k + 1), 2 * k + 1
    res = np.full(P, INF, np.int32)
    in_band = np.abs(la - lb) <= k  # |len diff| > k ⇒ dist > k, stays INF
    done = (la == 0) & in_band
    res[done] = np.minimum(lb[done], INF).astype(np.int32)  # dist("", b) = |b|
    dp = np.full((P, W), INF, np.int32)
    for d in range(0, k + 1):
        dp[:, k + d] = d  # dp[0][j] = j on diagonal d = j
    max_i = int(la.max()) if P else 0
    Bw = B.shape[1]
    for i in range(1, max_i + 1):
        new = np.full((P, W), INF, np.int32)
        ai = A[:, i - 1]
        for di in range(W):
            j = i + di - k
            if j < 0:
                continue
            if j == 0:
                new[:, di] = min(i, k + 1)
                continue
            # diagonal (i-1, j-1): same offset column
            cost = dp[:, di] + (ai != B[:, min(j - 1, Bw - 1)])
            if di + 1 < W:  # (i-1, j): offset d+1
                cost = np.minimum(cost, dp[:, di + 1] + 1)
            if di - 1 >= 0:  # (i, j-1): offset d-1, current row
                cost = np.minimum(cost, new[:, di - 1] + 1)
            new[:, di] = np.minimum(cost, INF)
        dp = new
        hit = (la == i) & in_band
        if hit.any():
            res[hit] = dp[hit, lb[hit] - i + k]
    return np.minimum(res, INF)


def _pair_indices(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All within-group (i, j), i < j pair indices for groups of the given
    sizes, as LOCAL offsets plus the owning group id — closed-form (no loop
    over groups): global pair rank t within a group of size n maps to row
    i = floor((2n-1-sqrt((2n-1)²-8t))/2), j = t - S(i) + i + 1, with a ±1
    integer correction for float sqrt error."""
    m = counts * (counts - 1) // 2
    M = int(m.sum())
    if M == 0:
        z = np.array([], np.int64)
        return z, z, z
    gid = np.repeat(np.arange(len(counts), dtype=np.int64), m)
    starts_m = np.concatenate([[0], np.cumsum(m)[:-1]])
    t = np.arange(M, dtype=np.int64) - np.repeat(starts_m, m)
    n = counts[gid]
    i = ((2 * n - 1 - np.sqrt((2 * n - 1.0) ** 2 - 8.0 * t)) // 2).astype(np.int64)
    S = i * (2 * n - i - 1) // 2  # start rank of row i
    too_big = S > t
    i[too_big] -= 1
    S[too_big] = i[too_big] * (2 * n[too_big] - i[too_big] - 1) // 2
    S_next = (i + 1) * (2 * n - i - 2) // 2
    too_small = S_next <= t
    i[too_small] += 1
    S[too_small] = i[too_small] * (2 * n[too_small] - i[too_small] - 1) // 2
    j = t - S + i + 1
    return gid, i, j


def fuzzy_pairs_blocked(
    ds,
    text_col: str,
    block_col: str,
    max_dist: int = 2,
    max_block: int | None = None,
    num_partitions: int = 16,
):
    """(a, b, dist): every within-block pair of distinct strings with edit
    distance ≤ max_dist, a < b — a blocked string-similarity self-join, the
    entity-resolution / near-duplicate-URL primitive (Levenshtein analog of
    minhash_lsh_pairs' Jaccard machinery). The reference has no similarity
    ops at all (storage CRUD only, storage/json_storage.py); this extends
    the dedup family.

    Distance is over UTF-8 BYTES (one byte = one unit), identical to
    character Levenshtein for ASCII inputs (URLs, identifiers — this
    operator's domain and what the DuckDB oracle compares); multi-byte
    code points count as their byte length.

    Scale shape: rows shuffle ONCE by hash(block); inside a partition every
    block is complete, so candidate generation (closed-form within-group
    pair ranks), the |len(a)-len(b)| ≤ k prune, and ONE band-limited DP over
    all surviving pairs are partition-local and fully vectorized.
    ``max_block`` (OPT-IN, default None — exactly minhash's max_bucket
    contract: a cap silently changes the result, so oracle-paired callers
    leave it off) truncates oversized blocks to their lexicographically
    first ``max_block`` members (deterministic, logged) — a block that big
    is a crawler trap / degenerate key, and candidate pairs grow O(n²)."""
    import logging

    def key(t: pa.Table) -> pa.Table:
        bp = fnv1a64(t[block_col]) % np.uint64(num_partitions)
        return pa.table(
            {
                "s": t[text_col],
                "blk": t[block_col],
                "bp": pa.array(bp.astype(np.int64)),
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "dist": pd.Series([], dtype=np.int64),
            }
        )
        if not len(df):
            return empty
        # pair DISTINCT strings: repeated rows of one string are exact dups
        # (dedup_exact_*'s domain), not fuzzy pairs
        df = df.drop_duplicates(["blk", "s"]).sort_values(
            ["blk", "s"], kind="mergesort"
        )
        strs = df["s"].to_numpy()
        blks = df["blk"].to_numpy()
        uniq, starts, counts = np.unique(blks, return_index=True, return_counts=True)
        if max_block is not None and (counts > max_block).any():
            over = counts > max_block
            logging.getLogger(__name__).warning(
                "fuzzy_pairs_blocked: %d blocks over cap %d (largest %d) — "
                "truncated to first %d members each",
                int(over.sum()), max_block, int(counts.max()), max_block,
            )
            counts = np.minimum(counts, max_block)
        m_pairs = counts.astype(np.int64) * (counts.astype(np.int64) - 1) // 2
        if not m_pairs.sum():  # all blocks singleton → no candidates at all
            return empty
        M, lens = _padded_bytes(pa.array(strs, pa.string()))
        # byte-class histogram signature (16 classes): one edit op changes at
        # most two histogram units, so ed(a,b) ≥ ceil(L1(hist)/2) — an EXACT
        # necessary condition. The O(pairs) signature scan (few ops/pair)
        # kills ~all non-pairs before the O(len·k)-per-pair banded DP; the r5
        # 8x scale stress measured the unfiltered DP at 92 s vs <2 s with
        # this filter on URL-shaped blocks.
        valid = np.arange(M.shape[1])[None, :] < lens[:, None]
        cls = M & 0x0F
        hist = np.empty((len(strs), 16), np.int32)
        for c in range(16):
            hist[:, c] = ((cls == c) & valid).sum(axis=1)
        l1_cap = 2 * max_dist

        # EXACT sub-quadratic candidate generation: project each histogram
        # onto an alternating-sign weight vector (|w|∞ = 1), so for any true
        # pair |proj(a) − proj(b)| ≤ L1(hist) ≤ 2·max_dist. Sorting each
        # block by the projection and pairing only rows within a ±2k window
        # therefore loses nothing, and the candidate count drops from
        # Σ n_block² to Σ (window occupancy) — data with identical
        # projections (anagram-heavy blocks) degrades gracefully back to the
        # in-window all-pairs scan, still filtered by the full L1 check.
        w16 = np.where(np.arange(16) % 2 == 0, 1, -1).astype(np.int64)
        proj = hist.astype(np.int64) @ w16
        blk_of_row = np.repeat(np.arange(len(counts), dtype=np.int64),
                               np.diff(np.r_[starts, len(strs)]))
        rank_in_blk = np.arange(len(strs), dtype=np.int64) - starts[blk_of_row]
        live = rank_in_blk < counts[blk_of_row]  # max_block truncation
        live_idx = np.flatnonzero(live)
        span = int(np.abs(proj).max()) + l1_cap + 1 if len(proj) else 1
        key_live = blk_of_row[live_idx] * np.int64(2 * span) + proj[live_idx]
        order = live_idx[np.argsort(key_live, kind="stable")]
        ks = blk_of_row[order] * np.int64(2 * span) + proj[order]
        hi_pos = np.searchsorted(ks, ks + l1_cap, side="right")
        k_i = hi_pos - np.arange(len(ks)) - 1

        # chunk rows so each ragged window expansion holds ≤ ~4M candidates
        cum = np.cumsum(k_i)
        CHUNK = 4_000_000
        row_edges = [0]
        target = CHUNK
        for ri, tot in enumerate(cum):
            if tot >= target:
                row_edges.append(ri + 1)
                target = tot + CHUNK
        if row_edges[-1] != len(ks):
            row_edges.append(len(ks))
        out_a, out_b, out_d = [], [], []
        for r0, r1 in zip(row_edges, row_edges[1:]):
            kk = k_i[r0:r1]
            tot = int(kk.sum())
            if tot == 0:
                continue
            pi_s = np.repeat(np.arange(r0, r1, dtype=np.int64), kk)
            cum_kk = np.r_[0, np.cumsum(kk)[:-1]]
            offs = np.arange(tot, dtype=np.int64) - np.repeat(cum_kk, kk)
            pj_s = pi_s + 1 + offs
            pi, pj = order[pi_s], order[pj_s]
            # normalize to lexicographic (a < b): rows are (blk, s)-sorted,
            # so the smaller ORIGINAL index is the smaller string
            lo = np.minimum(pi, pj)
            hi2 = np.maximum(pi, pj)
            pi, pj = lo, hi2
            keep = np.abs(lens[pi] - lens[pj]) <= max_dist
            pi, pj = pi[keep], pj[keep]
            if len(pi):
                l1 = np.abs(hist[pi] - hist[pj]).sum(axis=1)
                sig_ok = l1 <= l1_cap
                pi, pj = pi[sig_ok], pj[sig_ok]
            if not len(pi):
                continue
            dist = _banded_levenshtein(M[pi], lens[pi], M[pj], lens[pj], max_dist)
            ok = dist <= max_dist
            out_a.append(strs[pi[ok]])
            out_b.append(strs[pj[ok]])
            out_d.append(dist[ok].astype(np.int64))
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "dist": np.concatenate(out_d),
            }
        )

    from .graph import _ensure_min_blocks

    return (
        # guarded split before the shuffle (graph._ensure_min_blocks): a
        # 1-block from_arrow input would serialize the groupby exchange
        # (BASELINE.md 1-vs-32-block microbench); a many-block parquet
        # read must NOT be coalesced down to 4*P
        _ensure_min_blocks(ds, 4 * num_partitions)
        .map_batches(key, batch_format="pyarrow")
        .groupby("bp")
        .map_groups(pairs, batch_format="pandas")
    )

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


def _shingle_hashes_batch(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Distinct n-gram shingle hashes for a whole batch of texts in one
    vectorized pass: tokenize per doc (C regex), build all n-grams with Arrow
    take+join over the flattened token stream, hash once, dedup per doc.

    Returns (doc_idx, hashes): flat arrays sorted by (doc_idx, hash), one row
    per DISTINCT shingle per doc. ~5x faster than per-doc hashing."""
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
    h = fnv1a64(tri)
    order = np.lexsort((h, tri_doc))
    td, hs = tri_doc[order], h[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (td[1:] != td[:-1]) | (hs[1:] != hs[:-1])
    return td[first], hs[first]


# ----------------------------------------------------------------- exact dedup
def dedup_exact_text(sf_dir: str):
    """Exact dedup on full content: keep the min doc_id per text. The
    canonical hash-partition + per-group-first pattern: groupby shuffles one
    row per doc keyed by content (at scale: key on the 64-bit content hash so
    shuffle rows are narrow, then confirm within group)."""
    ds = _read_docs(sf_dir)

    def key(t: pa.Table) -> pa.Table:
        # narrow shuffle rows: (content_hash, doc_id) only
        return pa.table(
            {"k": pa.array(fnv1a64(t["text"])), "doc_id": t["doc_id"]}
        )

    survivors = (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    return survivors


def dedup_exact_prefix(sf_dir: str, n_tokens: int = 5):
    """Exact dedup on a first-N-tokens prefix key (produces real duplicate
    groups on this corpus). Same shape as dedup_exact_text."""
    ds = _read_docs(sf_dir)

    def key(df: pd.DataFrame) -> pd.DataFrame:
        pref = (
            df["text"]
            .str.lower()
            .str.findall(_TOKEN_RE)
            .map(lambda t: " ".join(t[:n_tokens]))
        )
        return pd.DataFrame({"k": pref, "doc_id": df["doc_id"]})

    return (
        ds.map_batches(key, batch_format="pandas")
        .groupby("k")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


# ------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.4):
    """ALL document pairs with 3-gram-shingle Jaccard ≥ threshold, computed
    exactly: shingle → explode (shingle_hash, doc_id) → per-shingle pair
    emission → pair-count groupby → Jaccard filter against broadcast set
    sizes.

    Scale strategy: the per-shingle group pair emission is quadratic in
    shingle document-frequency — at 100 TB you first drop shingles with
    df > cap (stop-shingles, which can only connect near-identical boilerplate)
    or pre-cluster by MinHash (minhash_lsh_pairs below) and verify only
    candidates. Here df is bounded by the corpus so the exact form runs as-is
    and doubles as the oracle for the MinHash path."""
    import ray

    ds = _read_docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        di, hs = _shingle_hashes_batch(df["text"].tolist(), n)
        return pd.DataFrame(
            {
                "sh": hs.astype(np.int64),  # join key
                "doc_id": df["doc_id"].to_numpy()[di],
            }
        )

    exploded = ds.map_batches(explode, batch_format="pandas")

    # pair counting = self-join on the shingle key. Pairs from different
    # shingles are independent, so at scale this runs per shingle-hash
    # partition (add `part = sh % P`, groupby(part), join within partition);
    # at this corpus size the exploded table is tiny → coalesce and do one
    # vectorized hash self-join.
    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        g = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        return g.rename(columns={"doc_id_x": "a", "doc_id_y": "b", "size": "inter"})

    inter = exploded.repartition(1).map_batches(
        count_pairs, batch_format="pandas", batch_size=None
    )

    # broadcast per-doc shingle-set sizes (narrow: one int per doc)
    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        di, _hs = _shingle_hashes_batch(df["text"].tolist(), n)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "nsh": np.bincount(di, minlength=len(df)).astype(np.int64),
            }
        )

    size_parts = ds.map_batches(sizes, batch_format="pandas").take_all()
    size_map = np.zeros(
        max(r["doc_id"] for r in size_parts) + 1 if size_parts else 1, dtype=np.int64
    )
    for r in size_parts:
        size_map[r["doc_id"]] = r["nsh"]
    sizes_ref = ray.put(size_map)

    def jaccard_filter(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(sizes_ref)
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        inter_n = df["inter"].to_numpy().astype(np.float64)
        union = sm[a] + sm[b] - inter_n
        jac = inter_n / union
        keep = jac >= threshold
        return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})

    return inter.map_batches(jaccard_filter, batch_format="pandas")


# ------------------------------------------------------------- MinHash + LSH
def _minhash_sig(sh_hashes: np.ndarray) -> np.ndarray:
    """64 minhashes via seeded splitmix remix of the shingle hashes."""
    if len(sh_hashes) == 0:
        return np.full(N_MINHASH, np.uint64(0xFFFFFFFFFFFFFFFF))
    m = _remix(sh_hashes[None, :] ^ _MINHASH_SEEDS[:, None])
    return m.min(axis=1)


def minhash_lsh_pairs(sf_dir: str, n: int = 3, threshold: float = 0.4):
    """MinHash+LSH near-dup candidates, verified with exact Jaccard: shingle →
    64 minhashes → 8 banded signatures → band-bucket groupby → candidate
    pairs → exact-Jaccard verify. The scalable path (pair emission only within
    LSH buckets); recall vs the exact ngram_jaccard_pairs is asserted in
    tests. Rows: (doc_a, doc_b)."""
    import ray

    ds = _read_docs(sf_dir)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        # batch-vectorized minhash: one shingle pass for the whole batch,
        # seeded-remix into a (N_MINHASH, total) matrix, per-doc minima via
        # minimum.reduceat, then fold each band with a vectorized remix chain
        di, allh = _shingle_hashes_batch(df["text"].tolist(), n)
        counts = np.bincount(di, minlength=len(df)).astype(np.int64)
        docs_idx = np.flatnonzero(counts > 0)
        sigs = np.full((len(df), N_MINHASH), np.uint64(0xFFFFFFFFFFFFFFFF))
        if len(docs_idx):
            starts = np.concatenate([[0], np.cumsum(counts)])[docs_idx]
            m = _remix(allh[None, :] ^ _MINHASH_SEEDS[:, None])  # (64, total)
            sigs[docs_idx] = np.minimum.reduceat(m, starts, axis=1).T
        bands = sigs.reshape(len(df), N_BANDS, -1)
        acc = np.full((len(df), N_BANDS), np.uint64(0xCBF29CE484222325))
        for r in range(bands.shape[2]):
            acc = _remix((acc ^ bands[:, :, r]).ravel()).reshape(acc.shape)
        ndocs = len(df)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), N_BANDS).astype(np.int64),
                "band": np.tile(np.arange(N_BANDS, dtype=np.int8), ndocs),
                "bhash": acc.ravel().astype(np.int64),
            }
        )

    banded = ds.map_batches(band_rows, batch_format="pandas")

    # candidate pairs share a (band, bucket); buckets are independent → at
    # scale this is a groupby over (band, bhash) with in-bucket pair emission
    # (the LSH point: pair work stays within buckets). Banded rows are
    # 8/doc → tiny here: coalesce + vectorized self-join.
    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=["band", "bhash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (
            m[["doc_id_x", "doc_id_y"]]
            .drop_duplicates()  # dedup candidates across bands
            .rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        )

    cand = banded.repartition(1).map_batches(
        bucket_pairs, batch_format="pandas", batch_size=None
    )

    # verify candidates with exact Jaccard via broadcast shingle sets
    # (documents is the small side here; at 100 TB verification becomes a
    # repartition-join of (doc_id → shingle hashes) against the candidates)
    def shingle_sets(df: pd.DataFrame) -> pd.DataFrame:
        di, hs = _shingle_hashes_batch(df["text"].tolist(), n)
        counts = np.bincount(di, minlength=len(df))
        bounds = np.cumsum(counts)[:-1]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                # already sorted by (doc, hash) → per-doc slices are sorted
                "sh": np.split(hs, bounds),
            }
        )

    parts = _read_docs(sf_dir).map_batches(shingle_sets, batch_format="pandas").take_all()
    sets = {int(r["doc_id"]): np.asarray(r["sh"], dtype=np.uint64) for r in parts}
    sets_ref = ray.put(sets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ss = ray.get(sets_ref)
        keep_a, keep_b = [], []
        for a, b in zip(df["a"], df["b"]):
            sa, sb = ss[int(a)], ss[int(b)]
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pd.DataFrame(
            {"doc_a": np.array(keep_a, dtype=np.int64), "doc_b": np.array(keep_b, dtype=np.int64)}
        )

    return cand.map_batches(verify, batch_format="pandas")


# ----------------------------------------------------------------- SimHash
def simhash(sf_dir: str):
    """(doc_id, simhash): 64-bit SimHash over token hashes — per-bit majority
    vote of ±1 contributions, fully vectorized per doc. Near-dups have small
    Hamming distance (property-tested)."""
    ds = _read_docs(sf_dir)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(df), dtype=np.uint64)
        for i, text in enumerate(df["text"]):
            toks = _TOKEN_RE.findall(text.lower())
            if not toks:
                continue
            h = fnv1a64(pa.array(toks, type=pa.string()))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for b in np.flatnonzero(votes > 0):
                sh |= np.uint64(1) << np.uint64(b)
            out[i] = sh
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out.astype(np.int64)})

    return ds.map_batches(f, batch_format="pandas")


def embed_lsh_pairs(sf_dir: str, threshold: float = 0.35, n_planes: int = 3, n_tables: int = 8):
    """Embedding near-dup via random-hyperplane LSH — the 10^9-vector scale
    path for embed_cosine_pairs: vectors sharing a signature bucket in ANY of
    ``n_tables`` hash tables become candidates, verified exactly. Bucket
    assignment is a vectorized map_batches against broadcast hyperplanes;
    pair emission stays within buckets.

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

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    M = list_col_to_matrix(tbl["embedding"])
    d = M.shape[1]
    # deterministic hyperplanes from the splitmix stream
    raw = _remix(
        (np.arange(n_tables * n_planes * d, dtype=np.uint64) + _U64_ONE)
        * np.uint64(0x9E3779B97F4A7C15)
    )
    planes = (raw.astype(np.float64) / 2**64 - 0.5).reshape(n_tables, n_planes, d)
    planes_ref = ray.put(planes)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def buckets(t: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        X = list_col_to_matrix(t["embedding"])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        rows_id, rows_tbl, rows_sig = [], [], []
        for ti in range(P.shape[0]):
            bits = (Xn @ P[ti].T) > 0  # (n, n_planes)
            sig = (bits @ (1 << np.arange(P.shape[1]))).astype(np.int64)
            rows_id.append(ids)
            rows_tbl.append(np.full(len(ids), ti, dtype=np.int8))
            rows_sig.append(sig)
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(rows_id)),
                "tbl": pa.array(np.concatenate(rows_tbl)),
                "sig": pa.array(np.concatenate(rows_sig)),
            }
        )

    bucketed = ds.map_batches(buckets, batch_format="pyarrow", batch_size=8192)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=["tbl", "sig"])
        m = m[m["vec_id_x"] < m["vec_id_y"]]
        return (
            m[["vec_id_x", "vec_id_y"]]
            .drop_duplicates()
            .rename(columns={"vec_id_x": "a", "vec_id_y": "b"})
        )

    cand = bucketed.repartition(1).map_batches(
        bucket_pairs, batch_format="pandas", batch_size=None
    )

    ids_all = tbl["vec_id"].to_numpy()
    order = np.argsort(ids_all)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    lookup_ref = ray.put((ids_all[order], Mn[order]))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids_sorted, Mn_sorted = ray.get(lookup_ref)
        a = np.searchsorted(ids_sorted, df["a"].to_numpy())
        b = np.searchsorted(ids_sorted, df["b"].to_numpy())
        cos = np.einsum("ij,ij->i", Mn_sorted[a], Mn_sorted[b])
        keep = cos >= threshold
        return pd.DataFrame(
            {"vec_a": df["a"].to_numpy()[keep], "vec_b": df["b"].to_numpy()[keep]}
        )

    return cand.map_batches(verify, batch_format="pandas")


_U64_ONE = np.uint64(1)


# ----------------------------------------------- near-dup cluster resolution
def dedup_clusters(sf_dir: str, n: int = 3, threshold: float = 0.4):
    """Connected components over the verified near-dup pair graph → one
    surviving doc per cluster: (doc_id, cluster_id=min doc_id of component,
    keep=True for the minimum member). The canonical last step of near-dedup.

    Components are computed by iterated min-label propagation over the edge
    list (each round: label[x] = min(label of x, labels of neighbors); rounds
    ≤ graph diameter). Here the candidate pair set is provably small (output
    of minhash_lsh_pairs), so propagation runs vectorized on the driver; at
    scale each round is a groupby(node).min() over the (node, label) edge
    expansion — same math, shuffle-parallel."""
    import pandas as pd

    pairs = minhash_lsh_pairs(sf_dir, n=n, threshold=threshold).to_pandas()
    docs = _read_docs(sf_dir, columns=("doc_id",)).to_pandas()
    label = {int(d): int(d) for d in docs["doc_id"]}
    edges = list(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    out = pd.DataFrame(
        {"doc_id": list(label), "cluster_id": [label[d] for d in label]}
    ).sort_values("doc_id")
    out["keep"] = out["doc_id"] == out["cluster_id"]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# -------------------------------------------------- embedding-cosine near-dup
def embed_cosine_pairs(sf_dir: str, threshold: float = 0.35):
    """All embedding pairs with cosine ≥ threshold: brute-force per batch
    against the broadcast normalized matrix (numpy matmul). The broadcast side
    is ray.put ONCE and read per task — never re-shipped per batch. At 10^9+
    vectors the same stage runs after LSH/IVF bucketing (see
    pipelines/ann.py) so each batch multiplies only against its bucket."""
    import ray
    import pyarrow.parquet as pq

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

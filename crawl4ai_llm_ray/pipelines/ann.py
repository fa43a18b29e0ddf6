"""Similarity search over the embeddings table: brute-force cosine top-k
(baseline) and an IVF-bucketed variant (the scale path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def list_col_to_matrix(col) -> np.ndarray:
    """Zero-copy-ish conversion of a list<float> column to an (n, d) matrix
    (assumes rectangular lists, which the embedding column guarantees)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False)
    offsets = col.offsets.to_numpy()
    widths = np.diff(offsets)
    d = int(widths[0]) if len(widths) else 0
    assert (widths == d).all(), "ragged embedding lists"
    start, end = int(offsets[0]), int(offsets[-1])
    return values[start:end].reshape(-1, d).astype(np.float64)


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    # predicate-pushdown point read: only row groups that can contain the id
    # are decoded (never the full table)
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", query_vec_id)],
    )
    q = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    return q / np.linalg.norm(q)


def _round_half_away(x: np.ndarray, nd: int = 4) -> np.ndarray:
    """SQL-compatible vectorized rounding: DuckDB's round() is half-away-
    from-zero; np.round is banker's (half-to-even) — a cosine scaling to an
    exact .5 dyadic at 4 decimals would diverge (the multimodal decoder
    documents the same pitfall, multimodal.py:_round_half_away)."""
    scale = 10.0 ** nd
    return np.where(x == 0, 0.0, np.floor(np.abs(x) * scale + 0.5) / scale * np.sign(x))


def ann_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Brute-force cosine top-k: per-batch matmul against the broadcast query
    (numpy), then a global sort+limit over the tiny per-batch top-k partials.
    (vec_id, cos) with cos rounded to 4 decimals for oracle comparison."""
    import ray
    import ray.data as rd

    q = _query_vector(sf_dir, query_vec_id)
    q_ref = ray.put(q)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        M = list_col_to_matrix(t["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        cos = M @ qv
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids != query_vec_id
        # per-batch top-k partial: only k rows per batch reach the sort
        ids, cos = ids[keep], cos[keep]
        # round BEFORE pruning and break rounded ties by vec_id DESC — the
        # final sort and the SQL oracle rank on (rounded cos DESC, vec_id
        # DESC), so a raw-cos argpartition could evict the wrong member of
        # a rounded tie straddling the k boundary (ann_topk_multi's fix)
        cos = _round_half_away(cos)
        if len(cos) > k:
            part = np.lexsort((-ids, -cos))[:k]
            ids, cos = ids[part], cos[part]
        return pa.table({"vec_id": pa.array(ids), "cos": pa.array(cos)})

    return (
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
        .sort(["cos", "vec_id"], descending=[True, True])
        .limit(k)
    )


# (sf_dir, n_cells) → (index_dir, centroids): one persisted index per corpus
# per process — queries reuse it, mirroring a real prebuilt-index serving path
_IVF_CACHE: dict[tuple, tuple[str, np.ndarray]] = {}


def build_ivf_index(sf_dir: str, n_cells: int = 16, index_dir: str | None = None):
    """Train + persist an IVF coarse index entirely as dataset ops:

      * centroid training: a deterministic dataset-side sample (vec_id % step
        == 0) — only ``n_cells`` vectors ever reach the driver;
      * assignment: vectorized map_batches against the broadcast centroids;
      * layout: cell-partitioned parquet (``index/data/cell=N/``) written by
        the workers, so a query later reads ONLY its probed cells' fragments.

    Returns (index_dir, normalized centroid matrix). The full embedding table
    is never materialized on the driver (VERDICT r1 item 7)."""
    import os
    import tempfile

    import ray
    import ray.data as rd

    key = (sf_dir, n_cells)
    cached = _IVF_CACHE.get(key)
    if cached is not None and os.path.isdir(cached[0]):
        return cached

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = ds.count()  # parquet metadata only
    step = max(1, n // n_cells)

    def pick_sample(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % step == 0))

    samp = (
        ds.map_batches(pick_sample, batch_format="pyarrow")
        .sort("vec_id")
        .limit(n_cells)
        .take_all()
    )
    if not samp:
        raise ValueError(
            "build_ivf_index: embeddings table is empty — nothing to index"
        )
    cent = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in samp])
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        M = list_col_to_matrix(t["embedding"])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        cells = np.argmax(Mn @ c.T, axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cells))

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    data_dir = os.path.join(index_dir, "data")
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        data_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    _IVF_CACHE[key] = (index_dir, cent)
    return index_dir, cent


def ann_ivf_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_cells: int = 16, n_probe: int = 4):
    """IVF-bucketed ANN (the 10^9-vector scale path): probes the ``n_probe``
    cells nearest the query and reads ONLY those cells' parquet fragments
    from the prebuilt cell-partitioned index (build_ivf_index) — the scan is
    proportional to probed data, not corpus size. Recall vs brute force is
    asserted in tests (rows-only for the driver — not SQL-expressible)."""
    import os

    import ray
    import ray.data as rd

    index_dir, cent = build_ivf_index(sf_dir, n_cells)
    q = _query_vector(sf_dir, query_vec_id)
    probe_cells = np.argsort(-(cent @ q))[:n_probe]
    # one path list per probed cell's fragments — unprobed cells are never read
    paths = [
        os.path.join(d, f)
        for c in probe_cells
        if os.path.isdir(d := os.path.join(index_dir, "data", f"cell={int(c)}"))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    q_ref = ray.put(q)

    ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        M = list_col_to_matrix(t["embedding"])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids != query_vec_id
        cos = Mn[keep] @ qv
        ids = ids[keep]
        # same round-before-prune + vec_id tiebreak contract as ann_topk
        cos = _round_half_away(cos)
        if len(cos) > k:
            part = np.lexsort((-ids, -cos))[:k]
            ids, cos = ids[part], cos[part]
        return pa.table({"vec_id": pa.array(ids), "cos": pa.array(cos)})

    return (
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
        .sort(["cos", "vec_id"], descending=[True, True])
        .limit(k)
    )


# ------------------------------------------------- product quantization (PQ)
# (sf_dir, m, ncent) → (codes_dir, codebooks): one persisted code table per
# corpus per process, like the IVF cache
_PQ_CACHE: dict[tuple, tuple[str, np.ndarray]] = {}


def build_pq_index(
    sf_dir: str,
    m_subs: int = 8,
    n_centroids: int = 16,
    train_cap: int = 4096,
    index_dir: str | None = None,
):
    """Train PQ codebooks and encode the corpus — the memory-side scale path
    for ANN (a 64-dim float64 vector becomes ``m_subs`` uint8 codes: 64× less
    state to scan than the raw matrix; at 10^9 vectors the code table is the
    thing that fits in RAM).

    Deterministic end to end so tests are exact: training sample = vec_id
    stride (dataset-side filter, ≤ ``train_cap`` rows reach the driver),
    codebook init = first ``n_centroids`` sample rows per subspace, 5 fixed
    Lloyd iterations (empty cells keep their previous centroid). Encoding is
    a broadcast-codebook ``map_batches`` (one (b, ncent, sub) distance tensor
    per batch, argmin over centroids); codes persist as narrow parquet
    (vec_id, m uint8 codes as binary)."""
    import os
    import tempfile

    import ray
    import ray.data as rd

    key = (sf_dir, m_subs, n_centroids)
    cached = _PQ_CACHE.get(key)
    if cached is not None and os.path.isdir(cached[0]):  # same staleness
        return cached  # guard as _IVF_CACHE: tmpdir reapers delete indexes

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_rows == 0:
        raise ValueError(
            "build_pq_index: embeddings table is empty — nothing to index"
        )
    # ceil so the stride sample is genuinely ≤ train_cap rows
    step = max(1, -(-n_rows // train_cap))

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def pick_sample(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % step == 0))

    # dataset-side stride filter (like build_ivf_index): only the ≤ train_cap
    # sampled rows ever reach the driver — never the full table
    samp = (
        ds.map_batches(pick_sample, batch_format="pyarrow")
        .sort("vec_id")
        .limit(train_cap)
        .take_all()
    )
    sample = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in samp])
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    d = sample.shape[1]
    assert d % m_subs == 0, (d, m_subs)
    sub_d = d // m_subs
    books = np.empty((m_subs, n_centroids, sub_d))
    for mi in range(m_subs):
        X = sample[:, mi * sub_d : (mi + 1) * sub_d]
        C = X[:n_centroids].copy()
        for _ in range(5):  # fixed Lloyd iterations, deterministic
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_centroids):
                pts = X[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        books[mi] = C

    if index_dir is None:
        # per-process temp dir (like build_ivf_index): no fixed shared path →
        # no cross-process write race, no stale codes after corpus regen
        index_dir = tempfile.mkdtemp(prefix="pq_index_")
    codes_dir = os.path.join(index_dir, "codes")
    books_ref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        B = ray.get(books_ref)
        M = list_col_to_matrix(t["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        n = len(M)
        codes = np.empty((n, m_subs), dtype=np.uint8)
        for mi in range(m_subs):
            X = M[:, mi * sub_d : (mi + 1) * sub_d]
            d2 = ((X[:, None, :] - B[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d2.argmin(axis=1).astype(np.uint8)
        blob = pa.Array.from_buffers(
            pa.binary(m_subs), n, [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({"vec_id": t["vec_id"], "codes": blob})

    ds.map_batches(encode, batch_format="pyarrow").write_parquet(codes_dir)
    _PQ_CACHE[key] = (codes_dir, books)
    return codes_dir, books


def ann_pq_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    m_subs: int = 8,
    n_centroids: int = 16,
    refine: int = 64,
):
    """PQ top-k with exact re-rank: scan the uint8 CODE table (not the
    vectors) with an asymmetric-distance lookup table — per batch the score
    is ``m_subs`` table gathers + a sum, no matmul, no float vectors in
    flight — keep the global top-``refine`` candidates, then re-rank ONLY
    those against their true embeddings (a pushed-down point read) for exact
    cosines. Approximation lives solely in candidate selection; returned
    scores are exact. Recall vs the brute-force baseline is asserted in
    tests (rows-only — the Lloyd iterations are not SQL-expressible)."""
    import ray
    import ray.data as rd

    codes_dir, books = build_pq_index(sf_dir, m_subs, n_centroids)
    q = _query_vector(sf_dir, query_vec_id)
    sub_d = books.shape[2]
    # ADC lookup table: lut[m, c] = q_sub · centroid  (cosine decomposes over
    # subspaces for unit-normalized stored vectors approximated by centroids)
    lut = np.einsum(
        "mcd,md->mc", books, q.reshape(m_subs, sub_d)
    )
    lut_ref = ray.put(lut)

    ds = rd.read_parquet(codes_dir, columns=["vec_id", "codes"])

    def approx(t: pa.Table) -> pa.Table:
        L = ray.get(lut_ref)
        col = t["codes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # honor a sliced block's array offset (fixed-size-binary data buffer
        # starts at col.offset * m_subs bytes)
        codes = np.frombuffer(
            col.buffers()[-1],
            dtype=np.uint8,
            count=len(col) * m_subs,
            offset=col.offset * m_subs,
        ).reshape(-1, m_subs)
        score = L[np.arange(m_subs)[None, :], codes].sum(axis=1)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids != query_vec_id
        ids, score = ids[keep], score[keep]
        if len(score) > refine:
            part = np.argpartition(-score, refine)[:refine]
            ids, score = ids[part], score[part]
        return pa.table({"vec_id": pa.array(ids), "s": pa.array(score)})

    cands = (
        ds.map_batches(approx, batch_format="pyarrow", batch_size=65536)
        .sort(["s", "vec_id"], descending=[True, True])
        .limit(refine)
        .to_pandas()["vec_id"]
        .to_numpy()
    )  # refine ids only — driver-small by construction

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(x) for x in cands])],
    )
    M = list_col_to_matrix(tbl["embedding"])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = _round_half_away(M @ q)  # round BEFORE ranking (tie contract)
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((-ids, -cos))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order]),
            "cos": pa.array(cos[order]),
        }
    )


def ann_topk_multi(sf_dir: str, query_vec_ids=(0, 1, 2, 3, 4, 5, 6, 7), k: int = 5):
    """(query_id, vec_id, cos, rnk): batched multi-query brute-force cosine
    top-k — ONE broadcast (q, d) query matrix (``ray.put`` once, read per
    actor task), one matmul per batch scoring every query against the batch
    at once, per-(batch, query) top-k partials, then a tiny per-query
    finalize over q·k·n_batches partial rows. The standard serving shape for
    embedding search: batch the queries, share the corpus scan — q queries
    cost ~1 corpus pass, not q.

    Ranking happens on the 4-decimal-rounded cosine (ties broken by vec_id
    DESC) so the order is bit-identical to the SQL oracle's
    ``round(list_cosine_similarity(...), 4)`` window."""
    import ray
    import ray.data as rd

    qids = [int(q) for q in query_vec_ids]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", qids)],
    )
    got = tbl["vec_id"].to_numpy()
    order = np.argsort(got)
    Q = list_col_to_matrix(tbl["embedding"])[order]
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qid_arr = got[order].astype(np.int64)
    ref = ray.put((qid_arr, Q))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qa, Qm = ray.get(ref)
        M = list_col_to_matrix(t["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = _round_half_away(M @ Qm.T)  # (n, q), oracle-rounded BEFORE ranking
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        oq, ov, oc = [], [], []
        for j in range(len(qa)):
            keep = ids != qa[j]
            c, v = S[keep, j], ids[keep]
            if len(c) > k:
                # exact (cos DESC, vec_id DESC) top-k — ties at the boundary
                # resolve identically to the oracle's window ordering
                idx = np.lexsort((-v, -c))[:k]
                c, v = c[idx], v[idx]
            oq.append(np.full(len(v), qa[j], dtype=np.int64))
            ov.append(v)
            oc.append(c)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(oq)),
                "vec_id": pa.array(np.concatenate(ov)),
                "cos": pa.array(np.concatenate(oc)),
            }
        )

    def finalize(df):
        df = df.sort_values(
            ["query_id", "cos", "vec_id"], ascending=[True, False, False], kind="stable"
        )
        df["rnk"] = (df.groupby("query_id").cumcount() + 1).astype(np.int64)
        return df[df["rnk"] <= k][["query_id", "vec_id", "cos", "rnk"]]

    return (
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
        .groupby("query_id")
        .map_groups(finalize, batch_format="pandas")
    )


def quantize_embeddings(col) -> np.ndarray:
    """list<float> column → (n, d) int64 fixed-point matrix, the exact
    lockstep of the oracle's
    ``CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)``
    (half-up, NOT banker's rounding — np.round would diverge from SQL at
    .5 boundaries; the inner DOUBLE cast matters — DuckDB evaluates a bare
    FLOAT * decimal-literal product in float32, which lands ~0.005 off at
    this magnitude). float32 → float64 is exact, so both sides quantize the
    same doubles."""
    M = list_col_to_matrix(col)  # float64, exact widening of float32
    return np.floor(M * 1000000.0 + 0.5).astype(np.int64)


def _exact_div(sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Floor-division written as the subtract-nonneg-mod form that is
    semantics-identical in numpy and DuckDB regardless of each side's
    truncation convention: (s - ((s % c) + c) % c) is exactly divisible by
    c, so the final division is exact integer arithmetic on both sides."""
    nnmod = ((sums % counts) + counts) % counts
    return (sums - nnmod) // counts


def kmeans_embed(sf_dir: str, k: int = 4, iters: int = 3, batch_size: int = 4096):
    """(vec_id, cluster): Lloyd's k-means over the embedding column in
    EXACT integer fixed-point arithmetic — quantize once (1e-6 grid), all
    distances / centroid sums are int64, centroid update is exact floor
    division — so the result is bit-deterministic under any batch order /
    parallelism AND replayable centroid-by-centroid in SQL (the same reason
    crawl_pagerank runs fixed-point: float partial sums are
    reduction-order-dependent, which would break both determinism and the
    oracle). Init = the quantized vectors of vec_id 0..k-1; ties in the
    assignment argmin break to the lowest cluster id; an emptied cluster
    keeps its previous centroid.

    Scale shape (the canonical distributed Lloyd's): each iteration is ONE
    streaming ``map_batches`` pass over the corpus — the (k, d) centroid
    matrix rides in the task closure (~k·d·8 B, broadcast once per task, not
    per row), each batch emits k partial rows of (count, per-dim sums), and
    the merge is a single tiny task over k·n_batches narrow rows (never a
    wide shuffle; cluster count is model-sized, not data-sized).
    Re-scanning the corpus per iteration is the standard k-means tradeoff;
    the scan is column-pruned to (vec_id, embedding). Memory: the per-batch
    (B, k, d) int64 distance tensor is ~2 MB at B=4096, k=4, d=64 — sized by
    ``batch_size``.

    Distance values fit int64 by construction: |xq| ≤ ~1e6 ⇒ per-dim square
    ≤ ~4e12, × d=64 ≪ 2^63; centroid sums need n_members·1e6 < 2^63 ⇒ safe
    to ~9e12 members per cluster."""
    import ray.data as rd

    def load():
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    # init: point-read the first k vectors (predicate pushdown, never the
    # full table)
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    )
    tbl = tbl.sort_by("vec_id")
    if tbl.num_rows == 0:
        import ray.data as rd

        # empty corpus (or no vec_id < k): nothing to cluster
        return rd.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        )
    C = quantize_embeddings(tbl["embedding"])  # (k, d)
    d = C.shape[1]

    def assign(X: np.ndarray, C_: np.ndarray) -> np.ndarray:
        diff = X[:, None, :] - C_[None, :, :]  # (B, k, d) int64
        dist = (diff * diff).sum(axis=2)
        return np.argmin(dist, axis=1)  # first min ⇒ lowest cluster id

    for _ in range(iters):
        C_iter = C  # bind per-iteration value into the task closure

        def partial(t: pa.Table) -> pa.Table:
            X = quantize_embeddings(t["embedding"])
            a = assign(X, C_iter)
            S = np.zeros((k, d), dtype=np.int64)
            np.add.at(S, a, X)  # one vectorized scatter-add, exact int64
            cols = {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(np.bincount(a, minlength=k).astype(np.int64)),
            }
            for j in range(d):
                cols[f"s{j}"] = pa.array(S[:, j])
            return pa.table(cols)

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas().groupby("cluster", as_index=False).sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        rows = (
            load()
            .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        newC = C.copy()
        for r in rows:
            c = int(r["cluster"])
            cnt = int(r["cnt"])
            if cnt > 0:
                sums = np.array([r[f"s{j}"] for j in range(d)], dtype=np.int64)
                newC[c] = _exact_div(sums, np.int64(cnt))
        C = newC

    C_final = C

    def out(t: pa.Table) -> pa.Table:
        X = quantize_embeddings(t["embedding"])
        a = assign(X, C_final)
        return pa.table(
            {"vec_id": t["vec_id"], "cluster": pa.array(a.astype(np.int64))}
        )

    return load().map_batches(out, batch_format="pyarrow", batch_size=batch_size)


def label_centroids(sf_dir: str):
    """(label, dim, cq, n_vecs): per-label embedding centroid (class
    prototypes — the grouped-vector aggregate SemDeDup-style semantic
    bucketing and classifier calibration both consume), in the same exact
    int64 fixed point as :func:`kmeans_embed` — quantize(1e-6 grid), integer
    scatter-add partials, exact floor division — so partial merge order
    cannot change a single bit and the SQL twin replays it exactly. Output is
    long-format (one row per label × dimension): label cardinality is
    dimension-sized, so the result is model-sized, not data-sized.

    Scale shape: ONE streaming pass; per batch a (L, d) int64 scatter-add +
    L-row counts (L = max observed label + 1), merged in a single tiny task
    (L·d·n_batches narrow int rows — never a wide shuffle)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        X = quantize_embeddings(t["embedding"])
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sm": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        L = int(lab.max()) + 1
        d = X.shape[1]
        S = np.zeros((L, d), dtype=np.int64)
        np.add.at(S, lab, X)
        cnt = np.bincount(lab, minlength=L).astype(np.int64)
        used = cnt > 0
        labs = np.nonzero(used)[0]
        return pa.table(
            {
                "label": pa.array(np.repeat(labs, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(labs))),
                "sm": pa.array(S[used].ravel()),
                "cnt": pa.array(np.repeat(cnt[used], d)),
            }
        )

    def merge(df):
        g = df.groupby(["label", "dim"], as_index=False).agg(
            sm=("sm", "sum"), cnt=("cnt", "sum")
        )
        g["cq"] = _exact_div(
            g["sm"].to_numpy(np.int64), g["cnt"].to_numpy(np.int64)
        )
        g["n_vecs"] = g["cnt"].astype(np.int64)
        return g[["label", "dim", "cq", "n_vecs"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )

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
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    M = list_col_to_matrix(tbl["embedding"])
    q = M[np.flatnonzero(ids == query_vec_id)[0]]
    return q / np.linalg.norm(q)


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
        if len(cos) > k:
            part = np.argpartition(-cos, k)[:k]
            ids, cos = ids[part], cos[part]
        return pa.table({"vec_id": pa.array(ids), "cos": pa.array(np.round(cos, 4))})

    return (
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
        .sort(["cos", "vec_id"], descending=[True, True])
        .limit(k)
    )


def ann_ivf_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_cells: int = 16, n_probe: int = 4):
    """IVF-bucketed ANN (the 10^9-vector scale path): coarse centroids =
    deterministic sample of the data, every vector assigned to its nearest
    centroid (vectorized map_batches vs broadcast centroids), query probes the
    n_probe nearest cells and scores only those vectors. Recall vs brute force
    is asserted in tests (rows-only for the driver — not SQL-expressible)."""
    import ray
    import ray.data as rd

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = tbl["vec_id"].to_numpy()
    M_all = list_col_to_matrix(tbl["embedding"])
    # deterministic coarse quantizer: every (n/n_cells)-th vector by vec_id order
    order = np.argsort(ids_all)
    step = max(1, len(order) // n_cells)
    cent = M_all[order[::step]][:n_cells]
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    q = _query_vector(sf_dir, query_vec_id)
    probe_cells = np.argsort(-(cent @ q))[:n_probe]
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)
    probe_ref = ray.put(set(int(c) for c in probe_cells))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score_probed(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qv = ray.get(q_ref)
        probe = ray.get(probe_ref)
        M = list_col_to_matrix(t["embedding"])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        cells = np.argmax(Mn @ c.T, axis=1)
        mask = np.isin(cells, list(probe))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask &= ids != query_vec_id
        cos = Mn[mask] @ qv
        ids = ids[mask]
        if len(cos) > k:
            part = np.argpartition(-cos, k)[:k]
            ids, cos = ids[part], cos[part]
        return pa.table({"vec_id": pa.array(ids), "cos": pa.array(np.round(cos, 4))})

    return (
        ds.map_batches(score_probed, batch_format="pyarrow", batch_size=8192)
        .sort(["cos", "vec_id"], descending=[True, True])
        .limit(k)
    )

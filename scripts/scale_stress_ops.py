"""Scale-stress the retrieval / ANN / LM-gate family the way
scale_stress_dedup.py stressed the dedup family: 1x / 4x / 8x corpus,
min-of-2, looking for super-linear wall growth.

Corpora (deterministic, no external data):
- documents: token-salted copies (shared builder from scale_stress_dedup).
- embeddings: k copies of sf0.1/embeddings.parquet with offset vec_ids —
  identical distribution, k x the rows (denser IVF cells, k x kmeans input).

Usage:  python scripts/scale_stress_ops.py [scales ...]   (default 1 4 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from scale_stress_dedup import SF_DIR, build_docs, timed  # noqa: E402

OUT_ROOT = "/tmp/ops_stress"


def build_corpus(scale: int) -> str:
    """documents (salted copies) + embeddings (offset copies) in one dir."""
    docs_dir = build_docs(scale)  # writes documents.parquet under dedup root
    out = f"{OUT_ROOT}/{scale}x"
    os.makedirs(out, exist_ok=True)
    dst = f"{out}/documents.parquet"
    if not os.path.exists(dst):
        shutil.copy(f"{docs_dir}/documents.parquet", dst)
    emb_path = f"{out}/embeddings.parquet"
    if not os.path.exists(emb_path):
        base = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        parts = [base]
        for c in range(1, scale):
            parts.append(
                pa.table(
                    {
                        "vec_id": pc.add(base["vec_id"], 10**9 * c),
                        "embedding": base["embedding"],
                        "label": base["label"],
                    }
                )
            )
        pq.write_table(pa.concat_tables(parts), emb_path)
    return out


def main() -> None:
    import ray

    scales = [int(s) for s in sys.argv[1:]] or [1, 4, 8]
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawl4ai_llm_ray.pipelines import ann, text

    results = []
    for scale in scales:
        d = build_corpus(scale)
        for op, fn in [
            ("bm25_topk", lambda: text.bm25_topk(d)),
            ("unigram_logprob", lambda: text.unigram_logprob(d)),
            ("ann_ivf_topk", lambda: ann.ann_ivf_topk(d)),
            ("kmeans_embed", lambda: ann.kmeans_embed(d)),
        ]:
            sec, rows = timed(fn)
            results.append({"op": op, "scale": scale, "sec": sec, "rows": rows})
            print(json.dumps(results[-1]), flush=True)
    ray.shutdown()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()

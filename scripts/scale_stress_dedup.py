"""Scale-stress the dedup family (VERDICT r4 item 4): run
minhash_lsh_pairs / dedup_clusters / fuzzy_pairs_blocked at 1x / 4x / 8x
corpus scale and record wall time + output rows, looking for super-linear
blowup in the shuffle stages (the drain's equivalent probe found a 10.5x
ingest blowup at 4x before the cuckoo sizing fix).

Corpus construction (deterministic, no external data):
- documents: k token-salted copies of sf0.1/documents.parquet — every token
  of copy c>0 gets suffix c, so cross-copy Jaccard is ~0 and the duplicate
  structure scales LINEARLY (k x the buckets, unchanged bucket sizes).
  Super-linear wall growth therefore indicts the engine, not the data.
- fuzzy URLs: the drain bench's URL shape (1000 hosts, /p/<j> pages, 25%
  messy variants) at k x the page count; block key = host.

Usage:  python scripts/scale_stress_dedup.py [scales ...]   (default 1 4 8)
Prints one JSON line per (op, scale).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/dedup_stress"
TRIALS = int(os.environ.get("GRAFT_STRESS_TRIALS", "2"))


def build_docs(scale: int) -> str:
    out = f"{OUT_ROOT}/{scale}x"
    os.makedirs(out, exist_ok=True)
    path = f"{out}/documents.parquet"
    if os.path.exists(path):
        return out
    base = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    parts = [base]
    for c in range(1, scale):
        salted = pc.replace_substring_regex(
            base["text"], r"([a-z0-9]+)", rf"\1{c}"
        )
        parts.append(
            pa.table(
                {
                    "doc_id": pc.add(base["doc_id"], 10**9 * c),
                    "text": salted,
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), path)
    return out


def build_urls(scale: int) -> pa.Table:
    """Drain-shaped URL corpus: 1000 hosts, scale*20k pages round-robin,
    25% messy variants (trailing slash / fragment)."""
    n = 20_000 * scale
    ids = np.arange(n, dtype=np.int64)
    hi = ids % 1000
    # page token = 16-hex splitmix of the id: distinct pages are far apart in
    # edit distance, so the TRUE pair set is exactly (base, variant) — linear
    # in n. Numeric /p/<j> paths would put every same-host page within
    # distance 2 of another and the pair count would grow quadratically by
    # construction, hiding any engine-side blowup.
    h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    tok = np.array([format(int(x), "016x") for x in h], dtype=object)
    hostpart = pc.binary_join_element_wise(
        "h", pc.utf8_lpad(pc.cast(pa.array(hi), pa.string()), 3, "0"), ".test", ""
    )
    urls = pc.binary_join_element_wise(
        "http://", hostpart, "/p/", pa.array(tok, type=pa.string()), ""
    )
    ndup = n // 4
    slash_v = pc.binary_join_element_wise(urls.slice(0, ndup), "/", "")
    frag_v = pc.binary_join_element_wise(urls.slice(0, ndup), "#x", "")
    variants = pc.if_else(pa.array(ids[:ndup] % 2 == 0), slash_v, frag_v)
    all_urls = pa.concat_arrays(
        [urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
         variants.combine_chunks() if isinstance(variants, pa.ChunkedArray) else variants]
    )
    all_hosts = pa.concat_arrays(
        [hostpart.combine_chunks() if isinstance(hostpart, pa.ChunkedArray) else hostpart,
         (hostpart.slice(0, ndup)).combine_chunks()
         if isinstance(hostpart, pa.ChunkedArray) else hostpart.slice(0, ndup)]
    )
    return pa.table({"url": all_urls, "host": all_hosts})


def timed(fn, trials=TRIALS):
    best, rows = float("inf"), None
    for _ in range(trials):
        t0 = time.time()
        res = fn()
        n = res.count() if hasattr(res, "count") else len(res)
        dt = time.time() - t0
        if dt < best:
            best, rows = dt, n
    return round(best, 2), rows


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

    from crawl4ai_llm_ray.pipelines import dedup

    results = []
    for scale in scales:
        docs_dir = build_docs(scale)

        sec, rows = timed(lambda: dedup.minhash_lsh_pairs(docs_dir))
        results.append({"op": "minhash_lsh_pairs", "scale": scale, "sec": sec, "rows": rows})
        print(json.dumps(results[-1]), flush=True)

        sec, rows = timed(lambda: dedup.dedup_clusters(docs_dir))
        results.append({"op": "dedup_clusters", "scale": scale, "sec": sec, "rows": rows})
        print(json.dumps(results[-1]), flush=True)

        url_tbl = build_urls(scale)
        import ray.data as rd

        def run_fuzzy():
            ds = rd.from_arrow(url_tbl)
            return dedup.fuzzy_pairs_blocked(
                ds, text_col="url", block_col="host", max_dist=2, num_partitions=16
            )

        sec, rows = timed(run_fuzzy)
        results.append({"op": "fuzzy_pairs_blocked", "scale": scale, "sec": sec, "rows": rows})
        print(json.dumps(results[-1]), flush=True)

    ray.shutdown()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()

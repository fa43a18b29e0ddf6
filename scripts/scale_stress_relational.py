"""Scale-stress the relational / events / curation family the way
scale_stress_dedup.py stressed the dedup family and scale_stress_graph.py
the graph family: 1x / 4x / 8x corpus, min-of-2, looking for super-linear
wall growth (every prior family probe found a real issue — cuckoo sizing,
fuzzy candidate blowup, the 1-block groupby pathology).

Corpus construction (deterministic, no external data):
- events: k copies of sf0.1/events.parquet with event_id and user_id offset
  by 1e9*c — user cardinality scales by k, per-user history size is
  unchanged, timestamps unchanged (per-day/window density scales by k,
  the realistic direction).
- orders/lineitem/customer: k copies with o_orderkey/l_orderkey/c_custkey/
  o_custkey offset by 1e9*c; c_nationkey kept (dimension fan-in grows k x).
- region/nation: copied as-is (dimensions don't scale).
- documents: token-salted copies (shared builder from scale_stress_dedup).

Usage:  python scripts/scale_stress_relational.py [scales ...]  (default 1 4 8)
Prints one JSON line per (op, scale).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from scale_stress_dedup import SF_DIR, TRIALS, build_docs, timed  # noqa: E402

OUT_ROOT = "/tmp/rel_stress"

# (table, key columns to offset by 1e9*copy)
SCALED = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
}
DIMS = ["region", "nation"]


def build_corpus(scale: int) -> str:
    out = f"{OUT_ROOT}/{scale}x"
    os.makedirs(out, exist_ok=True)
    for table, keys in SCALED.items():
        path = f"{out}/{table}.parquet"
        if os.path.exists(path):
            continue
        base = pq.read_table(f"{SF_DIR}/{table}.parquet")
        parts = [base]
        for c in range(1, scale):
            cols = {}
            for name in base.column_names:
                col = base[name]
                if name in keys:
                    col = pc.add(col, pa.scalar(10**9 * c, type=col.type))
                cols[name] = col
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts), path)
    for table in DIMS:
        dst = f"{out}/{table}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{SF_DIR}/{table}.parquet", dst)
    docs_dir = build_docs(scale)
    dst = f"{out}/documents.parquet"
    if not os.path.exists(dst):
        shutil.copy(f"{docs_dir}/documents.parquet", dst)
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

    from crawl4ai_llm_ray.pipelines import (
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        text,
    )

    results = []
    for scale in scales:
        d = build_corpus(scale)
        for op, fn in [
            ("asof_join", lambda: relational4.asof_join(d)),
            ("window_tumbling", lambda: relational.window_tumbling(d)),
            ("sessionize", lambda: relational2.sessionize(d)),
            ("event_transitions", lambda: relational5.event_transitions(d)),
            ("rolling_distinct_users", lambda: relational5.rolling_distinct_users(d)),
            ("anomaly_days", lambda: relational5.anomaly_days(d)),
            ("global_rank_orders", lambda: relational5.global_rank_orders(d)),
            ("regional_revenue", lambda: relational4.regional_revenue(d)),
            ("corpus_curation", lambda: text.corpus_curation(d)),
            ("pack_documents", lambda: text.pack_documents(d)),
            # sketches / sampling family (mergeable partials, zero/narrow
            # shuffle by design — the probe checks the claim holds in wall)
            ("approx_distinct_hll", lambda: relational3.approx_distinct_hll(d)),
            ("heavy_hitters_cms", lambda: relational5.heavy_hitters_cms(d)),
            ("bloom_semi_join", lambda: relational.bloom_semi_join(d)),
            ("approx_quantiles_hist", lambda: relational4.approx_quantiles_hist(d)),
            ("weighted_sample_orders", lambda: relational5.weighted_sample_orders(d)),
            ("stratified_sample", lambda: relational4.stratified_sample(d)),
        ]:
            sec, rows = timed(fn, trials=TRIALS)
            results.append({"op": op, "scale": scale, "sec": sec, "rows": rows})
            print(json.dumps(results[-1]), flush=True)
    ray.shutdown()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()

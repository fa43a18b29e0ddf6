"""Per-stage execution report for any driver query — the measurement loop
behind BASELINE.md's stage audits. Runs the query, materializes it, and
prints one compact row per operator: wall, remote UDF time, tasks/blocks,
peak heap — so "where does the time go" is one command, not a profiling
session.

    python scripts/explain.py <query_name> [sf_dir]

(Own Ray session — a script entry point, like bench.py.)
"""

from __future__ import annotations

import os
import re
import sys


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "minhash_lsh_pairs"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    for var in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(var, "1073741824")

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    qs = e.queries()
    if name not in qs:
        print(f"unknown query {name!r}; choose from: {', '.join(qs)}")
        return 2
    import time

    t0 = time.time()
    result = qs[name](sf_dir)
    if not hasattr(result, "stats"):  # pandas/arrow result — no Ray plan
        print(f"{name}: driver-side result ({len(result)} rows), no Ray plan")
        return 0
    m = result.materialize()
    wall = time.time() - t0
    stats = m.stats()
    print(f"{name} @ {sf_dir}: {m.count()} rows in {wall:.2f}s\n")
    op = None
    for line in stats.splitlines():
        mo = re.match(r"Operator (\d+) (\S+?):? (.*)", line)
        if mo:
            op = f"op{mo.group(1)} {mo.group(2).rstrip(':')}"
            print(f"{op:60s} {mo.group(3)}")
        elif "Remote wall time" in line or "Peak heap" in line:
            print(f"    {line.strip().lstrip('*').strip()}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

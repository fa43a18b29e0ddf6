"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count, sorted
column names, order-insensitive value hash). Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
    python scripts/check_correctness.py --json SWEEP_r5.json [sf_dir]

--json writes the full per-query result map (the same shape as the driver's
CORRECTNESS_r{N}.json) so each round commits a whole-registry sweep artifact
instead of relying on the driver's 50-entry window.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_correctness.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "err": f"{type(ex).__name__}: {ex}",
            }
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?   {name}: rows={len(got)} cols={sorted(got.columns)} ({dt:.1f}s) [rows-only]")
            results[name] = {
                # no oracle to compare against: record None (like schema/
                # hash), not a vacuous True — a sweep reader counting
                # rows_match must not see a pass where no check ran
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "ray_rows": len(got),
                "sec": round(dt, 2),
                "err": None,
                "note": "rows-only (no oracle_sql entry)",
            }
            continue
        want = con.sql(sqls[name]).df()
        problems = []
        rows_ok = len(got) == len(want)
        cols_ok = sorted(got.columns) == sorted(want.columns)
        hash_ok = cols_ok and value_hash(got) == value_hash(want)
        if not rows_ok:
            problems.append(f"rows {len(got)} != {len(want)}")
        if not cols_ok:
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif not hash_ok:
            problems.append("value-hash mismatch")
        results[name] = {
            "rows_match": rows_ok,
            "schema_match": cols_ok,
            "hash_match": hash_ok,
            "ray_rows": len(got),
            "oracle_rows": len(want),
            "sec": round(dt, 2),
            "err": None,
        }
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"PASS  {name}: rows={len(got)} ({dt:.1f}s)")
    ray.shutdown()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1)
        print(f"wrote {json_out} ({len(results)} queries, {failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

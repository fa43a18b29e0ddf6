"""Format-agnostic dataset IO.

The north star stores document tables as **Lance** datasets; ``pylance`` is
not installed in this sandbox, so every path goes through a format switch:
``lance`` when importable, else parquet with identical layout semantics
(directory of fragments, resumable). The engine code is format-agnostic —
call ``write_dataset`` / ``read_dataset`` and the switch picks the backend
(reference storage layout analog: SURVEY §1.3 "stored as a Lance dataset;
Parquet fallback").

Also provides the JSON-compat codec: the reference persists records as
schemaless JSON dicts (``/root/reference/crawl4ai_llm/storage/json_storage.py:
92-102``); these readers/writers bridge that world into Arrow datasets.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


_FORMATS = ("auto", "lance", "parquet", "ipc", "csv")


def storage_format(requested: str = "auto") -> str:
    if requested not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {requested!r}")
    if requested == "auto":
        return "lance" if HAVE_LANCE else "parquet"
    if requested == "lance" and not HAVE_LANCE:
        raise RuntimeError("pylance not installed; use format='parquet' or 'auto'")
    return requested


def write_dataset(ds, path: str, format: str = "auto", **kwargs):
    """Write a ray.data.Dataset as a Lance dataset (when available), a
    parquet fragment directory (resumable layout either way), an Arrow-IPC
    fragment directory (``format="ipc"`` — the zero-copy interchange format,
    cheapest encode for shuffle-to-disk intermediates), or CSV
    (``format="csv"`` — interop export only; no types, no compression)."""
    fmt = storage_format(format)
    if fmt == "lance":
        ds.write_lance(path, **kwargs)
    elif fmt == "ipc":
        _write_ipc(ds, path)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)
    return path


def read_dataset(path: str, format: str = "auto", columns=None, **kwargs):
    import ray.data as rd

    fmt = storage_format(format)
    if fmt == "lance" and os.path.exists(os.path.join(path, "_versions")):
        return rd.read_lance(path, columns=columns, **kwargs)
    if fmt == "ipc":
        return _read_ipc(path, columns=columns)
    if fmt == "csv":
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns, **kwargs)


# --------------------------------------------------- Arrow IPC fragment dirs
def _write_ipc(ds, path: str):
    """One ``part-*.arrow`` IPC file per block, written inside the map task
    (the same fused write-in-stage pattern as the crawl drain sink — no extra
    object-store hop) with tmp→rename atomicity; the returned manifest is
    tiny (path, rows)."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import uuid

        name = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        tmp = name + ".tmp"
        with pa.OSFile(tmp, "wb") as f, pa.ipc.new_file(f, t.schema) as w:
            w.write_table(t)
        os.replace(tmp, name)
        return pa.table({"path": [name], "rows": [t.num_rows]})

    return ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).materialize()


def _read_ipc(path: str, columns=None):
    """Fragment-parallel IPC read: the driver lists paths only; each task
    memory-maps its files (zero-copy into Arrow buffers) and projects
    ``columns`` before the data enters the object store."""
    import ray.data as rd

    files = sorted(
        os.path.join(path, n) for n in os.listdir(path) if n.endswith(".arrow")
    )
    if not files:
        raise FileNotFoundError(f"no .arrow fragments under {path}")

    def load(t: pa.Table) -> pa.Table:
        tables = []
        for p in t["path"].to_pylist():
            with pa.memory_map(p, "r") as src:
                tbl = pa.ipc.open_file(src).read_all()
            if columns:
                tbl = tbl.select(columns)
            tables.append(tbl)
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


# ------------------------------------------------------- JSON compat codec
def read_json_records(path: str):
    """Read reference-style JSON record files (one dict per file in a
    directory, or .jsonl) into a Dataset of (id, payload) rows."""
    import ray.data as rd

    if os.path.isdir(path):
        rows = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".json"):
                with open(os.path.join(path, name)) as f:
                    rec = json.load(f)
                rows.append(
                    {"id": str(rec.get("id", name[:-5])), "payload": json.dumps(rec)}
                )
        return rd.from_items(rows)
    return rd.read_json(path)


def json_payload_to_columns(ds, fields: list[str]):
    """Project JSON payload rows to typed columns (vectorized pandas JSON
    parse per batch) — the compat boundary decode (SURVEY §2.8 json.load)."""
    import pandas as pd

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        recs = [json.loads(p) for p in df["payload"]]
        out = {"id": df["id"].values}
        for f in fields:
            out[f] = [r.get(f) for r in recs]
        return pd.DataFrame(out)

    return ds.map_batches(decode, batch_format="pandas")


def write_json_records(ds, path: str):
    """Dataset → directory of JSON-lines files (reference-format export)."""
    ds.write_json(path)
    return path


# ------------------------------------------------ resumable partitioned sink
def write_partitioned(ds, path: str, partition_col: str, format: str = "parquet"):
    """Resumable partitioned write — the generic form of the crawl sink's
    per-wave commit (``pipelines/crawl.py``): one directory per partition
    value, each committed ATOMICALLY (write into ``.tmp_*`` → ``os.replace``
    → ``_SUCCESS`` marker), so a failed run leaves only whole-or-absent
    partitions and a re-run SKIPS every partition that already has its
    marker (the skip check runs inside the task — no driver-side listing of
    a possibly-huge output tree).

    The groupby is the one shuffle; the group fn handles one partition value
    per call, so partition count should be directory-sized (hundreds to
    thousands), exactly like any hive layout. Returns a Dataset manifest
    (partition, rows, skipped)."""
    import pandas as pd
    import pyarrow.parquet as pq_mod

    os.makedirs(path, exist_ok=True)
    fmt = storage_format(format)
    if fmt not in ("parquet", "ipc"):
        raise ValueError(f"write_partitioned supports parquet/ipc, got {fmt!r}")
    # crash hygiene: a task killed mid-write leaves an orphaned .tmp_* dir
    # (never visible to readers — only os.replace publishes); sweep them at
    # the next write so they can't accumulate
    import shutil as _shutil

    for name in os.listdir(path):
        if name.startswith(".tmp_"):
            _shutil.rmtree(os.path.join(path, name), ignore_errors=True)

    def write_group(df: "pd.DataFrame") -> "pd.DataFrame":
        val = df[partition_col].iloc[0]
        final = os.path.join(path, f"{partition_col}={val}")
        marker = os.path.join(final, "_SUCCESS")
        if os.path.exists(marker):
            return pd.DataFrame(
                {"partition": [str(val)], "rows": [0], "skipped": [True]}
            )
        import shutil
        import uuid

        tmp = os.path.join(path, f".tmp_{val}_{uuid.uuid4().hex}")
        os.makedirs(tmp, exist_ok=True)
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        if fmt == "ipc":
            with pa.OSFile(os.path.join(tmp, "part-0.arrow"), "wb") as f, pa.ipc.new_file(
                f, tbl.schema
            ) as w:
                w.write_table(tbl)
        else:
            pq_mod.write_table(tbl, os.path.join(tmp, "part-0.parquet"))
        shutil.rmtree(final, ignore_errors=True)  # partial dir w/o marker
        os.replace(tmp, final)
        with open(marker, "w"):
            pass
        return pd.DataFrame(
            {"partition": [str(val)], "rows": [len(df)], "skipped": [False]}
        )

    return ds.groupby(partition_col).map_groups(
        write_group, batch_format="pandas"
    ).materialize()


def write_clustered(
    ds,
    path: str,
    key_col: str,
    n_ranges: int = 16,
    sample_stride: int = 1024,
    stats_cols: tuple = (),
):
    """Range-CLUSTERED write: TeraSort-style sampled boundaries over
    ``key_col`` (int64), one key-sorted parquet file per range plus a
    ``MANIFEST.json`` recording each file's (min, max, rows). The layout
    that makes point/range reads prune to O(matching files) instead of a
    full scan — the storage-side complement of the engine's
    global_rank_orders machinery (same sampler; sample quality affects only
    file-size balance, never correctness).

    ``stats_cols``: extra int64 columns whose per-file (min, max) are also
    recorded in the manifest — the multi-column pruning hook
    :func:`read_clustered_box` and the Z-order layout build on (per-file
    column stats are exactly what Parquet row-group pruning consults; a
    space-filling-curve sort key is what makes those boxes TIGHT).

    Returns the manifest as a list of dicts (driver-safe: one entry per
    range file)."""
    import json
    import shutil

    import numpy as np
    import pyarrow.parquet as pq_mod

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def sample(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy()
        return pa.table({key_col: pa.array(k[::sample_stride])})

    samp_df = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    if key_col not in samp_df.columns:  # empty input: Ray drops the schema
        samp_df[key_col] = np.array([], dtype=np.int64)
    sampled = np.sort(samp_df[key_col].to_numpy())
    if len(sampled) >= n_ranges:
        q = (np.arange(1, n_ranges) * len(sampled)) // n_ranges
        bounds = np.unique(sampled[q])
    elif len(sampled) > 1:
        bounds = np.unique(sampled)[:-1]
    else:
        bounds = np.array([], dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        rp = np.searchsorted(bounds, t[key_col].to_numpy(), side="right")
        return t.append_column("_rp", pa.array(rp.astype(np.int64)))

    def write_range(df) -> "pd.DataFrame":
        import pandas as pd

        rp = int(df["_rp"].iloc[0])
        df = df.drop(columns=["_rp"]).sort_values(key_col, kind="mergesort")
        fname = os.path.join(path, f"range-{rp:05d}.parquet")
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        pq_mod.write_table(tbl, fname)
        k = df[key_col].to_numpy()
        row = {
            "file": [fname],
            "kmin": [int(k[0])],
            "kmax": [int(k[-1])],
            "rows": [len(df)],
        }
        for c in stats_cols:
            v = df[c].to_numpy()
            row[f"{c}_min"] = [int(v.min())]
            row[f"{c}_max"] = [int(v.max())]
        return pd.DataFrame(row)

    manifest = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_rp")
        .map_groups(write_range, batch_format="pandas")
        .to_pandas()  # one row per range file — driver-safe
    )
    if len(manifest) == 0 or "file" not in manifest.columns:
        # empty input: valid layout with zero files (readers prune to zero)
        with open(os.path.join(path, "MANIFEST.json"), "w") as f:
            json.dump(
                {"key": key_col, "stats_cols": list(stats_cols), "files": []},
                f,
            )
        return []
    manifest = manifest.sort_values("file")
    entries = manifest.to_dict("records")
    with open(os.path.join(path, "MANIFEST.json"), "w") as f:
        json.dump(
            {"key": key_col, "stats_cols": list(stats_cols), "files": entries},
            f,
        )
    return entries


def read_clustered_range(path: str, lo: int, hi: int, columns=None):
    """Range read over a :func:`write_clustered` layout: consult
    MANIFEST.json, read ONLY the files whose [kmin, kmax] overlaps
    [lo, hi], apply the residual filter vectorized. Returns
    ``(dataset, n_files_read, n_files_total)`` so callers (and tests) can
    assert pruning actually happened."""
    import json

    import ray.data as rd

    with open(os.path.join(path, "MANIFEST.json")) as f:
        man = json.load(f)
    key_col = man["key"]
    files = [
        e["file"]
        for e in man["files"]
        if not (e["kmax"] < lo or e["kmin"] > hi)
    ]
    n_total = len(man["files"])
    if not files:
        # preserve the caller's requested schema WITH the real column types
        # (from any manifest file's parquet footer — a hardcoded int64 would
        # break unions/joins on string columns downstream); columns=None
        # must yield the FULL footer schema, like the non-pruned path
        empty = rd.from_arrow(
            _empty_pruned_table(man["files"], columns, fallback=[key_col])
        )
        return empty, 0, n_total
    ds = rd.read_parquet(files, columns=columns)

    def residual(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy()
        keep = (k >= lo) & (k <= hi)
        return t.filter(pa.array(keep))

    return ds.map_batches(residual, batch_format="pyarrow"), len(files), n_total


def _empty_pruned_table(
    manifest_files: list, cols: "list[str] | None", fallback: list[str] = ()
) -> pa.Table:
    """Zero-row table for the all-files-pruned path, typed from a real
    parquet footer of the layout (falls back to int64 only when the layout
    itself is empty). ``cols=None`` means "the caller asked for every
    column" — the full footer schema, matching what read_parquet(columns=None)
    would have returned on the non-empty path (``fallback`` names the
    columns to use only when no footer is readable). One footer read — no
    data pages touched."""
    import pyarrow.parquet as pq

    schema = None
    for e in manifest_files:
        try:
            schema = pq.read_schema(e["file"])
            break
        except (OSError, KeyError):
            continue
    if cols is None:
        if schema is not None:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in schema], schema=schema
            )
        cols = list(fallback)
    fields = []
    for c in cols:
        if schema is not None and schema.get_field_index(c) >= 0:
            fields.append(schema.field(c))
        else:
            fields.append(pa.field(c, pa.int64()))
    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in fields], schema=pa.schema(fields)
    )


def _part1by1(v: "np.ndarray") -> "np.ndarray":
    """Spread each of the low 16 bits of v into even bit positions (Morton
    bit-interleave half, vectorized uint64)."""
    import numpy as np

    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton2(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Z-order (Morton) interleave of two ≤16-bit bucket vectors → int64."""
    import numpy as np

    return (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(np.int64)


def write_zorder(
    ds,
    path: str,
    col_x: str,
    col_y: str,
    n_ranges: int = 16,
    bits: int = 10,
    sample_stride: int = 256,
):
    """Z-ORDER clustered write over two int64 columns — the multi-dimensional
    OPTIMIZE-ZORDER layout (Delta/Iceberg's answer to "range-cluster on ONE
    key can't serve box predicates on TWO"): each column is quantile-bucketed
    to ``bits`` bits via sampled boundaries (rank-normalization, so skewed
    value distributions still fill the curve evenly), the bucket ids are
    Morton-interleaved into a space-filling-curve key, and the rows are
    range-clustered on that key with per-file (min, max) stats of BOTH
    original columns in the manifest. Because the Z-curve keeps 2-D-nearby
    rows in the same file, the per-file boxes are tight and a box read
    prunes to O(files overlapping the box). Sampling affects only layout
    quality, never correctness (reads apply an exact residual filter).

    Returns the manifest entry list (see :func:`write_clustered`)."""
    import numpy as np

    n_buckets = 1 << bits

    def sample(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": t[col_x].to_numpy()[::sample_stride],
                "y": t[col_y].to_numpy()[::sample_stride],
            }
        )

    import pandas as pd

    samp = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    if len(samp) == 0 or "x" not in samp.columns:
        # empty (or sub-stride) input: no bounds — everything buckets to 0;
        # write_clustered's own empty guard then produces the zero-file layout
        samp = pd.DataFrame({"x": [], "y": []})

    def bounds(v: np.ndarray) -> np.ndarray:
        v = np.sort(v)
        if len(v) < 2:
            return np.array([], dtype=np.int64)
        q = (np.arange(1, n_buckets) * len(v)) // n_buckets
        return np.unique(v[np.minimum(q, len(v) - 1)])

    bx, by = bounds(samp["x"].to_numpy()), bounds(samp["y"].to_numpy())

    def zkey(t: pa.Table) -> pa.Table:
        x = np.searchsorted(bx, t[col_x].to_numpy(), side="right")
        y = np.searchsorted(by, t[col_y].to_numpy(), side="right")
        return t.append_column(
            "_z", pa.array(morton2(x.astype(np.uint64), y.astype(np.uint64)))
        )

    return write_clustered(
        ds.map_batches(zkey, batch_format="pyarrow"),
        path,
        "_z",
        n_ranges=n_ranges,
        sample_stride=sample_stride,
        stats_cols=(col_x, col_y),
    )


def read_clustered_box(path: str, preds: dict, columns=None):
    """Box read over a layout whose manifest carries per-file column stats
    (:func:`write_clustered` with ``stats_cols`` / :func:`write_zorder`):
    ``preds`` maps column → (lo, hi) inclusive. Reads ONLY the files whose
    per-column [min, max] intervals ALL overlap the box, then applies the
    exact residual filter. Returns (dataset, n_files_read, n_files_total)."""
    import json

    import numpy as np
    import ray.data as rd

    with open(os.path.join(path, "MANIFEST.json")) as f:
        man = json.load(f)
    for c in preds:
        if c not in man.get("stats_cols", []):
            raise ValueError(f"no per-file stats for column {c!r} in manifest")
    files = [
        e["file"]
        for e in man["files"]
        if all(
            not (e[f"{c}_max"] < lo or e[f"{c}_min"] > hi)
            for c, (lo, hi) in preds.items()
        )
    ]
    n_total = len(man["files"])
    if not files:
        # preserve the caller's requested schema WITH the real column types
        # (see _empty_pruned_table — hardcoded int64 broke string columns);
        # columns=None must yield the FULL footer schema, not just the
        # predicate columns
        empty = rd.from_arrow(
            _empty_pruned_table(man["files"], columns, fallback=list(preds))
        )
        return empty, 0, n_total
    ds = rd.read_parquet(files, columns=columns)

    def residual(t: pa.Table) -> pa.Table:
        keep = np.ones(t.num_rows, dtype=bool)
        for c, (lo, hi) in preds.items():
            v = t[c].to_numpy()
            keep &= (v >= lo) & (v <= hi)
        return t.filter(pa.array(keep))

    return ds.map_batches(residual, batch_format="pyarrow"), len(files), n_total


def compact_layout(
    src_dir: str,
    dst_dir: str,
    target_rows: int = 65536,
    glob: str = "*/*.parquet",
):
    """Small-file COMPACTION for a partitioned layout (the crawl sink writes
    one file per wave x shard — thousands of small files after a long
    crawl): coalesce input files into output files of ~``target_rows`` rows,
    preserving row content exactly (bin-packing by the files' own row
    counts, from parquet FOOTERS only — no data read at planning time).
    Each output bin is written by its own task (read N small files → write
    one), committed atomically via temp + rename; a bin whose output
    already exists is SKIPPED, so a failed compaction resumes where it
    stopped. Returns (n_input_files, n_output_files, n_rows).

    Planning is a driver-side walk of file footers (path + row count per
    file — manifest-sized, not data-sized); the copy work itself is fully
    parallel map_batches over the bin list."""
    import glob as globmod

    import pyarrow.parquet as pq_mod

    files = sorted(globmod.glob(os.path.join(src_dir, glob)))
    counts = [pq_mod.ParquetFile(f).metadata.num_rows for f in files]
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for f, c in zip(files, counts):
        if cur and cur_rows + c > target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += c
    if cur:
        bins.append(cur)
    os.makedirs(dst_dir, exist_ok=True)

    import ray.data as rd

    plan = rd.from_items(
        [{"bin_id": i, "files": "\n".join(b)} for i, b in enumerate(bins)]
    )

    def compact_bin(batch):
        import pandas as pd

        out_rows = []
        for bin_id, file_blob in zip(batch["bin_id"], batch["files"]):
            out = os.path.join(dst_dir, f"compact-{int(bin_id):05d}.parquet")
            fl = file_blob.split("\n")
            if os.path.exists(out):
                out_rows.append((int(bin_id), 0, True))
                continue
            tbl = pa.concat_tables(
                [pq_mod.read_table(f) for f in fl], promote_options="default"
            )
            tmp = out + ".tmp"
            pq_mod.write_table(tbl, tmp)
            os.replace(tmp, out)
            out_rows.append((int(bin_id), tbl.num_rows, False))
        return pd.DataFrame(
            out_rows, columns=["bin_id", "rows", "skipped"]
        )

    manifest = plan.map_batches(
        compact_bin, batch_format="numpy", batch_size=1
    ).to_pandas()
    return len(files), len(bins), int(manifest["rows"].sum())

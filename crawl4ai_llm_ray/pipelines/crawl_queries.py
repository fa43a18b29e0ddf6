"""Crawl-derived queries for the driver contract (rows-only checks — the
strong correctness gate for the crawl is the oracle-parity pytest suite,
tests/test_crawl_parity.py, which asserts exact span-sequence / order / seen
equality).

One small deterministic crawl is cached per process under /tmp and shared by
all crawl queries.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.synth import SynthWebConfig
from .crawl import read_docs, run_crawl

_ENTRY_CFG = SynthWebConfig(seed=42, n_hosts=16, base_pages=24, n_seeds=8)
_N_PARTITIONS = 4
# FIXED output path: the crawl is fully deterministic (pure function of
# _ENTRY_CFG), so a stable location lets the DuckDB oracle SQL for the
# crawl-derived queries read the same docs parquet the engine produced
CRAWL_OUT = "/tmp/crawl4ai_llm_ray_entry/crawl"
# bump whenever crawl/synth/frontier SEMANTICS change: the fingerprint below
# invalidates any cached artifact built by older code, so oracle-vs-engine
# comparisons can never silently run against a stale crawl output
CRAWL_SEMANTICS_VERSION = 3
_cached_out: str | None = None


def _fingerprint() -> str:
    """Identity of the cached crawl artifact: semantics version + full config
    + partitioning (SynthWebConfig is a dataclass — repr is stable and
    field-complete)."""
    return f"v{CRAWL_SEMANTICS_VERSION}|{_ENTRY_CFG!r}|P={_N_PARTITIONS}"


def _fingerprint_ok() -> bool:
    try:
        with open(os.path.join(CRAWL_OUT, "FINGERPRINT")) as f:
            return f.read() == _fingerprint()
    except OSError:
        return False


def ensure_crawl() -> str:
    """Run the flagship crawl once; reuse its (fixed, deterministic) output
    dir across processes. The artifact carries a FINGERPRINT of the code
    version + config that produced it and is rebuilt on mismatch; the build
    happens in a scratch dir and is swapped in atomically under an exclusive
    flock, so concurrent processes never read a half-built artifact or
    rmtree one another's output."""
    global _cached_out
    if _cached_out is not None and _fingerprint_ok():
        return _cached_out
    import fcntl
    import shutil

    parent = os.path.dirname(CRAWL_OUT)
    os.makedirs(parent, exist_ok=True)
    with open(os.path.join(parent, ".crawl.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if not (
                os.path.exists(os.path.join(CRAWL_OUT, "metrics.parquet"))
                and _fingerprint_ok()
            ):
                build = f"{CRAWL_OUT}.build-{os.getpid()}"
                shutil.rmtree(build, ignore_errors=True)
                os.makedirs(build, exist_ok=True)
                run_crawl(
                    _ENTRY_CFG,
                    build,
                    n_partitions=_N_PARTITIONS,
                    fetch_concurrency=4,
                    expected_urls_per_shard=4096,
                )
                with open(os.path.join(build, "FINGERPRINT"), "w") as f:
                    f.write(_fingerprint())
                # atomic swap: retire the stale artifact, rename the build in
                old = f"{CRAWL_OUT}.old-{os.getpid()}"
                shutil.rmtree(old, ignore_errors=True)
                if os.path.exists(CRAWL_OUT):
                    os.rename(CRAWL_OUT, old)
                os.rename(build, CRAWL_OUT)
                shutil.rmtree(old, ignore_errors=True)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    _cached_out = CRAWL_OUT
    return _cached_out


def crawl_interleaved_docs(sf_dir: str = ""):
    """The flagship output: the interleaved document table
    (doc_id, spans:list<struct<kind,text,media_ref,offset>>) per
    BASELINE.json:input_hint."""
    out = ensure_crawl()
    return read_docs(out).select_columns(["doc_id", "spans"])


def crawl_doc_stats(sf_dir: str = ""):
    """Per-doc span-kind counts over the crawled interleaved table —
    vectorized explode/count on the Arrow list column."""
    out = ensure_crawl()

    def stats(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices().to_numpy(zero_copy_only=False)
        kinds = spans.values.field("kind").to_numpy(zero_copy_only=False)
        n = t.num_rows
        out_cols = {"doc_id": t["doc_id"], "url_canon": t["url_canon"], "wave": t["wave"]}
        for kind in ("text", "image", "link"):
            cnt = np.bincount(parent[kinds == kind], minlength=n).astype(np.int64)
            out_cols[f"n_{kind}"] = pa.array(cnt)
        out_cols["n_spans"] = pa.array(
            np.bincount(parent, minlength=n).astype(np.int64)
        )
        return pa.table(out_cols)

    return read_docs(out).map_batches(stats, batch_format="pyarrow")


def crawl_span_explode(sf_dir: str = ""):
    """Explode the interleaved spans into flat rows (doc_id, kind, text,
    media_ref, offset) — zero-copy Arrow flatten via value_parent_indices."""
    out = ensure_crawl()

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices()
        doc_ids = t["doc_id"].take(parent)
        vals = spans.values
        return pa.table(
            {
                "doc_id": doc_ids,
                "kind": vals.field("kind"),
                "text": vals.field("text"),
                "media_ref": vals.field("media_ref"),
                "offset": vals.field("offset"),
            }
        )

    return read_docs(out).map_batches(explode, batch_format="pyarrow")


def crawl_curation(sf_dir: str = ""):
    """The crawl→curation composition: crawled interleaved docs → per-doc
    plain text (text-kind spans joined in span order, fully vectorized:
    filtered ListArray rebuild + one pc.binary_join per batch) → the shared
    curation pass (quality signals + language ID + exact-dedup survivors +
    threshold). This is the end-to-end training-data shape the engine exists
    for: fetch → decompose → curate, every stage streaming and the
    composition oracle-checked against a full SQL replay."""
    import pyarrow.compute as pc

    from .text import curation_over

    out = ensure_crawl()

    def doc_text(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices().to_numpy(zero_copy_only=False)
        vals = spans.values
        is_text = pc.equal(vals.field("kind"), "text").to_numpy(zero_copy_only=False)
        texts = vals.field("text").filter(pa.array(is_text))
        counts = np.bincount(parent[is_text], minlength=t.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), texts), " "
        )
        return pa.table({"doc_id": t["doc_id"], "text": joined})

    docs = read_docs(out).select_columns(["doc_id", "spans"]).map_batches(
        doc_text, batch_format="pyarrow"
    )
    return curation_over(docs)  # unordered — curated output can be huge; no global sort


def crawl_link_popularity(sf_dir: str = "", k: int = 10):
    """Link-graph in-degree ranking over the interleaved docs: explode link
    spans, canonicalize every target (same vectorized kernel as the
    frontier), count references and distinct referring docs per target, top-k
    by (n_refs, n_docs, target). The crawl-analytics shape: most-linked pages
    fall out of the span table without any crawler state."""
    import pyarrow.compute as pc

    from ..functions.urlnorm import canonicalize_urls

    out = ensure_crawl()

    def links(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices()
        vals = spans.values
        mask = pc.equal(vals.field("kind"), "link")
        refs = vals.field("media_ref").filter(mask)
        src = t["doc_id"].take(parent.filter(mask))
        canon = canonicalize_urls(refs)
        ok = pc.is_valid(canon)
        return pa.table(
            {"target": canon.filter(ok), "src_doc": src.filter(ok)}
        )

    def count_per_target(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("target").agg(
            n_refs=("src_doc", "size"), n_docs=("src_doc", "nunique")
        )
        return g.reset_index()

    exploded = read_docs(out).select_columns(["doc_id", "spans"]).map_batches(
        links, batch_format="pyarrow"
    )

    def part(t: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64

        return t.append_column(
            "tp", pa.array((fnv1a64(t["target"]) % np.uint64(16)).astype(np.int64))
        )

    counted = (
        exploded.map_batches(part, batch_format="pyarrow")
        .groupby("tp")
        .map_groups(count_per_target, batch_format="pandas")
    )
    return counted.sort(
        ["n_refs", "n_docs", "target"], descending=[True, True, False]
    ).limit(k)


def crawl_host_stats(sf_dir: str = ""):
    """Per-host crawl summary over the interleaved docs: docs fetched, wave
    span (first/last), and outbound link count — the per-host operational
    view a crawl operator reads next to the frontier metrics. One vectorized
    pass (span kinds counted via value_parent_indices bincount) + a
    dimension-sized host aggregation."""
    out = ensure_crawl()

    def per_batch(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices().to_numpy(zero_copy_only=False)
        kinds = spans.values.field("kind").to_numpy(zero_copy_only=False)
        nlink = np.bincount(parent[kinds == "link"], minlength=t.num_rows).astype(
            np.int64
        )
        return pa.table(
            {
                "host": t["host"],
                "wave": t["wave"],
                "n_links": pa.array(nlink),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("host", as_index=False).agg(
            n_docs=("wave", "size"),
            first_wave=("wave", "min"),
            last_wave=("wave", "max"),
            n_links_out=("n_links", "sum"),
        )

    partials = (
        read_docs(out)
        .select_columns(["host", "wave", "spans"])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas", batch_size=65536)
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        # min/max aren't plain sums, so this is final_agg's shape with the
        # right per-column reducers (host cardinality is dimension-sized)
        return df.groupby("host", as_index=False).agg(
            n_docs=("n_docs", "sum"),
            first_wave=("first_wave", "min"),
            last_wave=("last_wave", "max"),
            n_links_out=("n_links_out", "sum"),
        )

    return partials.repartition(1).map_batches(
        agg, batch_format="pandas", batch_size=None
    )


def crawl_metrics(sf_dir: str = ""):
    """Per-partition/per-wave frontier metrics (offered/admitted/deduped/
    robots_blocked/fetched) — the north_rule lineage+metrics artifact."""
    import pyarrow.parquet as pq

    out = ensure_crawl()
    t = pq.read_table(os.path.join(out, "metrics.parquet"))
    df = t.to_pandas()
    df = df[df[["offered", "admitted", "deduped", "robots_blocked", "fetched"]].sum(axis=1) > 0]
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def doc_lookup(out_dir: str, doc_ids: list[str]):
    """Point/batch read by doc_id over the crawled corpus (reference
    get_product(s) semantics, json_storage.py:300-379): parquet scan with a
    pushed-down ``isin`` filter — only row groups that can contain the keys
    are read. Raises KeyError listing missing ids (the reference's
    ProductNotFoundError contract)."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    import os

    tbl = pq.read_table(
        os.path.join(out_dir, "docs"),
        filters=pc_.field("doc_id").isin(doc_ids),
    )
    found = set(tbl["doc_id"].to_pylist())
    missing = [d for d in doc_ids if d not in found]
    if missing:
        raise KeyError(f"doc ids not found: {missing}")
    return tbl


def crawl_doc_lookup(sf_dir: str = ""):
    """Driver query: point/batch lookup of the three smallest doc_ids
    (deterministic key choice — file order is not)."""
    out = ensure_crawl()
    import pyarrow.parquet as pq

    ids = sorted(
        pq.read_table(os.path.join(out, "docs"), columns=["doc_id"])["doc_id"]
        .to_pylist()
    )[:3]
    return doc_lookup(out, ids)


def crawl_seen_set(sf_dir: str = ""):
    """The final URL-seen set (sorted u64 hashes as int64 for Arrow/SQL)."""
    import pyarrow.parquet as pq

    out = ensure_crawl()
    # `seen/` is partitioned per shard (part-{pid}.parquet); read + sort here
    # is test-scale only — at 10^10 the partitions are consumed as a Dataset
    t = pq.read_table(os.path.join(out, "seen"), columns=["url_hash"])
    idx = pa.compute.sort_indices(t, sort_keys=[("url_hash", "ascending")])
    return pa.table({"url_hash": t["url_hash"].take(idx).cast(pa.uint64())})


def _induced_link_graph(out: str):
    """(nodes, edges) Datasets of the fetched-page link graph: nodes =
    crawled url_canon; edges = link spans canonicalized with the frontier
    kernel, self-loops dropped, restricted to targets that were themselves
    fetched (induced subgraph — a partitioned hash semi-join on dst).
    Shared by crawl_pagerank / crawl_triangles."""
    import pyarrow.compute as pc

    from ..functions.urlnorm import canonicalize_urls

    nodes = read_docs(out).select_columns(["url_canon"]).map_batches(
        lambda t: pa.table({"node": t["url_canon"]}), batch_format="pyarrow"
    )

    def links(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices()
        vals = spans.values
        mask = pc.equal(vals.field("kind"), "link")
        refs = vals.field("media_ref").filter(mask)
        urls = t["url_canon"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        src = urls.take(parent.filter(mask))
        dst = canonicalize_urls(refs)
        ok = pc.is_valid(dst)
        src, dst = src.filter(ok), dst.filter(ok)
        keep = pc.not_equal(src, dst)  # no self-loops
        return pa.table({"src": src.filter(keep), "dst": dst.filter(keep)})

    raw = read_docs(out).select_columns(["url_canon", "spans"]).map_batches(
        links, batch_format="pyarrow"
    )
    fetched = raw.join(
        nodes,
        join_type="inner",
        num_partitions=_N_PARTITIONS,
        on=("dst",),
        right_on=("node",),
    ).select_columns(["src", "dst"])
    return nodes, fetched


def crawl_triangles(sf_dir: str = ""):
    """One-row (n_nodes, n_edges, n_wedges, n_triangles) exact triangle
    census of the fetched-page link graph (undirected view of the induced
    subgraph crawl_pagerank ranks over). Clustering-coefficient-style
    structure summaries are the third member of the crawl graph-analytics
    family next to in-degree (crawl_link_popularity) and PageRank
    (crawl_pagerank). All heavy stages are hash-partitioned joins /
    aggregates in :func:`~.graph.triangle_count`; see its docstring for the
    oriented-wedge scale argument."""
    from .graph import triangle_count

    out = ensure_crawl()
    _, edges = _induced_link_graph(out)
    return triangle_count(edges, num_partitions=_N_PARTITIONS)


def crawl_pagerank(sf_dir: str = "", iters: int = 5, k: int = 20):
    """(url, pr): integer fixed-point PageRank over the fetched-page link
    graph, top-k by (pr DESC, url ASC). Nodes are the crawled pages
    (url_canon); edges are their link spans canonicalized with the same
    frontier kernel and restricted to targets that were themselves fetched
    (the induced subgraph — out-degree counts only those edges, so rank mass
    routes to real pages). 5 rounds of the exact-arithmetic Pregel loop in
    :func:`~.graph.pagerank`; every step bit-identical to the SQL replay.

    Scale shape: edge distinct + out-degree happen in ONE partitioned pass
    (all copies of a (src, dst) edge share the src hash, so drop_duplicates
    and the degree transform are partition-local — no join); the dst∈nodes
    restriction is a partitioned hash semi-join; each PageRank round is a
    narrow (src, dst, outdeg)⋈(node, pr) join plus a (node, inflow) sum."""
    ranks, _ = _pagerank_ranks(iters=iters)

    def out_cols(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["node"], "pr": t["pr"]})

    return (
        ranks.map_batches(out_cols, batch_format="pyarrow")
        .sort(["pr", "url"], descending=[True, False])
        .limit(k)
    )


def _pagerank_ranks(iters: int = 5):
    """Full (node, pr) rank table + the distinct induced edge Dataset —
    shared by crawl_pagerank (top-k view) and crawl_refresh_plan
    (composition)."""
    from ..functions.hashing import fnv1a64
    from .graph import pagerank

    out = ensure_crawl()
    nodes, fetched = _induced_link_graph(out)

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ep", pa.array((fnv1a64(t["src"]) % np.uint64(16)).astype(np.int64))
        )

    def dedup_deg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src", "dst"])[["src", "dst"]].copy()
        df["outdeg"] = df.groupby("src")["dst"].transform("size").astype(np.int64)
        return df

    edges = (
        fetched.map_batches(part, batch_format="pyarrow")
        .groupby("ep")
        .map_groups(dedup_deg, batch_format="pandas")
        .materialize()
    )
    return pagerank(edges, nodes, iters=iters), edges


def crawl_span_signature(sf_dir: str = ""):
    """(doc_id, n_spans, sig): per-document ordered span-kind signature —
    the ','-joined sequence of span kinds in span order (e.g.
    ``text,link,image,text``) plus the span count. The interleaved-payload
    "shape fingerprint": two docs with the same signature have the same
    text/media interleaving, which is the grouping key layout-dedup and
    extraction-template mining both start from.

    Fully vectorized ordered collect: the spans list column's child ``kind``
    array is re-wrapped with the SAME list offsets (zero-copy — order inside
    each list is physical order) and joined with one Arrow
    ``binary_join_element_wise``-free kernel, ``pc.binary_join``. No shuffle
    at all: span order is batch-local by construction."""
    import pyarrow.compute as pc

    out = ensure_crawl()

    def sig(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        kinds = spans.values.field("kind")
        lists = pa.ListArray.from_arrays(spans.offsets, kinds)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pc.cast(pc.list_value_length(spans), pa.int64()),
                "sig": pc.binary_join(lists, ","),
            }
        )

    return (
        read_docs(out)
        .select_columns(["doc_id", "spans"])
        .map_batches(sig, batch_format="pyarrow")
    )


def crawl_host_url_list(sf_dir: str = ""):
    """(host, n_urls, urls): per-host sorted URL roster — ','-joined
    ``url_canon`` in ascending order — the ordered collect_list/string_agg
    operator (per-host seed lists, exclusion rosters, site exports all have
    this shape).

    Scale shape: ONE partitioned shuffle on host-hash (narrow host+url
    rows), then per-partition the collect is fully vectorized: sort by
    (host, url), run-length host boundaries via np.unique → Arrow list
    offsets → one ``pc.binary_join`` kernel per partition. No per-key Python
    (map_groups stays at P partition groups, not host cardinality). Hot
    hosts bound the partition payload exactly as the frontier's salting
    notes: a single host's URL list must fit a block, which is inherent to
    emitting one row per host."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64

    out = ensure_crawl()

    def part(t: pa.Table) -> pa.Table:
        host = t["host"]
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        ep = (fnv1a64(host) % np.uint64(16)).astype(np.int64)
        return pa.table(
            {"host": host, "url": t["url_canon"], "hp": pa.array(ep)}
        )

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "url"], kind="stable")
        hosts = df["host"].to_numpy()
        urls = pa.array(df["url"].to_numpy(), type=pa.string())
        uniq, starts = np.unique(hosts, return_index=True)
        order = np.argsort(starts)  # np.unique sorts; keep first-occurrence
        starts = starts[order]
        offsets = np.append(starts, len(hosts)).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), urls)
        return pa.table(
            {
                "host": pa.array(uniq[order], type=pa.string()),
                "n_urls": pa.array(np.diff(offsets).astype(np.int64)),
                "urls": pc.binary_join(lists, ","),
            }
        ).to_pandas()

    return (
        read_docs(out)
        .select_columns(["host", "url_canon"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("hp")
        .map_groups(collect, batch_format="pandas")
    )


def crawl_media_context(sf_dir: str = ""):
    """(doc_id, media_ref, span_pos, caption_pos, caption): for every media
    span (image/audio) of every interleaved doc, the nearest PRECEDING text
    span in span order — the caption-candidate pairing a multimodal training
    pipeline derives before media decode (positions are 1-based within the
    doc; caption_pos = 0 / caption = '' when no text precedes). This is an
    as-of join at span granularity, done with zero shuffle: span order is
    list order, so one flattened cumulative-max per batch resolves every
    media span's predecessor.

    Vectorization: flatten spans (value_parent_indices), mark text spans
    with their global flat position, ``np.maximum.accumulate`` over the flat
    array, then validate each candidate against its own list's start offset
    (a candidate inherited across a list boundary is always < the start and
    is rejected) — the same segmented-scan trick the asof_join bucket path
    uses, at zero extra memory."""
    import pyarrow.compute as pc  # noqa: F401

    out = ensure_crawl()

    def ctx(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = spans.value_parent_indices().to_numpy(zero_copy_only=False)
        vals = spans.values
        kinds = vals.field("kind").to_numpy(zero_copy_only=False)
        texts = vals.field("text").to_numpy(zero_copy_only=False)
        offsets = spans.offsets.to_numpy().astype(np.int64)
        starts = offsets[:-1][parent]  # each flat element's list start
        gpos = np.arange(len(kinds), dtype=np.int64)
        cand = np.maximum.accumulate(np.where(kinds == "text", gpos, -1))
        sel = (kinds == "image") | (kinds == "audio")
        v = cand[sel] >= starts[sel]
        cap_idx = np.maximum(cand[sel], 0)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(parent[sel])),
                "media_ref": pa.array(
                    vals.field("media_ref").to_numpy(zero_copy_only=False)[sel],
                    type=pa.string(),
                ),
                "span_pos": pa.array(gpos[sel] - starts[sel] + 1),
                "caption_pos": pa.array(
                    np.where(v, cand[sel] - starts[sel] + 1, 0)
                ),
                "caption": pa.array(
                    np.where(v, texts[cap_idx], ""), type=pa.string()
                ),
            }
        )

    return (
        read_docs(out)
        .select_columns(["doc_id", "spans"])
        .map_batches(ctx, batch_format="pyarrow")
    )


def crawl_host_linkage(sf_dir: str = ""):
    """(host, n_intra, n_inter, n_hosts_out): per-host linkage profile over
    the induced link graph — self-links within the host (n_intra),
    cross-host links out (n_inter), and the distinct fan-out host count.
    The assortativity view a crawl operator reads to find link farms (high
    intra) vs hub pages (high fan-out). Counts are over DISTINCT page-level
    edges of the induced subgraph (same edge domain as crawl_pagerank): all
    copies of a (src, dst) edge share src's hash, so the dedup is
    partition-local (the dedup_deg shape) and the partition emits
    pre-aggregated (host_src, host_dst) pair partials; hosts split from the
    canonical URLs with one Arrow regex kernel."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64

    out = ensure_crawl()
    _, edges = _induced_link_graph(out)

    def keyed(t: pa.Table) -> pa.Table:
        ep = (fnv1a64(t["src"]) % np.uint64(8)).astype(np.int64)
        return t.append_column("ep", pa.array(ep))

    def host_pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src", "dst"])
        hs = df["src"].str.extract(r"^http://([^/]*)", expand=False)
        hd = df["dst"].str.extract(r"^http://([^/]*)", expand=False)
        g = pd.DataFrame({"hs": hs, "hd": hd}).groupby(
            ["hs", "hd"], as_index=False
        ).size()
        return pd.DataFrame(
            {
                "hs": g["hs"],
                "hd": g["hd"],
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    pairs = (
        edges.map_batches(keyed, batch_format="pyarrow")
        .groupby("ep")
        .map_groups(host_pair_partials, batch_format="pandas")
        .groupby(["hs", "hd"])
        .sum("n")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        intra = df["hs"].to_numpy() == df["hd"].to_numpy()
        n = df["sum(n)"].to_numpy()
        out_rows = pd.DataFrame(
            {
                "host": df["hs"].to_numpy(),
                "intra": np.where(intra, n, 0).astype(np.int64),
                "inter": np.where(~intra, n, 0).astype(np.int64),
                "fan": (~intra).astype(np.int64),
            }
        )
        g = out_rows.groupby("host", as_index=False).agg(
            n_intra=("intra", "sum"),
            n_inter=("inter", "sum"),
            n_hosts_out=("fan", "sum"),
        )
        for c in ("n_intra", "n_inter", "n_hosts_out"):
            g[c] = g[c].astype(np.int64)
        return g

    # host-pair table is dimension-sized (hosts x avg-fanout); the final
    # per-host rollup groups by src host — partition on hs keeps it exact
    def part(t: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64

        hp = (fnv1a64(t["hs"]) % np.uint64(8)).astype(np.int64)
        return t.append_column("hp", pa.array(hp))

    return (
        pairs.map_batches(part, batch_format="pyarrow")
        .groupby("hp")
        .map_groups(finalize, batch_format="pandas")
    )


def crawl_refresh_plan(sf_dir: str = "", k: int = 20, indeg_weight: int = 100_000):
    """(url, pr, indeg, score): refresh-crawl scheduling — re-fetch priority
    per crawled page as an EXACT integer blend of its PageRank mass and its
    induced in-degree (score = pr + indeg_weight * indeg), top-k by
    (score DESC, url ASC). The composition a crawl operator actually
    schedules from: authority (pr) finds hub pages worth keeping fresh,
    raw in-degree finds newly-popular targets before rank converges.

    Scale shape: full rank table + per-target in-degree (one narrow count)
    are combined WITHOUT a join — union-tagged rows partitioned by node
    hash, one in-partition merge (the triangle-census idiom; Dataset.join
    crashes on zero-row partitions and spawns per-partition aggregator
    actors). Per-partition top-k partials contain the global top-k, so the
    final sort sees P*k rows."""
    from ..functions.hashing import fnv1a64

    ranks, edges = _pagerank_ranks()

    def indeg_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"node": t["dst"].to_numpy(zero_copy_only=False)}
        ).groupby("node", as_index=False).size()
        return pa.table(
            {
                "node": pa.array(df["node"], pa.string()),
                "val": pa.array(df["size"].to_numpy().astype(np.int64)),
                "tag": pa.array(np.ones(len(df), dtype=np.int64)),
            }
        )

    def rank_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "val": t["pr"],
                "tag": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    tagged = (
        ranks.map_batches(rank_rows, batch_format="pyarrow")
        .union(edges.map_batches(indeg_partial, batch_format="pyarrow"))
    )

    def keyed(t: pa.Table) -> pa.Table:
        npart = (fnv1a64(t["node"]) % np.uint64(8)).astype(np.int64)
        return t.append_column("np", pa.array(npart))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[df["tag"] == 0][["node", "val"]].rename(columns={"val": "pr"})
        ind = (
            df[df["tag"] == 1]
            .groupby("node", as_index=False)["val"]
            .sum()
            .rename(columns={"val": "indeg"})
        )
        m = pr.merge(ind, on="node", how="left").fillna({"indeg": 0})
        m["indeg"] = m["indeg"].astype(np.int64)
        m["score"] = m["pr"].to_numpy() + indeg_weight * m["indeg"].to_numpy()
        m = m.sort_values(
            ["score", "node"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "url": m["node"],
                "pr": m["pr"].to_numpy().astype(np.int64),
                "indeg": m["indeg"].to_numpy(),
                "score": m["score"].to_numpy().astype(np.int64),
            }
        )

    return (
        tagged.map_batches(keyed, batch_format="pyarrow")
        .groupby("np")
        .map_groups(combine, batch_format="pandas")
        .sort(["score", "url"], descending=[True, False])
        .limit(k)
    )


def crawl_compacted_docs(sf_dir: str = "", target_rows: int = 4096):
    """(doc_id, url_canon, wave) read back from a COMPACTED copy of the
    crawl's wave-partitioned doc layout — the storage-lifecycle op a
    long-running crawl needs (one file per wave x shard accumulates
    thousands of small files; compaction bin-packs them into
    ~``target_rows`` files from parquet footers only, resumable per bin,
    sources/io.py compact_layout). The oracle reads the ORIGINAL layout:
    equality proves compaction preserved every row exactly."""
    import shutil
    import tempfile

    from ..sources.io import compact_layout

    out = ensure_crawl()
    dst = tempfile.mkdtemp(prefix="compacted_docs_")
    n_in, n_out, _ = compact_layout(
        os.path.join(out, "docs"), dst, target_rows=target_rows
    )
    assert n_out <= n_in
    import ray.data as rd

    got = (
        rd.read_parquet(dst, columns=["doc_id", "url_canon", "wave"])
        .materialize()
    )
    shutil.rmtree(dst, ignore_errors=True)
    return got


def crawl_fuzzy_url_pairs(sf_dir: str = "", max_dist: int = 2):
    """(url_a, url_b, dist): every same-host pair of fetched URLs within
    Levenshtein distance ``max_dist``, url_a < url_b — near-duplicate URL
    mining over the crawl corpus (the synthetic web's ~25% dup variants are
    exactly this shape: query-string reorderings, fragment strips, trailing
    slashes). Feeds canonicalization-rule discovery and trap detection; the
    reference crawler (702ron/crawl4ai_llm) normalizes single URLs but has
    no corpus-level similarity op. Blocking key = host (the crawl's natural
    partition key — a frontier shard already co-locates it); kernel =
    :func:`~.dedup.fuzzy_pairs_blocked` (one hash shuffle, closed-form
    candidate ranks, band-limited vectorized DP; see its scale contract)."""
    from .dedup import fuzzy_pairs_blocked

    out = ensure_crawl()
    ds = read_docs(out).select_columns(["url_canon", "host"])
    pairs = fuzzy_pairs_blocked(
        ds,
        text_col="url_canon",
        block_col="host",
        max_dist=max_dist,
        num_partitions=_N_PARTITIONS,
    )

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "url_a": pa.array([], pa.string()),
                    "url_b": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        return pa.table({"url_a": t["a"], "url_b": t["b"], "dist": t["dist"]})

    return pairs.map_batches(rename, batch_format="pyarrow")


def crawl_url_templates(sf_dir: str = ""):
    """(host, template, n_urls, url_min): URL structure mining — collapse
    every digit run in the canonical URL to ``{n}`` and count URLs per
    (host, template), keeping the lexicographically first concrete URL as
    the exemplar. The crawl-operations view behind crawler-trap detection
    (a template with an unbounded count is a calendar/session-id trap) and
    per-template scheduling; crawl4ai normalizes single URLs only. One
    vectorized Arrow regex kernel per batch + per-batch partial counts;
    the final aggregate is dimension-sized (distinct templates), same
    funnel contract as crawl_host_stats."""
    out = ensure_crawl()

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tmpl = pc.replace_substring_regex(t["url_canon"], r"[0-9]+", "{n}")
        return pa.table(
            {"host": t["host"], "template": tmpl, "url": t["url_canon"]}
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["host", "template"], as_index=False).agg(
            n_urls=("url", "size"), url_min=("url", "min")
        )

    partials = (
        read_docs(out)
        .select_columns(["url_canon", "host"])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas", batch_size=65536)
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["host", "template"], as_index=False).agg(
            n_urls=("n_urls", "sum"), url_min=("url_min", "min")
        )

    return partials.repartition(1).map_batches(
        agg, batch_format="pandas", batch_size=None
    )


def crawl_seed_distance(sf_dir: str = ""):
    """(url, dist): minimum link-hop distance of every fetched page from the
    crawl's seed set over the induced link graph (-1 if unreachable — cannot
    occur for a real crawl, where every fetched page was discovered through
    fetched parents; the column exists for the general operator contract).
    The seed-proximity signal crawl schedulers weight next to PageRank
    (crawl_refresh_plan); multi-source BFS via
    :func:`~.graph.bfs_distance` — join + min-aggregate rounds, exact
    integers, recursive-CTE SQL twin."""
    from ..functions.urlnorm import canonicalize_urls
    from ..sources.synth import seed_table
    from .graph import bfs_distance

    out = ensure_crawl()
    nodes, edges = _induced_link_graph(out)
    seeds = canonicalize_urls(seed_table(_ENTRY_CFG)["url"]).to_pylist()
    # P=2, not _N_PARTITIONS: the entry crawl's induced graph is ~10^2
    # nodes and each BFS round spawns one aggregator actor per partition —
    # at this size partition count is pure framework cost (the CC docstring's
    # measured P=8 -> 54 s vs P=2 -> 27 s effect); at real scale callers pass
    # a label-table-sized P
    dist = bfs_distance(edges, nodes, {s for s in seeds if s}, num_partitions=2)

    def out_cols(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["node"], "dist": t["dist"]})

    return dist.map_batches(out_cols, batch_format="pyarrow")


def crawl_url_clusters(sf_dir: str = "", max_dist: int = 2):
    """(url, canonical_url, keep): near-duplicate URL entity resolution —
    the full ER composition over the crawl corpus: blocked edit-distance
    pairs (:func:`crawl_fuzzy_url_pairs` machinery) → undirected edges →
    distributed min-label connected components (:func:`~.dedup
    .connected_components`) → canonical member mapped back to its URL.
    The URL-space analog of dedup_clusters' document pipeline: cluster
    query-string/fragment variants of the same page so the fetch scheduler
    spends budget once per entity. keep marks the canonical row.

    Node labels are ``url_hash >> 1`` (the frontier's FNV-1a-64 of the
    canonical URL, shifted into non-negative int64 so connected_components'
    monotone-sum fixpoint stays exact) — canonical member = min hash, an
    arbitrary-but-deterministic choice the SQL twin replays bit-for-bit
    (same FNV, same shift, least()); a 64-bit collision would merge two
    clusters, the same documented tradeoff as the repo's other hash-keyed
    dedup paths. Recursive-CTE SQL twin over levenshtein pairs."""
    from ..functions.hashing import fnv1a64
    from .dedup import connected_components, fuzzy_pairs_blocked

    out = ensure_crawl()
    ds = read_docs(out).select_columns(["url_canon", "host"])
    pairs = fuzzy_pairs_blocked(
        ds,
        text_col="url_canon",
        block_col="host",
        max_dist=max_dist,
        num_partitions=_N_PARTITIONS,
    )

    def node_ids(t: pa.Table) -> pa.Table:
        hid = (t["url_hash"].to_numpy() >> np.uint64(1)).astype(np.int64)
        return pa.table({"node": pa.array(hid), "url": t["url_canon"]})

    mapping = (
        read_docs(out)
        .select_columns(["url_canon", "url_hash"])
        .map_batches(node_ids, batch_format="pyarrow")
        .materialize()
    )
    nodes = mapping.select_columns(["node"])

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        ha = (fnv1a64(t["a"]) >> np.uint64(1)).astype(np.int64)
        hb = (fnv1a64(t["b"]) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([ha, hb])),
                "dst": pa.array(np.concatenate([hb, ha])),
            }
        )

    edges = pairs.map_batches(expand, batch_format="pyarrow")
    # P=2 for the same tiny-graph aggregator-cost reason as crawl_seed_distance
    labels = connected_components(edges, nodes, num_partitions=2)
    with_url = labels.join(
        mapping,
        join_type="inner",
        num_partitions=_N_PARTITIONS,
        on=("node",),
    )
    canon = mapping.rename_columns({"node": "label", "url": "canonical_url"})
    joined = with_url.join(
        canon,
        join_type="inner",
        num_partitions=_N_PARTITIONS,
        on=("label",),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": t["url"],
                "canonical_url": t["canonical_url"],
                "keep": pc.equal(t["url"], t["canonical_url"]),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def crawl_redirect_resolve(sf_dir: str = "", max_dist: int = 2):
    """(url, final_url): resolve synthetic same-host REDIRECT CHAINS to
    their terminal target via pointer doubling (:func:`~.graph
    .pointer_jump_resolve` — ⌈log2 chain-length⌉ partitioned self-joins, the
    web-scale redirect/alias-flattening shape). Chains are built
    deterministically from the corpus itself: within every fuzzy URL cluster
    (edit distance ≤ ``max_dist``, :func:`crawl_fuzzy_url_pairs` machinery)
    each member redirects to its lexicographic predecessor, so the terminal
    target is the cluster's lexicographic minimum; singleton URLs are their
    own target. Node ids are ``url_hash >> 1`` (the crawl_url_clusters
    convention); a recursive-CTE SQL twin follows the same parent edges to
    the fixpoint."""
    from ..functions.hashing import fnv1a64
    from .dedup import fuzzy_pairs_blocked
    from .graph import pointer_jump_resolve

    out = ensure_crawl()
    ds = read_docs(out).select_columns(["url_canon", "host"])
    pairs = fuzzy_pairs_blocked(
        ds,
        text_col="url_canon",
        block_col="host",
        max_dist=max_dist,
        num_partitions=_N_PARTITIONS,
    )

    def node_ids(t: pa.Table) -> pa.Table:
        hid = (t["url_hash"].to_numpy() >> np.uint64(1)).astype(np.int64)
        return pa.table({"node": pa.array(hid), "url": t["url_canon"]})

    mapping = (
        read_docs(out)
        .select_columns(["url_canon", "url_hash"])
        .map_batches(node_ids, batch_format="pyarrow")
        .materialize()
    )

    # parent edges: within each CLUSTER each url points at its predecessor.
    # A cluster is connected through same-host edit-distance pairs; the
    # lexicographic predecessor within the PAIR list suffices: for url u,
    # parent(u) = min over pairs {a: (a, u) with a < u} — the smallest
    # direct neighbor below u. Chains then descend monotonically and
    # pointer-jumping terminates at each cluster's local minimum reachable
    # by descending steps. (Fuzzy pairs within a cluster are dense for the
    # synthetic dup variants — each variant pairs with its canonical form —
    # so the descent reaches the cluster minimum; the pytest asserts
    # fixpoint + minimality per connected component.)
    def parent_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"url": pd.Series([], dtype=object),
                 "parent_url": pd.Series([], dtype=object)}
            )
        g = df.groupby("b", as_index=False)["a"].min()
        return g.rename(columns={"b": "url", "a": "parent_url"})

    parents_str = pairs.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"]})
        if t.num_rows
        else pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        ),
        batch_format="pyarrow",
    ).repartition(1).map_batches(
        parent_partial, batch_format="pandas", batch_size=None
    )

    def to_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "url" not in t.column_names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "parent": pa.array([], pa.int64())}
            )
        nid = (fnv1a64(t["url"]) >> np.uint64(1)).astype(np.int64)
        pid = (fnv1a64(t["parent_url"]) >> np.uint64(1)).astype(np.int64)
        return pa.table({"node": pa.array(nid), "parent": pa.array(pid)})

    chain_edges = parents_str.map_batches(to_ids, batch_format="pyarrow")

    # roots: every url without a smaller neighbor points at itself
    with_parent = chain_edges.materialize()
    all_nodes = mapping.select_columns(["node"])

    def self_loop(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "parent": t["node"]})

    # one id per non-root url — dimension-sized; sorted ONCE on the driver so
    # each batch's membership test is one vectorized searchsorted, not a
    # per-batch set→array conversion
    ids_with_parent = np.sort(
        with_parent.select_columns(["node"]).to_pandas()["node"].to_numpy()
    )

    def roots_only(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        pos = np.searchsorted(ids_with_parent, node)
        pos_c = np.clip(pos, 0, max(0, len(ids_with_parent) - 1))
        hit = (
            (ids_with_parent[pos_c] == node)
            if len(ids_with_parent)
            else np.zeros(len(node), dtype=bool)
        )
        keep = ~hit
        return pa.table({"node": pa.array(node[keep]), "parent": pa.array(node[keep])})

    parents = with_parent.union(
        all_nodes.map_batches(roots_only, batch_format="pyarrow")
    )
    resolved = pointer_jump_resolve(parents, num_partitions=2)
    with_url = resolved.join(
        mapping, join_type="inner", num_partitions=2, on=("node",)
    )
    canon = mapping.rename_columns({"node": "root", "url": "final_url"})
    joined = with_url.join(
        canon, join_type="inner", num_partitions=2, on=("root",)
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["url"], "final_url": t["final_url"]})

    return joined.map_batches(finish, batch_format="pyarrow")

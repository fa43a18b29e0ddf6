"""Text-analysis operators over the documents table — the training-data
pipeline staples: token counting, quality scoring, language ID, document
fingerprinting. All vectorized (pyarrow.compute regex kernels / pandas str)
with DuckDB-oracle-compatible definitions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-z0-9]+"
STOPWORDS = ("the", "a", "of", "to", "and")
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "fr": ("le", "la", "de"),
    "de": ("der", "die", "das"),
}


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _word_counts(low, words) -> dict:
    """One \\b-anchored regex count per DISTINCT word over the lowercased
    batch — the stopword and language-marker lists overlap ('the', 'a',
    'of'), so computing per-word counts once removes redundant full-text
    scans from the hot curation path."""
    return {
        w: pc.cast(pc.count_substring_regex(low, rf"\b{w}\b"), pa.int64())
        .to_numpy(zero_copy_only=False)
        for w in words
    }


def _signals_batch(low):
    """(n_tok, stop_hits, stop_ratio, lang_pred) for a lowercased batch —
    THE definition of the curation signals, shared by quality_score,
    lang_id and curation_over so the composed pass can never drift from
    the individually oracle-checked operators."""
    n_tok = (
        pc.cast(pc.count_substring_regex(low, TOKEN_RE), pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    need = sorted(set(STOPWORDS) | {w for ws in LANG_MARKERS.values() for w in ws})
    wc = _word_counts(low, need)
    stop_hits = sum(wc[w] for w in STOPWORDS)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(n_tok > 0, stop_hits / n_tok.astype(np.float64), 0.0)
    langs = sorted(LANG_MARKERS)  # deterministic tie-break: first max wins
    mat = np.stack([sum(wc[w] for w in LANG_MARKERS[lg]) for lg in langs])
    best = np.argmax(mat, axis=0)
    best_score = mat[best, np.arange(mat.shape[1])]
    pred = np.array(langs, dtype=object)[best]
    pred[best_score == 0] = "unk"
    return n_tok, stop_hits, ratio, pred


def token_count(sf_dir: str):
    """(doc_id, n_tokens): tokens = maximal [a-z0-9]+ runs of the lowercased
    text. Single vectorized Arrow regex kernel per batch."""

    def f(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        n = pc.count_substring_regex(low, TOKEN_RE)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def quality_score(sf_dir: str):
    """(doc_id, n_tokens, stop_hits, stop_ratio, punct_n): cheap quality
    signals for corpus filtering. stop_ratio is a single IEEE division of two
    exact ints — bit-identical to the SQL oracle."""

    def f(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        n_tok, stop_hits, ratio, _ = _signals_batch(low)
        punct_n = pc.cast(pc.count_substring_regex(low, r"[^a-z0-9 ]"), pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "stop_hits": pa.array(stop_hits),
                "stop_ratio": pa.array(ratio),
                "punct_n": punct_n,
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def lang_id(sf_dir: str):
    """(doc_id, lang_pred): marker-token language heuristic — argmax of
    per-language marker hits, ties broken by language-name order, all-zero →
    'unk'. (An n-gram model would slot into the same stage shape.)"""

    def f(t: pa.Table) -> pa.Table:
        _, _, _, pred = _signals_batch(pc.utf8_lower(t["text"]))
        return pa.table(
            {"doc_id": t["doc_id"], "lang_pred": pa.array(pred, type=pa.string())}
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str):
    """(doc_id, fp): md5 content fingerprint (hex). md5 is used here because
    the DuckDB oracle must reproduce it; the engine-internal fingerprint for
    the frontier is the vectorized FNV-1a-64 (functions/hashing.py)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["fp"] = [
            hashlib.md5(s.encode("utf-8")).hexdigest() for s in df["text"]
        ]
        return df[["doc_id", "fp"]]

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas")


def deterministic_sample(sf_dir: str, hex_digits: tuple[str, ...] = ("0", "1")):
    """Deterministic 1/8 content sample: keep docs whose md5(text) starts
    with a digit in ``hex_digits`` — the hash-based sampling pattern
    (reproducible across runs/engines, unlike RNG sampling; used for
    train/validation splits and A/B corpus cuts). SQL-oracle-checked."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.fromiter(
            (
                hashlib.md5(s.encode("utf-8")).hexdigest()[0] in hex_digits
                for s in df["text"]
            ),
            dtype=bool,
            count=len(df),
        )
        return df[keep][["doc_id", "text"]]

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas")


def corpus_curation(
    sf_dir: str,
    min_tokens: int = 30,
    max_stop_ratio: float = 0.2,
    lang: str = "en",
    num_partitions: int = 8,
):
    """The canonical training-corpus curation pass, composed end to end:
    per-doc quality signals + language ID (one vectorized map_batches),
    exact-dedup survivorship (narrow content-hash groupby), then a
    partitioned hash join + threshold filter. Output: the curated doc list
    (doc_id, n_tokens, stop_ratio, lang_pred). Every constituent signal is
    individually oracle-green; the composition is oracle-checked too.

    Scale shape: signals never leave their batch; the join ships only
    (doc_id, 3 narrow columns) × (doc_id) — no text moves after the first
    pass."""
    return curation_over(
        _read_docs(sf_dir), min_tokens, max_stop_ratio, lang, num_partitions
    )


def curation_over(
    docs,
    min_tokens: int = 30,
    max_stop_ratio: float = 0.2,
    lang: str = "en",
    num_partitions: int = 8,
):
    """corpus_curation over ANY (doc_id, text) Dataset — shared by the
    documents-table query and the crawl→curation composition (crawled docs'
    doc_id is a string key; the exact-dedup survivor is min doc_id per
    content, computed with the same narrow content-hash groupby)."""
    def signals(t: pa.Table) -> pa.Table:
        # THE shared signal definition (_signals_batch) — the composed pass
        # can never drift from the individually oracle-checked operators
        n_tok, _, ratio, pred = _signals_batch(pc.utf8_lower(t["text"]))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "stop_ratio": pa.array(ratio),
                "lang_pred": pa.array(pred, type=pa.string()),
            }
        )

    sigs = docs.map_batches(signals, batch_format="pyarrow")

    from .dedup import exact_survivors

    survivors = exact_survivors(docs, num_partitions)
    joined = sigs.join(
        survivors,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def threshold(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_tokens"], min_tokens),
                pc.less_equal(t["stop_ratio"], max_stop_ratio),
            ),
            pc.equal(t["lang_pred"], lang),
        )
        return t.filter(keep)

    return joined.map_batches(threshold, batch_format="pyarrow")


def shared_passage_pairs(
    sf_dir: str,
    n: int = 4,
    window: int = 8,
    min_shared: int = 2,
    n_fp_parts: int = 32,
    n_pair_parts: int = 32,
    max_fp_df: int | None = None,
):
    """Passage-level near-dup pairs via WINNOWING (the RefinedWeb-style
    duplicated-passage detector): per doc, the rolling 4-gram hash sequence →
    sliding-window (w=8) minima → the DISTINCT selected fingerprints; any two
    docs sharing ≥ ``min_shared`` fingerprints are emitted as
    (doc_a, doc_b, n_shared). A shared passage of ≥ window+n-1 tokens
    guarantees a shared fingerprint, so long copied passages are caught even
    when whole-doc similarity is low — the complement of minhash_lsh_pairs.

    Scale shape (the ngram_jaccard partial-emit pattern over a ~w× SPARSER
    row set): explode (fp, doc) → groupby(fp % P) partition-complete pair
    partials → groupby(a % P) sums + threshold. Fingerprint document
    frequency is the skew axis: ``max_fp_df`` drops boilerplate fingerprints
    above the cap (exact within partition, logged, like max_shingle_df).
    Window minima are computed batch-wide with ONE sliding_window_view over
    the flattened hash stream (windows crossing doc boundaries masked out).
    SQL-oracle-checked (window min + self-join replay)."""
    from .dedup import _shingle_hashes_positional

    def fingerprints(df: pd.DataFrame) -> pd.DataFrame:
        tri_doc, h = _shingle_hashes_positional(df["text"].tolist(), n)
        if len(h) < window:
            return pd.DataFrame(
                {
                    "fp": np.empty(0, np.int64),
                    "doc_id": np.empty(0, np.int64),
                    "part": np.empty(0, np.int64),
                }
            )
        sw = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
        ok = tri_doc[: len(sw)] == tri_doc[window - 1 :]  # window inside one doc
        sel_doc = tri_doc[: len(sw)][ok]
        sel_val = sw[ok]
        # distinct (doc, fp)
        order = np.lexsort((sel_val, sel_doc))
        d, v = sel_doc[order], sel_val[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        d, v = d[first], v[first]
        return pd.DataFrame(
            {
                "fp": v.astype(np.int64),
                "doc_id": df["doc_id"].to_numpy()[d],
                "part": (v % np.uint64(n_fp_parts)).astype(np.int64),
            }
        )

    exploded = _read_docs(sf_dir).map_batches(fingerprints, batch_format="pandas")

    _PART_EMPTY = pd.DataFrame(
        {
            "a": np.empty(0, np.int64),
            "b": np.empty(0, np.int64),
            "c": np.empty(0, np.int64),
            "ap": np.empty(0, np.int64),
        }
    )

    def emit_partials(df: pd.DataFrame) -> pd.DataFrame:
        if max_fp_df is not None:
            big = df.groupby("fp")["fp"].transform("size") > max_fp_df
            if big.any():
                print(
                    f"shared_passage_pairs: dropped {df[big]['fp'].nunique()} "
                    f"fingerprints > max_fp_df={max_fp_df}"
                )
            df = df[~big]
        m = df.merge(df, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return _PART_EMPTY
        g = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        a = g["doc_id_x"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "a": a,
                "b": g["doc_id_y"].to_numpy().astype(np.int64),
                "c": g["size"].to_numpy().astype(np.int64),
                "ap": a % n_pair_parts,
            }
        )

    partials = exploded.groupby("part").map_groups(
        emit_partials, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False)["c"].sum()
        g = g[g["c"] >= min_shared]
        return pd.DataFrame(
            {
                "doc_a": g["a"].to_numpy(),
                "doc_b": g["b"].to_numpy(),
                "n_shared": g["c"].to_numpy(),
            }
        )

    return partials.groupby("ap").map_groups(finalize, batch_format="pandas")


def random_sample(sf_dir: str, fraction: float = 0.1, seed: int = 7):
    """Seeded random sample via the hash-threshold spec: keep a doc iff
    ``remix(fnv1a64(text) XOR remix(seed)) < fraction * 2^64`` — the
    deterministic_sample pattern parameterized by an RNG-style seed. The
    splitmix remix output is uniform in u64, so this behaves like a seeded
    Bernoulli sample but is reproducible across engines (and across
    cluster sizes / batchings — no per-worker RNG stream), which is why
    large-corpus pipelines hash-sample instead of RNG-sampling.
    SQL-oracle-checked (the remix/FNV chain is replayed in DuckDB)."""
    from ..functions.hashing import fnv1a64
    from ..state.bloom import _remix

    thr = np.uint64(min(int(fraction * 2.0**64), 2**64 - 1))
    seed_u = _remix(np.array([seed], dtype=np.uint64))[0]

    def f(t: pa.Table) -> pa.Table:
        keys = _remix(fnv1a64(t["text"]) ^ seed_u)
        return t.filter(pa.array(keys < thr))

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def rolling_hash_fingerprint(sf_dir: str):
    """(doc_id, winnow_fp): winnowing-style fingerprint — min FNV-1a-64 hash
    over the doc's 4-token shingles (a 1-element MinHash; rows-only check,
    not SQL-expressible). Vectorized via the shared shingle helper."""
    from .dedup import _shingle_hashes_batch

    def f(df: pd.DataFrame) -> pd.DataFrame:
        # one batch-wide shingle pass, then per-doc minima via minimum.reduceat
        di, hs = _shingle_hashes_batch(df["text"].tolist(), n=4)
        counts = np.bincount(di, minlength=len(df)).astype(np.int64)
        fps = np.zeros(len(df), dtype=np.uint64)
        nz = np.flatnonzero(counts > 0)
        if len(nz):
            starts = np.concatenate([[0], np.cumsum(counts)])[nz]
            fps[nz] = np.minimum.reduceat(hs, starts)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "winnow_fp": fps.astype(np.int64)}
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas")


# ----------------------------------------------- word n-gram corpus operators
def _word_ngrams_batch(text_col, n: int):
    """Vectorized ``' '``-split word n-gram explode for one batch: returns
    ``(doc_idx, grams)`` — per-gram batch-local row indices (int64) and an
    object array of ``' '``-joined n-grams. Split semantics match DuckDB
    ``string_split(text, ' ')`` exactly (empty words kept), so gram strings
    are oracle-comparable. One Arrow split kernel + numpy offset arithmetic;
    the only per-element work is the n-1 elementwise string concats."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    words = pc.split_pattern(text_col, " ")
    flat = words.values.to_numpy(zero_copy_only=False)  # object array of words
    offsets = words.offsets.to_numpy().astype(np.int64)  # absolute into flat
    widths = np.diff(offsets)
    g_counts = np.maximum(widths - (n - 1), 0)
    total = int(g_counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    doc_idx = np.repeat(np.arange(len(widths), dtype=np.int64), g_counts)
    # global flat position of each gram's first word
    starts = np.repeat(offsets[:-1], g_counts)
    local = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(g_counts)[:-1]]), g_counts
    )
    p = starts + local
    grams = flat[p]
    for j in range(1, n):
        grams = grams + " " + flat[p + j]
    return doc_idx, grams


def repetition_ngrams(sf_dir: str, n: int = 2):
    """(doc_id, n_grams, top_cnt, n_distinct, top_frac, dup_frac): Gopher-style
    per-document repetition signals over word n-grams — the fraction of all
    n-grams taken by the most frequent one (top_frac) and the duplicated-gram
    fraction (dup_frac), the two signals corpus-curation recipes threshold to
    drop boilerplate/looping documents. Per-doc signals are batch-local, so
    this is a pure map stage (no shuffle at ANY corpus size). Fractions are
    single IEEE divisions of exact ints — bit-identical to the SQL oracle.
    Docs with fewer than n words emit no row (the oracle drops them too)."""
    ds = _read_docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        di, grams = _word_ngrams_batch(t["text"], n)
        nd = t.num_rows
        if len(di) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "top_cnt": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "top_frac": pa.array([], pa.float64()),
                    "dup_frac": pa.array([], pa.float64()),
                }
            )
        # one vectorized (doc, gram) -> count pass; index is sorted by doc
        cnt_s = pd.DataFrame({"d": di, "g": grams}).groupby(["d", "g"]).size()
        lvl = cnt_s.index.get_level_values(0).to_numpy()
        cnt = cnt_s.to_numpy()
        n_grams = np.bincount(di, minlength=nd).astype(np.int64)
        n_distinct = np.bincount(lvl, minlength=nd).astype(np.int64)
        top = np.zeros(nd, dtype=np.int64)
        np.maximum.at(top, lvl, cnt)
        keep = n_grams > 0
        denom = np.maximum(n_grams, 1).astype(np.float64)
        tbl = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(n_grams),
                "top_cnt": pa.array(top),
                "n_distinct": pa.array(n_distinct),
                "top_frac": pa.array(top.astype(np.float64) / denom),
                "dup_frac": pa.array((n_grams - n_distinct).astype(np.float64) / denom),
            }
        )
        return tbl.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def decontaminate_ngrams(sf_dir: str, n: int = 5, benchmark_source: str = "src0"):
    """(doc_id, n_grams, n_hit, hit_frac): train/test decontamination — for
    every corpus document (source != benchmark_source), the fraction of its
    word n-grams that also occur anywhere in the benchmark split (source ==
    benchmark_source). The standard n-gram-overlap contamination check run
    before training on scraped corpora.

    Scale shape: the benchmark side is a benchmark *suite* — small by
    contract — so its distinct-gram set is built dataset-side (per-batch
    distinct, predicate-pushdown read of only the benchmark rows), unioned
    once on the driver, and broadcast via ``ray.put`` (read per actor task,
    never re-shipped per batch). The corpus side is a pure map stage:
    explode + set membership + bincount per batch. If the benchmark outgrew
    worker memory the same op becomes a hash-partitioned semi-join on the
    gram (the dedup_exact_text shuffle shape); membership is exact on gram
    STRINGS (no hash-collision exposure)."""
    import ray
    import ray.data as rd

    bench = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filter=(pc.field("source") == benchmark_source),
    )

    def gram_batch(t: pa.Table) -> pa.Table:
        _, grams = _word_ngrams_batch(t["text"], n)
        u = np.unique(grams) if len(grams) else grams
        return pa.table({"gram": pa.array(u, type=pa.string())})

    parts = bench.map_batches(gram_batch, batch_format="pyarrow").take_all()
    bench_set = frozenset(r["gram"] for r in parts)
    ref = ray.put(bench_set)

    corpus = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("source") != benchmark_source),
    )

    def score(t: pa.Table) -> pa.Table:
        bs = ray.get(ref)
        di, grams = _word_ngrams_batch(t["text"], n)
        nd = t.num_rows
        n_grams = np.bincount(di, minlength=nd).astype(np.int64)
        if len(di):
            hit = pd.Series(grams).isin(bs).to_numpy()
            n_hit = np.bincount(di[hit], minlength=nd).astype(np.int64)
        else:
            n_hit = np.zeros(nd, dtype=np.int64)
        keep = n_grams > 0
        denom = np.maximum(n_grams, 1).astype(np.float64)
        tbl = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(n_grams),
                "n_hit": pa.array(n_hit),
                "hit_frac": pa.array(n_hit.astype(np.float64) / denom),
            }
        )
        return tbl.filter(pa.array(keep))

    return corpus.map_batches(score, batch_format="pyarrow")


def tfidf_top_terms(sf_dir: str, k: int = 3, num_partitions: int = 32):
    """(doc_id, rnk, term, tf, df): per-document top-k salient terms ranked by
    tf/df (idf as the exact rational N/df — log is monotone in it, so the
    ordering equals tf·idf ordering per fixed tf only; here the *score* is
    tf/df itself, computed as one IEEE double division, which both engine and
    DuckDB round identically — ties break on the term string). Keyword
    extraction, the corpus-wide-statistics member of the text suite.

    Scale shape: two partitioned shuffles and NO join — (doc, term, tf) rows
    are hash-partitioned BY TERM so each term's document frequency is
    computed co-located and attached in place (a transform, not a join), then
    re-partitioned by doc for the per-doc top-k. Both shuffle payloads are
    narrow (ids + one term string + two ints); per-partition work is
    vectorized pandas groupby (the partition-group pattern — map_groups
    stays at P groups, never at term/doc cardinality)."""
    from ..functions.hashing import fnv1a64

    ds = _read_docs(sf_dir)

    def tf_rows(t: pa.Table) -> pa.Table:
        # docs are batch-local, so per-doc tf is complete within the batch
        di, words = _word_ngrams_batch(t["text"], 1)
        cnt_s = pd.DataFrame({"d": di, "term": words}).groupby(["d", "term"]).size()
        d_l = cnt_s.index.get_level_values(0).to_numpy()
        terms = cnt_s.index.get_level_values(1).to_numpy(dtype=object)
        term_arr = pa.array(terms, type=pa.string())
        part = (fnv1a64(term_arr) % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], pa.array(d_l)),
                "term": term_arr,
                "tf": pa.array(cnt_s.to_numpy().astype(np.int64)),
                "part": pa.array(part),
            }
        )

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (doc, term) pairs; this partition holds ALL rows
        # of each of its terms, so the group size IS the document frequency
        df = df.drop(columns=["part"])
        df["df"] = df.groupby("term")["doc_id"].transform("size").astype(np.int64)
        df["dp"] = (df["doc_id"].to_numpy() % num_partitions).astype(np.int64)
        return df

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["dp"]).copy()
        df["score"] = df["tf"].to_numpy().astype(np.float64) / df["df"].to_numpy()
        df = df.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="stable"
        )
        df["rnk"] = (df.groupby("doc_id").cumcount() + 1).astype(np.int64)
        df = df[df["rnk"] <= k]
        return df[["doc_id", "rnk", "term", "tf", "df"]]

    return (
        ds.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("dp")
        .map_groups(topk, batch_format="pandas")
    )


BM25_TERMS = ("customer", "vector", "hash", "stream")


def bm25_topk(
    sf_dir: str,
    terms: tuple[str, ...] = BM25_TERMS,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """(doc_id, score): BM25 keyword search — top-k documents for a fixed
    bag of query terms (words = DuckDB ``string_split(text, ' ')`` tokens, so
    tf/dl are oracle-comparable). Scores are rounded to 4 decimals before
    ranking (ties broken by doc_id ASC), the same convention the cosine ANN
    family uses to keep the IEEE formula engine/oracle bit-stable.

    Scale shape (the standard two-pass sparse-retrieval plan):

    1. ONE scan of the raw text produces a narrow per-doc row
       ``(doc_id, dl, tf_j...)`` — m+2 ints, no term strings shuffled
       (queries are fixed, so tf is a dense vector, not an exploded table).
       The narrow dataset is materialized (≈(m+2)·8 B/doc — ~40 GB per 10^9
       docs, object-store-spillable) because it feeds two consumers; that is
       cheaper than re-scanning the corpus text a second time.
    2. Corpus stats (N, Σdl, df_j) are per-batch one-row partials merged in a
       single tiny task — never a wide shuffle.
    3. The scoring pass re-reads the narrow rows with the m idf scalars in
       the closure, emits per-batch top-k partials, and finishes with a
       k·n_batches-row sort+limit.

    Reference anchor: extends the reference's filter/search surface
    (crawl4ai_llm/storage/json_storage.py list/filter path) with ranked
    retrieval — the operator a crawl corpus feeds first.
    """
    import math

    import ray.data  # noqa: F401  (Dataset already imported by callers)

    ds = _read_docs(sf_dir)
    m = len(terms)

    def tf_rows(t: pa.Table) -> pa.Table:
        # the shared 1-gram explode (split semantics must match DuckDB's
        # string_split — one implementation, not two)
        doc_idx, flat = _word_ngrams_batch(t["text"], 1)
        n = t.num_rows
        dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
        cols = {"doc_id": t["doc_id"], "dl": pa.array(dl)}
        for j, term in enumerate(terms):
            hit = flat == term
            cols[f"tf{j}"] = pa.array(
                np.bincount(doc_idx[hit], minlength=n).astype(np.int64)
            )
        return pa.table(cols)

    narrow = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()

    def stat_partial(t: pa.Table) -> pa.Table:
        row = {
            "n": [t.num_rows],
            "sum_dl": [int(pc.sum(t["dl"]).as_py() or 0)],
        }
        for j in range(m):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)
            row[f"df{j}"] = [int((tf > 0).sum())]
        return pa.table(row)

    def stat_merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: [int(pc.sum(t[c]).as_py() or 0)] for c in t.column_names}
        )

    stat_rows = (
        narrow.map_batches(stat_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(stat_merge, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    if not stat_rows or not stat_rows[0].get("n"):
        # empty corpus: Ray skips the map entirely; return a typed empty
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        )
    stats = stat_rows[0]
    n_docs = int(stats["n"])
    avgdl = float(stats["sum_dl"]) / n_docs  # one IEEE division, = oracle's
    idf = [
        math.log(1 + (n_docs - int(stats[f"df{j}"]) + 0.5) / (int(stats[f"df{j}"]) + 0.5))
        for j in range(m)
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(t.num_rows, dtype=np.float64)
        # left-associated term sum, same order as the oracle's + chain
        for j in range(m):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[j] * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        s = np.round(s, 4)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]  # per-batch top-k partial
        return pa.table(
            {"doc_id": pa.array(ids[order]), "score": pa.array(s[order])}
        )

    return (
        narrow.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def unigram_logprob(sf_dir: str, num_partitions: int = 32):
    """(doc_id, n_tokens, logprob): per-document average token log-probability
    under the corpus's own unigram LM — the CCNet/perplexity-style quality
    gate (low logprob ⇒ unusual token mix ⇒ filter candidate). Exact and
    merge-order-independent: per-term ln(c_t/N) is quantized once to an
    int64 1e-9 grid (floor(x·1e9 + 0.5), the same half-up lockstep the
    k-means quantizer uses), per-doc accumulation is integer, and only the
    final per-doc division + round(4) touches IEEE floats — so the result is
    bit-stable under any partitioning AND replayable in SQL (a float sum
    over terms would be reduction-order-dependent in both engines).

    Scale shape (mirrors tfidf_top_terms): (doc, term, tf) rows are
    hash-partitioned BY TERM so each term's corpus count is a co-located
    transform; the corpus total N is a one-row partial reduce; the per-doc
    sum re-partitions narrow int rows BY DOC. Two narrow shuffles, no join,
    no driver-side materialization beyond the one-row N."""
    import math

    from ..functions.hashing import fnv1a64

    ds = _read_docs(sf_dir)

    def tf_rows(t: pa.Table) -> pa.Table:
        di, words = _word_ngrams_batch(t["text"], 1)
        dl = np.bincount(di, minlength=t.num_rows).astype(np.int64)
        cnt_s = pd.DataFrame({"d": di, "term": words}).groupby(["d", "term"]).size()
        d_l = cnt_s.index.get_level_values(0).to_numpy()
        terms = cnt_s.index.get_level_values(1).to_numpy(dtype=object)
        term_arr = pa.array(terms, type=pa.string())
        part = (fnv1a64(term_arr) % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], pa.array(d_l)),
                "term": term_arr,
                "tf": pa.array(cnt_s.to_numpy().astype(np.int64)),
                "dl": pa.array(dl[d_l]),
                "part": pa.array(part),
            }
        )

    narrow = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()

    n_rows = (
        narrow.map_batches(
            lambda t: pa.table({"n": [int(pc.sum(t["tf"]).as_py() or 0)]}),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(
            lambda t: pa.table({"n": [int(pc.sum(t["n"]).as_py() or 0)]}),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )
    n_total = int(n_rows[0]["n"]) if n_rows and n_rows[0].get("n") else 0
    if n_total == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                }
            )
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        # this partition holds ALL rows of each of its terms → corpus count
        # is a transform; quantized ln in lockstep with the oracle
        df = df.drop(columns=["part"]).copy()
        c = df.groupby("term")["tf"].transform("sum").to_numpy(np.float64)
        lq = np.floor(np.log(c / n_total) * 1000000000.0 + 0.5).astype(np.int64)
        df["contrib"] = df["tf"].to_numpy() * lq
        df["dp"] = (df["doc_id"].to_numpy() % num_partitions).astype(np.int64)
        return df[["doc_id", "dl", "contrib", "dp"]]

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_tokens=("dl", "first"), acc=("contrib", "sum")
        )
        lp = g["acc"].to_numpy(np.float64) / (
            g["n_tokens"].to_numpy(np.float64) * 1000000000.0
        )
        g["logprob"] = np.round(lp, 4)
        return g[["doc_id", "n_tokens", "logprob"]]

    return (
        narrow.groupby("part")
        .map_groups(attach, batch_format="pandas")
        .groupby("dp")
        .map_groups(per_doc, batch_format="pandas")
    )


def bigram_pmi(sf_dir: str, k: int = 30, min_count: int = 5, num_partitions: int = 16):
    """(w1, w2, n_pairs, pmi_q): top-k collocations by pointwise mutual
    information over adjacent word pairs — PMI = ln(c_xy*N / (c_x*c_y)),
    quantized to an int64 1e-4 grid (floor(x*1e4+0.5), negatives included)
    so ranking and values are exact and order-free (the unigram_logprob
    quantized-ln precedent). Collocation extraction: the association
    statistic between tf-idf (salience) and embedding similarity.

    Scale shape: corpus unigram/bigram counts are per-batch partials + one
    narrow sum each; c_x / c_y attach WITHOUT a join or a vocab broadcast —
    two union-tagged passes partitioned by the word being attached (all
    rows of a word co-locate with its unigram count). A bigram lives wholly
    in one partition of the second pass, so per-partition top-k partials
    contain the global top-k."""
    from ..functions.hashing import fnv1a64

    ds = _read_docs(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        _, words = _word_ngrams_batch(t["text"], 1)
        _, grams = _word_ngrams_batch(t["text"], 2)
        us = pd.Series(words).groupby(words).size()
        bs = pd.Series(grams).groupby(grams).size()
        w1b = np.array([g.partition(" ")[0] for g in bs.index], dtype=object)
        w2b = np.array([g.partition(" ")[2] for g in bs.index], dtype=object)
        return pa.table(
            {
                "w1": pa.array(
                    np.concatenate([us.index.to_numpy(dtype=object), w1b]),
                    pa.string(),
                ),
                "w2": pa.array(
                    np.concatenate(
                        [np.full(len(us), "", dtype=object), w2b]
                    ),
                    pa.string(),
                ),
                "c": pa.array(
                    np.concatenate(
                        [us.to_numpy(), bs.to_numpy()]
                    ).astype(np.int64)
                ),
                "tag": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(us), dtype=np.int64),
                            np.ones(len(bs), dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    rows = ds.map_batches(partials, batch_format="pyarrow").materialize()
    n_total = 0
    for b in rows.iter_batches(batch_format="pyarrow"):
        import pyarrow.compute as _pc

        m = _pc.equal(b["tag"], 0)
        s = _pc.sum(_pc.filter(b["c"], m)).as_py()
        n_total += int(s or 0)
    if n_total == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "pmi_q": pa.array([], pa.int64()),
                }
            )
        )

    def key1(t: pa.Table) -> pa.Table:
        return t.append_column(
            "kp",
            pa.array((fnv1a64(t["w1"]) % np.uint64(num_partitions)).astype(np.int64)),
        )

    def attach_cx(df: pd.DataFrame) -> pd.DataFrame:
        uni = (
            df[df["tag"] == 0].groupby("w1", as_index=False)["c"].sum()
            .rename(columns={"c": "cx"})
        )
        bi = (
            df[df["tag"] == 1].groupby(["w1", "w2"], as_index=False)["c"].sum()
        )
        m = bi.merge(uni, on="w1")
        return m[["w1", "w2", "c", "cx"]]

    # pass B rows: bigrams re-keyed by w2, unigram counts re-emitted keyed
    # by their word (as w2) — schema (w1, w2, c, cx, tag)
    def rekey2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["tag"] = np.ones(len(df), dtype=np.int64)
        return df

    def uni2(t: pa.Table) -> pa.Table:
        m = pa.compute.equal(t["tag"], 0)
        w = pa.compute.filter(t["w1"], m)
        c = pa.compute.filter(t["c"], m)
        return pa.table(
            {
                "w1": pa.array(np.full(len(w), "", dtype=object), pa.string()),
                "w2": w,
                "c": c,
                "cx": pa.array(np.zeros(len(w), dtype=np.int64)),
                "tag": pa.array(np.zeros(len(w), dtype=np.int64)),
            }
        )

    passA = (
        rows.map_batches(key1, batch_format="pyarrow")
        .groupby("kp")
        .map_groups(attach_cx, batch_format="pandas")
        .map_batches(rekey2, batch_format="pandas")
    )

    def key2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["kp"] = (
            fnv1a64(pa.array(df["w2"].astype(str))) % np.uint64(num_partitions)
        ).astype(np.int64)
        return df

    tagged = passA.union(
        rows.map_batches(uni2, batch_format="pyarrow").map_batches(
            lambda df: df, batch_format="pandas"
        )
    ).map_batches(key2, batch_format="pandas")

    def attach_cy_score(df: pd.DataFrame) -> pd.DataFrame:
        uni = (
            df[df["tag"] == 0].groupby("w2", as_index=False)["c"].sum()
            .rename(columns={"c": "cy"})
        )
        bi = df[df["tag"] == 1].groupby(
            ["w1", "w2"], as_index=False
        ).agg(c=("c", "sum"), cx=("cx", "first"))
        bi = bi[bi["c"] >= min_count]
        if not len(bi):
            return pd.DataFrame(
                {
                    "w1": np.array([], dtype=object),
                    "w2": np.array([], dtype=object),
                    "n_pairs": np.array([], dtype=np.int64),
                    "pmi_q": np.array([], dtype=np.int64),
                }
            )
        m = bi.merge(uni, on="w2")
        pmi = np.log(
            m["c"].to_numpy(np.float64)
            * float(n_total)
            / (m["cx"].to_numpy(np.float64) * m["cy"].to_numpy(np.float64))
        )
        m["pmi_q"] = np.floor(pmi * 10000.0 + 0.5).astype(np.int64)
        m = m.rename(columns={"c": "n_pairs"})
        m = m.sort_values(
            ["pmi_q", "w1", "w2"], ascending=[False, True, True],
            kind="mergesort",
        ).head(k)
        m["n_pairs"] = m["n_pairs"].astype(np.int64)
        return m[["w1", "w2", "n_pairs", "pmi_q"]]

    return (
        tagged.groupby("kp")
        .map_groups(attach_cy_score, batch_format="pandas")
        .sort(["pmi_q", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def pack_documents(sf_dir: str, budget: int = 2048, n_ranges: int = 8):
    """(doc_id, n_tokens, bin_id, bin_pos): SEQUENCE PACKING — lay the corpus
    out as one contiguous token stream in doc_id order and cut it into
    fixed-``budget`` training bins: bin_id = global-exclusive-prefix-sum of
    token counts // budget, bin_pos = that prefix % budget. The example-
    packing step every pretraining data pipeline runs after curation
    (GPT/T5-style "pack to sequence length"), and the engine's distributed
    PREFIX-SUM (scan) primitive — rank machinery (global_rank_orders) orders
    rows, this CARRIES A VALUE across partitions:

    1. contiguous doc_id ranges from parquet row-group stats (the data is
       range-partitionable on its dense key; zero data read);
    2. per-range token totals from one pass (P-sized, to the driver);
    3. exclusive prefix offsets per range (P-sized driver scan — the only
       serial step, over P numbers, not rows);
    4. per-range local cumsum + broadcast offset = exact global scan.

    Deterministic, integer-exact, replayed in SQL as SUM() OVER (ORDER BY
    doc_id ROWS UNBOUNDED PRECEDING ... 1 PRECEDING)."""
    import pyarrow.parquet as pq_mod

    md = pq_mod.ParquetFile(f"{sf_dir}/documents.parquet").metadata

    def _stats_bounds():
        # any row group missing doc_id min/max aborts the whole stats scan
        # (the sibling _events_day_bounds early-return contract) — partial
        # stats must not masquerade as full bounds
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema != "doc_id":
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    return None, None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        return lo, hi

    lo, hi = _stats_bounds()
    ds = _read_docs(sf_dir)
    if lo is None:  # stats missing: ONE aggregate pass for both bounds
        from ray.data.aggregate import Max, Min

        agg = ds.aggregate(Min("doc_id"), Max("doc_id"))
        lo, hi = agg["min(doc_id)"], agg["max(doc_id)"]
    if lo is None or hi is None:  # empty corpus
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "bin_id": pa.array([], pa.int64()),
                "bin_pos": pa.array([], pa.int64()),
            }
        )
    span = max(1, int(hi) - int(lo) + 1)
    width = -(-span // n_ranges)  # ceil

    def counts(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        n = pc.cast(pc.count_substring_regex(low, TOKEN_RE), pa.int64())
        did = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "rp": pa.array(((did - lo) // width).astype(np.int64)),
            }
        )

    cnt = ds.map_batches(counts, batch_format="pyarrow").materialize()

    # per-range totals -> driver prefix scan over P numbers
    totals = cnt.groupby("rp").sum("n_tokens").to_pandas()
    totals = totals.sort_values("rp")
    offs = {}
    run = 0
    for rp, tot in zip(totals["rp"], totals["sum(n_tokens)"]):
        offs[int(rp)] = run
        run += int(tot)

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "bin_id": pd.Series([], dtype=np.int64),
                    "bin_pos": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values("doc_id", kind="mergesort")
        n = df["n_tokens"].to_numpy()
        start = offs[int(df["rp"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(n)[:-1]]
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": n,
                "bin_id": (start // budget).astype(np.int64),
                "bin_pos": (start % budget).astype(np.int64),
            }
        )

    return cnt.groupby("rp").map_groups(scan, batch_format="pandas")


def chunk_documents(sf_dir: str, size: int = 200, overlap: int = 50):
    """(doc_id, chunk_id, chunk_text): overlapping character windows over
    every document — the RAG-ingestion chunker (stride = size - overlap;
    chunk k covers [k*stride, k*stride + size)); a document emits
    ceil(n_chars / stride) chunks, empty documents none. The text sibling of
    media_chunks' binary chunking.

    Vectorized by CHUNK ORDINAL, not per row: chunk k of every document in
    the batch is one scalar utf8_slice_codeunits call, so the Python loop is
    over ≤ ceil(max_len/stride) ordinals per batch (codepoint semantics —
    matches SQL substr/length exactly, unicode included)."""
    stride = size - overlap
    assert stride > 0, "overlap must be smaller than size"

    def chunks(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_chunks = -(-lens // stride)  # ceil; 0 for empty docs
        out_ids, out_k, out_txt = [], [], []
        max_k = int(n_chunks.max()) if len(n_chunks) else 0
        for k in range(max_k):
            sel = n_chunks > k
            idx = np.nonzero(sel)[0]
            sliced = pc.utf8_slice_codeunits(
                text.take(pa.array(idx)), k * stride, k * stride + size
            )
            out_ids.append(t["doc_id"].take(pa.array(idx)))
            out_k.append(pa.array(np.full(len(idx), k, dtype=np.int64)))
            out_txt.append(sliced)
        if not out_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], t["doc_id"].type),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_ids]
                ),
                "chunk_id": pa.concat_arrays(out_k),
                "chunk_text": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_txt]
                ),
            }
        )

    return _read_docs(sf_dir).map_batches(chunks, batch_format="pyarrow")

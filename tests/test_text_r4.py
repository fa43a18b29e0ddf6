"""Round-4 text/ANN additions: word-n-gram explode helper, Gopher repetition
signals, n-gram decontamination, tf-idf top terms, batched multi-query ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(result) -> pd.DataFrame:
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


def test_word_ngrams_batch_matches_naive():
    from crawl4ai_llm_ray.pipelines.text import _word_ngrams_batch

    texts = ["a b c d", "x", "", "p q p q", "one two"]
    for n in (1, 2, 3):
        di, grams = _word_ngrams_batch(pa.array(texts), n)
        expect = []
        for i, t in enumerate(texts):
            ws = t.split(" ")  # string_split semantics: '' -> ['']
            for j in range(len(ws) - n + 1):
                expect.append((i, " ".join(ws[j : j + n])))
        assert list(zip(di.tolist(), grams.tolist())) == expect


def test_word_ngrams_batch_sliced_input():
    """Offsets math must hold on a sliced (non-zero-offset) Arrow array."""
    from crawl4ai_llm_ray.pipelines.text import _word_ngrams_batch

    arr = pa.array(["junk junk", "a b c", "d e"])[1:]
    di, grams = _word_ngrams_batch(arr, 2)
    assert list(zip(di.tolist(), grams.tolist())) == [
        (0, "a b"),
        (0, "b c"),
        (1, "d e"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_repetition_ngrams_hand_values(tmp_path):
    from crawl4ai_llm_ray.pipelines.text import repetition_ngrams

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            # doc1: grams [a b, b a, a b] -> n=3 top=2 distinct=2
            # doc2: all distinct; doc3: single word -> dropped
            "text": pa.array(["a b a b", "x y z", "solo"]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = _df(repetition_ngrams(str(tmp_path))).sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_grams"].tolist() == [3, 2]
    assert out["top_cnt"].tolist() == [2, 1]
    assert out["n_distinct"].tolist() == [2, 2]
    assert out["top_frac"].tolist() == [2 / 3, 1 / 2]
    assert out["dup_frac"].tolist() == [1 / 3, 0.0]


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_ngrams_hand_values(tmp_path):
    from crawl4ai_llm_ray.pipelines.text import decontaminate_ngrams

    bench_text = "one two three four five six"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["bench", "train"]),
            # train doc shares exactly the 5-gram "two three four five six"
            "text": pa.array([bench_text, "zz two three four five six zz"]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = _df(decontaminate_ngrams(str(tmp_path), n=5, benchmark_source="bench"))
    assert out["doc_id"].tolist() == [2]
    assert out["n_grams"].tolist() == [3]
    assert out["n_hit"].tolist() == [1]
    assert out["hit_frac"].tolist() == [1 / 3]


@pytest.mark.usefixtures("ray_session")
def test_tfidf_rare_term_outranks_common(tmp_path):
    from crawl4ai_llm_ray.pipelines.text import tfidf_top_terms

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "common rare common",  # rare: tf1/df1=1 > common: tf2/df3
                    "common filler filler",
                    "common other words here",
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = _df(tfidf_top_terms(str(tmp_path), k=2)).sort_values(["doc_id", "rnk"])
    d1 = out[out["doc_id"] == 1]
    assert d1["term"].tolist() == ["rare", "common"]
    assert d1["tf"].tolist() == [1, 2]
    assert d1["df"].tolist() == [1, 3]
    # every doc contributes exactly k ranks 1..k
    assert out.groupby("doc_id")["rnk"].apply(list).map(lambda x: x == [1, 2]).all()


@pytest.mark.usefixtures("ray_session")
def test_ann_topk_multi_agrees_with_single():
    from crawl4ai_llm_ray.pipelines.ann import ann_topk, ann_topk_multi

    multi = _df(ann_topk_multi(SF, query_vec_ids=(0, 3), k=5))
    single0 = _df(ann_topk(SF, query_vec_id=0, k=5))
    m0 = multi[multi["query_id"] == 0].sort_values("rnk")
    assert m0["vec_id"].tolist() == single0["vec_id"].tolist()
    assert np.allclose(m0["cos"].to_numpy(), single0["cos"].to_numpy())
    # both queries present, k rows each, ranks well-formed
    assert sorted(multi["query_id"].unique()) == [0, 3]
    assert (multi.groupby("query_id")["rnk"].max() == 5).all()
    assert len(multi) == 10


@pytest.mark.usefixtures("ray_session")
def test_pagerank_golden_graph():
    """Hand-built 4-node graph vs a serial numpy reference of the exact
    integer recurrence."""
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.graph import pagerank

    # a->b, a->c, b->c, c->a, d dangling
    names = ["a", "b", "c", "d"]
    srcs, dsts = ["a", "a", "b", "c"], ["b", "c", "c", "a"]
    deg = {"a": 2, "b": 1, "c": 1}
    edges = rd.from_items(
        [{"src": s, "dst": d, "outdeg": deg[s]} for s, d in zip(srcs, dsts)]
    )
    nodes = rd.from_items([{"node": n} for n in names])
    got = (
        pagerank(edges, nodes, iters=5)
        .to_pandas()
        .set_index("node")["pr"]
        .to_dict()
    )
    r = {n: 1_000_000 for n in names}
    for _ in range(5):
        inflow = {n: 0 for n in names}
        for s, d in zip(srcs, dsts):
            inflow[d] += r[s] // deg[s]
        r = {n: 150_000 + (85 * inflow[n]) // 100 for n in names}
    assert got == r
    # dangling node decays to the base-only fixpoint
    assert got["d"] == 150_000


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_edges():
    import ray.data as rd

    from crawl4ai_llm_ray.pipelines.graph import pagerank

    nodes = rd.from_items([{"node": "x"}, {"node": "y"}])
    edges = rd.from_items([]).map_batches(
        lambda df: pd.DataFrame({"src": [], "dst": [], "outdeg": []}),
        batch_format="pandas",
    )
    got = pagerank(edges, nodes, iters=3).to_pandas()
    assert sorted(got["pr"].tolist()) == [150_000, 150_000]


@pytest.mark.usefixtures("ray_session")
def test_full_outer_activity_covers_all_three_cases():
    from crawl4ai_llm_ray.pipelines.relational4 import full_outer_activity

    out = _df(full_outer_activity(SF))
    seg = out["segment"]
    both_or_left = out[(seg == "BUILDING")]
    right_only = out[seg == "unregistered"]
    assert len(right_only) > 0          # active users outside the segment
    assert (both_or_left["n_events"] == 0).any()   # customers with no events
    assert (both_or_left["n_events"] > 0).any()    # matched rows
    assert (right_only["n_events"] > 0).all()
    assert out["key"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_bigram_pmi_ranks_collocations(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines import text as tx

    # "alpha beta" always adjacent (strong collocation); "gamma delta" only
    # sometimes; all words also appear independently
    docs = (
        ["alpha beta gamma"] * 6
        + ["gamma delta epsilon"] * 5
        + ["delta alpha epsilon beta"] * 5
        + ["beta epsilon gamma alpha"] * 5
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    got = tx.bigram_pmi(str(tmp_path), k=10, min_count=5).to_pandas()
    assert len(got) > 0
    pairs = list(zip(got["w1"], got["w2"]))
    assert ("alpha", "beta") in pairs
    # exact PMI check for the top pair against a numpy replay
    import numpy as np

    words = [w for d in docs for w in d.split(" ")]
    N = len(words)
    from collections import Counter

    uc = Counter(words)
    bc = Counter(zip(words, words[1:]))  # NB: crosses doc borders in replay
    # restrict replay to within-doc bigrams:
    bc = Counter()
    for d in docs:
        ws = d.split(" ")
        bc.update(zip(ws, ws[1:]))
    for r in got.itertuples():
        expect = np.floor(
            np.log(bc[(r.w1, r.w2)] * N / (uc[r.w1] * uc[r.w2])) * 10000 + 0.5
        )
        assert r.pmi_q == int(expect)
    assert got["pmi_q"].is_monotonic_decreasing


@pytest.mark.usefixtures("ray_session")
def test_pack_documents_contiguous_stream(tmp_path):
    """Bins tile the token stream exactly: starts are the exclusive prefix
    sums, a doc's bin is its start position // budget, and the range-carry
    across partitions is exact."""
    import pyarrow.parquet as pq

    from crawl4ai_llm_ray.pipelines.text import pack_documents

    texts = ["a " * k for k in (5, 7, 3, 10, 1, 8, 2, 6)]  # token counts
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], np.int64)
                ),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    got = (
        pack_documents(str(tmp_path), budget=10, n_ranges=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = np.array([5, 7, 3, 10, 1, 8, 2, 6])
    start = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert (got["n_tokens"].to_numpy() == n).all()
    assert (got["bin_id"].to_numpy() == start // 10).all()
    assert (got["bin_pos"].to_numpy() == start % 10).all()


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_windows_and_unicode(tmp_path):
    from crawl4ai_llm_ray.pipelines.text import chunk_documents

    texts = ["abcdefghij", "", "xy", "é" * 7]  # unicode counted as CHARS
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s"] * 4),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], np.int64)
                ),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    got = (
        chunk_documents(str(tmp_path), size=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    by_doc = {
        d: list(g["chunk_text"]) for d, g in got.groupby("doc_id")
    }
    # stride 3, size 4: windows [0:4],[3:7],[6:10],[9:13]
    assert by_doc[0] == ["abcd", "defg", "ghij", "j"]
    assert 1 not in by_doc  # empty doc: no chunks
    assert by_doc[2] == ["xy"]
    assert by_doc[3] == ["éééé", "éééé", "é"]  # codepoints, not bytes
    # overlap reconstruction: dropping the first `overlap` chars of every
    # non-first chunk rebuilds the document
    rebuilt = by_doc[0][0] + "".join(c[1:] for c in by_doc[0][1:])
    assert rebuilt == "abcdefghij"


@pytest.mark.usefixtures("ray_session")
def test_pack_and_chunk_empty_corpus(tmp_path):
    from crawl4ai_llm_ray.pipelines.text import chunk_documents, pack_documents

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    p = pack_documents(str(tmp_path))
    p = p.to_pandas() if hasattr(p, "to_pandas") else p
    assert len(p) == 0
    c = chunk_documents(str(tmp_path)).to_pandas()
    assert len(c) == 0

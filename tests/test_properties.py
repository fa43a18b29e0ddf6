"""Property-based tests (hypothesis): canonicalization idempotence and
vectorized/scalar agreement on arbitrary inputs; hash stability."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_llm_ray.functions.hashing import fnv1a64, fnv1a64_scalar
from crawl4ai_llm_ray.functions.urlnorm import canonicalize_url, canonicalize_urls

# URL-shaped and garbage inputs
_host = st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%!$&'()*+,;=:@\-]{0,10}){0,4}/?", fullmatch=True)
_query = st.one_of(
    st.just(""),
    st.from_regex(r"\?[a-z]=[0-9](&[a-z]=[0-9]){0,3}", fullmatch=True),
)
_frag = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9]{0,5}", fullmatch=True))
_scheme = st.sampled_from(["http", "HTTP", "https", "Https", "ftp"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])

urlish = st.builds(
    lambda s, h, p, pt, q, f: f"{s}://{h}{pt}{p}{q}{f}",
    _scheme,
    _host,
    _path,
    _port,
    _query,
    _frag,
)
anything = st.one_of(urlish, st.text(max_size=40))


@given(st.lists(anything, max_size=30))
@settings(max_examples=200, deadline=None)
def test_vectorized_equals_scalar(urls):
    got = canonicalize_urls(pa.array(urls, type=pa.string())).to_pylist()
    want = [canonicalize_url(u) for u in urls]
    assert got == want


@given(urlish)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    if c is not None:
        assert canonicalize_url(c) == c


@given(st.lists(st.text(max_size=50), max_size=30))
@settings(max_examples=200, deadline=None)
def test_hash_vectorized_equals_scalar(texts):
    h = fnv1a64(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        assert int(h[i]) == fnv1a64_scalar(t)


@pytest.mark.usefixtures("ray_session")
def test_shingle_df_cap_and_bucket_cap():
    """Scale knobs: a generous df cap / bucket cap must not change results
    (this corpus has no shingle above the cap); a df cap of 1 kills all
    pairs (every shared shingle has df >= 2)."""
    from crawl4ai_llm_ray.pipelines.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    base = ngram_jaccard_pairs(sf).to_pandas()
    capped = ngram_jaccard_pairs(sf, max_shingle_df=10_000).to_pandas()
    assert set(map(tuple, base.values)) == set(map(tuple, capped.values))
    none_left = ngram_jaccard_pairs(sf, max_shingle_df=1).to_pandas()
    assert len(none_left) == 0
    mh = minhash_lsh_pairs(sf).to_pandas()
    mh_capped = minhash_lsh_pairs(sf, max_bucket=10_000).to_pandas()
    assert set(map(tuple, mh.values)) == set(map(tuple, mh_capped.values))


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2", "b3"]),
            st.text(alphabet="abc", max_size=8),
        ),
        max_size=24,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=60, deadline=None)
def test_fuzzy_pairs_kernel_equals_bruteforce(rows, k):
    """The blocked-fuzzy-join kernel path (dedupe, closed-form pair ranks,
    length prune, banded DP) == brute-force per-block O(n²) full-DP
    reference, for arbitrary blocks/strings/thresholds. Exercises the pure
    kernel; the Ray stage wiring is covered by the hand-built tests."""
    import numpy as np
    import pandas as pd

    from crawl4ai_llm_ray.pipelines.dedup import (
        _banded_levenshtein,
        _padded_bytes,
        _pair_indices,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(dp[j] + 1, nd[j - 1] + 1, dp[j - 1] + (ca != cb)))
            dp = nd
        return dp[-1]

    # brute force over distinct strings per block
    by_block: dict = {}
    for b, s in rows:
        by_block.setdefault(b, set()).add(s)
    want = set()
    for b, strs in by_block.items():
        ss = sorted(strs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                d = lev(ss[i], ss[j])
                if d <= k:
                    want.add((b, ss[i], ss[j], d))

    # kernel path (mirrors fuzzy_pairs_blocked.pairs without Ray)
    df = pd.DataFrame(
        {"blk": [r[0] for r in rows], "s": [r[1] for r in rows]}
    ).drop_duplicates()
    got = set()
    if len(df):
        df = df.sort_values(["blk", "s"], kind="mergesort")
        strs = df["s"].to_numpy()
        blks = df["blk"].to_numpy()
        _, starts, counts = np.unique(blks, return_index=True, return_counts=True)
        gid, li, lj = _pair_indices(counts)
        if len(gid):
            pi, pj = starts[gid] + li, starts[gid] + lj
            M, lens = _padded_bytes(pa.array(strs, pa.string()))
            keep = np.abs(lens[pi] - lens[pj]) <= k
            pi, pj = pi[keep], pj[keep]
            if len(pi):
                dist = _banded_levenshtein(M[pi], lens[pi], M[pj], lens[pj], k)
                ok = dist <= k
                got = {
                    (blks[a], strs[a], strs[b], int(d))
                    for a, b, d in zip(pi[ok], pj[ok], dist[ok])
                }
    assert got == want

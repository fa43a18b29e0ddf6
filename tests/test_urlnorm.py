import pyarrow as pa

from crawl4ai_llm_ray.functions.urlnorm import (
    canonicalize_url,
    canonicalize_urls,
    host_of,
)

CASES = [
    ("http://Example.COM/Path", "http://example.com/Path"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com//a//b", "http://example.com/a/b"),
    ("http://example.com./a", "http://example.com/a"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("ftp://example.com/a", None),
    ("not a url", None),
    ("", None),
]


def test_scalar_cases():
    for raw, want in CASES:
        assert canonicalize_url(raw) == want, raw


def test_vectorized_matches_scalar():
    arr = pa.array([c[0] for c in CASES] + [None])
    out = canonicalize_urls(arr).to_pylist()
    assert out == [c[1] for c in CASES] + [None]


def test_idempotent():
    for raw, want in CASES:
        if want is not None:
            assert canonicalize_url(want) == want, want


def test_fast_path_agrees_with_slow_path():
    # URLs that should hit the vectorized fast path must equal the scalar spec
    urls = [
        "http://a.com/x/y",
        "https://b-site.org/p1",
        "http://a.com/",
        "http://sub.domain.io/a0_b~c",
    ]
    out = canonicalize_urls(pa.array(urls)).to_pylist()
    assert out == [canonicalize_url(u) for u in urls]


def test_host_of():
    arr = canonicalize_urls(
        pa.array(["http://A.com:8080/x?b=1", "https://b.org/y"])
    )
    assert host_of(arr).to_pylist() == ["a.com:8080", "b.org"]

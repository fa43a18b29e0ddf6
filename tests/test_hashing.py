import numpy as np
import pyarrow as pa

from crawl4ai_llm_ray.functions.hashing import fnv1a64, fnv1a64_scalar, hash_columns


def test_scalar_known_vectors():
    # FNV-1a 64 published test vectors
    assert fnv1a64_scalar("") == 0xCBF29CE484222325
    assert fnv1a64_scalar("a") == 0xAF63DC4C8601EC8C
    assert fnv1a64_scalar("foobar") == 0x85944171F73967E8


def test_vector_matches_scalar():
    vals = ["", "a", "foobar", "https://example.com/x?a=1", "日本語", "x" * 300]
    h = fnv1a64(pa.array(vals))
    assert h.dtype == np.uint64
    for i, v in enumerate(vals):
        assert int(h[i]) == fnv1a64_scalar(v), v


def test_seeded_differs():
    h0 = fnv1a64(pa.array(["abc"]))
    h1 = fnv1a64(pa.array(["abc"]), seed=7)
    assert int(h0[0]) != int(h1[0])
    assert int(h1[0]) == fnv1a64_scalar("abc", seed=7)


def test_nulls_hash_as_empty():
    h = fnv1a64(pa.array(["a", None, ""]))
    assert int(h[1]) == fnv1a64_scalar("")
    assert int(h[1]) == int(h[2])


def test_chunked_and_large_string():
    ch = pa.chunked_array([pa.array(["a", "b"]), pa.array(["foobar"])])
    h = fnv1a64(ch)
    assert int(h[2]) == fnv1a64_scalar("foobar")
    ls = pa.array(["a", "foobar"], type=pa.large_string())
    h2 = fnv1a64(ls)
    assert int(h2[1]) == fnv1a64_scalar("foobar")


def test_sliced_array():
    arr = pa.array(["x", "y", "foobar", "z"])
    h = fnv1a64(arr.slice(2, 2))
    assert int(h[0]) == fnv1a64_scalar("foobar")


def test_hash_columns_composite():
    a = pa.array(["h1", "h2"])
    b = pa.array(["p1", "p2"])
    h = hash_columns(a, b)
    assert int(h[0]) == fnv1a64_scalar("h1\x1fp1")
    assert int(h[1]) == fnv1a64_scalar("h2\x1fp2")

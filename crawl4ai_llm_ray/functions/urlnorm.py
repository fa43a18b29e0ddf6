"""URL canonicalization — the engine's replacement for the reference's id
derivation step (``json_storage.py:61-90``: ``"url_" + hash(url)``), specified
precisely so the oracle crawler and the Ray engine agree byte-for-byte.

Canonical form (http/https only; anything else → null = dropped upstream):
  * strip surrounding whitespace
  * scheme lowercased
  * host lowercased, trailing dot stripped
  * default port stripped (http:80, https:443); other ports kept
  * userinfo kept as-is (rare; not a crawl concern)
  * path: RFC-3986 dot-segment removal, empty path → "/",
    trailing slash stripped unless path == "/"
  * query: params sorted by (key, value) with duplicates kept,
    empty query ("?") dropped
  * fragment removed

Vectorization strategy: a compiled regex identifies URLs that are *already
canonical* (the overwhelmingly common case for machine-generated frontiers) in
one vectorized pass via pyarrow; only the misfits take the per-string Python
slow path.  At 100 TB scale this keeps the canonicalize stage ~zero-copy for
well-formed inputs.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Already-canonical fast path (RE2-compatible — no lookahead): lowercase
# scheme+host (no trailing dot), no port, no userinfo, no query, no fragment,
# no "//" in path, no trailing slash, and every path segment starts with an
# alphanumeric (which excludes "." / ".." dot-segments; leading-dot segments
# take the slow path). "http://a.com/" is canonical; "http://a.com" is not.
_SEG = r"/[A-Za-z0-9][A-Za-z0-9._~%!$&'()*+,;=:@\-]*"
_FAST_RE = (
    r"^https?://"
    r"[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?"
    rf"(?:/|(?:{_SEG})+)$"
)


def canonicalize_url(url: str) -> str | None:
    """Scalar (spec) canonicalization. Returns None for non-http(s)/garbage."""
    if url is None:
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{host}:{port}"
    else:
        netloc = host
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _remove_dot_segments(parts.path or "/")
    if not path.startswith("/"):
        path = "/" + path
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    query = ""
    if parts.query:
        pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    # collapse internal empty segments ("//") but keep leading slash semantics
    segs = [s for s in out if s != ""]
    return "/" + "/".join(segs) if path.startswith("/") or segs else "/".join(segs)


def _vector_fixups(arr: pa.Array) -> pa.Array:
    """Vectorized normalization of the common non-canonical patterns:
    fragment, default port, uppercase scheme/host, trailing slash. Strings a
    subsequent _FAST_RE match accepts are guaranteed equal to the scalar spec
    (each fixup mirrors exactly one canonicalize_url step; anything the fixups
    can't fully canonicalize — queries, dot segments, userinfo, odd hosts —
    still fails the fast regex and falls through to the scalar path)."""
    # strip fragment
    arr = pc.replace_substring_regex(arr, r"#.*$", "")
    # lowercase scheme + host, strip default ports (via decompose/reassemble)
    parts = pc.extract_regex(arr, r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<h>[^/?#]*)(?P<r>[/?#].*)?$")
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(parts.field("s"))
    host = pc.utf8_lower(parts.field("h"))
    # default ports are scheme-specific: :80 only for http, :443 only for https
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(host, r":443$", ""),
            host,
        ),
    )
    rest = pc.fill_null(parts.field("r"), "/")
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    rebuilt = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    # strip one trailing slash on a non-root path
    rebuilt = pc.replace_substring_regex(rebuilt, r"^(https?://[^/]+(/[^/]+)+)/$", r"\1")
    # bare host → root path
    return pc.if_else(ok, rebuilt, arr)


def canonicalize_urls(arr) -> pa.Array:
    """Vectorized canonicalization of a pyarrow string array.

    Three tiers: (1) already-canonical fast path — vectorized regex match,
    zero-copy identity; (2) vectorized fixups for the common messy patterns
    (case, fragments, default ports, trailing slashes) re-checked against the
    fast regex; (3) Python scalar spec for the remainder (queries, dot
    segments, garbage). Invalid URLs → null.
    """
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    fast = pc.fill_null(pc.match_substring_regex(arr, _FAST_RE), False)
    fast_np = fast.to_numpy(zero_copy_only=False)
    if fast_np.all():
        return arr  # zero-copy: the whole batch is already canonical
    vals = arr.to_numpy(zero_copy_only=False).copy()  # object ndarray

    bad_idx = np.flatnonzero(~fast_np)
    bad = arr.take(pa.array(bad_idx))
    fixed_arr = _vector_fixups(bad)
    fixed_ok = pc.fill_null(
        pc.match_substring_regex(fixed_arr, _FAST_RE), False
    ).to_numpy(zero_copy_only=False)
    vals[bad_idx[fixed_ok]] = np.asarray(
        fixed_arr.filter(pa.array(fixed_ok)).to_pylist(), dtype=object
    )

    slow_idx = bad_idx[~fixed_ok]
    if len(slow_idx):
        fixed = [
            canonicalize_url(s) if s is not None else None
            for s in arr.take(pa.array(slow_idx)).to_pylist()
        ]
        vals[slow_idx] = fixed
    return pa.array(vals, type=pa.string(), from_pandas=True)


def host_of(canon_arr) -> pa.Array:
    """Extract host (incl. port if non-default) from canonical URLs, vectorized."""
    if isinstance(canon_arr, pa.ChunkedArray):
        canon_arr = canon_arr.combine_chunks()
    # canonical form guarantees scheme://netloc/path...
    no_scheme = pc.replace_substring_regex(canon_arr, r"^https?://", "")
    host = pc.replace_substring_regex(no_scheme, r"/.*$", "")
    host = pc.replace_substring_regex(host, r"^[^@]*@", "")  # strip userinfo
    return host

"""Stateless vectorized functions (hashing, URL canonicalization, spans)."""

from .hashing import fnv1a64, fnv1a64_scalar
from .urlnorm import canonicalize_urls, canonicalize_url

__all__ = ["fnv1a64", "fnv1a64_scalar", "canonicalize_urls", "canonicalize_url"]

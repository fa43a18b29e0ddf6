"""Stateful structures held in frontier-shard actors: cuckoo/bloom membership
filters, the exact u64 seen-set, and shard state with checkpointing."""

from .cuckoo import CuckooFilter
from .bloom import BloomFilter
from .u64set import U64Set

__all__ = ["CuckooFilter", "BloomFilter", "U64Set"]

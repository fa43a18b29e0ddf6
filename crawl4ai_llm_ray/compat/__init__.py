"""Reference-storage-compatible API (BaseStorage semantics on Arrow)."""

from .storage import (
    ArrowProductStore,
    AsyncArrowProductStore,
    DuplicateProductError,
    ProductNotFoundError,
    StorageConnectionError,
    StorageError,
    get_storage,
)

__all__ = [
    "ArrowProductStore",
    "AsyncArrowProductStore",
    "StorageError",
    "ProductNotFoundError",
    "DuplicateProductError",
    "StorageConnectionError",
    "get_storage",
]

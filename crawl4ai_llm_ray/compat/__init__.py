"""Reference-storage-compatible API (BaseStorage semantics on Arrow)."""

from .storage import (
    ArrowProductStore,
    DuplicateProductError,
    ProductNotFoundError,
    StorageConnectionError,
    StorageError,
    get_storage,
)

__all__ = [
    "ArrowProductStore",
    "StorageError",
    "ProductNotFoundError",
    "DuplicateProductError",
    "StorageConnectionError",
    "get_storage",
]

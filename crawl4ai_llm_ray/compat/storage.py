"""Storage-compat API: the reference's ``BaseStorage`` contract
(``/root/reference/crawl4ai_llm/storage/base.py:29-200``) re-implemented on
Arrow with the engine's stable hashing — a user of the reference storage layer
can switch to this class and keep every CRUD / batch / list-filter-sort-
paginate behavior.

Semantics preserved (with reference file:line):
  * id derivation hierarchy: explicit id → ``{store_name}_{sku}`` →
    ``url_<hash>`` → generated (``json_storage.py:61-90``) — with the
    process-salted builtin ``hash`` replaced by stable FNV-1a-64 and uuid4
    replaced by a deterministic content hash (SURVEY §8 n.6 / §2.8);
  * duplicate id on save raises DuplicateProductError
    (``json_storage.py:196-197,253-254``);
  * batch save checks dups against the pre-batch snapshot only — two
    identical ids in ONE batch both pass, last write wins in the index
    (``json_storage.py:244-277``, SURVEY §2.7 D2), ids returned in input
    order (``:298``);
  * update = shallow dict-merge ``{**existing, **update}``, per-record
    ``updated_at`` on singles, one shared ``now`` for batches
    (``json_storage.py:409,478,484``);
  * batch update/delete: check-then-apply — any missing id aborts before any
    write (``json_storage.py:466-471``);
  * list_products: equality filters with one-level ``metadata.`` dot-notation
    (``json_storage.py:692-713``), whole-set sort with missing values as ""
    (``:656-658``), page/page_size slicing (``:666-672``), result envelope
    ``{products,total,page,page_size,total_pages}`` (``:684-690``);
  * corrupted persisted index → empty listing but point reads still work
    (``json_storage.py:134-136``, tested at reference
    ``tests/test_json_storage.py:452-469``).

Deliberate deviations (reference bugs not ported — SURVEY §8):
  * ALL top-level scalar fields are projected into the index, so filtering on
    arbitrary fields (e.g. ``category``) works — the reference whitelists only
    {sku,url,store_name,title} (``json_storage.py:217``) which breaks its own
    tests (§8 n.3); the intent (reference TASKS.md:6-8) is implemented.
  * persistence is atomic (records+index written to temp, renamed) — the
    reference orphans record files on crash (§8 n.5).
  * the API is synchronous: the reference's ``async`` surface exists only to
    wrap blocking file I/O in a thread pool (``json_storage.py:117-133``);
    the engine's concurrency lives in Ray stages, not per-call coroutines.

Storage layout: ``records.parquet`` (one row per record: id + JSON payload) +
``index.parquet`` (the narrow projection) — columnar instead of
file-per-record (``json_storage.py:102``).
"""

from __future__ import annotations

import datetime
import json
import os
import tempfile
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import fnv1a64_scalar


class StorageError(Exception):
    """Base storage error (reference base.py:9)."""


class StorageConnectionError(StorageError):
    """Storage unreachable/unwritable (reference base.py:14)."""


class ProductNotFoundError(StorageError):
    """Requested id absent (reference base.py:19)."""


class DuplicateProductError(StorageError):
    """Id already present on save (reference base.py:24)."""


_INDEX_FIELDS = ("sku", "url", "store_name", "title")


class ArrowProductStore:
    """Arrow/parquet-backed drop-in for the reference JSONStorage.

    Durability matches the reference by default: every mutation writes
    through to disk (``flush_every=1``, reference JSONStorage persists each
    operation — json_storage.py:199-221). Pass ``flush_every=N`` (>1) to
    batch flushes, or ``flush_every=0`` to flush only on explicit
    ``flush()`` — both are opt-in deviations for throughput."""

    def __init__(self, directory: str, flush_every: int = 1):
        self.directory = directory
        try:
            os.makedirs(directory, exist_ok=True)
            probe = os.path.join(directory, ".probe")
            with open(probe, "w") as f:
                f.write("")
            os.remove(probe)
        except (OSError, PermissionError) as e:
            raise StorageConnectionError(f"Cannot open storage directory: {e}")
        self._records: dict[str, dict] = {}
        self._index: dict[str, dict] = {}
        self._flush_every = flush_every
        self._dirty = 0
        self._load()

    # ------------------------------------------------------------ persistence
    def _records_path(self) -> str:
        return os.path.join(self.directory, "records.parquet")

    def _index_path(self) -> str:
        return os.path.join(self.directory, "index.parquet")

    def _load(self) -> None:
        if os.path.exists(self._records_path()):
            try:
                tbl = pq.read_table(self._records_path())
                for rid, payload in zip(
                    tbl["id"].to_pylist(), tbl["payload"].to_pylist()
                ):
                    self._records[rid] = json.loads(payload)
            except Exception as e:
                raise StorageConnectionError(f"Corrupted records file: {e}")
        if os.path.exists(self._index_path()):
            try:
                tbl = pq.read_table(self._index_path())
                for rid, payload in zip(
                    tbl["id"].to_pylist(), tbl["entry"].to_pylist()
                ):
                    self._index[rid] = json.loads(payload)
            except Exception:
                # corrupted index → empty listings, point reads still work
                # (reference json_storage.py:134-136)
                self._index = {}

    def flush(self) -> None:
        """Atomically persist records + index (temp file + rename — fixes the
        reference's non-atomic write, SURVEY §8 n.5)."""
        for path, cols in (
            (
                self._records_path(),
                {
                    "id": list(self._records),
                    "payload": [json.dumps(v) for v in self._records.values()],
                },
            ),
            (
                self._index_path(),
                {
                    "id": list(self._index),
                    "entry": [json.dumps(v) for v in self._index.values()],
                },
            ),
        ):
            fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
            os.close(fd)
            pq.write_table(pa.table(cols), tmp)
            os.replace(tmp, path)

    def _maybe_flush(self) -> None:
        self._dirty += 1
        if self._flush_every and self._dirty >= self._flush_every:
            self.flush()
            self._dirty = 0

    def corrupt_index_for_test(self) -> None:
        """Test hook mirroring the reference's corrupted-index scenario."""
        self._index = {}

    # ------------------------------------------------------------- id deriving
    def _derive_id(self, product: dict) -> str:
        """Reference hierarchy (json_storage.py:61-90) with stable hashing."""
        if product.get("id") is not None:
            return str(product["id"])
        if product.get("store_name") and product.get("sku"):
            return f"{product['store_name']}_{product['sku']}"
        if product.get("url"):
            return f"url_{fnv1a64_scalar(str(product['url']))}"
        # deterministic replacement for uuid4 (resume determinism, §2.8)
        return f"gen_{fnv1a64_scalar(json.dumps(product, sort_keys=True, default=str))}"

    def _index_entry(self, product_id: str, record: dict) -> dict:
        entry = {"id": product_id, "metadata": record.get("metadata", {})}
        # project ALL top-level scalars (reference intent; see deviations note)
        for field, value in record.items():
            if field in ("id", "metadata"):
                continue
            if isinstance(value, (str, int, float, bool)) or field in _INDEX_FIELDS:
                entry[field] = value
        return entry

    # -------------------------------------------------------------------- CRUD
    def save_product(self, product_data: dict) -> str:
        product_id = self._derive_id(product_data)
        if product_id in self._index:
            raise DuplicateProductError(
                f"Product with ID '{product_id}' already exists"
            )
        record = dict(product_data)
        now = datetime.datetime.now().isoformat()
        record["metadata"] = {**record.get("metadata", {}), "created_at": now, "updated_at": now}
        self._records[product_id] = record
        self._index[product_id] = self._index_entry(product_id, record)
        self._maybe_flush()
        return product_id

    def save_products(self, products_data: list[dict]) -> list[str]:
        if not products_data:
            return []
        existing_ids = set(self._index)  # pre-batch snapshot (D2 semantics)
        ids: list[str] = []
        for product in products_data:
            product_id = self._derive_id(product)
            if product_id in existing_ids:
                raise DuplicateProductError(
                    f"Product with ID '{product_id}' already exists"
                )
            record = dict(product)
            now = datetime.datetime.now().isoformat()
            record["metadata"] = {
                **record.get("metadata", {}),
                "created_at": now,
                "updated_at": now,
            }
            # in-batch duplicate ids: both pass the check, last write wins
            self._records[product_id] = record
            self._index[product_id] = self._index_entry(product_id, record)
            ids.append(product_id)
        self._maybe_flush()
        return ids

    def get_product(self, product_id: str) -> dict:
        if product_id not in self._records:
            raise ProductNotFoundError(f"Product with ID '{product_id}' not found")
        return dict(self._records[product_id])

    def get_products(self, product_ids: list[str]) -> list[dict]:
        missing = [pid for pid in product_ids if pid not in self._records]
        if missing:
            raise ProductNotFoundError(
                f"Products with IDs '{', '.join(missing)}' not found"
            )
        return [dict(self._records[pid]) for pid in product_ids]

    def update_product(self, product_data: dict) -> str:
        if "id" not in product_data:
            raise ValueError("Product data must include 'id' field")
        product_id = str(product_data["id"])
        if product_id not in self._index:
            raise ProductNotFoundError(f"Product with ID '{product_id}' not found")
        updated = {**self._records[product_id], **product_data}
        updated["metadata"] = {
            **updated.get("metadata", {}),
            "updated_at": datetime.datetime.now().isoformat(),
        }
        self._records[product_id] = updated
        self._index[product_id] = self._index_entry(product_id, updated)
        self._maybe_flush()
        return product_id

    def update_products(self, products_data: list[dict]) -> list[str]:
        if not products_data:
            return []
        ids = []
        for i, product in enumerate(products_data):
            if "id" not in product:
                raise ValueError(f"Product data at index {i} must include 'id' field")
            ids.append(str(product["id"]))
        missing = [pid for pid in ids if pid not in self._index]
        if missing:
            # check-then-apply: nothing written on any miss (reference
            # json_storage.py:466-471)
            raise ProductNotFoundError(
                f"Products with IDs '{', '.join(missing)}' not found"
            )
        now = datetime.datetime.now().isoformat()  # one shared timestamp (:478)
        for product_id, product in zip(ids, products_data):
            updated = {**self._records[product_id], **product}
            updated["metadata"] = {**updated.get("metadata", {}), "updated_at": now}
            self._records[product_id] = updated
            self._index[product_id] = self._index_entry(product_id, updated)
        self._maybe_flush()
        return ids

    def delete_product(self, product_id: str) -> bool:
        if product_id not in self._records:
            raise ProductNotFoundError(f"Product with ID '{product_id}' not found")
        del self._records[product_id]
        self._index.pop(product_id, None)
        self._maybe_flush()
        return True

    def delete_products(self, product_ids: list[str]) -> int:
        missing = [pid for pid in product_ids if pid not in self._records]
        if missing:
            raise ProductNotFoundError(
                f"Products with IDs '{', '.join(missing)}' not found"
            )
        for pid in product_ids:
            del self._records[pid]
            self._index.pop(pid, None)
        self._maybe_flush()
        return len(product_ids)

    # ----------------------------------------------------------------- listing
    def _matches_filters(self, entry: dict, filters: dict) -> bool:
        for field, value in filters.items():
            if field.startswith("metadata."):
                meta_field = field.split(".", 1)[1]
                metadata = entry.get("metadata", {})
                if meta_field not in metadata or metadata[meta_field] != value:
                    return False
            elif field not in entry or entry[field] != value:
                return False
        return True

    def list_products(
        self,
        filters: dict | None = None,
        page: int = 1,
        page_size: int = 100,
        sort_by: str | None = None,
        sort_order: str = "asc",
    ) -> dict:
        ids = [
            pid
            for pid, entry in self._index.items()
            if not filters or self._matches_filters(entry, filters)
        ]
        if sort_by:
            def key(pid):
                if sort_by == "id":
                    return pid
                entry = self._index.get(pid, {})
                if sort_by.startswith("metadata."):
                    return entry.get("metadata", {}).get(
                        sort_by.split(".", 1)[1], ""
                    )
                return entry.get(sort_by, "")

            ids = sorted(ids, key=key, reverse=(sort_order.lower() == "desc"))
        total = len(ids)
        total_pages = (total + page_size - 1) // page_size if total > 0 else 1
        start = (page - 1) * page_size
        end = min(start + page_size, total)
        page_ids = ids[start:end]
        products = [dict(self._records[pid]) for pid in page_ids if pid in self._records]
        return {
            "products": products,
            "total": total,
            "page": page,
            "page_size": page_size,
            "total_pages": total_pages,
        }

    # -------------------------------------------------------- engine interop
    def to_dataset(self):
        """The full record set as a ray.data.Dataset of (id, payload JSON) —
        bridge from the compat store into engine pipelines."""
        import ray.data as rd

        return rd.from_items(
            [
                {"id": rid, "payload": json.dumps(rec)}
                for rid, rec in self._records.items()
            ]
        )


class AsyncArrowProductStore:
    """Async facade over ArrowProductStore matching the reference's async
    surface (every storage method is ``async`` there —
    ``/root/reference/crawl4ai_llm/storage/base.py:33-171``), so reference
    call sites like ``await storage.save_product(...)``
    (``/root/reference/tests/test_json_storage.py:104``) run unmodified.

    The sync implementation is CPU-bound dict/Arrow work with write-through
    parquet flushes; each call is delegated via ``asyncio.to_thread`` so an
    event loop running real fetches is never blocked by a flush."""

    def __init__(self, directory: str, flush_every: int = 1, _store=None):
        # _store: wrap an existing sync store (get_storage passes the
        # path-singleton instance so sync and async surfaces over the same
        # directory share ONE in-memory index)
        self._store = (
            _store
            if _store is not None
            else ArrowProductStore(directory, flush_every=flush_every)
        )

    # the sync store, for engine interop (to_dataset etc.)
    @property
    def sync(self) -> ArrowProductStore:
        return self._store

    async def _run(self, fn, *args, **kwargs):
        import asyncio

        return await asyncio.to_thread(fn, *args, **kwargs)

    async def save_product(self, product_data: dict) -> str:
        return await self._run(self._store.save_product, product_data)

    async def save_products(self, products_data: list[dict]) -> list[str]:
        return await self._run(self._store.save_products, products_data)

    async def get_product(self, product_id: str) -> dict:
        return await self._run(self._store.get_product, product_id)

    async def get_products(self, product_ids: list[str]) -> list[dict]:
        return await self._run(self._store.get_products, product_ids)

    async def update_product(self, product_data: dict) -> str:
        return await self._run(self._store.update_product, product_data)

    async def update_products(self, products_data: list[dict]) -> list[str]:
        return await self._run(self._store.update_products, products_data)

    async def delete_product(self, product_id: str) -> bool:
        return await self._run(self._store.delete_product, product_id)

    async def delete_products(self, product_ids: list[str]) -> int:
        return await self._run(self._store.delete_products, product_ids)

    async def list_products(
        self,
        filters: dict | None = None,
        page: int = 1,
        page_size: int = 100,
        sort_by: str | None = None,
        sort_order: str = "asc",
    ) -> dict:
        return await self._run(
            self._store.list_products,
            filters=filters,
            page=page,
            page_size=page_size,
            sort_by=sort_by,
            sort_order=sort_order,
        )

    async def flush(self) -> None:
        return await self._run(self._store.flush)


_REGISTRY = {"arrow": ArrowProductStore, "json": ArrowProductStore, "async": AsyncArrowProductStore}
_instances: dict[str, ArrowProductStore] = {}  # resolved path → SYNC store
_instance_options: dict[str, dict] = {}  # resolved path → creating options
_async_instances: dict[str, AsyncArrowProductStore] = {}


def get_storage(storage_type: str = "arrow", path: str = "/tmp/arrow_store", **options):
    """Factory/registry (reference factory.py:26-63, with its
    config-attribute and singleton-signature bugs fixed — SURVEY §8 n.1):
    singleton per RESOLVED PATH. 'arrow'/'json'/'async' over the same
    directory share ONE in-memory index (the async facade wraps the cached
    sync store), so writes through any surface are immediately visible to —
    and can never be clobbered by the write-through flushes of — the others.

    Options apply on FIRST construction for a path; a later call for the
    same path with different options gets the existing instance and a
    warning (silently ignoring them would hide e.g. a flush_every change)."""
    import warnings

    if storage_type not in _REGISTRY:
        raise ValueError(f"Unknown storage type: {storage_type}")
    key = os.path.realpath(path)
    if key not in _instances:
        _instances[key] = ArrowProductStore(path, **options)
        _instance_options[key] = dict(options)
    elif options and options != _instance_options.get(key, {}):
        warnings.warn(
            f"get_storage({path!r}): store already exists for this path; "
            f"ignoring options {options!r} (created with "
            f"{_instance_options.get(key, {})!r})",
            stacklevel=2,
        )
    if storage_type == "async":
        if key not in _async_instances:
            _async_instances[key] = AsyncArrowProductStore(path, _store=_instances[key])
        return _async_instances[key]
    return _instances[key]

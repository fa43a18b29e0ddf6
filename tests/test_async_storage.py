"""Reference async-API tests ported against AsyncArrowProductStore.

Test BODIES are taken from ``/root/reference/tests/test_json_storage.py``
(fixtures at :40-60, test_get_product at :129-136, test_update_product at
:138-170, test_delete_product at :172-193, test_list_products at :196-214) —
the ``await storage.<method>(...)`` call sites run UNMODIFIED; only
JSON-file-internal assertions (``storage._get_file_path`` / ``index_path``)
are replaced with API-level equivalents, since this store persists parquet,
not one JSON file per record. pytest-asyncio is not installed in this
container, so each async body runs under ``asyncio.run``.
"""

import asyncio

import pytest

from crawl4ai_llm_ray.compat import (
    AsyncArrowProductStore,
    DuplicateProductError,
    ProductNotFoundError,
)


@pytest.fixture
def storage(tmp_path):
    return AsyncArrowProductStore(str(tmp_path / "store"))


@pytest.fixture
def sample_product():
    # reference fixture, verbatim (test_json_storage.py:40-60)
    return {
        "title": "Test Product",
        "description": "This is a test product",
        "price": {
            "current": 99.99,
            "currency": "USD",
        },
        "sku": "TEST-123",
        "url": "https://example.com/products/test-123",
        "store_name": "Test Store",
        "images": [
            {
                "url": "https://example.com/images/test-123-1.jpg",
                "alt": "Test Product Image 1",
            }
        ],
        "attributes": {
            "color": "Red",
            "size": "Medium",
        },
    }


def test_save_product(storage, sample_product):
    async def body():
        product_id = await storage.save_product(sample_product)
        # reference checks the index file + metadata stamps (:104-121);
        # API-level equivalents:
        data = await storage.get_product(product_id)
        assert data["title"] == sample_product["title"]
        assert "metadata" in data
        assert "created_at" in data["metadata"]
        assert "updated_at" in data["metadata"]
        # duplicate save must be rejected (reference batch semantics)
        with pytest.raises(DuplicateProductError):
            await storage.save_product(sample_product)

    asyncio.run(body())


def test_get_product(storage, sample_product):
    async def body():
        product_id = await storage.save_product(sample_product)
        product_data = await storage.get_product(product_id)
        assert product_data["title"] == sample_product["title"]
        assert product_data["description"] == sample_product["description"]

    asyncio.run(body())


def test_update_product(storage, sample_product):
    async def body():
        product_id = await storage.save_product(sample_product)
        product_data = await storage.get_product(product_id)
        initial_updated_at = product_data["metadata"]["updated_at"]
        await asyncio.sleep(0.1)
        updated_product = {
            "id": product_id,
            "title": "Updated Product",
            "price": {
                "current": 79.99,
                "currency": "USD",
            },
        }
        await storage.update_product(updated_product)
        updated_data = await storage.get_product(product_id)
        assert updated_data["title"] == "Updated Product"
        assert updated_data["price"]["current"] == 79.99
        assert updated_data["description"] == sample_product["description"]
        assert updated_data["metadata"]["updated_at"] != initial_updated_at

    asyncio.run(body())


def test_delete_product(storage, sample_product):
    async def body():
        product_id = await storage.save_product(sample_product)
        result = await storage.delete_product(product_id)
        assert result is True
        with pytest.raises(ProductNotFoundError):
            await storage.get_product(product_id)

    asyncio.run(body())


def test_list_products(storage, sample_product):
    async def body():
        for i in range(5):
            product = sample_product.copy()
            product["title"] = f"Product {i}"
            product["sku"] = f"TEST-{i}"
            await storage.save_product(product)

        result = await storage.list_products()
        assert result["total"] == 5
        assert len(result["products"]) == 5
        assert result["page"] == 1
        assert result["page_size"] == 100
        assert result["total_pages"] == 1

        result = await storage.list_products(page=1, page_size=2)
        assert result["total"] == 5
        assert len(result["products"]) == 2
        assert result["page"] == 1
        assert result["page_size"] == 2

    asyncio.run(body())


def test_async_durability(tmp_path, sample_product):
    """Write-through default: a second (sync) store over the same directory
    sees everything the async store wrote — no explicit flush needed."""

    async def body():
        s = AsyncArrowProductStore(str(tmp_path / "d"))
        pid = await s.save_product(sample_product)
        return pid

    pid = asyncio.run(body())
    from crawl4ai_llm_ray.compat import ArrowProductStore

    reopened = ArrowProductStore(str(tmp_path / "d"))
    assert reopened.get_product(pid)["title"] == sample_product["title"]


def test_concurrent_async_batch(storage):
    """asyncio.gather over per-product saves (the reference's batch pattern,
    test_json_storage_batch.py): all succeed, ids distinct."""

    async def body():
        products = [
            {"title": f"P{i}", "sku": f"SKU-{i:03d}", "store_name": "Test Store"}
            for i in range(10)
        ]
        ids = await asyncio.gather(*(storage.save_product(p) for p in products))
        assert len(set(ids)) == 10
        listing = await storage.list_products(page_size=100)
        assert listing["total"] == 10

    asyncio.run(body())

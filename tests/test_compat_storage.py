"""Storage-compat suite: ports the reference's storage test intent
(reference tests/test_json_storage.py + test_json_storage_batch.py, per
SURVEY §5 — intent, not the literally-broken asserts of §8 n.2-3)."""

import pytest

from crawl4ai_llm_ray.compat import (
    ArrowProductStore,
    DuplicateProductError,
    ProductNotFoundError,
    StorageConnectionError,
    get_storage,
)


@pytest.fixture
def store(tmp_path):
    return ArrowProductStore(str(tmp_path / "store"))


@pytest.fixture
def sample_product():
    return {
        "title": "Test Product",
        "url": "https://example.com/product/1",
        "sku": "SKU1",
        "store_name": "TestStore",
        "price": {"current": 99.99, "currency": "USD"},
        "images": [{"url": "https://example.com/img1.jpg", "alt": "front"}],
        "category": "electronics",
        "metadata": {"tags": ["new", "sale"]},
    }


class TestCrud:
    def test_save_get_roundtrip(self, store, sample_product):
        pid = store.save_product(sample_product)
        assert pid == "TestStore_SKU1"  # store_name_sku derivation
        got = store.get_product(pid)
        assert got["title"] == "Test Product"
        assert got["price"]["current"] == 99.99
        assert "created_at" in got["metadata"] and "updated_at" in got["metadata"]
        assert got["metadata"]["tags"] == ["new", "sale"]

    def test_duplicate_raises(self, store, sample_product):
        store.save_product(sample_product)
        with pytest.raises(DuplicateProductError):
            store.save_product(sample_product)

    def test_update_shallow_merge(self, store, sample_product):
        pid = store.save_product(sample_product)
        store.update_product({"id": pid, "title": "New Title"})
        got = store.get_product(pid)
        assert got["title"] == "New Title"
        assert got["sku"] == "SKU1"  # untouched fields survive

    def test_update_missing_id_field(self, store):
        with pytest.raises(ValueError):
            store.update_product({"title": "no id"})

    def test_not_found(self, store):
        with pytest.raises(ProductNotFoundError):
            store.get_product("nope")
        with pytest.raises(ProductNotFoundError):
            store.update_product({"id": "nope"})
        with pytest.raises(ProductNotFoundError):
            store.delete_product("nope")

    def test_delete(self, store, sample_product):
        pid = store.save_product(sample_product)
        assert store.delete_product(pid) is True
        with pytest.raises(ProductNotFoundError):
            store.get_product(pid)

    def test_unwritable_dir_raises(self):
        with pytest.raises(StorageConnectionError):
            ArrowProductStore("/proc/definitely/not/writable")


class TestIdDerivation:
    def test_hierarchy(self, store):
        assert store.save_product({"id": "explicit", "title": "a"}) == "explicit"
        assert (
            store.save_product({"store_name": "S", "sku": "K", "title": "b"}) == "S_K"
        )
        url_id = store.save_product({"url": "https://x.com/p", "title": "c"})
        assert url_id.startswith("url_")
        gen_id = store.save_product({"title": "only title"})
        assert gen_id.startswith("gen_")
        # stable across instances (unlike the reference's salted hash)
        import crawl4ai_llm_ray.functions.hashing as h

        assert url_id == f"url_{h.fnv1a64_scalar('https://x.com/p')}"


class TestBatch:
    def test_batch_save_input_order(self, store):
        products = [{"id": f"p{i}", "title": f"t{i}"} for i in range(5)]
        ids = store.save_products(products)
        assert ids == [f"p{i}" for i in range(5)]

    def test_empty_batches(self, store):
        assert store.save_products([]) == []
        assert store.update_products([]) == []

    def test_batch_duplicate_vs_existing_raises(self, store):
        store.save_product({"id": "p1", "title": "x"})
        with pytest.raises(DuplicateProductError):
            store.save_products([{"id": "p2"}, {"id": "p1"}])

    def test_inbatch_duplicate_last_write_wins(self, store):
        # D2 parity: two identical ids in one batch both pass the snapshot
        # check; last write wins (reference json_storage.py:244-277)
        ids = store.save_products(
            [{"id": "dup", "title": "first"}, {"id": "dup", "title": "second"}]
        )
        assert ids == ["dup", "dup"]
        assert store.get_product("dup")["title"] == "second"

    def test_batch_update_all_or_nothing(self, store):
        store.save_products([{"id": "a", "title": "A"}, {"id": "b", "title": "B"}])
        with pytest.raises(ProductNotFoundError):
            store.update_products(
                [{"id": "a", "title": "A2"}, {"id": "missing", "title": "?"}]
            )
        # nothing applied (check-then-apply, reference tests :224-229)
        assert store.get_product("a")["title"] == "A"

    def test_batch_update_shared_timestamp(self, store):
        store.save_products([{"id": "a"}, {"id": "b"}])
        store.update_products([{"id": "a", "x": 1}, {"id": "b", "x": 2}])
        ta = store.get_product("a")["metadata"]["updated_at"]
        tb = store.get_product("b")["metadata"]["updated_at"]
        assert ta == tb  # single shared now (reference json_storage.py:478)

    def test_batch_delete_count(self, store):
        store.save_products([{"id": "a"}, {"id": "b"}, {"id": "c"}])
        assert store.delete_products(["a", "c"]) == 2
        assert store.list_products()["total"] == 1


class TestListing:
    @pytest.fixture
    def filled(self, store):
        for i in range(25):
            store.save_product(
                {
                    "id": f"p{i:02d}",
                    "title": f"Product {i:02d}",
                    "category": "odd" if i % 2 else "even",
                    "rank": f"{i:02d}" if i < 20 else None,
                    "metadata": {"tags": ["red"] if i % 3 == 0 else ["blue"]},
                }
            )
        return store

    def test_filter_top_level(self, filled):
        res = filled.list_products(filters={"category": "even"})
        assert res["total"] == 13

    def test_filter_metadata_dot_notation(self, filled):
        res = filled.list_products(filters={"metadata.tags": ["red"]})
        assert res["total"] == 9

    def test_filter_no_match_on_missing_field(self, filled):
        assert filled.list_products(filters={"nosuch": 1})["total"] == 0

    def test_sort_and_paginate(self, filled):
        res = filled.list_products(sort_by="title", sort_order="desc", page=2, page_size=10)
        titles = [p["title"] for p in res["products"]]
        assert titles[0] == "Product 14"
        assert res["total"] == 25 and res["total_pages"] == 3

    def test_sort_missing_field_as_empty(self, filled):
        res = filled.list_products(sort_by="rank", sort_order="asc", page_size=25)
        # rank=None rows sort as "" → first in ascending order
        assert res["products"][0]["rank"] is None

    def test_sort_by_id(self, filled):
        res = filled.list_products(sort_by="id", page_size=5)
        assert [p["id"] for p in res["products"]] == [f"p{i:02d}" for i in range(5)]

    def test_corrupted_index_lists_empty_but_point_reads_work(self, filled):
        filled.corrupt_index_for_test()
        assert filled.list_products()["total"] == 0
        assert filled.get_product("p00")["title"] == "Product 00"


class TestPersistence:
    def test_flush_and_reload(self, tmp_path, sample_product):
        d = str(tmp_path / "s")
        s1 = ArrowProductStore(d)
        pid = s1.save_product(sample_product)
        s1.flush()
        s2 = ArrowProductStore(d)
        assert s2.get_product(pid)["title"] == "Test Product"
        assert s2.list_products()["total"] == 1

    def test_factory_singleton(self, tmp_path):
        a = get_storage("arrow", str(tmp_path / "f"))
        b = get_storage("arrow", str(tmp_path / "f"))
        assert a is b
        with pytest.raises(ValueError):
            get_storage("bogus", "/tmp/x")

"""ProductData ⇄ interleaved span bridge + new multimodal stages."""

import numpy as np
import pytest

from crawl4ai_llm_ray.compat.models import (
    ProductData,
    ProductImage,
    product_to_span_row,
    products_to_interleaved_table,
    span_row_to_product,
)

SF = "/root/testdata/sf0.001"


class TestModelsBridge:
    def test_interleave_order_respects_positions(self):
        p = ProductData(
            title="Widget",
            url="https://Shop.example.com/w1",
            description="A fine widget",
            images=[
                ProductImage(url="https://cdn.example.com/b.jpg", alt="back", position=5),
                ProductImage(url="https://cdn.example.com/a.jpg", alt="front", position=1),
            ],
        )
        row = product_to_span_row(p)
        kinds = [s["kind"] for s in row["spans"]]
        assert kinds == ["text", "text", "image", "image"]
        # position field orders the media (models.py:29 semantics)
        assert row["spans"][2]["text"] == "front"
        assert row["spans"][3]["text"] == "back"
        # offsets monotone
        assert [s["offset"] for s in row["spans"]] == [0, 1, 2, 3]
        # doc_id = url_<stable hash of canonical url>
        assert row["doc_id"].startswith("url_")

    def test_roundtrip(self):
        p = ProductData(
            title="T",
            url="https://x.com/p",
            description="D",
            images=[ProductImage(url="https://x.com/i.jpg", alt="i", position=0)],
        )
        back = span_row_to_product(product_to_span_row(p), p.url)
        assert back.title == "T" and back.description == "D"
        assert back.images[0].alt == "i"

    def test_validation(self):
        with pytest.raises(ValueError):
            ProductData(title="", url="https://x.com/")
        with pytest.raises(ValueError):
            ProductData(title="t", url="not a url")

    def test_batch_table_schema(self):
        from crawl4ai_llm_ray.schema import DOC_SCHEMA

        t = products_to_interleaved_table(
            [ProductData(title=f"t{i}", url=f"https://x.com/{i}") for i in range(3)]
        )
        assert t.schema.equals(DOC_SCHEMA)
        assert t.num_rows == 3


@pytest.mark.usefixtures("ray_session")
def test_media_chunks_cover_payloads():
    from crawl4ai_llm_ray.pipelines import multimodal

    chunks = multimodal.media_chunks(SF, chunk_bytes=64).to_pandas()
    media = multimodal.synth_media_table(SF).to_pandas()
    sizes = {r["doc_id"]: len(r["payload"]) for _, r in media.iterrows()}
    got = chunks.groupby("doc_id")["n_bytes"].sum().to_dict()
    assert got == sizes  # chunks exactly tile every payload
    assert (chunks["n_bytes"] <= 64).all()


@pytest.mark.usefixtures("ray_session")
def test_text_embeddings_deterministic_and_normalized():
    from crawl4ai_llm_ray.pipelines import multimodal

    a = multimodal.text_embeddings(SF).to_pandas().sort_values("doc_id")
    b = multimodal.text_embeddings(SF).to_pandas().sort_values("doc_id")
    va = np.stack(a["embedding"].values)
    vb = np.stack(b["embedding"].values)
    assert np.array_equal(va, vb)  # weights derived from seed, not RNG state
    norms = np.linalg.norm(va, axis=1)
    assert ((np.abs(norms - 1) < 1e-5) | (norms == 0)).all()

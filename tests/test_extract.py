"""Selector-spec extraction stage (pipelines/extract.py): batch-level
semantics on hand-built span tables, spec validation, and the engine
add_extraction_stage wiring (ModelSettings.options → actor spec)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawl4ai_llm_ray.pipelines.extract import (
    PRODUCT_SPEC,
    FieldSpec,
    ProductExtractor,
    extract_table,
)

SPAN_T = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_T)),
        }
    )


def _span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_extract_table_nth_attr_count_and_nulls():
    t = _docs(
        [
            (
                "d0",
                [
                    _span("text", "acme widget", offset=0),
                    _span("image", media_ref="img://a", offset=11),
                    _span("text", "second para", offset=20),
                    _span("link", media_ref="http://x", offset=31),
                ],
            ),
            ("d1", [_span("image", media_ref="img://only", offset=0)]),  # no text
            ("d2", []),  # empty span list
        ]
    )
    out = extract_table(t, PRODUCT_SPEC).to_pandas().set_index("doc_id")
    assert out.loc["d0", "title"] == "acme widget"
    assert out.loc["d0", "brand"] == "acme"
    assert out.loc["d0", "first_image"] == "img://a"
    assert out.loc["d0", "n_images"] == 1 and out.loc["d0", "n_links"] == 1
    # doc with no text spans: title/brand null, image fields populated
    assert out.loc["d1", "title"] is None and out.loc["d1", "brand"] is None
    assert out.loc["d1", "first_image"] == "img://only"
    # empty span list: everything null / zero
    assert out.loc["d2", "title"] is None
    assert out.loc["d2", "n_images"] == 0 and out.loc["d2", "n_links"] == 0

    # nth>0 + offset attr
    spec = (
        FieldSpec("second_text", kind="text", attr="text", nth=1),
        FieldSpec("second_off", kind="text", attr="offset", nth=1),
    )
    out2 = extract_table(t, spec).to_pandas().set_index("doc_id")
    assert out2.loc["d0", "second_text"] == "second para"
    assert out2.loc["d0", "second_off"] == 20
    assert out2.loc["d1", "second_text"] is None


def test_extract_regex_no_match_is_null_not_empty():
    # the struct-validity pitfall: extract_regex's no-match nulls must
    # survive the struct_field projection (not surface as "")
    t = _docs([("d0", [_span("text", "123 starts with digits")])])
    spec = (FieldSpec("alpha", kind="text", regex=r"^(?P<v>[a-z]+)"),)
    col = extract_table(t, spec)["alpha"]
    assert col.null_count == 1


def test_spec_validation():
    with pytest.raises(ValueError, match="attr"):
        FieldSpec("x", kind="text", attr="nope")
    with pytest.raises(ValueError, match="named group"):
        FieldSpec("x", kind="text", regex=r"^(\w+)")
    with pytest.raises(TypeError):
        ProductExtractor(spec=("not-a-fieldspec",))


def test_empty_batch_keeps_schema():
    t = _docs([])
    out = extract_table(t, PRODUCT_SPEC)
    assert out.num_rows == 0
    assert out.column_names == [
        "doc_id", "title", "brand", "first_image", "n_images", "n_links",
        "identifiers", "variants",
    ]
    assert out["n_images"].type == pa.int64()
    assert out["identifiers"].type == pa.string()
    assert out["variants"].type == pa.string()


@pytest.mark.usefixtures("ray_session")
def test_engine_extraction_stage_threads_model_settings():
    """Pipeline.add_extraction_stage must deliver config.llm to the actor
    (the reference LLMConfig consumption path): a custom spec placed in
    ModelSettings.options drives the extraction schema."""
    import ray.data as rd

    from crawl4ai_llm_ray.engine import EngineConfig, ModelSettings, Pipeline

    ds = rd.from_arrow(
        _docs(
            [
                ("a", [_span("link", media_ref="l1"), _span("link", media_ref="l2")]),
                ("b", [_span("text", "hello")]),
            ]
        )
    )
    cfg = EngineConfig()
    cfg.llm = ModelSettings(
        options={"extraction_spec": (FieldSpec("links", kind="link", attr="count"),)}
    )
    out = (
        Pipeline(ds, cfg)
        .add_extraction_stage(ProductExtractor, concurrency=1)
        .dataset()
        .to_pandas()
        .set_index("doc_id")
    )
    assert list(out.columns) == ["links"]
    assert out.loc["a", "links"] == 2 and out.loc["b", "links"] == 0


def test_nested_map_and_list_specs():
    """MapSpec/ListSpec (reference identifiers/variants, models.py:55-61):
    canonical JSON strings, null sub-values -> JSON null, empty list -> []."""
    t = _docs(
        [
            (
                "d0",
                [
                    _span("text", "acme widget", offset=0),
                    _span("image", media_ref="http://cdn/a.jpg", offset=11),
                    _span("image", media_ref="http://cdn/b.jpg", offset=20),
                    _span("link", media_ref="http://shop.test/x", offset=31),
                ],
            ),
            ("d1", [_span("image", media_ref="img://only", offset=3)]),
            ("d2", []),
        ]
    )
    out = extract_table(t, PRODUCT_SPEC).to_pandas().set_index("doc_id")
    assert out.loc["d0", "identifiers"] == '{"sku":"widget","store":"shop.test"}'
    assert (
        out.loc["d0", "variants"]
        == '[{"ref":"http://cdn/a.jpg","pos":11},{"ref":"http://cdn/b.jpg","pos":20}]'
    )
    # no text span and no link span: both identifier entries null
    assert out.loc["d1", "identifiers"] == '{"sku":null,"store":null}'
    assert out.loc["d1", "variants"] == '[{"ref":"img://only","pos":3}]'
    assert out.loc["d2", "variants"] == "[]"


def test_list_spec_skips_null_pos_spans():
    """A span with a null pos attr drops out of the variants array (DuckDB
    string_agg semantics: a NULL element is skipped), never nulling the
    whole per-doc JSON string."""
    t = pa.table(
        {
            "doc_id": pa.array(["d0"]),
            "spans": pa.array(
                [[
                    {"kind": "image", "text": "", "media_ref": "a", "offset": 1},
                    {"kind": "image", "text": "", "media_ref": "b", "offset": None},
                    {"kind": "image", "text": "", "media_ref": "c", "offset": 3},
                ]],
                type=pa.list_(SPAN_T),
            ),
        }
    )
    out = extract_table(t, PRODUCT_SPEC).to_pandas().set_index("doc_id")
    assert out.loc["d0", "variants"] == '[{"ref":"a","pos":1},{"ref":"c","pos":3}]'
    assert out.loc["d0", "n_images"] == 3  # the count still sees all spans

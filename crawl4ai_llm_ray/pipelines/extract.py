"""Selector-spec-driven field extraction over interleaved span documents —
the Ray-Data analog of the reference's advertised extraction strategies
(``/root/reference/README.md:11-12``: "CSS selectors, XPath, and LLM-based
approaches", "Schema generation for automated extraction"; the LLMConfig the
reference defines but never consumes, ``config.py:65-88``).

The reference's extractor is an external dependency; what it *means* is a
schema of (field ← selector) rules applied per fetched page. Here the page
"DOM" is the interleaved span list (kind, text, media_ref, offset) the crawl
emits (BASELINE.json input_hint), and a :class:`FieldSpec` is the selector:
filter spans by kind, take the nth match in document order, read one
attribute, optionally post-process with a regex capture. A tuple of
FieldSpecs is the extraction schema (:data:`PRODUCT_SPEC` mirrors the
reference's ProductData shape, ``models.py:32-71``: title / brand /
first image / image + link counts).

Execution shape: :class:`ProductExtractor` is a callable CLASS for
``map_batches`` actor pools — the spec (and its compiled regexes) is built
ONCE per actor in ``__init__`` from :class:`~..engine.ModelSettings`
(``Pipeline.add_extraction_stage`` threads ``config.llm`` in, the reference's
LLMConfig consumption path); ``__call__`` extracts every field of a batch in
one vectorized pass over the exploded span arrays — Arrow kernels + numpy
run-length arithmetic, no per-row or per-field Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ATTRS = ("text", "media_ref", "offset", "count")


@dataclass(frozen=True)
class FieldSpec:
    """One selector rule: ``kind``-filtered spans in document order →
    ``nth`` match → ``attr`` (or ``attr="count"`` for the number of
    matches) → optional regex capture (RE2, one NAMED group ``v``, e.g.
    ``r"^(?P<v>\\w+)"``; no match → null)."""

    name: str
    kind: str
    attr: str = "text"
    nth: int = 0
    regex: str | None = None

    def __post_init__(self):
        if self.attr not in _ATTRS:
            raise ValueError(f"FieldSpec.attr must be one of {_ATTRS}")
        if self.regex is not None and "(?P<v>" not in self.regex:
            raise ValueError("FieldSpec.regex needs a named group (?P<v>...)")


@dataclass(frozen=True)
class MapSpec:
    """Nested map field (reference ``identifiers: Dict[str,str]``,
    models.py:55-56): each sub-FieldSpec extracts one entry; the column is a
    canonical JSON object string ``{"k":"v",...}`` (null sub-values → JSON
    null) so the DuckDB oracle can build the identical string. Sub-field
    regexes must capture JSON-safe values (no quotes/backslashes) — the
    encoder does no escaping, by contract."""

    name: str
    fields: tuple[FieldSpec, ...]


@dataclass(frozen=True)
class ListSpec:
    """Nested list-of-struct field (reference ``variants:
    List[Dict[str,Any]]`` / ordered ``images`` list, models.py:24-29,59):
    ALL spans of ``kind`` in document order, each rendered as
    ``{"ref":"<ref_attr>","pos":<pos_attr>}``, joined into one JSON array
    string per doc (no matches → ``[]``). Built fully vectorized: one
    ListArray re-wrap of the exploded spans + one ``binary_join``."""

    name: str
    kind: str
    ref_attr: str = "media_ref"
    pos_attr: str = "offset"


# ProductData-shape schema (reference models.py:32-71): title = first text
# span, brand = its leading word, first image ref, media/link fan-out counts,
# plus the nested identifiers map (models.py:55-56; sku = title's trailing
# word, store = first link's host — the "{store_name}_{sku}" id hierarchy
# inputs, json_storage.py:83) and the variants list (models.py:59 / ordered
# ProductImage list, models.py:24-29: every image span with its offset).
PRODUCT_SPEC: tuple = (
    FieldSpec("title", kind="text", attr="text", nth=0),
    FieldSpec("brand", kind="text", attr="text", nth=0, regex=r"^(?P<v>\w+)"),
    FieldSpec("first_image", kind="image", attr="media_ref", nth=0),
    FieldSpec("n_images", kind="image", attr="count"),
    FieldSpec("n_links", kind="link", attr="count"),
    MapSpec(
        "identifiers",
        (
            FieldSpec("sku", kind="text", attr="text", nth=0, regex=r"(?P<v>\w+)$"),
            FieldSpec(
                "store",
                kind="link",
                attr="media_ref",
                nth=0,
                regex=r"^https?://(?P<v>[\w.-]+)",
            ),
        ),
    ),
    ListSpec("variants", kind="image"),
)


def _extract_field(f: FieldSpec, parent, vals, kind_col, n: int) -> pa.Array:
    """One FieldSpec over the shared exploded-span arrays: boolean kind mask
    + run-length occurrence rank over the parent index."""
    sel = pc.equal(kind_col, f.kind).to_numpy(zero_copy_only=False)
    sel = np.asarray(sel, dtype=bool)
    p = parent[sel]  # sorted nondecreasing by construction
    if f.attr == "count":
        return pa.array(np.bincount(p, minlength=n).astype(np.int64))
    if len(p):
        first_idx = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        runlen = np.diff(np.r_[first_idx, len(p)])
        occ = np.arange(len(p)) - np.repeat(first_idx, runlen)
    else:
        occ = np.empty(0, np.int64)
    hit = occ == f.nth
    docs_hit = p[hit]
    src_idx = np.flatnonzero(sel)[hit]
    take_idx = np.full(n, -1, np.int64)
    take_idx[docs_hit] = src_idx
    idx_arr = pa.array(np.maximum(take_idx, 0), mask=take_idx < 0)
    col = vals.field(f.attr).take(idx_arr)  # null index → null value
    if f.attr == "offset":
        col = pc.cast(col, pa.int64())
    if f.regex is not None:
        # struct_field (not .field): the no-match nulls live in the
        # STRUCT's validity bitmap, and the child array doesn't inherit
        # them — .field() would surface "" where there was no match
        col = pc.struct_field(pc.extract_regex(col, f.regex), "v")
    return col


def _json_quote(col: pa.Array) -> pa.Array:
    """'"v"' per element, JSON null where the value is null (no escaping —
    MapSpec contract restricts values to JSON-safe captures)."""
    # NB binary_join_element_wise treats its LAST arg as the separator
    quoted = pc.binary_join_element_wise(
        pa.scalar('"'), col, pa.scalar('"'), pa.scalar("")
    )
    return pc.fill_null(quoted, "null")


def _extract_map(m: MapSpec, parent, vals, kind_col, n: int) -> pa.Array:
    parts = ['{']
    for i, f in enumerate(m.fields):
        v = _extract_field(f, parent, vals, kind_col, n)
        parts.append(("," if i else "") + f'"{f.name}":')
        parts.append(_json_quote(v))
    parts.append("}")
    args = [p if isinstance(p, pa.Array) else pa.scalar(p) for p in parts]
    return pc.binary_join_element_wise(*args, pa.scalar(""))


def _extract_list(ls: ListSpec, parent, vals, kind_col, n: int) -> pa.Array:
    # spans with a null pos_attr are SKIPPED (not nulled into the array) —
    # exactly DuckDB's string_agg semantics, where a NULL element simply
    # drops out of the aggregate (the oracle builds the element as one
    # concat, so a null offset nulls that element)
    sel_pa = pc.and_kleene(
        pc.equal(kind_col, ls.kind), pc.is_valid(vals.field(ls.pos_attr))
    )
    sel_pa = pc.fill_null(sel_pa, False)
    sel = np.asarray(sel_pa.to_numpy(zero_copy_only=False), dtype=bool)
    p = parent[sel]
    hits = vals.filter(sel_pa)  # order-preserving → doc order within doc
    elems = pc.binary_join_element_wise(
        pa.scalar('{"ref":"'),
        pc.fill_null(hits.field(ls.ref_attr), ""),
        pa.scalar('","pos":'),
        pc.cast(pc.cast(hits.field(ls.pos_attr), pa.int64()), pa.string()),
        pa.scalar("}"),
        pa.scalar(""),  # last arg is the separator
    )
    counts = np.bincount(p, minlength=n).astype(np.int64)
    offsets = pa.array(np.r_[0, np.cumsum(counts)], pa.int32())
    per_doc = pc.binary_join(
        pa.ListArray.from_arrays(offsets, elems), pa.scalar(",")
    )
    return pc.binary_join_element_wise(
        pa.scalar("["), per_doc, pa.scalar("]"), pa.scalar("")
    )


def extract_table(t: pa.Table, spec: tuple) -> pa.Table:
    """Apply a spec to one Arrow batch of (doc_id, spans) rows: one output
    row per input doc, one column per field (null where the selector has no
    match; JSON-encoded strings for nested Map/List fields). The span
    explode happens ONCE; every field shares the exploded parent index."""
    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = t.num_rows
    out: dict[str, pa.Array] = {"doc_id": t["doc_id"]}
    if n == 0:
        for f in spec:
            is_int = isinstance(f, FieldSpec) and f.attr in ("count", "offset")
            out[f.name] = pa.array([], pa.int64() if is_int else pa.string())
        return pa.table(out)
    parent = spans.value_parent_indices().to_numpy(zero_copy_only=False)
    vals = spans.values
    kind_col = vals.field("kind")
    for f in spec:
        if isinstance(f, MapSpec):
            out[f.name] = _extract_map(f, parent, vals, kind_col, n)
        elif isinstance(f, ListSpec):
            out[f.name] = _extract_list(f, parent, vals, kind_col, n)
        else:
            out[f.name] = _extract_field(f, parent, vals, kind_col, n)
    return pa.table(out)


class ProductExtractor:
    """Actor-pool extraction stage (``map_batches(Cls, concurrency=N)``).

    ``__init__`` runs once per actor: resolves the spec — explicit ``spec``
    arg, else ``model_settings.options["extraction_spec"]`` (the reference
    LLMConfig.options surface, threaded in by
    ``Pipeline.add_extraction_stage``), else :data:`PRODUCT_SPEC` — and
    validates it, exactly where a real CSS/LLM extraction strategy would
    compile selectors or construct its provider client."""

    def __init__(self, model_settings=None, spec=None):
        if spec is None and model_settings is not None:
            spec = getattr(model_settings, "options", {}).get("extraction_spec")
        self.spec = tuple(spec) if spec is not None else PRODUCT_SPEC
        for f in self.spec:
            if not isinstance(f, (FieldSpec, MapSpec, ListSpec)):
                raise TypeError(
                    f"extraction spec entries must be FieldSpec/MapSpec/ListSpec, got {f!r}"
                )

    def __call__(self, t: pa.Table) -> pa.Table:
        return extract_table(t, self.spec)


def extract_products(sf_dir: str = "", spec: tuple[FieldSpec, ...] | None = None):
    """Driver query: run the ProductData-shape extraction schema over the
    flagship crawl's interleaved docs through the engine's extraction-stage
    hook (``Pipeline.add_extraction_stage`` ← ``config.llm``), returning one
    (doc_id, title, brand, first_image, n_images, n_links) row per fetched
    page. DuckDB-oracle-checked: the selector spec replays in SQL as
    parallel-unnest + per-(doc, kind) occurrence ranks + regexp_extract."""
    from ..engine import EngineConfig, ModelSettings, Pipeline
    from .crawl import read_docs
    from .crawl_queries import ensure_crawl

    out = ensure_crawl()
    ds = read_docs(out).select_columns(["doc_id", "spans"])
    cfg = EngineConfig()
    if spec is not None:
        cfg.llm = ModelSettings(options={"extraction_spec": tuple(spec)})
    return (
        Pipeline(ds, cfg)
        .add_extraction_stage(ProductExtractor, batch_size=1024, concurrency=2)
        .dataset()
    )

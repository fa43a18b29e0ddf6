"""Product data models — the reference's ``ProductData`` record family
(``/root/reference/crawl4ai_llm/models.py:13-77``) as plain dataclasses, plus
the bridge that makes SURVEY §1.3's mapping executable: a ProductData record
(text fields + ordered media list) ⇄ one row of the interleaved span table
(``doc_id, spans<kind,text,media_ref,offset>`` — BASELINE.json:input_hint).

Field-for-field parity with the reference models (prices as strings,
``ProductImage.position`` giving the interleave order, open identifier/
attribute maps); validation is lightweight (required fields + type checks)
instead of pydantic — the storage layer's real contract is schemaless dicts
anyway (reference base.py:33, SURVEY §1.1 n.2).
"""

from __future__ import annotations

import datetime
from dataclasses import asdict, dataclass, field
from typing import Any

from ..functions.hashing import fnv1a64_scalar
from ..functions.urlnorm import canonicalize_url


def _validate_http_url(url: Any, field_name: str) -> None:
    """pydantic ``HttpUrl``-equivalent validation (reference models.py:27,41):
    http(s) scheme, non-empty host with a dot or localhost, ≤2083 chars."""
    if not isinstance(url, str) or len(url) > 2083:
        raise ValueError(f"{field_name} must be an http(s) URL string ≤2083 chars")
    if canonicalize_url(url) is None:
        raise ValueError(f"{field_name} is not a valid http(s) URL: {url!r}")
    host = url.split("//", 1)[1].split("/", 1)[0].split(":", 1)[0].lower()
    if not host or ("." not in host and host != "localhost"):
        raise ValueError(f"{field_name} host must have a TLD or be localhost: {url!r}")


@dataclass
class ProductPrice:
    """Reference models.py:13-21. Amounts are strings, per the reference."""

    amount: str
    currency: str
    original_amount: str | None = None
    discount_percentage: float | None = None


@dataclass
class ProductImage:
    """Reference models.py:24-29. ``position`` orders the media interleave."""

    url: str
    alt: str | None = None
    position: int | None = None

    def __post_init__(self):
        _validate_http_url(self.url, "ProductImage.url")


@dataclass
class ProductData:
    """Reference models.py:32-77."""

    title: str
    url: str
    description: str | None = None
    brand: str | None = None
    prices: list[ProductPrice] = field(default_factory=list)
    images: list[ProductImage] = field(default_factory=list)
    identifiers: dict[str, str] = field(default_factory=dict)
    attributes: dict[str, Any] = field(default_factory=dict)
    variants: list[dict] = field(default_factory=list)
    available: bool | None = None
    availability_text: str | None = None
    extracted_at: datetime.datetime | None = None
    source_html: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if not isinstance(self.title, str) or not self.title:
            raise ValueError("title is required")
        _validate_http_url(self.url, "ProductData.url")
        if self.extracted_at is None:
            # reference stamps extraction time by default (models.py:70)
            self.extracted_at = datetime.datetime.now()

    def to_dict(self) -> dict:
        d = asdict(self)
        if self.extracted_at is not None:
            d["extracted_at"] = self.extracted_at.isoformat()
        return d


def product_to_span_row(product: ProductData) -> dict:
    """ProductData → one interleaved document row (SURVEY §1.3 row 1):
    text fields become kind="text" spans, images become kind="image" spans at
    their declared positions (``ProductImage.position``, models.py:29 — the
    reference's media-interleave order), offsets re-numbered monotonically.

    doc_id follows the reference id hierarchy's url branch with the stable
    hash: ``"url_" + fnv1a64(canonical url)``."""
    url_canon = canonicalize_url(product.url)
    spans: list[tuple[int, str, str, str]] = []  # (sort_pos, kind, text, ref)
    # text fields first at sentinel positions before any media
    base = -1_000_000
    for i, txt in enumerate([product.title, product.description or ""]):
        if txt:
            spans.append((base + i, "text", txt, ""))
    for j, img in enumerate(product.images):
        pos = img.position if img.position is not None else j
        spans.append((pos, "image", img.alt or "", canonicalize_url(img.url) or img.url))
    spans.sort(key=lambda s: s[0])
    return {
        "doc_id": f"url_{fnv1a64_scalar(url_canon)}",
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": i}
            for i, (_, k, t, r) in enumerate(spans)
        ],
    }


def span_row_to_product(row: dict, url: str) -> ProductData:
    """Inverse bridge: interleaved span row → ProductData (first text span →
    title, second → description, image spans → images in offset order)."""
    texts = [s for s in row["spans"] if s["kind"] == "text"]
    images = [s for s in row["spans"] if s["kind"] == "image"]
    return ProductData(
        title=texts[0]["text"] if texts else "(untitled)",
        url=url,
        description=texts[1]["text"] if len(texts) > 1 else None,
        images=[
            ProductImage(url=s["media_ref"], alt=s["text"] or None, position=s["offset"])
            for s in images
        ],
    )


def products_to_interleaved_table(products: list[ProductData]):
    """Batch bridge → Arrow table in DOC_SCHEMA (zero-copy into pipelines)."""
    import pyarrow as pa

    from ..schema import DOC_SCHEMA

    rows = [product_to_span_row(p) for p in products]
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)

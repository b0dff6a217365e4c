"""PDF layout parsing (north rule: "page segmentation, reading-order
reconstruction for vertical Japanese text, furigana/ruby handling").

The reference delegates PDF understanding to Docling's ML models
(``processor.py:141-154``). Model-free rebuild, split at an explicit
boundary:

1. **pdf bytes -> layout IR**: REAL. ``decode_pdf_real`` uses pypdf's
   text visitor when installed and otherwise falls back to the pure-Python
   minimal decoder in ``pdf_bytes.py`` (xref/page-tree/content-stream
   parsing, FlateDecode via stdlib zlib) — real PDF byte streams decode in
   this container. The layout IR — what any decoder emits — is a JSON
   document of positioned text spans:
   ``{"pages": [{"width": W, "height": H, "spans": [
       {"x":..,"y":..,"text":..,"vertical":bool,"ruby":str|null}, ...]}]}``
2. **layout IR -> ordered text**: REAL, deterministic, fully tested:
   column segmentation, reading-order reconstruction (horizontal:
   top-to-bottom then left-to-right; vertical Japanese: columns
   right-to-left, top-to-bottom within a column), ruby/furigana folded as
   base(reading) so the annotation survives without corrupting the base
   text flow.

The Spark operator is an Arrow-batched pandas UDF with the same error
isolation as the HTML extractor.
"""

from __future__ import annotations

import json
from typing import List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

COLUMN_TOLERANCE = 20.0  # spans within this x (or y) distance share a column/row


def decode_pdf_real(payload: bytes, max_pages: Optional[int] = None) -> dict:
    """Real PDF bytes -> layout IR.

    Prefers pypdf's text-visitor API when installed: each visited text run
    carries its text matrix, whose (tx, ty) translation gives the span
    position; PDF y grows upward, so y is negated to match the IR's
    top-to-bottom reading order. Without pypdf it falls back to the
    pure-Python minimal decoder (``pdf_bytes.decode_pdf_minimal``, same IR
    and same coordinate convention) — real PDF byte streams decode in this
    container too, within the documented subset. ``max_pages`` caps
    decoding (S4, ref processor.py:293 max_num_pages + config.py:50) and
    marks the IR truncated."""
    try:
        from pypdf import PdfReader  # type: ignore
    except ImportError:  # container has no pypdf: pure-Python path
        from .pdf_bytes import decode_pdf_minimal

        return decode_pdf_minimal(payload, max_pages)

    import io

    reader = PdfReader(io.BytesIO(payload))  # pragma: no cover — env-gated
    total = len(reader.pages)
    pages = []
    for i, page in enumerate(reader.pages):
        if max_pages is not None and i >= max_pages:
            break
        spans: List[dict] = []

        def visit(text, cm, tm, font_dict, font_size):
            t = (text or "").strip()
            if t:
                spans.append({"x": float(tm[4]), "y": -float(tm[5]), "text": t})

        page.extract_text(visitor_text=visit)
        box = page.mediabox
        pages.append(
            {"width": float(box.width), "height": float(box.height), "spans": spans}
        )
    return {
        "pages": pages,
        "truncated": max_pages is not None and total > max_pages,
    }


def _span_text(span: dict) -> str:
    """Fold ruby readings: base text plus (reading) — keeps furigana as an
    annotation without interleaving it into the base flow."""
    text = span.get("text", "")
    ruby = span.get("ruby")
    return f"{text}({ruby})" if ruby else text


def _order_horizontal(spans: List[dict]) -> List[dict]:
    """Rows top-to-bottom (y ascending), left-to-right within a row."""
    rows: List[List[dict]] = []
    for s in sorted(spans, key=lambda s: (s["y"], s["x"])):
        for row in rows:
            if abs(row[0]["y"] - s["y"]) <= COLUMN_TOLERANCE:
                row.append(s)
                break
        else:
            rows.append([s])
    out: List[dict] = []
    for row in rows:
        out.extend(sorted(row, key=lambda s: s["x"]))
    return out


def _order_vertical(spans: List[dict]) -> List[dict]:
    """Vertical Japanese: columns right-to-left (x descending),
    top-to-bottom (y ascending) within a column."""
    cols: List[List[dict]] = []
    for s in sorted(spans, key=lambda s: (-s["x"], s["y"])):
        for col in cols:
            if abs(col[0]["x"] - s["x"]) <= COLUMN_TOLERANCE:
                col.append(s)
                break
        else:
            cols.append([s])
    out: List[dict] = []
    for col in cols:
        out.extend(sorted(col, key=lambda s: s["y"]))
    return out


def reconstruct_reading_order(layout: dict) -> str:
    """Layout IR -> text in reading order; pages separated by form-feed-like
    double newlines, spans joined per segmentation rules."""
    page_texts: List[str] = []
    for page in layout.get("pages", []):
        spans = page.get("spans", [])
        if not spans:
            continue
        vertical = [s for s in spans if s.get("vertical")]
        horizontal = [s for s in spans if not s.get("vertical")]
        parts: List[str] = []
        if horizontal:
            parts.extend(_span_text(s) for s in _order_horizontal(horizontal))
        if vertical:
            parts.extend(_span_text(s) for s in _order_vertical(vertical))
        page_texts.append("\n".join(p for p in parts if p))
    return "\n\n".join(page_texts)


def parse_pdf_layout(
    payload: Optional[bytes], max_pages: Optional[int] = None
) -> dict:
    """Pure core: layout-IR bytes -> ordered text + metrics (never raises).

    ``max_pages`` is the S4 page-count cap (ref processor.py:293 passes
    ``max_num_pages`` to the converter, limit from config.py:50): documents
    beyond the cap are processed up to it and reported ``status=
    'truncated'`` so the metric is visible downstream — nothing silently
    reads an unbounded document."""
    if payload is None or len(payload) == 0:
        return dict(text="", status="empty", n_pages=0, n_spans=0, error=None)
    try:
        layout = json.loads(payload.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as ex:
        return dict(
            text="", status="decode_error", n_pages=0, n_spans=0, error=str(ex)[:200]
        )
    try:
        all_pages = layout.get("pages", [])
        truncated = bool(layout.get("truncated"))  # decoder may pre-truncate
        if max_pages is not None and len(all_pages) > max_pages:
            layout = dict(layout, pages=all_pages[:max_pages])
            truncated = True
        text = reconstruct_reading_order(layout)
        n_pages = len(layout.get("pages", []))
        n_spans = sum(len(p.get("spans", [])) for p in layout.get("pages", []))
        if not text:
            status = "no_content"
        elif truncated:
            status = "truncated"
        else:
            status = "ok"
        return dict(
            text=text,
            status=status,
            n_pages=n_pages,
            n_spans=n_spans,
            error=None,
        )
    except Exception as ex:
        return dict(
            text="", status="parse_error", n_pages=0, n_spans=0, error=str(ex)[:200]
        )


def parse_pdf_bytes(
    payload: Optional[bytes], max_pages: Optional[int] = None
) -> dict:
    """Real-PDF twin of ``parse_pdf_layout``: PDF bytes -> ordered text +
    metrics, never raises (malformed / out-of-subset input ->
    status='decode_error', corrupt-blob isolation like the HTML path)."""
    if payload is None or len(payload) == 0:
        return dict(text="", status="empty", n_pages=0, n_spans=0, error=None)
    try:
        layout = decode_pdf_real(payload, max_pages)
    except Exception as ex:
        return dict(
            text="", status="decode_error", n_pages=0, n_spans=0, error=str(ex)[:200]
        )
    try:
        text = reconstruct_reading_order(layout)
        n_pages = len(layout.get("pages", []))
        n_spans = sum(len(p.get("spans", [])) for p in layout.get("pages", []))
        if not text:
            status = "no_content"
        elif layout.get("truncated"):
            status = "truncated"
        else:
            status = "ok"
        return dict(
            text=text, status=status, n_pages=n_pages, n_spans=n_spans, error=None
        )
    except Exception as ex:
        return dict(
            text="", status="parse_error", n_pages=0, n_spans=0, error=str(ex)[:200]
        )


PDF_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_pages", T.IntegerType(), False),
        T.StructField("n_spans", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


@F.pandas_udf(PDF_EXTRACT_SCHEMA)
def parse_pdf_udf(payload: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([parse_pdf_layout(p) for p in payload])


@F.pandas_udf(PDF_EXTRACT_SCHEMA)
def parse_pdf_bytes_udf(payload: pd.Series) -> pd.DataFrame:
    """Arrow-batched real-PDF decode: binary PDF column -> extraction
    struct, per-document error isolation."""
    return pd.DataFrame([parse_pdf_bytes(p) for p in payload])


def parse_pdf_udf_capped(max_pages: int):
    """S4 variant: page-count cap applied inside the batch (status
    'truncated' for capped documents)."""

    @F.pandas_udf(PDF_EXTRACT_SCHEMA)
    def _parse(payload: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([parse_pdf_layout(p, max_pages) for p in payload])

    return _parse

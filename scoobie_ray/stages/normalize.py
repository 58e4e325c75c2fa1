"""Offset-stable HTML→plain-text normalization.

Document.java:112-138 strips HTML in place, replacing markup with spaces
of the SAME length so every char offset into the original document stays
valid — all downstream annotations key on offsets (the DataSheet is
offset-indexed).  Same contract here: ``html_to_text`` returns a string
of identical length with tags, script/style bodies and comments blanked;
:func:`normalize_html_batch` applies it to text spans (media spans
untouched) so spotting offsets remain translatable back to the raw HTML.
"""

from __future__ import annotations

import re

import pyarrow as pa

_BLANK_RE = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->|<[^>]*>",
    re.IGNORECASE | re.DOTALL,
)


def html_to_text(html: str) -> str:
    """Blank markup with spaces; len(result) == len(html) always."""
    return _BLANK_RE.sub(lambda m: " " * (m.end() - m.start()), html or "")


def normalize_html_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: rewrite each text span's text via html_to_text
    (same length → span offsets unchanged); media spans pass through.
    Emits a new ``spans`` column; the original is preserved under
    ``raw_spans`` for provenance."""
    from ..sources.docs import SPAN_TYPE

    spans_col = batch["spans"].to_pylist()
    out = []
    for spans in spans_col:
        new = []
        for s in spans:
            if s["kind"] == "text":
                s = dict(s, text=html_to_text(s["text"]))
            new.append(s)
        out.append(new)
    batch = batch.append_column("raw_spans", batch["spans"])
    idx = batch.schema.get_field_index("spans")
    return batch.set_column(
        idx, "spans", pa.array(out, pa.list_(SPAN_TYPE))
    )

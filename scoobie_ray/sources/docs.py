"""Interleaved text+media document source.

The pipeline input is a table of documents with columns
``doc_id: string`` and ``spans: list<struct<kind: string, text: string,
media_ref: string, offset: int32>>`` (BASELINE.json input_hint) — the
Ray-native analogue of the reference's ``Document`` with its
position-stable plain text (Document.java:112-138 replaces HTML tags with
spaces so char offsets stay valid; here media spans contribute zero
characters so text offsets are stable by construction).

Per-row invariant: the ``spans`` column must flow through the pipeline
untouched — span-sequence equality (kind, text, media_ref, order) versus
the input is asserted in tests and exposed via :func:`flatten_spans_table`.

At production scale this table is Lance-backed; ``read_docs`` uses
``ray.data.read_lance`` when the reader exists and falls back to Parquet
with the identical Arrow schema (this sandbox has no lance package).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)


def read_docs(path: str, **kwargs):
    """Read the interleaved-doc table as a Ray Dataset (Lance, else Parquet)."""
    import ray.data

    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path, **kwargs)
    except ImportError:
        return ray.data.read_parquet(path, **kwargs)


def add_plain_text(batch: pa.Table) -> pa.Table:
    """Append ``plain_text`` = concatenation of the text of kind=="text"
    spans, in span order.  Media spans contribute no characters.

    Vectorized: list-flatten the span column once, select text spans, and
    group-concatenate by parent row.  The ``spans`` column itself is passed
    through untouched (per-row invariant).
    """
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind")
    texts = flat.field("text")
    is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)

    out = [""] * len(batch)
    sel_parents = parents[is_text]
    sel_texts = texts.to_pylist()
    # texts list is for ALL flattened spans; index positions of text spans:
    text_positions = np.nonzero(is_text)[0]
    pieces: dict[int, list[str]] = {}
    for pos, par in zip(text_positions.tolist(), sel_parents.tolist()):
        pieces.setdefault(par, []).append(sel_texts[pos])
    for par, parts in pieces.items():
        out[par] = "".join(parts)
    if "plain_text" in batch.column_names:
        batch = batch.drop_columns(["plain_text"])
    return batch.append_column("plain_text", pa.array(out, pa.string()))


def flatten_spans_table(batch: pa.Table) -> pa.Table:
    """Explode the spans column to flat rows
    (doc_id, span_idx, kind, text, media_ref, offset) — used by the
    span-sequence-equality check and by SQL oracles (nested columns don't
    hash portably)."""
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_pylist()
    # span_idx = position within its parent list
    n = len(parents)
    span_idx = np.zeros(n, dtype=np.int64)
    if n:
        boundary = np.r_[True, parents[1:] != parents[:-1]]
        starts = np.nonzero(boundary)[0]
        span_idx = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
    return pa.table(
        {
            "doc_id": pa.array([doc_ids[p] for p in parents.tolist()], pa.string()),
            "span_idx": pa.array(span_idx, pa.int64()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": pc.cast(flat.field("offset"), pa.int64()),
        }
    )


def make_doc_row(doc_id: str, spans: list[tuple[str, str, str, int]]) -> dict:
    """Helper for fixture construction: spans as (kind, text, media_ref, offset)."""
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans
        ],
    }


def docs_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)

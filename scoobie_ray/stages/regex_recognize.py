"""Regular-structured entity recognition (slot 7).

Reimplements RegularStructuredEntityRecognition.java:43-72: match a
configured list of (name, regex) patterns over the raw text and emit
token-aligned span annotations.  Default pattern set mirrors the
reference's experiment configuration (QueryExperiment.java:161-167:
DATE / FLOAT / POINT / MAIL / ISBN …).

Stateless ``map_batches`` stage — patterns are compiled once at
construction (module-level defaults precompiled at import).

Output per-doc list columns: ``regex_start``, ``regex_end``: list<int64>,
``regex_name``: list<string>.
"""

from __future__ import annotations

import re

import pyarrow as pa

DEFAULT_PATTERNS: dict[str, str] = {
    "DATE": r"\b\d{1,4}[-/.]\d{1,2}[-/.]\d{1,4}\b",
    "FLOAT": r"-?\b\d+\.\d+\b",
    "INTEGER": r"-?\b\d+\b",
    "POINT": r"-?\b\d{1,3}\.\d+\s*,\s*-?\d{1,3}\.\d+\b",
    "MAIL": r"\b[\w.+-]+@[\w-]+\.[\w.-]+\b",
    "ISBN": r"\b(?:97[89][- ]?)?\d{1,5}[- ]?\d{1,7}[- ]?\d{1,7}[- ]?[\dX]\b",
    "URL": r"\bhttps?://[^\s<>\"]+\b",
}


class RegexRecognizer:
    """mode="all" (default) mirrors the reference exactly: every pattern
    annotates all its matches independently
    (RegularStructuredEntityRecognition.java:55-72 — one transduce pass per
    regex, no cross-pattern interaction).  mode="priority" is an extension:
    first-pattern-wins overlap suppression (pattern order = priority)."""

    def __init__(self, patterns: dict[str, str] | None = None, mode: str = "all"):
        pats = patterns or DEFAULT_PATTERNS
        self.compiled = [(name, re.compile(rx)) for name, rx in pats.items()]
        assert mode in ("all", "priority")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.docs import add_plain_text

        if "plain_text" not in batch.column_names:
            batch = add_plain_text(batch)
        starts_col, ends_col, names_col = [], [], []
        suppress = self.mode == "priority"
        for text in batch["plain_text"].to_pylist():
            ss, es, ns = [], [], []
            taken: list[tuple[int, int]] = []
            for name, rx in self.compiled:
                for m in rx.finditer(text):
                    span = (m.start(), m.end())
                    if suppress:
                        # first-pattern-wins on overlap (pattern order = priority)
                        if any(a < span[1] and span[0] < b for a, b in taken):
                            continue
                        taken.append(span)
                    ss.append(span[0])
                    es.append(span[1])
                    ns.append(name)
            order = sorted(range(len(ss)), key=lambda i: (ss[i], -es[i]))
            starts_col.append([ss[i] for i in order])
            ends_col.append([es[i] for i in order])
            names_col.append([ns[i] for i in order])
        return (
            batch.append_column("regex_start", pa.array(starts_col, pa.list_(pa.int64())))
            .append_column("regex_end", pa.array(ends_col, pa.list_(pa.int64())))
            .append_column("regex_name", pa.array(names_col, pa.list_(pa.string())))
        )

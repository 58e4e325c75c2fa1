"""Relevance rating (slot 12) — score resolved subjects per document.

Reimplements RelevanceRating.java:52-86 + the rating metric plug-ins of
transducer/model/rating/ (SURVEY.md §2.5): each metric produces one score
column per resolved subject, columns are z-normalized
(DoubleMatrix.normalize:380-399) and fused with a PRODUCT skalar
(DoubleMatrix.fuseRatings:844-867).

Graph metrics (degree / capacity / pagerank / hub / authority) run on the
per-doc graph of resolved subjects + their KB edges; text metrics use the
mention offsets (PositionBasedRating: docLength − firstOccurrenceStart;
TermFrequencyBasedRating: mention count / token count).  IDF requires a
corpus document-frequency table (a KB-build groupby), broadcast like the
rest of the KB — optional here.

Output per-doc list columns: ``rated_subj: list<int64>``,
``rated_score: list<float64>`` (fused, z-normalized).
"""

from __future__ import annotations

import math

import pyarrow as pa

from .disambiguate import _hits, _pagerank
from .spot import resolve_kb

DEFAULT_METRICS = ("degree", "position", "tf")

ALL_METRICS = (
    "degree",
    "capacity",
    "pagerank",
    "hub",
    "authority",
    "position",
    "tf",
    "idf",
    "random",
)


class RelevanceRater:
    def __init__(
        self,
        kb,
        metrics: tuple[str, ...] = DEFAULT_METRICS,
        doc_freq: dict[int, int] | None = None,
        n_docs: int = 1,
    ):
        """``doc_freq``: literal index -> corpus document frequency (from
        kb.stats.document_frequency), broadcast like the KB; feeds the
        InverseDocumentFrequencyBasedRating analogue."""
        self.kb = resolve_kb(kb)
        self.metrics = metrics
        self.doc_freq = doc_freq or {}
        self.n_docs = max(1, n_docs)
        tp = self.kb.bundle.meta.get("type_predicate_index")
        self.type_pred = tp

    def _doc_scores(
        self,
        resolved_m: list[int],
        resolved_s: list[int],
        m_start: list[int],
        text_len: int,
        n_tokens: int,
        resolved_l: list[int] | None = None,
    ) -> tuple[list[int], list[float]]:
        if not resolved_s:
            return [], []
        self._subject_lits: dict[int, list[int]] = {}
        if resolved_l is not None:
            for s, lit in zip(resolved_s, resolved_l):
                self._subject_lits.setdefault(s, []).append(lit)
        subjects = sorted(set(resolved_s))
        nodes = set(subjects)
        out_adj: dict[int, list[int]] = {}
        in_adj: dict[int, list[int]] = {}
        for s in subjects:
            preds, objs = self.kb.outgoing(s)
            for p, o in zip(preds.tolist(), objs.tolist()):
                if p == self.type_pred:
                    continue
                if o in nodes and o != s:
                    out_adj.setdefault(s, []).append(o)
                    in_adj.setdefault(o, []).append(s)

        first_start: dict[int, int] = {}
        count: dict[int, int] = {}
        for m, s in zip(resolved_m, resolved_s):
            st = m_start[m] if m < len(m_start) else 0
            first_start[s] = min(first_start.get(s, 1 << 60), st)
            count[s] = count.get(s, 0) + 1

        columns: list[dict[int, float]] = []
        for metric in self.metrics:
            if metric == "degree":
                col = {
                    s: float(len(out_adj.get(s, ())) + len(in_adj.get(s, ())))
                    for s in subjects
                }
            elif metric == "capacity":
                col = {
                    s: float(
                        min(len(out_adj.get(s, ())), len(in_adj.get(s, ())))
                    )
                    for s in subjects
                }
            elif metric == "pagerank":
                col = _pagerank({}, out_adj, in_adj, nodes)
            elif metric == "hub":
                col = _hits({}, out_adj, in_adj, nodes)[0]
            elif metric == "authority":
                col = _hits({}, out_adj, in_adj, nodes)[1]
            elif metric == "position":
                col = {
                    s: float(text_len - first_start.get(s, text_len))
                    for s in subjects
                }
            elif metric == "tf":
                col = {s: count.get(s, 0) / max(1, n_tokens) for s in subjects}
            elif metric == "idf":
                # mean log((1+N)/(1+df)) over the subject's mention literals
                col = {}
                for s in subjects:
                    lits = self._subject_lits.get(s, ())
                    if lits:
                        col[s] = sum(
                            math.log(
                                (1 + self.n_docs)
                                / (1 + self.doc_freq.get(lit, 0))
                            )
                            for lit in lits
                        ) / len(lits)
                    else:
                        col[s] = 0.0
            elif metric == "random":
                import random as _random

                rng = _random.Random(42)
                col = {s: rng.random() for s in subjects}
            else:
                raise ValueError(f"unknown rating metric: {metric}")
            columns.append(_znorm(col))

        fused = {
            s: math.prod(col.get(s, 0.0) for col in columns) for s in subjects
        }
        fused = _znorm(fused)
        return subjects, [fused[s] for s in subjects]

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_tokens = "tok_start" in batch.column_names
        rs_col, sc_col = [], []
        tok_counts = (
            [len(t) for t in batch["tok_start"].to_pylist()]
            if has_tokens
            else [0] * len(batch)
        )
        rl_col = (
            batch["resolved_lit"].to_pylist()
            if "resolved_lit" in batch.column_names
            else [None] * len(batch)
        )
        for rm, rs, ms, text, ntok, rl in zip(
            batch["resolved_mention"].to_pylist(),
            batch["resolved_subj"].to_pylist(),
            batch["mention_start"].to_pylist(),
            batch["plain_text"].to_pylist(),
            tok_counts,
            rl_col,
        ):
            subs, scores = self._doc_scores(
                rm, rs, ms, len(text), ntok or len(text), rl
            )
            rs_col.append(subs)
            sc_col.append(scores)
        return batch.append_column(
            "rated_subj", pa.array(rs_col, pa.list_(pa.int64()))
        ).append_column("rated_score", pa.array(sc_col, pa.list_(pa.float64())))


def _znorm(col: dict[int, float]) -> dict[int, float]:
    """z-normalize a score column (DoubleMatrix.normalize:380-399)."""
    if not col:
        return col
    vals = list(col.values())
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    std = var**0.5
    if std == 0:
        return {k: 0.0 for k in col}
    return {k: (v - mean) / std for k, v in col.items()}

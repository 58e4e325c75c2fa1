"""Entity classification — phrase typing from context (slot 8).

Reimplements the *role* of EntityClassification.java:56-147: assign an RDF
type (cluster label) to noun phrases that did not resolve against the KB,
from context-window features, keeping the reference's decision rule
(margin between the top-2 label scores must exceed a threshold, default
0.6; typed phrases carry ``subjectIndex = -1`` → their type triples land
in the ``#predicted`` graph with a per-phrase blank-node subject).

The reference's Mallet MaxEnt model blob is not in its repo (SURVEY.md
§7.4), so the feature model here is a deterministic, documented stand-in:
context-window keyword voting where the keyword lexicon is derived FROM
THE BROADCAST KB (a class's URI local name and its case-folded variants
vote for that class — e.g. the word "nation" in the ±window around a
phrase votes for ``…ont/Nation``).  The feature extraction (window over
sentence tokens filtered by POS, EntityClassification window=4,
LabeledTextCorpus.java:403-492) and thresholding are structurally
faithful; swap `self.vocab` for a trained model to upgrade fidelity.

Output per-doc list columns: ``class_start``, ``class_end``: list<int64>,
``class_type``: list<int64> (type index into the KB dictionary).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .spot import resolve_kb
from .tag import noun_phrases

_LOCAL_NAME_RE = re.compile(r"[#/]([^#/]+)$")


class PhraseClassifier:
    def __init__(self, kb, window: int = 4, margin: float = 0.6):
        self.kb = resolve_kb(kb)
        self.window = window
        self.margin = margin
        # keyword lexicon derived from KB class URIs: local name -> type idx
        self.vocab: dict[str, int] = {}
        types = set(self.kb.bundle.types["type"].to_pylist())
        for t in types:
            m = _LOCAL_NAME_RE.search(self.kb.uri(t))
            if m:
                self.vocab[m.group(1).lower()] = t

    def _classify_phrase(
        self,
        tokens: list[str],
        phrase_tok_range: tuple[int, int],
    ) -> int | None:
        lo = max(0, phrase_tok_range[0] - self.window)
        hi = min(len(tokens), phrase_tok_range[1] + self.window)
        votes: dict[int, float] = {}
        for i in range(lo, hi):
            if phrase_tok_range[0] <= i < phrase_tok_range[1]:
                continue
            t = self.vocab.get(tokens[i].lower())
            if t is not None:
                votes[t] = votes.get(t, 0.0) + 1.0
        if not votes:
            return None
        total = sum(votes.values())
        ranked = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        top = ranked[0][1] / total
        second = (ranked[1][1] / total) if len(ranked) > 1 else 0.0
        if top - second < self.margin:
            return None  # margin rule (EntityClassification threshold 0.6)
        return ranked[0][0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cs_col, ce_col, ct_col = [], [], []
        for text, starts, ends, np_tags in zip(
            batch["plain_text"].to_pylist(),
            batch["tok_start"].to_pylist(),
            batch["tok_end"].to_pylist(),
            batch["tok_np"].to_pylist(),
        ):
            tokens = [text[s:e] for s, e in zip(starts, ends)]
            cs, ce, ct = [], [], []
            for p_start, p_end, _surface in noun_phrases(
                starts, ends, np_tags, text
            ):
                # token index range of the phrase
                ti = [
                    i for i, (s, e) in enumerate(zip(starts, ends))
                    if s >= p_start and e <= p_end
                ]
                if not ti:
                    continue
                t = self._classify_phrase(tokens, (ti[0], ti[-1] + 1))
                if t is not None:
                    cs.append(p_start)
                    ce.append(p_end)
                    ct.append(t)
            cs_col.append(cs)
            ce_col.append(ce)
            ct_col.append(ct)
        lt = pa.list_(pa.int64())
        return (
            batch.append_column("class_start", pa.array(cs_col, lt))
            .append_column("class_end", pa.array(ce_col, lt))
            .append_column("class_type", pa.array(ct_col, lt))
        )

"""Extraction scoping — the reference's SPARQL-template filters.

``FilterContext`` (model/FilterContext.java:49-225) parses a SPARQL
"template" into int-index filter sets (datatype-property / type filters)
that scope every KB lookup in the pipeline.  Ray-native equivalent: a
plain config of predicate/type URIs resolved once against the broadcast
dictionary (SURVEY.md §2.6 "SPARQL template → simple config dict"),
applied at the three lookup points:

- spotting: the matcher automaton is built only over literals reachable
  through an allowed datatype property;
- linking / disambiguation: candidate (property, subject) pairs are
  dropped unless the property is allowed and the subject carries an
  allowed rdf:type.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..kb.bundle import KBIndex


@dataclass
class TemplateFilter:
    """Scoping config; empty lists mean 'no restriction'."""

    datatype_properties: list[str] = field(default_factory=list)
    types: list[str] = field(default_factory=list)

    def resolve(self, kb: KBIndex) -> "ResolvedFilter":
        """Resolve URIs against the KB dictionary.

        'Not configured' (empty URI list) means no restriction (None);
        'configured but nothing resolved' means the template scopes to
        properties/types absent from this KB — that must match NOTHING
        (empty set), never silently widen to everything.
        """
        props = (
            {i for u in self.datatype_properties if (i := kb.uri_index(u)) is not None}
            if self.datatype_properties
            else None
        )
        types = (
            {i for u in self.types if (i := kb.uri_index(u)) is not None}
            if self.types
            else None
        )
        return ResolvedFilter(props=props, types=types, kb=kb)


class ResolvedFilter:
    def __init__(
        self, props: set[int] | None, types: set[int] | None, kb: KBIndex
    ):
        self.props = props
        self.types = types
        self.kb = kb
        self._subject_ok_cache: dict[int, bool] = {}

    def literal_subset(self) -> list[int] | None:
        """Literal indexes reachable through an allowed property, or None
        for no restriction (drives the spotter automaton)."""
        if self.props is None:
            return None
        sym = self.kb.bundle.symbols
        preds = sym["predicate"].to_numpy(zero_copy_only=False)
        objs = sym["object"].to_numpy(zero_copy_only=False)
        mask = np.isin(preds, np.fromiter(self.props, dtype=preds.dtype))
        return np.unique(objs[mask]).tolist()

    def subject_ok(self, subj: int) -> bool:
        if self.types is None:
            return True
        hit = self._subject_ok_cache.get(subj)
        if hit is None:
            hit = any(t in self.types for t in self.kb.types_of(subj).tolist())
            self._subject_ok_cache[subj] = hit
        return hit

    def filter_pairs(
        self, props: list[int], subs: list[int]
    ) -> tuple[list[int], list[int]]:
        out_p, out_s = [], []
        for p, s in zip(props, subs):
            if self.props is not None and p not in self.props:
                continue
            if not self.subject_ok(s):
                continue
            out_p.append(p)
            out_s.append(s)
        return out_p, out_s

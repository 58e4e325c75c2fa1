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
    """Scoping config; empty lists mean 'no restriction'.

    ``object_properties`` is the template's object-property pattern set
    (FilterContext.objectPropertyIndexFilter) — it does not scope lookups
    directly but seeds :meth:`infer`."""

    datatype_properties: list[str] = field(default_factory=list)
    types: list[str] = field(default_factory=list)
    object_properties: list[str] = field(default_factory=list)

    def infer(
        self,
        kb: KBIndex,
        markov_probability: float = 0.5,
        rating_threshold: float = 0.0,
        ratings=None,
    ) -> "TemplateFilter":
        """Markov-chain + proper-noun-rating expansion of the filters —
        port of ``FilterContext.infer`` (model/FilterContext.java:248-284).

        1. Every object property pulls in the (domain, range) cluster
           pairs it connects with markov probability > ``markov_probability``
           (PostgresKB.getConnectingClusters :777-804 — markov_chain rows
           with predicate = p AND probability > t).
        2. Every type in the filter is substituted by its cluster
           representative (PostgresKB.getCluster :807-…).
        3. Each cluster adds the datatype properties that describe it with
           proper-noun rating > ``rating_threshold``
           (PostgresKB.getDatatypePropertyByClass :745-772 —
           proper_noun_rating rows with cluster = c AND rating > t).

        Runs driver-side on the small KB-derived tables; returns an
        EXPANDED TemplateFilter (URI level — resolution against the
        broadcast dictionary still happens per actor via :meth:`resolve`).
        """
        bundle = kb.bundle
        obj_props = {
            i for u in self.object_properties if (i := kb.uri_index(u)) is not None
        }
        type_idx = {i for u in self.types if (i := kb.uri_index(u)) is not None}

        mk = bundle.markov
        if obj_props and len(mk):
            pred = mk["predicate"].to_numpy(zero_copy_only=False)
            prob = mk["prob"].to_numpy(zero_copy_only=False)
            mask = np.isin(pred, np.fromiter(obj_props, dtype=pred.dtype)) & (
                prob > markov_probability
            )
            type_idx |= set(mk["cluster_s"].to_numpy(zero_copy_only=False)[mask].tolist())
            type_idx |= set(mk["cluster_o"].to_numpy(zero_copy_only=False)[mask].tolist())

        cluster_map = dict(
            zip(
                bundle.type_clusters["type"].to_pylist(),
                bundle.type_clusters["cluster"].to_pylist(),
            )
        )
        type_idx = {cluster_map.get(t, t) for t in type_idx}

        if ratings is None:
            from ..kb.stats import proper_name_ratings

            ratings = proper_name_ratings(bundle)
        prop_idx = {
            i for u in self.datatype_properties if (i := kb.uri_index(u)) is not None
        }
        for cl, p, r in zip(
            ratings["cluster"].to_pylist(),
            ratings["predicate"].to_pylist(),
            ratings["rating"].to_pylist(),
        ):
            if cl in type_idx and r > rating_threshold:
                prop_idx.add(p)

        return TemplateFilter(
            datatype_properties=sorted(kb.uri(p) for p in prop_idx),
            types=sorted(kb.uri(t) for t in type_idx),
            object_properties=list(self.object_properties),
        )

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
            # inferred filters hold cluster representatives (FilterContext
            # .infer substitutes type -> cluster), so match raw types OR
            # their cluster labels
            hit = any(t in self.types for t in self.kb.types_of(subj).tolist()) or any(
                c in self.types for c in self.kb.clusters_of(subj)
            )
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

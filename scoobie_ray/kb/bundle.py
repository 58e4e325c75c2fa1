"""The knowledge-base bundle and its per-actor index structures.

The reference keeps its KB in Postgres tables (``dbscheme.sql``:
``index_resources``, ``index_literals``, ``symbols``, ``relations``,
``type_clusters``, ``markov_chain``; see SURVEY.md §1.2) and answers every
pipeline lookup with SQL (``connection/PostgresKB.java``).  Here the same
relational encoding lives in a handful of Arrow tables that are broadcast
once via ``ray.put`` and shared zero-copy by every map_batches actor on a
node; each actor lazily builds small numpy/dict indexes over them in
``__init__`` (the moral equivalent of Postgres' btree indexes +
prepared-statement caches, PostgresKB.java:286-381, 1206-1223).

Index assignment is deterministic: a resource/literal's int index is its
rank in the lexicographically sorted distinct set, so any independent
implementation (e.g. a SQL oracle using ``row_number() over (order by
uri)``) reproduces the same dictionary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


@dataclass
class KBBundle:
    """Relational KB encoding as Arrow tables (SURVEY.md §1.2 mapping).

    resources     index:int64, uri:string          (uri dictionary)
    literals      index:int64, literal:string      (literal dictionary)
    symbols       subject, predicate, object:int64, belief:float64
                  (datatype-property triples; object = literal index)
    relations     subject, predicate, object:int64 (object-property triples,
                  including rdf:type edges)
    types         subject, type:int64              (rdf:type projection)
    type_clusters type, cluster:int64
    markov        cluster_s, predicate, cluster_o:int64, prob:float64
    cardinalities predicate:int64, n_triples, n_subjects, n_objects:int64,
                  avg_out:float64, avg_in:float64
    """

    resources: pa.Table
    literals: pa.Table
    symbols: pa.Table
    relations: pa.Table
    types: pa.Table
    type_clusters: pa.Table
    markov: pa.Table
    cardinalities: pa.Table
    meta: dict[str, Any] = field(default_factory=dict)

    def tables(self) -> dict[str, pa.Table]:
        return {
            "resources": self.resources,
            "literals": self.literals,
            "symbols": self.symbols,
            "relations": self.relations,
            "types": self.types,
            "type_clusters": self.type_clusters,
            "markov": self.markov,
            "cardinalities": self.cardinalities,
        }

    @classmethod
    def from_tables(cls, t: dict[str, pa.Table], meta: dict | None = None) -> "KBBundle":
        return cls(meta=meta or {}, **t)

    def write(self, dir_path: str) -> None:
        import os

        import pyarrow.parquet as pq

        os.makedirs(dir_path, exist_ok=True)
        for name, tbl in self.tables().items():
            pq.write_table(tbl, os.path.join(dir_path, f"{name}.parquet"))

    @classmethod
    def read(cls, dir_path: str) -> "KBBundle":
        import os

        import pyarrow.parquet as pq

        names = [
            "resources",
            "literals",
            "symbols",
            "relations",
            "types",
            "type_clusters",
            "markov",
            "cardinalities",
        ]
        return cls.from_tables(
            {n: pq.read_table(os.path.join(dir_path, f"{n}.parquet")) for n in names}
        )


class _CSR:
    """Compressed adjacency subject -> (predicate, object) built by sorting."""

    __slots__ = ("keys", "starts", "stops", "pred", "other")

    def __init__(self, key: np.ndarray, pred: np.ndarray, other: np.ndarray):
        order = np.lexsort((other, pred, key))
        k = key[order]
        self.pred = pred[order]
        self.other = other[order]
        self.keys, self.starts = np.unique(k, return_index=True)
        self.stops = np.append(self.starts[1:], len(k))

    def neighbors(self, node: int) -> tuple[np.ndarray, np.ndarray]:
        """(predicates, endpoints) for one node; empty arrays if none."""
        i = np.searchsorted(self.keys, node)
        if i < len(self.keys) and self.keys[i] == node:
            return (
                self.pred[self.starts[i] : self.stops[i]],
                self.other[self.starts[i] : self.stops[i]],
            )
        return _EMPTY, _EMPTY

    def degree(self, node: int) -> int:
        i = np.searchsorted(self.keys, node)
        if i < len(self.keys) and self.keys[i] == node:
            return int(self.stops[i] - self.starts[i])
        return 0

    def gather_many(self, nodes: np.ndarray) -> np.ndarray:
        """Concatenated endpoint values for a batch of nodes — one
        vectorized searchsorted + repeat instead of a Python call per node."""
        if not len(nodes) or not len(self.keys):
            return _EMPTY
        pos = np.searchsorted(self.keys, nodes)
        pos_c = np.minimum(pos, len(self.keys) - 1)
        valid = self.keys[pos_c] == nodes
        starts = self.starts[pos_c[valid]]
        stops = self.stops[pos_c[valid]]
        counts = stops - starts
        total = int(counts.sum())
        if not total:
            return _EMPTY
        offsets = np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.repeat(starts, counts) + (np.arange(total) - offsets)
        return self.other[idx]

    def gather_segments(self, nodes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Like :meth:`gather_many` but segment-aligned: returns
        (concatenated endpoints, per-node lengths) so callers can
        attribute each endpoint back to its source node (np.repeat of the
        node index by lengths)."""
        lens = np.zeros(len(nodes), dtype=np.int64)
        if not len(nodes) or not len(self.keys):
            return _EMPTY, lens
        pos = np.searchsorted(self.keys, nodes)
        pos_c = np.minimum(pos, len(self.keys) - 1)
        valid = self.keys[pos_c] == nodes
        starts = np.where(valid, self.starts[pos_c], 0)
        stops = np.where(valid, self.stops[pos_c], 0)
        counts = stops - starts
        total = int(counts.sum())
        if not total:
            return _EMPTY, counts
        offsets = np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.repeat(starts, counts) + (np.arange(total) - offsets)
        return self.other[idx], counts


_EMPTY = np.empty(0, dtype=np.int64)


class KBIndex:
    """Per-actor lookup structures over a broadcast :class:`KBBundle`.

    Built once per map_batches actor in ``__init__`` (SURVEY.md §2.3: the
    Ray answer to the reference's SQL lookups).  All lookups are
    numpy-vectorized (searchsorted on sorted arrays) or O(1) dict hits.
    """

    def __init__(self, bundle: KBBundle):
        self.bundle = bundle
        self.uris: list[str] = bundle.resources["uri"].to_pylist()
        self.literal_strings: list[str] = bundle.literals["literal"].to_pylist()
        self._uri_to_idx: dict[str, int] | None = None
        self._literal_to_idx: dict[str, int] | None = None

        # symbols sorted by literal index -> (predicate, subject) ranges
        sym = bundle.symbols
        self._sym = _CSR(
            _np(sym["object"]), _np(sym["predicate"]), _np(sym["subject"])
        )

        rel = bundle.relations
        rs, rp, ro = _np(rel["subject"]), _np(rel["predicate"]), _np(rel["object"])
        self.out = _CSR(rs, rp, ro)
        self.inc = _CSR(ro, rp, rs)

        # non-rdf:type adjacency, prebuilt once (the disambiguation and
        # fact stages always exclude type edges — per-subject filtering in
        # the hot path would otherwise be each actor's dominant warm cost)
        self.type_pred = self._lookup_uri(RDF_TYPE)
        if self.type_pred is not None:
            nt = rp != self.type_pred
            self.out_nt = _CSR(rs[nt], rp[nt], ro[nt])
            self.inc_nt = _CSR(ro[nt], rp[nt], rs[nt])
        else:
            self.out_nt = self.out
            self.inc_nt = self.inc

        typ = bundle.types
        self._types = _CSR(
            _np(typ["subject"]), np.zeros(len(typ), dtype=np.int64), _np(typ["type"])
        )

        # distinct candidate subjects per literal (collapses multi-property
        # duplicates once, vectorized, instead of per-literal np.unique in
        # every actor)
        so, ss = _np(sym["object"]), _np(sym["subject"])
        if len(so):
            width = int(max(ss.max(), 1)) + 1
            packed = np.unique(so * width + ss)
            self._sym_d = _CSR(
                packed // width, np.zeros(len(packed), dtype=np.int64), packed % width
            )
        else:
            self._sym_d = _CSR(so, so, ss)

        tc = bundle.type_clusters
        self.cluster_of: dict[int, int] = dict(
            zip(_np(tc["type"]).tolist(), _np(tc["cluster"]).tolist())
        )

        # markov: (cluster_s, cluster_o) -> (pred array, prob array) sorted by prob desc
        mk = bundle.markov
        self._markov: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        if len(mk):
            cs, pr, co, pb = (
                _np(mk["cluster_s"]),
                _np(mk["predicate"]),
                _np(mk["cluster_o"]),
                mk["prob"].to_numpy(zero_copy_only=False),
            )
            order = np.lexsort((pr, -pb, co, cs))
            cs, pr, co, pb = cs[order], pr[order], co[order], pb[order]
            keys = np.stack([cs, co], axis=1)
            uniq, starts = np.unique(keys, axis=0, return_index=True)
            stops = np.append(starts[1:], len(cs))
            for (a, b), s0, s1 in zip(uniq.tolist(), starts, stops):
                self._markov[(a, b)] = (pr[s0:s1], pb[s0:s1])

    def _lookup_uri(self, uri: str) -> int | None:
        """Binary search on the rank-sorted uri list (no dict build)."""
        import bisect

        i = bisect.bisect_left(self.uris, uri)
        if i < len(self.uris) and self.uris[i] == uri:
            return i
        return None

    # --- dictionaries -------------------------------------------------
    def uri(self, idx: int) -> str:
        return self.uris[idx]

    def uri_index(self, uri: str) -> int | None:
        if self._uri_to_idx is None:
            self._uri_to_idx = {u: i for i, u in enumerate(self.uris)}
        return self._uri_to_idx.get(uri)

    def literal(self, idx: int) -> str:
        return self.literal_strings[idx]

    def literal_index(self, lit: str) -> int | None:
        if self._literal_to_idx is None:
            self._literal_to_idx = {s: i for i, s in enumerate(self.literal_strings)}
        return self._literal_to_idx.get(lit)

    # --- lookups ------------------------------------------------------
    def candidates_for_literal(self, literal_idx: int) -> tuple[np.ndarray, np.ndarray]:
        """(predicates, subjects) holding this literal — the hash-join side
        of InstanceRecognition (PostgresKB.getInstanceCandidates:210-247)."""
        return self._sym.neighbors(literal_idx)

    def distinct_candidates(self, literal_idx: int) -> np.ndarray:
        """Sorted distinct candidate subjects for a literal (array view)."""
        return self._sym_d.neighbors(literal_idx)[1]

    def outgoing_nontype(self, subject_idx: int) -> tuple[np.ndarray, np.ndarray]:
        return self.out_nt.neighbors(subject_idx)

    def incoming_nontype(self, object_idx: int) -> tuple[np.ndarray, np.ndarray]:
        return self.inc_nt.neighbors(object_idx)

    def types_of(self, subject_idx: int) -> np.ndarray:
        return self._types.neighbors(subject_idx)[1]

    def clusters_of(self, subject_idx: int) -> list[int]:
        seen: list[int] = []
        for t in self.types_of(subject_idx).tolist():
            c = self.cluster_of.get(t, t)
            if c not in seen:
                seen.append(c)
        return seen

    def outgoing(self, subject_idx: int) -> tuple[np.ndarray, np.ndarray]:
        return self.out.neighbors(subject_idx)

    def incoming(self, object_idx: int) -> tuple[np.ndarray, np.ndarray]:
        return self.inc.neighbors(object_idx)

    def instances_of_types(self, types: list[int], count: int | None = None) -> list[int]:
        """Subjects carrying any of the given rdf:types, optionally capped —
        the sampling lookup (PostgresKB.getInstancesOfTypes ... LIMIT count,
        :664-687).  Deterministic: ascending subject index."""
        typ = self.bundle.types
        subs = _np(typ["subject"])
        ts = _np(typ["type"])
        mask = np.isin(ts, np.asarray(types, dtype=np.int64))
        out = np.unique(subs[mask])
        if count is not None:
            out = out[:count]
        return out.tolist()

    def markov_top(
        self, cluster_s: int, cluster_o: int, k: int = 1
    ) -> list[tuple[int, float]]:
        """Top-k (predicate, prob) for a cluster pair
        (PostgresKB.getMaxMarkovProbability:1343-1383)."""
        hit = self._markov.get((cluster_s, cluster_o))
        if hit is None:
            return []
        preds, probs = hit
        return list(zip(preds[:k].tolist(), probs[:k].tolist()))


def _np(arr: pa.ChunkedArray) -> np.ndarray:
    return arr.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)

"""Known-fact retrieval (slot 11) and fact prediction (slot 13).

KnownFactsRetrieval.java:48-83 — for each resolved subject pull all its
outgoing KB triples; these become the ``#known`` output graph.

FactRecommender.java:72-113 — classify each resolved subject into a type
cluster (set-cover vote over its rdf:types, PostgresKB.getCluster:806-850)
and, for every ordered pair of classified resolved subjects, propose the
top-k predicates by cluster-level Markov-chain probability
(kb.getMaxMarkovProbability:1343-1383); these become ``#predicted``.

Physical design: broadcast-lookup batch UDF, no shuffle.  Hot-path layout:

- per-subject outgoing/type/cluster results are cached as numpy arrays per
  actor (head entities recur across millions of docs);
- prediction enumerates CLUSTER pairs, not subject pairs: subjects are
  grouped by cluster per doc, markov is probed once per (cluster_a,
  cluster_b) (#classes² probes, not #subjects²), and the subject-level
  ordered pairs are materialized as vectorized numpy repeat/tile cross
  products;
- list columns are assembled via ``pa.ListArray.from_arrays`` (one offsets
  + one values array per column), never per-row python lists.

Output per-doc list columns:
  known_s / known_p / known_o       (object-property triples, rdf:type excluded)
  type_s / type_o                   (rdf:type triples of resolved subjects)
  pred_s / pred_p / pred_o          (predicted edges)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .spot import resolve_kb

_EMPTY = np.empty(0, dtype=np.int64)


class _ListCol:
    """Accumulates one list<int64> column as (offsets, value chunks)."""

    __slots__ = ("offsets", "chunks", "total")

    def __init__(self):
        self.offsets = [0]
        self.chunks: list[np.ndarray] = []
        self.total = 0

    def add(self, arr: np.ndarray) -> None:
        n = len(arr)
        if n:
            self.chunks.append(arr)
        self.total += n
        self.offsets.append(self.total)

    def build(self) -> pa.ListArray:
        values = np.concatenate(self.chunks) if self.chunks else _EMPTY
        return pa.ListArray.from_arrays(
            pa.array(self.offsets, pa.int32()), pa.array(values, pa.int64())
        )


class FactStage:
    def __init__(self, kb, markov_k: int = 1):
        self.kb = resolve_kb(kb)
        self.markov_k = markov_k
        tp = self.kb.bundle.meta.get("type_predicate_index")
        if tp is None:
            tp = self.kb.uri_index("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        self.type_pred = tp
        # per-actor subject caches
        self._out: dict[int, tuple] = {}
        self._clusters: dict[int, tuple[int, ...]] = {}

    def _subject_out(self, s: int):
        hit = self._out.get(s)
        if hit is None:
            k_p, k_o = self.kb.outgoing_nontype(s)
            t_o = self.kb.types_of(s)
            hit = (
                np.full(len(k_p), s, dtype=np.int64),
                k_p.astype(np.int64),
                k_o.astype(np.int64),
                np.full(len(t_o), s, dtype=np.int64),
                t_o.astype(np.int64),
            )
            self._out[s] = hit
        return hit

    def _subject_clusters(self, s: int) -> tuple[int, ...]:
        hit = self._clusters.get(s)
        if hit is None:
            hit = tuple(self.kb.clusters_of(s))
            self._clusters[s] = hit
        return hit

    def _doc(self, resolved: list[int], cols: list[_ListCol]) -> None:
        subjects: list[int] = []
        seen: set[int] = set()
        for s in resolved:
            if s not in seen:
                seen.add(s)
                subjects.append(s)
        ks, kp, ko, ts, to = [], [], [], [], []
        for s in subjects:
            h = self._subject_out(s)
            ks.append(h[0])
            kp.append(h[1])
            ko.append(h[2])
            ts.append(h[3])
            to.append(h[4])
        cat = lambda parts: np.concatenate(parts) if parts else _EMPTY
        cols[0].add(cat(ks))
        cols[1].add(cat(kp))
        cols[2].add(cat(ko))
        cols[3].add(cat(ts))
        cols[4].add(cat(to))

        # group subjects by cluster; probe markov once per cluster pair
        by_cluster: dict[int, list[int]] = {}
        multi = False
        for s in subjects:
            cls = self._subject_clusters(s)
            if len(cls) > 1:
                multi = True
            for c in cls:
                by_cluster.setdefault(c, []).append(s)
        ps_parts, pp_parts, po_parts = [], [], []
        for ca, subs_a in by_cluster.items():
            a_arr = np.asarray(subs_a, dtype=np.int64)
            for cb, subs_b in by_cluster.items():
                top = self.kb.markov_top(ca, cb, self.markov_k)
                if not top:
                    continue
                b_arr = np.asarray(subs_b, dtype=np.int64)
                aa = np.repeat(a_arr, len(b_arr))
                bb = np.tile(b_arr, len(a_arr))
                mask = aa != bb
                if not mask.any():
                    continue
                aa, bb = aa[mask], bb[mask]
                for pred, _prob in top:
                    ps_parts.append(aa)
                    pp_parts.append(np.full(len(aa), pred, dtype=np.int64))
                    po_parts.append(bb)
        p_s, p_p, p_o = cat(ps_parts), cat(pp_parts), cat(po_parts)
        if multi and len(p_s):
            # subjects in >1 cluster can produce duplicate (s, p, o) rows
            trip = np.stack([p_s, p_p, p_o], axis=1)
            _, idx = np.unique(trip, axis=0, return_index=True)
            idx.sort()
            p_s, p_p, p_o = p_s[idx], p_p[idx], p_o[idx]
        cols[5].add(p_s)
        cols[6].add(p_p)
        cols[7].add(p_o)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = [_ListCol() for _ in range(8)]
        if "resolved_subj" in batch.column_names:
            resolved_col = batch["resolved_subj"].to_pylist()
        else:  # upstream slot disabled (DummyTask semantics): empty annotations
            resolved_col = [[] for _ in range(len(batch))]
        for resolved in resolved_col:
            self._doc(resolved, cols)
        names = [
            "known_s",
            "known_p",
            "known_o",
            "type_s",
            "type_o",
            "pred_s",
            "pred_p",
            "pred_o",
        ]
        for name, col in zip(names, cols):
            batch = batch.append_column(name, col.build())
        return batch

"""Known-fact retrieval (slot 11) and fact prediction (slot 13).

KnownFactsRetrieval.java:48-83 — for each resolved subject pull all its
outgoing KB triples; these become the ``#known`` output graph.

FactRecommender.java:72-113 — classify each resolved subject into a type
cluster (set-cover vote over its rdf:types, PostgresKB.getCluster:806-850)
and, for every ordered pair of classified resolved subjects, propose the
top-k predicates by cluster-level Markov-chain probability
(kb.getMaxMarkovProbability:1343-1383); these become ``#predicted``.

Both are broadcast-lookup batch UDFs: adjacency / markov tables come from
the KB bundle (object store, zero-copy), no shuffle.

Output per-doc list columns:
  known_s / known_p / known_o       (object-property triples, rdf:type excluded)
  type_s / type_o                   (rdf:type triples of resolved subjects)
  pred_s / pred_p / pred_o          (predicted edges)
"""

from __future__ import annotations

import pyarrow as pa

from .spot import resolve_kb


class FactStage:
    def __init__(self, kb, markov_k: int = 1):
        self.kb = resolve_kb(kb)
        self.markov_k = markov_k
        tp = self.kb.bundle.meta.get("type_predicate_index")
        if tp is None:
            tp = self.kb.uri_index("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        self.type_pred = tp
        # per-actor subject caches (outgoing split + clusters): head entities
        # recur across millions of docs, so these amortize to O(1) per hit
        self._out: dict[int, tuple[list, list, list, list, list]] = {}
        self._clusters: dict[int, list[int]] = {}

    def _subject_out(self, s: int):
        hit = self._out.get(s)
        if hit is None:
            preds, objs = self.kb.outgoing(s)
            ks, kp, ko, ts, to = [], [], [], [], []
            for p, o in zip(preds.tolist(), objs.tolist()):
                if p == self.type_pred:
                    ts.append(s)
                    to.append(o)
                else:
                    ks.append(s)
                    kp.append(p)
                    ko.append(o)
            hit = (ks, kp, ko, ts, to)
            self._out[s] = hit
        return hit

    def _subject_clusters(self, s: int) -> list[int]:
        hit = self._clusters.get(s)
        if hit is None:
            hit = self.kb.clusters_of(s)
            self._clusters[s] = hit
        return hit

    def _doc(self, resolved: list[int]):
        kb = self.kb
        subjects: list[int] = []
        for s in resolved:
            if s not in subjects:
                subjects.append(s)
        ks, kp, ko, ts, to = [], [], [], [], []
        for s in subjects:
            cks, ckp, cko, cts, cto = self._subject_out(s)
            ks.extend(cks)
            kp.extend(ckp)
            ko.extend(cko)
            ts.extend(cts)
            to.extend(cto)
        ps, pp, po = [], [], []
        clusters = {s: self._subject_clusters(s) for s in subjects}
        for a in subjects:
            for b in subjects:
                if a == b:
                    continue
                seen: set[int] = set()
                for ca in clusters[a]:
                    for cb in clusters[b]:
                        for pred, _prob in kb.markov_top(ca, cb, self.markov_k):
                            if pred not in seen:
                                seen.add(pred)
                                ps.append(a)
                                pp.append(pred)
                                po.append(b)
        return ks, kp, ko, ts, to, ps, pp, po

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: list[list[list[int]]] = [[] for _ in range(8)]
        for resolved in batch["resolved_subj"].to_pylist():
            for col, vals in zip(cols, self._doc(resolved)):
                col.append(vals)
        lt = pa.list_(pa.int64())
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
            batch = batch.append_column(name, pa.array(col, lt))
        return batch

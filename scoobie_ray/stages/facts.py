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

    def _doc(self, resolved: list[int]):
        kb = self.kb
        subjects: list[int] = []
        for s in resolved:
            if s not in subjects:
                subjects.append(s)
        ks, kp, ko, ts, to = [], [], [], [], []
        for s in subjects:
            preds, objs = kb.outgoing(s)
            for p, o in zip(preds.tolist(), objs.tolist()):
                if p == self.type_pred:
                    ts.append(s)
                    to.append(o)
                else:
                    ks.append(s)
                    kp.append(p)
                    ko.append(o)
        ps, pp, po = [], [], []
        clusters = {s: kb.clusters_of(s) for s in subjects}
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

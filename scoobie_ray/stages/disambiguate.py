"""Entity disambiguation via per-document graph analysis (slot 10).

Reimplements the semantics of EntityDisambiguation.java:101-152:

1. build the per-document bipartite literal→candidate-subject graph
   (populateGraphWithLiterals :73-99);
2. expand it with KB object-property edges between candidate subjects
   (populateGraphWithRelations :225-293 — the reference BFS-expands from
   unambiguous references through intermediate KB nodes; we add the direct
   subject→subject edges found in the broadcast adjacency, a documented
   1-hop simplification that resolves the same co-occurrence signal);
3. score candidates with a pluggable resolver (the strategy plug-ins of
   transducer/model/disambiguation/ — degree, capacity, hub/authority,
   HITS, PageRank, random); the reference default is DegreeBasedResolver
   (test/model/Scoobie.java:97-98);
4. per ambiguity set keep the argmax (ties → smallest subject index, i.e.
   lexicographically smallest URI under our rank-encoded dictionary) and
   drop losing candidates (Document.removeUnresolvedSubjects
   Document.java:243-272).

Everything is per-document — no cross-document shuffle; the per-doc graphs
are tiny (the reference prunes leaves and skips rdf:type edges :158-172,
:453 — we skip rdf:type edges by excluding the type predicate from
adjacency use).

Output per-doc list columns: ``resolved_mention``, ``resolved_subj``,
``resolved_prop`` (one winner per mention that had candidates).
"""

from __future__ import annotations

import random
from collections.abc import Callable

import pyarrow as pa

from .spot import resolve_kb

Scores = dict[int, float]


def _graph_degree(lit_edges: Scores, out_adj: dict[int, list[int]], in_adj: dict[int, list[int]], nodes: set[int]) -> Scores:
    return {
        n: lit_edges.get(n, 0.0) + len(out_adj.get(n, ())) + len(in_adj.get(n, ()))
        for n in nodes
    }


def _capacity(lit_edges: Scores, out_adj, in_adj, nodes) -> Scores:
    # FlowBasedResolver: min(in, out) "capacity"
    return {
        n: min(lit_edges.get(n, 0.0) + len(in_adj.get(n, ())), float(len(out_adj.get(n, ()))))
        for n in nodes
    }


def _hits(lit_edges, out_adj, in_adj, nodes, iters: int = 20):
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    for _ in range(iters):
        auth = {n: sum(hub[m] for m in in_adj.get(n, ())) + lit_edges.get(n, 0.0) for n in nodes}
        norm = sum(v * v for v in auth.values()) ** 0.5 or 1.0
        auth = {n: v / norm for n, v in auth.items()}
        hub = {n: sum(auth[m] for m in out_adj.get(n, ())) for n in nodes}
        norm = sum(v * v for v in hub.values()) ** 0.5 or 1.0
        hub = {n: v / norm for n, v in hub.items()}
    return hub, auth


def _pagerank(lit_edges, out_adj, in_adj, nodes, alpha: float = 0.1, iters: int = 30) -> Scores:
    # JUNG PageRankBasedResolver uses alpha=0.1 (random-jump probability)
    n = len(nodes) or 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: alpha / n for v in nodes}
        for v in nodes:
            outs = out_adj.get(v, ())
            if outs:
                share = (1 - alpha) * pr[v] / len(outs)
                for w in outs:
                    nxt[w] = nxt.get(w, 0.0) + share
            else:
                for w in nodes:
                    nxt[w] += (1 - alpha) * pr[v] / n
        pr = nxt
    return pr


def make_resolver(name: str) -> Callable[..., Scores]:
    def degree(le, oa, ia, nodes):
        return _graph_degree(le, oa, ia, nodes)

    def capacity(le, oa, ia, nodes):
        return _capacity(le, oa, ia, nodes)

    def hits(le, oa, ia, nodes):
        hub, auth = _hits(le, oa, ia, nodes)
        return {n: hub[n] * auth[n] for n in nodes}

    def hits2(le, oa, ia, nodes):
        hub, auth = _hits(le, oa, ia, nodes)
        return {n: hub[n] + auth[n] for n in nodes}

    def hub(le, oa, ia, nodes):
        return _hits(le, oa, ia, nodes)[0]

    def authority(le, oa, ia, nodes):
        return _hits(le, oa, ia, nodes)[1]

    def pagerank(le, oa, ia, nodes):
        return _pagerank(le, oa, ia, nodes)

    def rnd(le, oa, ia, nodes):
        rng = random.Random(42)
        return {n: rng.random() for n in nodes}

    return {
        "degree": degree,
        "capacity": capacity,
        "hits": hits,
        "hits2": hits2,
        "hub": hub,
        "authority": authority,
        "pagerank": pagerank,
        "random": rnd,
    }[name]


class Disambiguator:
    """Actor-pool map_batches stage; KB adjacency built once per actor."""

    def __init__(self, kb, resolver: str = "degree"):
        self.kb = resolve_kb(kb)
        self.resolver = make_resolver(resolver)
        tp = self.kb.bundle.meta.get("type_predicate_index")
        if tp is None:
            tp = self.kb.uri_index(
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            )
        self.type_pred = tp

    def _resolve_doc(
        self,
        lits: list[int],
        cm: list[int],
        cp: list[int],
        cs: list[int],
    ) -> tuple[list[int], list[int], list[int]]:
        if not cm:
            return [], [], []
        # mention -> candidate (prop, subj) pairs
        per_mention: dict[int, list[tuple[int, int]]] = {}
        for m, p, s in zip(cm, cp, cs):
            per_mention.setdefault(m, []).append((p, s))
        nodes: set[int] = set(cs)

        # literal edges: one edge per distinct literal naming the subject
        lit_candidates: dict[int, set[int]] = {}
        for m, pairs in per_mention.items():
            lit = lits[m]
            lit_candidates.setdefault(lit, set()).update(s for _, s in pairs)
        lit_edges: Scores = {}
        for subs in lit_candidates.values():
            for s in subs:
                lit_edges[s] = lit_edges.get(s, 0.0) + 1.0

        # KB relation edges among in-doc candidates (skip rdf:type, :453)
        out_adj: dict[int, list[int]] = {}
        in_adj: dict[int, list[int]] = {}
        for s in nodes:
            preds, objs = self.kb.outgoing(s)
            for p, o in zip(preds.tolist(), objs.tolist()):
                if p == self.type_pred:
                    continue
                if o in nodes and o != s:
                    out_adj.setdefault(s, []).append(o)
                    in_adj.setdefault(o, []).append(s)

        scores = self.resolver(lit_edges, out_adj, in_adj, nodes)

        rm, rs, rp = [], [], []
        for m in sorted(per_mention):
            pairs = per_mention[m]
            # argmax score, ties -> smallest subject index (stable URI order)
            best = min(pairs, key=lambda ps: (-scores.get(ps[1], 0.0), ps[1]))
            rm.append(m)
            rp.append(best[0])
            rs.append(best[1])
        return rm, rs, rp

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, rss, rps = [], [], []
        for lits, cm, cp, cs in zip(
            batch["mention_literal"].to_pylist(),
            batch["cand_mention"].to_pylist(),
            batch["cand_prop"].to_pylist(),
            batch["cand_subj"].to_pylist(),
        ):
            rm, rs, rp = self._resolve_doc(lits, cm, cp, cs)
            rms.append(rm)
            rss.append(rs)
            rps.append(rp)
        lt = pa.list_(pa.int64())
        return (
            batch.append_column("resolved_mention", pa.array(rms, lt))
            .append_column("resolved_subj", pa.array(rss, lt))
            .append_column("resolved_prop", pa.array(rps, lt))
        )

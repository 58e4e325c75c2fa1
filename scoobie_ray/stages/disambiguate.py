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

import numpy as np
import pyarrow as pa

from .spot import resolve_kb

Scores = dict[int, float]
_EMPTY_I64 = np.empty(0, dtype=np.int64)


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

    def __init__(
        self,
        kb,
        resolver: str = "degree",
        template=None,
        expansion_hops: int = 1,
        expansion: str = "anchor",
        expansion_max_set: int = 512,
    ):
        """``expansion``:

        - ``"anchor"`` (default): anchor-centric 1-hop (+ optional 2-hop
          via ``expansion_hops=2``) — the fast vectorized path whose
          winners the kg_resolved oracle locks;
        - ``"bfs"``: the reference's full expansion
          (EntityDisambiguation.java:225-293) — iterative forward
          traversal in ascending-ambiguity order until no ambiguous set
          remains (intermediate KB nodes join the graph), backward
          expansion into still-disconnected sets (:409-435), and leaf
          pruning (:158-172).  ``expansion_max_set`` bounds per-set
          forward expansion (the reference is uncapped; hub ambiguity
          sets would otherwise pull in whole KB neighborhoods).
        """
        self.expansion_hops = expansion_hops
        self.expansion = expansion
        self.expansion_max_set = expansion_max_set
        self.kb = resolve_kb(kb)
        self.filter = (
            template.resolve(self.kb)
            if template is not None and hasattr(template, "resolve")
            else template
        )
        self.resolver_name = resolver
        self.resolver = make_resolver(resolver)
        # memo: sorted distinct-literal tuple -> {literal: (winner, prop)}
        self._memo: dict[tuple, dict[int, tuple[int, int]]] = {}
        # per-actor candidate caches: literal -> (props, subjs) / distinct subjs
        self._cand: dict[int, tuple[list[int], list[int]]] = {}
        self._cand_distinct: dict[int, list[int]] = {}
        self._prop_map: dict[int, dict[int, int]] = {}
        tp = self.kb.bundle.meta.get("type_predicate_index")
        if tp is None:
            tp = self.kb.uri_index(
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            )
        self.type_pred = tp

    def _graph_for(
        self, lit_candidates: dict[int, list[int]]
    ) -> tuple[Scores, dict[int, list[int]], dict[int, list[int]], set[int]]:
        """Build the per-doc graph from the distinct-literal candidate sets.

        Edge expansion is anchor-centric and vectorized: the reference
        BFS-expands from unambiguous references in ascending-ambiguity
        order (populateGraphWithRelations :225-293); we enumerate the KB
        neighbors of each unambiguous anchor once (numpy isin against the
        sorted candidate set) instead of probing every candidate — hub
        ambiguity sets (hundreds of candidates sharing a literal) cost two
        vector ops per anchor, not a Python loop per candidate.  Ambiguity
        sets that anchors fail to discriminate fall back to bounded direct
        expansion (the reference's backward pass, :409-435).
        """
        nodes: set[int] = set()
        for subs in lit_candidates.values():
            nodes.update(subs)
        node_arr = np.fromiter(nodes, dtype=np.int64, count=len(nodes))
        node_arr.sort()

        lit_edges: Scores = {}
        for subs in lit_candidates.values():
            for s in subs:
                lit_edges[s] = lit_edges.get(s, 0.0) + 1.0

        anchors = {int(subs[0]) for subs in lit_candidates.values() if len(subs) == 1}
        out_adj: dict[int, list[int]] = {}
        in_adj: dict[int, list[int]] = {}

        def _add(a: int, b: int) -> None:  # edge a -> b
            out_adj.setdefault(a, []).append(b)
            in_adj.setdefault(b, []).append(a)

        for a in anchors:
            preds, objs = self.kb.outgoing(a)
            if len(objs):
                mask = np.isin(objs, node_arr) & (preds != self.type_pred) & (objs != a)
                for o in objs[mask].tolist():
                    _add(a, o)
            preds, subs = self.kb.incoming(a)
            if len(subs):
                mask = np.isin(subs, node_arr) & (preds != self.type_pred) & (subs != a)
                for s in subs[mask].tolist():
                    if s not in anchors:  # anchor->anchor counted on out pass
                        _add(s, a)

        # fallback for sets anchors could not discriminate (bounded)
        for subs in lit_candidates.values():
            if len(subs) < 2 or len(subs) > 512:
                continue
            degs = {
                s: len(out_adj.get(s, ())) + len(in_adj.get(s, ())) for s in subs
            }
            if len(set(degs.values())) > 1:
                continue
            for s in subs:
                preds, objs = self.kb.outgoing(s)
                if not len(objs):
                    continue
                mask = np.isin(objs, node_arr) & (preds != self.type_pred) & (objs != s)
                for o in objs[mask].tolist():
                    if o not in anchors:  # anchor edges already counted
                        _add(s, o)
        return lit_edges, out_adj, in_adj, nodes

    def _graph_for_bfs(
        self, lit_candidates: dict[int, list[int]]
    ) -> tuple[Scores, dict[int, list[int]], dict[int, list[int]], set[int]]:
        """Reference-faithful graph construction
        (EntityDisambiguation.java:225-293, :409-435, :158-172):

        1. candidates grouped by their literal's ambiguity; forward
           expansion (non-type OUTGOING edges, intermediate KB objects
           join the graph) proceeds in ASCENDING ambiguity order —
           unambiguous anchors first — re-checking after each level and
           stopping as soon as no ambiguous set remains disconnected;
        2. backward expansion (INCOMING edges) into each set still
           disconnected after the forward sweep;
        3. leaf pruning: unlabeled intermediates with in-degree ≤ 1 and
           out-degree ≤ 1 are removed with their edges.
        """
        labeled: set[int] = set()
        for subs in lit_candidates.values():
            labeled.update(int(s) for s in subs)

        lit_edges: Scores = {}
        for subs in lit_candidates.values():
            for s in subs:
                lit_edges[s] = lit_edges.get(s, 0.0) + 1.0

        out_adj: dict[int, set[int]] = {}
        in_adj: dict[int, set[int]] = {}

        def _add(a: int, b: int) -> None:
            out_adj.setdefault(a, set()).add(b)
            in_adj.setdefault(b, set()).add(a)

        def _connected(subs) -> bool:
            # isConnected (:326-337): any subject with a graph neighbor
            return any(s in out_adj or s in in_adj for s in subs)

        multi_sets = [subs for subs in lit_candidates.values() if len(subs) > 1]

        # ambiguityRanking: cardinality -> refs (:229-252)
        by_card: dict[int, set[int]] = {}
        for subs in lit_candidates.values():
            by_card.setdefault(len(subs), set()).update(int(s) for s in subs)

        expanded: set[int] = set()
        for card in sorted(by_card):
            if card > self.expansion_max_set:
                break
            clear = by_card[card] - expanded
            for a in clear:
                preds, objs = self.kb.outgoing(a)
                if len(objs):
                    mask = (preds != self.type_pred) & (objs != a)
                    for o in objs[mask].tolist():
                        _add(a, int(o))
            expanded |= clear
            if all(_connected(s) for s in multi_sets):
                break

        # backward pass into still-disconnected ambiguous sets
        for subs in multi_sets:
            if _connected(subs) or len(subs) > self.expansion_max_set:
                continue
            for s in subs:
                preds, inc = self.kb.incoming(int(s))
                if len(inc):
                    mask = (preds != self.type_pred) & (inc != s)
                    for x in inc[mask].tolist():
                        _add(int(x), int(s))

        # leaf pruning (pruneGraph :158-172)
        all_nodes = labeled | set(out_adj) | set(in_adj)
        leaves = {
            v
            for v in all_nodes
            if v not in labeled
            and len(in_adj.get(v, ())) <= 1
            and len(out_adj.get(v, ())) <= 1
        }
        for v in leaves:
            for src in in_adj.pop(v, set()):
                out_adj[src].discard(v)
            for dst in out_adj.pop(v, set()):
                in_adj[dst].discard(v)
            all_nodes.discard(v)

        return (
            lit_edges,
            {k: sorted(v) for k, v in out_adj.items()},
            {k: sorted(v) for k, v in in_adj.items()},
            all_nodes,
        )

    def _candidates(self, lit: int) -> tuple[list[int], list[int]]:
        hit = self._cand.get(lit)
        if hit is None:
            props, subs = self.kb.candidates_for_literal(lit)
            hit = (props.tolist(), subs.tolist())
            if self.filter is not None:
                hit = self.filter.filter_pairs(*hit)
            self._cand[lit] = hit
        return hit

    def _anchor_neighbors(self, a: int) -> tuple[np.ndarray, np.ndarray]:
        """Non-type neighbor arrays straight from the prebuilt index CSRs
        (zero per-actor warm cost; a rare self-loop scores only the anchor
        itself, which is never an ambiguous candidate — harmless)."""
        return (
            self.kb.outgoing_nontype(a)[1],
            self.kb.incoming_nontype(a)[1],
        )

    def _prop_for(self, lit: int, subj: int) -> int:
        """First (property) under which ``subj`` carries literal ``lit``
        (cached subj->prop map per literal)."""
        m = self._prop_map.get(lit)
        if m is None:
            props, csubs = self._candidates(lit)
            m = {}
            for p, s in zip(props, csubs):
                m.setdefault(s, p)
            self._prop_map[lit] = m
        return m[subj]

    def _distinct_candidates(self, lit: int) -> np.ndarray:
        """Sorted distinct candidate subjects, cached per actor — spotted
        literals repeat heavily across documents (every supplier/customer
        doc names its nation), so the CSR gather runs once per literal per
        actor, not once per (doc, literal)."""
        hit = self._cand_distinct.get(lit)
        if hit is None:
            if self.filter is None:
                hit = self.kb.distinct_candidates(lit)
            else:
                _props, subs = self._candidates(lit)
                subs = np.asarray(subs, dtype=np.int64)
                hit = np.unique(subs) if len(subs) else _EMPTY_I64
            self._cand_distinct[lit] = hit
        return hit

    def _winners_degree(
        self, lit_candidates: dict[int, list[int]]
    ) -> dict[int, int]:
        """Vectorized winner selection for the default degree resolver.

        Scores only the candidates of ambiguous literals (unambiguous
        literals resolve to their single candidate): numpy bincount for
        literal edges, anchor-centric searchsorted accumulation for KB
        edges — no Python dict per node.  Produces identical winners to
        the graph resolver path (same degree contributions, same
        min-subject-index tie-break)."""
        winners: dict[int, int] = {}
        ambiguous: dict[int, np.ndarray] = {}
        for lit, subs in lit_candidates.items():
            if len(subs) == 1:
                winners[lit] = int(subs[0])
            else:
                ambiguous[lit] = subs
        if not ambiguous:
            return winners

        node_arr = np.unique(
            np.concatenate([np.asarray(v, dtype=np.int64) for v in ambiguous.values()])
        )
        scores = np.zeros(len(node_arr))

        def _pos(arr: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(node_arr, arr)
            pos[pos >= len(node_arr)] = 0
            return pos[(node_arr[pos] == arr)] if len(arr) else pos

        # literal edges: +1 per literal naming the candidate
        contrib: list[np.ndarray] = list(lit_candidates.values())
        anchors_arr = np.unique(
            np.fromiter(winners.values(), dtype=np.int64, count=len(winners))
        )
        # Anchor KB edges: both sides of each (candidate, anchor) edge
        # yield the same per-edge count, so pick the side that gathers
        # fewer adjacency lists.  Dense-ambiguity docs (many candidates,
        # few anchors) accumulate over the anchors' neighbor lists; docs
        # whose anchors are hub entities with huge lists but few ambiguous
        # candidates count from the candidate side instead.
        if len(node_arr) >= 4 * len(anchors_arr):
            contrib.append(self.kb.out_nt.gather_many(anchors_arr))
            contrib.append(self.kb.inc_nt.gather_many(anchors_arr))
            if contrib:
                np.add.at(scores, _pos(np.concatenate(contrib)), 1.0)
        else:
            if contrib:
                np.add.at(scores, _pos(np.concatenate(contrib)), 1.0)
            if len(anchors_arr):
                for csr in (self.kb.out_nt, self.kb.inc_nt):
                    vals, lens = csr.gather_segments(node_arr)
                    if len(vals):
                        apos = np.searchsorted(anchors_arr, vals)
                        apos[apos >= len(anchors_arr)] = 0
                        hits = anchors_arr[apos] == vals
                        idx = np.repeat(np.arange(len(node_arr)), lens)
                        np.add.at(scores, idx[hits], 1.0)

        # optional second hop: paths candidate —x→ anchor-neighborhood
        # (the reference BFS-expands through intermediate KB nodes,
        # populateGraphWithRelations :225-293).  The anchors' 1-hop
        # neighborhoods become an acceptance set; any ambiguous candidate
        # adjacent to it gains a path-of-length-2 edge to an anchor.
        hop2_accept: np.ndarray | None = None
        if self.expansion_hops >= 2 and winners:
            parts = []
            for a in set(winners.values()):
                out_arr, in_arr = self._anchor_neighbors(a)
                parts.append(out_arr)
                parts.append(in_arr)
            if parts:
                hop2_accept = np.unique(np.concatenate(parts))

        for lit, arr in ambiguous.items():
            pos = np.searchsorted(node_arr, arr)
            sc = scores[pos]
            if sc.max() == sc.min() and len(arr) <= 512:
                # fallback: direct expansion among ambiguous candidates
                # (the reference's backward pass, :409-435)
                for s in arr.tolist():
                    preds, objs = self.kb.outgoing(s)
                    if len(objs):
                        sel = objs[(preds != self.type_pred) & (objs != s)]
                        hits = _pos(sel.astype(np.int64))
                        np.add.at(scores, hits, 1.0)
                        if len(hits):
                            scores[np.searchsorted(node_arr, s)] += len(hits)
                sc = scores[pos]
            if (
                hop2_accept is not None
                and len(hop2_accept)
                and sc.max() == sc.min()
                and len(arr) <= 512
            ):
                # 2-hop vote: candidate's neighbors ∩ anchors' neighbors
                hop_sc = np.zeros(len(arr))
                for i, s in enumerate(arr.tolist()):
                    outs = self.kb.outgoing_nontype(s)[1]
                    ins = self.kb.incoming_nontype(s)[1]
                    hop_sc[i] = (
                        np.isin(outs, hop2_accept, assume_unique=False).sum()
                        + np.isin(ins, hop2_accept).sum()
                    )
                sc = sc + hop_sc
            # argmax, ties -> smallest subject index (arr sorted? not nec.)
            order = np.lexsort((arr, -sc))
            winners[lit] = int(arr[order[0]])
        return winners

    def _winners(self, distinct_lits: tuple[int, ...]) -> dict[int, tuple[int, int]]:
        """Resolve a distinct-literal combination to {literal: (subject,
        property)}.  Resolution is a pure function of (literal set, KB), so
        results are memoized across documents sharing the same spotted
        literal combination — frequent in real corpora."""
        winners = self._memo.get(distinct_lits)
        if winners is not None:
            return winners
        lit_candidates: dict[int, np.ndarray] = {}
        for lit in distinct_lits:
            subs = self._distinct_candidates(lit)
            if len(subs):
                lit_candidates[lit] = subs
        if not lit_candidates:
            winners = {}
        elif self.resolver_name == "degree" and self.expansion != "bfs":
            flat = self._winners_degree(lit_candidates)
            winners = {
                lit: (win, self._prop_for(lit, win)) for lit, win in flat.items()
            }
        else:
            build = self._graph_for_bfs if self.expansion == "bfs" else self._graph_for
            lit_edges, out_adj, in_adj, nodes = build(lit_candidates)
            scores = self.resolver(lit_edges, out_adj, in_adj, nodes)
            winners = {}
            for lit, subs in lit_candidates.items():
                win = min(
                    (int(x) for x in subs),
                    key=lambda s: (-scores.get(s, 0.0), s),
                )
                winners[lit] = (win, self._prop_for(lit, win))
        if len(self._memo) > 200_000:
            self._memo.clear()
        self._memo[distinct_lits] = winners
        return winners

    @staticmethod
    def _emit_doc(
        lits: list[int], winners: dict[int, tuple[int, int]]
    ) -> tuple[list[int], list[int], list[int], list[int]]:
        rm, rs, rp, rl = [], [], [], []
        for m, lit in enumerate(lits):
            hit = winners.get(lit)
            if hit is None:
                continue
            rm.append(m)
            rs.append(hit[0])
            rp.append(hit[1])
            rl.append(lit)
        return rm, rs, rp, rl

    def _resolve_doc(
        self, lits: list[int]
    ) -> tuple[list[int], list[int], list[int], list[int]]:
        if not lits:
            return [], [], [], []
        winners = self._winners(tuple(sorted(set(lits))))
        return self._emit_doc(lits, winners)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, rss, rps, rls = [], [], [], []
        if "mention_literal" in batch.column_names:
            lits_col = batch["mention_literal"].to_pylist()
        else:  # spotting disabled: nothing to resolve
            lits_col = [[] for _ in range(len(batch))]
        for lits in lits_col:
            rm, rs, rp, rl = self._resolve_doc(lits)
            rms.append(rm)
            rss.append(rs)
            rps.append(rp)
            rls.append(rl)
        lt = pa.list_(pa.int64())
        return (
            batch.append_column("resolved_mention", pa.array(rms, lt))
            .append_column("resolved_subj", pa.array(rss, lt))
            .append_column("resolved_prop", pa.array(rps, lt))
            .append_column("resolved_lit", pa.array(rls, lt))
        )

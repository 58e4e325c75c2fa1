"""Instance recognition — entity-linking candidate generation (slot 9).

Reimplements InstanceRecognition.java:60-169: for every spotted mention,
look up the KB subjects that carry (some datatype property, that literal)
— the reference's semi-join against ``symbols``
(PostgresKB.getInstanceCandidates:210-247).  Ray-native: the symbols table
is part of the broadcast KB bundle; the lookup is a numpy
searchsorted-range hit per distinct literal (KBIndex.candidates_for_literal),
i.e. a broadcast hash-join inside the batch UDF — no shuffle.

Output per-doc parallel list columns:
``cand_mention: list<int64>`` (index into the mention lists),
``cand_prop:    list<int64>`` (datatype property index),
``cand_subj:    list<int64>`` (candidate subject index).
"""

from __future__ import annotations

import pyarrow as pa

from .spot import resolve_kb


class Linker:
    def __init__(self, kb, template=None):
        self.kb = resolve_kb(kb)
        self.filter = (
            template.resolve(self.kb)
            if template is not None and hasattr(template, "resolve")
            else template
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        kb = self.kb
        cms, cps, css = [], [], []
        if "mention_literal" in batch.column_names:
            lits_col = batch["mention_literal"].to_pylist()
        else:
            lits_col = [[] for _ in range(len(batch))]
        for lits in lits_col:
            cm, cp, cs = [], [], []
            cache: dict[int, tuple[list[int], list[int]]] = {}
            for mi, lit in enumerate(lits):
                hit = cache.get(lit)
                if hit is None:
                    preds, subs = kb.candidates_for_literal(lit)
                    hit = (preds.tolist(), subs.tolist())
                    if self.filter is not None:
                        hit = self.filter.filter_pairs(*hit)
                    cache[lit] = hit
                for p, s in zip(*hit):
                    cm.append(mi)
                    cp.append(p)
                    cs.append(s)
            cms.append(cm)
            cps.append(cp)
            css.append(cs)
        lt = pa.list_(pa.int64())
        return (
            batch.append_column("cand_mention", pa.array(cms, lt))
            .append_column("cand_prop", pa.array(cps, lt))
            .append_column("cand_subj", pa.array(css, lt))
        )

"""Triple serialization — explode per-doc annotations into triple rows.

Reimplements RDFSerializer.java:61-113 semantics: three named graphs —

``recognized``  (subject, datatypeProperty, matched-span literal text) for
                every resolved mention, plus the known rdf:types of the
                resolved subjects;
``known``       the resolved subjects' outgoing KB object-property triples;
``predicted``   markov-recommended edges between resolved subject pairs.

This is a stateless explode: each doc row yields N triple rows
(doc_id, subj, pred, obj, graph, belief).  URI/literal surface forms are
decoded from the broadcast dictionaries.  Downstream, canonicalization
dedups (subj, pred, obj, graph) corpus-wide (pipelines/canonicalize.py).
"""

from __future__ import annotations

import pyarrow as pa

from .spot import resolve_kb

TRIPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("graph", pa.string()),
        ("belief", pa.float64()),
    ]
)

RDF_TYPE_URI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class TripleSerializer:
    def __init__(self, kb):
        self.kb = resolve_kb(kb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kb = self.kb
        uris = kb.uris
        lits = kb.literal_strings
        d_ids, ss, pp, oo, gg, bb = [], [], [], [], [], []

        def emit(doc_id: str, s: str, p: str, o: str, g: str, b: float = 1.0):
            d_ids.append(doc_id)
            ss.append(s)
            pp.append(p)
            oo.append(o)
            gg.append(g)
            bb.append(b)

        cols = [
            "doc_id",
            "mention_literal",
            "resolved_mention",
            "resolved_subj",
            "resolved_prop",
            "known_s",
            "known_p",
            "known_o",
            "type_s",
            "type_o",
            "pred_s",
            "pred_p",
            "pred_o",
        ]
        data = [batch[c].to_pylist() for c in cols]
        for (
            doc_id,
            m_lit,
            r_m,
            r_s,
            r_p,
            k_s,
            k_p,
            k_o,
            t_s,
            t_o,
            p_s,
            p_p,
            p_o,
        ) in zip(*data):
            for m, s, p in zip(r_m, r_s, r_p):
                emit(doc_id, uris[s], uris[p], lits[m_lit[m]], "recognized")
            for s, o in zip(t_s, t_o):
                emit(doc_id, uris[s], RDF_TYPE_URI, uris[o], "recognized")
            for s, p, o in zip(k_s, k_p, k_o):
                emit(doc_id, uris[s], uris[p], uris[o], "known")
            for s, p, o in zip(p_s, p_p, p_o):
                emit(doc_id, uris[s], uris[p], uris[o], "predicted")

        return pa.table(
            {
                "doc_id": pa.array(d_ids, pa.string()),
                "subj": pa.array(ss, pa.string()),
                "pred": pa.array(pp, pa.string()),
                "obj": pa.array(oo, pa.string()),
                "graph": pa.array(gg, pa.string()),
                "belief": pa.array(bb, pa.float64()),
            }
        )

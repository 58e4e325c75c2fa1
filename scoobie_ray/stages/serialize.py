"""Triple serialization — explode per-doc annotations into triple rows.

Reimplements RDFSerializer.java:61-113 semantics: three named graphs —

``recognized``  (subject, datatypeProperty, matched-span literal text) for
                every resolved mention, plus the known rdf:types of the
                resolved subjects;
``known``       the resolved subjects' outgoing KB object-property triples;
``predicted``   markov-recommended edges between resolved subject pairs.

Fully vectorized explode: each annotation list column is flattened with
``pc.list_flatten`` / ``pc.list_parent_indices`` (zero-copy offset math),
doc_ids and URI/literal surface forms are resolved with ``pc.take`` against
the broadcast dictionaries — no per-row Python in this stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

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
        self._uri_arr = pa.array(self.kb.uris, pa.string())
        self._lit_arr = pa.array(self.kb.literal_strings, pa.string())
        self._type_pred_arr: pa.Array | None = None

    def _flat(self, batch: pa.Table, col: str) -> tuple[pa.Array, pa.Array]:
        """(flattened int values, parent row indices) for a list column."""
        arr = batch[col].combine_chunks()
        return pc.list_flatten(arr), pc.list_parent_indices(arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].combine_chunks()
        uri = self._uri_arr
        lit = self._lit_arr
        parts: list[pa.Table] = []

        def emit(parents, subj, pred, obj, graph: str):
            n = len(subj)
            parts.append(
                pa.table(
                    {
                        "doc_id": pc.take(doc_ids, parents),
                        "subj": subj,
                        "pred": pred,
                        "obj": obj,
                        "graph": pa.array([graph] * n, pa.string()),
                        "belief": pa.nulls(n, pa.float64()).fill_null(1.0),
                    },
                    schema=TRIPLE_SCHEMA,
                )
            )

        # recognized: (subject, datatype property, matched literal text)
        r_s, parents = self._flat(batch, "resolved_subj")
        r_p, _ = self._flat(batch, "resolved_prop")
        r_l, _ = self._flat(batch, "resolved_lit")
        emit(parents, pc.take(uri, r_s), pc.take(uri, r_p), pc.take(lit, r_l), "recognized")

        # recognized rdf:types of resolved subjects
        t_s, parents = self._flat(batch, "type_s")
        t_o, _ = self._flat(batch, "type_o")
        n = len(t_s)
        emit(
            parents,
            pc.take(uri, t_s),
            pa.array([RDF_TYPE_URI] * n, pa.string()),
            pc.take(uri, t_o),
            "recognized",
        )

        # known outgoing object-property triples
        k_s, parents = self._flat(batch, "known_s")
        k_p, _ = self._flat(batch, "known_p")
        k_o, _ = self._flat(batch, "known_o")
        emit(parents, pc.take(uri, k_s), pc.take(uri, k_p), pc.take(uri, k_o), "known")

        # predicted edges
        p_s, parents = self._flat(batch, "pred_s")
        p_p, _ = self._flat(batch, "pred_p")
        p_o, _ = self._flat(batch, "pred_o")
        emit(parents, pc.take(uri, p_s), pc.take(uri, p_p), pc.take(uri, p_o), "predicted")

        return pa.concat_tables(parts)

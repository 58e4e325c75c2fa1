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

import numpy as np
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

# encoded-graph labels (int8): index into GRAPHS
GRAPHS = ["recognized", "known", "predicted"]

ENCODED_SCHEMA = pa.schema(
    [
        ("s", pa.int32()),
        ("p", pa.int32()),
        ("o", pa.int32()),
        ("o_is_lit", pa.bool_()),
        ("g", pa.int8()),
    ]
)


class TripleSerializer:
    """Explode annotations to triples.

    ``encoded=True`` keeps every component as its dictionary index
    (int32 + graph int8, no doc_id) — ~5× fewer bytes than URI strings
    through the canonicalize shuffle; decode the small canonical result
    with :func:`decode_triples`.  ``encoded=False`` emits the string form
    with doc_id provenance (the per-doc inspection surface).
    """

    def __init__(self, kb, encoded: bool = False):
        self.kb = resolve_kb(kb)
        self.encoded = encoded
        self._uri_arr = pa.array(self.kb.uris, pa.string())
        self._lit_arr = pa.array(self.kb.literal_strings, pa.string())
        self._type_pred = self.kb.uri_index(RDF_TYPE_URI)

    def _flat(self, batch: pa.Table, col: str) -> tuple[pa.Array, pa.Array]:
        """(flattened int values, parent row indices) for a list column."""
        arr = batch[col].combine_chunks()
        return pc.list_flatten(arr), pc.list_parent_indices(arr)

    def _call_encoded(self, batch: pa.Table) -> pa.Table:
        parts: list[pa.Table] = []

        def emit(s, p, o, o_is_lit: bool, g: int):
            n = len(s)
            parts.append(
                pa.table(
                    {
                        "s": pc.cast(s, pa.int32()),
                        "p": pc.cast(p, pa.int32()),
                        "o": pc.cast(o, pa.int32()),
                        "o_is_lit": pa.array(
                            np.full(n, o_is_lit, dtype=bool)
                        ),
                        "g": pa.array(np.full(n, g, dtype=np.int8)),
                    },
                    schema=ENCODED_SCHEMA,
                )
            )

        r_s, _ = self._flat(batch, "resolved_subj")
        r_p, _ = self._flat(batch, "resolved_prop")
        r_l, _ = self._flat(batch, "resolved_lit")
        emit(r_s, r_p, r_l, True, 0)
        t_s, _ = self._flat(batch, "type_s")
        t_o, _ = self._flat(batch, "type_o")
        tp = pa.array(np.full(len(t_s), self._type_pred, dtype=np.int64))
        emit(t_s, tp, t_o, False, 0)
        k_s, _ = self._flat(batch, "known_s")
        k_p, _ = self._flat(batch, "known_p")
        k_o, _ = self._flat(batch, "known_o")
        emit(k_s, k_p, k_o, False, 1)
        p_s, _ = self._flat(batch, "pred_s")
        p_p, _ = self._flat(batch, "pred_p")
        p_o, _ = self._flat(batch, "pred_o")
        emit(p_s, p_p, p_o, False, 2)
        return pa.concat_tables(parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.encoded:
            return self._call_encoded(batch)
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


def decode_triples(canonical_ds, kb):
    """Decode a canonicalized ENCODED triple Dataset back to URI/literal
    strings: (subj, pred, obj, graph, belief, n_docs).  Runs over the
    small canonical result, not the emitted stream."""
    index = resolve_kb(kb)
    uri_arr = pa.array(index.uris, pa.string())
    lit_arr = pa.array(index.literal_strings, pa.string())
    graph_arr = pa.array(GRAPHS, pa.string())

    def decode(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int32())
        # clamp the inactive branch's index to 0 — take() is eager, and a
        # URI index can exceed the literal dictionary's length (and vice
        # versa)
        o_lit_idx = pc.if_else(t["o_is_lit"], t["o"], zero)
        o_uri_idx = pc.if_else(t["o_is_lit"], zero, t["o"])
        obj = pc.if_else(
            t["o_is_lit"], pc.take(lit_arr, o_lit_idx), pc.take(uri_arr, o_uri_idx)
        )
        return pa.table(
            {
                "subj": pc.take(uri_arr, t["s"]),
                "pred": pc.take(uri_arr, t["p"]),
                "obj": obj,
                "graph": pc.take(graph_arr, pc.cast(t["g"], pa.int32())),
                "belief": pa.nulls(len(t), pa.float64()).fill_null(1.0),
                "n_docs": t["n_docs"],
            }
        )

    return canonical_ds.map_batches(decode, batch_format="pyarrow")

"""Flat, oracle-comparable views over the KG pipeline stages.

Each function takes ``sf_dir`` and returns a Ray Dataset (or small Arrow
table) whose columns exactly match the corresponding entry in
``scoobie_ray.oracle.ORACLES`` — the driver hashes both sides.

The doc corpus / KB here are the deterministic TPC-H derivations of
``sources.fixtures``; the pipeline machinery they drive is the production
one (broadcast KB bundle, actor-pool stages, streaming batches).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..util import autoscale_concurrency

from ..kb.bundle import KBBundle
from ..sources.docs import flatten_spans_table
from ..sources.fixtures import kg_docs_table, kg_kb
from ..stages.link import Linker
from ..stages.spot import Spotter
from .extract import annotate_docs, extract_triples
from .canonicalize import canonicalize


def _docs_ds(sf_dir: str):
    import ray.data

    return ray.data.from_arrow(kg_docs_table(sf_dir))


def _explode_mentions(lits: pa.Array):
    """Vectorized mention explode: one output row per (doc, mention),
    literal indexes decoded against the KB dictionary via ``pc.take`` —
    no per-row Python."""

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        parent = pc.list_parent_indices(t["mention_start"])
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], parent),
                "m_start": pc.cast(pc.list_flatten(t["mention_start"]), pa.int64()),
                "m_end": pc.cast(pc.list_flatten(t["mention_end"]), pa.int64()),
                "literal": pc.take(lits, pc.list_flatten(t["mention_literal"])),
            }
        )

    return explode


def _explode_distinct_subjects(uris: pa.Array, col: str):
    """Vectorized per-doc DISTINCT subject explode (Arrow group_by on
    (row, subject) pairs replaces the per-row sorted(set()) loop; the
    oracle hash is order-insensitive)."""

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        parent = pc.list_parent_indices(t[col])
        flat = pc.list_flatten(t[col])
        pairs = (
            pa.table({"p": parent, "s": flat}).group_by(["p", "s"]).aggregate([])
        )
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], pairs["p"]),
                "subj": pc.take(uris, pairs["s"]),
            }
        )

    return explode


def _kb_and_ref(sf_dir: str):
    import ray

    kb = kg_kb(sf_dir)
    return kb, ray.put(kb.tables())


def kg_spot(sf_dir: str):
    kb, kb_ref = _kb_and_ref(sf_dir)

    spotted = _docs_ds(sf_dir).map_batches(
        Spotter,
        fn_constructor_kwargs={"kb": kb_ref},
        batch_format="pyarrow",
        concurrency=autoscale_concurrency(cap=8),
    )
    return spotted.map_batches(
        _explode_mentions(kb.literals["literal"].combine_chunks()),
        batch_format="pyarrow",
    )


def kg_spot_ci(sf_dir: str):
    """Case-INSENSITIVE spotting over a case-mangled nation corpus
    (lowercased label surfaces): exercises the IGNORECASE automaton and
    the case-preference filter (no exact-case literal matches, so every
    case-variant KB literal is reported — here exactly one per span)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from ..sources.docs import DOC_SCHEMA
    from ..stages.spot import SpotConfig

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rname = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    rows = []
    for k, name, rk in zip(*[nation[c].to_pylist() for c in nation.column_names]):
        text = name.lower() + " is a nation in " + rname[rk].lower() + "."
        rows.append(
            {
                "doc_id": "ci-nation-%d" % k,
                "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            }
        )
    docs = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=DOC_SCHEMA))

    kb = kg_kb(sf_dir)
    kb_ref = ray.put(kb.tables())
    spotted = docs.map_batches(
        Spotter,
        fn_constructor_kwargs={"kb": kb_ref, "config": SpotConfig(case_sensitive=False)},
        batch_format="pyarrow",
        concurrency=autoscale_concurrency(cap=8),
    )
    return spotted.map_batches(
        _explode_mentions(kb.literals["literal"].combine_chunks()),
        batch_format="pyarrow",
    )


def kg_candidates(sf_dir: str):
    kb, kb_ref = _kb_and_ref(sf_dir)

    ds = _docs_ds(sf_dir).map_batches(
        Spotter, fn_constructor_kwargs={"kb": kb_ref}, batch_format="pyarrow",
        concurrency=autoscale_concurrency(cap=8),
    ).map_batches(
        Linker, fn_constructor_kwargs={"kb": kb_ref}, batch_format="pyarrow",
        concurrency=autoscale_concurrency(cap=8),
    )
    return ds.map_batches(
        _explode_distinct_subjects(kb.resources["uri"].combine_chunks(), "cand_subj"),
        batch_format="pyarrow",
    )


def _annotated(sf_dir: str):
    kb, kb_ref = _kb_and_ref(sf_dir)
    return annotate_docs(_docs_ds(sf_dir), kb_ref, concurrency=autoscale_concurrency(cap=8)), kb


def kg_resolved(sf_dir: str):
    ds, kb = _annotated(sf_dir)
    return ds.map_batches(
        _explode_distinct_subjects(
            kb.resources["uri"].combine_chunks(), "resolved_subj"
        ),
        batch_format="pyarrow",
    )


def _explode_triple_lists(ds, uris: pa.Array, s_col, p_col, o_col):
    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        parent = pc.list_parent_indices(t[s_col])
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], parent),
                "subj": pc.take(uris, pc.list_flatten(t[s_col])),
                "pred": pc.take(uris, pc.list_flatten(t[p_col])),
                "obj": pc.take(uris, pc.list_flatten(t[o_col])),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def kg_known(sf_dir: str):
    ds, kb = _annotated(sf_dir)
    uris = kb.resources["uri"].combine_chunks()
    return _explode_triple_lists(ds, uris, "known_s", "known_p", "known_o")


def kg_predicted(sf_dir: str):
    ds, kb = _annotated(sf_dir)
    uris = kb.resources["uri"].combine_chunks()
    return _explode_triple_lists(ds, uris, "pred_s", "pred_p", "pred_o")


def kg_triples(sf_dir: str, concurrency=None):
    from ..stages.serialize import decode_triples

    kb, kb_ref = _kb_and_ref(sf_dir)
    if concurrency is None:
        concurrency = autoscale_concurrency(cap=8)
    triples = extract_triples(
        _docs_ds(sf_dir), kb_ref, concurrency=concurrency, encoded=True
    )
    canon = canonicalize(triples)
    return decode_triples(canon, kb_ref).drop_columns(["belief", "n_docs"])


def kg_candidates_scoped(sf_dir: str):
    """Candidates under a TEMPLATE-INFERRED scope: the filter starts from
    the single object property ont:operatesIn and ``TemplateFilter.infer``
    expands it (markov-chain domain/range clusters -> {Supplier, Nation},
    proper-noun-rated datatype properties -> {rdfs:label}); only subjects
    typed in the inferred clusters survive linking.  The expansion itself
    is pytest-gated (test_stages_extended.test_template_infer_expands);
    the oracle mirrors the RESULTING scope in SQL."""
    from ..kb.bundle import KBIndex
    from ..sources.fixtures import P_OPERATES_IN
    from ..stages.template import TemplateFilter

    kb, kb_ref = _kb_and_ref(sf_dir)
    tpl = TemplateFilter(object_properties=[P_OPERATES_IN]).infer(KBIndex(kb))

    ds = _docs_ds(sf_dir).map_batches(
        Spotter,
        fn_constructor_kwargs={"kb": kb_ref, "template": tpl},
        batch_format="pyarrow",
        concurrency=autoscale_concurrency(cap=8),
    ).map_batches(
        Linker,
        fn_constructor_kwargs={"kb": kb_ref, "template": tpl},
        batch_format="pyarrow",
        concurrency=autoscale_concurrency(cap=8),
    )

    return ds.map_batches(
        _explode_distinct_subjects(kb.resources["uri"].combine_chunks(), "cand_subj"),
        batch_format="pyarrow",
    )


def kg_spans(sf_dir: str):
    """Spans of the *pipeline output* rows — proves the per-row
    span-sequence invariant end-to-end, flattened for hashing."""
    ds, _kb = _annotated(sf_dir)

    def flat(t: pa.Table) -> pa.Table:
        out = flatten_spans_table(t)
        return out.rename_columns(
            ["doc_id", "span_idx", "kind", "text", "media_ref", "span_offset"]
        )

    return ds.select_columns(["doc_id", "spans"]).map_batches(
        flat, batch_format="pyarrow"
    )


def kb_coverage(sf_dir: str) -> pa.Table:
    """Integer-exact coverage/ambiguity stats per (type, datatype
    property) — the kb/stats layer's oracle surface (counts, not float
    ratios, so the hash compare is portable)."""
    from ..kb.stats import coverage_ambiguity_counts

    kb = kg_kb(sf_dir)
    c = coverage_ambiguity_counts(kb)
    uri_of = dict(
        zip(
            pc.cast(kb.resources["index"], pa.int64()).to_pylist(),
            kb.resources["uri"].to_pylist(),
        )
    )
    return pa.table(
        {
            "type_uri": pa.array(
                [uri_of[t] for t in c["type"].to_pylist()], pa.string()
            ),
            "pred_uri": pa.array(
                [uri_of[p] for p in c["predicate"].to_pylist()], pa.string()
            ),
            "covered": c["covered"],
            "instances": c["instances"],
            "amb_sum": c["amb_sum"],
            "amb_n": c["amb_n"],
        }
    )


def kb_docfreq(sf_dir: str):
    """Document frequency per KB literal (the Lucene-DF stand-in),
    computed DISTRIBUTED: spot every doc against the broadcast KB, count
    distinct docs per literal.  Oracle = count per literal over the same
    SPOT re-derivation the kg_spot hash gate rides on."""
    from ..kb.stats import document_frequency

    kb, kb_ref = _kb_and_ref(sf_dir)
    t = document_frequency(
        _docs_ds(sf_dir), kb_ref, concurrency=autoscale_concurrency(cap=8)
    )
    lits = kb.literals["literal"].to_pylist()
    return pa.table(
        {
            "literal": pa.array(
                [lits[i] for i in t["literal"].to_pylist()], pa.string()
            ),
            "df": pc.cast(t["df"], pa.int64()),
        }
    )


def kb_property_kinds(sf_dir: str) -> pa.Table:
    """Per-predicate kind (datatype | object | both) —
    PostgresKB.getPropertyType over the fixture KB."""
    from ..kb.stats import property_kinds

    kb = kg_kb(sf_dir)
    t = property_kinds(kb)
    uri_of = dict(
        zip(
            pc.cast(kb.resources["index"], pa.int64()).to_pylist(),
            kb.resources["uri"].to_pylist(),
        )
    )
    return pa.table(
        {
            "pred_uri": pa.array(
                [uri_of[p] for p in t["predicate"].to_pylist()], pa.string()
            ),
            "kind": t["kind"],
        }
    )


def kb_regex_dist(sf_dir: str) -> pa.Table:
    """Regex-distribution counts per (pattern, datatype property) —
    calculateRegexDistributions' gate surface in integer-exact form."""
    from ..kb.stats import regex_match_counts
    from ..stages.regex_recognize import DEFAULT_PATTERNS

    kb = kg_kb(sf_dir)
    pats = {k: DEFAULT_PATTERNS[k] for k in ("DATE", "FLOAT", "MAIL", "INTEGER")}
    t = regex_match_counts(kb, pats)
    uri_of = dict(
        zip(
            pc.cast(kb.resources["index"], pa.int64()).to_pylist(),
            kb.resources["uri"].to_pylist(),
        )
    )
    return pa.table(
        {
            "regex_name": t["regex_name"],
            "pred_uri": pa.array(
                [uri_of[p] for p in t["predicate"].to_pylist()], pa.string()
            ),
            "n_match": t["n_match"],
            "n_total": t["n_total"],
        }
    )


def kb_resources(sf_dir: str) -> pa.Table:
    kb = kg_kb(sf_dir)
    return pa.table(
        {"idx": pc.cast(kb.resources["index"], pa.int64()), "uri": kb.resources["uri"]}
    )


def kb_cardinalities(sf_dir: str) -> pa.Table:
    kb = kg_kb(sf_dir)
    uris = kb.resources["uri"].to_pylist()
    card = kb.cardinalities
    return pa.table(
        {
            "predicate": pa.array(
                [uris[p] for p in card["predicate"].to_pylist()], pa.string()
            ),
            "n_triples": card["n_triples"],
            "n_subjects": card["n_subjects"],
            "n_objects": card["n_objects"],
        }
    )


def kb_markov(sf_dir: str) -> pa.Table:
    kb = kg_kb(sf_dir)
    uris = kb.resources["uri"].to_pylist()
    mk = kb.markov
    return pa.table(
        {
            "cluster_s": pa.array([uris[c] for c in mk["cluster_s"].to_pylist()]),
            "predicate": pa.array([uris[p] for p in mk["predicate"].to_pylist()]),
            "cluster_o": pa.array([uris[c] for c in mk["cluster_o"].to_pylist()]),
            "prob": mk["prob"],
        }
    )

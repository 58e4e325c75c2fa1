"""KB bundle construction as a Ray Data job — the scale path.

``kb/build.py`` builds the bundle driver-side (a KB is the broadcast small
side by design).  For triple dumps past single-node memory this module
runs the same dictionary encoding as Dataset operations
(preprocessRdfData semantics, PostgresKB.java:893-1077):

1. parse + clean the N-Triples text with ``map_batches``
   (RDFTripleParser filters, kb/parser.py);
2. build the URI / literal dictionaries via ``unique``-style groupby
   (DISTINCT union of s/p/o, :1079-1149), rank-ordered so indexes are
   deterministic and identical to the driver-side build;
3. int-encode triples by broadcast-dictionary lookup (:1151-1175);
4. derive the statistics tables with the driver-side code over the (much
   smaller) encoded tables.

The dictionaries themselves are materialized (they must fit the driver to
be broadcast at extraction time anyway); the triple stream is processed
as a Dataset end to end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kb.build import build_kb_from_triples
from ..kb.bundle import KBBundle
from ..kb.parser import clean_triples, parse_ntriples_lines


def parse_ntriples_dataset(text_ds):
    """Dataset of N-Triples lines -> cleaned (s, p, o, o_is_literal) rows."""

    def parse(batch: pa.Table) -> pa.Table:
        col = "text" if "text" in batch.column_names else batch.column_names[0]
        return clean_triples(parse_ntriples_lines(batch[col].to_pylist()))

    return text_ds.map_batches(parse, batch_format="pyarrow")


def build_kb_job(triples_ds, cluster_types: bool = True) -> KBBundle:
    """Dataset of cleaned triple rows -> KBBundle.

    Distributed steps: per-batch distinct + global unions for the
    dictionaries (the wide ops); the final stats derivation runs on the
    encoded columns driver-side (they are small by construction).
    """

    def distinct_parts(batch: pa.Table) -> pa.Table:
        lit_mask = batch["o_is_literal"]
        uris = pa.concat_arrays(
            [
                batch["s"].combine_chunks(),
                batch["p"].combine_chunks(),
                batch.filter(pc.invert(lit_mask))["o"].combine_chunks(),
            ]
        )
        lits = batch.filter(lit_mask)["o"].combine_chunks()
        vals = pa.concat_arrays([uris, lits])
        kinds = pa.concat_arrays(
            [
                pa.array(["uri"] * len(uris), pa.string()),
                pa.array(["literal"] * len(lits), pa.string()),
            ]
        )
        t = pa.table({"value": vals, "kind": kinds})
        return t.group_by(["value", "kind"]).aggregate([])

    # global distinct via groupby (the dictionary build shuffle)
    from ray.data.aggregate import Count

    distinct = (
        triples_ds.map_batches(distinct_parts, batch_format="pyarrow")
        .groupby(["value", "kind"])
        .aggregate(Count(alias_name="_n"))
    )
    dict_table = pa.concat_tables(
        [b for b in distinct.to_arrow_refs_resolved()]
        if hasattr(distinct, "to_arrow_refs_resolved")
        else [_resolve(r) for r in distinct.to_arrow_refs()]
    )

    # re-assemble a triples table driver-side for encoding + stats: the
    # encoded KB must fit the driver to be broadcast later regardless
    full = pa.concat_tables(
        [_resolve(r) for r in triples_ds.to_arrow_refs()]
    )
    bundle = build_kb_from_triples(full, cluster_types=cluster_types)

    # sanity: the distributed dictionary matches the driver-side one
    uris = dict_table.filter(pc.equal(dict_table["kind"], "uri"))["value"]
    assert len(pc.unique(uris.combine_chunks())) == len(bundle.resources)
    return bundle


def _resolve(ref):
    import ray

    return ray.get(ref)

"""Triple canonicalization — corpus-wide dedup/merge of emitted triples.

The reference gets DISTINCT semantics from SQL inserts
(PostgresKB.java:1164-1175); at 10^12-document scale the same operation is
an all-to-all shuffle keyed on (subj, pred, obj, graph) — and head entities
(a country URI appears in millions of documents) make that key badly
skewed.  Two-phase design per SURVEY.md §7.3:

1. **local combine** — inside ``map_batches``, collapse each block to one
   row per distinct (subj, pred, obj, graph) carrying partial counts and
   max belief.  This is the combiner that defuses head-entity skew: a hub
   triple occupies one row per block regardless of how many documents in
   the block emitted it, so the subsequent shuffle moves pre-aggregated
   rows, not per-document rows.
2. **global groupby** — ``groupby([subj, pred, obj, graph])`` over the
   combined rows, summing doc counts and maxing belief.

Because phase 1 already collapsed duplicates, the global shuffle's skew is
bounded by (#blocks containing the triple), the classic salted/pre-agg
pattern; no explicit salt column is needed on top.
"""

from __future__ import annotations

import pyarrow as pa

KEY = ["subj", "pred", "obj", "graph"]


def _local_combine(batch: pa.Table) -> pa.Table:
    g = batch.group_by(KEY).aggregate([("belief", "max"), ("doc_id", "count")])
    return g.rename_columns(KEY + ["belief", "n_docs"])


def canonicalize(triples_ds):
    """triples Dataset -> canonical Dataset
    (subj, pred, obj, graph, belief, n_docs)."""
    from ray.data.aggregate import Max, Sum

    combined = triples_ds.map_batches(
        _local_combine, batch_format="pyarrow", zero_copy_batch=True
    )
    out = combined.groupby(KEY).aggregate(
        Max("belief", alias_name="belief"),
        Sum("n_docs", alias_name="n_docs"),
    )
    return out

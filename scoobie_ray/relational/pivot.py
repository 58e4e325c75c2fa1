"""Pivot / crosstab — per-key category-count matrix.

SQL ``SELECT key, COUNT(*) FILTER (cat = c1) AS n_c1, ... GROUP BY key``
as a Ray-native two-pass operator:

1. a cheap distinct pass discovers the category vocabulary (pivots are
   only meaningful for SMALL vocabularies — the output schema is one
   column per category);
2. a ``map_batches`` combiner turns each batch into per-key partial
   count rows (one int64 indicator-sum column per category, built with a
   single vectorized Arrow group_by), and ONE ``groupby(key).sum`` over
   all category columns finishes — partial counts are the only thing
   shuffled.

Column names are ``n_<category>`` in sorted category order, so results
are deterministic and oracle-hashable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pivot_counts(ds, *, key_col: str, cat_col: str):
    """Per-key count of each category value; returns a Dataset with
    columns ``[key_col, n_<cat>...]`` (categories sorted, int64)."""
    cats = sorted(
        {
            c
            for b in ds.select_columns([cat_col])
            .map_batches(
                lambda t: pa.table({cat_col: pc.unique(t[cat_col].combine_chunks())}),
                batch_format="pyarrow",
            )
            .iter_batches(batch_format="pyarrow")
            for c in b[cat_col].to_pylist()
        }
    )
    cat_to_idx = {c: i for i, c in enumerate(cats)}

    def local(batch: pa.Table) -> pa.Table:
        key = batch[key_col].combine_chunks()
        code = pc.index_in(
            batch[cat_col].combine_chunks(), pa.array(cats, pa.string())
        ).to_numpy(zero_copy_only=False)
        agg = (
            pa.table({"k": key, "c": pa.array(code, pa.int64())})
            .group_by(["k", "c"])
            .aggregate([([], "count_all")])
        )
        k = agg["k"]
        c = agg["c"].to_numpy(zero_copy_only=False)
        n = agg["count_all"].to_numpy(zero_copy_only=False)
        cols = {key_col: k}
        for name, i in cat_to_idx.items():
            cols[f"n_{name}"] = pa.array(
                np.where(c == i, n, 0).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    out = ds.map_batches(local, batch_format="pyarrow").groupby(key_col).sum(
        [f"n_{c}" for c in cats]
    )
    return out.map_batches(
        lambda t: t.rename_columns([key_col, *[f"n_{c}" for c in cats]]),
        batch_format="pyarrow",
    )

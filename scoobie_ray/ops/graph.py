"""Graph operators — distributed connected components as a public op.

Ray Data has no graph primitives; this exposes the engine's iterative
hash-min label-propagation connected components (built for duplicate-
cluster resolution, :func:`scoobie_ray.ops.dedup._cc_labels`) as a
first-class operator over an arbitrary edge Dataset.

Scale shape: per round, TWO hash-partition shuffles of (node, label)
rows — co-partitioned edge/label join via one searchsorted, then a
per-node min — with pointer-jumping shortcut edges so chains converge
in O(log diameter) rounds.  Neither the edge set nor the label table
ever reaches the driver; convergence is detected by a Ray ``sum``
aggregate over per-node changed flags.  Node ids may be int64 or
string (hash-partitioned either way).

Only nodes incident to at least one edge are labelled (isolated nodes
carry no edges to propagate over); union a self-loop per node if you
need every node in the output.
"""

from __future__ import annotations

import pyarrow as pa


def connected_components(edges_ds, *, src_col: str = "src", dst_col: str = "dst"):
    """Label every edge-incident node with its component id (the
    component's minimum node id).  Returns a Dataset (node, component).
    Undirected semantics: each input edge connects both endpoints.
    """
    from scoobie_ray.ops.dedup import _cc_labels

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"a": t[src_col], "b": t[dst_col]})

    labels = _cc_labels(edges_ds.map_batches(to_pairs, batch_format="pyarrow"))
    return labels.map_batches(
        lambda t: pa.table({"node": t["n"], "component": t["l"]}),
        batch_format="pyarrow",
    )

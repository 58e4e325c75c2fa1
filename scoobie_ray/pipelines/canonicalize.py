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
KEY_ENCODED = ["s", "p", "o", "o_is_lit", "g"]


def _keys_of(batch: pa.Table) -> list[str]:
    return KEY_ENCODED if "s" in batch.column_names else KEY


def _local_combine(batch: pa.Table) -> pa.Table:
    from ..util import limit_worker_threads

    limit_worker_threads(1)
    keys = _keys_of(batch)
    if keys is KEY_ENCODED:
        g = batch.group_by(keys).aggregate([("s", "count")])
        return g.rename_columns(keys + ["n_docs"])
    g = batch.group_by(keys).aggregate([("belief", "max"), ("doc_id", "count")])
    return g.rename_columns(keys + ["belief", "n_docs"])


def _combine2(batch: pa.Table) -> pa.Table:
    from ..util import limit_worker_threads

    limit_worker_threads(1)
    keys = _keys_of(batch)
    if keys is KEY_ENCODED:
        g = batch.group_by(keys).aggregate([("n_docs", "sum")])
        return g.rename_columns(keys + ["n_docs"])
    g = batch.group_by(keys).aggregate([("belief", "max"), ("n_docs", "sum")])
    return g.rename_columns(keys + ["belief", "n_docs"])


def canonicalize(
    triples_ds,
    num_partitions: int | None = None,
    strategy: str = "tree",
    tree_fan_in: int = 8,
    tree_root_limit: int = 5_000_000,
    salt_buckets: int = 0,
):
    """triples Dataset -> canonical Dataset
    (subj, pred, obj, graph, belief, n_docs).

    strategy="tree" (default): associative tree-combine — per-block local
    dedup, then repeated ``repartition(n // fan_in)`` + re-combine until one
    block holds the global distinct set.  Map-only (no key shuffle): each
    level moves only already-deduped rows, so a triple occupies one row per
    surviving block regardless of how many documents emitted it.  Valid
    while the distinct canonical set fits a single task (guarded by
    ``tree_root_limit``); at 10^12-doc scale with billions of distinct
    triples the guard falls back to…

    strategy="groupby": the general path — combine, then an explicitly
    partitioned hash/sort groupby on (subj, pred, obj, graph).
    ``num_partitions`` should scale with cluster size, not block count
    (Ray's aggregate cost grows with both input block count and partition
    count).
    """
    from ray.data.aggregate import Max, Sum

    combined = triples_ds.map_batches(
        _local_combine, batch_format="pyarrow", zero_copy_batch=True
    )

    if strategy == "tree":
        level = combined.materialize()
        # one parallel intermediate level (only if wide), then the root —
        # every materialize is a driver barrier, so keep the tree shallow
        if level.num_blocks() > 2 * tree_fan_in:
            level = (
                level.repartition(tree_fan_in)
                .map_batches(
                    _combine2,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=None,  # whole coalesced block per batch
                )
                .materialize()
            )
        if level.count() > tree_root_limit:
            # distinct set too large for a single root task — finish with
            # the shuffling groupby on the already-shrunk rows
            return _groupby_finish(level, num_partitions, salt_buckets)
        if level.num_blocks() > 1:
            level = level.repartition(1).map_batches(
                _combine2,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        return level

    return _groupby_finish(combined, num_partitions, salt_buckets)


def _groupby_finish(
    combined_ds, num_partitions: int | None, salt_buckets: int = 0
):
    """Global merge of already-combined rows via partitioned groupby.

    ``salt_buckets > 0`` adds an explicit two-phase salted aggregation for
    pathologically hot keys: phase 1 groups on (salt = hash(subj) %% S,
    key...) so one hot triple spreads over S partitions; phase 2 groups on
    the bare key over the S-fold-smaller result.  With the per-block
    combiner already collapsing duplicates, salting only pays when a
    single canonical key still dominates whole partitions.
    """
    from ray.data.aggregate import Max, Sum

    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, min(64, cpus // 2))
    schema_names = combined_ds.schema().names
    keys = KEY_ENCODED if "s" in schema_names else KEY

    if salt_buckets > 0:
        def add_salt(t: pa.Table) -> pa.Table:
            import numpy as np

            if "s" in t.column_names:
                basis = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                basis = np.fromiter(
                    (hash(x) for x in t["subj"].to_pylist()),
                    dtype=np.int64,
                    count=len(t),
                )
            salt = (basis % salt_buckets).astype(np.int64)
            return t.append_column("_salt", pa.array(salt, pa.int64()))

        salted = combined_ds.map_batches(add_salt, batch_format="pyarrow")
        if keys is KEY_ENCODED:
            phase1 = salted.groupby(
                ["_salt"] + keys, num_partitions=num_partitions
            ).aggregate(Sum("n_docs", alias_name="n_docs"))
        else:
            phase1 = salted.groupby(
                ["_salt"] + keys, num_partitions=num_partitions
            ).aggregate(
                Max("belief", alias_name="belief"),
                Sum("n_docs", alias_name="n_docs"),
            )
        combined_ds = phase1.drop_columns(["_salt"])

    if keys is KEY_ENCODED:
        return combined_ds.groupby(keys, num_partitions=num_partitions).aggregate(
            Sum("n_docs", alias_name="n_docs")
        )
    return combined_ds.groupby(keys, num_partitions=num_partitions).aggregate(
        Max("belief", alias_name="belief"),
        Sum("n_docs", alias_name="n_docs"),
    )

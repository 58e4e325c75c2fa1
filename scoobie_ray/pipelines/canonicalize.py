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
    dedup, then repeated ``repartition(n // fan_in)`` + re-combine until
    one block holds the global distinct set.  Map-only (no key shuffle):
    it pipelines behind the streaming extract (r2: 11.3 s e2e vs 17.8 s
    for the shuffle path, whose range-sampling barrier cannot overlap the
    producer).  Valid while the distinct canonical set fits a single root
    task (guarded by ``tree_root_limit``); past the guard it falls back
    to…

    strategy="groupby": the cluster-scale shape — per-block combine, then
    explicit hash partitioning on the key + one vectorized Arrow
    ``group_by`` per partition (see :func:`_groupby_finish`; rewritten in
    r2 from Ray's row-accumulating aggregate, 80 s → 3.6 s on the 7M-row
    profile).  No single-task root; partition count scales with the
    cluster.
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
    """Global merge of already-combined rows: explicit hash partitioning
    on the (mixed) key columns + ONE vectorized Arrow ``group_by`` per
    partition.

    Ray's built-in ``groupby().aggregate`` accumulates row-wise and ran
    ~80 s on 7M combined rows at 32 cpus (sort- and hash-shuffle alike,
    r2 measurement); this formulation — a single-int-key shuffle followed
    by ``pyarrow`` aggregation inside ``map_groups`` — does the identical
    merge in ~3 s and is the shape that holds on a cluster: partition
    count scales with cluster size, per-partition work is one Arrow
    kernel, and key skew is pre-bounded by the per-block combiner (a hot
    canonical key contributes at most one row per upstream block).
    ``salt_buckets`` is retained for signature compatibility; full-key
    hash partitioning already spreads the load it was for.
    """
    import numpy as np

    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, min(256, cpus))
    schema_names = combined_ds.schema().names
    encoded = "s" in schema_names
    keys = KEY_ENCODED if encoded else KEY
    P = np.uint64(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        if encoded:
            s = t["s"].to_numpy(zero_copy_only=False).astype(np.uint64)
            p = t["p"].to_numpy(zero_copy_only=False).astype(np.uint64)
            o = t["o"].to_numpy(zero_copy_only=False).astype(np.uint64)
            x = (
                (s * np.uint64(0x9E3779B97F4A7C15))
                ^ (p * np.uint64(0xBF58476D1CE4E5B9))
                ^ (o * np.uint64(0x94D049BB133111EB))
            )
        else:
            from ..util import hash_string_array_u64

            # Arrow-native vectorized string hash — the buffers are viewed
            # directly; no to_pylist / per-row Python on the fallback path
            x = hash_string_array_u64(t["subj"])
        return t.append_column("_part", pa.array((x % P).astype(np.int64)))

    if encoded:

        def agg_part(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate([("n_docs", "sum")])
            return out.rename_columns(keys + ["n_docs"])

    else:

        def agg_part(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate(
                [("belief", "max"), ("n_docs", "sum")]
            )
            return out.rename_columns(keys + ["belief", "n_docs"])

    return (
        combined_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda t: agg_part(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )

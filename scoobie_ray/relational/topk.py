"""Per-key top-N — grouped top-k without a per-group UDF.

For every key, keep the N rows with the highest ``val`` (ties broken by
``id`` asc), emitting ``(key, id, rnk)`` with ``rnk`` the 1-based rank —
SQL ``row_number() OVER (PARTITION BY key ORDER BY val DESC, id ASC)
<= N``.

Scale shape: a per-batch LOCAL top-N combiner first (each input block
keeps at most N rows per key it sees — at most N x keys_in_batch rows
enter the shuffle, and for the common "few hot keys per block" case this
prunes almost everything), then ONE hash-partition shuffle
(``groupby(_part)``, P partitions — never a group per key) and a
per-partition global top-N.  Both passes share one vectorized kernel:
lexsort by (key, -val, id), locate key boundaries, rank = position −
first-position-of-key (``np.repeat`` over run lengths), keep rank < N.
No per-key or per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scoobie_ray.ops.dedup import _splitmix64


def _topn_kernel(key, val, ids, n):
    """Indices of the per-key top-n rows and their 1-based ranks."""
    order = np.lexsort((ids, -val, key))
    k_s = key[order]
    new_key = np.concatenate(([True], k_s[1:] != k_s[:-1]))
    starts = np.flatnonzero(new_key)
    counts = np.diff(np.append(starts, len(k_s)))
    rank = np.arange(len(k_s), dtype=np.int64) - np.repeat(starts, counts)
    keep = rank < n
    return order[keep], (rank[keep] + 1)


def per_key_topn(
    ds,
    *,
    key_col: str,
    val_col: str,
    id_col: str,
    n: int,
    num_partitions: int = 32,
):
    """Grouped top-n; returns ``[key_col, id_col, rnk]`` (all int64)."""

    def local(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        val = pc.cast(batch[val_col], pa.float64()).to_numpy(zero_copy_only=False)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        idx, _ = _topn_kernel(key, val, ids, n)  # local prune only
        part = _splitmix64(key[idx].astype(np.uint64)) % np.uint64(num_partitions)
        return pa.table(
            {
                key_col: pa.array(key[idx], pa.int64()),
                "_val": pa.array(val[idx], pa.float64()),
                id_col: pa.array(ids[idx], pa.int64()),
                "_part": pa.array(part.astype(np.int64), pa.int64()),
            }
        )

    out_cols = [key_col, id_col, "rnk"]

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in out_cols})
        key = part[key_col].to_numpy()
        idx, rnk = _topn_kernel(key, part["_val"].to_numpy(), part[id_col].to_numpy(), n)
        out = pd.DataFrame(
            {
                key_col: key[idx],
                id_col: part[id_col].to_numpy()[idx],
                "rnk": rnk,
            }
        )
        return out

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )

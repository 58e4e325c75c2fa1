"""Backward as-of join — a custom operator Ray Data lacks natively.

For each left row ``(key, ts)``, find the right row with the same key and
the greatest right-ts ``<=`` left-ts (``<`` when ``strict``) and emit the
matched right timestamp (``-1`` when no match) — the classic
"latest-state-at-event-time" join (events → last order, conversion →
last touchpoint).

Scale shape (prompt's custom-operator option (a): composition of
``map_batches`` + ``groupby().map_groups``):

- both sides are tagged and hash-partitioned by key in ONE shuffle
  (``groupby(_part)``) — P partitions, P = ``num_partitions``, never one
  group per key (the repo's known per-group-Python trap);
- each partition runs a single vectorized ``pandas.merge_asof``
  (C-implemented backward search with ``by=`` grouping) over its left and
  right slices — no per-row or per-key Python;
- only ``(key, ts, int64 carry columns)`` ride the shuffle; payloads
  should be re-attached afterwards by key if needed.

Partitioning assumption: all right rows of a key must co-locate with its
left rows, so a single pathologically hot key bounds one partition's
size (same assumption as any keyed join; salt-and-broadcast the right
segment if a key's right side outgrows a worker).

The matched VALUE (right ts) is emitted rather than an arbitrary right
row id, so output is deterministic even when several right rows tie on
(key, ts) — which keeps the DuckDB ``ASOF JOIN`` oracles hash-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scoobie_ray.ops.dedup import _splitmix64


def _prep(ds, key_col, ts_col, carry: list[str], side: int, num_partitions: int):
    """Tag one side: normalized schema (_key, _ts int64-us, carry...,
    _side, _part) so the two sides union cleanly into one shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        ts = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            "_key": pa.array(key, pa.int64()),
            "_ts": pa.array(ts, pa.int64()),
        }
        for c in carry:
            cols[c] = (
                pc.cast(batch[c], pa.int64())
                if side == 0
                else pa.array(np.full(len(key), -1, dtype=np.int64), pa.int64())
            )
        cols["_side"] = pa.array(np.full(len(key), side, dtype=np.int8), pa.int8())
        part = _splitmix64(key.astype(np.uint64)) % np.uint64(num_partitions)
        cols["_part"] = pa.array(part.astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    carry: list[str],
    strict: bool = False,
    num_partitions: int = 32,
):
    """Backward as-of join; returns ``carry + [left_key as _key, _ts,
    asof_ts]`` with ``asof_ts = -1`` for unmatched left rows.

    ``carry`` columns must be int64-castable (ids); timestamps may be
    Arrow ``timestamp[us]`` or int64 and are compared as int64
    microseconds.
    """
    lt = _prep(left_ds, left_key, left_ts, carry, 0, num_partitions)
    rt = _prep(right_ds, right_key, right_ts, carry, 1, num_partitions)

    out_cols = ["_key", "_ts", *carry, "asof_ts"]

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        left = part[part["_side"] == 0]
        if not len(left):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in out_cols})
        left = left.sort_values("_ts", kind="mergesort")
        right = part[part["_side"] == 1]
        if not len(right):
            out = left[["_key", "_ts", *carry]].copy()
            out["asof_ts"] = np.int64(-1)
            return out
        right = (
            right[["_key", "_ts"]]
            .rename(columns={"_ts": "asof_ts"})
            .sort_values("asof_ts", kind="mergesort")
        )
        merged = pd.merge_asof(
            left[["_key", "_ts", *carry]],
            right,
            left_on="_ts",
            right_on="asof_ts",
            by="_key",
            direction="backward",
            allow_exact_matches=not strict,
        )
        merged["asof_ts"] = merged["asof_ts"].fillna(-1).astype(np.int64)
        return merged[out_cols]

    return lt.union(rt).groupby("_part").map_groups(merge_part, batch_format="pandas")

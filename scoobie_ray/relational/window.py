"""Streaming windowed aggregate — trailing-range window count per key.

For every row ``(key, ts)``, count the same-key rows with ``ts`` in
``[ts - window, ts]`` (SQL ``COUNT(*) OVER (PARTITION BY key ORDER BY ts
RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``) — the classic
rate/velocity feature of an event pipeline.

Scale shape (prompt's custom-operator option (a)): ONE hash-partition
shuffle by key (``groupby(_part)``, P partitions — never a group per
key), then a per-partition kernel that is pure numpy:

- sort the partition once by (key, ts);
- collapse (key, ts) to a single composite int64 — per-key local rank ×
  (partition ts-span + window + 1) + relative ts — so EVERY row's window
  start is found with one vectorized ``np.searchsorted`` against the
  composite array (no per-key loop: the repo's documented
  10k-tiny-groups Python trap);
- window count = row position − window start + 1.

The composite fits int64 while ``n_keys_in_partition × (ts_span +
window)`` < 2^63 — e.g. a 10-year span (3e14 us) allows ~30k keys per
partition; raise ``num_partitions`` for more keys, and the kernel
asserts rather than silently overflowing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scoobie_ray.ops.dedup import _splitmix64


def rolling_count(
    ds,
    *,
    key_col: str,
    ts_col: str,
    window_us: int,
    carry: list[str],
    num_partitions: int = 32,
    sum_col: str | None = None,
):
    """Trailing-range window count; returns ``carry + [key_col, w_count]``
    (plus ``w_sum`` of the int64-cast ``sum_col`` when given — the same
    two binary searches price any prefix-sum-decomposable aggregate).

    ``carry`` must be int64-castable columns; ``ts_col`` may be Arrow
    ``timestamp[us]`` or int64 microseconds.
    """

    def prep(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            key_col: pa.array(key, pa.int64()),
            "_ts": pc.cast(batch[ts_col], pa.int64()),
        }
        for c in carry:
            cols[c] = pc.cast(batch[c], pa.int64())
        if sum_col is not None:
            cols["_sv"] = pc.cast(batch[sum_col], pa.int64())
        part = _splitmix64(key.astype(np.uint64)) % np.uint64(num_partitions)
        cols["_part"] = pa.array(part.astype(np.int64), pa.int64())
        return pa.table(cols)

    out_cols = [*carry, key_col, "w_count"] + (["w_sum"] if sum_col else [])
    W = int(window_us)

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in out_cols})
        p = part.sort_values([key_col, "_ts"], kind="mergesort")
        key = p[key_col].to_numpy()
        ts = p["_ts"].to_numpy()
        new_key = np.concatenate(([True], key[1:] != key[:-1]))
        krank = np.cumsum(new_key) - 1  # local dense key rank, 0-based
        ts_rel = ts - ts.min()
        stride = int(ts_rel.max()) + W + 2
        # exact Python-int arithmetic: an np.int64 product would itself
        # wrap on exactly the inputs this guard exists to reject
        assert (int(krank[-1]) + 1) * int(stride) < 2**63, (
            "composite window key would overflow int64; raise num_partitions"
        )
        comp = krank * np.int64(stride) + ts_rel
        lo = np.searchsorted(comp, comp - np.int64(W), side="left")
        # side="right" upper bound counts ALL peer rows with an equal ts,
        # matching SQL RANGE ... CURRENT ROW semantics under ties.
        hi = np.searchsorted(comp, comp, side="right")
        out = p[[*carry, key_col]].copy()
        out["w_count"] = hi - lo
        if sum_col is not None:
            cs = np.concatenate(([0], p["_sv"].to_numpy().cumsum()))
            out["w_sum"] = cs[hi] - cs[lo]  # sum over rows [lo, hi)
        return out

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(count_part, batch_format="pandas")
    )

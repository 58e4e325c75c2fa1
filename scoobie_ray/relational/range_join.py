"""Range (interval) join — count points falling in per-row key ranges.

For every interval row ``(key, start, end)``, count the point rows with
the same key and ``start <= ts < end`` (SQL ``LEFT JOIN ... ON p.key =
i.key AND p.ts >= i.start AND p.ts < i.end GROUP BY i.*``) — the classic
attribution-window / promo-period join that Ray Data has no native
operator for.

Scale shape (prompt's custom-operator option (a)): both sides are tagged
and hash-partitioned by key in ONE shuffle (``groupby(_part)``, P
partitions — never a group per key), then a per-partition kernel that is
pure numpy:

- sort the partition's points once by (key, ts) collapsed to a composite
  int64 (key rank x span + relative ts, the ``window.py`` trick);
- every interval's count is ``searchsorted(comp, key_rank x span + end)
  - searchsorted(comp, key_rank x span + start)`` — two vectorized
  binary searches for ALL intervals at once, no per-key or per-interval
  Python;
- interval keys absent from the point side short-circuit to 0 via a
  vectorized membership probe against the partition's unique point keys.

Partitioning assumption: all points of a key co-locate with its
intervals, so one pathologically hot key bounds a single partition's
size (the standard keyed-join assumption; salt such keys upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scoobie_ray.ops.dedup import _splitmix64


def range_count_join(
    intervals_ds,
    points_ds,
    *,
    interval_key: str,
    start_col: str,
    end_col: str,
    point_key: str,
    point_ts: str,
    carry: list[str],
    num_partitions: int = 32,
):
    """Half-open range-count join; returns ``carry + [interval_key,
    n_in_range]`` with one output row per interval row.

    ``carry`` must be int64-castable columns of the interval side;
    timestamp columns may be Arrow ``timestamp[us]`` or int64 and are
    compared as int64 microseconds.
    """

    def prep_intervals(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[interval_key], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            "_key": pa.array(key, pa.int64()),
            "_start": pc.cast(batch[start_col], pa.int64()),
            "_end": pc.cast(batch[end_col], pa.int64()),
        }
        for c in carry:
            cols[c] = pc.cast(batch[c], pa.int64())
        cols["_side"] = pa.array(np.zeros(len(key), dtype=np.int8), pa.int8())
        part = _splitmix64(key.astype(np.uint64)) % np.uint64(num_partitions)
        cols["_part"] = pa.array(part.astype(np.int64), pa.int64())
        return pa.table(cols)

    def prep_points(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch[point_key], pa.int64()).to_numpy(zero_copy_only=False)
        ts = pc.cast(batch[point_ts], pa.int64())
        n = len(key)
        cols = {
            "_key": pa.array(key, pa.int64()),
            "_start": ts,  # point ts rides the interval-start slot
            "_end": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
        }
        for c in carry:
            cols[c] = pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        part = _splitmix64(key.astype(np.uint64)) % np.uint64(num_partitions)
        cols["_part"] = pa.array(part.astype(np.int64), pa.int64())
        return pa.table(cols)

    out_cols = [*carry, interval_key, "n_in_range"]

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        iv = part[part["_side"] == 0]
        if not len(iv):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in out_cols})
        out = iv[list(carry)].copy()
        out[interval_key] = iv["_key"].to_numpy()
        pts = part[part["_side"] == 1]
        if not len(pts):
            out["n_in_range"] = np.int64(0)
            return out[out_cols]
        pk = pts["_key"].to_numpy()
        pt = pts["_start"].to_numpy()
        ik = iv["_key"].to_numpy()
        istart = iv["_start"].to_numpy()
        iend = np.maximum(iv["_end"].to_numpy(), istart)  # empty range guard
        # shared relative-time frame across points and interval endpoints
        tmin = min(pt.min(), istart.min())
        span = int(max(pt.max(), iend.max()) - tmin) + 2
        uniq = np.unique(pk)
        assert len(uniq) * span < 2**63, (
            "composite range key would overflow int64; raise num_partitions"
        )
        krank = np.searchsorted(uniq, pk)
        comp = np.sort(krank * np.int64(span) + (pt - tmin))
        idx = np.searchsorted(uniq, ik)
        has_pts = (idx < len(uniq))
        idx = np.minimum(idx, len(uniq) - 1)
        has_pts &= uniq[idx] == ik
        base = idx * np.int64(span)
        lo = np.searchsorted(comp, base + (istart - tmin), side="left")
        hi = np.searchsorted(comp, base + (iend - tmin), side="left")
        out["n_in_range"] = np.where(has_pts, hi - lo, 0).astype(np.int64)
        return out[out_cols]

    iv = intervals_ds.map_batches(prep_intervals, batch_format="pyarrow")
    pt = points_ds.map_batches(prep_points, batch_format="pyarrow")
    return iv.union(pt).groupby("_part").map_groups(count_part, batch_format="pandas")

"""Unit tests for the trailing-range windowed count (relational/window.py).

The driver-facing contract (events_window vs DuckDB's RANGE window) is
gated by tools/check_correctness.py; these pin the kernel semantics —
inclusive [ts-W, ts] bound, peer-row counting under ties, partition
independence — on planted inputs.
"""

import numpy as np
import pyarrow as pa

from scoobie_ray.relational.window import rolling_count


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                c: pa.array([r[i] for r in rows], pa.int64())
                for i, c in enumerate(["k", "t", "event_id"])
            }
        )
    )


def _run(ds, window, **kw):
    out = rolling_count(
        ds, key_col="k", ts_col="t", window_us=window, carry=["event_id"], **kw
    ).to_pandas()
    return {int(e): int(c) for e, c in zip(out["event_id"], out["w_count"])}


def test_window_basic_inclusive_bound(ray_session):
    # key 1: ts 0, 5, 10, 16 with W=10 — ts=10's window [0,10] includes
    # ts=0 (inclusive bound); ts=16's window [6,16] keeps only ts=10
    got = _run(_ds([(1, 0, 0), (1, 5, 1), (1, 10, 2), (1, 16, 3)]), 10)
    assert got == {0: 1, 1: 2, 2: 3, 3: 2}


def test_window_ties_count_all_peers(ray_session):
    # SQL RANGE ... CURRENT ROW counts every peer with an equal ts, for
    # BOTH tied rows
    got = _run(_ds([(1, 10, 0), (1, 10, 1), (1, 25, 2)]), 5)
    assert got == {0: 2, 1: 2, 2: 1}


def test_window_keys_independent(ray_session):
    got = _run(_ds([(1, 10, 0), (2, 10, 1), (2, 11, 2)]), 100)
    assert got == {0: 1, 1: 1, 2: 2}


def test_window_sum_matches_naive(ray_session):
    import ray.data

    rows = [(1, 0, 0, 5), (1, 5, 1, 7), (1, 10, 2, -2), (1, 16, 3, 4)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                c: pa.array([r[i] for r in rows], pa.int64())
                for i, c in enumerate(["k", "t", "event_id", "sv"])
            }
        )
    )
    out = rolling_count(
        ds, key_col="k", ts_col="t", window_us=10, carry=["event_id"], sum_col="sv"
    ).to_pandas()
    got = {int(e): (int(c), int(s)) for e, c, s in
           zip(out["event_id"], out["w_count"], out["w_sum"])}
    # windows: [0]=({0}), [5]=({0,5}), [10]=({0,5,10}), [16]=({10,16})
    assert got == {0: (1, 5), 1: (2, 12), 2: (3, 10), 3: (2, 2)}


def test_window_composite_overflow_asserts(ray_session):
    # huge ts span x many keys in ONE partition must refuse loudly, not
    # wrap int64 silently
    import pytest

    rows = [(k, t, k * 10 + int(t > 0)) for k in range(400)
            for t in (0, 3 * 10**16)]
    with pytest.raises(Exception, match="overflow|RayTaskError"):
        _run(_ds(rows), 10, num_partitions=1)


def test_window_matches_naive_on_random(ray_session):
    rng = np.random.default_rng(11)
    k = rng.integers(0, 15, 400)
    t = rng.integers(0, 500, 400)
    W = 40
    got = _run(_ds(list(zip(k, t, range(400)))), W, num_partitions=5)
    for i, (ki, ti) in enumerate(zip(k, t)):
        want = int(np.sum((k == ki) & (t >= ti - W) & (t <= ti)))
        assert got[i] == want, (i, ki, ti)

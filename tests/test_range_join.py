"""Unit tests for the range (interval) count join (relational/range_join.py).

The driver-facing contract (events_click_window vs a DuckDB interval
LEFT JOIN) is gated by tools/check_correctness.py; these pin the kernel
semantics — half-open [start, end), keys without points, empty/inverted
ranges, partition independence — on planted inputs.
"""

import numpy as np
import pyarrow as pa

from scoobie_ray.relational.range_join import range_count_join


def _ds(rows, cols):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {c: pa.array([r[i] for r in rows], pa.int64()) for i, c in enumerate(cols)}
        )
    )


def _run(iv, pt, **kw):
    out = range_count_join(
        iv,
        pt,
        interval_key="k",
        start_col="s",
        end_col="e",
        point_key="k",
        point_ts="t",
        carry=["iid"],
        **kw,
    ).to_pandas()
    return {int(i): int(c) for i, c in zip(out["iid"], out["n_in_range"])}


def test_range_half_open(ray_session):
    iv = _ds([(1, 10, 20, 0)], ["k", "s", "e", "iid"])
    pt = _ds([(1, 10), (1, 15), (1, 20)], ["k", "t"])
    # start inclusive, end exclusive: 10 and 15 in, 20 out
    assert _run(iv, pt) == {0: 2}


def test_range_key_without_points_and_inverted(ray_session):
    iv = _ds([(1, 0, 100, 0), (2, 0, 100, 1), (1, 50, 40, 2)], ["k", "s", "e", "iid"])
    pt = _ds([(1, 5), (1, 99)], ["k", "t"])
    # key 2 has no points; interval 2 is inverted (end < start) -> 0
    assert _run(iv, pt) == {0: 2, 1: 0, 2: 0}


def test_range_matches_naive_on_random(ray_session):
    rng = np.random.default_rng(23)
    ik = rng.integers(0, 12, 150)
    s = rng.integers(0, 400, 150)
    e = s + rng.integers(0, 80, 150)
    pk = rng.integers(0, 15, 500)
    t = rng.integers(0, 500, 500)
    iv = _ds(list(zip(ik, s, e, range(150))), ["k", "s", "e", "iid"])
    pt = _ds(list(zip(pk, t)), ["k", "t"])
    got = _run(iv, pt, num_partitions=5)
    for i, (k, a, b) in enumerate(zip(ik, s, e)):
        want = int(np.sum((pk == k) & (t >= a) & (t < b)))
        assert got[i] == want, (i, k, a, b)

"""Unit tests for the backward as-of join (relational/asof.py).

The driver-facing contracts (events_last_order / events_last_touch vs
DuckDB's native ASOF JOIN) are gated by tools/check_correctness.py;
these pin the operator semantics on planted inputs.
"""

import numpy as np
import pyarrow as pa

from scoobie_ray.relational.asof import asof_join


def _ds(rows, cols):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {c: pa.array([r[i] for r in rows], pa.int64()) for i, c in enumerate(cols)}
        )
    )


def _run(left, right, **kw):
    out = asof_join(left, right, **kw).to_pandas()
    return {
        int(e): int(a) for e, a in zip(out["event_id"], out["asof_ts"])
    }


def test_asof_backward_non_strict(ray_session):
    left = _ds(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102), (3, 50, 103)],
        ["k", "t", "event_id"],
    )
    right = _ds([(1, 10), (1, 15), (2, 99)], ["k", "t"])
    got = _run(
        left,
        right,
        left_key="k",
        left_ts="t",
        right_key="k",
        right_ts="t",
        carry=["event_id"],
    )
    # t=10 matches the equal right ts; t=20 takes the later 15; key 2 has
    # only a future right row; key 3 has no right rows at all
    assert got == {100: 10, 101: 15, 102: -1, 103: -1}


def test_asof_strict_excludes_equal(ray_session):
    left = _ds([(1, 10, 100), (1, 11, 101)], ["k", "t", "event_id"])
    right = _ds([(1, 10)], ["k", "t"])
    got = _run(
        left,
        right,
        left_key="k",
        left_ts="t",
        right_key="k",
        right_ts="t",
        carry=["event_id"],
        strict=True,
    )
    assert got == {100: -1, 101: 10}


def test_asof_empty_right(ray_session):
    left = _ds([(7, 10, 100)], ["k", "t", "event_id"])
    right = _ds([], ["k", "t"])
    got = _run(
        left,
        right,
        left_key="k",
        left_ts="t",
        right_key="k",
        right_ts="t",
        carry=["event_id"],
    )
    assert got == {100: -1}


def test_asof_matches_naive_on_random(ray_session):
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 20, 300)
    lt = rng.integers(0, 1000, 300)
    rk = rng.integers(0, 25, 200)
    rt = rng.integers(0, 1000, 200)
    left = _ds(list(zip(lk, lt, range(300))), ["k", "t", "event_id"])
    right = _ds(list(zip(rk, rt)), ["k", "t"])
    for strict in (False, True):
        got = _run(
            left,
            right,
            left_key="k",
            left_ts="t",
            right_key="k",
            right_ts="t",
            carry=["event_id"],
            strict=strict,
            num_partitions=7,
        )
        for i, (k, t) in enumerate(zip(lk, lt)):
            cands = [v for ck, v in zip(rk, rt) if ck == k and (v < t if strict else v <= t)]
            assert got[i] == (max(cands) if cands else -1), (i, k, t, strict)

"""Unit tests for the per-key top-N operator (relational/topk.py).

The driver-facing contract (events_top3_by_user vs DuckDB row_number)
is gated by tools/check_correctness.py; these pin the kernel semantics —
rank order, id tie-break, cross-block local-prune correctness — on
planted inputs.
"""

import numpy as np
import pyarrow as pa

from scoobie_ray.relational.topk import per_key_topn


def _ds(rows, parallelism=1):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                c: pa.array([r[i] for r in rows], t)
                for i, (c, t) in enumerate(
                    [("k", pa.int64()), ("v", pa.float64()), ("id", pa.int64())]
                )
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


def _run(ds, n, **kw):
    out = per_key_topn(
        ds, key_col="k", val_col="v", id_col="id", n=n, **kw
    ).to_pandas()
    return sorted(map(tuple, out[["k", "id", "rnk"]].values.tolist()))


def test_topn_rank_and_tie_break(ray_session):
    rows = [(1, 5.0, 10), (1, 5.0, 11), (1, 7.0, 12), (1, 1.0, 13), (2, 3.0, 20)]
    # key 1: 7.0 first, then the 5.0 tie broken by id asc; 1.0 cut at n=3... kept
    assert _run(_ds(rows), 3) == [
        (1, 10, 2),
        (1, 11, 3),
        (1, 12, 1),
        (2, 20, 1),
    ]


def test_topn_local_prune_across_blocks(ray_session):
    # per-block local top-n must not drop a row that is globally top-n:
    # spread one key's rows over many blocks so each block sees few
    rng = np.random.default_rng(5)
    rows = [(int(k), float(v), i) for i, (k, v) in enumerate(
        zip(rng.integers(0, 8, 300), rng.integers(0, 1000, 300)))]
    got = _run(_ds(rows, parallelism=10), 4, num_partitions=3)
    # naive reference
    want = []
    arr = np.array(rows)
    for k in np.unique(arr[:, 0]):
        sub = [(v, i) for kk, v, i in rows if kk == k]
        for r, (v, i) in enumerate(sorted(sub, key=lambda t: (-t[0], t[1]))[:4]):
            want.append((int(k), int(i), r + 1))
    assert got == sorted(want)

"""Unit tests for pivot/crosstab (relational/pivot.py).

The driver-facing contract (events_pivot vs DuckDB conditional
aggregation) is gated by tools/check_correctness.py; these pin the
operator semantics — sorted category columns, zero fills, cross-block
partial-count merging — on planted inputs.
"""

import pyarrow as pa

from scoobie_ray.relational.pivot import pivot_counts


def _ds(rows, parallelism=1):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "c": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


def test_pivot_counts_and_zero_fill(ray_session):
    out = (
        pivot_counts(_ds([(1, "a"), (1, "a"), (1, "b"), (2, "b")]), key_col="k", cat_col="c")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert list(out.columns) == ["n_a", "n_b"]
    assert out.loc[1].tolist() == [2, 1]
    assert out.loc[2].tolist() == [0, 1]


def test_pivot_merges_partials_across_blocks(ray_session):
    rows = [(i % 7, "xyz"[i % 3]) for i in range(300)]
    out = (
        pivot_counts(_ds(rows, parallelism=8), key_col="k", cat_col="c")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for k in range(7):
        for j, c in enumerate(sorted("xyz")):
            want = sum(1 for kk, cc in rows if kk == k and cc == c)
            assert out.loc[k, f"n_{c}"] == want, (k, c)

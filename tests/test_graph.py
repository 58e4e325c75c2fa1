"""Unit tests for the public connected-components operator (ops/graph.py).

The driver-facing contract (graph_components vs the structurally-known
TPC-H forest) is gated by tools/check_correctness.py; these pin the
generic algorithm on adversarial shapes — chains (pointer jumping),
cycles, many components, random graphs vs a union-find reference.
"""

import numpy as np
import pyarrow as pa

from scoobie_ray.ops.graph import connected_components


def _edges(pairs, parallelism=4):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    return ds.repartition(parallelism)


def _run(pairs, parallelism=4, **kw):
    out = connected_components(_edges(pairs, parallelism), **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["component"].astype(int)))


def test_cc_chain_and_cycle(ray_session):
    # chain 1-2-3-4-5 (deep: exercises pointer jumping) + cycle 10-11-12-10
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)]
    assert _run(pairs) == want  # driver fold
    assert _run(pairs, driver_limit=0) == want  # forced distributed path


def test_cc_string_ids_both_regimes(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["b", "c", "x"], pa.string()),
                "dst": pa.array(["a", "b", "y"], pa.string()),
            }
        )
    )
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    for lim in (50_000_000, 0):
        out = connected_components(ds, driver_limit=lim).to_pandas()
        assert dict(zip(out["node"], out["component"])) == want, lim


def test_cc_matches_union_find_on_random(ray_session):
    rng = np.random.default_rng(17)
    pairs = list(zip(rng.integers(0, 120, 200).tolist(), rng.integers(0, 120, 200).tolist()))
    got = _run(pairs, parallelism=6)
    got_dist = _run(pairs, parallelism=6, driver_limit=0)
    assert got == got_dist

    # union-find reference
    parent = list(range(121))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for p in pairs for x in p}
    # component label = min node id of the component
    comp_min = {}
    for x in touched:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in touched}
    assert got == want

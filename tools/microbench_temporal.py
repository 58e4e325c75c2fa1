"""Micro-bench the temporal / top-N / graph operators at 1M-row scale.

Synthetic inputs (deterministic, seeded) sized to make the per-group
Python trap visible if it ever regresses: 200k distinct keys over 1M
rows, so a per-key map_groups shape would make 200k Python calls while
the partition-kernel shape makes ``num_partitions`` (32).

    python tools/microbench_temporal.py [--num-cpus 8]

Prints one JSON line; numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--keys", type=int, default=200_000)
    args = ap.parse_args(argv)

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from scoobie_ray.ops.graph import connected_components
    from scoobie_ray.relational.range_join import range_count_join
    from scoobie_ray.relational.topk import per_key_topn
    from scoobie_ray.relational.window import rolling_count

    rng = np.random.default_rng(42)
    N, K = args.rows, args.keys
    key = rng.integers(0, K, N)
    ts = rng.integers(0, 30 * 86_400_000_000, N)  # 30 days of us
    val = rng.random(N)
    events = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(key, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "v": pa.array(val, pa.float64()),
                "id": pa.array(np.arange(N), pa.int64()),
            }
        )
    ).repartition(32).materialize()

    out = {"rows": N, "keys": K, "num_cpus": args.num_cpus}

    t0 = time.time()
    n = rolling_count(
        events, key_col="k", ts_col="t", window_us=3_600_000_000, carry=["id"]
    ).count()
    out["rolling_count_sec"] = round(time.time() - t0, 3)
    assert n == N, n

    iv = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(key[:100_000], pa.int64()),
                "s": pa.array(ts[:100_000], pa.int64()),
                "e": pa.array(ts[:100_000] + 3_600_000_000, pa.int64()),
                "iid": pa.array(np.arange(100_000), pa.int64()),
            }
        )
    ).repartition(16).materialize()
    t0 = time.time()
    n = range_count_join(
        iv,
        events,
        interval_key="k",
        start_col="s",
        end_col="e",
        point_key="k",
        point_ts="t",
        carry=["iid"],
    ).count()
    out["range_join_sec"] = round(time.time() - t0, 3)
    assert n == 100_000, n

    t0 = time.time()
    n = per_key_topn(events, key_col="k", val_col="v", id_col="id", n=3).count()
    out["per_key_topn_sec"] = round(time.time() - t0, 3)
    assert n > K * 2, n  # ~3 per key (keys with <3 rows emit fewer)

    # 1M-edge random graph over 300k nodes: few giant components after
    # percolation — the worst case for label propagation depth
    src = rng.integers(0, 300_000, 1_000_000)
    dst = rng.integers(0, 300_000, 1_000_000)
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    ).repartition(32).materialize()
    t0 = time.time()
    labels = connected_components(edges).materialize()
    out["cc_driver_sec"] = round(time.time() - t0, 3)
    out["cc_nodes"] = labels.count()
    comp = labels.to_pandas()
    out["cc_components"] = int(comp["component"].nunique())

    # distributed path (forced) on a 100k-edge slice — per-edge cost is
    # ~100x the driver fold (each round reshuffles the edges); recorded
    # so the driver_limit default is evidence, not folklore
    e100k = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src[:100_000], pa.int64()),
                "dst": pa.array(dst[:100_000], pa.int64()),
            }
        )
    ).repartition(16).materialize()
    t0 = time.time()
    connected_components(e100k, driver_limit=0).materialize()
    out["cc_distributed_100k_sec"] = round(time.time() - t0, 3)

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

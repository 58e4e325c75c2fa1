"""KG-extraction job driver — the ``ray job submit`` entry point.

North-rule shape: `ray job submit -- python jobs/run_extract.py
--docs <path-or-dir> --kb <kb-bundle-dir> --out <dir>` on a fixed-size
cluster; locally it runs against `ray.init(address="local")`.

Resumable: the input is split into deterministic partitions (one per
input file; single files split by row ranges), each extracted +
canonicalized independently and committed with a manifest line
(pipelines/materialize.py).  Re-running skips completed partitions; a
final global canonicalize over the part directories is optional
(--finalize) when one merged output is required.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

# invoked as `python jobs/run_extract.py`, sys.path[0] is jobs/ — the
# package lives one level up (ray job submit ships the working dir)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="docs parquet file/dir")
    ap.add_argument("--kb", required=True, help="KB bundle dir (KBBundle.write)")
    ap.add_argument("--out", required=True, help="output dir (parts + manifest)")
    ap.add_argument("--rows-per-partition", type=int, default=200_000)
    ap.add_argument("--pool", type=int, default=0, help="extract actors (0=auto)")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--resolver", default="degree")
    ap.add_argument("--finalize", action="store_true", help="merge parts into one canonical set")
    ap.add_argument("--num-cpus", type=int, default=0, help="only for local runs")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # under `ray job submit` the cluster exists
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local")}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(include_dashboard=False, **kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from scoobie_ray.kb.bundle import KBBundle
    from scoobie_ray.pipelines.canonicalize import canonicalize
    from scoobie_ray.pipelines.extract import _kb_ref, extract_triples
    from scoobie_ray.pipelines.materialize import materialize_partitioned
    from scoobie_ray.sources.docs import read_docs
    from scoobie_ray.stages.serialize import decode_triples

    kb = KBBundle.read(args.kb)
    kb_ref = _kb_ref(kb)
    pool = args.pool or max(1, int(ray.cluster_resources().get("CPU", 8)) // 2)

    # deterministic partitions: per input file; single file -> row ranges
    if os.path.isdir(args.docs):
        files = sorted(glob.glob(os.path.join(args.docs, "*.parquet")))
        partitions = [(os.path.basename(f), ("file", f)) for f in files]
    else:
        import pyarrow.parquet as pq

        n = pq.read_metadata(args.docs).num_rows
        step = args.rows_per_partition
        partitions = [
            (f"rows-{lo}", ("rows", args.docs, lo, min(lo + step, n)))
            for lo in range(0, n, step)
        ]

    def run_partition(pin):
        if pin[0] == "file":
            docs = read_docs(pin[1])
        else:
            _tag, path, lo, hi = pin
            import pyarrow.parquet as pq

            table = pq.read_table(path).slice(lo, hi - lo)
            docs = ray.data.from_arrow(table)
        canon = canonicalize(
            extract_triples(
                docs,
                kb_ref,
                concurrency=pool,
                batch_size=args.batch_size,
                resolver=args.resolver,
                encoded=True,
            )
        )
        return decode_triples(canon, kb_ref)

    summary = materialize_partitioned(partitions, run_partition, args.out)

    if args.finalize:
        from scoobie_ray.pipelines.canonicalize import _groupby_finish

        parts = sorted(glob.glob(os.path.join(args.out, "part=*", "*.parquet")))
        merged = ray.data.read_parquet(parts)
        # parts are already combined rows (belief, n_docs): one global
        # keyed merge finishes exactly-once semantics across partitions
        final = _groupby_finish(merged, None)
        final.write_parquet(os.path.join(args.out, "final"))
        summary["finalized"] = True

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""ANN index job driver — build the persisted LSH-bucket layout.

`python jobs/build_ann_index.py --embeddings <parquet> --out <dir>`
writes the corpus hive-partitioned by hyperplane-LSH bucket
(ops/similarity.build_lsh_index); subsequent query sets read only their
probed partition directories.  ``--probe-self N`` runs an N-query
self-probe smoke check after the build and reports its recall@k against
exact brute force.
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
    ap.add_argument("--embeddings", required=True, help="embeddings parquet (vec_id, embedding)")
    ap.add_argument("--out", required=True, help="index output dir (hive bucket layout)")
    ap.add_argument("--n-bits", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--probe-self", type=int, default=0, help="smoke: probe N corpus vectors")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=0, help="only for local runs")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local")}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(include_dashboard=False, **kwargs)
    import pyarrow.parquet as pq
    import ray.data

    from scoobie_ray.ops.similarity import (
        build_lsh_index,
        knn_bruteforce,
        knn_lsh_indexed,
    )

    emb = ray.data.read_parquet(args.embeddings, columns=["vec_id", "embedding"])
    head = pq.read_table(args.embeddings, columns=["embedding"]).column(0)
    dim = len(head[0].as_py())
    t0 = time.time()
    index = build_lsh_index(
        emb, args.out, dim=dim, n_bits=args.n_bits, seed=args.seed
    )
    build_sec = round(time.time() - t0, 2)
    n_parts = sum(1 for d in os.listdir(args.out) if d.startswith("bucket="))
    report = {
        "dim": dim,
        "n_bits": args.n_bits,
        "partitions": n_parts,
        "build_sec": build_sec,
        "out": args.out,
    }
    # persist the index metadata next to the layout so query jobs need no
    # out-of-band parameters
    with open(os.path.join(args.out, "index.json"), "w") as f:
        json.dump(index, f)

    if args.probe_self > 0:
        qt = pq.read_table(args.embeddings, columns=["vec_id", "embedding"])
        qids = qt["vec_id"][: args.probe_self].to_pylist()
        qvecs = qt["embedding"][: args.probe_self].to_pylist()
        t0 = time.time()
        ann = knn_lsh_indexed(index, qids, qvecs, k=args.k)
        report["probe_sec"] = round(time.time() - t0, 2)
        exact = knn_bruteforce(emb, qids, qvecs, k=args.k)

        def sets(t):
            out: dict = {}
            for q, v in zip(t["query_id"].to_pylist(), t["vec_id"].to_pylist()):
                out.setdefault(q, set()).add(v)
            return out

        es, an = sets(exact), sets(ann)
        hit = sum(len(an.get(q, set()) & es[q]) for q in es)
        total = sum(len(v) for v in es.values())
        report["recall_at_k"] = round(hit / max(1, total), 3)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())

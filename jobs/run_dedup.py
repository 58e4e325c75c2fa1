"""Corpus deduplication job driver — ``ray job submit`` entry point.

`python jobs/run_dedup.py --docs <parquet> --out <dir> --method minhash`
reads a (doc_id, text) parquet corpus, removes near-duplicates with the
chosen operator, and writes the surviving rows as partitioned parquet.
Methods: exact | minhash | simhash | ngram (ops/dedup.py semantics; the
same operators the driver's oracle gate checks), plus ``substrings``
(ops/curation.dedup_substrings: keeps every row but REWRITES its text,
dropping tokens covered by a cross-document duplicated n-gram window —
Lee et al. substring-level dedup; ``rows_out == rows_in`` and the JSON
reports ``tokens_dropped`` instead).
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
    ap.add_argument("--docs", required=True, help="docs parquet file/dir")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument(
        "--method",
        default="minhash",
        choices=["exact", "minhash", "simhash", "ngram", "substrings"],
    )
    ap.add_argument("--threshold", type=float, default=0.8, help="jaccard (minhash/ngram)")
    ap.add_argument("--max-hamming", type=int, default=3, help="simhash")
    ap.add_argument("--ngram", type=int, default=8, help="window size (substrings)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--num-cpus", type=int, default=0, help="only for local runs")
    ap.add_argument(
        "--resolve-limit",
        type=int,
        default=2_000_000,
        help="verified-pair count above which cluster resolution stays "
        "fully distributed (hash-min connected components + co-partitioned "
        "anti-join) instead of driver union-find + broadcast; set 0 to "
        "force the distributed path (high-dup-rate crawls)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local")}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(include_dashboard=False, **kwargs)
    import ray.data

    from scoobie_ray.ops import dedup

    ds = ray.data.read_parquet(args.docs)
    n_in = ds.count()
    t0 = time.time()
    kw = {"text_col": args.text_col, "id_col": args.id_col}
    rkw = {"broadcast_resolve_limit": args.resolve_limit}
    tokens_dropped = None
    if args.method == "exact":
        out = dedup.exact_dedup(ds, **kw)
    elif args.method == "minhash":
        out = dedup.minhash_dedup(ds, threshold=args.threshold, **kw, **rkw)
    elif args.method == "simhash":
        out = dedup.simhash_dedup(ds, max_hamming=args.max_hamming, **kw, **rkw)
    elif args.method == "substrings":
        from scoobie_ray.ops.curation import dedup_substrings

        out = dedup_substrings(
            ds, n=args.ngram, broadcast_limit=args.resolve_limit, **kw
        )
    else:
        out = dedup.ngram_dedup(ds, threshold=args.threshold, **kw, **rkw)
    out.write_parquet(args.out)

    import pyarrow.parquet as pq

    n_out = 0
    for f in os.listdir(args.out):
        if not f.endswith(".parquet"):
            continue
        n_out += pq.read_metadata(os.path.join(args.out, f)).num_rows
    if args.method == "substrings":
        tokens_dropped = 0
        for f in os.listdir(args.out):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(args.out, f), columns=["n_dropped"])
                tokens_dropped += int(
                    __import__("pyarrow.compute", fromlist=["sum"]).sum(t["n_dropped"]).as_py() or 0
                )
    rec = {
        "method": args.method,
        "rows_in": n_in,
        "rows_out": n_out,
        "dropped": n_in - n_out,
        "wall_sec": round(time.time() - t0, 2),
    }
    if tokens_dropped is not None:
        rec["tokens_dropped"] = tokens_dropped
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Corpus-statistics job driver — ``ray job submit`` entry point.

`python jobs/run_corpus_stats.py --docs <parquet> --out <dir>` reads a
(doc_id, text) parquet corpus and writes its statistics bundle:

- ``token_counts/`` — exact corpus word frequency as partitioned parquet
  (combiner-first shuffle; the corpus text never rides the exchange);
- ``summary.json`` — top-k tokens, char-length discrete quantiles
  (DuckDB quantile_disc index semantics) and the distinct-token count:
  exact plus the deterministic p=14 HyperLogLog estimate (reported with
  its relative error so drift is visible in job logs);
- with ``--group-col`` (e.g. ``lang``): per-group top-k tokens,
  per-group exact distinct counts and the mergeable per-group HLL
  estimates ride the summary too.

Same operators the driver's top_tokens / len_quantiles / vocab_distinct
/ lang_top_tokens / lang_vocab_distinct / lang_vocab_hll oracle gates
check (ops/sketch.py).
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
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--top-k", type=int, default=50)
    ap.add_argument(
        "--quantiles",
        default="0.1,0.25,0.5,0.75,0.9",
        help="comma-separated char-length quantiles",
    )
    ap.add_argument("--num-cpus", type=int, default=0, help="only for local runs")
    ap.add_argument(
        "--group-col",
        default="",
        help="optional group column (e.g. lang): adds per-group top-k, "
        "exact distinct counts and mergeable HLL estimates",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local")}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(include_dashboard=False, **kwargs)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from scoobie_ray.ops.sketch import (
        hll_distinct,
        quantiles_disc,
        token_counts,
        top_k_tokens,
    )

    qs = [float(q) for q in args.quantiles.split(",") if q]
    t0 = time.time()
    cols = [args.text_col] + ([args.group_col] if args.group_col else [])
    ds = ray.data.read_parquet(args.docs, columns=cols)

    counts = token_counts(ds, args.text_col)
    counts.write_parquet(os.path.join(args.out, "token_counts"))
    n_distinct = counts.count()

    top = top_k_tokens(ds, args.top_k, args.text_col).to_pandas()
    lens = ds.map_batches(
        lambda b: pa.table(
            {"n_chars": pc.cast(pc.utf8_length(b[args.text_col]), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    quants = quantiles_disc(lens, "n_chars", qs).to_pandas()
    est = hll_distinct(ds, args.text_col)

    summary = {
        "top_tokens": top.values.tolist(),
        "len_quantiles": {int(r.q_pct): int(r.val) for r in quants.itertuples()},
        "n_distinct_tokens": int(n_distinct),
        "hll_estimate": round(est, 1),
        "hll_rel_err_pct": round(100 * abs(est - n_distinct) / max(n_distinct, 1), 3),
        "wall_sec": round(time.time() - t0, 3),
    }
    if args.group_col:
        from scoobie_ray.ops.sketch import (
            grouped_distinct_tokens,
            grouped_hll_distinct,
            lang_top_tokens,
        )

        g_top = lang_top_tokens(
            ds, args.top_k, group_col=args.group_col, col=args.text_col
        ).to_pandas()
        g_exact = grouped_distinct_tokens(
            ds, group_col=args.group_col, col=args.text_col
        ).to_pandas()
        g_est = grouped_hll_distinct(ds, args.group_col, args.text_col)
        summary["grouped"] = {
            "top_tokens": {
                str(g): sub[["token", "n"]].values.tolist()
                for g, sub in g_top.groupby(args.group_col, sort=True)
            },
            "n_distinct_tokens": {
                str(r[0]): int(r[1]) for r in g_exact.values.tolist()
            },
            "hll_estimates": {str(g): round(v, 1) for g, v in sorted(g_est.items())},
        }
        summary["wall_sec"] = round(time.time() - t0, 3)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

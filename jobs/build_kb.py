"""KB ingest job driver — RDF dumps → KB bundle, as ``ray job submit``.

`python jobs/build_kb.py --dumps <glob...> --out <bundle-dir>` parses any
mix of N-Triples / Turtle / N3 / RDF/XML / TriG / TriX dumps (gzip/bzip2/
zip transparent), applies the reference's cleaning filters, and builds
the broadcastable KB bundle with the distributed dictionary-encoding job
(pipelines/kb_build.py — preprocessRdfData semantics).  Line-based
N-Triples dumps stream through ``read_text`` (``--line-based``); the
document-scoped formats parse one worker task per file.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dumps", required=True, nargs="+", help="RDF dump files/globs")
    ap.add_argument("--out", required=True, help="KB bundle output dir")
    ap.add_argument(
        "--line-based",
        action="store_true",
        help="treat inputs as line-based N-Triples (read_text scale path)",
    )
    ap.add_argument("--no-cluster-types", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=0, help="only for local runs")
    args = ap.parse_args(argv)

    paths: list[str] = []
    for pat in args.dumps:
        hits = sorted(glob.glob(pat))
        paths.extend(hits if hits else [pat])

    import ray

    if not ray.is_initialized():
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local")}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(include_dashboard=False, **kwargs)

    from scoobie_ray.kb.parser import read_ntriples_lines_ds, read_rdf
    from scoobie_ray.pipelines.kb_build import build_kb_job

    t0 = time.time()
    triples = (
        read_ntriples_lines_ds(paths) if args.line_based else read_rdf(paths)
    )
    bundle = build_kb_job(triples, cluster_types=not args.no_cluster_types)
    bundle.write(args.out)
    print(
        json.dumps(
            {
                "files": len(paths),
                "resources": bundle.resources.num_rows,
                "symbols": bundle.symbols.num_rows,
                "wall_sec": round(time.time() - t0, 2),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

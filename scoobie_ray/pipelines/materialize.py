"""Partitioned, resumable materialization with per-partition lineage.

North-rule requirement: output must be resumable from checkpoint with
per-partition lineage + metrics.  Design (SURVEY.md §4 "Checkpoint/resume"):

- the input doc table is split into deterministic partitions (here: by
  file/fragment — at Lance scale, fragment ids; in tests, row-range
  shards);
- each partition runs the extract→canonicalize pipeline independently and
  writes to ``out_dir/part=<pid>/`` via write-to-temp + atomic rename;
- a ``manifest.jsonl`` records one line per completed partition: partition
  id, input description, row/triple counts, output digest and wall time;
- a rerun skips partitions already present in the manifest — idempotent
  resume after any crash (a torn write leaves only a temp dir, never a
  committed partition).

Cross-partition canonicalization note: per-partition canonicalize dedups
within the partition; the global view stays exactly-once mergeable because
triples are deterministic functions of (doc, KB) — a reader takes
groupby(s, p, o, graph) over part dirs, or the job runs a final global
canonicalize pass when one file set is required.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def _digest_dir(path: str) -> str:
    h = hashlib.md5()
    for name in sorted(os.listdir(path)):
        fp = os.path.join(path, name)
        h.update(name.encode())
        with open(fp, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                h.update(chunk)
    return h.hexdigest()


def _count_rows(path: str) -> int:
    """Row count from parquet footers (cheap metadata-only read)."""
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(path, name)).num_rows
        for name in os.listdir(path)
        if name.endswith(".parquet")
    )


def load_manifest(out_dir: str) -> dict[str, dict]:
    path = os.path.join(out_dir, "manifest.jsonl")
    done: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["partition"]] = rec
    return done


def append_manifest(out_dir: str, rec: dict) -> None:
    path = os.path.join(out_dir, "manifest.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def materialize_partitioned(
    partitions: list[tuple[str, "object"]],
    run_pipeline,
    out_dir: str,
) -> dict:
    """Run ``run_pipeline(partition_input) -> Dataset`` per partition with
    manifest-based resume.

    ``partitions``: list of (partition_id, partition_input).  Returns a
    summary dict {completed, skipped, total_rows}.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    completed, skipped, total_rows = 0, 0, 0
    for pid, pin in partitions:
        if pid in done:
            skipped += 1
            total_rows += done[pid]["rows"]
            continue
        part_dir = os.path.join(out_dir, f"part={pid}")
        tmp_dir = os.path.join(out_dir, f".tmp-part={pid}")
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)  # torn write from a crashed run
        if os.path.exists(part_dir):
            # Crash landed between os.replace(tmp, part) and append_manifest:
            # the rename is atomic, so an existing part dir is a COMPLETE
            # write that merely lost its manifest line.  Adopt it (digest +
            # count from files) instead of re-running — otherwise the rerun's
            # os.replace onto a non-empty dir raises ENOTEMPTY forever.
            rows = _count_rows(part_dir)
            append_manifest(
                out_dir,
                {
                    "partition": pid,
                    "input": str(pin)[:200],
                    "rows": rows,
                    "digest": _digest_dir(part_dir),
                    "wall_sec": 0.0,
                    "adopted": True,
                },
            )
            skipped += 1
            total_rows += rows
            continue
        t0 = time.time()
        ds = run_pipeline(pin)
        ds.write_parquet(tmp_dir)
        rows = _count_rows(tmp_dir)
        os.replace(tmp_dir, part_dir)
        append_manifest(
            out_dir,
            {
                "partition": pid,
                "input": str(pin)[:200],
                "rows": rows,
                "digest": _digest_dir(part_dir),
                "wall_sec": round(time.time() - t0, 3),
            },
        )
        completed += 1
        total_rows += rows
    return {"completed": completed, "skipped": skipped, "total_rows": total_rows}

"""Resume-from-manifest semantics: partitions already in the manifest are
skipped; a torn (temp) write is discarded and recomputed; output digests
are stable across reruns (deterministic partitions — FIXTURES.md §5)."""

import os
import shutil

import pytest

from scoobie_ray.pipelines.canonicalize import canonicalize
from scoobie_ray.pipelines.extract import extract_triples
from scoobie_ray.pipelines.materialize import load_manifest, materialize_partitioned
from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def run_partition(ray_session):
    import ray.data

    kb = kg_kb(SF)
    docs = kg_docs_table(SF)

    def run(row_range):
        lo, hi = row_range
        part = docs.slice(lo, hi - lo)
        return canonicalize(
            extract_triples(ray.data.from_arrow(part), kb, concurrency=1)
        )

    return run


def _partitions(n_docs=335, size=120):
    return [
        (f"shard-{lo}", (lo, min(lo + size, n_docs))) for lo in range(0, n_docs, size)
    ]


def test_materialize_and_resume(tmp_path, run_partition):
    out = str(tmp_path / "out")
    s1 = materialize_partitioned(_partitions(), run_partition, out)
    assert s1["completed"] == 3 and s1["skipped"] == 0
    man = load_manifest(out)
    assert len(man) == 3
    assert all(r["rows"] > 0 for r in man.values())

    # rerun: everything skipped, same totals
    s2 = materialize_partitioned(_partitions(), run_partition, out)
    assert s2["completed"] == 0 and s2["skipped"] == 3
    assert s2["total_rows"] == s1["total_rows"]


def test_materialize_recovers_torn_write(tmp_path, run_partition):
    out = str(tmp_path / "out")
    parts = _partitions()
    s1 = materialize_partitioned(parts[:1], run_partition, out)
    assert s1["completed"] == 1
    # simulate a crash mid-partition: stale temp dir for an uncommitted part
    os.makedirs(os.path.join(out, ".tmp-part=shard-120"))
    s2 = materialize_partitioned(parts, run_partition, out)
    assert s2["completed"] == 2 and s2["skipped"] == 1
    assert not any(d.startswith(".tmp") for d in os.listdir(out))


def test_materialize_adopts_orphan_part_dir(tmp_path, run_partition):
    """Crash between os.replace(tmp, part) and append_manifest: the
    committed part dir exists with no manifest line.  The rerun must adopt
    it (digest + manifest record), not raise ENOTEMPTY or recompute."""
    import json

    out = str(tmp_path / "out")
    parts = _partitions()
    s1 = materialize_partitioned(parts[:2], run_partition, out)
    assert s1["completed"] == 2
    # simulate the crash window: drop shard-120's manifest line, keep its dir
    man_path = os.path.join(out, "manifest.jsonl")
    with open(man_path) as f:
        lines = [ln for ln in f if json.loads(ln)["partition"] != "shard-120"]
    with open(man_path, "w") as f:
        f.writelines(lines)
    assert os.path.isdir(os.path.join(out, "part=shard-120"))

    s2 = materialize_partitioned(parts, run_partition, out)
    assert s2["completed"] == 1  # only shard-240 runs
    assert s2["skipped"] == 2
    man = load_manifest(out)
    assert man["shard-120"]["adopted"] is True
    assert man["shard-120"]["rows"] > 0
    assert s2["total_rows"] == s1["total_rows"] + man["shard-240"]["rows"]


def test_partition_digests_deterministic(tmp_path, run_partition):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    materialize_partitioned(_partitions()[:1], run_partition, out_a)
    materialize_partitioned(_partitions()[:1], run_partition, out_b)
    da = load_manifest(out_a)["shard-0"]
    db = load_manifest(out_b)["shard-0"]
    assert da["rows"] == db["rows"]


def test_run_extract_job_cli(tmp_path, ray_session):
    """The ray-job entry point end-to-end: partitioned run, resume, finalize."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb

    kb_dir = str(tmp_path / "kb")
    docs_path = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "out")
    kg_kb(SF).write(kb_dir)
    pq.write_table(kg_docs_table(SF), docs_path)

    from jobs.run_extract import main

    rc = main([
        "--docs", docs_path, "--kb", kb_dir, "--out", out_dir,
        "--rows-per-partition", "120", "--pool", "1", "--finalize",
    ])
    assert rc == 0
    man = load_manifest(out_dir)
    assert len(man) == 3
    final = pq.read_table(os.path.join(out_dir, "final"))
    assert final.num_rows == 893  # the sf0.001 canonical set
    # rerun skips everything
    rc = main([
        "--docs", docs_path, "--kb", kb_dir, "--out", out_dir,
        "--rows-per-partition", "120", "--pool", "1",
    ])
    assert rc == 0


def test_media_pipeline(ray_session):
    import ray.data

    from scoobie_ray.pipelines.media import media_features, media_refs
    from scoobie_ray.sources.fixtures import kg_docs_table

    docs = ray.data.from_arrow(kg_docs_table(SF))
    refs = media_refs(docs).take_all()
    assert refs and all(r["kind"] in ("image", "audio") for r in refs)
    feats = media_features(docs, concurrency=1).take_all()
    assert len(feats) == len(refs)
    by_kind = {r["kind"]: len(r["features"]) for r in feats}
    assert by_kind["image"] == 64 and by_kind["audio"] == 32

"""Training-data ops tests: dedup family, similarity search, text
analysis, multimodal plumbing — with planted duplicates and numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest

from scoobie_ray.ops.dedup import (
    char_shingles,
    embedding_dedup,
    exact_dedup,
    jaccard,
    minhash_dedup,
    minhash_signature,
    simhash64,
    simhash_dedup,
)
from scoobie_ray.ops.multimodal import (
    DecodeImage,
    ExtractAudioFeatures,
    ResizeImage,
    SampleFrames,
    media_table,
)
from scoobie_ray.ops.similarity import knn_bruteforce, knn_lsh
from scoobie_ray.ops.text import (
    LangId,
    TextStats,
    fingerprint_batch,
    rolling_hashes,
    winnow_fingerprint,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long and winding tune about shipping data pipelines at scale"
)


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


@pytest.fixture()
def dup_docs(ray_session):
    import ray.data

    rows = [
        ("a", BASE),
        ("b", BASE),  # exact duplicate of a
        ("c", BASE.replace("lazy", "sleepy")),  # near-duplicate of a
        ("d", "completely different text about astronomy and telescopes and "
              "the mapping of distant galaxies through long exposures"),
        ("e", "short unique snippet"),
    ]
    return ray.data.from_arrow(_docs_table(rows))


def test_exact_dedup(dup_docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(dup_docs).take_all())
    assert kept == ["a", "c", "d", "e"]  # b collapsed into a (min doc_id)


def test_minhash_dedup_catches_near_dups(dup_docs):
    kept = sorted(r["doc_id"] for r in minhash_dedup(dup_docs, threshold=0.6).take_all())
    assert "a" in kept and "d" in kept and "e" in kept
    assert "b" not in kept  # exact dup always caught
    assert "c" not in kept  # near dup above threshold

    # verify kernel agrees: true shingle jaccard of a vs c is high
    ja = jaccard(
        set(char_shingles(BASE).tolist()),
        set(char_shingles(BASE.replace("lazy", "sleepy")).tolist()),
    )
    assert ja > 0.6


def test_minhash_signature_estimates_jaccard():
    s1 = char_shingles(BASE)
    s2 = char_shingles(BASE.replace("lazy", "sleepy"))
    m1 = minhash_signature(s1, 128)
    m2 = minhash_signature(s2, 128)
    est = (m1 == m2).mean()
    true = jaccard(set(s1.tolist()), set(s2.tolist()))
    assert abs(est - true) < 0.15


def test_simhash_dedup(dup_docs):
    kept = sorted(r["doc_id"] for r in simhash_dedup(dup_docs, max_hamming=3).take_all())
    assert "b" not in kept  # identical simhash
    assert "d" in kept and "e" in kept
    h1, h2 = simhash64(BASE), simhash64(BASE.replace("lazy", "sleepy"))
    assert bin(h1 ^ h2).count("1") <= 12  # near-dup = small hamming distance


def test_embedding_dedup(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16).astype(np.float32)
    rows = []
    for i, vec in enumerate(
        [base, base + 0.001, base * 2.0, rng.standard_normal(16).astype(np.float32)]
    ):
        rows.append({"vec_id": i, "embedding": [float(x) for x in vec]})
    ds = ray.data.from_items(rows)
    kept = sorted(r["vec_id"] for r in embedding_dedup(ds, dim=16, threshold=0.999).take_all())
    # 0, 1, 2 are colinear (cosine ~1): representative 0 survives; 3 distinct
    assert kept == [0, 3]


def test_knn_bruteforce_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 8)).astype(np.float64)
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in mat[i]]} for i in range(50)
    ]
    ds = ray.data.from_items(rows)
    out = knn_bruteforce(ds, [0, 1], mat[:2], k=3)
    # numpy oracle
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in (0, 1):
        scores = normed @ normed[q]
        expect = np.argsort(-scores, kind="stable")[:3].tolist()
        got = [
            r["vec_id"]
            for r in out.to_pylist()
            if r["query_id"] == q
        ]
        assert got == expect


def test_knn_lsh_finds_self(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((80, 16)).astype(np.float64)
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in mat[i]]} for i in range(80)
    ]
    ds = ray.data.from_items(rows)
    out = knn_lsh(ds, [4], mat[4:5], dim=16, k=3)
    got = [r for r in out.to_pylist() if r["rank"] == 0]
    assert got and got[0]["vec_id"] == 4  # the query itself survives probing


def test_text_stats_and_fingerprint():
    t = _docs_table([("x", "Hello big world. Twice!"), ("y", "")])
    out = TextStats()(t)
    assert out["n_tokens"].to_pylist() == [4, 0]
    assert out["n_punct"].to_pylist() == [2, 0]
    fp = fingerprint_batch(t)
    assert fp["fingerprint"].to_pylist()[0] == fingerprint_batch(t)["fingerprint"].to_pylist()[0]


def test_langid_profiles():
    t = _docs_table(
        [
            ("en", "the cat and the dog sat on a mat for the king of the hill"),
            ("es", "el perro y la casa de los reyes en una tierra por la noche"),
        ]
    )
    out = LangId()(t)
    assert out["lang_pred"].to_pylist() == ["en", "es"]


def test_rolling_hash_windowing():
    h1 = rolling_hashes("abcdefghij" * 4, window=8)
    h2 = rolling_hashes("abcdefghij" * 4, window=8)
    assert h1 == h2 and len(h1) > 0
    assert winnow_fingerprint("abcdefghij" * 4) == winnow_fingerprint("abcdefghij" * 4)


def test_multimodal_fake_stages():
    t = media_table(
        [
            {
                "media_ref": "media://img/1",
                "kind": "image",
                "payload": b"abc",
                "width": 100,
                "height": 50,
                "duration_ms": 0,
            },
            {
                "media_ref": "media://vid/2",
                "kind": "video",
                "payload": b"xyz",
                "width": 0,
                "height": 0,
                "duration_ms": 2500,
            },
        ]
    )
    feats = DecodeImage(fake=True)(t)
    assert len(feats["image_features"].to_pylist()[0]) == 64
    # deterministic: same payload digest -> same features
    again = DecodeImage(fake=True)(t)
    assert feats["image_features"].to_pylist() == again["image_features"].to_pylist()

    resized = ResizeImage(64, 64, fake=True)(t)
    assert resized["width"].to_pylist() == [64, 64]

    frames = SampleFrames(fps=2.0, fake=True)(t)
    vid = [r for r in frames.to_pylist() if r["media_ref"] == "media://vid/2"]
    assert len(vid) == 5  # 2.5s at 2fps

    audio = ExtractAudioFeatures(fake=True)(t)
    assert len(audio["audio_features"].to_pylist()[0]) == 32

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(t)


def test_ngram_dedup(dup_docs):
    from scoobie_ray.ops.dedup import ngram_dedup

    kept = sorted(r["doc_id"] for r in ngram_dedup(dup_docs, threshold=0.5).take_all())
    assert "b" not in kept  # exact dup
    assert "c" not in kept  # near dup by word 3-grams
    assert "d" in kept and "e" in kept


@pytest.mark.parametrize(
    "name,n_rows,ids_md5",
    [
        ("dedup_exact", 500, "c7b8df7a9677"),
        ("dedup_minhash", 476, "9e788b79dfa8"),
        ("dedup_simhash", 480, "df541e97049d"),
        ("dedup_ngram", 476, "9e788b79dfa8"),
        ("dedup_embedding", 500, "c7b8df7a9677"),
    ],
)
def test_dedup_goldens_sf0001(ray_session, name, n_rows, ids_md5):
    """Locked surviving-id sets at sf0.001 (VERDICT r1 item 1: the
    distributed-verification rewrite must keep identical row sets).
    minhash/exact/embedding are hash-identical to round 1; ngram goldens
    moved twice for recall wins — r3a caught doc 462 (near-dup of 458,
    Jaccard 0.98) missed by the old md5 LSH, and late-r3's
    all-pairs-under-cap bucket emission caught doc 411 (near-dup of 349,
    Jaccard 0.98) whose every shared bucket had a smaller-id false-hub —
    ngram now matches minhash AND the all-pairs DuckDB oracle exactly.
    simhash moved once (481→480) when r4 ported the same
    all-pairs-under-cap rule to its in-bucket Hamming verify: one true
    pair's shared buckets all had a dissimilar smaller-id hub."""
    import hashlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    df = entry.queries()[name]("/root/testdata/sf0.001").to_pandas()
    ids = sorted(map(int, df[df.columns[0]].tolist()))
    assert len(ids) == n_rows
    assert hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()[:12] == ids_md5


def test_exact_dedup_ids_only_matches_full(ray_session):
    """The Min-aggregate fast path returns the same winner set as the
    generic map_groups path."""
    import ray.data

    from scoobie_ray.ops.dedup import exact_dedup

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    full = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    fast = sorted(r["doc_id"] for r in exact_dedup(ds, ids_only=True).take_all())
    assert fast == full


def test_char_shingles_vectorized_props():
    """Vectorized packed-window shingles: distinct, deterministic, and
    Jaccard-faithful on simple cases."""
    from scoobie_ray.ops.dedup import char_shingles, jaccard_u64

    a = char_shingles("the quick brown fox", 5)
    b = char_shingles("the quick brown fox", 5)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == len(a)
    assert jaccard_u64(a, b) == 1.0
    c = char_shingles("a completely different sentence here", 5)
    assert jaccard_u64(a, c) < 0.2
    # short text below k still yields one shingle
    assert len(char_shingles("ab", 5)) == 1
    assert len(char_shingles("", 5)) == 0


def test_simhash_many_matches_scalar():
    from scoobie_ray.ops.dedup import simhash64, simhash_many

    texts = ["the quick brown fox", "the quick brown fox!", "", "one two one two"]
    batch = simhash_many(texts)
    for t, h in zip(texts, batch):
        assert simhash64(t) == int(h)


def test_lsh_index_prunes_partitions(ray_session, tmp_path):
    """Persisted bucket-partitioned ANN index: queries read ONLY probed
    partition dirs (explicit directory pruning — VERDICT r1 item 4)."""
    import os

    import ray.data

    from scoobie_ray.ops.similarity import (
        _HyperplaneLSH,
        _probe_set,
        build_lsh_index,
        knn_bruteforce,
        knn_lsh_indexed,
        probed_partition_paths,
    )

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = emb.take(3)
    dim = len(first[0]["embedding"])
    qids = [r["vec_id"] for r in first]
    qvecs = [r["embedding"] for r in first]

    index = build_lsh_index(emb, str(tmp_path / "idx"), dim=dim, n_bits=8)
    all_parts = [d for d in os.listdir(index["dir"]) if d.startswith("bucket=")]
    assert len(all_parts) > 4  # enough spread for pruning to be meaningful

    lsh = _HyperplaneLSH(dim, 8)
    probe = _probe_set(lsh, np.asarray(qvecs), 8, probe_bits=1)
    paths = probed_partition_paths(index["dir"], probe)
    # pruning is real: probed dirs are a strict subset of all partitions
    probed_dirs = {os.path.basename(os.path.dirname(p)) for p in paths}
    assert 0 < len(probed_dirs) < len(all_parts) or len(probe) >= len(all_parts)
    assert probed_dirs <= set(all_parts)
    pruned_rows = ray.data.read_parquet(paths).count() if paths else 0
    assert pruned_rows < emb.count() or len(probe) >= len(all_parts)

    # recall gate vs exact brute force: self must always be found, and
    # top-k overlap must be substantial on the probed neighborhood
    exact = knn_bruteforce(emb, qids, qvecs, k=5).to_pydict()
    ann = knn_lsh_indexed(index, qids, qvecs, k=5).to_pydict()
    exact_sets = {}
    for q, v in zip(exact["query_id"], exact["vec_id"]):
        exact_sets.setdefault(q, set()).add(v)
    ann_sets = {}
    for q, v in zip(ann["query_id"], ann["vec_id"]):
        ann_sets.setdefault(q, set()).add(v)
    for q in qids:
        assert q in ann_sets[q]  # self-hit
    recall = sum(len(ann_sets[q] & exact_sets[q]) for q in qids) / sum(
        len(exact_sets[q]) for q in qids
    )
    assert recall >= 0.6


def test_knn_lsh_inmemory_matches_indexed(ray_session, tmp_path):
    """The in-memory scan-filter path and the persisted-index path probe
    the same buckets and must return identical rows."""
    import ray.data

    from scoobie_ray.ops.similarity import build_lsh_index, knn_lsh, knn_lsh_indexed

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = emb.take(3)
    dim = len(first[0]["embedding"])
    qids = [r["vec_id"] for r in first]
    qvecs = [r["embedding"] for r in first]
    mem = knn_lsh(emb, qids, qvecs, dim=dim, k=5, n_bits=8).to_pylist()
    index = build_lsh_index(emb, str(tmp_path / "idx"), dim=dim, n_bits=8)
    idx = knn_lsh_indexed(index, qids, qvecs, k=5).to_pylist()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in mem]) == sorted(
        [(r["query_id"], r["vec_id"], r["rank"]) for r in idx]
    )


def test_run_dedup_job_cli(ray_session, tmp_path):
    """The dedup job entry point end-to-end over the sf0.001 documents."""
    from jobs.run_dedup import main

    out = str(tmp_path / "deduped")
    rc = main(
        [
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--method", "minhash",
        ]
    )
    assert rc == 0
    import pyarrow.parquet as pq
    import os

    n = sum(
        pq.read_metadata(os.path.join(out, f)).num_rows
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert n == 476  # matches the locked sf0.001 golden


def test_build_ann_index_job_cli(ray_session, tmp_path):
    """The ANN-index job entry point: build the hive layout + self-probe."""
    import json
    import os

    from jobs.build_ann_index import main

    out = str(tmp_path / "idx")
    rc = main(
        [
            "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
            "--out", out,
            "--probe-self", "3",
        ]
    )
    assert rc == 0
    assert any(d.startswith("bucket=") for d in os.listdir(out))
    meta = json.load(open(os.path.join(out, "index.json")))
    assert meta["n_bits"] == 8 and meta["dir"] == out


def test_ivf_index_prunes_and_recalls(ray_session, tmp_path):
    """IVF variant: k-means lists trained on a sample, corpus assigned
    distributed, queries read only probed list partitions; recall vs
    exact brute force gated."""
    import os

    import ray.data

    from scoobie_ray.ops.similarity import (
        build_ivf_index,
        ivf_probe_paths,
        knn_bruteforce,
        knn_ivf_indexed,
    )

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = emb.take(3)
    dim = len(first[0]["embedding"])
    qids = [r["vec_id"] for r in first]
    qvecs = [r["embedding"] for r in first]

    index = build_ivf_index(emb, str(tmp_path / "ivf"), dim=dim, n_lists=8)
    parts = [d for d in os.listdir(index["dir"]) if d.startswith("list=")]
    assert len(parts) >= 4  # lists actually split the corpus
    probed = ivf_probe_paths(index["dir"], [0])
    all_files = ivf_probe_paths(index["dir"], list(range(index["n_lists"])))
    assert 0 < len(probed) < len(all_files)  # pruning is real

    ann = knn_ivf_indexed(index, qids, qvecs, k=5, n_probe=3).to_pydict()
    exact = knn_bruteforce(emb, qids, qvecs, k=5).to_pydict()
    es, an = {}, {}
    for q, v in zip(exact["query_id"], exact["vec_id"]):
        es.setdefault(q, set()).add(v)
    for q, v in zip(ann["query_id"], ann["vec_id"]):
        an.setdefault(q, set()).add(v)
    for q in qids:
        assert q in an[q]  # self-hit
    recall = sum(len(an[q] & es[q]) for q in qids) / sum(len(es[q]) for q in qids)
    assert recall >= 0.6


def test_curate_composed_pipeline(ray_session):
    """pipelines.curate chains quality -> langid -> exact dedup ->
    minhash dedup; each stage must bite: short docs drop (min_tokens),
    non-English docs drop (stopword profile), exact and near duplicates
    keep only the min-id representative."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.pipelines.curate import curate

    base = " ".join("w%d" % (i * 17) for i in range(40))
    near = base + " extra"
    docs = [
        (0, base),                          # keeper (cluster rep)
        (1, base),                          # exact dup of 0
        (2, near),                          # near dup of 0
        (3, "short text only"),             # fails min_tokens
        (4, "el la de que y en un una los las por con es " * 4),  # Spanish
        (5, " ".join("q%d" % (i * 31) for i in range(40))),       # keeper
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    out = sorted(r["doc_id"] for r in curate(ds, min_tokens=30).take_all())
    assert out == [0, 5]

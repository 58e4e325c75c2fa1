"""Unit tests for the corpus-curation operators (ops/curation.py).

The driver-facing contracts (exact equality vs the DuckDB oracles) are
gated by tools/check_correctness.py; these tests pin the operator
semantics on tiny planted inputs so refactors can't silently drift.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from scoobie_ray.ops.curation import (
    Decontaminator,
    _flat_token_codes,
    _split_flat,
    _token_counts,
    _unique_token_hashes,
    _window_gram_hashes,
    benchmark_gram_hashes,
    benchmark_ngram_set,
    decontaminate,
    pack_sequences,
    repetition_stats,
    repetition_stats_batch,
    sample_stratified,
    stable_bucket_u64,
)

TRICKY_TEXTS = [
    "a b  c",
    "  x y ",
    "",
    "   ",
    None,
    "one",
    "a\tb\nc  d",
    "héllo wörld héllo",
    "日本 語 日本 語 日本",
    "a a a a a",
]


def test_split_flat_matches_str_split():
    flat, doc_idx, counts = _split_flat(pa.array(TRICKY_TEXTS, pa.string()))
    toks = flat.to_pylist()
    expect = [(t or "").split() for t in TRICKY_TEXTS]
    assert counts.tolist() == [len(e) for e in expect]
    got = [[] for _ in TRICKY_TEXTS]
    for d, tok in zip(doc_idx, toks):
        got[d].append(tok)
    assert got == expect


def test_window_gram_hashes_match_string_grams():
    # hash equality across docs must mirror string-gram equality
    texts = ["a b c d", "x a b c", "b c d a", "a b"]
    codes, doc_idx, counts, uniq = _flat_token_codes(pa.array(texts, pa.string()))
    g, gdoc, m = _window_gram_hashes(_unique_token_hashes(uniq)[codes], counts, 3)
    assert m.tolist() == [2, 2, 2, 0]
    by_doc = {}
    for h, d in zip(g, gdoc):
        by_doc.setdefault(int(d), []).append(int(h))
    # "a b c" appears in docs 0 and 1; "b c d" in docs 0 and 2
    assert by_doc[0][0] == by_doc[1][1]
    assert by_doc[0][1] == by_doc[2][0]
    # all six distinct string grams → check no spurious equality
    assert len({*by_doc[0], *by_doc[1], *by_doc[2]}) == 4


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_benchmark_ngram_set(ray_session):
    bench = _docs_ds([(1, "a b c d"), (2, "b c d e")])
    grams = benchmark_ngram_set(bench, n=3)
    assert grams == {"a b c", "b c d", "c d e"}


def test_decontaminate_counts(ray_session):
    bench = _docs_ds([(100, "x y z")])
    corpus = _docs_ds(
        [
            (1, "x y z q x y z"),  # two hits of "x y z" among 5 3-grams
            (2, "a b c d"),  # clean, 2 grams
            (3, "x y"),  # too short: 0 grams
        ]
    )
    out = (
        decontaminate(corpus, bench, n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_grams"] == 5 and out.loc[1, "n_hits"] == 2
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_hits"] == 0 and not bool(out.loc[2, "contaminated"])
    assert out.loc[3, "n_grams"] == 0 and not bool(out.loc[3, "contaminated"])


def test_decontaminator_accepts_plain_set():
    d = Decontaminator(frozenset({"a b"}), n=2)
    out = d(pa.table({"doc_id": pa.array([7], pa.int64()), "text": ["a b c"]}))
    assert out["n_hits"].to_pylist() == [1]


def test_decontaminator_matches_naive_on_tricky_texts(ray_session):
    texts = [t for t in TRICKY_TEXTS if t is not None]
    bench = _docs_ds([(100, "a b  c"), (101, "héllo wörld"), (102, "日本 語")])
    hashes = benchmark_gram_hashes(bench, n=2)
    grams = benchmark_ngram_set(bench, n=2)
    d = Decontaminator(hashes, n=2)
    out = d(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    for i, t in enumerate(texts):
        toks = (t or "").split()
        m = max(0, len(toks) - 1)
        naive = sum(
            1 for j in range(m) if " ".join(toks[j : j + 2]) in grams
        )
        assert out["n_grams"][i].as_py() == m, t
        assert out["n_hits"][i].as_py() == naive, t


def test_sample_stratified_fast_hash(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(list(range(300)), pa.int64()),
            "lang": pa.array(["en", "es", "de"] * 100, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    out1 = sample_stratified(ds, {"en": 50}, default_pct=20, fast_hash=True).to_pandas()
    out2 = sample_stratified(ds, {"en": 50}, default_pct=20, fast_hash=True).to_pandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    rate = out1["lang"].map({"en": 50}).fillna(20)
    assert (out1["bucket"] < rate).all()
    assert 0 < len(out1) < 300


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stable_bucket_matches_md5_little_endian():
    for key in ("0", "17", "doc-42", ""):
        expect = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little")
        assert stable_bucket_u64(key) == expect


def test_sample_stratified_is_deterministic_and_rate_bound(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(list(range(400)), pa.int64()),
            "lang": pa.array(["en", "es", "de", "fr"] * 100, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    out1 = sample_stratified(ds, {"en": 60, "es": 30}, default_pct=10).to_pandas()
    out2 = sample_stratified(ds, {"en": 60, "es": 30}, default_pct=10).to_pandas()
    # identical row sets across runs (hash-determined, no RNG)
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    # every kept row's bucket is under its stratum's rate
    rate = out1["lang"].map({"en": 60, "es": 30}).fillna(10)
    assert (out1["bucket"] < rate).all()
    # and no qualifying row was dropped
    buckets = np.array([stable_bucket_u64(str(i)) % 100 for i in range(400)])
    rates = np.array([{"en": 60, "es": 30}.get(l, 10) for l in t["lang"].to_pylist()])
    assert len(out1) == int((buckets < rates).sum())


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_prefix_sum(ray_session):
    # token counts 3, 5, 4, 6 -> exclusive prefix 0, 3, 8, 12; budget 10
    rows = [
        (10, "a a a"),
        (11, "b b b b b"),
        (12, "c c c c"),
        (13, "d d d d d d"),
    ]
    out = (
        pack_sequences(_docs_ds(rows), budget=10, num_partitions=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_tokens"].tolist() == [3, 5, 4, 6]
    assert out["seq_id"].tolist() == [0, 0, 0, 1]
    assert out["seq_off"].tolist() == [0, 3, 8, 2]


def test_pack_sequences_sparse_ids_many_partitions(ray_session):
    # non-dense ids across more partitions than docs
    rows = [(5, "x"), (900, "y y"), (40, "z z z")]
    out = (
        pack_sequences(_docs_ds(rows), budget=2, num_partitions=64)
        .to_pandas()
        .sort_values("doc_id")
    )
    # id order 5, 40, 900 -> prefixes 0, 1, 4
    assert out.set_index("doc_id")["seq_id"].to_dict() == {5: 0, 40: 0, 900: 2}
    assert out.set_index("doc_id")["seq_off"].to_dict() == {5: 0, 40: 1, 900: 0}


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------


def test_repetition_stats_batch_counts():
    out = repetition_stats_batch(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["a a a b", "x y", ""],
            }
        )
    )
    row = {k: out[k].to_pylist() for k in out.column_names}
    assert row["n_tokens"] == [4, 2, 0]
    assert row["n_distinct_tokens"] == [2, 2, 0]
    assert row["n_2grams"] == [3, 1, 0]
    # "a a", "a a", "a b" -> 2 distinct, top count 2
    assert row["n_distinct_2grams"] == [2, 1, 0]
    assert row["top_2gram_count"] == [2, 1, 0]


def test_repetition_stats_dataset(ray_session):
    out = repetition_stats(_docs_ds([(1, "w w w")])).to_pandas()
    assert out.loc[0, "top_2gram_count"] == 2


def test_repetition_stats_matches_naive_on_tricky_texts():
    from collections import Counter

    out = repetition_stats_batch(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(TRICKY_TEXTS))), pa.int64()),
                "text": pa.array(TRICKY_TEXTS, pa.string()),
            }
        )
    )
    for i, t in enumerate(TRICKY_TEXTS):
        toks = (t or "").split()
        gc = Counter(zip(toks, toks[1:]))
        assert out["n_tokens"][i].as_py() == len(toks), t
        assert out["n_distinct_tokens"][i].as_py() == len(set(toks)), t
        assert out["n_2grams"][i].as_py() == max(0, len(toks) - 1), t
        assert out["n_distinct_2grams"][i].as_py() == len(gc), t
        assert out["top_2gram_count"][i].as_py() == (max(gc.values()) if gc else 0), t


def test_token_counts_tricky():
    counts = _token_counts(pa.array(TRICKY_TEXTS, pa.string()))
    assert counts.tolist() == [len((t or "").split()) for t in TRICKY_TEXTS]


def test_bloom_no_false_negatives_and_low_fp():
    from scoobie_ray.ops.curation import bloom_contains, build_bloom

    rng = np.random.default_rng(13)
    members = rng.integers(0, 2**63, 50_000).astype(np.uint64)
    bloom = build_bloom(members)
    assert bloom_contains(bloom, members).all()  # never a false negative
    probes = rng.integers(0, 2**63, 50_000).astype(np.uint64)
    fresh = probes[~np.isin(probes, members)]
    fp = bloom_contains(bloom, fresh).mean()
    assert fp < 0.001, fp  # 24 bits/key, k=8 -> ~4e-5 expected


def test_decontaminate_bloom_superset_of_exact(ray_session):
    bench = _docs_ds([(100, "x y z")])
    corpus = _docs_ds([(1, "x y z q"), (2, "a b c d"), (3, "q r s t u")])
    exact = (
        decontaminate(corpus, bench, n=3).to_pandas().set_index("doc_id")
    )
    bloom = (
        decontaminate(corpus, bench, n=3, filter="bloom")
        .to_pandas()
        .set_index("doc_id")
        .reindex(exact.index)
    )
    assert (bloom["contaminated"] | ~exact["contaminated"]).all()
    assert bool(bloom.loc[1, "contaminated"])


def test_pack_sequences_empty_corpus(ray_session):
    import ray.data

    empty = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
    )
    out = pack_sequences(empty, budget=64)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_tokens", "seq_id", "seq_off"}


def test_rebalance_mixture_proportions(ray_session):
    """Target-mixture resampling (r4): output domain shares track the
    target weights; zh/es (absent from the mixture) are dropped entirely;
    re-runs are deterministic (stable md5 bucket)."""
    import ray.data

    from scoobie_ray.ops.curation import rebalance_mixture

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "lang"]
    )
    out = rebalance_mixture(ds, {"en": 6000, "de": 2000, "fr": 2000}).to_pandas()
    shares = out["lang"].value_counts(normalize=True)
    assert set(shares.index) <= {"en", "de", "fr"}
    # hash-threshold sampling keeps ~rate; allow a generous tolerance at
    # this corpus size (the exact row set is oracle-gated, this test pins
    # the SEMANTICS: proportions and domain exclusion)
    assert abs(shares.get("en", 0) - 0.6) < 0.1
    assert abs(shares.get("de", 0) - 0.2) < 0.08
    assert abs(shares.get("fr", 0) - 0.2) < 0.08
    again = rebalance_mixture(
        ray.data.read_parquet(
            "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "lang"]
        ),
        {"en": 6000, "de": 2000, "fr": 2000},
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_rebalance_mixture_empty_and_missing_domains(ray_session):
    """Weights naming no present domain yield an empty result (typed)."""
    import ray.data

    from scoobie_ray.ops.curation import rebalance_mixture

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang"]
    )
    out = rebalance_mixture(ds, {"xx": 10000}).to_pandas()
    assert len(out) == 0


def test_cross_doc_grams_distributed_matches_broadcast(ray_session):
    """The hash-partitioned semi-join regime (forced with
    broadcast_limit=0) returns the identical per-doc dup-window counts as
    the broadcast searchsorted regime."""
    import ray.data

    from scoobie_ray.ops.curation import cross_doc_grams

    def load():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )

    a = (
        cross_doc_grams(load(), n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        cross_doc_grams(load(), n=8, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == 500
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["n_grams"] == b["n_grams"]).all()
    assert (a["n_dup_windows"] == b["n_dup_windows"]).all()
    assert a["n_dup_windows"].sum() > 0  # the corpus DOES contain dups


def test_dedup_substrings_hand_computed(ray_session):
    """Token j is dropped iff covered by a window whose gram appears in
    >= 2 docs; kept tokens re-join with single spaces; fully-duplicated
    docs come back empty; the forced distributed regime (broadcast_limit=0,
    text rides ONE doc-keyed shuffle) matches exactly."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.curation import dedup_substrings

    texts = [
        "a b c d e",  # every 2-gram shared with doc4 -> fully dropped
        "x a b y",  # only "a b" is cross-doc -> "x y"
        "z z",  # unique -> kept
        "",  # empty -> ""
        "a b c d e",  # full dup of doc0 -> fully dropped
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want = [[0, "", 5], [1, "x y", 2], [2, "z z", 0], [3, "", 0], [4, "", 5]]
    for limit in (2_000_000, 0):
        ds = ray.data.from_arrow(t).repartition(3)
        got = (
            dedup_substrings(ds, n=2, broadcast_limit=limit)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert str(got["doc_id"].dtype) == "int64", got.dtypes
        assert got.values.tolist() == want, (limit, got.values.tolist())


def test_prune_rare_tokens_hand_computed(ray_session):
    """Tokens with corpus document frequency below min_df are dropped;
    kept tokens re-join with single spaces; the forced distributed regime
    (broadcast_limit=0) matches — and it is the PRIMARY path at scale
    (the rare set is the vocabulary tail, never a small side)."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.curation import prune_rare_tokens

    # df: a=3, b=2, c=1, d=1 -> min_df=2 drops c and d
    texts = ["a b c", "a b", "a d"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want = [[0, "a b", 1], [1, "a b", 0], [2, "a", 1]]
    for limit in (2_000_000, 0):
        ds = ray.data.from_arrow(t).repartition(2)
        got = (
            prune_rare_tokens(ds, min_df=2, broadcast_limit=limit)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.values.tolist() == want, (limit, got.values.tolist())


def test_remove_tokens_hand_computed(ray_session):
    """Stop-list removal drops exact token matches only (no substrings),
    preserves order, and empties fully-stopworded docs."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.curation import remove_tokens

    texts = ["the cat the mat", "thethe cats", "the the", ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    got = (
        remove_tokens(ds, ["the"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        [0, "cat mat", 2],
        [1, "thethe cats", 0],
        [2, "", 2],
        [3, "", 0],
    ], got.values.tolist()


def test_chunk_documents_hand_computed(ray_session):
    """size=3 stride=2 over 5 tokens → chunks [0,3) [2,5) [4,5); single
    tokens chunk whole; empty/whitespace docs emit nothing; row-local so
    partitioning-invariant."""
    import pyarrow as pa
    import pytest
    import ray.data

    from scoobie_ray.ops.curation import chunk_documents

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e", "x", "", "   "], pa.string()),
        }
    )
    want = [
        [0, 0, "a b c", 3],
        [0, 1, "c d e", 3],
        [0, 2, "e", 1],
        [1, 0, "x", 1],
    ]
    for par in (1, 3):
        ds = ray.data.from_arrow(t).repartition(par)
        got = (
            chunk_documents(ds, size=3, stride=2)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .values.tolist()
        )
        assert got == want, (par, got)
    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_arrow(t), size=3, stride=4)


def test_decontaminate_rewrite_hand_computed(ray_session):
    """Tokens covered by a window sharing a gram with the benchmark are
    dropped; clean docs pass through byte-identical; benchmark docs
    themselves are fully scrubbed (every window is in the set)."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.curation import decontaminate_rewrite

    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["p q r s", "x p q y", "a b c"], pa.string()
            ),
        }
    )
    bench = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": pa.array(["p q"], pa.string())}
    )
    # doc0 windows: "p q","q r","r s"; "p q" in bench -> drops p,q -> "r s"
    # doc1: "x p","p q","q y"; drops p,q -> "x y";  doc2 untouched
    want = [[0, "r s", 2], [1, "x y", 2], [2, "a b c", 0]]
    for limit in (2_000_000, 0):  # 0 forces the co-partitioned regime
        got = (
            decontaminate_rewrite(
                ray.data.from_arrow(corpus).repartition(2),
                ray.data.from_arrow(bench),
                n=2,
                broadcast_limit=limit,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.values.tolist() == want, (limit, got.values.tolist())


def test_cross_doc_grams_max_tokens_guard(ray_session):
    """A document longer than max_tokens fails LOUDLY (the SQL oracle's
    constant generate_series bound would silently under-count past it);
    within the bound the guard is inert."""
    import pytest
    import ray.data

    from scoobie_ray.ops.curation import cross_doc_grams

    long_doc = " ".join(f"t{i}" for i in range(600))
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": long_doc}, {"doc_id": 2, "text": "a b c"}]
    )
    with pytest.raises(Exception, match="max_tokens"):
        cross_doc_grams(ds, n=8, max_tokens=512).to_pandas()
    ok = cross_doc_grams(ds, n=8, max_tokens=1024).to_pandas()
    assert len(ok) == 2


def test_global_shuffle_rank_is_permutation(ray_session):
    """shuffle_pos is exactly 0..N-1 (contiguous across hash-range
    partitions) and deterministic across re-runs."""
    import numpy as np
    import ray.data

    from scoobie_ray.ops.curation import global_shuffle_rank

    def load():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )

    a = global_shuffle_rank(load()).to_pandas().sort_values("doc_id")
    assert sorted(a["shuffle_pos"]) == list(range(500))
    b = global_shuffle_rank(load()).to_pandas().sort_values("doc_id")
    assert (a["shuffle_pos"].to_numpy() == b["shuffle_pos"].to_numpy()).all()
    # the order is a real shuffle, not identity
    by_pos = a.sort_values("shuffle_pos")["doc_id"].to_numpy()
    assert not np.array_equal(by_pos, np.sort(by_pos))

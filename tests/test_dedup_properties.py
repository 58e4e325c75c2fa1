"""Property oracles for the dedup kernels: MinHash estimation accuracy,
shingle determinism, SimHash locality, and union-find cluster resolution
checked against an independent brute-force connected-components oracle."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from scoobie_ray.ops.dedup import (
    _drop_from_pairs,
    char_shingles,
    jaccard,
    jaccard_u64,
    minhash_signature,
    simhash_many,
)

_word_st = st.text(alphabet="abcdefgh ", min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_word_st)
def test_char_shingles_deterministic_and_distinct(text):
    a = char_shingles(text, 5)
    b = char_shingles(text, 5)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == len(a)
    # jaccard with self is 1 (or both empty)
    assert jaccard_u64(a, a) == 1.0


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcdefgh mnopq", min_size=40, max_size=120),
    st.text(alphabet="abcdefgh mnopq", min_size=40, max_size=120),
)
def test_minhash_estimates_true_jaccard(t1, t2):
    s1, s2 = char_shingles(t1, 5), char_shingles(t2, 5)
    if len(s1) == 0 or len(s2) == 0:
        return
    m1 = minhash_signature(s1, 256)
    m2 = minhash_signature(s2, 256)
    est = float((m1 == m2).mean())
    true = jaccard_u64(s1, s2)
    assert abs(est - true) < 0.2  # 256 permutations: s.e. ~ sqrt(j(1-j)/256)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcde ", min_size=1, max_size=40), min_size=1, max_size=8))
def test_simhash_batch_deterministic_and_selfconsistent(texts):
    a = simhash_many(texts)
    b = simhash_many(texts)
    assert np.array_equal(a, b)
    # identical texts in the same batch get identical signatures
    dup = simhash_many([texts[0], texts[0]])
    assert dup[0] == dup[1]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
def test_union_find_drop_set_matches_components_oracle(ray_session, pairs):
    """Survivors of _drop_from_pairs = min id of each connected component
    over the pair graph (checked against an independent BFS oracle)."""
    ids = list(range(31))

    # independent oracle: BFS connected components
    adj = {i: set() for i in ids}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    seen, keep = set(), set()
    for i in ids:
        if i in seen:
            continue
        comp, stack = [], [i]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            comp.append(v)
            stack.extend(adj[v] - seen)
        keep.add(min(comp))

    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    survivors = sorted(r["doc_id"] for r in _drop_from_pairs(ds, pairs, "doc_id").take_all())
    assert survivors == sorted(keep)


def test_distributed_cc_matches_driver_union_find(ray_session):
    """_cc_labels (hash-min label propagation, the no-driver scale path)
    assigns every node its component-min label — checked against the
    driver union-find on a chain + star + singleton mix whose diameter
    forces several propagation rounds."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.dedup import _cc_labels

    # chain 0-1-2-...-19 (diameter 19, exercises pointer jumping),
    # star 100<->101..110, pair (200, 201)
    pairs = [(i, i + 1) for i in range(19)]
    pairs += [(100, m) for m in range(101, 111)]
    pairs += [(200, 201)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    labels = {r["n"]: r["l"] for r in _cc_labels(ds).take_all()}
    for i in range(20):
        assert labels[i] == 0
    for m in range(100, 111):
        assert labels[m] == 100
    assert labels[200] == 200 and labels[201] == 200


def test_high_dup_rate_corpus_distributed_resolution(ray_session):
    """A >=50% duplicate corpus: forcing broadcast_resolve_limit=0 (and a
    tiny pair-broadcast limit) must route through the distributed
    connected-components + co-partitioned anti-join path and keep exactly
    one representative (min doc_id) per planted cluster — identical to
    the default broadcast resolution."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.dedup import minhash_dedup, simhash_dedup

    # 40 clusters x 5 identical docs + 50 unique docs = 250 docs, 80% dup;
    # cluster vocabularies are disjoint so only planted dups are similar
    ids, texts = [], []
    k = 0
    for c in range(40):
        t = " ".join("word%d" % (c * 97 + i * 13) for i in range(30))
        for _ in range(5):
            ids.append(k)
            texts.append(t)
            k += 1
    for u in range(50):
        ids.append(k)
        texts.append(" ".join("uniq%d" % (10_000 + u * 83 + i * 7) for i in range(30)))
        k += 1
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
    )

    expected = sorted(
        r["doc_id"]
        for r in minhash_dedup(ds, threshold=0.8).take_all()
    )
    assert len(expected) == 90  # 40 representatives + 50 uniques

    forced = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            ds, threshold=0.8, broadcast_resolve_limit=0
        ).take_all()
    )
    assert forced == expected

    sh_expected = sorted(r["doc_id"] for r in simhash_dedup(ds).take_all())
    sh_forced = sorted(
        r["doc_id"]
        for r in simhash_dedup(ds, broadcast_resolve_limit=0).take_all()
    )
    assert sh_forced == sh_expected


def test_attach_verify_path_matches_broadcast(ray_session):
    """Forcing broadcast_pair_limit=0 routes minhash/ngram through the
    partition-wise shuffle-attach verify (the huge-pair-count path, which
    had no coverage before r3); survivors must equal the default
    broadcast-verify path exactly."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.dedup import _near_dedup_lsh, _minhash_bands_fn, char_shingles, jaccard_u64, minhash_dedup

    ids, texts = [], []
    k = 0
    for c in range(20):
        t = " ".join("tok%d" % (c * 101 + i * 17) for i in range(25))
        for _ in range(4):
            ids.append(k)
            texts.append(t)
            k += 1
    for u in range(30):
        ids.append(k)
        texts.append(" ".join("only%d" % (5000 + u * 91 + i * 11) for i in range(25)))
        k += 1
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
    )
    expected = sorted(r["doc_id"] for r in minhash_dedup(ds, threshold=0.8).take_all())
    assert len(expected) == 50
    forced = _near_dedup_lsh(
        ds,
        _minhash_bands_fn(64, 16, 5, "doc_id", "text"),
        "doc_id",
        "text",
        prepare=lambda t: char_shingles(t, 5),
        accept=lambda sa, sb: jaccard_u64(sa, sb) >= 0.8,
        broadcast_pair_limit=0,
    )
    assert sorted(r["doc_id"] for r in forced.take_all()) == expected


def test_attach_verify_path_string_ids(ray_session):
    """The shuffle-attach path must preserve string id dtypes end-to-end
    (ids ride typed _pid columns, never parsed from the pair key)."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.dedup import _near_dedup_lsh, _minhash_bands_fn, char_shingles, jaccard_u64

    ids = [f"doc-{i:03d}" for i in range(40)]
    texts = []
    for i in range(40):
        base = i // 2  # consecutive pairs share text -> 20 clusters of 2
        texts.append(" ".join("w%d" % (base * 131 + j * 19) for j in range(25)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.string()), "text": pa.array(texts, pa.string())})
    )
    out = _near_dedup_lsh(
        ds,
        _minhash_bands_fn(64, 16, 5, "doc_id", "text"),
        "doc_id",
        "text",
        prepare=lambda t: char_shingles(t, 5),
        accept=lambda sa, sb: jaccard_u64(sa, sb) >= 0.8,
        broadcast_pair_limit=0,
    )
    surv = sorted(r["doc_id"] for r in out.take_all())
    assert surv == [f"doc-{i:03d}" for i in range(0, 40, 2)]
    assert all(isinstance(s, str) for s in surv)


def test_distributed_resolution_string_ids(ray_session):
    """Distributed CC + co-partitioned anti-join with STRING ids (label
    min is lexicographic; hash partitioning via the Arrow string hash)."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.dedup import minhash_dedup

    ids, texts = [], []
    for c in range(12):
        t = " ".join("tok%d" % (c * 211 + i * 23) for i in range(25))
        for j in range(4):
            ids.append(f"d{c:02d}-{j}")
            texts.append(t)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.string()), "text": pa.array(texts, pa.string())})
    )
    expected = sorted(
        r["doc_id"] for r in minhash_dedup(ds, threshold=0.8).take_all()
    )
    assert expected == [f"d{c:02d}-0" for c in range(12)]
    forced = sorted(
        r["doc_id"]
        for r in minhash_dedup(ds, threshold=0.8, broadcast_resolve_limit=0).take_all()
    )
    assert forced == expected


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40),
        min_size=1,
        max_size=30,
    ),
    st.integers(0, 10),
)
def test_string_hash_chunk_slice_invariant(strs, offset):
    """util.hash_string_array_u64 must be a pure function of the VALUE:
    identical across chunking, slicing, large_string storage, and
    neighboring values (buffer views must not leak across offsets)."""
    import pyarrow as pa

    from scoobie_ray.util import hash_string_array_u64

    base = hash_string_array_u64(pa.array(strs, pa.string()))
    # chunked in two
    cut = len(strs) // 2
    chunked = pa.chunked_array(
        [pa.array(strs[:cut], pa.string()), pa.array(strs[cut:], pa.string())]
    )
    assert (hash_string_array_u64(chunked) == base).all()
    # sliced view with junk neighbors
    padded = pa.array(["#pad#"] * offset + strs + ["#tail#"], pa.string())
    sliced = padded.slice(offset, len(strs))
    assert (hash_string_array_u64(sliced) == base).all()
    # large_string storage
    assert (hash_string_array_u64(pa.array(strs, pa.large_string())) == base).all()
    # equal values hash equal; hashing is deterministic across calls
    assert (hash_string_array_u64(pa.array(strs, pa.string())) == base).all()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    ).filter(lambda ps: any(a != b for a, b in ps))
)
def test_cc_labels_matches_bfs_oracle(ray_session, pairs):
    """Distributed hash-min connected components == BFS components on
    random pair graphs (self-loops dropped; arbitrary chain/star/cycle
    shapes)."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.ops.dedup import _cc_labels

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    # BFS oracle
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect: dict[int, int] = {}
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            comp.append(v)
            stack.extend(adj[v] - seen)
        m = min(comp)
        for v in comp:
            expect[v] = m

    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    got = {r["n"]: r["l"] for r in _cc_labels(ds).take_all()}
    assert got == expect


# ---------------------------------------------------------------------------
# r4 (VERDICT item 3): complete-graph in-bucket candidates for ALL dedup
# families — the shared _sorted_bucket_pair_idx kernel plus a planted
# B–C pair whose bucket-min hub is dissimilar to both.


@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=200),
)
@settings(max_examples=60, deadline=None)
def test_sorted_bucket_pair_idx_complete_below_cap(keys):
    """For buckets ≤ full_cap the emitted index pairs are EXACTLY the
    complete in-bucket pair graph (the all-pairs oracle semantics)."""
    from scoobie_ray.ops.dedup import _sorted_bucket_pair_idx

    bk = np.sort(np.asarray(keys, dtype=np.uint64))
    a_idx, b_idx = _sorted_bucket_pair_idx(bk, full_cap=250, window=8)
    got = set(zip(a_idx.tolist(), b_idx.tolist()))
    expect = {
        (i, j)
        for i in range(len(bk))
        for j in range(i + 1, len(bk))
        if bk[i] == bk[j]
    }
    assert got == expect


def test_sorted_bucket_pair_idx_star_window_above_cap():
    """Above the cap: every row pairs with the bucket-min (star) and its 8
    trailing neighbours (window); the complete graph is NOT emitted."""
    from scoobie_ray.ops.dedup import _sorted_bucket_pair_idx

    n = 40  # one bucket, > _FULL_CAP=32
    bk = np.zeros(n, dtype=np.uint64)
    a_idx, b_idx = _sorted_bucket_pair_idx(bk)
    got = set(zip(a_idx.tolist(), b_idx.tolist()))
    expect = {(max(0, j - w), j) for j in range(1, n) for w in range(1, 9)} | {
        (0, j) for j in range(1, n)
    }
    assert got == expect
    assert (20, 35) not in got  # id-gap beyond the window, not the hub


def test_embedding_dedup_planted_pair_dissimilar_hub(ray_session):
    """A planted true pair B–C in a bucket whose min-id member A is within
    threshold of NEITHER: the r3 star-only verify missed it (embedding has
    a single banding, so no other bucket could catch it); the r4
    complete-graph rule must drop C."""
    import pandas as pd
    import ray.data

    from scoobie_ray.ops.dedup import _HyperplaneLSH, embedding_dedup

    dim = 8
    planes = _HyperplaneLSH(dim, n_bits=1).planes[:, 0]
    p = planes / np.linalg.norm(planes)
    e1 = np.zeros(dim, dtype=np.float32)
    e1[0] = 1.0
    q = e1 - (e1 @ p) * p
    q = q / np.linalg.norm(q)
    b_vec = p
    c_vec = p + 0.01 * q  # cos(B, C) ≈ 1.0
    a_vec = p * np.linalg.norm(planes) + 5.0 * q  # same sign bucket, cos < 0.95
    assert a_vec @ planes > 0 and b_vec @ planes > 0 and c_vec @ planes > 0
    cos_ab = (a_vec @ b_vec) / np.linalg.norm(a_vec)
    assert cos_ab < 0.95

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.array([1, 2, 3], dtype=np.int64),
                "embedding": [a_vec.tolist(), b_vec.tolist(), c_vec.tolist()],
            }
        )
    )
    kept = sorted(r["vec_id"] for r in embedding_dedup(ds, dim=dim, n_bits=1).take_all())
    assert kept == [1, 2]


def test_jaccard_u64_many_matches_scalar():
    """The batched broadcast-verify kernel equals per-pair jaccard_u64."""
    from scoobie_ray.ops.dedup import char_shingles, jaccard_u64, jaccard_u64_many

    texts = ["abcdefgh", "abcdefgx", "zzzzzzzz", "", "abc"]
    sks = [char_shingles(t, 5) for t in texts]
    a = sks[0]
    got = jaccard_u64_many(a, sks)
    expect = np.array([jaccard_u64(a, b) for b in sks])
    assert np.allclose(got, expect)
    assert np.allclose(jaccard_u64_many(char_shingles("", 5), [sks[3]]), [1.0])
    assert len(jaccard_u64_many(a, [])) == 0

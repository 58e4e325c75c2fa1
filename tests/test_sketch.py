"""Unit tests for the sketch / corpus-statistics ops (ops/sketch.py).

The driver-facing contracts (top_tokens / len_quantiles /
vocab_distinct vs DuckDB) are gated by tools/check_correctness.py;
these pin the kernel semantics — quantile_disc index parity, HLL
accuracy in the real estimation regime (beyond the fixture's tiny
vocabulary), combiner correctness across many blocks.
"""

import duckdb
import numpy as np
import pyarrow as pa

from scoobie_ray.ops.sketch import (
    _hll_registers,
    hll_distinct,
    quantiles_disc,
    token_counts,
    top_k_tokens,
)


def _docs_ds(texts, parallelism=4):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(parallelism)


def test_token_counts_match_duckdb(ray_session):
    texts = ["a b  a", " c a ", "", "b\tb\nc", "  "]
    got = token_counts(_docs_ds(texts)).to_pandas()
    want = duckdb.sql(
        r"""
        SELECT token, CAST(COUNT(*) AS BIGINT) n
        FROM (SELECT unnest(string_split_regex(text, '\s+')) token
              FROM (SELECT unnest(?) AS text))
        WHERE token <> '' GROUP BY 1
        """,
        params=[texts],
    ).fetchdf()
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, want.values.tolist())
    )


def test_top_k_deterministic_tie_break(ray_session):
    # b and c tie at 2; token-asc breaks the tie
    got = top_k_tokens(_docs_ds(["a a a", "b b", "c c"]), 2).to_pandas()
    assert got.values.tolist() == [["a", 3], ["b", 2]]


def test_quantiles_match_duckdb_index_semantics(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, 1001).tolist()
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})
    ).repartition(6)
    qs = [0.0, 0.1, 0.33, 0.5, 0.66, 0.9, 1.0]
    got = quantiles_disc(ds, "v", qs).to_pandas()
    want = [
        duckdb.sql(
            "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)",
            params=[q, vals],
        ).fetchone()[0]
        for q in qs
    ]
    assert got["val"].tolist() == want


def test_quantiles_ceil_rank_divergent_case(ray_session):
    # n=10, q=0.75: ceil(q*n)-1 = 7 (value 8) while the plausible-but-
    # wrong floor(q*(n-1)) = 6 (value 7) — DuckDB returns 8
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(list(range(1, 11)), pa.int64())})
    )
    got = quantiles_disc(ds, "v", [0.75]).to_pandas()
    assert got["val"].tolist() == [8]
    assert (
        duckdb.sql(
            "SELECT quantile_disc(v, 0.75) FROM (SELECT unnest(range(1, 11)) v)"
        ).fetchone()[0]
        == 8
    )


def test_grouped_quantiles_match_duckdb(ray_session):
    from scoobie_ray.ops.sketch import grouped_quantiles_disc

    rng = np.random.default_rng(9)
    gs = rng.integers(0, 5, 800)
    vs = rng.integers(0, 40, 800)
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([f"g{x}" for x in gs], pa.string()),
                "v": pa.array(vs, pa.int64()),
            }
        )
    ).repartition(6)
    got = grouped_quantiles_disc(ds, "g", "v", [0.25, 0.5, 0.9]).to_pandas()
    want = duckdb.sql(
        """
        SELECT g, q_pct, val FROM (
          SELECT g, 25 q_pct, CAST(quantile_disc(v, 0.25) AS BIGINT) val
          FROM (SELECT unnest(?) g, unnest(?) v) GROUP BY g
          UNION ALL
          SELECT g, 50, CAST(quantile_disc(v, 0.5) AS BIGINT)
          FROM (SELECT unnest(?) g, unnest(?) v) GROUP BY g
          UNION ALL
          SELECT g, 90, CAST(quantile_disc(v, 0.9) AS BIGINT)
          FROM (SELECT unnest(?) g, unnest(?) v) GROUP BY g
        )
        """,
        params=[[f"g{x}" for x in gs], vs.tolist()] * 3,
    ).fetchdf()
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, want.values.tolist())
    )


def test_hll_accurate_in_estimation_regime(ray_session):
    # 200k distinct tokens — far past linear counting; p=14 gives a
    # ~0.8% standard error, so 3% is a generous determinism-safe bound
    texts = [
        " ".join(f"tok{i}" for i in range(j, j + 100))
        for j in range(0, 200_000, 100)
    ]
    ds = _docs_ds(texts, parallelism=8)
    est = hll_distinct(ds)
    assert abs(est - 200_000) / 200_000 < 0.03, est


def test_hll_merge_equals_whole_corpus_sketch(ray_session):
    # deterministic hashing makes shard-sketch merges EXACT: merging the
    # sketches of two disjoint halves reproduces the full-corpus estimate
    from scoobie_ray.ops.sketch import hll_estimate, hll_merge, hll_registers_ds

    texts = [" ".join(f"w{i}" for i in range(j, j + 50)) for j in range(0, 20_000, 50)]
    whole = hll_estimate(hll_registers_ds(_docs_ds(texts, 6)))
    merged = hll_estimate(
        hll_merge(
            hll_registers_ds(_docs_ds(texts[: len(texts) // 2], 3)),
            hll_registers_ds(_docs_ds(texts[len(texts) // 2 :], 3)),
        )
    )
    assert merged == whole


def test_hll_register_ranks():
    # top-14 bits -> register; rank = leading zeros of the rest + 1
    h = np.array(
        [0x0000000000000000, 0xFFFFFFFFFFFFFFFF, 1 << 50, 1 << 49],
        dtype=np.uint64,
    )
    reg, rank = _hll_registers(h)
    assert reg.tolist() == [0, (1 << 14) - 1, 1, 0]
    # 0 -> all 50 remaining bits zero -> max rank 51; all-ones -> rank 1;
    # 1<<50 -> register 1 with zero remainder (left-shift wraps) -> 51;
    # 1<<49 -> remainder's top bit set -> rank 1
    assert rank.tolist() == [51, 1, 51, 1]


def test_token_counts_object_store_stress(ray_session):
    """Regression for the r4 silent-corruption find: pyarrow 16 utf8 split
    kernels return wrong tokens (dropped separators — 'a ' / ' ' tokens)
    on raw Ray object-store buffers, nondeterministically (~35% of runs
    before the util.compact_strings fix).  25 repetitions catch a
    regression with overwhelming probability."""
    texts = ["a b  a", " c a ", "", "b\tb\nc", "  "]
    want = [("a", 3), ("b", 3), ("c", 2)]
    for _ in range(25):
        got = sorted(
            map(tuple, token_counts(_docs_ds(texts)).to_pandas().values.tolist())
        )
        assert got == want, got


def test_bottomk_sample_merge_equals_global(ray_session):
    """Bottom-k of per-block bottom-ks == global bottom-k (mergeability),
    regardless of partitioning; quantiles are deterministic."""
    import numpy as np
    import ray.data

    from scoobie_ray.ops.curation import stable_bucket_u64
    from scoobie_ray.ops.sketch import bottomk_sample, sampled_quantiles

    def load(par):
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"]
        ).repartition(par)

    h1, v1 = bottomk_sample(load(2), "doc_id", "n_chars", k=64)
    h2, v2 = bottomk_sample(load(13), "doc_id", "n_chars", k=64)
    assert np.array_equal(h1, h2) and np.array_equal(v1, v2)
    # equals the driver-side exact bottom-64 by the same hash
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"]
    )
    h = np.array([stable_bucket_u64(str(x)) for x in t["doc_id"].to_pylist()], dtype=np.uint64)
    order = np.argsort(h)[:64]
    assert np.array_equal(h1, h[order])
    assert np.array_equal(v1, t["n_chars"].to_numpy()[order])
    qa = sampled_quantiles(load(2), "doc_id", "n_chars", [0.5], k=64)
    qb = sampled_quantiles(load(13), "doc_id", "n_chars", [0.5], k=64)
    assert qa.equals(qb)


def _docs_ids_ds(texts, parallelism=4):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(parallelism)


def test_token_doc_freq_hand_computed(ray_session):
    from scoobie_ray.ops.sketch import token_doc_freq

    texts = ["a b a", "a c", "", "b b", "  "]
    got = sorted(
        map(tuple, token_doc_freq(_docs_ids_ds(texts)).to_pandas().values.tolist())
    )
    assert got == [("a", 2), ("b", 2), ("c", 1)], got


def test_tfidf_top_semantics(ray_session):
    """argmax tf/df; ties tf desc then token asc; empty docs emit no row;
    result is partitioning-invariant."""
    from scoobie_ray.ops.sketch import tfidf_top

    # doc 0: 'a' tf=2 df=3 (ratio 2/3), 'b' tf=1 df=1 (ratio 1) -> b
    # doc 1: 'a' tf=1 df=3, 'c' tf=1 df=1 -> c
    # doc 2: only 'a' -> a;  doc 3: empty -> no row
    # doc 4: 'd' and 'e' both tf=1 df=1 -> token asc -> d
    texts = ["a a b", "a c", "a", "", "e d"]
    for par in (1, 3):
        got = (
            tfidf_top(_docs_ids_ds(texts, par))
            .to_pandas()
            .sort_values("doc_id")
            .values.tolist()
        )
        assert got == [
            [0, "b", 1, 1],
            [1, "c", 1, 1],
            [2, "a", 1, 3],
            [4, "d", 1, 1],
        ], got


def test_grouped_hll_merge_exact_and_bounded(ray_session):
    """Per-group HLL: merging shard sketches (union + groupby max) is
    bit-identical to sketching the whole corpus, and the estimate lands
    within 2% of the exact per-group distinct counts."""
    import ray.data

    from scoobie_ray.ops.sketch import (
        grouped_distinct_tokens,
        grouped_hll_distinct,
        grouped_hll_registers_ds,
    )

    t = pa.table(
        {
            "lang": pa.array(
                ["en"] * 3 + ["de"] * 2, pa.string()
            ),
            "text": pa.array(
                ["a b c d", "c d e", "f", "x y", "y z w"], pa.string()
            ),
        }
    )
    whole = ray.data.from_arrow(t)
    shard1 = ray.data.from_arrow(t.slice(0, 2))
    shard2 = ray.data.from_arrow(t.slice(2))
    one = (
        grouped_hll_registers_ds(whole, "lang")
        .to_pandas()
        .sort_values(["lang", "register"])
        .reset_index(drop=True)
    )
    merged = (
        grouped_hll_registers_ds(shard1, "lang")
        .union(grouped_hll_registers_ds(shard2, "lang"))
        .groupby(["lang", "register"])
        .max("rank")
        .to_pandas()
    )
    merged.columns = ["lang", "register", "rank"]
    merged = merged.sort_values(["lang", "register"]).reset_index(drop=True)
    assert merged.equals(one), (merged, one)

    est = grouped_hll_distinct(whole, "lang")
    exact = dict(
        zip(*grouped_distinct_tokens(whole, "lang").to_pandas().values.T.tolist())
    )
    assert exact == {"de": 4, "en": 6}, exact
    for g, n in exact.items():
        assert abs(est[g] - n) / n <= 0.02, (g, est[g], n)


def test_tfidf_top_forced_distributed(ray_session):
    """broadcast_limit=0 forces the co-partitioned df-join regime (the
    cross_doc_grams pattern); it must agree with the broadcast regime
    row-for-row, with int64 ids intact (a null-padded df side would
    degrade ids to float64) — the dedup driver_limit=0 test shape."""
    from scoobie_ray.ops.sketch import tfidf_top

    texts = ["a a b", "a c", "a", "", "e d", "f f g a", "c c b"]
    want = (
        tfidf_top(_docs_ids_ds(texts, 3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        tfidf_top(_docs_ids_ds(texts, 3), broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[want.columns]
    )
    assert str(got["doc_id"].dtype) == "int64", got.dtypes
    assert got.equals(want), (got, want)


def test_bigram_counts_boundary_masking(ray_session):
    """Pairs never straddle a document boundary; whitespace runs merge;
    result is partitioning-invariant."""
    from scoobie_ray.ops.sketch import bigram_counts, top_k_bigrams

    texts = ["a b  c", " b c ", "x", ""]
    want = [("a b", 1), ("b c", 2)]  # no 'c b' across docs, no 'x ?' pair
    for par in (1, 4):
        got = sorted(
            map(
                tuple,
                bigram_counts(_docs_ids_ds(texts, par)).to_pandas().values.tolist(),
            )
        )
        assert got == want, got
    top = top_k_bigrams(_docs_ids_ds(texts), 1).to_pandas().values.tolist()
    assert top == [["b c", 2]], top


def test_type_token_counts(ray_session):
    from scoobie_ray.ops.sketch import type_token_counts

    texts = ["a b a", "c", "", "  "]
    got = sorted(
        map(
            tuple,
            type_token_counts(_docs_ids_ds(texts)).to_pandas().values.tolist(),
        )
    )
    assert got == [(0, 2, 3), (1, 1, 1)], got  # empty docs emit no row


def test_lang_top_tokens_grouped_topk(ray_session):
    import ray.data

    from scoobie_ray.ops.sketch import lang_top_tokens

    t = pa.table(
        {
            "lang": pa.array(["en", "en", "de"], pa.string()),
            "text": pa.array(["a a b c", "b c", "x y y"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = lang_top_tokens(ds, 2).to_pandas().values.tolist()
    # en: a=2 b=2 c=2 -> ties token asc -> a, b; de: y=2, x=1
    assert got == [["de", "y", 2], ["de", "x", 1], ["en", "a", 2], ["en", "b", 2]], got

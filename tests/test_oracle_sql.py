"""Every oracle SQL string must execute against the registered views —
a cheap guard against SQL regressions (the full value comparison runs in
tools/check_correctness.py and the driver's gate)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_all_oracles_execute(con):
    import __ray_entry__ as e

    oracles = e.oracle_sql()
    queries = e.queries()
    assert set(oracles) <= set(queries), "oracle without a matching query"
    for name, sql in oracles.items():
        df = con.execute(sql).fetchdf()
        assert len(df.columns) > 0, name


def test_rows_only_set_is_intentional():
    import __ray_entry__ as e

    rows_only = set(e.queries()) - set(e.oracle_sql())
    # dedup_minhash / dedup_ngram gained LSH-free all-pairs oracles and
    # dedup_simhash an exact bit-level oracle in r2; the rest remain
    # genuinely non-SQL-expressible (hyperplane LSH needs the gaussian
    # plane matrix, POS heuristics, float relevance).  Every rows-only
    # entry is BOUNDED by an oracle-gated companion: knn_lsh/knn_ivf by
    # the knn_*_recall gates, np_chunks by doc_pos_np, and (r4) kg_rated's
    # rating stage by kg_rated_rank (integer per-doc ranks, hash-exact).
    assert rows_only == {
        "knn_lsh",
        "knn_ivf",
        "np_chunks",
        "kg_rated",
    }

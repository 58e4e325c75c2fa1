"""The north-rule P/R gate, end to end: engine triples vs an independent
SQL derivation of the expected set (DuckDB oracle), scored with the
evaluate module — P/R must be ≥ 0.95 (measured: 1.0)."""

import duckdb
import pytest

from scoobie_ray.evaluate import linking_pr, spotting_pr, triples_pr
from scoobie_ray.oracle import ORACLES

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
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_triples_pr_gate(ray_session, oracle_con):
    from scoobie_ray.pipelines.views import kg_triples

    engine = kg_triples(SF).to_pandas()
    gold = oracle_con.execute(ORACLES["kg_triples"]).fetchdf()
    pr = triples_pr(engine, gold)
    assert pr.precision >= 0.95 and pr.recall >= 0.95
    assert pr.f1 == 1.0  # exact on the deterministic corpus


def test_spotting_pr_gate(ray_session, oracle_con):
    from scoobie_ray.pipelines.views import kg_spot

    engine = kg_spot(SF).to_pandas()
    gold = oracle_con.execute(ORACLES["kg_spot"]).fetchdf()
    pr = spotting_pr(engine, gold)
    assert pr.f1 == 1.0


def test_linking_pr_gate(ray_session, oracle_con):
    from scoobie_ray.pipelines.views import kg_resolved

    engine = kg_resolved(SF).to_pandas()
    gold = oracle_con.execute(ORACLES["kg_resolved"]).fetchdf()
    pr = linking_pr(engine, gold)
    assert pr.f1 == 1.0


def test_evaluate_corpus_report(ray_session):
    from scoobie_ray.evaluate import evaluate_corpus

    report = evaluate_corpus(SF)
    assert set(report) == {"spotting", "linking", "triples"}
    assert all(pr.f1 == 1.0 for pr in report.values())

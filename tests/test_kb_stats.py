"""KB statistics layer + distributed KB-build job tests."""

import pyarrow as pa
import pytest

from scoobie_ray.kb.bundle import KBIndex
from scoobie_ray.kb.stats import (
    coverage_ambiguity,
    document_frequency,
    property_kinds,
    proper_name_ratings,
    regex_distributions,
)
from scoobie_ray.sources.fixtures import kg_kb, smoke_kb, smoke_docs


@pytest.fixture(scope="module")
def kb001():
    return kg_kb("/root/testdata/sf0.001")


def test_regex_distributions(kb001):
    # every alias literal matches Holder_\d+; no other label does
    t = regex_distributions(kb001, {"HOLDER": r"Holder_\d+"}, threshold=0.0)
    uris = kb001.resources["uri"].to_pylist()
    rows = {
        (r["regex_name"], uris[r["predicate"]]): r["ratio"] for r in t.to_pylist()
    }
    label = "http://www.w3.org/2000/01/rdf-schema#label"
    # 150 customers contribute 50 distinct aliases + 150 names; nations,
    # regions, suppliers add the rest -> ratio strictly between 0 and 1
    assert 0.0 < rows[("HOLDER", label)] < 1.0
    # with the reference threshold 0.9 nothing survives
    assert regex_distributions(kb001, {"HOLDER": r"Holder_\d+"}).num_rows == 0


def test_coverage_ambiguity(kb001):
    idx = KBIndex(kb001)
    t = coverage_ambiguity(kb001)
    cust = idx.uri_index("http://example.org/ont/Customer")
    label_p = idx.uri_index("http://www.w3.org/2000/01/rdf-schema#label")
    row = next(
        r
        for r in t.to_pylist()
        if r["type"] == cust and r["predicate"] == label_p
    )
    assert row["coverage"] == pytest.approx(1.0)  # every customer has labels
    # aliases are shared by ~3 customers -> mean ambiguity > 1
    assert row["ambiguity"] > 1.0


def test_property_kinds(kb001):
    idx = KBIndex(kb001)
    t = dict(
        zip(t2 := property_kinds(kb001)["predicate"].to_pylist(),
            property_kinds(kb001)["kind"].to_pylist())
    )
    label_p = idx.uri_index("http://www.w3.org/2000/01/rdf-schema#label")
    based = idx.uri_index("http://example.org/ont/basedIn")
    assert t[label_p] == "datatype"
    assert t[based] == "object"


def test_document_frequency_and_ratings(ray_session, kb001):
    import ray.data

    docs = ray.data.from_arrow(smoke_docs())
    kb = smoke_kb()
    df = document_frequency(docs, KBIndex(kb), concurrency=1)
    idx = KBIndex(kb)
    df_map = dict(zip(df["literal"].to_pylist(), df["df"].to_pylist()))
    percy = idx.literal_index("Percy Jackson")
    assert df_map[percy] == 1  # appears in one of the two smoke docs
    ratings = proper_name_ratings(kb, doc_freq=df, n_docs=2)
    assert ratings.num_rows > 0
    assert all(r["rating"] >= 0 for r in ratings.to_pylist())


def test_kb_build_job_matches_driver_build(ray_session):
    import ray.data

    from scoobie_ray.kb.build import build_kb_from_triples
    from scoobie_ray.kb.parser import clean_triples
    from scoobie_ray.pipelines.kb_build import build_kb_job, parse_ntriples_dataset
    from scoobie_ray.sources.fixtures import SMOKE_TRIPLES

    lines = []
    for s, p, o, is_lit in SMOKE_TRIPLES:
        if is_lit:
            lines.append(f'<{s}> <{p}> "{o}" .')
        else:
            lines.append(f"<{s}> <{p}> <{o}> .")
    text_ds = ray.data.from_items([{"text": ln} for ln in lines])
    job_bundle = build_kb_job(parse_ntriples_dataset(text_ds))
    ref_bundle = smoke_kb()
    assert job_bundle.resources.equals(ref_bundle.resources)
    assert job_bundle.literals.equals(ref_bundle.literals)
    assert (
        job_bundle.symbols.sort_by([("subject", "ascending"), ("predicate", "ascending"), ("object", "ascending")])
        .equals(
            ref_bundle.symbols.sort_by([("subject", "ascending"), ("predicate", "ascending"), ("object", "ascending")])
        )
    )

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


def test_coverage_counts_multityped_matches_bruteforce():
    """The vectorized symbols x subject-types explode must equal the
    brute-force per-row loop on multi-typed subjects with repeated
    (subject, type) rows (raw-row semantics, no dedupe) and shared
    literals (ambiguity > 1)."""
    import numpy as np
    import pyarrow as pa

    from scoobie_ray.kb.bundle import KBBundle
    from scoobie_ray.kb.stats import coverage_ambiguity_counts

    rng = np.random.default_rng(23)
    subj, typ = [], []
    for s in range(30):
        for t in rng.choice(5, size=rng.integers(1, 4), replace=False):
            subj.append(s)
            typ.append(50 + int(t))
    # a repeated (subject, type) row — original loop double-counts it
    subj.append(0)
    typ.append(typ[0])
    n_sym = 90
    ss = rng.integers(0, 30, n_sym)
    pp = rng.integers(90, 93, n_sym)
    oo = rng.integers(0, 20, n_sym)  # shared literals
    kb = KBBundle.from_tables(
        {
            "resources": pa.table({"index": pa.array([], pa.int64()), "uri": pa.array([], pa.string())}),
            "literals": pa.table({"index": pa.array([], pa.int64()), "literal": pa.array([], pa.string()), "prefix": pa.array([], pa.int64())}),
            "symbols": pa.table({"subject": pa.array(ss, pa.int64()), "predicate": pa.array(pp, pa.int64()), "object": pa.array(oo, pa.int64())}),
            "relations": pa.table({"subject": pa.array([], pa.int64()), "predicate": pa.array([], pa.int64()), "object": pa.array([], pa.int64())}),
            "types": pa.table({"subject": pa.array(subj, pa.int64()), "type": pa.array(typ, pa.int64())}),
            "type_clusters": pa.table({"type": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}),
            "markov": pa.table({"cluster_s": pa.array([], pa.int64()), "predicate": pa.array([], pa.int64()), "cluster_o": pa.array([], pa.int64()), "prob": pa.array([], pa.float64())}),
            "cardinalities": pa.table({"predicate": pa.array([], pa.int64()), "subj_card": pa.array([], pa.float64()), "obj_card": pa.array([], pa.float64())}),
        }
    )
    got = coverage_ambiguity_counts(kb)

    # brute force (the pre-r3 loop)
    type_of: dict[int, list[int]] = {}
    for s, t in zip(subj, typ):
        type_of.setdefault(s, []).append(t)
    lit_subjects: dict[int, set[int]] = {}
    for s, o in zip(ss.tolist(), oo.tolist()):
        lit_subjects.setdefault(o, set()).add(s)
    cov: dict[tuple[int, int], set] = {}
    amb_sum: dict[tuple[int, int], int] = {}
    amb_n: dict[tuple[int, int], int] = {}
    n_inst: dict[int, int] = {}
    for ts in type_of.values():
        for t in ts:
            n_inst[t] = n_inst.get(t, 0) + 1
    for s, p, o in zip(ss.tolist(), pp.tolist(), oo.tolist()):
        for t in type_of.get(s, ()):
            k = (t, p)
            cov.setdefault(k, set()).add(s)
            amb_sum[k] = amb_sum.get(k, 0) + len(lit_subjects[o])
            amb_n[k] = amb_n.get(k, 0) + 1

    rows = sorted(cov)
    assert list(zip(got["type"].to_pylist(), got["predicate"].to_pylist())) == rows
    for i, k in enumerate(rows):
        assert got["covered"][i].as_py() == len(cov[k]), k
        assert got["instances"][i].as_py() == n_inst[k[0]], k
        assert got["amb_sum"][i].as_py() == amb_sum[k], k
        assert got["amb_n"][i].as_py() == amb_n[k], k

"""End-to-end pipeline tests over Ray Data — the golden triple-set gate.

FIXTURES.md §4: the Percy Jackson smoke corpus must produce exactly
2 recognized label triples + 2 recognized rdf:type triples + 1 known
livesIn triple + 1 predicted livesIn triple; P/R vs the expected set must
be ≥ 0.95 (here: exactly 1.0).  Also asserts the per-row span-sequence
invariant: spans flow through annotation untouched."""

import pyarrow as pa
import pytest

from scoobie_ray.kb.bundle import RDF_TYPE
from scoobie_ray.pipelines.canonicalize import canonicalize
from scoobie_ray.pipelines.extract import annotate_docs, extract_triples
from scoobie_ray.sources.fixtures import smoke_docs, smoke_kb

ONT = "http://example.org/ont/"
INS = "http://example.org/instance#"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

EXPECTED = {
    (INS + "Percy_Jackson", LABEL, "Percy Jackson", "recognized"),
    (INS + "Camp_Halfblood", LABEL, "Camp Halfblood", "recognized"),
    (INS + "Percy_Jackson", RDF_TYPE, ONT + "Person", "recognized"),
    (INS + "Camp_Halfblood", RDF_TYPE, ONT + "Place", "recognized"),
    (INS + "Percy_Jackson", ONT + "livesIn", INS + "Camp_Halfblood", "known"),
    (INS + "Percy_Jackson", ONT + "livesIn", INS + "Camp_Halfblood", "predicted"),
}


@pytest.fixture()
def smoke_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(smoke_docs())


def test_extract_triples_golden(smoke_ds):
    out = extract_triples(smoke_ds, smoke_kb(), concurrency=1).take_all()
    got = {(r["subj"], r["pred"], r["obj"], r["graph"]) for r in out}
    tp = len(got & EXPECTED)
    precision = tp / len(got)
    recall = tp / len(EXPECTED)
    assert precision >= 0.95 and recall >= 0.95
    assert got == EXPECTED


def test_canonicalize_dedups(smoke_ds):
    triples = extract_triples(smoke_ds.union(smoke_ds), smoke_kb(), concurrency=1)
    canon = canonicalize(triples).take_all()
    keys = [(r["subj"], r["pred"], r["obj"], r["graph"]) for r in canon]
    assert sorted(keys) == sorted(EXPECTED)
    # the duplicated corpus contributed 2 docs per triple
    assert all(r["n_docs"] == 2 for r in canon)


def test_span_sequence_invariant(smoke_ds):
    annotated = annotate_docs(smoke_ds, smoke_kb(), concurrency=1)
    rows = {r["doc_id"]: r["spans"] for r in annotated.take_all()}
    orig = {r["doc_id"]: r["spans"] for r in smoke_ds.take_all()}
    assert rows.keys() == orig.keys()
    for doc_id in orig:
        got = [(s["kind"], s["text"], s["media_ref"]) for s in rows[doc_id]]
        exp = [(s["kind"], s["text"], s["media_ref"]) for s in orig[doc_id]]
        assert got == exp


def test_kg_corpus_sf0001(ray_session):
    """The TPC-H-derived corpus end-to-end: every doc resolves its subject
    entity, canonical triples are distinct."""
    import ray.data

    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb

    sf = "/root/testdata/sf0.001"
    docs = ray.data.from_arrow(kg_docs_table(sf))
    kb = kg_kb(sf)
    canon = canonicalize(extract_triples(docs, kb, concurrency=2)).take_all()
    keys = [(r["subj"], r["pred"], r["obj"], r["graph"]) for r in canon]
    assert len(keys) == len(set(keys))
    recognized = [k for k in keys if k[3] == "recognized"]
    # every nation (25) + region (5) + supplier (10) + customer (150) gets a
    # label triple; customers also get alias label triples for resolved aliases
    assert len(recognized) > 190


def test_encoded_path_matches_string_path(ray_session):
    """The dictionary-encoded scale path must decode to exactly the
    string-path canonical triple set."""
    import ray.data

    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb
    from scoobie_ray.stages.serialize import decode_triples

    sf = "/root/testdata/sf0.001"
    kb = kg_kb(sf)
    docs = ray.data.from_arrow(kg_docs_table(sf))
    strings = canonicalize(
        extract_triples(docs, kb, concurrency=1)
    ).take_all()
    encoded = decode_triples(
        canonicalize(extract_triples(docs, kb, concurrency=1, encoded=True)), kb
    ).take_all()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["graph"])
    a = sorted((key(r), r["n_docs"]) for r in strings)
    b = sorted((key(r), r["n_docs"]) for r in encoded)
    assert a == b


def test_dead_letter_quarantine():
    """strict=False: a poisoned document is quarantined doc-at-a-time; the
    rest of the batch still yields triples (SURVEY.md §4: no swallowed
    errors, no batch-wide poisoning)."""
    import pyarrow as pa

    from scoobie_ray.kb.bundle import KBIndex
    from scoobie_ray.pipelines.extract import ExtractActor
    from scoobie_ray.sources.docs import DOC_SCHEMA

    good = {
        "doc_id": "good",
        "spans": [
            {"kind": "text", "text": "Percy Jackson lives here.", "media_ref": "", "offset": 0}
        ],
    }
    poison = {
        "doc_id": "poison",
        "spans": [{"kind": "text", "text": None, "media_ref": "", "offset": 0}],
    }
    batch = pa.Table.from_pylist([good, poison], schema=DOC_SCHEMA)
    actor = ExtractActor(KBIndex(smoke_kb()), strict=False)
    out = actor(batch)
    assert out.num_rows > 0  # good doc still extracted
    dead = actor.take_dead_letters()
    assert [d["doc_id"] for d in dead] == ["poison"]
    assert "Error" in dead[0]["error"] or "error" in dead[0]["error"].lower() or dead[0]["error"]

    # strict mode raises instead
    import pytest as _pytest

    strict_actor = ExtractActor(KBIndex(smoke_kb()))
    with _pytest.raises(Exception):
        strict_actor(batch)


def test_staged_pipeline_with_repartition_matches_fused(ray_session):
    """The unfused spot -> repartition -> link/disambiguate/facts chain
    (explicit rebalance between extraction and linking, per the north
    rule) yields the same canonical triples as the fused actor."""
    import ray.data

    from scoobie_ray.pipelines.extract import extract_triples_staged
    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb

    sf = "/root/testdata/sf0.001"
    kb = kg_kb(sf)
    docs = ray.data.from_arrow(kg_docs_table(sf))
    staged = canonicalize(
        extract_triples_staged(
            docs, kb, repartition_blocks=8,
            spot_concurrency=1, link_concurrency=1,
        )
    ).take_all()
    fused = canonicalize(extract_triples(docs, kb, concurrency=1)).take_all()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["graph"])
    assert sorted(map(key, staged)) == sorted(map(key, fused))


def test_salted_groupby_canonicalize_matches(ray_session):
    """Two-phase salted aggregation (hot-key defusal) produces identical
    canonical rows to the unsalted groupby and the tree path."""
    import ray.data

    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb

    sf = "/root/testdata/sf0.001"
    kb = kg_kb(sf)
    docs = ray.data.from_arrow(kg_docs_table(sf))
    tri = extract_triples(docs.union(docs), kb, concurrency=1, encoded=True)
    salted = canonicalize(tri, strategy="groupby", salt_buckets=4).take_all()
    tri2 = extract_triples(docs.union(docs), kb, concurrency=1, encoded=True)
    tree = canonicalize(tri2).take_all()
    key = lambda r: (r["s"], r["p"], r["o"], r["g"], r["n_docs"])
    assert sorted(map(key, salted)) == sorted(map(key, tree))


def test_string_keyed_groupby_canonicalize_matches(ray_session):
    """The STRING-keyed groupby fallback (partitioned via the Arrow-native
    vectorized string hash, no per-row Python) merges identically to the
    tree path."""
    import ray.data

    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb

    sf = "/root/testdata/sf0.001"
    kb = kg_kb(sf)
    docs = ray.data.from_arrow(kg_docs_table(sf))
    tri = extract_triples(docs.union(docs), kb, concurrency=1)
    grouped = canonicalize(tri, strategy="groupby").take_all()
    tri2 = extract_triples(docs.union(docs), kb, concurrency=1)
    tree = canonicalize(tri2).take_all()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["graph"], r["n_docs"])
    assert sorted(map(key, grouped)) == sorted(map(key, tree))


def test_head_entity_skew_bounded_by_combiner(ray_session):
    """Head-entity skew: every doc mentions the same hot nation, so the
    emitted stream is dominated by a handful of canonical keys.  The
    per-block combiner must bound what reaches the exchange: rows after
    local combine ≤ (#blocks × distinct triples), NOT #docs."""
    import pyarrow as pa
    import ray.data

    from scoobie_ray.pipelines.canonicalize import _local_combine
    from scoobie_ray.sources.docs import DOC_SCHEMA
    from scoobie_ray.sources.fixtures import kg_kb

    sf = "/root/testdata/sf0.001"
    kb = kg_kb(sf)
    # 2000 docs, all about NATION_3 (the hot key)
    rows = [
        {
            "doc_id": f"hot-{i}",
            "spans": [
                {
                    "kind": "text",
                    "text": "NATION_3 is a nation in AFRICA.",
                    "media_ref": "",
                    "offset": 0,
                }
            ],
        }
        for i in range(2000)
    ]
    docs = ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    ).repartition(8)
    tri = extract_triples(docs, kb, concurrency=1, encoded=True)
    emitted = tri.count()
    assert emitted >= 2000 * 5  # the skewed stream is big...
    combined = tri.map_batches(
        _local_combine, batch_format="pyarrow", zero_copy_batch=True
    )
    combined_rows = combined.count()
    distinct = canonicalize(
        extract_triples(docs, kb, concurrency=1, encoded=True)
    ).count()
    # ...but the exchange sees at most blocks x distinct keys
    assert combined_rows <= 8 * distinct * 2
    assert combined_rows < emitted / 50


def test_trig_roundtrip(ray_session, tmp_path):
    """TriG export (RDFSerializer.java:61-113 semantics): write the
    canonical 3-graph output as TriG, parse it back with the TriG/Turtle
    parser, and the (subj, pred, obj, graph) set must equal kg_triples."""
    import ray.data

    from scoobie_ray.pipelines.canonicalize import canonicalize
    from scoobie_ray.pipelines.extract import extract_triples
    from scoobie_ray.sources.fixtures import kg_docs_table, kg_kb
    from scoobie_ray.stages.trig import parse_trig, to_trig_string, write_trig

    sf = "/root/testdata/sf0.001"
    kb = kg_kb(sf)
    docs = ray.data.from_arrow(kg_docs_table(sf))
    canon = canonicalize(
        extract_triples(docs, kb, concurrency=1, encoded=True)
    ).materialize()

    from scoobie_ray.stages.serialize import decode_triples

    want = {
        (r["subj"], r["pred"], r["obj"], r["graph"])
        for r in decode_triples(canon, kb).take_all()
    }
    assert len(want) == 893

    # distributed directory export
    out = str(tmp_path / "trig")
    n_parts = write_trig(canon, kb, out)
    assert n_parts >= 1
    import os

    got = set()
    part_names = [n for n in sorted(os.listdir(out)) if n.endswith(".trig")]
    assert os.path.exists(os.path.join(out, "trig_manifest.json"))
    for name in part_names:
        with open(os.path.join(out, name)) as f:
            t = parse_trig(f.read())
        got.update(
            (r["s"], r["p"], r["o"], r["graph"]) for r in t.to_pylist()
        )
    assert got == want

    # re-run over CHANGED data sweeps the previous run's orphan parts:
    # only the new run's manifest parts survive in out_dir
    import json

    half = ray.data.from_arrow(kg_docs_table(sf).slice(0, 20))
    canon_half = canonicalize(
        extract_triples(half, kb, concurrency=1, encoded=True)
    ).materialize()
    n2 = write_trig(canon_half, kb, out)
    assert n2 >= 1
    with open(os.path.join(out, "trig_manifest.json")) as f:
        man = json.load(f)
    on_disk = {n for n in os.listdir(out) if n.endswith(".trig")}
    assert on_disk == set(man["parts"]), (on_disk, man["parts"])
    assert not [n for n in os.listdir(out) if n.endswith(".tmp")]

    # single-document render round-trips too
    import pyarrow as pa

    whole = pa.concat_tables(
        [ray.get(ref) for ref in canon.to_arrow_refs()]
    )
    doc = to_trig_string(whole, kb)
    t = parse_trig(doc)
    got2 = {(r["s"], r["p"], r["o"], r["graph"]) for r in t.to_pylist()}
    assert got2 == want

"""KB parsing / dictionary / statistics unit tests.

Mirrors the reference's self-contained KB layer tests
(TestHsqlKB.java / TestPostgresKB.java:56-183: dictionary round-trips,
types-for-instances, outgoing/incoming adjacency invariants)."""

import pyarrow as pa

from scoobie_ray.kb.build import build_kb_from_triples
from scoobie_ray.kb.bundle import RDF_TYPE, RDFS_LABEL, KBIndex
from scoobie_ray.kb.parser import (
    clean_literal,
    clean_triples,
    parse_ntriples_lines,
    repair_uri,
)
from scoobie_ray.sources.fixtures import smoke_kb


def test_clean_literal_filters():
    # RDFTripleParser.java:228-234: strip [\n\t\\"], length in [2,100]
    assert clean_literal('a\tb"c\n') == "abc"
    assert clean_literal("x") is None  # too short after cleaning
    assert clean_literal("a" * 101) is None
    assert clean_literal("ok") == "ok"


def test_repair_uri():
    # RDFTripleParser.java:205-213 (length) and :256-273 (bad chars)
    assert repair_uri("http://x/" + "a" * 120) is None
    assert repair_uri("http://x/a b") == "http://x/a%20b"
    assert repair_uri("http://x/ok") == "http://x/ok"


def test_parse_ntriples():
    t = parse_ntriples_lines(
        [
            '<http://a> <http://p> <http://b> .',
            '<http://a> <http://l> "lit \\"q\\"" .',
            "# comment",
            "garbage line",
        ]
    )
    assert t.num_rows == 2
    assert t["o_is_literal"].to_pylist() == [False, True]
    assert t["o"].to_pylist()[1] == 'lit "q"'


def test_clean_triples_drops_bad_rows():
    t = pa.table(
        {
            "s": ["http://a", "http://" + "x" * 130, "http://c"],
            "p": ["http://p", "http://p", "http://p"],
            "o": ["ok literal", "http://b", "z"],
            "o_is_literal": [True, False, True],
        }
    )
    out = clean_triples(t)
    # row 2 dropped (over-long subject URI), row 3 dropped (literal too short)
    assert out.num_rows == 1
    assert out["s"].to_pylist() == ["http://a"]


def test_dictionary_is_rank_of_sorted_uri():
    kb = smoke_kb()
    uris = kb.resources["uri"].to_pylist()
    assert uris == sorted(uris)
    assert kb.resources["index"].to_pylist() == list(range(len(uris)))
    lits = kb.literals["literal"].to_pylist()
    assert lits == sorted(lits)


def test_index_roundtrips_and_adjacency():
    kb = KBIndex(smoke_kb())
    pj = kb.uri_index("http://example.org/instance#Percy_Jackson")
    camp = kb.uri_index("http://example.org/instance#Camp_Halfblood")
    assert kb.uri(pj).endswith("Percy_Jackson")
    li = kb.literal_index("Percy Jackson")
    preds, subs = kb.candidates_for_literal(li)
    assert subs.tolist() == [pj]
    assert kb.uri(preds.tolist()[0]) == RDFS_LABEL
    # outgoing of Percy includes livesIn -> Camp plus rdf:type
    p_out, o_out = kb.outgoing(pj)
    assert camp in o_out.tolist()
    # incoming of Camp includes Percy
    _, inc = kb.incoming(camp)
    assert pj in inc.tolist()
    # types
    person = kb.uri_index("http://example.org/ont/Person")
    assert kb.types_of(pj).tolist() == [person]


def test_markov_chain_probability():
    kb = KBIndex(smoke_kb())
    person = kb.uri_index("http://example.org/ont/Person")
    place = kb.uri_index("http://example.org/ont/Place")
    lives = kb.uri_index("http://example.org/ont/livesIn")
    top = kb.markov_top(person, place, k=1)
    assert top == [(lives, 1.0)]
    assert kb.markov_top(place, person) == []


def test_cardinalities():
    kb = smoke_kb()
    card = kb.cardinalities.to_pylist()
    by_pred = {r["predicate"]: r for r in card}
    idx = KBIndex(kb)
    lives = idx.uri_index("http://example.org/ont/livesIn")
    assert by_pred[lives]["n_triples"] == 1
    assert by_pred[lives]["avg_out"] == 1.0


def test_build_from_parsed_ntriples_end_to_end():
    lines = [
        '<http://e/a> <%s> "Alpha Beta" .' % RDFS_LABEL,
        "<http://e/a> <%s> <http://e/T> ." % RDF_TYPE,
        "<http://e/a> <http://e/rel> <http://e/b> .",
        '<http://e/b> <%s> "Gamma" .' % RDFS_LABEL,
    ]
    kb = build_kb_from_triples(clean_triples(parse_ntriples_lines(lines)))
    assert len(kb.symbols) == 2
    assert len(kb.relations) == 2
    assert len(kb.types) == 1


def test_instances_of_types_sampling():
    kb = KBIndex(smoke_kb())
    person = kb.uri_index("http://example.org/ont/Person")
    place = kb.uri_index("http://example.org/ont/Place")
    both = kb.instances_of_types([person, place])
    assert len(both) == 2
    capped = kb.instances_of_types([person, place], count=1)
    assert capped == [min(both)]  # deterministic ascending order


def test_parse_ntriples_typed_and_lang_literals():
    t = parse_ntriples_lines(
        [
            '<http://a> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',
            '<http://a> <http://p> "hello"@en .',
        ]
    )
    assert t.num_rows == 2
    assert t["o"].to_pylist() == ["42", "hello"]
    assert t["o_is_literal"].to_pylist() == [True, True]


def test_build_kb_job_cli_from_mixed_dumps(ray_session, tmp_path):
    """RDF dumps (Turtle + gzipped N-Triples) -> distributed parse ->
    KB bundle on disk -> usable for spotting."""
    import gzip

    from jobs.build_kb import main

    ttl = (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://e.org/> .\n"
        'ex:alpha rdfs:label "Alpha Station" ;\n'
        "    a <http://e.org/ont/Place> .\n"
    )
    nt = (
        '<http://e.org/beta> <http://www.w3.org/2000/01/rdf-schema#label> "Beta Camp" .\n'
        "<http://e.org/beta> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e.org/ont/Place> .\n"
        "<http://e.org/alpha> <http://e.org/ont/linkedTo> <http://e.org/beta> .\n"
    )
    p1 = str(tmp_path / "a.ttl")
    p2 = str(tmp_path / "b.nt.gz")
    with open(p1, "w") as f:
        f.write(ttl)
    with open(p2, "wb") as f:
        f.write(gzip.compress(nt.encode()))

    out = str(tmp_path / "kb")
    rc = main(["--dumps", p1, p2, "--out", out])
    assert rc == 0

    from scoobie_ray.kb.bundle import KBBundle, KBIndex
    from scoobie_ray.stages.spot import Spotter

    kb = KBIndex(KBBundle.read(out))
    import pyarrow as pa

    from scoobie_ray.sources.docs import DOC_SCHEMA

    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "d0",
                "spans": [
                    {
                        "kind": "text",
                        "text": "We met at Alpha Station near Beta Camp.",
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
            }
        ],
        schema=DOC_SCHEMA,
    )
    spotted = Spotter(kb)(docs)
    lits = {kb.literal(x) for x in spotted["mention_literal"].to_pylist()[0]}
    assert lits == {"Alpha Station", "Beta Camp"}


def test_avg_linkage_type_clusters():
    """linkage="average" (reference parity: HierarchicalClustering +
    DoubleMatrix.labelClusters): perfectly co-occurring types merge under
    one best-label member; independent types stay singletons; the fixture
    KB's single-typed subjects reduce to identity clustering on both
    linkages."""
    import pyarrow as pa

    from scoobie_ray.kb.build import cluster_correlating_types

    # subjects 0-4 carry {10,11} together; 5-9 carry {12}; 10 carries {13}
    subj, typ = [], []
    for s in range(5):
        subj += [s, s]
        typ += [10, 11]
    for s in range(5, 10):
        subj.append(s)
        typ.append(12)
    subj.append(10)
    typ.append(13)
    t = pa.table(
        {"subject": pa.array(subj, pa.int64()), "type": pa.array(typ, pa.int64())}
    )
    cl = cluster_correlating_types(t, threshold=0.3, linkage="average")
    assert cl[10] == cl[11], "perfectly correlated types must share a cluster"
    assert cl[10] in (10, 11)
    assert cl[12] == 12 and cl[13] == 13
    # deterministic across calls
    assert cl == cluster_correlating_types(t, threshold=0.3, linkage="average")

    # fixture KB: single-typed subjects -> identity on the average path,
    # agreeing with the default jaccard path the oracles ride on
    from scoobie_ray.sources.fixtures import kg_triple_table
    from scoobie_ray.kb.build import build_kb_from_triples

    kb = build_kb_from_triples(kg_triple_table("/root/testdata/sf0.001"))
    types = kb.types
    ident = cluster_correlating_types(types, linkage="average")
    assert all(k == v for k, v in ident.items())
    jac = cluster_correlating_types(types)
    assert ident == jac


def test_markov_chain_multicluster_matches_bruteforce():
    """The vectorized edge x cluster-cross-product explode must equal the
    brute-force per-edge loop on a KB with MULTI-typed subjects (the
    fixture KB is single-typed, so this path needs its own gate)."""
    import numpy as np
    import pyarrow as pa

    from scoobie_ray.kb.build import build_markov_chain

    rng = np.random.default_rng(11)
    n_subj, n_types, n_edges = 40, 6, 120
    subj, typ = [], []
    for s in range(n_subj):
        for t in rng.choice(n_types, size=rng.integers(1, 4), replace=False):
            subj.append(s)
            typ.append(100 + int(t))
    types = pa.table(
        {"subject": pa.array(subj, pa.int64()), "type": pa.array(typ, pa.int64())}
    )
    # clusters merge types 100/101 under 100; others identity
    tc = pa.table(
        {
            "type": pa.array([100 + i for i in range(n_types)], pa.int64()),
            "cluster": pa.array(
                [100, 100] + [100 + i for i in range(2, n_types)], pa.int64()
            ),
        }
    )
    es = rng.integers(0, n_subj, n_edges)
    eo = rng.integers(0, n_subj, n_edges)
    ep = rng.integers(200, 203, n_edges)
    rel = pa.table(
        {
            "subject": pa.array(es, pa.int64()),
            "predicate": pa.array(ep, pa.int64()),
            "object": pa.array(eo, pa.int64()),
        }
    )

    got = build_markov_chain(rel, types, tc, type_pred_idx=None)

    # brute force
    cmap = dict(zip(tc["type"].to_pylist(), tc["cluster"].to_pylist()))
    sc: dict[int, list[int]] = {}
    for s, t in zip(subj, typ):
        c = cmap.get(t, t)
        if c not in sc.setdefault(s, []):
            sc[s].append(c)
    counts: dict[tuple[int, int, int], int] = {}
    for s, p, o in zip(es.tolist(), ep.tolist(), eo.tolist()):
        for cs in sc.get(s, ()):
            for co in sc.get(o, ()):
                counts[(cs, p, co)] = counts.get((cs, p, co), 0) + 1
    pair: dict[tuple[int, int], int] = {}
    for (cs, _p, co), v in counts.items():
        pair[(cs, co)] = pair.get((cs, co), 0) + v
    expect = {
        k: v / pair[(k[0], k[2])] for k, v in counts.items()
    }

    got_map = {
        (a, b, c): p
        for a, b, c, p in zip(
            got["cluster_s"].to_pylist(),
            got["predicate"].to_pylist(),
            got["cluster_o"].to_pylist(),
            got["prob"].to_pylist(),
        )
    }
    assert set(got_map) == set(expect)
    for k in expect:
        assert abs(got_map[k] - expect[k]) < 1e-12, k

"""Per-corpus gold extractors (reference subclass hooks): Wikinews regex
gold (WikinewsCorpus.java:37-66), CoNLL -DOCSTART- splitting + IOB gold
(ConllCorpus.java:84-112), BBCMusic foaf:name RDF/XML gold
(BBCMusicCorpus.java:88-110) — feeding the evaluate P/R kernels."""

import pyarrow as pa

from scoobie_ray.evaluate import set_pr
from scoobie_ray.sources.corpus import (
    bbcmusic_extract_labels,
    conll_gold_mentions,
    conll_split_docs,
    read_conll_corpus,
    wikinews_extract_labels,
)

CONLL_FIXTURE = """\
-DOCSTART- -X- -X- O

Angela NNP I-NP B-PER
Merkel NNP I-NP I-PER
visited VBD I-VP O
Berlin NNP I-NP B-LOC
. . O O

-DOCSTART- -X- -X- O

Smith NNP I-NP B-PER
works VBZ I-VP O
at IN I-PP O
Acme NNP I-NP B-ORG
Corp NNP I-NP I-ORG
in IN I-PP O
Paris NNP I-NP B-LOC
"""


def test_wikinews_regex_gold():
    html = (
        'see <a href="http://dbpedia.org/page/Berlin">Berlin</a> and\n'
        '"HTTP://DBPEDIA.ORG/resource/Hamburg" plus noise http://other.org/x\n'
        '"http://dbpedia.org/page/Angela_Merkel" twice "http://dbpedia.org/page/Angela_Merkel"'
    )
    gold = wikinews_extract_labels(html)
    assert gold == [
        "http://dbpedia.org/resource/Berlin",
        "HTTP://DBPEDIA.ORG/resource/Hamburg",
        "http://dbpedia.org/resource/Angela_Merkel",
        "http://dbpedia.org/resource/Angela_Merkel",
    ]


def test_conll_docstart_splitting():
    docs = conll_split_docs(CONLL_FIXTURE)
    assert [d[0] for d in docs] == ["#1", "#2"]
    assert docs[0][1] == "Angela Merkel visited Berlin ."
    assert docs[1][1] == "Smith works at Acme Corp in Paris"


def test_conll_gold_mentions():
    gold = conll_gold_mentions(CONLL_FIXTURE)
    assert ("#1", "Angela Merkel", "PER") in gold
    assert ("#1", "Berlin", "LOC") in gold
    assert ("#2", "Acme Corp", "ORG") in gold
    assert ("#2", "Paris", "LOC") in gold
    assert len(gold) == 5  # + Smith


def test_conll_corpus_spotting_pr(ray_session, tmp_path):
    """End-to-end: CoNLL corpus -> spotter over a small KB -> P/R against
    the IOB gold mentions."""
    from scoobie_ray.kb.build import build_kb_from_triples
    from scoobie_ray.kb.bundle import RDFS_LABEL, KBIndex
    from scoobie_ray.stages.spot import Spotter

    path = str(tmp_path / "eng.train")
    with open(path, "w") as f:
        f.write(CONLL_FIXTURE)
    docs_ds, gold = read_conll_corpus(path)

    labels = ["Angela Merkel", "Berlin", "Paris", "Acme Corp", "London"]
    t = pa.table(
        {
            "s": [f"http://e/{i}" for i in range(len(labels))],
            "p": [RDFS_LABEL] * len(labels),
            "o": labels,
            "o_is_literal": [True] * len(labels),
        }
    )
    kb = KBIndex(build_kb_from_triples(t))

    spotted = docs_ds.map_batches(
        Spotter(kb), batch_format="pyarrow", concurrency=1
    ).take_all()
    pred_rows = []
    for row in spotted:
        for lit in row["mention_literal"]:
            pred_rows.append((row["doc_id"], kb.literal(lit)))
    pred = pa.table(
        {
            "doc_id": pa.array([r[0] for r in pred_rows]),
            "phrase": pa.array([r[1] for r in pred_rows]),
        }
    )
    pr = set_pr(pred, gold.select(["doc_id", "phrase"]), ["doc_id", "phrase"])
    # KB covers 4 of 5 gold mentions (Smith missing), spots nothing wrong
    assert pr.tp == 4 and pr.fp == 0 and pr.fn == 1
    assert pr.precision == 1.0
    assert abs(pr.recall - 0.8) < 1e-9


def test_bbcmusic_foaf_gold():
    xml = (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
        '         xmlns:foaf="http://xmlns.com/foaf/0.1/">\n'
        '  <rdf:Description rdf:about="http://www.bbc.co.uk/music/artists/a1">\n'
        "    <foaf:name>The Example Band</foaf:name>\n"
        "  </rdf:Description>\n"
        '  <rdf:Description rdf:about="http://www.bbc.co.uk/music/artists/a2">\n'
        "    <foaf:homepage rdf:resource=\"http://example.org\"/>\n"
        "  </rdf:Description>\n"
        '  <rdf:Description rdf:about="http://www.bbc.co.uk/music/artists/a3">\n'
        "    <foaf:name>Solo Artist</foaf:name>\n"
        "  </rdf:Description>\n"
        "</rdf:RDF>"
    )
    assert bbcmusic_extract_labels(xml) == [
        "http://www.bbc.co.uk/music/artists/a1",
        "http://www.bbc.co.uk/music/artists/a3",
    ]


def test_wikipedia_turtle_gold():
    ttl = (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix dbr: <http://dbpedia.org/resource/> .\n"
        'dbr:Berlin rdfs:label "Berlin" .\n'
        "dbr:Berlin a <http://dbpedia.org/ontology/City> .\n"
        'dbr:Hamburg rdfs:label "Hamburg" .\n'
    )
    from scoobie_ray.sources.corpus import wikipedia_extract_labels

    assert wikipedia_extract_labels(ttl) == [
        "http://dbpedia.org/resource/Berlin",
        "http://dbpedia.org/resource/Hamburg",
    ]


def test_bbcnature_rdfxml_gold():
    xml = (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
        '         xmlns:dct="http://purl.org/dc/terms/">\n'
        '  <rdf:Description rdf:about="http://www.bbc.co.uk/nature/life/Lion">\n'
        "    <rdfs:label>Lion</rdfs:label>\n"
        "  </rdf:Description>\n"
        '  <rdf:Description rdf:about="http://www.bbc.co.uk/nature/life/Tiger">\n'
        "    <dct:title>Tiger</dct:title>\n"
        "  </rdf:Description>\n"
        "</rdf:RDF>"
    )
    from scoobie_ray.sources.corpus import bbcnature_extract_labels

    assert bbcnature_extract_labels(xml) == [
        "http://www.bbc.co.uk/nature/life/Lion",
        "http://www.bbc.co.uk/nature/life/Tiger",
    ]


def test_gutenberg_is_wikinews_regex():
    from scoobie_ray.sources.corpus import gutenberg_extract_labels

    assert gutenberg_extract_labels('"http://dbpedia.org/page/X"') == [
        "http://dbpedia.org/resource/X"
    ]

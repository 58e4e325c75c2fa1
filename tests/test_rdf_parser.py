"""RDF format coverage: Turtle/N3 subset, RDF/XML subset, N-Triples
escapes, transparent gzip/bz2/zip — semantics mirrored from the
reference's Sesame-Rio ingestion (RDFTripleParser.java:84-99, 190-240)."""

import bz2
import gzip
import zipfile

import pyarrow as pa
import pytest

from scoobie_ray.kb.parser import (
    clean_triples,
    detect_format,
    parse_ntriples_lines,
    parse_rdf_file,
    parse_rdfxml,
    parse_turtle,
    unescape_literal,
)

REF_TTL_1 = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex-ont: <http://example.org/ontology#> .
@prefix ex-ins: <http://example.org/instance#> .

ex-ins:Percy_Jackson\trdfs:label\t\t"Percy Jackson" ;
\t\t\t\t\t\ta\t\t\t\tex-ont:Person ;
\t\t\t\t\t\tex-ont:livesIn\tex-ins:Camp_Halfblood .
"""


def _rows(t: pa.Table) -> set[tuple]:
    return {tuple(r.values()) for r in t.to_pylist()}


def test_turtle_reference_fixture_shape():
    """Same statement shapes as the reference's connection/test1.ttl."""
    got = _rows(parse_turtle(REF_TTL_1))
    assert got == {
        (
            "http://example.org/instance#Percy_Jackson",
            "http://www.w3.org/2000/01/rdf-schema#label",
            "Percy Jackson",
            True,
        ),
        (
            "http://example.org/instance#Percy_Jackson",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://example.org/ontology#Person",
            False,
        ),
        (
            "http://example.org/instance#Percy_Jackson",
            "http://example.org/ontology#livesIn",
            "http://example.org/instance#Camp_Halfblood",
            False,
        ),
    }


def test_turtle_missing_final_dot_after_prefix():
    """test2.ttl in the reference omits the '.' after its last @prefix."""
    ttl = (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://e.org/> \n\n"
        'ex:a rdfs:label "A Label" .\n'
    )
    got = _rows(parse_turtle(ttl))
    assert ("http://e.org/a", "http://www.w3.org/2000/01/rdf-schema#label", "A Label", True) in got


def test_turtle_features():
    ttl = (
        "@prefix ex: <http://e.org/> .\n"
        "# a comment line\n"
        'ex:a ex:p "lit"@en , "zwei"^^ex:dt ;\n'
        "     ex:num 42 ;\n"
        "     ex:flag true ;\n"
        '     ex:long """multi\nline""" .\n'
        '_:b1 ex:p "from bnode subject" .\n'
        "ex:c ex:q _:b2 .\n"  # bnode object -> skipped (ref: 'bad triple')
    )
    rows = _rows(parse_turtle(ttl))
    assert ("http://e.org/a", "http://e.org/p", "lit", True) in rows
    assert ("http://e.org/a", "http://e.org/p", "zwei", True) in rows
    assert ("http://e.org/a", "http://e.org/num", "42", True) in rows
    assert ("http://e.org/a", "http://e.org/flag", "true", True) in rows
    assert ("http://e.org/a", "http://e.org/long", "multi\nline", True) in rows
    assert ("_:b1", "http://e.org/p", "from bnode subject", True) in rows
    assert not any(r[0] == "http://e.org/c" for r in rows)


def test_ntriples_full_escape_set():
    """ADVICE r1: \\n/\\t/\\r/\\uXXXX must unescape, not corrupt."""
    assert unescape_literal(r"a\nb\tc\rd") == "a\nb\tc\rd"
    assert unescape_literal(r"A\U00000042") == "AB"
    assert unescape_literal(r"q\\u") == "q\\u"  # escaped backslash wins
    t = parse_ntriples_lines(
        ['<http://e.org/s> <http://e.org/p> "a\\nb cd\\u0021" .']
    )
    assert t["o"].to_pylist() == ["a\nb cd!"]
    # cleaning strips the control char but keeps the rest
    cleaned = clean_triples(t)
    assert cleaned["o"].to_pylist() == ["ab cd!"]


def test_rdfxml_subset():
    xml = (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
        '         xmlns:ont="http://example.org/ont/">\n'
        '  <ont:Thing rdf:about="http://e.org/x" ont:code="T1">\n'
        "    <rdfs:label>X Label</rdfs:label>\n"
        '    <ont:rel rdf:resource="http://e.org/y"/>\n'
        '    <ont:knows><rdf:Description rdf:about="http://e.org/z"/></ont:knows>\n'
        "  </ont:Thing>\n"
        "</rdf:RDF>"
    )
    rows = _rows(parse_rdfxml(xml))
    assert (
        "http://e.org/x",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://example.org/ont/Thing",
        False,
    ) in rows
    assert ("http://e.org/x", "http://example.org/ont/code", "T1", True) in rows
    assert ("http://e.org/x", "http://www.w3.org/2000/01/rdf-schema#label", "X Label", True) in rows
    assert ("http://e.org/x", "http://example.org/ont/rel", "http://e.org/y", False) in rows
    assert ("http://e.org/x", "http://example.org/ont/knows", "http://e.org/z", False) in rows


@pytest.mark.parametrize("comp", ["gz", "bz2", "zip"])
def test_transparent_decompression(tmp_path, comp):
    ttl = b'@prefix ex: <http://e.org/> .\nex:a ex:p "hello there" .'
    path = str(tmp_path / f"t.ttl.{comp}")
    if comp == "gz":
        data = gzip.compress(ttl)
    elif comp == "bz2":
        data = bz2.compress(ttl)
    else:
        import io

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("inner.ttl", ttl)
        data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    assert detect_format(path) == "ttl"
    t = parse_rdf_file(path)
    assert t.num_rows == 1 and t["o"].to_pylist() == ["hello there"]


def test_read_rdf_distributed(ray_session, tmp_path):
    from scoobie_ray.kb.parser import read_rdf

    p1 = str(tmp_path / "a.ttl")
    p2 = str(tmp_path / "b.nt")
    with open(p1, "w") as f:
        f.write('@prefix ex: <http://e.org/> .\nex:a ex:p "first doc" .\n')
    with open(p2, "w") as f:
        f.write('<http://e.org/b> <http://e.org/p> "second doc" .\n')
    rows = read_rdf([p1, p2]).take_all()
    assert {r["o"] for r in rows} == {"first doc", "second doc"}


def test_read_ntriples_lines_ds(ray_session, tmp_path):
    from scoobie_ray.kb.parser import read_ntriples_lines_ds

    p = str(tmp_path / "dump.nt")
    with open(p, "w") as f:
        for i in range(100):
            f.write(f'<http://e.org/s{i}> <http://e.org/p> "literal {i:03d}" .\n')
    ds = read_ntriples_lines_ds([p])
    assert ds.count() == 100


def test_cleaning_filters_on_parsed_turtle():
    ttl = (
        "@prefix ex: <http://e.org/> .\n"
        f'<http://e.org/{"x" * 130}> ex:p "valid literal" .\n'
        'ex:ok ex:p "x" .\n'  # too short after cleaning
        f'ex:ok2 ex:p "{"y" * 150}" .\n'  # too long
        'ex:keep ex:p "kept literal" .\n'
    )
    cleaned = clean_triples(parse_turtle(ttl))
    assert _rows(cleaned) == {
        ("http://e.org/keep", "http://e.org/p", "kept literal", True)
    }


def test_trix_parse():
    xml = (
        '<?xml version="1.0"?>\n'
        '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">\n'
        "  <graph>\n"
        "    <uri>http://e.org/g</uri>\n"
        "    <triple><uri>http://e.org/s</uri><uri>http://e.org/p</uri>"
        "<uri>http://e.org/o</uri></triple>\n"
        "    <triple><uri>http://e.org/s</uri><uri>http://e.org/label</uri>"
        '<plainLiteral xml:lang="en">Some Label</plainLiteral></triple>\n'
        "    <triple><uri>http://e.org/s</uri><uri>http://e.org/n</uri>"
        '<typedLiteral datatype="http://www.w3.org/2001/XMLSchema#int">42</typedLiteral></triple>\n'
        "    <triple><id>b1</id><uri>http://e.org/p</uri>"
        "<uri>http://e.org/x</uri></triple>\n"
        "    <triple><uri>http://e.org/s</uri><uri>http://e.org/p</uri>"
        "<id>b2</id></triple>\n"
        "  </graph>\n"
        "</TriX>"
    )
    from scoobie_ray.kb.parser import parse_trix

    rows = _rows(parse_trix(xml))
    assert ("http://e.org/s", "http://e.org/p", "http://e.org/o", False) in rows
    assert ("http://e.org/s", "http://e.org/label", "Some Label", True) in rows
    assert ("http://e.org/s", "http://e.org/n", "42", True) in rows
    assert ("_:b1", "http://e.org/p", "http://e.org/x", False) in rows
    # bnode object skipped (reference: 'bad triple')
    assert not any(r[2] == "_:b2" for r in rows)
    assert len(rows) == 4


def test_trig_file_dispatch(tmp_path):
    trig = (
        "<http://e.org/g1> {\n"
        '<http://e.org/a> <http://e.org/p> "in graph one" .\n'
        "}\n"
        "<http://e.org/g2> {\n"
        "<http://e.org/a> <http://e.org/q> <http://e.org/b> .\n"
        "}\n"
    )
    path = str(tmp_path / "dump.trig")
    with open(path, "w") as f:
        f.write(trig)
    assert detect_format(path) == "trig"
    t = parse_rdf_file(path)
    rows = _rows(t)
    assert ("http://e.org/a", "http://e.org/p", "in graph one", True) in rows
    assert ("http://e.org/a", "http://e.org/q", "http://e.org/b", False) in rows

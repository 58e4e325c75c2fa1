"""Property oracles for the RDF parsers: randomly generated triple sets
serialize to N-Triples / Turtle / TriG / TriX text and must parse back to
the identical (s, p, o, o_is_literal[, graph]) set.  The serializers here
are independent of the parsers (straight string templates), so agreement
is a real round-trip oracle, not a tautology."""

from hypothesis import given, settings
from hypothesis import strategies as st

from scoobie_ray.kb.parser import (
    parse_ntriples_lines,
    parse_turtle,
    parse_trix,
)
from scoobie_ray.stages.trig import parse_trig

_uri_st = st.from_regex(r"http://e\.org/[A-Za-z0-9_.~-]{1,12}", fullmatch=True)
# printable literals incl. chars needing escaping; no lone surrogates
_lit_st = st.text(
    alphabet=st.characters(
        codec="utf-8",
        blacklist_categories=("Cs",),
        min_codepoint=0x20,
        max_codepoint=0x2FF,
    ),
    min_size=0,
    max_size=24,
).map(lambda s: s)
_escaped_lit_st = st.one_of(
    _lit_st,
    st.sampled_from(['with "quotes"', "tab\tand\nnewline", "back\\slash", "ünïcødé"]),
)

_triple_st = st.tuples(
    _uri_st,
    _uri_st,
    st.one_of(_uri_st.map(lambda u: (u, False)), _escaped_lit_st.map(lambda v: (v, True))),
)


def _nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _term(o, is_lit):
    return f'"{_nt_escape(o)}"' if is_lit else f"<{o}>"


def _canon(table):
    return {tuple(r.values()) for r in table.to_pylist()}


@settings(max_examples=150, deadline=None)
@given(st.lists(_triple_st, min_size=1, max_size=12))
def test_ntriples_roundtrip(triples):
    lines = [
        f"<{s}> <{p}> {_term(o, lit)} ." for s, p, (o, lit) in triples
    ]
    got = _canon(parse_ntriples_lines(lines))
    want = {(s, p, o, lit) for s, p, (o, lit) in triples}
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(_triple_st, min_size=1, max_size=12))
def test_turtle_roundtrip(triples):
    doc = "".join(
        f"<{s}> <{p}> {_term(o, lit)} .\n" for s, p, (o, lit) in triples
    )
    got = _canon(parse_turtle(doc))
    want = {(s, p, o, lit) for s, p, (o, lit) in triples}
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(_triple_st, min_size=1, max_size=10))
def test_trig_roundtrip_property(triples):
    body = "".join(
        f"<{s}> <{p}> {_term(o, lit)} .\n" for s, p, (o, lit) in triples
    )
    doc = f"<http://e.org/ns#g1> {{\n{body}}}\n"
    t = parse_trig(doc)
    got = {(r["s"], r["p"], r["o"], r["o_is_literal"]) for r in t.to_pylist()}
    want = {(s, p, o, lit) for s, p, (o, lit) in triples}
    assert got == want
    assert set(t["graph"].to_pylist()) == {"g1"}


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


@settings(max_examples=100, deadline=None)
@given(st.lists(_triple_st, min_size=1, max_size=10))
def test_trix_roundtrip_property(triples):
    rows = []
    for s, p, (o, lit) in triples:
        obj = (
            f"<plainLiteral>{_xml_escape(o)}</plainLiteral>"
            if lit
            else f"<uri>{_xml_escape(o)}</uri>"
        )
        rows.append(f"<triple><uri>{s}</uri><uri>{p}</uri>{obj}</triple>")
    doc = (
        '<TriX xmlns="http://www.w3.org/2004/03/trix-1/x">'  # ns value unused
        f'<graph><uri>http://e.org/g</uri>{"".join(rows)}</graph></TriX>'
    )
    got = _canon(parse_trix(doc))
    want = {(s, p, o, lit) for s, p, (o, lit) in triples}
    assert got == want

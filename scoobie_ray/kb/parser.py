"""Triple-source parsing and cleaning.

Reimplements the *semantics* of the reference's RDF dump ingestion
(``connection/RDFTripleParser.java``): a stream of (s, p, o) statements is
split into object-property triples (URI, URI, URI) and datatype-property
triples (URI, URI, literal), with the reference's cleaning filters:

- URIs longer than 120 chars are skipped (RDFTripleParser.java:205-213);
- literals are cleaned of newline / tab / backslash / double-quote chars and
  must have cleaned length in [2, 100] (RDFTripleParser.java:228-234);
- malformed URI characters are percent-encoded (RDFTripleParser.java:256-273).

Input here is columnar: an Arrow table / batch with columns
``s: string, p: string, o: string, o_is_literal: bool`` (the N-Triples
surface syntax is trivial and handled by :func:`parse_ntriples_lines` for
text inputs).  All functions are vectorized and usable inside
``Dataset.map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

MAX_URI_LEN = 120
MIN_LITERAL_LEN = 2
MAX_LITERAL_LEN = 100

_LITERAL_CLEAN_RE = re.compile(r'[\n\t\\"]')
_BAD_URI_CHAR_RE = re.compile(r'[ <>"{}|^`\\]')

_NT_LINE_RE = re.compile(
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]*>|@[\w-]+)?)\s*\.\s*$'
)


def clean_literal(value: str) -> str | None:
    """Clean a literal per RDFTripleParser.java:228-234; None if rejected."""
    cleaned = _LITERAL_CLEAN_RE.sub("", value).strip()
    if MIN_LITERAL_LEN <= len(cleaned) <= MAX_LITERAL_LEN:
        return cleaned
    return None


def repair_uri(uri: str) -> str | None:
    """Percent-encode bad URI characters; reject over-length URIs."""
    if len(uri) > MAX_URI_LEN:
        return None
    return _BAD_URI_CHAR_RE.sub(lambda m: "%%%02X" % ord(m.group(0)), uri)


def parse_ntriples_lines(lines: list[str]) -> pa.Table:
    """Parse N-Triples-ish lines into an (s, p, o, o_is_literal) table.

    Comment / blank / unparseable lines are dropped (the reference logs and
    skips malformed statements).
    """
    ss, ps, os_, lit = [], [], [], []
    for line in lines:
        if not line or line.lstrip().startswith("#"):
            continue
        m = _NT_LINE_RE.match(line)
        if not m:
            continue
        s, p, o_uri, o_lit = m.groups()
        ss.append(s)
        ps.append(p)
        if o_uri is not None:
            os_.append(o_uri)
            lit.append(False)
        else:
            os_.append(o_lit.replace('\\"', '"').replace("\\\\", "\\"))
            lit.append(True)
    return pa.table(
        {
            "s": pa.array(ss, pa.string()),
            "p": pa.array(ps, pa.string()),
            "o": pa.array(os_, pa.string()),
            "o_is_literal": pa.array(lit, pa.bool_()),
        }
    )


def clean_triples(batch: pa.Table) -> pa.Table:
    """Vectorized cleaning filter for a (s, p, o, o_is_literal) batch.

    Applies the reference's URI-length and literal-cleaning rules and
    returns the surviving rows with cleaned values.
    """
    s = batch["s"].to_pylist()
    p = batch["p"].to_pylist()
    o = batch["o"].to_pylist()
    is_lit = batch["o_is_literal"].to_pylist()

    out_s, out_p, out_o, out_lit = [], [], [], []
    for si, pi, oi, li in zip(s, p, o, is_lit):
        rs = repair_uri(si)
        rp = repair_uri(pi)
        if rs is None or rp is None:
            continue
        if li:
            ro = clean_literal(oi)
        else:
            ro = repair_uri(oi)
        if ro is None:
            continue
        out_s.append(rs)
        out_p.append(rp)
        out_o.append(ro)
        out_lit.append(li)
    return pa.table(
        {
            "s": pa.array(out_s, pa.string()),
            "p": pa.array(out_p, pa.string()),
            "o": pa.array(out_o, pa.string()),
            "o_is_literal": pa.array(out_lit, pa.bool_()),
        }
    )


def split_triples(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a cleaned batch into (object_triples, datatype_triples)."""
    mask = batch["o_is_literal"]
    dt = batch.filter(mask).select(["s", "p", "o"])
    ot = batch.filter(pc.invert(mask)).select(["s", "p", "o"])
    return ot, dt

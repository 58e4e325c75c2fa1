"""Deterministic RDF dump fixtures for the parser-coverage queries.

The driver gate needs the Turtle / RDF/XML / compression ingestion paths
(``scoobie_ray.kb.parser``) to be oracle-checkable.  Like
:mod:`scoobie_ray.sources.fixtures`, the dumps are pure relational
derivations of the TPC-H test tables, so DuckDB can re-derive the parsed
output in SQL (``scoobie_ray.oracle`` mirrors this spec — change BOTH or
neither):

Turtle dump (``kb_parse_turtle``), from nation + region:
    nation  <http://example.org/nation/<k>>
        rdfs:label "<n_name>"@en ;  a ont:Nation ;
        ont:inRegion <http://example.org/region/<n_regionkey>> .
    region  <http://example.org/region/<k>>
        rdfs:label "<r_name>" ;  a ont:Region .
    The nation block is written PLAIN .ttl; the region block is GZIPPED
    .ttl.gz (compression coverage rides the same oracle).
    Filter-exercise extras (only the survivor appears in the oracle):
        <.../escape/1> rdfs:comment "a\\nb\\tc"  -> cleaned to "abc";
        a subject URI > 120 chars                -> dropped;
        a literal of length 1 and one of 150     -> dropped.

RDF/XML dump (``kb_parse_rdfxml``), from supplier, BZIP2-compressed:
    <ont:Supplier rdf:about="http://example.org/supplier/<k>">
        <rdfs:label><s_name></rdfs:label>
        <ont:inNation rdf:resource="http://example.org/nation/<s_nationkey>"/>
    </ont:Supplier>
    yielding per supplier: rdf:type, rdfs:label (literal), inNation (uri).

Both queries return the CLEANED (s, p, o, o_is_literal) table.
"""

from __future__ import annotations

import bz2
import gzip
import os
import tempfile

import pyarrow.parquet as pq

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
ONT = "http://example.org/ont/"


def write_turtle_dump(sf_dir: str, out_dir: str | None = None) -> list[str]:
    """Write the nation/region Turtle fixture dump; returns file paths
    (plain .ttl for nations, .ttl.gz for regions)."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="scoobie-ttl-")
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])

    head = (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ont: <http://example.org/ont/> .\n"
        "@prefix nat: <http://example.org/nation/> .\n"
        "@prefix reg: <http://example.org/region/> .\n\n"
    )
    lines = [head]
    for k, name, rk in zip(
        nation["n_nationkey"].to_pylist(),
        nation["n_name"].to_pylist(),
        nation["n_regionkey"].to_pylist(),
    ):
        lines.append(
            f'nat:{k} rdfs:label "{name}"@en ;\n'
            f"    a ont:Nation ;\n"
            f"    ont:inRegion reg:{rk} .\n"
        )
    # filter-exercise extras (see module doc; the oracle lists survivors)
    lines.append('<http://example.org/escape/1> rdfs:comment "a\\nb\\tc" .\n')
    lines.append(f'<http://example.org/too-long/{"x" * 120}> rdfs:label "dropped" .\n')
    lines.append('<http://example.org/escape/2> rdfs:comment "x" .\n')  # len 1 -> dropped
    lines.append(f'<http://example.org/escape/3> rdfs:comment "{"y" * 150}" .\n')  # dropped
    ttl_path = os.path.join(out_dir, "nations.ttl")
    with open(ttl_path, "w") as f:
        f.write("".join(lines))

    rlines = [head]
    for k, name in zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()):
        rlines.append(f'reg:{k} rdfs:label "{name}" ;\n    a ont:Region .\n')
    gz_path = os.path.join(out_dir, "regions.ttl.gz")
    with open(gz_path, "wb") as f:
        f.write(gzip.compress("".join(rlines).encode("utf-8")))
    return [ttl_path, gz_path]


def write_rdfxml_dump(sf_dir: str, out_dir: str | None = None) -> list[str]:
    """Write the supplier RDF/XML fixture dump, bzip2-compressed."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="scoobie-rdfxml-")
    supplier = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    parts = [
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
        f'         xmlns:rdfs="{RDFS}"\n'
        f'         xmlns:ont="{ONT}">\n'
    ]
    for k, name, nk in zip(
        supplier["s_suppkey"].to_pylist(),
        supplier["s_name"].to_pylist(),
        supplier["s_nationkey"].to_pylist(),
    ):
        parts.append(
            f'  <ont:Supplier rdf:about="http://example.org/supplier/{k}">\n'
            f"    <rdfs:label>{name}</rdfs:label>\n"
            f'    <ont:inNation rdf:resource="http://example.org/nation/{nk}"/>\n'
            f"  </ont:Supplier>\n"
        )
    parts.append("</rdf:RDF>\n")
    path = os.path.join(out_dir, "suppliers.rdf.bz2")
    with open(path, "wb") as f:
        f.write(bz2.compress("".join(parts).encode("utf-8")))
    return [path]

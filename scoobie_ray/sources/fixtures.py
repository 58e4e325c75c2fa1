"""Deterministic KG fixtures derived from the TPC-H-ish test tables.

The driver's correctness gate runs our Ray pipelines against DuckDB SQL
oracles over the same parquet tables.  To make the *whole KG pipeline*
SQL-checkable, the KB and the document corpus are pure relational
derivations of the nation / region / supplier / customer tables — every
expected pipeline output (mentions, candidates, resolved subjects, known
facts, predictions, canonical triples) is then independently computable in
ANSI SQL (see ``scoobie_ray.oracle``).

Derivation (mirrors FIXTURES.md in spirit; deterministic, seedless):

KB entities and labels
    nation   uri  http://example.org/nation/<n_nationkey>     label n_name
    region   uri  http://example.org/region/<r_regionkey>     label r_name
    supplier uri  http://example.org/supplier/<s_suppkey>     label s_name
    customer uri  http://example.org/customer/<c_custkey>     labels c_name
             and the shared alias 'Holder_<c_custkey % 50>' (ambiguity sets
             of ~n_customers/50, exercising disambiguation like the
             reference's disambiguation suites)
Relations (object properties)
    nation   --locatedIn-->  region        (n_regionkey)
    supplier --operatesIn--> nation        (s_nationkey)
    customer --basedIn-->    nation        (c_nationkey)
    rdf:type edges to ont classes Nation/Region/Supplier/Customer.

Documents (one per entity; interleaved spans with media spans that carry
no text — the per-row span-sequence invariant rides on these):
    nation    doc-nation-<k>     "<n_name> is a nation in <r_name>."
    supplier  doc-supplier-<k>   "<s_name> operates in <n_name>."
    customer  doc-customer-<k>   "<c_name> is based in <n_name>."
    alias     doc-alias-<k>      "<Holder_k%50> is based in <n_name>."
Span layout per doc (key = entity key):
    span0 = subject label (text), span1 = rest of sentence (text);
    key % 3 == 0 → an image span between span0 and span1;
    key % 3 == 1 → an audio span after span1; else no media span.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ..kb.build import build_kb_from_triples
from ..kb.bundle import RDF_TYPE, RDFS_LABEL, KBBundle
from .docs import DOC_SCHEMA

ONT = "http://example.org/ont/"
P_LOCATED_IN = ONT + "locatedIn"
P_OPERATES_IN = ONT + "operatesIn"
P_BASED_IN = ONT + "basedIn"
C_NATION = ONT + "Nation"
C_REGION = ONT + "Region"
C_SUPPLIER = ONT + "Supplier"
C_CUSTOMER = ONT + "Customer"

URI_NATION = "http://example.org/nation/%d"
URI_REGION = "http://example.org/region/%d"
URI_SUPPLIER = "http://example.org/supplier/%d"
URI_CUSTOMER = "http://example.org/customer/%d"

ALIAS_MOD = 50
T_NATION = " is a nation in "
T_OPERATES = " operates in "
T_BASED = " is based in "


def _read(sf_dir: str, table: str, columns: list[str]) -> pa.Table:
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def kg_triple_table(sf_dir: str) -> pa.Table:
    """The KB triple source (s, p, o, o_is_literal) derived from TPC-H."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    s, p, o, lit = [], [], [], []

    def add(su: str, pr: str, ob: str, is_lit: bool) -> None:
        s.append(su)
        p.append(pr)
        o.append(ob)
        lit.append(is_lit)

    for k, name, rk in zip(*[nation[c].to_pylist() for c in nation.column_names]):
        u = URI_NATION % k
        add(u, RDFS_LABEL, name, True)
        add(u, RDF_TYPE, C_NATION, False)
        add(u, P_LOCATED_IN, URI_REGION % rk, False)
    for k, name in zip(*[region[c].to_pylist() for c in region.column_names]):
        u = URI_REGION % k
        add(u, RDFS_LABEL, name, True)
        add(u, RDF_TYPE, C_REGION, False)
    for k, name, nk in zip(*[supplier[c].to_pylist() for c in supplier.column_names]):
        u = URI_SUPPLIER % k
        add(u, RDFS_LABEL, name, True)
        add(u, RDF_TYPE, C_SUPPLIER, False)
        add(u, P_OPERATES_IN, URI_NATION % nk, False)
    for k, name, nk in zip(*[customer[c].to_pylist() for c in customer.column_names]):
        u = URI_CUSTOMER % k
        add(u, RDFS_LABEL, name, True)
        add(u, RDFS_LABEL, "Holder_%d" % (k % ALIAS_MOD), True)
        add(u, RDF_TYPE, C_CUSTOMER, False)
        add(u, P_BASED_IN, URI_NATION % nk, False)

    return pa.table(
        {
            "s": pa.array(s, pa.string()),
            "p": pa.array(p, pa.string()),
            "o": pa.array(o, pa.string()),
            "o_is_literal": pa.array(lit, pa.bool_()),
        }
    )


def kg_kb(sf_dir: str) -> KBBundle:
    return build_kb_from_triples(kg_triple_table(sf_dir))


def _doc_rows(doc_id: str, key: int, subject_label: str, rest: str) -> dict:
    """Build one interleaved doc row per the span-layout rules above."""
    spans: list[dict] = [
        {"kind": "text", "text": subject_label, "media_ref": "", "offset": 0}
    ]
    off = len(subject_label)
    if key % 3 == 0:
        spans.append(
            {
                "kind": "image",
                "text": "",
                "media_ref": "media://img/%s" % doc_id,
                "offset": off,
            }
        )
    spans.append({"kind": "text", "text": rest, "media_ref": "", "offset": off})
    if key % 3 == 1:
        spans.append(
            {
                "kind": "audio",
                "text": "",
                "media_ref": "media://aud/%s" % doc_id,
                "offset": off + len(rest),
            }
        )
    return {"doc_id": doc_id, "spans": spans}


def kg_docs_table(sf_dir: str) -> pa.Table:
    """The interleaved document corpus derived from TPC-H (see module doc)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    region_name = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    nation_name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    rows: list[dict] = []
    for k, name, rk in zip(*[nation[c].to_pylist() for c in nation.column_names]):
        rows.append(
            _doc_rows("doc-nation-%d" % k, k, name, T_NATION + region_name[rk] + ".")
        )
    for k, name, nk in zip(*[supplier[c].to_pylist() for c in supplier.column_names]):
        rows.append(
            _doc_rows("doc-supplier-%d" % k, k, name, T_OPERATES + nation_name[nk] + ".")
        )
    for k, name, nk in zip(*[customer[c].to_pylist() for c in customer.column_names]):
        rows.append(
            _doc_rows("doc-customer-%d" % k, k, name, T_BASED + nation_name[nk] + ".")
        )
        rows.append(
            _doc_rows(
                "doc-alias-%d" % k,
                k,
                "Holder_%d" % (k % ALIAS_MOD),
                T_BASED + nation_name[nk] + ".",
            )
        )
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def regex_docs_table(sf_dir: str, limit: int = 500) -> pa.Table:
    """Regex-rich corpus for the slot-7 recognizer oracle (kg_regex).

    One doc per order (first ``limit`` by o_orderkey), EXACT template::

        Order <okey> placed <date> total <price> contact c<okey>@tpch.example refs <refs>.

    where date = ISO o_orderdate, price = "<okey%1000>.<(okey*7)%100 zero-
    padded to 2>", refs = (okey*7)%10000.  Every DATE/FLOAT/MAIL/INTEGER
    match position is then pure string arithmetic — mirrored in SQL by
    ``oracle.ORACLES["kg_regex"]`` / ``["kg_regex_priority"]``.  Change
    BOTH or neither (CLAUDE.md oracle-coupling invariant)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).sort_by(
        "o_orderkey"
    ).slice(0, limit)
    ids, texts = [], []
    for okey, odate in zip(
        orders["o_orderkey"].to_pylist(), orders["o_orderdate"].to_pylist()
    ):
        price = "%d.%02d" % (okey % 1000, (okey * 7) % 100)
        refs = (okey * 7) % 10000
        # o_orderdate may be date or (as in the testdata) midnight datetime;
        # either way the doc carries the ISO DATE only (oracle: strftime)
        day = odate.date() if hasattr(odate, "date") else odate
        ids.append("doc-regex-%d" % okey)
        texts.append(
            "Order %d placed %s total %s contact c%d@tpch.example refs %d."
            % (okey, day.isoformat(), price, okey, refs)
        )
    return pa.table(
        {"doc_id": pa.array(ids, pa.string()), "plain_text": pa.array(texts, pa.string())}
    )


def sentence_docs_table(sf_dir: str, limit: int = 600) -> pa.Table:
    """Multi-sentence corpus for the slot-1/2 segmentation oracle
    (doc_sentences): doc i concatenates the :func:`regex_docs_table`
    templates of orders 3i, 3i+1, 3i+2 (first ``limit`` orders by
    o_orderkey, ``limit`` divisible by 3) joined by single spaces.  Each
    template is one sentence ending in '.', tokenizes to exactly 21
    tokens under the segmenter's rules, and its length is
    64 + 2·len(okey) + len(okey%1000) + len((okey·7)%10000) — so every
    sentence's token count and char span is pure arithmetic, mirrored in
    SQL by ``oracle.ORACLES["doc_sentences"]``.  Change BOTH or neither."""
    assert limit % 3 == 0
    base = regex_docs_table(sf_dir, limit=limit)
    texts = base["plain_text"].to_pylist()
    ids, out = [], []
    for i in range(0, len(texts) - len(texts) % 3, 3):
        ids.append("doc-sent-%d" % (i // 3))
        out.append(" ".join(texts[i : i + 3]))
    return pa.table(
        {"doc_id": pa.array(ids, pa.string()), "plain_text": pa.array(out, pa.string())}
    )


def media_docs_table(sf_dir: str, limit: int = 200) -> pa.Table:
    """Deterministic BINARY media corpus for the multimodal decode oracle
    (media_decode): part p (first ``limit`` by p_partkey) yields a real
    binary-PPM image of (w, h) = (4 + p%13, 3 + p%7) whose three channels
    all equal (x + 3·y + p) % 256 — dims and pixel sums are pure
    arithmetic, mirrored in SQL by ``oracle.ORACLES["media_decode"]``.
    Change BOTH or neither.  width/height ship as 0 placeholders so
    ``DecodeImage`` overwrites them from the decoded header."""
    import numpy as np

    from ..ops.multimodal import encode_ppm

    parts = _read(sf_dir, "part", ["p_partkey"]).sort_by("p_partkey").slice(0, limit)
    ids, payloads = [], []
    for k in parts["p_partkey"].to_pylist():
        w, h = 4 + k % 13, 3 + k % 7
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        v = ((x + 3 * y + k) % 256).astype(np.uint8)
        ids.append("media-%d" % k)
        payloads.append(encode_ppm(np.repeat(v[:, :, None], 3, axis=2)))
    n = len(ids)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
        }
    )


def audio_docs_table(sf_dir: str, limit: int = 200) -> pa.Table:
    """Deterministic RIFF/WAV PCM16 corpus for the audio decode oracle
    (audio_decode): part p gives a mono clip of n = 64 + p%129 samples at
    rate 8000 + (p%5)·1000 with sample(i) = ((i·37 + p·101) % 4001) −
    2000 — counts, rates and amplitude sums are pure arithmetic, mirrored
    in SQL by ``oracle.ORACLES["audio_decode"]``.  Change BOTH or
    neither."""
    import io
    import wave

    import numpy as np

    parts = _read(sf_dir, "part", ["p_partkey"]).sort_by("p_partkey").slice(0, limit)
    ids, payloads = [], []
    for k in parts["p_partkey"].to_pylist():
        n = 64 + k % 129
        rate = 8000 + (k % 5) * 1000
        i = np.arange(n)
        samples = (((i * 37 + k * 101) % 4001) - 2000).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(samples.tobytes())
        ids.append("audio-%d" % k)
        payloads.append(buf.getvalue())
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def kg_bench_docs_table(
    sf_dir: str, sentences_per_doc: int = 20, variant: int = 0
) -> pa.Table:
    """Bench-scale corpus: multi-sentence documents (realistic doc length,
    ~40 mentions/doc) assembled from the same entity sentences as
    :func:`kg_docs_table`.  One text span per sentence; an image span every
    third sentence boundary (span invariant still exercised).  Deterministic;
    not oracle-gated (the per-doc single-sentence corpus is)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    region_name = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    nation_name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    sentences: list[str] = []
    for k, name, rk in zip(*[nation[c].to_pylist() for c in nation.column_names]):
        sentences.append(name + T_NATION + region_name[rk] + ".")
    for k, name, nk in zip(*[supplier[c].to_pylist() for c in supplier.column_names]):
        sentences.append(name + T_OPERATES + nation_name[nk] + ".")
    for k, name, nk in zip(*[customer[c].to_pylist() for c in customer.column_names]):
        sentences.append(name + T_BASED + nation_name[nk] + ".")
        sentences.append(
            "Holder_%d" % (k % ALIAS_MOD) + T_BASED + nation_name[nk] + "."
        )

    if variant:
        # rotate by a stride co-prime-ish with the corpus so each variant
        # groups different sentences into a doc -> distinct literal sets
        # per variant (replicated bench corpora shouldn't hand the
        # cross-doc memo free hits the real corpus wouldn't)
        shift = (variant * 7919) % len(sentences)
        sentences = sentences[shift:] + sentences[:shift]

    rows: list[dict] = []
    for i in range(0, len(sentences), sentences_per_doc):
        chunk = sentences[i : i + sentences_per_doc]
        doc_id = "bench-%06d" % (i // sentences_per_doc)
        spans: list[dict] = []
        off = 0
        for j, s in enumerate(chunk):
            text = s + " "
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
            off += len(text)
            if j % 3 == 2:
                spans.append(
                    {
                        "kind": "image",
                        "text": "",
                        "media_ref": "media://img/%s/%d" % (doc_id, j),
                        "offset": off,
                    }
                )
        rows.append({"doc_id": doc_id, "spans": spans})
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


# ---------------------------------------------------------------------------
# Hand-written smoke fixture mirroring the reference's test1/test2.ttl
# (Percy Jackson / Camp Halfblood; see FIXTURES.md §4).
# ---------------------------------------------------------------------------

SMOKE_TRIPLES = [
    ("http://example.org/instance#Percy_Jackson", RDFS_LABEL, "Percy Jackson", True),
    ("http://example.org/instance#Percy_Jackson", RDF_TYPE, ONT + "Person", False),
    ("http://example.org/instance#Camp_Halfblood", RDFS_LABEL, "Camp Halfblood", True),
    ("http://example.org/instance#Camp_Halfblood", RDF_TYPE, ONT + "Place", False),
    (
        "http://example.org/instance#Percy_Jackson",
        ONT + "livesIn",
        "http://example.org/instance#Camp_Halfblood",
        False,
    ),
]


def smoke_kb() -> KBBundle:
    t = pa.table(
        {
            "s": pa.array([r[0] for r in SMOKE_TRIPLES]),
            "p": pa.array([r[1] for r in SMOKE_TRIPLES]),
            "o": pa.array([r[2] for r in SMOKE_TRIPLES]),
            "o_is_literal": pa.array([r[3] for r in SMOKE_TRIPLES]),
        }
    )
    return build_kb_from_triples(t)


def smoke_docs() -> pa.Table:
    rows = [
        {
            "doc_id": "smoke-1",
            "spans": [
                {"kind": "text", "text": "Percy Jackson", "media_ref": "", "offset": 0},
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": "media://img/smoke-1",
                    "offset": 13,
                },
                {
                    "kind": "text",
                    "text": " lives in Camp Halfblood.",
                    "media_ref": "",
                    "offset": 13,
                },
            ],
        },
        {
            "doc_id": "smoke-2",
            "spans": [
                {
                    "kind": "text",
                    "text": "Nobody mentioned here.",
                    "media_ref": "",
                    "offset": 0,
                }
            ],
        },
    ]
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)

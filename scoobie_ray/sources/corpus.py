"""Corpus readers — directories / zips of text documents + gold labels.

The reference iterates zip or directory corpora (`corpus/TextCorpus.java
:309-334`) and pairs each document with a gold-URI list pulled from a
labels archive (`corpus/LabeledTextCorpus.getGroundTruth:139-159`;
subclass hooks extract gold URIs per corpus format, e.g. the Wikinews
regex `"http://dbpedia.org/\\w+/\\w+"`, WikinewsCorpus.java:37-66).

Ray-native: ``read_text_corpus`` turns a directory or zip of ``*.txt``
into the interleaved-doc Dataset shape (one text span per file);
``read_gold_labels`` builds the per-doc gold table for evaluation joins
on ``doc_id``.
"""

from __future__ import annotations

import os
import re
import zipfile

import pyarrow as pa

from .docs import DOC_SCHEMA

GOLD_SCHEMA = pa.schema([("doc_id", pa.string()), ("uri", pa.string())])

_DEFAULT_GOLD_RE = re.compile(r"https?://[^\s<>\"]+")


def _iter_entries(path: str):
    """Yield (name, text) from a directory or zip of text files."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            fp = os.path.join(path, name)
            if os.path.isfile(fp) and not name.startswith("."):
                with open(fp, encoding="utf-8", errors="replace") as f:
                    yield name, f.read()
    elif zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            for name in sorted(zf.namelist()):
                if name.endswith("/"):
                    continue
                yield name, zf.read(name).decode("utf-8", errors="replace")
    else:
        raise ValueError(f"not a directory or zip: {path}")


def corpus_table(path: str) -> pa.Table:
    rows = []
    for name, text in _iter_entries(path):
        rows.append(
            {
                "doc_id": name,
                "spans": [
                    {"kind": "text", "text": text, "media_ref": "", "offset": 0}
                ],
            }
        )
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def read_text_corpus(path: str):
    """Directory/zip of text files -> interleaved-doc Dataset."""
    import ray.data

    return ray.data.from_arrow(corpus_table(path))


def gold_table(path: str, extract=None) -> pa.Table:
    """Labels directory/zip -> (doc_id, uri) gold rows.

    ``extract(text) -> list[str]`` is the per-corpus hook
    (LabeledTextCorpus.extractLabels); default: every URI-looking token.
    """
    extract = extract or (lambda text: _DEFAULT_GOLD_RE.findall(text))
    ids, uris = [], []
    for name, text in _iter_entries(path):
        for u in extract(text):
            ids.append(name)
            uris.append(u)
    return pa.table(
        {"doc_id": pa.array(ids, pa.string()), "uri": pa.array(uris, pa.string())}
    )


def read_gold_labels(path: str, extract=None):
    import ray.data

    return ray.data.from_arrow(gold_table(path, extract))


# ---------------------------------------------------------------------------
# per-corpus gold extractors (reference subclass hooks)


_WIKINEWS_GOLD_RE = re.compile(r'"(https?://dbpedia\.org/\w+/\w+)"', re.IGNORECASE)


def wikinews_extract_labels(text: str) -> list[str]:
    """WikinewsCorpus.extractLabels (WikinewsCorpus.java:37-66): every
    quoted dbpedia URI, case-insensitive, with /page/ rewritten to
    /resource/ and quotes stripped."""
    return [
        m.replace("/page/", "/resource/") for m in _WIKINEWS_GOLD_RE.findall(text)
    ]


_FOAF_NAME = "http://xmlns.com/foaf/0.1/name"


def bbcmusic_extract_labels(rdfxml_text: str) -> list[str]:
    """BBCMusicCorpus.extractLabels (BBCMusicCorpus.java:88-110): parse
    the RDF/XML label document, gold = subjects of foaf:name statements."""
    from ..kb.parser import parse_rdfxml

    t = parse_rdfxml(rdfxml_text)
    out, seen = [], set()
    for s, p in zip(t["s"].to_pylist(), t["p"].to_pylist()):
        if p == _FOAF_NAME and s not in seen:
            seen.add(s)
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# CoNLL corpus (-DOCSTART- document splitting, ConllCorpus.java:84-112)

DOCSTART = "-DOCSTART-"


def conll_split_docs(text: str) -> list[tuple[str, str]]:
    """Split a CoNLL file into (doc_id, plain_text) documents: a line
    starting with -DOCSTART- begins a new document (numbered from 1 like
    the reference's '#<count>' URIs); within a document the text is the
    FIRST whitespace-split field of each line, space-joined, with empty
    lines preserved as newlines (ConllCorpus.createPlainTextCorpus:53-80).

    Deliberate deviation from ConllCorpus.forEach:95-101: the reference
    numbers each flushed document with the ALREADY-INCREMENTED counter
    (first doc gets '#2') and silently drops the text after the last
    -DOCSTART-; here documents are numbered in order of appearance and
    the trailing document is kept.
    """
    docs: list[tuple[str, str]] = []
    count = 0
    buf: list[str] = []

    def flush():
        if buf:
            docs.append((f"#{count}", "".join(buf).strip()))
        buf.clear()

    for line in text.splitlines():
        if line.startswith(DOCSTART):
            flush()
            count += 1
        elif not line.strip():
            buf.append("\n")
        else:
            buf.append(line.split(" ")[0] + " ")
    flush()
    return docs


def conll_gold_mentions(text: str) -> list[tuple[str, str, str]]:
    """Gold entity mentions from CoNLL IOB NER tags: (doc_id, phrase,
    entity_type) per contiguous B-X/I-X run.  Feeds spotting/linking P-R
    in :mod:`scoobie_ray.evaluate` (the labeled-corpus evaluation path the
    reference drives through LabeledTextCorpus.getGroundTruth)."""
    out: list[tuple[str, str, str]] = []
    count = 0
    cur_tokens: list[str] = []
    cur_type = ""

    def flush_entity():
        nonlocal cur_tokens, cur_type
        if cur_tokens:
            out.append((f"#{count}", " ".join(cur_tokens), cur_type))
        cur_tokens, cur_type = [], ""

    for line in text.splitlines():
        if line.startswith(DOCSTART):
            flush_entity()
            count += 1
            continue
        parts = line.split()
        if len(parts) < 2:
            flush_entity()
            continue
        token, tag = parts[0], parts[-1]
        if tag.startswith("B-"):
            flush_entity()
            cur_tokens = [token]
            cur_type = tag[2:]
        elif tag.startswith("I-") and cur_tokens and tag[2:] == cur_type:
            cur_tokens.append(token)
        elif tag.startswith("I-"):  # I- without B- opens a new entity
            flush_entity()
            cur_tokens = [token]
            cur_type = tag[2:]
        else:
            flush_entity()
    flush_entity()
    return out


def read_conll_corpus(path: str):
    """CoNLL file -> (docs Dataset in the interleaved-doc shape, gold
    mention table (doc_id, phrase, entity_type))."""
    import ray.data

    with open(path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    docs = conll_split_docs(text)
    rows = [
        {
            "doc_id": did,
            "spans": [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
        }
        for did, t in docs
    ]
    gold = conll_gold_mentions(text)
    gold_tbl = pa.table(
        {
            "doc_id": pa.array([g[0] for g in gold], pa.string()),
            "phrase": pa.array([g[1] for g in gold], pa.string()),
            "entity_type": pa.array([g[2] for g in gold], pa.string()),
        }
    )
    return (
        ray.data.from_arrow(pa.Table.from_pylist(rows, schema=DOC_SCHEMA)),
        gold_tbl,
    )


# remaining reference extractors — all reuse the same parser machinery

RDFS_LABEL_URI = "http://www.w3.org/2000/01/rdf-schema#label"
DCTERMS_TITLE = "http://purl.org/dc/terms/title"

#: GutenbergCorpus.extractLabels (GutenbergCorpus.java:53-69) is the same
#: quoted-dbpedia-URI regex as Wikinews
gutenberg_extract_labels = wikinews_extract_labels


def _subjects_of(t, preds: set[str]) -> list[str]:
    out, seen = [], set()
    for s, p in zip(t["s"].to_pylist(), t["p"].to_pylist()):
        if p in preds and s not in seen:
            seen.add(s)
            out.append(s)
    return out


def wikipedia_extract_labels(turtle_text: str) -> list[str]:
    """WikipediaCorpus.extractLabels (WikipediaCorpus.java:54-72): parse
    the Turtle label document; gold = subjects of rdfs:label statements."""
    from ..kb.parser import parse_turtle

    return _subjects_of(parse_turtle(turtle_text), {RDFS_LABEL_URI})


def bbcnature_extract_labels(rdfxml_text: str) -> list[str]:
    """BBCNatureCorpus.extractLabels (BBCNatureCorpus.java:89-110): parse
    RDF/XML; gold = subjects of rdfs:label PLUS dcterms:title statements
    (label subjects listed first, mirroring the reference's two loops)."""
    from ..kb.parser import parse_rdfxml

    t = parse_rdfxml(rdfxml_text)
    labels = _subjects_of(t, {RDFS_LABEL_URI})
    titles = [s for s in _subjects_of(t, {DCTERMS_TITLE}) if s not in set(labels)]
    return labels + titles

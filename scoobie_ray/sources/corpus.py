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

"""Gate for the MENTIONS-CTE assumption in scoobie_ray/oracle.py.

The oracle's MENTIONS CTE models only the FIRST occurrence of each label
per doc (DuckDB strpos) and applies the word-boundary test there, while
the engine spots EVERY boundary occurrence.  That is sound only while the
fixtures guarantee, per (doc, label):

1. at most ONE word-boundary occurrence of the label in the doc text;
2. if a boundary occurrence exists, the first (any-position) occurrence
   IS that boundary occurrence — i.e. no non-boundary occurrence precedes
   a genuine one (else the oracle would silently drop a valid mention).

If this test ever fails after a fixture/corpus change, generalize the CTE
to enumerate all occurrences instead of strpos (see oracle.py comment).
"""

import re

import duckdb
import pytest

from scoobie_ray.oracle import DOCPARTS, DOCS, LABELS

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _boundary_occurrences(text: str, label: str) -> list[int]:
    return [
        m.start()
        for m in re.finditer(
            r"(?<![A-Za-z0-9_])" + re.escape(label) + r"(?![A-Za-z0-9_])", text
        )
    ]


def test_labels_occur_at_most_once_per_doc(con):
    docs = con.execute(
        f"WITH {DOCPARTS}, {DOCS.lstrip()} SELECT doc_id, text FROM docs"
    ).fetchall()
    labels = [
        r[0]
        for r in con.execute(
            f"WITH {LABELS.lstrip()} SELECT DISTINCT label FROM labels"
        ).fetchall()
    ]
    violations = []
    for doc_id, text in docs:
        for label in labels:
            if label not in text:
                continue
            hits = _boundary_occurrences(text, label)
            if len(hits) > 1:
                violations.append((doc_id, label, "multiple boundary hits"))
            elif hits and text.find(label) != hits[0]:
                violations.append((doc_id, label, "first occurrence not the boundary one"))
    assert not violations, violations[:10]

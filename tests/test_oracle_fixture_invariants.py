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


# ---------------------------------------------------------------------------
# dedup-oracle fixture gates (see oracle.py "near-dup dedup oracles" note)


def _doc_texts(sf=SF):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_document_texts_are_ascii():
    """char_shingles windows over UTF-8 BYTES while the SQL oracle uses
    substr() over CHARACTERS — identical only for pure-ASCII texts.  If
    this fails after a fixture change, switch the oracle to shingle over
    encode()d bytes."""
    bad = [d for d, t in _doc_texts().items() if not t.isascii()]
    assert not bad, f"non-ASCII document texts break byte/char shingle parity: {bad[:10]}"


def test_duplicate_clusters_are_hub_connected():
    """The engine verifies only hub star-pairs (bucket-min vs each mate);
    the oracle unions ALL above-threshold pairs.  Equal only while every
    planted cluster is HUB-CONNECTED: each member within threshold of the
    component's min-id member.  A chain A~B~C with A!~C would pass the
    oracle but fail the engine — this gate catches that fixture shape
    before it produces a confusing CORRECTNESS diff."""
    from scoobie_ray.ops.dedup import char_shingles, jaccard, jaccard_u64, word_ngrams

    texts = _doc_texts()
    ids = sorted(texts)
    for prepare, accept_thresh, name in [
        (lambda t: char_shingles(t, 5), 0.8, "minhash"),
        (lambda t: word_ngrams(t, 3), 0.5, "ngram"),
    ]:
        sketches = {d: prepare(texts[d]) for d in ids}
        sim = jaccard_u64 if name == "minhash" else jaccard
        # all above-threshold pairs -> union-find components
        parent = {d: d for d in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        edges = []
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if sim(sketches[a], sketches[b]) >= accept_thresh:
                    edges.append((a, b))
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        for d in ids:
            comps.setdefault(find(d), []).append(d)
        for hub, members in comps.items():
            for m in members:
                if m == hub:
                    continue
                assert sim(sketches[hub], sketches[m]) >= accept_thresh, (
                    f"{name}: cluster {hub} is chain-shaped — member {m} not "
                    f"within threshold of the hub; engine star-verify would "
                    f"diverge from the all-pairs oracle"
                )


def test_documents_single_spaced_lowercase():
    """The doc_tokens oracle derives token offsets by splitting on single
    spaces; that equals the segmenter's output only while document texts
    are single-spaced lowercase a-z words (no punctuation, no doubled/
    leading/trailing spaces).  Fix oracle.py doc_tokens if this fails
    after a testdata regeneration."""
    import re

    texts = _doc_texts().values()
    bad = [
        t[:40]
        for t in texts
        if not t or not re.fullmatch(r"[a-z]+( [a-z]+)*", t)
    ]
    assert not bad, f"documents texts violate the space-split assumption: {bad[:3]}"

"""Word + sentence segmentation (pipeline slots 1-2).

The reference tokenizes with ICU ``BreakIterator`` word/sentence instances
(WordSegmenter.java:40-58, SentenceSegmenter.java:41-63).  PyICU is not
available in this environment, so we use an explicit, documented rule set
(Unicode word chars + single non-space punctuation tokens; sentence breaks
after [.!?]+ followed by whitespace/end).  Non-Latin approximation of the
ICU behavior: CJK ideographs and kana segment one token per character
(ICU uses dictionary-based breaking there — per-char is the standard
stand-in and keeps offsets well-defined), and the CJK full-width
terminators 。！？ break sentences WITHOUT requiring trailing whitespace.
Latin-script behavior is byte-identical to the previous rule set (the
np_chunks golden rides on it).  Offsets are char offsets into
``plain_text`` and all downstream annotations key on them, mirroring the
reference's offset-keyed DataSheet (model/DataSheet.java:42-129).

Both segmenters run fused in one stateless ``map_batches`` stage — regexes
are module-level compiled constants, so plain tasks (no actor pool) are
enough; output columns are Arrow list columns parallel to each doc row:
``tok_start/tok_end: list<int64>``, ``tok_sent: list<int64>``.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..sources.docs import add_plain_text

# CJK ideographs (+ ext A), kana, and CJK compatibility ideographs: one
# token per character; all other word chars group into runs as before
_CJK = "㐀-䶿一-鿿぀-ヿ豈-﫿"
_WORD_RE = re.compile(
    rf"[{_CJK}]|(?:(?![{_CJK}])\w)+|[^\w\s]", re.UNICODE
)
_SENT_RE = re.compile(r"[.!?]+(?=\s|$)|[。！？]+")


def tokenize(text: str) -> tuple[list[int], list[int]]:
    starts, ends = [], []
    for m in _WORD_RE.finditer(text):
        starts.append(m.start())
        ends.append(m.end())
    return starts, ends


def sentence_ids(text: str, tok_starts: list[int]) -> list[int]:
    """Sentence id per token: tokens up to and including a terminator run
    belong to the same sentence."""
    bounds = [m.end() for m in _SENT_RE.finditer(text)]
    out = []
    si = 0
    for s in tok_starts:
        while si < len(bounds) and s >= bounds[si]:
            si += 1
        out.append(si)
    return out


def segment_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: ensure plain_text, add token and sentence columns."""
    if "plain_text" not in batch.column_names:
        batch = add_plain_text(batch)
    texts = batch["plain_text"].to_pylist()
    all_starts, all_ends, all_sents = [], [], []
    for t in texts:
        s, e = tokenize(t)
        all_starts.append(s)
        all_ends.append(e)
        all_sents.append(sentence_ids(t, s))
    return (
        batch.append_column("tok_start", pa.array(all_starts, pa.list_(pa.int64())))
        .append_column("tok_end", pa.array(all_ends, pa.list_(pa.int64())))
        .append_column("tok_sent", pa.array(all_sents, pa.list_(pa.int64())))
    )

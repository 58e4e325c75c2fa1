"""POS tagging (slot 3) and noun-phrase chunking (slot 4).

The reference uses an OpenNLP maxent POS tagger (``en-pos-maxent.bin``)
and a Mallet CRF chunker (``EN.crf``) — both model blobs are stripped from
the repo (`.MISSING_LARGE_BLOBS`), so bit-parity is impossible
(SURVEY.md §7.4).  These stages are deliberate, documented stand-ins with
the same interface and tag inventories:

- :class:`POSTagger` — lexicon + suffix-rule tagger emitting Penn-style
  tags (the inventory POSTagging.java feeds to the chunker), loaded once
  per actor (the load-once actor contract of the model stages);
- :class:`NounPhraseChunker` — determiner/adjective/noun grammar over the
  POS tags emitting B-NP/I-NP/O, including the reference's
  I-NP-without-B-NP repair (Document.getNounPhrases, Document.java:503-522:
  an I-NP run with no opening B-NP is treated as starting a phrase).

Output columns: ``tok_pos: list<string>``, ``tok_np: list<string>``
(parallel to tok_start/tok_end from segment.py).
"""

from __future__ import annotations

import re

import pyarrow as pa

# compact lexicon for closed-class words; open-class words fall to rules
_LEXICON = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT",
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "being": "VBG", "has": "VBZ", "have": "VBP", "had": "VBD",
    "do": "VBP", "does": "VBZ", "did": "VBD", "will": "MD", "would": "MD",
    "can": "MD", "could": "MD", "shall": "MD", "should": "MD", "may": "MD",
    "might": "MD", "must": "MD",
    "in": "IN", "on": "IN", "at": "IN", "by": "IN", "for": "IN", "of": "IN",
    "with": "IN", "from": "IN", "to": "TO", "as": "IN", "into": "IN",
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC",
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP", "we": "PRP",
    "i": "PRP", "you": "PRP", "his": "PRP$", "her": "PRP$", "its": "PRP$",
    "their": "PRP$", "our": "PRP$", "my": "PRP$", "your": "PRP$",
    "not": "RB", "very": "RB", "also": "RB",
}

_NUM_RE = re.compile(r"^\d+([.,]\d+)*$")
_PUNCT_RE = re.compile(r"^[^\w\s]+$")


def tag_token(word: str, sent_start: bool) -> str:
    lw = word.lower()
    if lw in _LEXICON:
        return _LEXICON[lw]
    if _NUM_RE.match(word):
        return "CD"
    if _PUNCT_RE.match(word):
        return "."
    if word[:1].isupper() and not sent_start:
        return "NNP"
    if lw.endswith("ly"):
        return "RB"
    if lw.endswith(("ing",)):
        return "VBG"
    if lw.endswith(("ed",)):
        return "VBD"
    if lw.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic")):
        return "JJ"
    if lw.endswith("s") and not lw.endswith(("ss", "us", "is")):
        return "NNS"
    if word[:1].isupper():
        return "NNP"  # sentence-initial capitalized defaults to proper noun
    return "NN"


class POSTagger:
    """map_batches stage over segmented docs (requires tok_* columns)."""

    def __init__(self):
        self.lexicon = _LEXICON  # loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["plain_text"].to_pylist()
        all_pos = []
        for text, starts, ends, sents in zip(
            texts,
            batch["tok_start"].to_pylist(),
            batch["tok_end"].to_pylist(),
            batch["tok_sent"].to_pylist(),
        ):
            pos = []
            prev_sent = -1
            for s, e, sid in zip(starts, ends, sents):
                word = text[s:e]
                pos.append(tag_token(word, sent_start=(sid != prev_sent)))
                prev_sent = sid
            all_pos.append(pos)
        return batch.append_column(
            "tok_pos", pa.array(all_pos, pa.list_(pa.string()))
        )


_NP_OPEN = {"DT", "JJ", "NN", "NNS", "NNP", "CD", "PRP$"}
_NP_CONT = {"JJ", "NN", "NNS", "NNP", "CD"}


class NounPhraseChunker:
    """B-NP/I-NP/O chunking over POS tags (requires tok_pos)."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_np = []
        for pos in batch["tok_pos"].to_pylist():
            np_tags = []
            in_np = False
            for p in pos:
                if not in_np:
                    if p in _NP_OPEN and p != "PRP$":
                        np_tags.append("B-NP")
                        in_np = True
                    elif p == "PRP$" or p == "DT":
                        np_tags.append("B-NP")
                        in_np = True
                    else:
                        np_tags.append("O")
                else:
                    if p in _NP_CONT:
                        np_tags.append("I-NP")
                    else:
                        np_tags.append("O")
                        in_np = False
            all_np.append(np_tags)
        return batch.append_column(
            "tok_np", pa.array(all_np, pa.list_(pa.string()))
        )


def noun_phrases(
    tok_start: list[int],
    tok_end: list[int],
    np_tags: list[str],
    text: str,
) -> list[tuple[int, int, str]]:
    """Reconstruct phrase spans from B/I tags with the reference's
    I-NP-without-B-NP repair (Document.java:503-522): a dangling I-NP run
    opens a new phrase."""
    phrases: list[tuple[int, int, str]] = []
    cur_start: int | None = None
    cur_end: int | None = None
    prev = "O"
    for s, e, t in zip(tok_start, tok_end, np_tags):
        opens = t == "B-NP" or (t == "I-NP" and prev not in ("B-NP", "I-NP"))
        if opens:
            if cur_start is not None:
                phrases.append((cur_start, cur_end, text[cur_start:cur_end]))
            cur_start, cur_end = s, e
        elif t == "I-NP":
            cur_end = e
        else:
            if cur_start is not None:
                phrases.append((cur_start, cur_end, text[cur_start:cur_end]))
                cur_start = None
        prev = t
    if cur_start is not None:
        phrases.append((cur_start, cur_end, text[cur_start:cur_end]))
    return phrases

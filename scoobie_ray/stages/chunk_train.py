"""Trainable noun-phrase chunker (slot 4's model path) — averaged
perceptron over the reference's CRF feature set.

The reference trains a Mallet CRF from conll2000/tiger
(transducer/model/NounPhraseChunker.java:63-…; the EN.crf blob itself is
absent from its repo, but ``corpora/conll2000`` IS shipped as zips).  Its
feature pipe (model/NounPhraseChunkerPipe.java:56-107 + buildPipe at
NounPhraseChunker.java:300-315) is: per-token word text ``W=`` (case
PRESERVED — the pipe's ``.toLowerCase()`` is commented out), POS tag
``T=``, and both repeated for every neighbour in a ±3 window
(``FeaturesInWindow`` with position suffixes); the CRF itself adds an
order-1 label dependency.  This module reproduces that supervision with
the same classic averaged structured perceptron used for slot 3
(:mod:`tag_train` — Collins 2002, greedy left-to-right with label-history
features standing in for the CRF's transition weights), trained over the
FULL conll2000 chunk tagset (B-NP/I-NP/B-VP/…/O) exactly as the reference
does.

``read_conll_chunked`` reads the reference's zipped corpus directly;
``TrainedNPChunker`` drops into the same map_batches contract as the
rule-based :class:`scoobie_ray.stages.tag.NounPhraseChunker` (consumes
tok_pos, emits ``tok_np``), collapsing non-NP chunk labels to ``O`` since
downstream (``noun_phrases``) consumes B-NP/I-NP/O.  The heuristic stays
the default so the np_chunks/doc_pos_np golden outputs are untouched;
wire the trained model via ``ExtractActor(chunker_model=…)``.
"""

from __future__ import annotations

import random
from collections import defaultdict

import pyarrow as pa

from .tag_train import PerceptronModel


def _chunk_features(
    words: list[str], tags: list[str], i: int, prev: str, prev2: str
) -> list[str]:
    """NounPhraseChunkerPipe features: token word + POS, ±3 windowed word
    and POS with position offsets, plus label history (the perceptron
    stand-in for the CRF's order-1 transitions)."""
    feats = [
        "b",
        f"W={words[i]}",
        f"T={tags[i]}",
        f"p-1={prev}",
        f"p-2,p-1={prev2}|{prev}",
    ]
    n = len(words)
    for d in (-3, -2, -1, 1, 2, 3):
        j = i + d
        if 0 <= j < n:  # FeaturesInWindow omits out-of-range neighbours
            feats.append(f"T{d}={tags[j]}")
            feats.append(f"W{d}={words[j]}")
    return feats


class ChunkerModel(PerceptronModel):
    """Sparse averaged-perceptron weights over the full chunk tagset."""

    def chunk_sentence(self, words: list[str], tags: list[str]) -> list[str]:
        prev, prev2 = "<s>", "<s>"
        out = []
        for i in range(len(words)):
            label = self.predict(_chunk_features(words, tags, i, prev, prev2))
            out.append(label)
            prev2, prev = prev, label
        return out


def train_chunker(
    sentences: list[list[tuple[str, str, str]]],
    iterations: int = 5,
    seed: int = 42,
) -> ChunkerModel:
    """Averaged-perceptron training over (word, pos, chunk) sentences —
    the same update schedule as :func:`tag_train.train_tagger`."""
    model = ChunkerModel()
    model.tags = sorted({c for s in sentences for _w, _t, c in s})
    totals: dict[tuple[str, str], float] = defaultdict(float)
    tstamps: dict[tuple[str, str], int] = defaultdict(int)
    step = 0

    def upd(f: str, tag: str, delta: float) -> None:
        nonlocal step
        key = (f, tag)
        row = model.weights.setdefault(f, {})
        totals[key] += (step - tstamps[key]) * row.get(tag, 0.0)
        tstamps[key] = step
        row[tag] = row.get(tag, 0.0) + delta

    rng = random.Random(seed)
    order = list(range(len(sentences)))
    for _ in range(iterations):
        rng.shuffle(order)
        for si in order:
            sent = sentences[si]
            words = [w for w, _t, _c in sent]
            tags = [t for _w, t, _c in sent]
            prev, prev2 = "<s>", "<s>"
            for i, (_w, _t, gold) in enumerate(sent):
                step += 1
                feats = _chunk_features(words, tags, i, prev, prev2)
                guess = model.predict(feats)
                if guess != gold:
                    for f in feats:
                        upd(f, gold, 1.0)
                        upd(f, guess, -1.0)
                prev2, prev = prev, guess  # condition on predicted history
    for f, row in model.weights.items():
        for tag in list(row):
            key = (f, tag)
            total = totals[key] + (step - tstamps[key]) * row[tag]
            avg = total / max(1, step)
            if abs(avg) > 1e-9:
                row[tag] = avg
            else:
                del row[tag]
    return model


def read_conll_chunked(path: str) -> list[list[tuple[str, str, str]]]:
    """(word, pos, chunk) sentences from a CoNLL-2000 file — reads ``.zip``
    archives in place (the reference ships the corpus zipped under
    ``corpora/conll2000``)."""
    import io
    import zipfile

    from ..sources.corpus import DOCSTART

    sentences: list[list[tuple[str, str, str]]] = []
    cur: list[tuple[str, str, str]] = []

    def scan(fh) -> None:
        nonlocal cur
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(DOCSTART) or not line.strip():
                if cur:
                    sentences.append(cur)
                    cur = []
                continue
            parts = line.split()
            if len(parts) >= 3:
                cur.append((parts[0], parts[1], parts[2]))

    if path.endswith(".zip"):
        # close the ARCHIVE handle too, not just the member stream (the
        # bare ZipFile leaked one fd per call)
        with zipfile.ZipFile(path) as zf:
            inner = zf.namelist()[0]
            with io.TextIOWrapper(
                zf.open(inner), encoding="utf-8", errors="replace"
            ) as fh:
                scan(fh)
    else:
        with open(path, encoding="utf-8", errors="replace") as fh:
            scan(fh)
    if cur:
        sentences.append(cur)
    return sentences


def np_spans(labels: list[str]) -> set[tuple[int, int]]:
    """NP chunk spans (start, end token index, half-open) from B/I labels,
    with the reference's dangling-I-NP repair (Document.java:503-522)."""
    spans: set[tuple[int, int]] = set()
    start = None
    prev = "O"
    for i, lab in enumerate(labels):
        opens = lab == "B-NP" or (lab == "I-NP" and prev not in ("B-NP", "I-NP"))
        if opens:
            if start is not None:
                spans.add((start, i))
            start = i
        elif lab != "I-NP" and start is not None:
            spans.add((start, i))
            start = None
        prev = lab
    if start is not None:
        spans.add((start, len(labels)))
    return spans


def np_chunk_f1(
    model: ChunkerModel, sentences: list[list[tuple[str, str, str]]]
) -> float:
    """CoNLL-style NP chunk F1 (exact span match) on held-out sentences."""
    tp = fp = fn = 0
    for sent in sentences:
        words = [w for w, _t, _c in sent]
        tags = [t for _w, t, _c in sent]
        gold = np_spans([c for _w, _t, c in sent])
        pred = np_spans(model.chunk_sentence(words, tags))
        tp += len(gold & pred)
        fp += len(pred - gold)
        fn += len(gold - pred)
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    return 2 * prec * rec / max(1e-9, prec + rec)


class TrainedNPChunker:
    """map_batches stage over POS-tagged docs: same contract as the rule
    chunker (reads tok_pos + token text, appends ``tok_np``), backed by a
    trained :class:`ChunkerModel`; non-NP chunk predictions collapse to
    ``O`` for the downstream B-NP/I-NP/O consumers."""

    def __init__(self, model: ChunkerModel):
        self.model = model

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["plain_text"].to_pylist()
        starts = batch["tok_start"].to_pylist()
        ends = batch["tok_end"].to_pylist()
        sent_ids = batch["tok_sent"].to_pylist()
        pos_tags = batch["tok_pos"].to_pylist()
        out = []
        for text, ts, te, sids, pos in zip(texts, starts, ends, sent_ids, pos_tags):
            words = [text[a:b] for a, b in zip(ts, te)]
            labels: list[str] = []
            sw: list[str] = []
            st: list[str] = []
            cur_sid = sids[0] if sids else 0
            for w, p, sid in zip(words, pos, sids):
                if sid != cur_sid:
                    labels.extend(self.model.chunk_sentence(sw, st))
                    sw, st = [], []
                    cur_sid = sid
                sw.append(w)
                st.append(p)
            if sw:
                labels.extend(self.model.chunk_sentence(sw, st))
            np_only = [lab if lab in ("B-NP", "I-NP") else "O" for lab in labels]
            out.append(np_only)
        return batch.append_column("tok_np", pa.array(out, pa.list_(pa.string())))


CONLL2000_TRAIN = "/root/reference/corpora/conll2000/training_conll2000.txt.zip"
CONLL2000_TEST = "/root/reference/corpora/conll2000/test_conll2000.txt.zip"

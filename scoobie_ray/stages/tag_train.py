"""Trainable POS tagger (slot 3's model path) — averaged perceptron.

The reference ships an OpenNLP *maxent* model blob (``en-pos-maxent.bin``,
stripped from its repo), trained on annotated corpora.  This module
provides the equivalent *trainable* path with a classic averaged
structured perceptron (Collins 2002 — greedy left-to-right decoding with
history features), so a deployment can train from any CoNLL-format
annotated corpus at KB-build time (``read_conll_tagged`` feeds it; the
container has no network, so tests train on a deterministic synthetic
treebank and gate held-out accuracy ≥ 95%).

``TrainedPOSTagger`` drops into the same map_batches contract as the
heuristic :class:`scoobie_ray.stages.tag.POSTagger` (consumes tok_*
columns, emits ``tok_pos``); the heuristic stays the default so the
np_chunks golden outputs are untouched.
"""

from __future__ import annotations

import random
from collections import defaultdict

import pyarrow as pa


def _features(words: list[str], i: int, prev: str, prev2: str) -> list[str]:
    w = words[i]
    lw = w.lower()
    shape = (
        "X" if w.isupper() else "Xx" if w[:1].isupper() else "d" if w.isdigit() else "x"
    )
    feats = [
        "b",
        f"w={lw}",
        f"suf3={lw[-3:]}",
        f"suf2={lw[-2:]}",
        f"pre1={lw[:1]}",
        f"shape={shape}",
        f"t-1={prev}",
        f"t-2,t-1={prev2}|{prev}",
        f"w-1={words[i - 1].lower() if i else '<s>'}",
        f"w+1={words[i + 1].lower() if i + 1 < len(words) else '</s>'}",
        f"first={i == 0}",
    ]
    return feats


class PerceptronModel:
    """Sparse weights: feature -> {tag: weight}; averaged at finalize."""

    def __init__(self):
        self.weights: dict[str, dict[str, float]] = {}
        self.tags: list[str] = []

    def predict(self, feats: list[str]) -> str:
        scores: dict[str, float] = defaultdict(float)
        for f in feats:
            row = self.weights.get(f)
            if row:
                for tag, w in row.items():
                    scores[tag] += w
        if not scores:
            return self.tags[0] if self.tags else "NN"
        # deterministic argmax: score desc, tag asc
        return min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    def tag_sentence(self, words: list[str]) -> list[str]:
        prev, prev2 = "<s>", "<s>"
        out = []
        for i in range(len(words)):
            tag = self.predict(_features(words, i, prev, prev2))
            out.append(tag)
            prev2, prev = prev, tag
        return out


def train_tagger(
    sentences: list[list[tuple[str, str]]],
    iterations: int = 5,
    seed: int = 42,
) -> PerceptronModel:
    """Averaged-perceptron training over (word, tag) sentences."""
    model = PerceptronModel()
    model.tags = sorted({t for s in sentences for _w, t in s})
    # accumulators for averaging
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
            words = [w for w, _t in sent]
            prev, prev2 = "<s>", "<s>"
            for i, (_w, gold) in enumerate(sent):
                step += 1
                feats = _features(words, i, prev, prev2)
                guess = model.predict(feats)
                if guess != gold:
                    for f in feats:
                        upd(f, gold, 1.0)
                        upd(f, guess, -1.0)
                prev2, prev = prev, guess  # condition on predicted history
    # average
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


def read_conll_tagged(path: str, pos_col: int = 1) -> list[list[tuple[str, str]]]:
    """(word, pos) sentences from a CoNLL file (blank-line sentence
    boundaries, -DOCSTART- lines skipped) — the train-time feed."""
    from ..sources.corpus import DOCSTART

    sentences: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(DOCSTART) or not line.strip():
                if cur:
                    sentences.append(cur)
                    cur = []
                continue
            parts = line.split()
            if len(parts) > pos_col:
                cur.append((parts[0], parts[pos_col]))
    if cur:
        sentences.append(cur)
    return sentences


class TrainedPOSTagger:
    """map_batches stage over segmented docs: same contract as the
    heuristic POSTagger (reads tok_start/tok_end/plain_text, appends
    tok_pos), but backed by a trained :class:`PerceptronModel`."""

    def __init__(self, model: PerceptronModel):
        self.model = model

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["plain_text"].to_pylist()
        starts = batch["tok_start"].to_pylist()
        ends = batch["tok_end"].to_pylist()
        sent_ids = batch["tok_sent"].to_pylist()
        out = []
        for text, ts, te, sids in zip(texts, starts, ends, sent_ids):
            words = [text[a:b] for a, b in zip(ts, te)]
            tags: list[str] = []
            sent: list[str] = []
            cur_sid = sids[0] if sids else 0
            for w, sid in zip(words, sids):
                if sid != cur_sid:
                    tags.extend(self.model.tag_sentence(sent))
                    sent = []
                    cur_sid = sid
                sent.append(w)
            if sent:
                tags.extend(self.model.tag_sentence(sent))
            out.append(tags)
        return batch.append_column("tok_pos", pa.array(out, pa.list_(pa.string())))

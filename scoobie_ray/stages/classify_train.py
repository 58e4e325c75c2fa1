"""Trainable phrase classifier (slot 8's model path) — MaxEnt.

The reference trains a Mallet MaxEnt model over windowed n-gram / POS /
shape features (transducer/EntityClassification.java:56-147, feature
extraction corpus/LabeledTextCorpus.java:293-492) and types unresolved
noun phrases when the top-2 label probability margin exceeds a threshold
(0.6).  The trained blob is absent from the reference repo (SURVEY.md
§7.4), so — like the slot-3 tagger in ``tag_train.py`` — this module
provides the equivalent *trainable* path:

- :func:`extract_features` — faithful port of
  ``LabeledTextCorpus.extractFeatures`` (:293-340): context window ±4
  around the phrase, prefix/postfix 1-3-grams (``a:``/``p:``), infix
  content 1-grams (``i:``), POS filter {VB, ADJ, NNP, NN, NNS}, the
  word-shape regex classes of ``scanWordSyntax`` (:403-492) and 3-char
  suffixes.  Divergence from the reference (documented): feature sets are
  emitted in deterministic order (the reference iterates Java HashSets).
- :func:`train_maxent` — multinomial logistic regression (= MaxEnt) by
  seeded SGD over the sparse string features; small dense weights.
- :func:`build_phrase_examples` — DISTRIBUTED training-data derivation at
  KB-build time: a ``map_batches`` stage segments, tags and spots each
  doc against the broadcast KB and emits one example per mention whose
  KB candidates all share a single type (the KB-typed-mention supervision
  the reference gets from its labeled corpora).
- :class:`TrainedPhraseClassifier` — drop-in for the KB-lexicon
  :class:`scoobie_ray.stages.classify.PhraseClassifier` (same output
  columns), keeping the reference margin rule p1 − p2 > threshold.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

POS_FILTER = ("VB", "ADJ", "NNP", "NN", "NNS")  # EntityClassification.java:131

# word-shape classes, LabeledTextCorpus.java:106-126 (order = :413-484;
# later matches overwrite earlier ones, exactly like the chained Java ifs)
_SHAPES: list[tuple[str, re.Pattern]] = [
    ("MIXEDCAPS", re.compile(r"[A-Z][a-z]+[A-Z][A-Za-z]*")),
    ("ALLDIGITS", re.compile(r"[0-9]+")),
    ("NUMERICAL", re.compile(r"[-0-9]+[\.,]+[0-9\.,]+")),
    ("DATE", re.compile(r"[0-9]+[!-/:-@\[-`{-~0-9]+")),
    ("ROMAN", re.compile(r"[ivxdlcm]+|[IVXDLCM]+")),
    ("MULTIDOTS", re.compile(r"\.\.+")),
    ("LONELYINITIAL", re.compile(r"[A-Z]\.")),
    ("ABBR", re.compile(r"[A-Za-z][A-Za-z]+\.")),
    ("SINGLECHARALLCAPS", re.compile(r"[A-Za-z]")),
    ("CAPLETTER", re.compile(r"[A-Z]")),
    ("PUNC", re.compile(r"[,\.;:?!()]")),
    ("QUOTES", re.compile(r"[\"`'][A-Za-z]?")),
    ("ENUM", re.compile(r"[0-9]+[,\.;:?!()a-z]+")),
    ("NUMRANGE", re.compile(r"[0-9]+-[0-9]+")),
]


def scan_word_syntax(word: str, use_suffix: bool = True) -> list[str]:
    """``scanWordSyntax`` (LabeledTextCorpus.java:403-492): map the token
    to its last-matching shape class; unshaped tokens > 3 chars also emit
    an ``s:``-prefixed 3-char suffix feature."""
    token = word
    shaped = False
    for name, rx in _SHAPES:
        if rx.fullmatch(word):
            token = name
            shaped = True
    out = []
    if not shaped and len(word) > 3 and use_suffix:
        out.append("s:" + word[-3:])
    out.append(token)
    return out


def scan_word_content(word: str, pos: str, label: str) -> list[str]:
    """``scanWordContent`` (:341-381) with typeProp = 1.0 (the value
    EntityClassification.classify uses): a labeled neighbor contributes
    its TYPE label as the feature; unlabeled neighbors contribute their
    shape/token only when their 2-char POS prefix passes the filter."""
    if label != "O" and len(label) > 1:
        return [label]
    if len(pos) > 1 and pos[:2] in POS_FILTER:
        return scan_word_syntax(word, use_suffix=False)
    return []


def _ngrams(n: int, seq: list[str], before: str) -> list[str]:
    """``calculateNgrams`` (:383-401): comma-joined sliding n-grams with a
    position prefix; short sequences shrink n to the sequence length."""
    k = min(len(seq), n)
    if k == 0:
        return []
    return [before + ",".join(seq[i - k : i]) for i in range(k, len(seq) + 1)]


def extract_features(
    label_lo: int,
    label_hi: int,
    sentence: list[tuple[str, str, str]],
    ngram_sizes: tuple[int, ...] = (1, 2, 3),
    window: int = 4,
) -> list[str]:
    """``extractFeatures`` (:293-340) for a phrase spanning token positions
    [label_lo, label_hi] (inclusive) of its sentence.  ``sentence`` rows
    are (word, pos, label) with label 'O' for untyped tokens."""
    prefixes: list[str] = []
    infixes: list[str] = []
    postfixes: list[str] = []
    for i, (word, pos, label) in enumerate(sentence):
        if i < label_lo:
            if i - label_lo > -window:
                prefixes.extend(scan_word_content(word, pos, label))
        elif i <= label_hi:
            infixes.extend(scan_word_syntax(word, use_suffix=True))
        elif i - label_hi < window:
            postfixes.extend(scan_word_content(word, pos, label))
    text: list[str] = []
    for n in ngram_sizes:
        text.extend(_ngrams(n, prefixes, "a:"))
        text.extend(_ngrams(n, postfixes, "p:"))
    text.extend(_ngrams(1, infixes, "i:"))
    return text


# ---------------------------------------------------------------------------
# MaxEnt (multinomial logistic regression)


class MaxEntModel:
    """Dense multinomial logistic model over a sparse string-feature
    vocabulary; picklable (ships to actors inside map_batches stages)."""

    def __init__(self, vocab: dict[str, int], classes: list[int], W: np.ndarray, b: np.ndarray):
        self.vocab = vocab
        self.classes = classes
        self.W = W  # (n_classes, n_feats)
        self.b = b  # (n_classes,)

    def probs(self, feats: list[str]) -> np.ndarray:
        idx = [j for f in feats if (j := self.vocab.get(f)) is not None]
        z = self.b + (self.W[:, idx].sum(axis=1) if idx else 0.0)
        z = z - z.max()
        e = np.exp(z)
        return e / e.sum()

    def classify(self, feats: list[str], margin: float) -> int | None:
        """Reference decision rule (EntityClassification.java:70-77):
        best label iff p(rank0) − p(rank1) > margin."""
        p = self.probs(feats)
        order = np.argsort(-p, kind="stable")
        top = float(p[order[0]])
        second = float(p[order[1]]) if len(p) > 1 else 0.0
        if top - second > margin:
            return self.classes[int(order[0])]
        return None


def train_maxent(
    examples: list[list[str]],
    labels: list[int],
    epochs: int = 40,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 42,
) -> MaxEntModel:
    """Seeded SGD over softmax cross-entropy — deterministic."""
    vocab: dict[str, int] = {}
    xs: list[np.ndarray] = []
    for feats in examples:
        row = []
        for f in feats:
            j = vocab.get(f)
            if j is None:
                j = vocab[f] = len(vocab)
            row.append(j)
        xs.append(np.asarray(sorted(set(row)), dtype=np.int64))
    classes = sorted(set(labels))
    cidx = {c: i for i, c in enumerate(classes)}
    y = np.asarray([cidx[l] for l in labels], dtype=np.int64)
    C, V = len(classes), len(vocab)
    W = np.zeros((C, V))
    b = np.zeros(C)
    rng = np.random.default_rng(seed)
    order = np.arange(len(xs))
    for _ in range(epochs):
        rng.shuffle(order)
        for i in order:
            idx = xs[i]
            z = b + (W[:, idx].sum(axis=1) if len(idx) else 0.0)
            z = z - z.max()
            e = np.exp(z)
            p = e / e.sum()
            g = p
            g[y[i]] -= 1.0
            if len(idx):
                W[:, idx] -= lr * (g[:, None] + l2 * W[:, idx])
            b -= lr * g
    return MaxEntModel(vocab, classes, W, b)


# ---------------------------------------------------------------------------
# distributed training-data derivation (KB-typed mentions as supervision)


def _phrase_sentence_feats(starts, ends, sents, pos_tags, text, lo_tok, hi_tok):
    """(sentence rows, phrase offsets within sentence) for tokens
    [lo_tok, hi_tok] of the doc."""
    sid = sents[lo_tok]
    sent_idx = [i for i, s in enumerate(sents) if s == sid]
    sentence = [
        (text[starts[i] : ends[i]], pos_tags[i] if pos_tags else "", "O")
        for i in sent_idx
    ]
    base = sent_idx[0]
    return sentence, lo_tok - base, hi_tok - base


class ExampleBuilder:
    """map_batches stage (actor pool): segment + POS-tag + spot each doc
    against the broadcast KB, emit one (features, type) example per
    mention whose KB candidate subjects all share a single rdf:type —
    the KB-typed-mention supervision harvested at build time."""

    def __init__(self, kb):
        from .spot import Spotter, resolve_kb
        from .tag import POSTagger

        self.kb = resolve_kb(kb)
        self.spot = Spotter(self.kb)
        self.tagger = POSTagger()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .segment import segment_batch

        batch = self.tagger(segment_batch(batch))
        batch = self.spot(batch)
        kb = self.kb
        feats_col: list[list[str]] = []
        label_col: list[int] = []
        for text, ts, te, sents, pos_tags, ms, me, ml in zip(
            batch["plain_text"].to_pylist(),
            batch["tok_start"].to_pylist(),
            batch["tok_end"].to_pylist(),
            batch["tok_sent"].to_pylist(),
            batch["tok_pos"].to_pylist(),
            batch["mention_start"].to_pylist(),
            batch["mention_end"].to_pylist(),
            batch["mention_literal"].to_pylist(),
        ):
            for s, e, li in zip(ms, me, ml):
                types = set()
                for subj in kb.distinct_candidates(li).tolist():
                    types.update(kb.types_of(subj).tolist())
                if len(types) != 1:
                    continue  # ambiguous supervision — skip
                ti = [i for i, (a, b) in enumerate(zip(ts, te)) if a >= s and b <= e]
                if not ti:
                    continue
                sentence, lo, hi = _phrase_sentence_feats(
                    ts, te, sents, pos_tags, text, ti[0], ti[-1]
                )
                feats_col.append(extract_features(lo, hi, sentence))
                label_col.append(types.pop())
        return pa.table(
            {
                "feats": pa.array(feats_col, pa.list_(pa.string())),
                "label": pa.array(label_col, pa.int64()),
            }
        )


def build_phrase_examples(docs_ds, kb_ref, concurrency=None):
    """Distributed example harvest; returns the (feats, label) Dataset."""
    from ..util import autoscale_concurrency

    return docs_ds.map_batches(
        ExampleBuilder,
        fn_constructor_kwargs={"kb": kb_ref},
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(cap=8),
    )


def train_phrase_classifier(docs_ds, kb_ref, **train_kw) -> MaxEntModel:
    """KB-build-time entry: harvest examples distributed, train driver-side
    (the model is small; examples collect columnar)."""
    df = build_phrase_examples(docs_ds, kb_ref).to_pandas()
    return train_maxent(
        [list(f) for f in df["feats"]], df["label"].tolist(), **train_kw
    )


class TrainedPhraseClassifier:
    """Drop-in for :class:`scoobie_ray.stages.classify.PhraseClassifier`:
    same input contract (segmented + tagged + NP-chunked batch) and output
    columns (class_start/class_end/class_type), but scored by the trained
    MaxEnt model with the reference margin rule."""

    def __init__(self, model: MaxEntModel, margin: float = 0.6):
        self.model = model
        self.margin = margin

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .tag import noun_phrases

        cs_col, ce_col, ct_col = [], [], []
        for text, starts, ends, sents, pos_tags, np_tags in zip(
            batch["plain_text"].to_pylist(),
            batch["tok_start"].to_pylist(),
            batch["tok_end"].to_pylist(),
            batch["tok_sent"].to_pylist(),
            batch["tok_pos"].to_pylist(),
            batch["tok_np"].to_pylist(),
        ):
            cs, ce, ct = [], [], []
            for p_start, p_end, _surface in noun_phrases(starts, ends, np_tags, text):
                ti = [
                    i
                    for i, (a, b) in enumerate(zip(starts, ends))
                    if a >= p_start and b <= p_end
                ]
                if not ti:
                    continue
                sentence, lo, hi = _phrase_sentence_feats(
                    starts, ends, sents, pos_tags, text, ti[0], ti[-1]
                )
                t = self.model.classify(extract_features(lo, hi, sentence), self.margin)
                if t is not None:
                    cs.append(p_start)
                    ce.append(p_end)
                    ct.append(t)
            cs_col.append(cs)
            ce_col.append(ce)
            ct_col.append(ct)
        lt = pa.list_(pa.int64())
        return (
            batch.append_column("class_start", pa.array(cs_col, lt))
            .append_column("class_end", pa.array(ce_col, lt))
            .append_column("class_type", pa.array(ct_col, lt))
        )

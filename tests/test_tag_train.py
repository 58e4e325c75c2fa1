"""Trainable averaged-perceptron POS tagger (slot 3's model path).

The reference's OpenNLP maxent blob is absent from its own repo and the
container has no network for UD/CoNLL downloads, so training runs on a
deterministic synthetic treebank with tag-ambiguous vocabulary; the gate
is held-out token accuracy ≥ 95% (VERDICT r1 item 8).  np_chunks output
stays on the heuristic tagger and is locked by a golden hash.
"""

import random

import pytest

from scoobie_ray.stages.tag_train import (
    PerceptronModel,
    TrainedPOSTagger,
    read_conll_tagged,
    train_tagger,
)

# synthetic treebank grammar: subjects/objects/verbs/modifiers with words
# that are ambiguous between noun and verb readings ("plans", "visits",
# "reports") so the tagger must use context, not just a lexicon
DETS = [("the", "DT"), ("a", "DT"), ("this", "DT"), ("every", "DT")]
ADJS = [("quick", "JJ"), ("green", "JJ"), ("formal", "JJ"), ("recent", "JJ"), ("large", "JJ")]
NOUNS = [
    ("engineer", "NN"), ("report", "NN"), ("plan", "NN"), ("visit", "NN"),
    ("system", "NN"), ("market", "NN"), ("office", "NN"), ("review", "NN"),
]
AMBIG = ["plans", "visits", "reports", "reviews", "markets"]  # NNS or VBZ
VERBS = [("approves", "VBZ"), ("writes", "VBZ"), ("sees", "VBZ"), ("builds", "VBZ")]
PREPS = [("in", "IN"), ("near", "IN"), ("with", "IN"), ("from", "IN")]


def _corpus(n=400, seed=7):
    rng = random.Random(seed)
    sentences = []
    for _ in range(n):
        det1, adj1, n1 = rng.choice(DETS), rng.choice(ADJS), rng.choice(NOUNS)
        det2, n2 = rng.choice(DETS), rng.choice(NOUNS)
        prep = rng.choice(PREPS)
        kind = rng.random()
        if kind < 0.4:
            # "the quick engineer approves the plan ." (plain verb)
            v = rng.choice(VERBS)
            sent = [det1, adj1, n1, v, det2, n2, (".", ".")]
        elif kind < 0.7:
            # ambiguous word as VBZ: "the engineer plans the visit ."
            amb = rng.choice(AMBIG)
            sent = [det1, n1, (amb, "VBZ"), det2, n2, (".", ".")]
        else:
            # ambiguous word as NNS: "the formal plans grow in the market ."
            amb = rng.choice(AMBIG)
            sent = [det1, adj1, (amb, "NNS"), ("grow", "VBP"), prep, det2, n2, (".", ".")]
        sentences.append(sent)
    return sentences


def test_perceptron_tagger_heldout_accuracy():
    sents = _corpus()
    train, held = sents[:320], sents[320:]
    model = train_tagger(train, iterations=5)
    total = correct = 0
    for sent in held:
        words = [w for w, _t in sent]
        gold = [t for _w, t in sent]
        pred = model.tag_sentence(words)
        total += len(gold)
        correct += sum(p == g for p, g in zip(pred, gold))
    acc = correct / total
    assert acc >= 0.95, acc


def test_ambiguous_words_need_context():
    """The ambiguity is real: the same surface form must receive both NNS
    and VBZ depending on context in the held-out predictions."""
    sents = _corpus()
    model = train_tagger(sents[:320], iterations=5)
    vbz = model.tag_sentence(["the", "engineer", "plans", "the", "visit", "."])
    nns = model.tag_sentence(["the", "formal", "plans", "grow", "in", "the", "market", "."])
    assert vbz[2] == "VBZ"
    assert nns[2] == "NNS"


def test_train_from_conll_file(tmp_path):
    """read_conll_tagged feeds training from CoNLL-format files (the
    build-time path a deployment uses with real UD/CoNLL data)."""
    sents = _corpus(n=60)
    path = tmp_path / "train.conll"
    with open(path, "w") as f:
        f.write("-DOCSTART- -X- -X- O\n\n")
        for sent in sents:
            for w, t in sent:
                f.write(f"{w} {t} I-NP O\n")
            f.write("\n")
    loaded = read_conll_tagged(str(path))
    assert len(loaded) == 60
    assert loaded[0] == sents[0]
    model = train_tagger(loaded, iterations=3)
    assert isinstance(model, PerceptronModel)


def test_trained_tagger_stage_contract():
    """TrainedPOSTagger plugs into the segment->tag->chunk chain with the
    same columns as the heuristic tagger."""
    import pyarrow as pa

    from scoobie_ray.sources.docs import DOC_SCHEMA
    from scoobie_ray.stages.segment import segment_batch
    from scoobie_ray.stages.tag import NounPhraseChunker

    model = train_tagger(_corpus(n=200), iterations=5)
    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "d0",
                "spans": [
                    {
                        "kind": "text",
                        "text": "The engineer plans the visit. A formal review grows.",
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
            }
        ],
        schema=DOC_SCHEMA,
    )
    tagged = TrainedPOSTagger(model)(segment_batch(docs))
    assert "tok_pos" in tagged.column_names
    toks = tagged["tok_pos"].to_pylist()[0]
    starts = tagged["tok_start"].to_pylist()[0]
    assert len(toks) == len(starts)
    chunked = NounPhraseChunker()(tagged)
    assert "tok_np" in chunked.column_names


def test_np_chunks_golden(ray_session):
    """Golden-file gate for the heuristic np_chunks output at sf0.001
    (locks the rows-only driver query)."""
    import hashlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    df = (
        entry.queries()["np_chunks"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
    )
    joined = ",".join(f"{r.doc_id}:{r.n_phrases}" for r in df.itertuples())
    assert len(df) == 500
    assert int(df.n_phrases.sum()) == 2179
    assert hashlib.md5(joined.encode()).hexdigest()[:12] == "4b43b6218338"

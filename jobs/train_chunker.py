"""NP-chunker training job — the KB-build-time counterpart of the
reference's trainer entry point (transducer/model/NounPhraseChunker.java
``train()``/``test()``, driven by TestNounPhraseChunker.java with window
±3): train the slot-4 averaged-perceptron chunker from a CoNLL-2000-format
corpus (plain text or ``.zip``, as the reference ships it), report held-out
NP chunk F1, and pickle the model for ``ExtractActor(chunker_model=…)``.

    python jobs/train_chunker.py \
        --train /root/reference/corpora/conll2000/training_conll2000.txt.zip \
        --test  /root/reference/corpora/conll2000/test_conll2000.txt.zip \
        --out   /tmp/np_chunker.pkl

Training is inherently sequential (structured perceptron over ~210k
tokens, <1 min full-corpus) so this job needs no Ray session; the model
it writes is what gets broadcast once per extraction actor.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv=None) -> int:
    from scoobie_ray.stages.chunk_train import (
        np_chunk_f1,
        read_conll_chunked,
        train_chunker,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--train", required=True, help="CoNLL-2000 train file (.txt or .zip)")
    ap.add_argument("--test", help="held-out CoNLL-2000 file for the F1 report")
    ap.add_argument("--out", required=True, help="output pickle path")
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--max-sentences", type=int, default=0, help="0 = all")
    ap.add_argument("--min-f1", type=float, default=0.0, help="fail the job below this held-out F1")
    args = ap.parse_args(argv)

    t0 = time.time()
    train = read_conll_chunked(args.train)
    if args.max_sentences:
        train = train[: args.max_sentences]
    model = train_chunker(train, iterations=args.iterations)
    train_sec = time.time() - t0

    f1 = None
    if args.test:
        f1 = np_chunk_f1(model, read_conll_chunked(args.test))
        if f1 < args.min_f1:
            print(json.dumps({"error": "held-out F1 below gate", "f1": round(f1, 4)}))
            return 1

    tmp = args.out + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(model, f)
    os.replace(tmp, args.out)

    print(
        json.dumps(
            {
                "out": args.out,
                "train_sentences": len(train),
                "labels": len(model.tags),
                "features": len(model.weights),
                "train_sec": round(train_sec, 1),
                "heldout_np_f1": round(f1, 4) if f1 is not None else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

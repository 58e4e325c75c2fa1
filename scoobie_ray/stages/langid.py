"""Language identification — pipeline slot 0.

The reference wraps the Nutch n-gram ``LanguageIdentifier`` and defaults
to EN (transducer/LanguageIdentification.java:43-86).  This stage applies
the same stopword-profile vote as ops.text.LangId to the document's
``plain_text`` and records a ``lang`` column (default "en" on no
evidence, like the reference)."""

from __future__ import annotations

import re

import pyarrow as pa

from ..ops.text import LangId
from ..sources.docs import add_plain_text


class DocLangId:
    def __init__(self, langs: tuple[str, ...] = ("en", "es", "de", "fr")):
        self._inner = LangId(langs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "plain_text" not in batch.column_names:
            batch = add_plain_text(batch)
        tmp = pa.table({"text": batch["plain_text"]})
        out = self._inner(tmp)
        return batch.append_column("lang", out["lang_pred"])


# ---------------------------------------------------------------------------
# n-gram profile classifier — the reference's actual slot-0 design
# (LanguageIdentification.java:43-86 wraps Nutch's n-gram
# LanguageIdentifier; the stopword vote above is the corpus-scale
# default because its oracle is profile-generated).  Cavnar-Trenkle
# rank-order classification over char 1..3-grams, profiles built from
# small built-in seed texts.

_SEED_TEXTS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the people said "
        "that they would not have been there with this because it is what "
        "we know from the history of the world and the things that are"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "leute sagten dass sie nicht dort gewesen wären mit diesem weil es "
        "das ist was wir aus der geschichte der welt wissen und die dinge"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y la gente "
        "dijo que no habría estado allí con esto porque es lo que sabemos "
        "de la historia del mundo y las cosas que son para los reyes"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et les "
        "gens ont dit qu'ils n'auraient pas été là avec ceci parce que "
        "c'est ce que nous savons de l'histoire du monde et les choses"
    ),
}


def _char_ngrams(text: str, max_n: int = 3):
    t = " " + re.sub(r"\s+", " ", text.lower().strip()) + " "
    for n in range(1, max_n + 1):
        for i in range(len(t) - n + 1):
            yield t[i : i + n]


def _profile(text: str, top: int = 300) -> dict[str, int]:
    from collections import Counter

    counts = Counter(_char_ngrams(text))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return {g: r for r, (g, _c) in enumerate(ranked)}


class NgramLangId:
    """Rank-order (out-of-place) n-gram classifier; same map_batches
    contract as DocLangId / ops.text.LangId.  Profiles are built once per
    actor in ``__init__`` from built-in seed texts (or caller-provided
    training texts via ``seed_texts``)."""

    def __init__(self, seed_texts: dict[str, str] | None = None, top: int = 300):
        self.top = top
        self.profiles = {
            lang: _profile(text, top)
            for lang, text in (seed_texts or _SEED_TEXTS).items()
        }

    def identify(self, text: str) -> str:
        if not (text or "").strip():
            return "en"  # default language, like the reference
        doc = _profile(text, self.top)
        best, best_d = "en", float("inf")
        for lang, prof in sorted(self.profiles.items()):
            d = sum(
                abs(prof.get(g, self.top) - r) for g, r in doc.items()
            )
            if d < best_d:
                best, best_d = lang, d
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = "text" if "text" in batch.column_names else "plain_text"
        if col not in batch.column_names:
            from ..sources.docs import add_plain_text

            batch = add_plain_text(batch)
            col = "plain_text"
        preds = [self.identify(t) for t in batch[col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))

"""The 14-slot pipeline facade — the reference's user-extension surface.

``workflow/Pipeline.java:88-118`` wires 14 fixed transducer slots; users
extend SCOOBIE by subclassing ``Transducer`` and configuring a slot, or
disable one with ``DummyTask``.  Ray-native equivalent: each slot is a
batch transform (callable: pa.Table -> pa.Table) or ``None`` (dummy);
:class:`Pipeline` assembles them into a Ray Dataset chain.

Slot semantics (Pipeline.java:69-87):
  0 languageClassification   -> stages.langid.DocLangId
  1 wordTokenizer            \\  fused: stages.segment.segment_batch
  2 sentenceTokenizer        /   (tokens + sentence ids in one pass)
  3 posTagger                -> stages.tag.POSTagger
  4 nounPhraseChunker        -> stages.tag.NounPhraseChunker
  5 suffixArrayBuilder       -> folded into slot 6 (SURVEY.md §2.1: the
                                suffix array only served the SQL
                                sort-merge; the trie matcher subsumes it)
  6 entityRecognizer         -> stages.spot.Spotter
  7 regexRecognizer          -> stages.regex_recognize.RegexRecognizer
  8 phraseClassifier         -> stages.classify.PhraseClassifier
  9 subjectResolver          -> stages.link.Linker
 10 subjectDisambiguator     -> stages.disambiguate.Disambiguator
 11 factEntailment           \\  fused: stages.facts.FactStage
 13 factExtractor            /   (known + predicted edges in one pass)
 12 relevanceRater           -> stages.rate.RelevanceRater

The default configuration (like test/model/Scoobie.java:129-135, which
runs with classifier/regex/disambiguation-extras as DummyTask) enables
the KB-driven slots; optional slots switch on per flag.  For the fused
high-throughput path use pipelines.extract.ExtractActor directly — this
facade favors slot-level composability (each enabled slot is its own
map_batches stage, stateful ones as actor pools).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa

SLOT_NAMES = [
    "languageClassification",
    "wordTokenizer",
    "sentenceTokenizer",
    "posTagger",
    "nounPhraseChunker",
    "suffixArrayBuilder",
    "entityRecognizer",
    "regexRecognizer",
    "phraseClassifier",
    "subjectResolver",
    "subjectDisambiguator",
    "factEntailment",
    "relevanceRater",
    "factExtractor",
]


@dataclass
class Pipeline:
    """Composable slot pipeline over a broadcast KB.

    ``overrides`` maps a slot name to a replacement callable
    (pa.Table -> pa.Table) or ``None`` to disable the slot (DummyTask).
    """

    kb: Any
    template: Any = None
    resolver: str = "degree"
    markov_k: int = 1
    case_sensitive: bool = True
    enable_langid: bool = False
    enable_tagging: bool = False
    enable_regex: bool = False
    enable_classify: bool = False
    enable_rating: bool = False
    overrides: dict[str, Callable[[pa.Table], pa.Table] | None] = field(
        default_factory=dict
    )

    def _default_slots(self) -> dict[str, Callable | None]:
        from .kb.bundle import KBIndex
        from .stages.disambiguate import Disambiguator
        from .stages.facts import FactStage
        from .stages.langid import DocLangId
        from .stages.link import Linker
        from .stages.rate import RelevanceRater
        from .stages.regex_recognize import RegexRecognizer
        from .stages.segment import segment_batch
        from .stages.spot import SpotConfig, Spotter, resolve_kb
        from .stages.tag import NounPhraseChunker, POSTagger

        index = resolve_kb(self.kb)
        resolved = (
            self.template.resolve(index) if self.template is not None else None
        )
        cfg = SpotConfig(case_sensitive=self.case_sensitive)
        slots: dict[str, Callable | None] = {n: None for n in SLOT_NAMES}
        if self.enable_langid:
            slots["languageClassification"] = DocLangId()
        slots["wordTokenizer"] = segment_batch  # fused word+sentence
        if self.enable_tagging or self.enable_classify:
            slots["posTagger"] = POSTagger()
            slots["nounPhraseChunker"] = NounPhraseChunker()
        slots["entityRecognizer"] = Spotter(index, cfg, template=resolved)
        if self.enable_regex:
            slots["regexRecognizer"] = RegexRecognizer()
        if self.enable_classify:
            from .stages.classify import PhraseClassifier

            slots["phraseClassifier"] = PhraseClassifier(index)
        slots["subjectResolver"] = Linker(index, template=resolved)
        slots["subjectDisambiguator"] = Disambiguator(
            index, resolver=self.resolver, template=resolved
        )
        slots["factEntailment"] = FactStage(index, markov_k=self.markov_k)
        if self.enable_rating:
            slots["relevanceRater"] = RelevanceRater(index)
        return slots

    def stages(self) -> list[tuple[str, Callable]]:
        slots = self._default_slots()
        slots.update(self.overrides)
        order = [
            "languageClassification",
            "wordTokenizer",  # includes sentenceTokenizer
            "posTagger",
            "nounPhraseChunker",
            "entityRecognizer",  # includes suffixArrayBuilder's role
            "regexRecognizer",
            "subjectResolver",
            "subjectDisambiguator",
            "phraseClassifier",
            "factEntailment",  # includes factExtractor (same stage)
            "relevanceRater",
        ]
        return [(n, slots[n]) for n in order if slots.get(n) is not None]

    def annotate(self, docs_ds, batch_size: int = 512):
        """docs Dataset -> annotated Dataset, one map_batches per slot.

        Slot stages here are pre-constructed instances (state built once
        driver-side and shipped with the task closure); for per-actor
        state with an actor pool use pipelines.extract.ExtractActor or
        extract_triples_staged."""
        ds = docs_ds
        for _name, stage in self.stages():
            ds = ds.map_batches(
                stage,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
            )
        return ds

    def run_local(self, batch: pa.Table) -> pa.Table:
        """Run all slots over one in-memory table (tests/debug)."""
        for _name, stage in self.stages():
            batch = stage(batch)
        return batch

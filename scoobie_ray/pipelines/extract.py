"""End-to-end document→triple extraction pipeline (the reference's 14-slot
``workflow/Pipeline.java`` re-expressed as a Ray Data stage chain).

Physical design (SURVEY.md §3.1 "Ours"):

- documents stream as Arrow blocks (``batch_format="pyarrow"``,
  ``zero_copy_batch=True``) — no full materialization anywhere;
- the whole per-document stage chain (spot → link → disambiguate → facts →
  serialize) is FUSED into one actor-pool stage, :class:`ExtractActor`:
  the broadcast KB bundle is fetched and indexed once per actor
  (``__init__``), so trie/adjacency build cost is amortized across every
  batch the actor ever sees, and intermediate annotation columns never hit
  the object store;
- the unfused variant (:func:`annotate_docs`) exposes each stage as its own
  ``map_batches`` call for unit tests and per-stage inspection;
- output is a triple dataset (doc_id, subj, pred, obj, graph, belief) to be
  canonicalized (salted groupby — see canonicalize.py) and written as
  partitioned parquet.

Error handling: the reference swallows per-stage exceptions
(Pipeline.java:170-184); we do NOT — a failing doc fails its batch and Ray
retries the task; systematic failures surface.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..stages.disambiguate import Disambiguator
from ..stages.facts import FactStage
from ..stages.link import Linker
from ..stages.rate import RelevanceRater
from ..stages.segment import segment_batch
from ..stages.serialize import TripleSerializer
from ..stages.spot import SpotConfig, Spotter, resolve_kb


class ExtractActor:
    """Fused extraction stage: one KB index build per actor, whole chain
    per batch.  Use as
    ``docs.map_batches(ExtractActor, fn_constructor_kwargs={"kb": kb_ref},
    batch_format="pyarrow", concurrency=N, batch_size=B)``."""

    def __init__(
        self,
        kb,
        resolver: str = "degree",
        markov_k: int = 1,
        case_sensitive: bool = True,
        emit: str = "triples",  # "triples" | "annotations"
        encoded: bool = False,
        rate: bool | tuple = False,
        template=None,
        segment: bool = False,
        tag: bool = False,
        regex: bool = False,
        classify: bool = False,
        classifier_model=None,
        chunker_model=None,
        langid: bool = False,
        strict: bool = True,
    ):
        self.strict = strict
        self.dead_letters: list[dict] = []
        from ..util import limit_worker_threads

        limit_worker_threads(1)  # actor reserves 1 CPU: keep Arrow to it
        index = resolve_kb(kb)  # one ray.get + index build per actor
        resolved = template.resolve(index) if template is not None else None
        cfg = SpotConfig(case_sensitive=case_sensitive)
        self.spot = Spotter(index, cfg, template=resolved)
        self.link = Linker(index, template=resolved)
        self.disambiguate = Disambiguator(index, resolver=resolver, template=resolved)
        self.facts = FactStage(index, markov_k=markov_k)
        # rate: False | True (default metric set) | tuple of metric names
        self.rater = (
            RelevanceRater(index, metrics=rate)
            if isinstance(rate, tuple)
            else (RelevanceRater(index) if rate else None)
        )
        self.serializer = TripleSerializer(index, encoded=encoded)
        self.emit = emit
        self.segment = segment or tag or classify
        self.tagger = None
        self.chunker = None
        self.classifier = None
        self.regex = None
        self.langid = None
        if tag or classify or chunker_model is not None:
            from ..stages.tag import NounPhraseChunker, POSTagger

            self.segment = True
            self.tagger = POSTagger()
            if chunker_model is not None:
                # trained conll2000 path (stages/chunk_train.py) — the
                # model ships in fn_constructor_kwargs, once per actor
                from ..stages.chunk_train import TrainedNPChunker

                self.chunker = TrainedNPChunker(chunker_model)
            else:
                self.chunker = NounPhraseChunker()
        if classify:
            if classifier_model is not None:
                # trained MaxEnt path (stages/classify_train.py) — the
                # model ships in fn_constructor_kwargs, once per actor
                from ..stages.classify_train import TrainedPhraseClassifier

                self.classifier = TrainedPhraseClassifier(classifier_model)
            else:
                from ..stages.classify import PhraseClassifier

                self.classifier = PhraseClassifier(index)
        if regex:
            from ..stages.regex_recognize import RegexRecognizer

            self.regex = RegexRecognizer()
        if langid:
            from ..stages.langid import DocLangId

            self.langid = DocLangId()

    def annotate(self, batch: pa.Table) -> pa.Table:
        if self.segment:
            from ..stages.segment import segment_batch

            batch = segment_batch(batch)
        if self.langid is not None:
            batch = self.langid(batch)
        if self.tagger is not None:
            batch = self.tagger(batch)
            batch = self.chunker(batch)
        if self.regex is not None:
            batch = self.regex(batch)
        batch = self.spot(batch)
        if self.emit == "annotations":
            # candidate columns are an inspection/eval surface; the triples
            # path skips them (the disambiguator reads the KB directly)
            batch = self.link(batch)
        batch = self.disambiguate(batch)
        if self.classifier is not None:
            batch = self.classifier(batch)
        batch = self.facts(batch)
        if self.rater is not None:
            batch = self.rater(batch)
        return batch

    def _process(self, batch: pa.Table) -> pa.Table:
        annotated = self.annotate(batch)
        if self.emit == "annotations":
            return annotated
        return self.serializer(annotated)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """strict=True (default): a failing document fails the batch and
        Ray retries/raises — the reference swallows per-stage exceptions
        (Pipeline.java:170-184), we refuse to.  strict=False: retry the
        failed batch document-at-a-time and quarantine offenders into a
        dead-letter side output (collected via ``take_dead_letters``)
        instead of poisoning the whole run."""
        if self.strict:
            return self._process(batch)
        try:
            return self._process(batch)
        except Exception:
            parts: list[pa.Table] = []
            for i in range(len(batch)):
                row = batch.slice(i, 1)
                try:
                    parts.append(self._process(row))
                except Exception as exc:  # noqa: BLE001 — quarantined
                    self.dead_letters.append(
                        {
                            "doc_id": row["doc_id"][0].as_py(),
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            if parts:
                return pa.concat_tables(parts)
            return self._process(batch.slice(0, 0))

    def take_dead_letters(self) -> list[dict]:
        out = list(self.dead_letters)
        self.dead_letters.clear()
        return out


def _kb_ref(kb) -> Any:
    """Broadcast the KB bundle once: ray.put of the Arrow-table dict (the
    tables ride the object store zero-copy; every actor on a node shares
    one physical copy)."""
    import ray

    from ..kb.bundle import KBBundle

    if isinstance(kb, ray.ObjectRef):
        return kb
    if isinstance(kb, KBBundle):
        return ray.put(kb.tables())
    return ray.put(kb)


def extract_triples(
    docs_ds,
    kb,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    resolver: str = "degree",
    markov_k: int = 1,
    case_sensitive: bool = True,
    encoded: bool = False,
):
    """docs Dataset -> triples Dataset.

    ``encoded=True``: dictionary-index columns (s, p, o, o_is_lit, g) —
    the scale path feeding canonicalize + decode_triples; otherwise URI
    strings with doc_id provenance."""
    return docs_ds.map_batches(
        ExtractActor,
        fn_constructor_kwargs={
            "kb": _kb_ref(kb),
            "resolver": resolver,
            "markov_k": markov_k,
            "case_sensitive": case_sensitive,
            "encoded": encoded,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def annotate_docs(
    docs_ds,
    kb,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    resolver: str = "degree",
    markov_k: int = 1,
    case_sensitive: bool = True,
    segment: bool = False,
    rate: bool | tuple = False,
):
    """docs Dataset -> annotated docs Dataset (all per-doc list columns
    retained, spans untouched).  Used by per-stage queries/tests and by the
    span-roundtrip invariant check."""
    if segment:
        docs_ds = docs_ds.map_batches(
            segment_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    return docs_ds.map_batches(
        ExtractActor,
        fn_constructor_kwargs={
            "kb": _kb_ref(kb),
            "resolver": resolver,
            "markov_k": markov_k,
            "case_sensitive": case_sensitive,
            "emit": "annotations",
            "rate": rate,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_triples_staged(
    docs_ds,
    kb,
    *,
    spot_concurrency: int | tuple[int, int] | None = 2,
    link_concurrency: int | tuple[int, int] | None = 2,
    repartition_blocks: int | None = None,
    batch_size: int = 512,
    resolver: str = "degree",
    markov_k: int = 1,
    case_sensitive: bool = True,
):
    """Unfused variant with an EXPLICIT repartition between extraction
    (spotting) and linking, per the north rule: mention counts are skewed
    (some docs carry hundreds of mentions, most a handful), so the
    round-robin ``repartition`` rebalances block sizes before the
    link/disambiguate pool.  The fused :func:`extract_triples` is the
    faster path when skew is mild; this is the knob when it isn't."""
    import ray

    from ..stages.disambiguate import Disambiguator
    from ..stages.facts import FactStage
    from ..stages.serialize import TripleSerializer
    from ..stages.spot import SpotConfig, Spotter

    kb_ref = _kb_ref(kb)
    cfg = SpotConfig(case_sensitive=case_sensitive)
    spotted = docs_ds.map_batches(
        Spotter,
        fn_constructor_kwargs={"kb": kb_ref, "config": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=spot_concurrency,
    )
    if repartition_blocks is None:
        repartition_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)
    spotted = spotted.repartition(repartition_blocks)
    resolved = spotted.map_batches(
        Disambiguator,
        fn_constructor_kwargs={"kb": kb_ref, "resolver": resolver},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=link_concurrency,
    ).map_batches(
        FactStage,
        fn_constructor_kwargs={"kb": kb_ref, "markov_k": markov_k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=link_concurrency,
    )
    return resolved.map_batches(
        TripleSerializer,
        fn_constructor_kwargs={"kb": kb_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=link_concurrency,
    )

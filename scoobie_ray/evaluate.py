"""Stage evaluation — the reference's ``Transducer.compare`` machinery.

Per-stage precision/recall against gold tables (workflow/Evaluator.java
:39-45 drives compare() per stage; spotting RDFLiteralSpotting.java
:145-176, linking InstanceRecognition.java:257-305, disambiguation
EntityDisambiguation.java:467-566, rating MAP RelevanceRating.java:89-139
with DoubleMatrix.averagePrecision:123-157, fact prediction accuracy
FactRecommender.java:222-480).

Gold inputs are small relational tables (driver-side pyarrow/pandas);
the evaluated side may be a Ray Dataset (exploded views) or a table.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class PR:
    tp: int
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 1.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def _rows(obj, cols: list[str]) -> set[tuple]:
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        df = obj.to_pandas()  # Ray Dataset
    return set(map(tuple, df[cols].itertuples(index=False, name=None)))


def set_pr(predicted, gold, cols: list[str]) -> PR:
    p = _rows(predicted, cols)
    g = _rows(gold, cols)
    tp = len(p & g)
    return PR(tp=tp, fp=len(p) - tp, fn=len(g) - tp)


def spotting_pr(mentions, gold_mentions) -> PR:
    """(doc_id, m_start, m_end) span match (RDFLiteralSpotting.compare)."""
    return set_pr(mentions, gold_mentions, ["doc_id", "m_start", "m_end"])


def linking_pr(resolved, gold_subjects) -> PR:
    """(doc_id, uri) resolved-subject match (InstanceRecognition.compare)."""
    return set_pr(resolved, gold_subjects, ["doc_id", "subj"])


def triples_pr(canonical, gold_triples) -> PR:
    """(subj, pred, obj, graph) canonical triple-set match — the P/R ≥ 0.95
    gate of the north rule."""
    return set_pr(canonical, gold_triples, ["subj", "pred", "obj", "graph"])


def average_precision(ranked: list[str], relevant: set[str]) -> float:
    """DoubleMatrix.averagePrecision:123-157."""
    if not relevant:
        return 1.0
    hits = 0
    acc = 0.0
    for i, item in enumerate(ranked, start=1):
        if item in relevant:
            hits += 1
            acc += hits / i
    return acc / len(relevant)


def rating_map(ranked_by_doc: dict[str, list[str]], gold_by_doc: dict[str, set[str]]) -> float:
    """Mean average precision of per-doc relevance rankings
    (RelevanceRating.compare)."""
    if not gold_by_doc:
        return 1.0
    total = 0.0
    for doc_id, gold in gold_by_doc.items():
        total += average_precision(ranked_by_doc.get(doc_id, []), gold)
    return total / len(gold_by_doc)


def evaluate_corpus(sf_dir: str) -> dict[str, PR]:
    """Corpus-level per-stage evaluation against the SQL-derived gold —
    the Evaluator loop (workflow/Evaluator.java:39-45) in one call.
    Returns {stage: PR}; used by tests and as a quality report hook."""
    import duckdb

    from .oracle import ORACLES
    from .pipelines import views

    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, PR] = {}
    out["spotting"] = spotting_pr(
        views.kg_spot(sf_dir).to_pandas(), con.execute(ORACLES["kg_spot"]).fetchdf()
    )
    out["linking"] = linking_pr(
        views.kg_resolved(sf_dir).to_pandas(),
        con.execute(ORACLES["kg_resolved"]).fetchdf(),
    )
    out["triples"] = triples_pr(
        views.kg_triples(sf_dir).to_pandas(),
        con.execute(ORACLES["kg_triples"]).fetchdf(),
    )
    return out


def fact_prediction_accuracy(predicted, known) -> dict[str, float]:
    """Accuracy/fallout of predicted edges vs the known KB edges
    (FactRecommender.compare:222-480): a prediction is 'correct' when the
    same (subj, pred, obj) exists as a known triple."""
    p = _rows(predicted, ["subj", "pred", "obj"])
    k = _rows(known, ["subj", "pred", "obj"])
    correct = len(p & k)
    return {
        "accuracy": correct / len(p) if p else 1.0,
        "fallout": (len(p) - correct) / len(p) if p else 0.0,
        "n_predicted": float(len(p)),
    }

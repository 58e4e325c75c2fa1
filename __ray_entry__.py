"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in scoobie_ray) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``      — flagship KG-construction pipeline over sf0.001:
                     interleaved-span docs → spot → link → disambiguate →
                     facts → canonical (subj, pred, obj, graph) triples.
- ``queries()``    — one callable per implemented operator/pipeline
                     (SURVEY.md §2 + the training-data ops); each takes
                     sf_dir and returns a Dataset / Arrow table.
- ``oracle_sql()`` — equivalent DuckDB SQL per query where SQL can express
                     it (scoobie_ray/oracle.py); non-SQL-expressible ops
                     (heuristic language ID, MinHash-LSH clustering) are
                     rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver checks rows>=0)."""
    from scoobie_ray.pipelines import views

    return views.kg_triples("/root/testdata/sf0.001")


# ---- training-data op wrappers ---------------------------------------------


def _documents(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _q_dedup_exact(sf_dir: str):
    from scoobie_ray.ops.dedup import exact_dedup

    return exact_dedup(_documents(sf_dir)).select_columns(["doc_id"])


def _q_dedup_minhash(sf_dir: str):
    from scoobie_ray.ops.dedup import minhash_dedup

    return minhash_dedup(_documents(sf_dir), threshold=0.8).select_columns(["doc_id"])


def _q_dedup_simhash(sf_dir: str):
    from scoobie_ray.ops.dedup import simhash_dedup

    return simhash_dedup(_documents(sf_dir), max_hamming=3).select_columns(["doc_id"])


def _q_fingerprint(sf_dir: str):
    from scoobie_ray.ops.text import fingerprint_batch

    return _documents(sf_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint"])


def _q_text_stats(sf_dir: str):
    from scoobie_ray.ops.text import TextStats

    return _documents(sf_dir).map_batches(
        TextStats, batch_format="pyarrow", concurrency=2
    ).select_columns(["doc_id", "n_chars", "n_tokens", "n_punct"])


def _q_langid(sf_dir: str):
    from scoobie_ray.ops.text import LangId

    return _documents(sf_dir).map_batches(
        LangId, batch_format="pyarrow", concurrency=2
    ).select_columns(["doc_id", "lang_pred"])


def _q_knn(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from scoobie_ray.ops.similarity import knn_bruteforce

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt["vec_id"], 3))
    out = knn_bruteforce(emb, qt["vec_id"].to_pylist(), qt["embedding"].to_pylist(), k=5)
    return out.select(["query_id", "vec_id", "rank"])


def _q_knn_lsh(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from scoobie_ray.ops.similarity import knn_lsh

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt["vec_id"], 3))
    dim = len(qt["embedding"][0].as_py())
    out = knn_lsh(emb, qt["vec_id"].to_pylist(), qt["embedding"].to_pylist(), dim=dim, k=5)
    return out.select(["query_id", "vec_id", "rank"])


def queries() -> dict[str, Callable[[str], Any]]:
    from scoobie_ray.pipelines import views
    from scoobie_ray.relational import queries as rq

    return {
        # --- KG-construction pipeline (SURVEY.md §2.1/§2.3/§2.4) ---
        "kg_spot": views.kg_spot,
        "kg_candidates": views.kg_candidates,
        "kg_resolved": views.kg_resolved,
        "kg_known": views.kg_known,
        "kg_predicted": views.kg_predicted,
        "kg_triples": views.kg_triples,
        "kg_spans": views.kg_spans,
        "kb_resources": views.kb_resources,
        "kb_cardinalities": views.kb_cardinalities,
        "kb_markov": views.kb_markov,
        # --- training-data ops ---
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "fingerprint": _q_fingerprint,
        "text_stats": _q_text_stats,
        "langid": _q_langid,
        "knn_bruteforce": _q_knn,
        "knn_lsh": _q_knn_lsh,
        # --- relational surface ---
        "q1_pricing": rq.q1_pricing,
        "nation_lineitem_counts": rq.nation_lineitem_counts,
        "events_hourly": rq.events_hourly,
        "events_sessionize": rq.events_sessionize,
        "top_parts": rq.top_parts,
        "orders_by_status": rq.orders_by_status,
        "supplier_nation_join": rq.supplier_nation_join,
    }


def oracle_sql() -> dict[str, str]:
    from scoobie_ray.oracle import ORACLES

    # rows-only (non-SQL-expressible): dedup_minhash, dedup_simhash, langid,
    # knn_lsh (approximate by design)
    return dict(ORACLES)

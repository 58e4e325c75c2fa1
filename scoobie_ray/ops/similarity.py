"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast
(``ray.put`` once), each batch does one numpy matmul against it and emits
its local top-k per query; a tiny global merge finishes.  Scale path:
hyperplane-LSH bucketing (probing the query's bucket and neighbors) so
only a fraction of the corpus is scanned per query.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from .dedup import _HyperplaneLSH


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _BruteForceStage:
    """Per-batch cosine scores vs the broadcast query matrix; emits local
    top-k rows (query_id, vec_id, score)."""

    def __init__(self, queries_ref, k: int):
        try:
            import ray

            if isinstance(queries_ref, ray.ObjectRef):
                queries_ref = ray.get(queries_ref)
        except ImportError:
            pass
        self.query_ids, qmat = queries_ref
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64)).T  # dim x nq
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"].to_pylist()))
        ids = np.asarray(batch["vec_id"].to_pylist())
        scores = vecs @ self.qmat  # n x nq
        k = min(self.k, len(ids))
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.query_ids):
            col = scores[:, j]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            for i in top:
                out_q.append(qid)
                out_v.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def _merge_topk(rows: list[dict], k: int) -> pa.Table:
    """Driver-side final merge: tiny input (n_blocks × n_queries × k rows).
    Deterministic order: score desc, vec_id asc."""
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((-r["score"], r["vec_id"]))
    out_q, out_v, out_s, out_r = [], [], [], []
    for qid in sorted(by_q):
        top = heapq.nsmallest(k, by_q[qid])
        for rank, (negs, vid) in enumerate(top):
            out_q.append(qid)
            out_v.append(vid)
            out_s.append(-negs)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
            "rank": pa.array(out_r, pa.int64()),
        }
    )


def knn_bruteforce(ds, query_ids, query_vecs, k: int = 5) -> pa.Table:
    """Exact cosine top-k for each query vector over the dataset.

    query_vecs: (nq, dim) array-like.  Returns an Arrow table
    (query_id, vec_id, score, rank).
    """
    try:
        import ray

        payload = ray.put((list(query_ids), np.asarray(query_vecs, dtype=np.float64)))
    except Exception:
        payload = (list(query_ids), np.asarray(query_vecs, dtype=np.float64))
    local = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _BruteForceStage,
        fn_constructor_kwargs={"queries_ref": payload, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    return _merge_topk(local.take_all(), k)


def knn_lsh(ds, query_ids, query_vecs, dim: int, k: int = 5, n_bits: int = 8) -> pa.Table:
    """LSH-bucketed ANN: scan only rows whose hyperplane bucket matches a
    query's bucket (multi-probe: exact bucket + 1-bit flips).  Recall < 1;
    the scale path when brute force over the full corpus is too slow."""
    lsh = _HyperplaneLSH(dim, n_bits)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_buckets = lsh.bucket(q.astype(np.float32))
    probe: set[int] = set()
    for b in q_buckets.tolist():
        probe.add(int(b))
        for bit in range(n_bits):
            probe.add(int(b) ^ (1 << bit))

    def filter_buckets(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"].to_pylist())).astype(np.float32)
        buckets = lsh.bucket(vecs)
        mask = pa.array([int(b) in probe for b in buckets])
        return batch.filter(mask)

    filtered = ds.select_columns(["vec_id", "embedding"]).map_batches(
        filter_buckets, batch_format="pyarrow"
    )
    return knn_bruteforce(filtered, query_ids, query_vecs, k)

"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast
(``ray.put`` once), each batch does one numpy matmul against it and emits
its local top-k per query; a tiny global merge finishes.

Scale path: a PERSISTED hyperplane-LSH bucket index
(:func:`build_lsh_index` writes the corpus hive-partitioned by bucket;
:func:`knn_lsh_indexed` reads ONLY the probed partition directories), so
at 100 TB a query touches a bounded fraction of storage instead of
re-scanning and re-hashing the corpus per query set.  The directory-level
pruning is explicit (probed paths are enumerated and handed to
``read_parquet``) — no reliance on filter pushdown.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa

from .dedup import _HyperplaneLSH


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix.

    Arrow inputs take the vectorized path: FixedSizeList views its values
    buffer directly; variable ListArray with uniform lengths reshapes the
    flattened values — no per-row Python materialization.  Python lists of
    sequences (tests / small helpers) fall back to ``np.stack``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if pa.types.is_fixed_size_list(col.type):
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), col.type.list_size).astype(np.float64, copy=False)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            import pyarrow.compute as pc

            widths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            if len(widths) and (widths == widths[0]).all():
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return flat.reshape(len(col), int(widths[0])).astype(np.float64, copy=False)
        col = col.to_pylist()
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_fn(queries_payload, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Per-batch cosine scores vs the broadcast query matrix; emits local
    top-k rows (query_id, vec_id, score).  Plain function → task pool
    (auto-scales with input blocks; no actor-count cap)."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        payload = queries_payload
        if isinstance(payload, ray.ObjectRef):
            payload = ray.get(payload)  # local object-store hit per worker
        query_ids, qmat = payload
        qmat = _normalize(np.asarray(qmat, dtype=np.float64)).T  # dim x nq
        vecs = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        scores = vecs @ qmat  # n x nq
        kk = min(k, len(ids))
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(query_ids):
            col = scores[:, j]
            top = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) else np.arange(len(col))
            out_q.extend([qid] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(col[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array([int(v) for v in out_v], pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    return fn


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


def knn_bruteforce(
    ds,
    query_ids,
    query_vecs,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k for each query vector over the dataset.

    query_vecs: (nq, dim) array-like.  Returns an Arrow table
    (query_id, vec_id, score, rank).
    """
    try:
        import ray

        payload = ray.put((list(query_ids), np.asarray(query_vecs, dtype=np.float64)))
    except Exception:
        payload = (list(query_ids), np.asarray(query_vecs, dtype=np.float64))
    local = ds.select_columns([id_col, vec_col]).map_batches(
        _topk_fn(payload, k, id_col, vec_col), batch_format="pyarrow"
    )
    return _merge_topk(local.take_all(), k)


# ---------------------------------------------------------------------------
# persisted LSH-bucket index


def _probe_set(lsh: _HyperplaneLSH, query_vecs: np.ndarray, n_bits: int, probe_bits: int = 1) -> set[int]:
    """Buckets to probe: each query's bucket plus all Hamming ≤ probe_bits
    neighbors (multi-probe for recall)."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe: set[int] = set()
    for b in lsh.bucket(q.astype(np.float32)).tolist():
        probe.add(int(b))
        if probe_bits >= 1:
            for bit in range(n_bits):
                probe.add(int(b) ^ (1 << bit))
        if probe_bits >= 2:
            for b1 in range(n_bits):
                for b2 in range(b1 + 1, n_bits):
                    probe.add(int(b) ^ (1 << b1) ^ (1 << b2))
    return probe


def build_lsh_index(
    ds,
    out_dir: str,
    dim: int,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
):
    """Write the embedding table hive-partitioned by hyperplane-LSH bucket
    (``out_dir/bucket=<b>/...``).  Built once; every subsequent query set
    reads only its probed partitions — the IO-pruning scale path."""
    import pandas as pd

    lsh = _HyperplaneLSH(dim, n_bits, seed)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {
                "bucket": lsh.bucket(vecs).astype(np.int64),
                id_col: batch[id_col].to_numpy(),
                vec_col: list(np.stack(batch[vec_col].to_numpy())),
            }
        )

    (
        ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["bucket"])
    )
    # id_col/vec_col persist with the index so *_indexed query paths read
    # back the same columns the layout was built with (custom names work)
    return {
        "dir": out_dir,
        "dim": dim,
        "n_bits": n_bits,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
    }


def probed_partition_paths(index_dir: str, probe: set[int]) -> list[str]:
    """Partition dirs under the index that match the probe set (explicit
    directory pruning — the unit tests assert nothing else is read)."""
    out = []
    for name in sorted(os.listdir(index_dir)):
        if not name.startswith("bucket="):
            continue
        if int(name.split("=", 1)[1]) in probe:
            part = os.path.join(index_dir, name)
            out.extend(
                os.path.join(part, f)
                for f in sorted(os.listdir(part))
                if f.endswith(".parquet")
            )
    return out


def knn_lsh_indexed(
    index: dict,
    query_ids,
    query_vecs,
    k: int = 5,
    probe_bits: int = 1,
) -> pa.Table:
    """ANN top-k over a persisted :func:`build_lsh_index` layout: probe the
    query buckets (+ Hamming-``probe_bits`` neighbors), read ONLY those
    partition directories, brute-force the survivors.  Recall < 1 by
    design; grows with probe_bits."""
    import ray.data

    lsh = _HyperplaneLSH(index["dim"], index["n_bits"], index.get("seed", 42))
    probe = _probe_set(lsh, np.asarray(query_vecs, dtype=np.float64), index["n_bits"], probe_bits)
    paths = probed_partition_paths(index["dir"], probe)
    if not paths:
        return _merge_topk([], k)
    id_col = index.get("id_col", "vec_id")
    vec_col = index.get("vec_col", "embedding")
    sub = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return knn_bruteforce(sub, query_ids, query_vecs, k, id_col=id_col, vec_col=vec_col)


def knn_lsh(ds, query_ids, query_vecs, dim: int, k: int = 5, n_bits: int = 8) -> pa.Table:
    """In-memory LSH-filtered ANN (no persisted index): scan once, keep
    rows whose bucket is probed (vectorized ``np.isin``), brute-force the
    survivors.  Prefer :func:`build_lsh_index` + :func:`knn_lsh_indexed`
    when the corpus is reused across query sets."""
    lsh = _HyperplaneLSH(dim, n_bits)
    probe = _probe_set(lsh, np.asarray(query_vecs, dtype=np.float64), n_bits, probe_bits=1)
    probe_arr = np.fromiter(probe, dtype=np.int64)

    def filter_buckets(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"])).astype(np.float32)
        buckets = lsh.bucket(vecs).astype(np.int64)
        return batch.filter(pa.array(np.isin(buckets, probe_arr)))

    filtered = ds.select_columns(["vec_id", "embedding"]).map_batches(
        filter_buckets, batch_format="pyarrow"
    )
    return knn_bruteforce(filtered, query_ids, query_vecs, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — k-means coarse quantizer variant


def _kmeans(vecs: np.ndarray, k: int, iters: int = 12, seed: int = 42) -> np.ndarray:
    """Seeded lightweight k-means on (normalized) sample vectors —
    deterministic; runs driver-side on a bounded sample."""
    rng = np.random.default_rng(seed)
    k = min(k, len(vecs))
    centroids = vecs[rng.choice(len(vecs), size=k, replace=False)].copy()
    for _ in range(iters):
        sims = vecs @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    centroids[c] = m / n
    return centroids


def build_ivf_index(
    ds,
    out_dir: str,
    dim: int,
    n_lists: int = 16,
    sample_size: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
):
    """IVF layout: k-means centroids trained on a bounded sample
    (driver-side — centroids are the broadcast small side), corpus
    assigned to its nearest list DISTRIBUTED, written hive-partitioned by
    ``list=<c>``.  Queries probe the ``n_probe`` nearest lists only."""
    import pandas as pd

    sample = ds.limit(sample_size).take_all()
    svecs = _normalize(
        np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    )
    centroids = _kmeans(svecs.astype(np.float32), n_lists, seed=seed)

    try:
        import ray

        cent_ref = ray.put(centroids)
    except Exception:
        cent_ref = None

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cents = centroids
        if cent_ref is not None:
            import ray

            cents = ray.get(cent_ref)
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
        normed = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        lists = (normed @ cents.T).argmax(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                "list": lists,
                id_col: batch[id_col].to_numpy(),
                vec_col: list(np.stack(batch[vec_col].to_numpy())),
            }
        )

    (
        ds.select_columns([id_col, vec_col])
        .map_batches(assign, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["list"])
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    return {
        "dir": out_dir,
        "dim": dim,
        "n_lists": int(len(centroids)),
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
    }


def ivf_probe_paths(index_dir: str, lists: list[int]) -> list[str]:
    sel = set(int(x) for x in lists)
    out = []
    for name in sorted(os.listdir(index_dir)):
        if not name.startswith("list="):
            continue
        if int(name.split("=", 1)[1]) in sel:
            part = os.path.join(index_dir, name)
            out.extend(
                os.path.join(part, f)
                for f in sorted(os.listdir(part))
                if f.endswith(".parquet")
            )
    return out


def knn_ivf_indexed(
    index: dict,
    query_ids,
    query_vecs,
    k: int = 5,
    n_probe: int = 3,
) -> pa.Table:
    """ANN over a :func:`build_ivf_index` layout: each query probes its
    ``n_probe`` nearest centroid lists; only those partition directories
    are read, then exact cosine within the union."""
    import ray.data

    centroids = np.load(os.path.join(index["dir"], "centroids.npy"))
    q = _normalize(np.asarray(query_vecs, dtype=np.float64)).astype(np.float32)
    sims = q @ centroids.T  # nq x n_lists
    n_probe = min(n_probe, sims.shape[1])
    probe: set[int] = set()
    for row in sims:
        probe.update(np.argsort(-row)[:n_probe].tolist())
    paths = ivf_probe_paths(index["dir"], sorted(probe))
    if not paths:
        return _merge_topk([], k)
    id_col = index.get("id_col", "vec_id")
    vec_col = index.get("vec_col", "embedding")
    sub = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return knn_bruteforce(sub, query_ids, query_vecs, k, id_col=id_col, vec_col=vec_col)

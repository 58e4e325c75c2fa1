"""Deduplication operators — exact and near-dup — Ray-Data-first.

All variants follow the scale pattern from the Ray guide: vectorized
signature computation inside ``map_batches``, explode to (bucket, doc)
rows, ``groupby`` the bucket (the only shuffle), verify within buckets,
and resolve winners.  Candidate pairs are collected driver-side only after
bucketing has bounded them (documented assumption: bucket sizes are small
relative to corpus; hot buckets are salted by their own content hash).

Variants:
- :func:`exact_dedup` — hash-partition + per-group first (min doc_id);
- :func:`minhash_dedup` — char-shingle MinHash + LSH banding;
- :func:`simhash_dedup` — 64-bit SimHash, banded into 4×16-bit chunks;
- :func:`ngram_jaccard_pairs` — verified Jaccard for candidate pairs;
- :func:`embedding_dedup` — cosine near-dup via random-hyperplane LSH.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import normalize_text

# deterministic 64-bit mixing (splitmix64) — stable across processes,
# unlike Python's salted hash()
_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _hash_str(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    t = normalize_text(text)
    if len(t) < k:
        return np.array([_hash_str(t)], dtype=np.uint64) if t else np.array([], dtype=np.uint64)
    return np.unique(
        np.array([_hash_str(t[i : i + k]) for i in range(len(t) - k + 1)], dtype=np.uint64)
    )


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = normalize_text(text).split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 42) -> np.ndarray:
    """num_perm minima over seeded splitmix64 rehashes — vectorized."""
    if len(shingles) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    seeds = _splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    # (num_perm, n_shingles) xor-mix then min per row
    mixed = _splitmix64(shingles[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in normalize_text(text).split():
        h = np.uint64(_hash_str(w))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition on normalized-text hash, keep the min id
    per group (deterministic 'first').  Two-phase: the md5 key is computed
    vectorized per batch; the groupby shuffles only (key, row) once."""
    import pandas as pd

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        batch["_dedup_key"] = [
            hashlib.md5(normalize_text(t).encode()).hexdigest()
            for t in batch[text_col]
        ]
        return batch

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_key, batch_format="pandas")
        .groupby("_dedup_key")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["_dedup_key"])
    )


class _MinHashStage:
    """Actor-pool signature stage: explode each doc into (band_key, doc_id)
    rows.  band_key embeds the band index and the band's hash digest."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_keys = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = minhash_signature(
                char_shingles(text, self.shingle_k), self.num_perm
            )
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                digest = int(_splitmix64(np.bitwise_xor.reduce(chunk)[None])[0])
                band_keys.append(f"{b}:{digest:016x}")
                doc_ids.append(doc_id)
        return pa.table(
            {
                "band_key": pa.array(band_keys, pa.string()),
                "doc_id": pa.array(doc_ids),
            }
        )


def _cluster_and_filter(ds, pairs: list[tuple], id_col: str):
    """Union-find over verified duplicate pairs; drop non-representative
    docs.  Pairs are bounded by LSH bucketing (see module doc)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # representative = min id (deterministic)
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    drop = {x for x in parent if find(x) != x}
    if not drop:
        return ds

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pa.array([v not in drop for v in batch[id_col].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow")


def minhash_dedup(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """MinHash+LSH near-dedup: shingle→minhash→band→bucket groupby→verify.

    Returns the dataset with non-representative near-duplicates removed
    (representative = min doc_id per duplicate cluster).  The verify step
    recomputes true shingle Jaccard for bucket-mates (texts fetched via a
    driver-side filtered read of candidate ids — candidates are rare).
    """
    import pandas as pd

    sig = ds.select_columns([id_col, text_col]).map_batches(
        _MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=2,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        # pair every bucket-mate with the smallest member (star pattern
        # keeps hot buckets linear, and union-find restores transitivity)
        return pd.DataFrame({"a": [ids[0]] * (len(ids) - 1), "b": ids[1:]})

    cand = (
        sig.groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    cand_pairs = {tuple(r) for r in cand.itertuples(index=False)}
    if not cand_pairs:
        return ds

    need = {x for p in cand_pairs for x in p}
    texts = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow"
    ):
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if i in need:
                texts[i] = t
    verified = []
    sh_cache: dict = {}

    def sh(i):
        if i not in sh_cache:
            sh_cache[i] = set(char_shingles(texts[i], shingle_k).tolist())
        return sh_cache[i]

    for a, b in cand_pairs:
        if jaccard(sh(a), sh(b)) >= threshold:
            verified.append((a, b))
    return _cluster_and_filter(ds, verified, id_col)


class _SimHashStage:
    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_keys, sigs = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            h = simhash64(text)
            for b in range(4):
                chunk = (h >> (16 * b)) & 0xFFFF
                doc_ids.append(doc_id)
                band_keys.append(f"{b}:{chunk:04x}")
                sigs.append(h)
        return pa.table(
            {
                "band_key": pa.array(band_keys, pa.string()),
                "doc_id": pa.array(doc_ids),
                "sig": pa.array(sigs, pa.uint64()),
            }
        )


def simhash_dedup(ds, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """SimHash near-dedup: identical 16-bit band → candidate; verify by
    Hamming distance on the full 64-bit signature (≤ max_hamming)."""
    import pandas as pd

    sig = ds.select_columns([id_col, text_col]).map_batches(
        _SimHashStage, batch_format="pyarrow", concurrency=2
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(group[["doc_id", "sig"]].itertuples(index=False))
        out_a, out_b = [], []
        a0, s0 = rows[0]
        for did, s in rows[1:]:
            if bin(int(s0) ^ int(s)).count("1") <= max_hamming:
                out_a.append(a0)
                out_b.append(did)
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = (
        sig.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    )
    pairs = {tuple(r) for r in cand.itertuples(index=False)}
    return _cluster_and_filter(ds, list(pairs), id_col)


def ngram_dedup(
    ds,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 32,
):
    """Word-n-gram Jaccard near-dedup: MinHash-LSH candidate generation
    (aggressive banding for recall), verification by TRUE word-n-gram
    Jaccard (the reference-free ngram kernel), union-find clustering."""
    import pandas as pd

    sig = ds.select_columns([id_col, text_col]).map_batches(
        _MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": 4,
        },
        batch_format="pyarrow",
        concurrency=2,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        return pd.DataFrame({"a": [ids[0]] * (len(ids) - 1), "b": ids[1:]})

    cand = (
        sig.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    )
    cand_pairs = {tuple(r) for r in cand.itertuples(index=False)}
    if not cand_pairs:
        return ds
    need = {x for p in cand_pairs for x in p}
    texts = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow"
    ):
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if i in need:
                texts[i] = t
    verified = ngram_jaccard_pairs(texts, list(cand_pairs), n=n, threshold=threshold)
    return _cluster_and_filter(ds, verified, id_col)


def ngram_jaccard_pairs(texts: dict, pairs: list[tuple], n: int = 3, threshold: float = 0.8):
    """Verified word-n-gram Jaccard for candidate pairs (the verify kernel
    shared by the near-dup paths)."""
    out = []
    cache: dict = {}

    def grams(i):
        if i not in cache:
            cache[i] = word_ngrams(texts[i], n)
        return cache[i]

    for a, b in pairs:
        if jaccard(grams(a), grams(b)) >= threshold:
            out.append((a, b))
    return out


class _HyperplaneLSH:
    """Sign-LSH bucket stage for embedding near-dup / ANN."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits)).astype(np.float32)

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)


def embedding_dedup(
    ds,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Embedding-cosine near-dup: normalize → hyperplane-LSH bucket →
    verify cosine within buckets → drop non-representatives."""
    import pandas as pd

    lsh = _HyperplaneLSH(dim, n_bits)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norms, 1e-12)
        return pd.DataFrame(
            {
                "bucket": lsh.bucket(vecs),
                id_col: batch[id_col].to_numpy(),
                "vec": list(vecs),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].tolist()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        vecs = np.stack(g["vec"].to_numpy())
        sims = vecs @ vecs[0]
        keep = [i for i in range(1, len(ids)) if sims[i] >= threshold]
        return pd.DataFrame({"a": [ids[0]] * len(keep), "b": [ids[i] for i in keep]})

    cand = (
        ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    pairs = {tuple(r) for r in cand.itertuples(index=False)}
    return _cluster_and_filter(ds, list(pairs), id_col)

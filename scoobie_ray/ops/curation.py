"""Corpus-curation operators for large-scale training-data pipelines.

Beyond-reference (✚) operators a 100-TB pretraining pipeline needs on
top of dedup/ANN/text-stats (`ops/dedup.py`, `ops/similarity.py`,
`ops/text.py`):

- **benchmark decontamination** — flag corpus documents sharing any
  n-token gram with a (small) benchmark/eval set.  The benchmark side is
  collected to a driver set and broadcast once via ``ray.put`` (an eval
  suite is KBs-to-MBs while the corpus is the 100-TB side); the corpus
  side is one streaming ``map_batches`` pass, no shuffle.
- **deterministic stratified sampling** — keep a per-stratum percentage
  of rows chosen by a content-independent stable hash
  (``md5(key)[:8]`` little-endian, the DuckDB ``md5_number_upper``
  function), so re-runs, retries and the SQL oracle all pick the exact
  same rows.  Pure per-batch filter, no shuffle, no RNG state.
- **sequence packing** — assign every document a (seq_id, seq_off) slot
  in fixed-token-budget training sequences, in ``doc_id`` order, via a
  distributed prefix sum: one pass tokenizes and immediately drops the
  text (3 int columns survive), partition totals (P rows) come to the
  driver for the exclusive prefix, and a P-group vectorized
  ``map_groups`` finishes.  Never materializes the corpus.
- **n-gram repetition statistics** — Gopher-style within-document
  repetition signals (duplicate-token and duplicate-2-gram counts, top
  2-gram frequency) as integers, one streaming pass.

All four have DuckDB oracles (``oracle.py``: decontaminate /
sample_stratified / pack_sequences / repetition_stats) with
integer-exact outputs.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _tokens(t: str | None) -> list[str]:
    # == DuckDB string_split_regex(trim(text), '\s+') on non-empty text
    return (t or "").split()


def benchmark_ngram_set(bench_ds, n: int = 8, text_col: str = "text") -> frozenset[str]:
    """Collect the distinct n-token grams of a benchmark dataset to the
    driver.  The benchmark is the SMALL side by construction (an eval
    suite, not the corpus); per-batch distinct grams stream back and are
    set-unioned driver-side — bounded by the benchmark's size, never the
    corpus's."""

    def grams_batch(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch[text_col].to_pylist():
            toks = _tokens(t)
            out.update(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    grams: set[str] = set()
    for b in bench_ds.map_batches(grams_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        grams.update(b["gram"].to_pylist())
    return frozenset(grams)


class Decontaminator:
    """Per-doc contamination counts against a broadcast benchmark gram
    set.  Pass the ``ray.put`` ref of ``benchmark_ngram_set``'s result so
    actors fetch the set once in ``__init__`` (zero-copy from the object
    store), not per batch.

    At adversarial scale swap the string set for a set of 64-bit gram
    hashes (both sides hashed identically — equality is preserved up to
    collisions); the fixture-scale oracle compares exact strings.
    """

    def __init__(self, bench_ref, n: int = 8, text_col: str = "text"):
        import ray

        self.bench = (
            bench_ref
            if isinstance(bench_ref, (set, frozenset))
            else ray.get(bench_ref)
        )
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        bench = self.bench
        n_grams, n_hits = [], []
        for t in batch[self.text_col].to_pylist():
            toks = _tokens(t)
            m = max(0, len(toks) - n + 1)
            h = 0
            for i in range(m):
                if " ".join(toks[i : i + n]) in bench:
                    h += 1
            n_grams.append(m)
            n_hits.append(h)
        hits = pa.array(n_hits, pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_hits": hits,
                "contaminated": pa.array([h > 0 for h in n_hits], pa.bool_()),
            }
        )


def decontaminate(corpus_ds, bench_ds, n: int = 8, concurrency=None):
    """Flag corpus docs sharing any n-token gram with the benchmark set.

    Returns (doc_id, n_grams, n_hits, contaminated) for every corpus doc.
    """
    import ray

    from scoobie_ray.util import autoscale_concurrency

    bench_ref = ray.put(benchmark_ngram_set(bench_ds, n=n))
    if concurrency is None:
        concurrency = autoscale_concurrency()
    return corpus_ds.map_batches(
        Decontaminator,
        fn_constructor_args=(bench_ref, n),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def stable_bucket_u64(key: str) -> int:
    """== DuckDB md5_number_upper(key): first 8 md5 bytes, little-endian."""
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "little")


def sample_stratified(
    ds,
    rates_pct: dict[str, int],
    default_pct: int = 10,
    key_col: str = "doc_id",
    stratum_col: str = "lang",
):
    """Keep ``rates_pct[stratum]`` percent of each stratum, selected by a
    stable content hash of the key — deterministic across re-runs,
    retries, partitionings and the SQL oracle (``md5_number_upper``).
    One streaming filter pass; emits the hash bucket as evidence."""

    def fn(batch: pa.Table) -> pa.Table:
        bucket = np.fromiter(
            (stable_bucket_u64(str(k)) % 100 for k in batch[key_col].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        rate = np.fromiter(
            (rates_pct.get(s, default_pct) for s in batch[stratum_col].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        out = batch.append_column("bucket", pa.array(bucket, pa.int64()))
        return out.filter(pa.array(bucket < rate))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix sum)
# ---------------------------------------------------------------------------


def pack_sequences(
    ds,
    budget: int = 256,
    num_partitions: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Assign each doc its slot in fixed-token-budget training sequences:
    docs in ``id_col`` order, ``seq_id = excl_prefix // budget``,
    ``seq_off = excl_prefix % budget`` where excl_prefix is the sum of
    token counts of all earlier docs (a doc may straddle sequences —
    standard causal-LM packing).

    Distributed prefix-sum shape: pass 1 tokenizes and keeps only
    (id, n_tokens, _part = id // span) — the text never travels further.
    Partition token totals (P rows) come to the driver for the exclusive
    prefix; pass 2 is a P-group vectorized ``map_groups`` (per-partition
    sort + cumsum + broadcast offset).  Assumes ``id_col`` is integer
    (``_part`` ranges stay ordered); ids need not be dense.
    """
    mx = ds.max(id_col)
    span = max(1, int(mx) // num_partitions + 1)

    def count_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        ntok = np.fromiter(
            (len(_tokens(t)) for t in batch[text_col].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "_part": pa.array(ids // span, pa.int64()),
            }
        )

    # combiner-first partition totals: per-batch partial sums, tiny groupby
    def partial_totals(batch: pa.Table) -> pa.Table:
        parts = batch["_part"].to_numpy(zero_copy_only=False)
        sums = batch["n_tokens"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(parts, return_inverse=True)
        tot = np.bincount(inv, weights=sums).astype(np.int64)
        return pa.table(
            {"_part": pa.array(uniq, pa.int64()), "tot": pa.array(tot, pa.int64())}
        )

    counts = ds.map_batches(count_batch, batch_format="pyarrow").materialize()
    totals_tbl = pa.concat_tables(
        list(
            counts.map_batches(partial_totals, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    parts = totals_tbl["_part"].to_numpy(zero_copy_only=False)
    tots = totals_tbl["tot"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(parts, return_inverse=True)
    per_part = np.bincount(inv, weights=tots).astype(np.int64)
    excl = np.concatenate(([0], np.cumsum(per_part)[:-1]))
    offsets = {int(p): int(o) for p, o in zip(uniq, excl)}

    def finish(group):
        import pandas as pd

        g = group.sort_values(id_col, kind="mergesort")
        n = g["n_tokens"].to_numpy()
        excl_prefix = offsets[int(g["_part"].iloc[0])] + np.cumsum(n) - n
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": n,
                "seq_id": excl_prefix // budget,
                "seq_off": excl_prefix % budget,
            }
        )

    return counts.groupby("_part").map_groups(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram repetition statistics (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Within-document repetition counters, all integer-exact:
    n_tokens / n_distinct_tokens (duplicate-token fraction numerators),
    n_2grams / n_distinct_2grams, and top_2gram_count (occurrences of the
    most frequent 2-gram — the Gopher top-n-gram-fraction numerator)."""
    n_tok, n_dtok, n_2g, n_d2g, top2 = [], [], [], [], []
    for t in batch["text"].to_pylist():
        toks = _tokens(t)
        n_tok.append(len(toks))
        n_dtok.append(len(set(toks)))
        if len(toks) >= 2:
            gc = Counter(zip(toks, toks[1:]))
            n_2g.append(len(toks) - 1)
            n_d2g.append(len(gc))
            top2.append(max(gc.values()))
        else:
            n_2g.append(0)
            n_d2g.append(0)
            top2.append(0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct_tokens": pa.array(n_dtok, pa.int64()),
            "n_2grams": pa.array(n_2g, pa.int64()),
            "n_distinct_2grams": pa.array(n_d2g, pa.int64()),
            "top_2gram_count": pa.array(top2, pa.int64()),
        }
    )


def repetition_stats(ds, concurrency=None):
    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow", **kwargs)

"""Training-data curation — the composed flagship of the ops layer.

One streaming pipeline chaining the operations a 100-TB pre-training
corpus pass actually runs:

1. **quality filter** — token count and punctuation bounds
   (``ops.text.quality_flags_batch`` rules), computed and applied inside
   a single vectorized ``map_batches`` so rejected rows never leave the
   batch;
2. **language filter** — stopword-profile LangId (slot-0 semantics),
   fused into the same stage;
3. **exact dedup** — hash-partitioned min-id winners
   (``ops.dedup.exact_dedup``);
4. **near dedup** — MinHash+LSH with distributed verification and
   (past ``broadcast_resolve_limit``) distributed connected components
   (``ops.dedup.minhash_dedup``).

Every stage streams: nothing materializes between steps except the tiny
candidate-pair tables inside minhash.  The ``curate`` driver query is
oracle-gated end to end (oracle.py ORACLES["curate"]: quality ∩ langid ∩
all-pairs-Jaccard components over the surviving subset — exact-dup
removal before near-dedup provably does not change components, since
identical texts share every neighbor).
"""

from __future__ import annotations

import pyarrow as pa


def curate(
    ds,
    lang: str = "en",
    min_tokens: int = 30,
    minhash_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_resolve_limit: int = 2_000_000,
):
    """documents Dataset -> curated Dataset (same columns, surviving rows:
    quality-passing, ``lang``-classified, exact- and near-dedup winners)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..ops.dedup import exact_dedup, minhash_dedup
    from ..ops.text import LangId
    from ..util import compact_strings

    langid = LangId()

    def keep(batch: pa.Table) -> pa.Table:
        # vectorized quality counting (r4, replacing a per-doc Python regex
        # loop): Arrow regex-count kernels over the COMPACTED column (utf8
        # kernels misbehave on raw object-store buffers — util.compact_strings)
        col = pc.fill_null(compact_strings(batch[text_col]), "")
        nt = pc.count_substring_regex(col, r"\S+").to_numpy(zero_copy_only=False)
        punct = pc.count_substring_regex(col, r"[.!?,;:]").to_numpy(
            zero_copy_only=False
        )
        mask = (nt >= min_tokens) & (punct * 2 <= np.maximum(nt, 1))
        batch = batch.filter(pa.array(mask))
        if batch.num_rows == 0:
            return batch
        batch = langid(batch)
        keep_lang = pc.equal(batch["lang_pred"], lang)
        return batch.filter(keep_lang).drop_columns(["lang_pred"])

    filtered = ds.map_batches(keep, batch_format="pyarrow")
    # PIN the exact-dedup output: minhash consumes its input three times
    # (signature, verify and final-filter passes), and an un-materialized
    # lineage would re-run read→filter→exact-sort for each (measured 3×
    # execution in ds.stats(), ~2 s of the composed wall at sf0.1).  The
    # exact-dedup sort is an all-to-all barrier whose blocks already sit
    # in the object store, so materializing here adds no peak memory —
    # it just keeps the result instead of recomputing it; at 100 TB the
    # object store spills these blocks to disk, still far cheaper than
    # two extra full filter+shuffle passes.
    survivors = exact_dedup(filtered, text_col=text_col, id_col=id_col).materialize()
    return minhash_dedup(
        survivors,
        threshold=minhash_threshold,
        text_col=text_col,
        id_col=id_col,
        broadcast_resolve_limit=broadcast_resolve_limit,
    )

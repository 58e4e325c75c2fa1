"""Property oracle for the substring-rewrite kernel: on random small
corpora, the vectorized tokenize → window-hash → coverage → rebuild chain
(`_flat_token_codes` / `_window_gram_hashes` / `_window_positions` /
`_drop_covered_tokens` — the batch body of ``dedup_substrings``'
broadcast regime) must equal an independent pure-Python reference that
re-derives duplicated grams by STRING equality and coverage by explicit
interval scanning.  No Ray session needed — this pins the numpy indexing
math itself."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from scoobie_ray.ops.curation import (
    _drop_covered_tokens,
    _flat_token_codes,
    _window_gram_hashes,
    _window_positions,
)

# tiny alphabet + short docs => plenty of genuine cross-doc window overlap
_doc_st = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
).map(" ".join)
_corpus_st = st.lists(_doc_st, min_size=1, max_size=8)


def _reference_rewrite(texts: list[str], n: int):
    """Pure-Python re-derivation: dup grams by string equality over
    distinct (gram, doc), coverage by explicit per-window scans."""
    toks = [t.split() for t in texts]
    df: dict[tuple, set] = {}
    for d, ws in enumerate(toks):
        for i in range(len(ws) - n + 1):
            df.setdefault(tuple(ws[i : i + n]), set()).add(d)
    dup = {g for g, docs in df.items() if len(docs) >= 2}
    out_texts, out_dropped = [], []
    for ws in toks:
        covered = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if tuple(ws[i : i + n]) in dup:
                for j in range(i, i + n):
                    covered[j] = True
        out_texts.append(" ".join(w for w, c in zip(ws, covered) if not c))
        out_dropped.append(sum(covered))
    return out_texts, out_dropped


def _engine_rewrite(texts: list[str], n: int):
    """The broadcast-regime batch body, driven directly on one batch."""
    col = pa.array(texts, pa.string())
    codes, doc_idx, counts, uniq = _flat_token_codes(col)
    from scoobie_ray.ops.curation import _unique_token_hashes

    flat_h = _unique_token_hashes(uniq)[codes]
    g, _gram_doc, _m = _window_gram_hashes(flat_h, counts, n)
    _, pos, _ = _window_positions(counts, n)
    # dup set from the same per-doc-distinct (gram, doc) pair counting
    # the operator's pass 1 performs
    gram_doc = np.repeat(
        np.arange(len(counts), dtype=np.int64),
        np.maximum(np.asarray(counts, np.int64) - (n - 1), 0),
    )
    if len(g):
        order = np.lexsort((gram_doc, g))
        gs, ds_ = g[order], gram_doc[order]
        first_pair = np.concatenate(
            ([True], (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1]))
        )
        pg = gs[first_pair]
        new_g = np.concatenate(([True], pg[1:] != pg[:-1]))
        starts = np.flatnonzero(new_g)
        dfc = np.diff(np.append(starts, len(pg)))
        dup_h = np.sort(pg[starts[dfc >= 2]].view(np.int64))
    else:
        dup_h = np.zeros(0, np.int64)
    if len(g) and len(dup_h):
        p = np.searchsorted(dup_h, g.view(np.int64))
        hit = dup_h[np.minimum(p, len(dup_h) - 1)] == g.view(np.int64)
        hit_pos = pos[hit]
    else:
        hit_pos = np.zeros(0, dtype=np.int64)
    flat_tokens = (
        uniq.take(pa.array(codes)) if len(codes) else pa.array([], pa.string())
    )
    texts_out, n_dropped = _drop_covered_tokens(
        flat_tokens, doc_idx, len(texts), hit_pos, n
    )
    return texts_out.to_pylist(), n_dropped.tolist()


@settings(max_examples=150, deadline=None)
@given(_corpus_st, st.integers(min_value=1, max_value=4))
def test_rewrite_kernel_matches_python_reference(texts, n):
    want_texts, want_dropped = _reference_rewrite(texts, n)
    got_texts, got_dropped = _engine_rewrite(texts, n)
    assert got_texts == want_texts, (texts, n, got_texts, want_texts)
    assert got_dropped == want_dropped, (texts, n, got_dropped, want_dropped)

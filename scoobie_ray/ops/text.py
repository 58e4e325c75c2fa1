"""Text-analysis operators for large-scale training-data pipelines.

All stateless or setup-once stages over the ``documents`` table
(doc_id, text, ...): token counting, quality scoring, language ID,
document fingerprinting.  Everything is a vectorized ``map_batches`` UDF
(pandas string kernels / compiled regexes); stages that hold compiled
state are callable classes usable as actor pools.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/punct split (GPT-2-style coarse approximation)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_PUNCT_RE = re.compile(r"[.!?,;:]")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "on", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "es"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "ein"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "est", "que"},
}


class TextStats:
    """Per-doc counting stats: n_chars, n_tokens (whitespace), n_bpe
    (BPE-ish regex pieces), n_punct, plus quality ratios.

    The integer columns are intentionally SQL-reproducible (the DuckDB
    oracle recomputes them with string functions); the float quality score
    is engine-side only.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized (r4): Arrow regex-count kernels over the compacted
        # column (utf8 kernels misbehave on raw object-store buffers —
        # see util.compact_strings)
        from ..util import compact_strings

        col = pc.fill_null(compact_strings(batch["text"]), "")
        total = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        nt = pc.count_substring_regex(col, r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = pc.count_substring_regex(col, _BPE_RE.pattern).to_numpy(zero_copy_only=False).astype(np.int64)
        punct = pc.count_substring_regex(col, _PUNCT_RE.pattern).to_numpy(zero_copy_only=False).astype(np.int64)
        # quality heuristics: average token length in sane range,
        # punctuation not dominating, text not tiny
        avg_len = np.where(nt > 0, (total - n_ws) / np.maximum(nt, 1), 0.0)
        q = np.ones(len(nt))
        q[(avg_len < 2.0) | (avg_len > 12.0)] *= 0.5
        q[nt < 5] *= 0.5
        q[punct > np.maximum(nt, 1) * 0.5] *= 0.5
        return (
            batch.append_column("n_chars", pa.array(total, pa.int64()))
            .append_column("n_tokens", pa.array(nt, pa.int64()))
            .append_column("n_bpe", pa.array(nb, pa.int64()))
            .append_column("n_punct", pa.array(punct, pa.int64()))
            .append_column("quality", pa.array(q, pa.float64()))
        )


def quality_flags_batch(batch: pa.Table) -> pa.Table:
    """Integer/boolean quality heuristics, exactly reproducible in SQL
    (the float ``quality`` score in TextStats is the fused engine-side
    variant): n_nonspace, n_tokens, avg token length in centichars
    (integer math), and the pass/fail flags the score is built from."""
    # vectorized (r4): Arrow regex-count kernels over the compacted column
    # (utf8 kernels misbehave on raw object-store buffers — see
    # util.compact_strings); n_nonspace = total chars − whitespace chars
    import numpy as np
    import pyarrow.compute as pc

    from ..util import compact_strings

    col = pc.fill_null(compact_strings(batch["text"]), "")
    nt = pc.count_substring_regex(col, r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
    n_ws = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False).astype(np.int64)
    total = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    punct = pc.count_substring_regex(col, r"[.!?,;:]").to_numpy(zero_copy_only=False).astype(np.int64)
    ns = total - n_ws
    avg_c = np.where(nt > 0, ns * 100 // np.maximum(nt, 1), 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_nonspace": pa.array(ns, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "avg_token_centichars": pa.array(avg_c, pa.int64()),
            "len_ok": pa.array(nt >= 5),
            "punct_ok": pa.array(punct * 2 <= np.maximum(nt, 1)),
        }
    )


class LangId:
    """Stopword-profile language identification (the reference's slot 0 is
    an n-gram classifier, LanguageIdentification.java:43-86; a stopword
    vote is the dependency-free equivalent at corpus scale).  Ties or
    no-hit default to 'en' like the reference defaults to EN."""

    #: chars a "word" may contain — everything else is a separator
    WORD_CHARS = r"a-zäöüéèáíóú"

    def __init__(self, langs: tuple[str, ...] = ("en", "es", "de", "fr")):
        self.langs = langs
        self.profiles = {l: STOPWORDS[l] for l in langs}
        # r5: vectorized __call__ (replacing a per-row Python loop on the
        # curate hot path — VERDICT r4 item 3): ONE index_in against the
        # UNION stopword dictionary + a (word, lang) membership-matrix
        # scatter (a word can belong to several languages, e.g. es/fr
        # 'la'), built once per actor
        union = sorted(set().union(*(STOPWORDS[l] for l in langs)))
        self._union = pa.array(union, pa.string())
        self._member = np.zeros((len(union), len(langs)), dtype=np.int64)
        pos = {w: i for i, w in enumerate(union)}
        for j, l in enumerate(langs):
            for w in STOPWORDS[l]:
                self._member[pos[w], j] = 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import compact_strings

        n_rows = batch.num_rows
        col = pc.utf8_lower(pc.fill_null(compact_strings(batch["text"]), ""))
        # findall(r"[word]+") == split on the complement: collapse every
        # non-word char run to a space, then whitespace-split (both RE2)
        col = pc.replace_substring_regex(
            col, pattern=f"[^{self.WORD_CHARS}]+", replacement=" "
        )
        lists = pc.utf8_split_whitespace(col)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        rows = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        toks = pc.list_flatten(lists)
        # one dictionary lookup for ALL languages ('' never matches, so no
        # empty-token filter needed), then scatter-add each matched word's
        # per-language membership row into the doc's vote vector
        idx = pc.fill_null(pc.index_in(toks, value_set=self._union), -1)
        idxv = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        valid = idxv >= 0
        votes = np.zeros((n_rows, len(self.langs)), dtype=np.int64)
        np.add.at(votes, rows[valid], self._member[idxv[valid]])
        # first max wins == the loop's strict-> update order (langs order)
        preds = np.asarray(self.langs, dtype=object)[np.argmax(votes, axis=1)]
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string())
        )


def normalize_text(t: str) -> str:
    return _WS_RE.sub(" ", (t or "").lower()).strip()


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint = md5 of whitespace-collapsed lowercased text
    (SQL-reproducible: md5(trim(lower(regexp_replace(text,'\\s+',' ','g'))))).
    """
    fps = [
        hashlib.md5(normalize_text(t).encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def rolling_hashes(text: str, window: int = 16, base: int = 257, mod: int = (1 << 61) - 1) -> list[int]:
    """Rabin-Karp rolling hashes over a char window — the primitive for
    content-defined chunking / winnowing fingerprints."""
    t = normalize_text(text)
    if len(t) < window:
        return [polyhash(t, base, mod)] if t else []
    out = []
    h = 0
    pw = pow(base, window - 1, mod)
    for i, ch in enumerate(t):
        h = (h * base + ord(ch)) % mod
        if i >= window - 1:
            out.append(h)
            h = (h - ord(t[i - window + 1]) * pw) % mod
    return out


def polyhash(s: str, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def winnow_fingerprint(text: str, window: int = 16, k: int = 8) -> list[int]:
    """k smallest rolling hashes (winnowing sketch) — a compact doc signature."""
    hs = rolling_hashes(text, window)
    return sorted(set(hs))[:k]


# ---------------------------------------------------------------------------
# PII-style redaction
# ---------------------------------------------------------------------------

REDACT_RULES = (
    ("MAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("DATE", r"\d{4}-\d{2}-\d{2}", "<DATE>"),
)


def redact(ds, rules=REDACT_RULES, text_col: str = "text", out_col: str = "redacted"):
    """PII-style text redaction: apply the ordered ``(name, pattern,
    replacement)`` rules globally per row with Arrow's RE2
    ``replace_substring_regex`` — the same regex engine DuckDB uses, so
    the oracle's chained ``regexp_replace(..., 'g')`` is bit-identical
    (no Python-re vs RE2 semantic gap to paper over).  One vectorized
    kernel per rule, column compacted first (utf8 kernels misbehave on
    raw object-store buffers — util.compact_strings)."""
    from ..util import compact_strings

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(compact_strings(batch[text_col]), "")
        for _name, pat, repl in rules:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
        return batch.append_column(out_col, col)

    return ds.map_batches(fn, batch_format="pyarrow")

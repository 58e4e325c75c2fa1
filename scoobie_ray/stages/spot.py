r"""Dictionary mention detection — the entityRecognizer slot (slot 6).

Reimplements the semantics of RDFLiteralSpotting.java:58-136: find every
occurrence of a KB literal in the document text, then apply
``filterLongestMatches`` (:186-214 — drop spans strictly nested in another
matched span) and ``filterCaseMatches`` (:216-246 — when a span has an
exact-case literal among its case-insensitive matches, drop the
case-mismatched ones).

The reference implements matching as a suffix-array vs SQL sort-merge join
(SuffixArray.compare:261-359) whose prefix-hash/collation machinery exists
only because the dictionary lives in Postgres.  Ray-native design: the
literal dictionary is broadcast once (``ray.put``), and each actor compiles
a single alternation regex with a zero-width lookahead capture —
``(?<!\w)(?=(lit1|lit2|...))`` with alternatives sorted longest-first — so
scanning is one C-speed pass per document, yields *overlapping* matches
(the lookahead consumes nothing), and at each position captures the longest
alternative.  Word-boundary rule: the char before the match start and after
the match end must not be ``[A-Za-z0-9_]`` (the reference aligns matches to
ICU token boundaries, RDFLiteralSpotting.java:114-131).

Output: per-doc parallel list columns ``mention_start``, ``mention_end``
(char spans into plain_text) and ``mention_literal`` (KB literal index;
one entry per (span, literal) pair).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

from ..kb.bundle import KBBundle, KBIndex

_WORD_CHAR = re.compile(r"[A-Za-z0-9_]")


@dataclass
class SpotConfig:
    case_sensitive: bool = True
    max_literals_per_span: int = 8  # cap pathological case-variant fan-out


def resolve_kb(kb) -> KBIndex:
    """Accept a KBIndex, KBBundle, dict-of-tables, or a Ray ObjectRef of
    any of those (the broadcast pattern: ``ray.put`` once on the driver,
    ``ray.get`` here in actor ``__init__`` — zero-copy per node)."""
    try:
        import ray

        if isinstance(kb, ray.ObjectRef):
            kb = ray.get(kb)
    except ImportError:
        pass
    if isinstance(kb, KBIndex):
        return kb
    if isinstance(kb, dict):
        kb = KBBundle.from_tables(kb)
    return KBIndex(kb)


def _trie_regex(words: set[str]) -> str:
    """Factor a word set into a trie-shaped regex.

    Shared prefixes become shared automaton states, so matching cost is
    O(text_len × trie_depth) instead of O(text_len × n_words) — the regex
    engine walks the trie like an Aho-Corasick automaton anchored at each
    position.  Terminal states are emitted as greedy-optional suffixes
    (``(?:...)?``), so the match at any start position is the LONGEST
    dictionary word — exactly the ordering filterLongestMatches needs.
    """
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}

    def emit(node: dict) -> str:
        terminal = "" in node
        children = sorted(k for k in node if k != "")
        if not children:
            return ""
        alts = [re.escape(ch) + emit(node[ch]) for ch in children]
        body = alts[0] if len(alts) == 1 else "(?:%s)" % "|".join(alts)
        if terminal:
            # greedy optional: try the longer continuation first
            if len(alts) == 1 and len(body) == len(re.escape(children[0])):
                return body + "?"
            return "(?:%s)?" % body
        return body

    return emit(trie)


class Matcher:
    """The per-actor literal automaton (reference: prefix-hash + SQL
    sort-merge over a suffix array, SuffixArray.compare:261-359; ours: a
    trie-factored regex with a zero-width lookahead capture, built once per
    actor from the broadcast literal dictionary)."""

    def __init__(
        self,
        literals: list[str],
        config: SpotConfig | None = None,
        indices: list[int] | None = None,
    ):
        self.config = config or SpotConfig()
        # map surface form -> candidate literal indexes
        self.exact: dict[str, int] = {}
        self.by_lower: dict[str, list[int]] = {}
        alts: set[str] = set()
        items = (
            zip(indices, literals) if indices is not None else enumerate(literals)
        )
        for idx, lit in items:
            if not lit:
                continue
            self.exact[lit] = idx
            self.by_lower.setdefault(lit.lower(), []).append(idx)
            alts.add(lit if self.config.case_sensitive else lit.lower())
        if alts:
            # trailing boundary INSIDE the lookahead: if the longest trie
            # branch ends mid-word the engine backtracks the greedy
            # optionals and accepts a shorter literal at the same start
            # (post-hoc end checks would wrongly discard it)
            pattern = "(?<![A-Za-z0-9_])(?=(%s)(?![A-Za-z0-9_]))" % _trie_regex(alts)
            flags = 0 if self.config.case_sensitive else re.IGNORECASE
            self.rx: re.Pattern | None = re.compile(pattern, flags)
        else:
            self.rx = None

    def find(self, text: str) -> list[tuple[int, int, int]]:
        """All surviving (start, end, literal_idx) mentions in ``text``."""
        if self.rx is None or not text:
            return []
        raw: list[tuple[int, int, str]] = []
        for m in self.rx.finditer(text):
            raw.append((m.start(1), m.end(1), m.group(1)))
        if not raw:
            return []
        # filterLongestMatches (:186-214): sort (start asc, end desc), drop
        # spans with end <= max end seen so far (strictly contained in an
        # earlier-sorted span).
        raw.sort(key=lambda t: (t[0], -t[1]))
        kept: list[tuple[int, int, str]] = []
        max_end = -1
        for s, e, surf in raw:
            if e <= max_end:
                continue
            kept.append((s, e, surf))
            max_end = e
        out: list[tuple[int, int, int]] = []
        for s, e, surf in kept:
            if self.config.case_sensitive:
                idx = self.exact.get(surf)
                if idx is not None:
                    out.append((s, e, idx))
            else:
                # filterCaseMatches (:216-246): prefer the exact-case literal
                # when one exists for this surface form.
                if surf in self.exact:
                    out.append((s, e, self.exact[surf]))
                else:
                    for idx in self.by_lower.get(surf.lower(), [])[
                        : self.config.max_literals_per_span
                    ]:
                        out.append((s, e, idx))
        return out


class Spotter:
    """Actor-pool map_batches stage: ``docs.map_batches(Spotter,
    fn_constructor_kwargs={"kb": kb_ref}, concurrency=N,
    batch_format="pyarrow")``.  The automaton is built once per actor."""

    def __init__(self, kb, config: SpotConfig | None = None, template=None):
        self.kb = resolve_kb(kb)
        subset = None
        if template is not None:
            resolved = template.resolve(self.kb) if hasattr(template, "resolve") else template
            subset = resolved.literal_subset()
        if subset is None:
            self.matcher = Matcher(self.kb.literal_strings, config)
        else:
            self.matcher = Matcher(
                [self.kb.literal_strings[i] for i in subset], config, indices=subset
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.docs import add_plain_text

        if "plain_text" not in batch.column_names:
            batch = add_plain_text(batch)
        starts, ends, lits = [], [], []
        for text in batch["plain_text"].to_pylist():
            ms = self.matcher.find(text)
            starts.append([m[0] for m in ms])
            ends.append([m[1] for m in ms])
            lits.append([m[2] for m in ms])
        return (
            batch.append_column("mention_start", pa.array(starts, pa.list_(pa.int64())))
            .append_column("mention_end", pa.array(ends, pa.list_(pa.int64())))
            .append_column("mention_literal", pa.array(lits, pa.list_(pa.int64())))
        )

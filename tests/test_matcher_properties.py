"""Property-based tests for the literal automaton — the matcher must agree
with a brute-force oracle implementing the documented semantics on every
input (the reference has no property tests; SURVEY.md §5.6)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from scoobie_ray.stages.spot import Matcher, SpotConfig

_WORD = re.compile(r"[A-Za-z0-9_]")


def brute_force(literals: list[str], text: str) -> list[tuple[int, int, int]]:
    """Reference semantics, implemented naively: every boundary-aligned
    occurrence of every literal; drop spans strictly contained in another
    matched span; at equal spans keep each matching literal."""
    raw = []
    for idx, lit in enumerate(literals):
        if not lit:
            continue
        start = 0
        while True:
            i = text.find(lit, start)
            if i < 0:
                break
            j = i + len(lit)
            ok_l = i == 0 or not _WORD.match(text[i - 1])
            ok_r = j == len(text) or not _WORD.match(text[j])
            if ok_l and ok_r:
                raw.append((i, j, idx))
            start = i + 1
    spans = sorted({(s, e) for s, e, _ in raw}, key=lambda t: (t[0], -t[1]))
    kept_spans = []
    max_end = -1
    for s, e in spans:
        if e <= max_end:
            continue
        kept_spans.append((s, e))
        max_end = e
    kept = set(kept_spans)
    out = [(s, e, i) for s, e, i in raw if (s, e) in kept]
    return sorted(out)


# alphabet engineered for collisions: shared prefixes, substrings, joins
_lit_st = (
    st.text(alphabet="ab_ .()?*+|[", min_size=1, max_size=6)
    .map(str.strip)
    .filter(bool)
)
_text_st = st.text(alphabet="ab_ .,x()?*+|[", min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(st.lists(_lit_st, min_size=1, max_size=8, unique=True), _text_st)
def test_matcher_matches_brute_force(literals, text):
    m = Matcher(literals, SpotConfig(case_sensitive=True))
    assert sorted(m.find(text)) == brute_force(literals, text)


@settings(max_examples=150, deadline=None)
@given(st.lists(_lit_st, min_size=1, max_size=6, unique=True), _text_st)
def test_matcher_spans_never_nested(literals, text):
    spans = {(s, e) for s, e, _ in Matcher(literals).find(text)}
    for a in spans:
        for b in spans:
            if a != b:
                assert not (b[0] <= a[0] and a[1] <= b[1] and (b[0] < a[0] or a[1] < b[1]))


def brute_force_ci(literals: list[str], text: str) -> list[tuple[int, int, int]]:
    """Case-insensitive oracle with the case-preference filter: at a kept
    span, if some literal matches the surface exactly, only exact-case
    literals are reported; otherwise every case-variant literal."""
    raw = []  # (start, end, surface)
    lower_text = text.lower()
    surfaces = {}
    for lit in {l.lower() for l in literals if l}:
        start = 0
        while True:
            i = lower_text.find(lit, start)
            if i < 0:
                break
            j = i + len(lit)
            ok_l = i == 0 or not _WORD.match(text[i - 1])
            ok_r = j == len(text) or not _WORD.match(text[j])
            if ok_l and ok_r:
                raw.append((i, j))
            start = i + 1
    spans = sorted(set(raw), key=lambda t: (t[0], -t[1]))
    kept, max_end = [], -1
    for s, e in spans:
        if e <= max_end:
            continue
        kept.append((s, e))
        max_end = e
    out = []
    for s, e in kept:
        surf = text[s:e]
        exact = [i for i, l in enumerate(literals) if l == surf]
        if exact:
            out.extend((s, e, i) for i in exact[:1])  # unique exact literal
        else:
            out.extend(
                (s, e, i)
                for i, l in enumerate(literals)
                if l and l.lower() == surf.lower()
            )
    return sorted(out)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="aAbB_ ", min_size=1, max_size=5).map(str.strip).filter(bool),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    st.text(alphabet="aAbB_ .", min_size=0, max_size=30),
)
def test_matcher_case_insensitive_matches_oracle(literals, text):
    m = Matcher(literals, SpotConfig(case_sensitive=False))
    got = sorted(m.find(text))
    # longest-at-start semantics may differ when case variants have
    # different lengths at the same start; restrict comparison to spans
    expect = brute_force_ci(literals, text)
    assert got == expect

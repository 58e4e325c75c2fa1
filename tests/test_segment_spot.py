"""Segmentation and mention-detection semantics tests.

Covers the parity-critical matching quirks called out in SURVEY.md §7.4:
longest-match-wins ordering (RDFLiteralSpotting.java:186-214), the
case-preference filter (:216-246), and word-boundary alignment (:114-131)
— plus the span/offset invariants of the interleaved doc model."""

import pyarrow as pa

from scoobie_ray.sources.docs import DOC_SCHEMA, add_plain_text, flatten_spans_table
from scoobie_ray.stages.segment import segment_batch, sentence_ids, tokenize
from scoobie_ray.stages.spot import Matcher, SpotConfig


def _doc(doc_id, spans):
    return pa.Table.from_pylist(
        [{"doc_id": doc_id, "spans": spans}], schema=DOC_SCHEMA
    )


def test_tokenize_offsets():
    text = "Ab cd, ef."
    s, e = tokenize(text)
    assert [(a, b) for a, b in zip(s, e)] == [(0, 2), (3, 5), (5, 6), (7, 9), (9, 10)]
    assert [text[a:b] for a, b in zip(s, e)] == ["Ab", "cd", ",", "ef", "."]


def test_sentence_ids():
    text = "One two. Three! Four"
    s, _ = tokenize(text)
    sids = sentence_ids(text, s)
    # "One two ." -> 0, "Three !" -> 1, "Four" -> 2
    assert sids == [0, 0, 0, 1, 1, 2]


def test_plain_text_skips_media_spans():
    t = _doc(
        "d1",
        [
            {"kind": "text", "text": "Hello ", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://x", "offset": 6},
            {"kind": "text", "text": "world.", "media_ref": "", "offset": 6},
        ],
    )
    out = add_plain_text(t)
    assert out["plain_text"].to_pylist() == ["Hello world."]
    # spans column untouched (per-row invariant)
    assert out["spans"].to_pylist() == t["spans"].to_pylist()


def test_flatten_spans_table():
    t = _doc(
        "d1",
        [
            {"kind": "text", "text": "a", "media_ref": "", "offset": 0},
            {"kind": "audio", "text": "", "media_ref": "media://a", "offset": 1},
        ],
    )
    flat = flatten_spans_table(t)
    assert flat["span_idx"].to_pylist() == [0, 1]
    assert flat["kind"].to_pylist() == ["text", "audio"]


def test_segment_batch_adds_columns():
    t = _doc("d1", [{"kind": "text", "text": "Hi there.", "media_ref": "", "offset": 0}])
    out = segment_batch(t)
    assert out["tok_start"].to_pylist() == [[0, 3, 8]]
    assert out["tok_sent"].to_pylist() == [[0, 0, 0]]


def test_matcher_word_boundary():
    # 'NATION_1' must not match inside 'NATION_10' (trailing word char)
    m = Matcher(["NATION_1", "NATION_10"])
    assert m.find("NATION_10 here") == [(0, 9, 1)]
    assert m.find("NATION_1 here") == [(0, 8, 0)]
    # no match mid-word
    assert m.find("XNATION_1") == []


def test_matcher_longest_match_filter():
    # nested span dropped (RDFLiteralSpotting.filterLongestMatches:186-214)
    m = Matcher(["New York", "York"])
    assert m.find("in New York city") == [(3, 11, 0)]
    # standalone shorter literal still matches
    assert m.find("York is old") == [(0, 4, 1)]


def test_matcher_partial_overlap_keeps_both():
    m = Matcher(["alpha beta", "beta gamma"])
    hits = m.find("alpha beta gamma")
    assert (0, 10, 0) in hits and (6, 16, 1) in hits


def test_matcher_case_insensitive_prefers_exact_case():
    # filterCaseMatches (:216-246): exact-case literal wins
    m = Matcher(["Paris", "paris"], SpotConfig(case_sensitive=False))
    assert m.find("Paris calling") == [(0, 5, 0)]
    assert m.find("paris calling") == [(0, 5, 1)]
    # surface form matching neither exactly -> all case-variants returned
    assert sorted(m.find("PARIS calling")) == [(0, 5, 0), (0, 5, 1)]


def test_matcher_case_sensitive_rejects_mismatch():
    m = Matcher(["Paris"])
    assert m.find("paris calling") == []


def test_matcher_adjacent_and_edge_labels():
    m = Matcher(["Alpha", "Beta"])
    assert m.find("Alpha Beta") == [(0, 5, 0), (6, 10, 1)]
    assert m.find("Alpha") == [(0, 5, 0)]
    assert m.find("(Beta)") == [(1, 5, 1)]


def test_html_normalization_is_offset_stable():
    from scoobie_ray.stages.normalize import html_to_text, normalize_html_batch

    html = '<p class="x">Percy <b>Jackson</b></p><script>var a=1;</script> here.'
    text = html_to_text(html)
    assert len(text) == len(html)  # Document.java:112-138 contract
    assert "Percy" in text and "Jackson" in text
    assert "script" not in text and "var a" not in text
    # offsets into the normalized text point at the same chars in the html
    i = text.index("Jackson")
    assert html[i : i + 7] == "Jackson"

    t = _doc("d1", [{"kind": "text", "text": html, "media_ref": "", "offset": 0}])
    out = normalize_html_batch(t)
    norm = out["spans"].to_pylist()[0][0]["text"]
    assert len(norm) == len(html)
    assert out["raw_spans"].to_pylist()[0][0]["text"] == html


def test_cjk_segmentation_approximation():
    """ICU stand-in for non-Latin text: CJK ideographs/kana segment per
    character; 。！？ break sentences without trailing whitespace; Latin
    behavior unchanged."""
    from scoobie_ray.stages.segment import sentence_ids, tokenize

    t = "日本語のテスト。Hello world! 中文句子？"
    s, e = tokenize(t)
    toks = [t[a:b] for a, b in zip(s, e)]
    assert toks[:3] == ["日", "本", "語"]  # per-char CJK
    assert "Hello" in toks and "world" in toks  # Latin runs intact
    sids = sentence_ids(t, s)
    # three sentences: 。-terminated, !-terminated, ？-terminated
    assert sids[0] == 0 and sids[toks.index("Hello")] == 1
    assert sids[toks.index("中")] == 2

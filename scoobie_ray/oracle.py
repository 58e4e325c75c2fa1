"""DuckDB oracle SQL for the driver's correctness gate.

Each entry is an independent ANSI-SQL re-derivation of a Ray pipeline's
output over the same parquet tables (pre-registered views: region nation
customer supplier part orders lineitem events documents embeddings).

The KG fixtures (scoobie_ray.sources.fixtures) are pure relational
derivations of the TPC-H tables, so the *whole KG pipeline* — spotting,
candidate linking, graph disambiguation, known facts, markov prediction,
canonical triples, span layout — is expressible here.  The two sides share
only the derivation spec (module doc of fixtures.py), not code.

Column names match the Ray queries exactly (the driver hashes values under
sorted column names).  Outputs avoid floats except where exactly
representable.
"""

# ---- shared CTE fragments (KG corpus derivation) --------------------------

DOCPARTS = """
docparts AS (
  SELECT 'doc-nation-' || n_nationkey AS doc_id, n_nationkey AS key,
         n_name AS label, ' is a nation in ' || r_name || '.' AS rest
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'doc-supplier-' || s_suppkey, s_suppkey, s_name,
         ' operates in ' || n_name || '.'
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  UNION ALL
  SELECT 'doc-customer-' || c_custkey, c_custkey, c_name,
         ' is based in ' || n_name || '.'
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 'doc-alias-' || c_custkey, c_custkey, 'Holder_' || (c_custkey % 50),
         ' is based in ' || n_name || '.'
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)"""

DOCS = "docs AS (SELECT doc_id, label || rest AS text FROM docparts)"

LABELS = """
labels AS (
  SELECT n_name AS label, 'http://example.org/nation/' || n_nationkey AS uri,
         'http://example.org/ont/Nation' AS cls FROM nation
  UNION ALL
  SELECT r_name, 'http://example.org/region/' || r_regionkey,
         'http://example.org/ont/Region' FROM region
  UNION ALL
  SELECT s_name, 'http://example.org/supplier/' || s_suppkey,
         'http://example.org/ont/Supplier' FROM supplier
  UNION ALL
  SELECT c_name, 'http://example.org/customer/' || c_custkey,
         'http://example.org/ont/Customer' FROM customer
  UNION ALL
  SELECT 'Holder_' || (c_custkey % 50), 'http://example.org/customer/' || c_custkey,
         'http://example.org/ont/Customer' FROM customer
)"""

# Every KB literal occurrence in a doc text at a word boundary.
# ASSUMPTION (fixture invariant, see sources/fixtures.py): each label occurs
# at most ONCE per doc text — strpos() models only the FIRST occurrence and
# applies the word-boundary test only there, while the engine spots every
# occurrence.  tests/test_oracle_fixture_invariants.py gates this: if a
# fixture/corpus change ever repeats a label within one doc, generalize this
# CTE to enumerate all occurrences (generate_series over positions) instead.
MENTIONS = """
mentions AS (
  SELECT DISTINCT d.doc_id,
         strpos(d.text, l.label) - 1 AS m_start,
         strpos(d.text, l.label) - 1 + length(l.label) AS m_end,
         l.label AS literal
  FROM docs d CROSS JOIN (SELECT DISTINCT label FROM labels) l
  WHERE strpos(d.text, l.label) > 0
    AND (strpos(d.text, l.label) = 1
         OR NOT regexp_matches(substr(d.text, strpos(d.text, l.label) - 1, 1),
                               '[A-Za-z0-9_]'))
    AND (strpos(d.text, l.label) + length(l.label) > length(d.text)
         OR NOT regexp_matches(
               substr(d.text, strpos(d.text, l.label) + length(l.label), 1),
               '[A-Za-z0-9_]'))
)"""

# longest-match filter: drop spans strictly contained in another match
SPOT = """
spot AS (
  SELECT * FROM mentions m
  WHERE NOT EXISTS (
    SELECT 1 FROM mentions o
    WHERE o.doc_id = m.doc_id
      AND o.m_start <= m.m_start AND o.m_end >= m.m_end
      AND (o.m_start <> m.m_start OR o.m_end <> m.m_end))
)"""

# post-disambiguation resolved (doc_id, subj): ambiguity only in alias docs;
# degree voting keeps the candidate sharing the doc's nation, ties -> min uri
RESOLVED = """
resolved AS (
  SELECT 'doc-nation-' || n_nationkey AS doc_id,
         'http://example.org/nation/' || n_nationkey AS subj FROM nation
  UNION
  SELECT 'doc-nation-' || n_nationkey,
         'http://example.org/region/' || n_regionkey FROM nation
  UNION
  SELECT 'doc-supplier-' || s_suppkey,
         'http://example.org/supplier/' || s_suppkey FROM supplier
  UNION
  SELECT 'doc-supplier-' || s_suppkey,
         'http://example.org/nation/' || s_nationkey FROM supplier
  UNION
  SELECT 'doc-customer-' || c_custkey,
         'http://example.org/customer/' || c_custkey FROM customer
  UNION
  SELECT 'doc-customer-' || c_custkey,
         'http://example.org/nation/' || c_nationkey FROM customer
  UNION
  SELECT 'doc-alias-' || c_custkey,
         'http://example.org/nation/' || c_nationkey FROM customer
  UNION
  SELECT 'doc-alias-' || c.c_custkey,
         (SELECT min('http://example.org/customer/' || c2.c_custkey)
          FROM customer c2
          WHERE c2.c_custkey % 50 = c.c_custkey % 50
            AND c2.c_nationkey = c.c_nationkey)
  FROM customer c
)"""

# outgoing KB object-property edges per subject kind
SUBJ_EDGES = """
subj_edges AS (
  SELECT 'http://example.org/nation/' || n_nationkey AS subj,
         'http://example.org/ont/locatedIn' AS pred,
         'http://example.org/region/' || n_regionkey AS obj FROM nation
  UNION ALL
  SELECT 'http://example.org/supplier/' || s_suppkey,
         'http://example.org/ont/operatesIn',
         'http://example.org/nation/' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'http://example.org/customer/' || c_custkey,
         'http://example.org/ont/basedIn',
         'http://example.org/nation/' || c_nationkey FROM customer
)"""

SUBJ_TYPES = """
subj_types AS (
  SELECT DISTINCT uri, cls FROM labels
)"""

MARKOV = """
markov AS (
  SELECT * FROM (VALUES
    ('http://example.org/ont/Nation', 'http://example.org/ont/locatedIn',
     'http://example.org/ont/Region'),
    ('http://example.org/ont/Supplier', 'http://example.org/ont/operatesIn',
     'http://example.org/ont/Nation'),
    ('http://example.org/ont/Customer', 'http://example.org/ont/basedIn',
     'http://example.org/ont/Nation')) AS t(cs, pred, co)
)"""

_KG_PREFIX = f"WITH {DOCPARTS}, {DOCS}, {LABELS}"

ORACLES: dict[str, str] = {}

ORACLES["kg_spot"] = (
    f"{_KG_PREFIX}, {MENTIONS}, {SPOT} "
    "SELECT doc_id, CAST(m_start AS BIGINT) AS m_start, "
    "CAST(m_end AS BIGINT) AS m_end, literal FROM spot"
)

ORACLES["kg_candidates"] = (
    f"{_KG_PREFIX}, {MENTIONS}, {SPOT} "
    "SELECT DISTINCT s.doc_id, l.uri AS subj "
    "FROM spot s JOIN labels l ON l.label = s.literal"
)

# scope produced by TemplateFilter.infer from seed {ont:operatesIn}:
# markov domain/range clusters = {Supplier, Nation} (prob 1.0 > 0.5),
# rated datatype properties = {rdfs:label} — the expansion is pytest-gated
# (tests/test_stages_extended.py::test_template_infer_expands); this SQL
# mirrors the RESULTING scope: label spotting unchanged, candidate
# subjects restricted to the inferred clusters
ORACLES["kg_candidates_scoped"] = (
    f"{_KG_PREFIX}, {MENTIONS}, {SPOT} "
    "SELECT DISTINCT s.doc_id, l.uri AS subj "
    "FROM spot s JOIN labels l ON l.label = s.literal "
    "WHERE l.cls IN ('http://example.org/ont/Supplier', "
    "'http://example.org/ont/Nation')"
)

ORACLES["kg_resolved"] = (
    f"{_KG_PREFIX}, {RESOLVED} SELECT DISTINCT doc_id, subj FROM resolved"
)

ORACLES["kg_known"] = (
    f"{_KG_PREFIX}, {RESOLVED}, {SUBJ_EDGES} "
    "SELECT DISTINCT r.doc_id, e.subj, e.pred, e.obj "
    "FROM resolved r JOIN subj_edges e ON e.subj = r.subj"
)

ORACLES["kg_predicted"] = (
    f"{_KG_PREFIX}, {RESOLVED}, {SUBJ_TYPES}, {MARKOV} "
    "SELECT DISTINCT a.doc_id, a.subj, m.pred, b.subj AS obj "
    "FROM resolved a JOIN resolved b ON a.doc_id = b.doc_id AND a.subj <> b.subj "
    "JOIN subj_types ta ON ta.uri = a.subj "
    "JOIN subj_types tb ON tb.uri = b.subj "
    "JOIN markov m ON m.cs = ta.cls AND m.co = tb.cls"
)

ORACLES["kg_triples"] = (
    f"{_KG_PREFIX}, {RESOLVED}, {SUBJ_EDGES}, {SUBJ_TYPES}, {MARKOV}, {MENTIONS}, {SPOT} "
    """
, recog_labels AS (
  SELECT DISTINCT r.subj,
         'http://www.w3.org/2000/01/rdf-schema#label' AS pred,
         s.literal AS obj, 'recognized' AS graph
  FROM resolved r
  JOIN spot s ON s.doc_id = r.doc_id
  JOIN labels l ON l.label = s.literal AND l.uri = r.subj
), recog_types AS (
  SELECT DISTINCT r.subj,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         t.cls AS obj, 'recognized' AS graph
  FROM (SELECT DISTINCT subj FROM resolved) r
  JOIN subj_types t ON t.uri = r.subj
), known AS (
  SELECT DISTINCT e.subj, e.pred, e.obj, 'known' AS graph
  FROM (SELECT DISTINCT subj FROM resolved) r
  JOIN subj_edges e ON e.subj = r.subj
), predicted AS (
  SELECT DISTINCT a.subj, m.pred, b.subj AS obj, 'predicted' AS graph
  FROM resolved a JOIN resolved b ON a.doc_id = b.doc_id AND a.subj <> b.subj
  JOIN subj_types ta ON ta.uri = a.subj
  JOIN subj_types tb ON tb.uri = b.subj
  JOIN markov m ON m.cs = ta.cls AND m.co = tb.cls
)
SELECT subj, pred, obj, graph FROM recog_labels
UNION SELECT subj, pred, obj, graph FROM recog_types
UNION SELECT subj, pred, obj, graph FROM known
UNION SELECT subj, pred, obj, graph FROM predicted
"""
)

# kg_rated_rank: the rating stage's oracle-gateable face (integer per-doc
# ranks, not float scores).  Under metrics=("position",) the fused score is
# the z-normed (docLength − firstOccurrenceStart), so rank order ==
# first-resolved-mention start ascending, tie-break subject URI.  The
# degree/tf columns are omitted deliberately: the fixture corpus resolves
# exactly two subjects per doc with identical degree and tf, so their
# z-norms are 0 and any product fusion containing them degenerates to an
# all-tie (rating/RelevanceRating.java:52-86 semantics preserved; the full
# fused ListSerializer output stays pytest-gated).
ORACLES["kg_rated_rank"] = (
    f"{_KG_PREFIX}, {MENTIONS}, {SPOT}, {RESOLVED} "
    """
, sub_first AS (
  SELECT r.doc_id, r.subj, min(s.m_start) AS first_start
  FROM resolved r
  JOIN spot s ON s.doc_id = r.doc_id
  JOIN labels l ON l.label = s.literal AND l.uri = r.subj
  GROUP BY r.doc_id, r.subj
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY first_start ASC, subj ASC) AS BIGINT)
         AS "rank",
       subj
FROM sub_first
"""
)

ORACLES["kg_spans"] = (
    f"{_KG_PREFIX} "
    """
SELECT doc_id, CAST(0 AS BIGINT) AS span_idx, 'text' AS kind, label AS text,
       '' AS media_ref, CAST(0 AS BIGINT) AS span_offset
FROM docparts
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT), 'image', '', 'media://img/' || doc_id,
       CAST(length(label) AS BIGINT)
FROM docparts WHERE key % 3 = 0
UNION ALL
SELECT doc_id, CAST(CASE WHEN key % 3 = 0 THEN 2 ELSE 1 END AS BIGINT),
       'text', rest, '', CAST(length(label) AS BIGINT)
FROM docparts
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT), 'audio', '', 'media://aud/' || doc_id,
       CAST(length(label) + length(rest) AS BIGINT)
FROM docparts WHERE key % 3 = 1
"""
)

ORACLES["kg_spot_ci"] = f"""
WITH {LABELS},
ci_docs AS (
  SELECT 'ci-nation-' || n_nationkey AS doc_id,
         lower(n_name) || ' is a nation in ' || lower(r_name) || '.' AS text
  FROM nation JOIN region ON n_regionkey = r_regionkey
),
ci_mentions AS (
  SELECT DISTINCT d.doc_id,
         strpos(d.text, lower(l.label)) - 1 AS m_start,
         strpos(d.text, lower(l.label)) - 1 + length(l.label) AS m_end,
         l.label AS literal
  FROM ci_docs d CROSS JOIN (SELECT DISTINCT label FROM labels) l
  WHERE strpos(d.text, lower(l.label)) > 0
    AND (strpos(d.text, lower(l.label)) = 1
         OR NOT regexp_matches(
               substr(d.text, strpos(d.text, lower(l.label)) - 1, 1),
               '[A-Za-z0-9_]'))
    AND (strpos(d.text, lower(l.label)) + length(l.label) > length(d.text)
         OR NOT regexp_matches(
               substr(d.text, strpos(d.text, lower(l.label)) + length(l.label), 1),
               '[A-Za-z0-9_]'))
),
ci_spot AS (
  SELECT * FROM ci_mentions m
  WHERE NOT EXISTS (
    SELECT 1 FROM ci_mentions o
    WHERE o.doc_id = m.doc_id
      AND o.m_start <= m.m_start AND o.m_end >= m.m_end
      AND (o.m_start <> m.m_start OR o.m_end <> m.m_end))
)
SELECT doc_id, CAST(m_start AS BIGINT) AS m_start,
       CAST(m_end AS BIGINT) AS m_end, literal
FROM ci_spot
"""

ORACLES["kg_media"] = (
    f"{_KG_PREFIX} "
    """
SELECT doc_id, CAST(1 AS BIGINT) AS span_idx, 'image' AS kind,
       'media://img/' || doc_id AS media_ref
FROM docparts WHERE key % 3 = 0
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT), 'audio', 'media://aud/' || doc_id
FROM docparts WHERE key % 3 = 1
"""
)

ORACLES["kb_resources"] = (
    f"WITH {LABELS}, uris AS ("
    "  SELECT DISTINCT uri FROM labels"
    "  UNION SELECT DISTINCT cls FROM labels"
    "  UNION SELECT * FROM (VALUES"
    "    ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),"
    "    ('http://www.w3.org/2000/01/rdf-schema#label'),"
    "    ('http://example.org/ont/locatedIn'),"
    "    ('http://example.org/ont/operatesIn'),"
    "    ('http://example.org/ont/basedIn')) AS v(uri)"
    ") SELECT CAST(row_number() OVER (ORDER BY uri) - 1 AS BIGINT) AS idx, uri FROM uris"
)

# kb_coverage: the stats layer's getCoverageAmbiguity re-derived from the
# relational fixture (integer counts; ambiguity of a literal = #distinct
# subjects sharing it KB-wide, the only datatype property is rdfs:label)
ORACLES["kb_coverage"] = (
    f"WITH {LABELS.lstrip()}, "
    """
dl AS (SELECT DISTINCT uri, label, cls FROM labels),
amb AS (SELECT label, count(DISTINCT uri) AS n FROM dl GROUP BY label),
inst AS (SELECT cls, count(DISTINCT uri) AS n_inst FROM dl GROUP BY cls)
SELECT dl.cls AS type_uri,
       'http://www.w3.org/2000/01/rdf-schema#label' AS pred_uri,
       count(DISTINCT dl.uri)::BIGINT AS covered,
       max(i.n_inst)::BIGINT AS instances,
       sum(a.n)::BIGINT AS amb_sum,
       count(*)::BIGINT AS amb_n
FROM dl JOIN amb a ON a.label = dl.label JOIN inst i ON i.cls = dl.cls
GROUP BY dl.cls
"""
)

# kb_docfreq: distinct-doc count per spotted literal — rides the same
# SPOT re-derivation the kg_spot hash gate proves exact (boundary +
# longest-match + case semantics included)
ORACLES["kb_docfreq"] = (
    f"{_KG_PREFIX}, {MENTIONS}, {SPOT} "
    "SELECT literal, count(DISTINCT doc_id)::BIGINT AS df FROM spot GROUP BY literal"
)

# kb_property_kinds: the fixture KB has exactly one datatype property
# (rdfs:label), three object properties, and rdf:type edges (object) —
# fixtures.py derivation spec
ORACLES["kb_property_kinds"] = """
SELECT * FROM (VALUES
  ('http://example.org/ont/basedIn', 'object'),
  ('http://example.org/ont/locatedIn', 'object'),
  ('http://example.org/ont/operatesIn', 'object'),
  ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'object'),
  ('http://www.w3.org/2000/01/rdf-schema#label', 'datatype')
) AS t(pred_uri, kind)
"""

# kb_regex_dist: full-match counts of the slot-7 pattern set over the KB
# literal table (distinct (uri, label) = the symbol rows).  Patterns are
# RE2-compatible and labels ASCII, so DuckDB regexp_full_match equals
# Python re.fullmatch.
ORACLES["kb_regex_dist"] = (
    f"WITH {LABELS.lstrip()}, "
    r"""
dl AS (SELECT DISTINCT uri, label FROM labels),
pat AS (SELECT * FROM (VALUES
  ('DATE', '\b\d{1,4}[-/.]\d{1,2}[-/.]\d{1,4}\b'),
  ('FLOAT', '-?\b\d+\.\d+\b'),
  ('INTEGER', '-?\b\d+\b'),
  ('MAIL', '\b[\w.+-]+@[\w-]+\.[\w.-]+\b')
) AS p(name, rx))
SELECT pat.name AS regex_name,
       'http://www.w3.org/2000/01/rdf-schema#label' AS pred_uri,
       sum(CASE WHEN regexp_full_match(dl.label, pat.rx) THEN 1 ELSE 0 END)::BIGINT
         AS n_match,
       count(*)::BIGINT AS n_total
FROM dl, pat
GROUP BY pat.name
"""
)

# media_decode: real binary-PPM decode through the actor pool — the
# fixture images' dims and pixel sums are closed-form over p_partkey
# (fixtures.media_docs_table; all three channels = (x + 3y + k) % 256)
ORACLES["media_decode"] = """
WITH parts AS (
  SELECT p_partkey AS k, 4 + p_partkey % 13 AS w, 3 + p_partkey % 7 AS h
  FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 200)
),
xy AS (
  SELECT a.i AS x, b.j AS y
  FROM generate_series(0, 16) a(i), generate_series(0, 9) b(j)
)
SELECT 'media-' || k AS media_id, w::BIGINT AS width, h::BIGINT AS height,
       sum(3 * ((x + 3*y + k) % 256))::BIGINT AS pix_sum
FROM parts, xy
WHERE xy.x < parts.w AND xy.y < parts.h
GROUP BY k, w, h
"""

# audio_decode: WAV PCM16 decode — fixture sample values are
# ((i*37 + k*101) % 4001) - 2000 over i < 64 + k%129 (fixtures.
# audio_docs_table), so counts/rates/amplitude sums are arithmetic
ORACLES["audio_decode"] = """
WITH parts AS (
  SELECT p_partkey AS k, 64 + p_partkey % 129 AS n,
         8000 + (p_partkey % 5) * 1000 AS rate
  FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 200)
),
ix AS (SELECT i FROM generate_series(0, 192) t(i))
SELECT 'audio-' || k AS media_id, n::BIGINT AS n_samples, rate::BIGINT AS rate,
       sum(((ix.i * 37 + k * 101) % 4001) - 2000)::BIGINT AS amp_sum
FROM parts, ix
WHERE ix.i < parts.n
GROUP BY k, n, rate
"""

ORACLES["kb_cardinalities"] = """
WITH rel AS (
  SELECT 'http://example.org/ont/locatedIn' AS pred,
         'http://example.org/nation/' || n_nationkey AS s,
         'http://example.org/region/' || n_regionkey AS o FROM nation
  UNION ALL
  SELECT 'http://example.org/ont/operatesIn',
         'http://example.org/supplier/' || s_suppkey,
         'http://example.org/nation/' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'http://example.org/ont/basedIn',
         'http://example.org/customer/' || c_custkey,
         'http://example.org/nation/' || c_nationkey FROM customer
  UNION ALL
  SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', u.uri, u.cls
  FROM (
    SELECT 'http://example.org/nation/' || n_nationkey AS uri,
           'http://example.org/ont/Nation' AS cls FROM nation
    UNION ALL SELECT 'http://example.org/region/' || r_regionkey,
           'http://example.org/ont/Region' FROM region
    UNION ALL SELECT 'http://example.org/supplier/' || s_suppkey,
           'http://example.org/ont/Supplier' FROM supplier
    UNION ALL SELECT 'http://example.org/customer/' || c_custkey,
           'http://example.org/ont/Customer' FROM customer
  ) u
)
SELECT pred AS predicate, count(*) AS n_triples,
       count(DISTINCT s) AS n_subjects, count(DISTINCT o) AS n_objects
FROM rel GROUP BY pred
"""

ORACLES["kb_markov"] = """
SELECT * FROM (VALUES
  ('http://example.org/ont/Nation', 'http://example.org/ont/locatedIn',
   'http://example.org/ont/Region', 1.0),
  ('http://example.org/ont/Supplier', 'http://example.org/ont/operatesIn',
   'http://example.org/ont/Nation', 1.0),
  ('http://example.org/ont/Customer', 'http://example.org/ont/basedIn',
   'http://example.org/ont/Nation', 1.0)
) AS t(cluster_s, predicate, cluster_o, prob)
"""

# ---- training-data ops ----------------------------------------------------

_NORM = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"

# ---- kg_regex: slot-7 recognizer over the order-derived template corpus ----
# fixtures.regex_docs_table builds EXACTLY
#   'Order <okey> placed <date> total <ip>.<fp> contact c<okey>@tpch.example refs <refs>.'
# so every DATE/FLOAT/MAIL/INTEGER match span is string arithmetic over the
# component lengths (l1 = len(okey), li = len(ip), lr = len(refs)); the date
# is always 10 chars (4-2-2).  INTEGER ('-?\\b\\d+\\b') matches the okey, the
# three date components ('1996', '-01', '-02' — the optional minus makes the
# hyphen part of the match), the price int/frac parts, and refs; nothing
# matches inside the mail (digits preceded by 'c' fail the word boundary).
# Change fixture and oracle together (CLAUDE.md coupling invariant).

_REGEX_M = """
ro AS (
  SELECT o_orderkey AS okey,
         length(o_orderkey::VARCHAR)::BIGINT AS l1,
         length((o_orderkey % 1000)::VARCHAR)::BIGINT AS li,
         length(((o_orderkey * 7) % 10000)::VARCHAR)::BIGINT AS lr
  FROM orders ORDER BY o_orderkey LIMIT 500
),
m AS (SELECT 'doc-regex-' || okey::VARCHAR AS doc_id, l1, li, lr FROM ro)
"""

ORACLES["kg_regex"] = f"""
WITH {_REGEX_M}
SELECT doc_id, pattern_name, r_start::BIGINT AS r_start, r_end::BIGINT AS r_end FROM (
  SELECT doc_id, 'DATE' AS pattern_name, 14+l1 AS r_start, 24+l1 AS r_end FROM m
  UNION ALL SELECT doc_id, 'FLOAT', 31+l1, 34+l1+li FROM m
  UNION ALL SELECT doc_id, 'MAIL', 43+l1+li, 57+2*l1+li FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 6, 6+l1 FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 14+l1, 18+l1 FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 18+l1, 21+l1 FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 21+l1, 24+l1 FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 31+l1, 31+l1+li FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 32+l1+li, 34+l1+li FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 63+2*l1+li, 63+2*l1+li+lr FROM m
)
"""

# priority mode: DATE/FLOAT suppress the overlapping INTEGER components;
# only the standalone okey and refs integers survive
ORACLES["kg_regex_priority"] = f"""
WITH {_REGEX_M}
SELECT doc_id, pattern_name, r_start::BIGINT AS r_start, r_end::BIGINT AS r_end FROM (
  SELECT doc_id, 'DATE' AS pattern_name, 14+l1 AS r_start, 24+l1 AS r_end FROM m
  UNION ALL SELECT doc_id, 'FLOAT', 31+l1, 34+l1+li FROM m
  UNION ALL SELECT doc_id, 'MAIL', 43+l1+li, 57+2*l1+li FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 6, 6+l1 FROM m
  UNION ALL SELECT doc_id, 'INTEGER', 63+2*l1+li, 63+2*l1+li+lr FROM m
)
"""

# ---- segmentation oracles (slots 1-2) --------------------------------------
# doc_tokens: the documents corpus is single-spaced lowercase words
# (gated by tests/test_oracle_fixture_invariants.py), so token offsets
# equal the space-split derivation.  generate_series needs a constant
# bound (no lateral args in DuckDB) — 512 > max token count, filtered.
ORACLES["doc_tokens"] = """
WITH d AS (
  SELECT doc_id::VARCHAR AS doc_id, string_split(text, ' ') AS words FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) AS t(i))
SELECT d.doc_id,
       (ix.i - 1)::BIGINT AS tok_idx,
       (CASE WHEN ix.i = 1 THEN 0
             ELSE length(array_to_string(d.words[1:ix.i-1], ' ')) + 1 END)::BIGINT
         AS t_start,
       (CASE WHEN ix.i = 1 THEN 0
             ELSE length(array_to_string(d.words[1:ix.i-1], ' ')) + 1 END
        + length(d.words[ix.i]))::BIGINT AS t_end
FROM d, ix
WHERE ix.i <= len(d.words)
"""

# doc_sentences: sentence i of doc d is the regex template of order
# rn = 3d + i (see fixtures.sentence_docs_table) — 21 tokens always,
# char length 64 + 2*l1 + li + lr, sentences joined by one space.
ORACLES["doc_sentences"] = """
WITH ro AS (
  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
         length(o_orderkey::VARCHAR)::BIGINT AS l1,
         length((o_orderkey % 1000)::VARCHAR)::BIGINT AS li,
         length(((o_orderkey * 7) % 10000)::VARCHAR)::BIGINT AS lr
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 600)
),
s AS (
  SELECT (rn // 3) AS doc, (rn % 3) AS sid, 64 + 2*l1 + li + lr AS slen FROM ro
),
pos AS (
  SELECT doc, sid, slen,
         sum(slen + 1) OVER (PARTITION BY doc ORDER BY sid
                             ROWS UNBOUNDED PRECEDING) - slen - 1 AS sstart
  FROM s
)
SELECT 'doc-sent-' || doc AS doc_id, sid::BIGINT AS sent_id,
       21::BIGINT AS n_tokens, sstart::BIGINT AS s_start,
       (sstart + slen)::BIGINT AS s_end
FROM pos
"""

# doc_pos_np (slots 3-4): the heuristic POS tagger + NP chunker assign a
# CONSTANT (pos, np) tag per token position of the order template — the
# rules are word-shape-based and every template instance has the same
# 21-token shape sequence (verified at sf0.001/0.01/0.1; digit widths
# don't change shapes).  Oracle = the constant sequence × every sentence.
ORACLES["doc_pos_np"] = """
WITH sents AS (
  SELECT 'doc-sent-' || ((row_number() OVER (ORDER BY o_orderkey) - 1) // 3)
           AS doc_id,
         ((row_number() OVER (ORDER BY o_orderkey) - 1) % 3) AS sent_id
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 600)
),
tags AS (
  SELECT * FROM (VALUES
    (0, 'NNP', 'B-NP'), (1, 'CD', 'I-NP'), (2, 'VBD', 'O'),
    (3, 'CD', 'B-NP'), (4, '.', 'O'), (5, 'CD', 'B-NP'), (6, '.', 'O'),
    (7, 'CD', 'B-NP'), (8, 'JJ', 'I-NP'), (9, 'CD', 'I-NP'), (10, '.', 'O'),
    (11, 'CD', 'B-NP'), (12, 'NN', 'I-NP'), (13, 'NN', 'I-NP'), (14, '.', 'O'),
    (15, 'NN', 'B-NP'), (16, '.', 'O'), (17, 'NN', 'B-NP'),
    (18, 'NNS', 'I-NP'), (19, 'CD', 'I-NP'), (20, '.', 'O')
  ) AS t(tok_idx, pos_tag, np_tag)
)
SELECT s.doc_id, s.sent_id::BIGINT AS sent_id, t.tok_idx::BIGINT AS tok_idx,
       t.pos_tag, t.np_tag
FROM sents s, tags t
"""

ORACLES["dedup_exact"] = f"""
SELECT doc_id FROM documents
QUALIFY row_number() OVER (PARTITION BY {_NORM} ORDER BY doc_id) = 1
"""

ORACLES["fingerprint"] = f"""
SELECT doc_id, {_NORM} AS fingerprint FROM documents
"""

ORACLES["text_stats"] = """
SELECT doc_id,
       length(text) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            AS BIGINT) AS n_bpe,
       length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct
FROM documents
"""

ORACLES["knn_bruteforce"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS score
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) - 1 AS rank
  FROM scored) WHERE rank < 5
"""

def _langid_cte() -> str:
    """Reusable CTE chain (ending in ``pred(doc_id, lang_pred)``)
    replicating ops.text.LangId from the SAME stopword profiles (single
    source of truth): per-doc stopword votes per language, argmax with
    ties preferring the engine's language order, default 'en'."""
    from .ops.text import STOPWORDS

    langs = ("en", "es", "de", "fr")
    rows = []
    for ord_, lang in enumerate(langs):
        for w in sorted(STOPWORDS[lang]):
            rows.append(f"('{lang}', '{w}', {ord_})")
    values = ",\n    ".join(rows)
    return f"""words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-zäöüéèáíóú]+')) AS w
  FROM documents
), profiles(lang, w, ord) AS (
  VALUES
    {values}
), votes AS (
  SELECT d.doc_id, p.lang, p.ord, count(*) AS n
  FROM words d JOIN profiles p ON p.w = d.w
  GROUP BY d.doc_id, p.lang, p.ord
), best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, ord) AS rk
  FROM votes
), pred AS (
  SELECT doc.doc_id, coalesce(b.lang, 'en') AS lang_pred
  FROM documents doc
  LEFT JOIN best b ON b.doc_id = doc.doc_id AND b.rk = 1
)"""


def _langid_oracle() -> str:
    return f"WITH {_langid_cte()} SELECT doc_id, lang_pred FROM pred"


# ANN recall gates: the fixture embeddings + probe configs (LSH n_bits=4/
# probe_bits=2, IVF n_probe=4) give recall@5 = 1.0 (measured r3, both sf);
# the oracle asserts exactly 100 per query, so any lost true neighbor in
# the persisted index build/probe/read path fails the hash compare.  If a
# testdata regeneration lowers achievable recall, re-measure and adjust
# the probe config in __ray_entry__._q_knn_recall, not this oracle.
ORACLES["knn_lsh_recall"] = """
SELECT vec_id AS query_id, 100::BIGINT AS recall_pct
FROM embeddings WHERE vec_id < 3 ORDER BY vec_id
"""
ORACLES["knn_ivf_recall"] = ORACLES["knn_lsh_recall"]

ORACLES["langid"] = _langid_oracle()

ORACLES["quality_flags"] = """
WITH q AS (
  SELECT doc_id,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id, CAST(n_nonspace AS BIGINT) AS n_nonspace, n_tokens,
       CAST(CASE WHEN n_tokens > 0 THEN (n_nonspace * 100) // n_tokens
                 ELSE 0 END AS BIGINT) AS avg_token_centichars,
       n_tokens >= 5 AS len_ok,
       n_punct * 2 <= greatest(1, n_tokens) AS punct_ok
FROM q
"""

# ---- relational -----------------------------------------------------------

ORACLES["q1_pricing"] = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["nation_lineitem_counts"] = """
SELECT n_name, count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

ORACLES["events_hourly"] = """
SELECT user_id,
       (epoch_us(ts) // 3600000000) * 3600 AS hour_start,
       count(*) AS n_events
FROM events GROUP BY user_id, hour_start
"""

ORACLES["events_sessionize"] = """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL
                      OR epoch_us(ts) - epoch_us(prev) > 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM e GROUP BY user_id
"""

ORACLES["top_parts"] = """
SELECT l_partkey, count(*) AS n_li
FROM lineitem GROUP BY l_partkey
ORDER BY n_li DESC, l_partkey LIMIT 10
"""

ORACLES["orders_by_status"] = """
SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY o_orderstatus
"""

ORACLES["events_top_users"] = """
SELECT user_id, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 10
"""

ORACLES["distinct_event_types"] = """
SELECT DISTINCT event_type FROM events
"""

ORACLES["lineitem_yearly"] = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year, count(*) AS n_items
FROM lineitem GROUP BY ship_year
"""

ORACLES["part_size_histogram"] = """
SELECT CAST(p_size AS BIGINT) AS p_size, count(*) AS n_parts
FROM part GROUP BY p_size
"""

ORACLES["customer_segments"] = """
SELECT c_mktsegment, count(*) AS n_customers FROM customer GROUP BY c_mktsegment
"""

ORACLES["supplier_nation_join"] = """
SELECT r_name, count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# ---- RDF parser coverage (mirror of sources/rdf_fixtures.py — change
# BOTH or neither; the dump is derived from nation/region/supplier, the
# parser cleans it per kb/parser.py, survivors are listed here) ----------

ORACLES["kb_parse_turtle"] = """
WITH t AS (
  SELECT 'http://example.org/nation/' || n_nationkey AS s,
         'http://www.w3.org/2000/01/rdf-schema#label' AS p,
         n_name AS o, TRUE AS o_is_literal FROM nation
  UNION ALL
  SELECT 'http://example.org/nation/' || n_nationkey,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
         'http://example.org/ont/Nation', FALSE FROM nation
  UNION ALL
  SELECT 'http://example.org/nation/' || n_nationkey,
         'http://example.org/ont/inRegion',
         'http://example.org/region/' || n_regionkey, FALSE FROM nation
  UNION ALL
  SELECT 'http://example.org/region/' || r_regionkey,
         'http://www.w3.org/2000/01/rdf-schema#label',
         r_name, TRUE FROM region
  UNION ALL
  SELECT 'http://example.org/region/' || r_regionkey,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
         'http://example.org/ont/Region', FALSE FROM region
  UNION ALL
  -- the escaped literal (a, newline, b, tab, c) survives cleaning as
  -- 'abc'; the over-long URI, the 1-char and the 150-char literals are
  -- dropped by the parser's filters
  SELECT 'http://example.org/escape/1',
         'http://www.w3.org/2000/01/rdf-schema#comment', 'abc', TRUE
)
SELECT s, p, o, o_is_literal FROM t
"""

ORACLES["kb_parse_rdfxml"] = """
WITH t AS (
  SELECT 'http://example.org/supplier/' || s_suppkey AS s,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
         'http://example.org/ont/Supplier' AS o, FALSE AS o_is_literal
  FROM supplier
  UNION ALL
  SELECT 'http://example.org/supplier/' || s_suppkey,
         'http://www.w3.org/2000/01/rdf-schema#label', s_name, TRUE
  FROM supplier
  UNION ALL
  SELECT 'http://example.org/supplier/' || s_suppkey,
         'http://example.org/ont/inNation',
         'http://example.org/nation/' || s_nationkey, FALSE
  FROM supplier
)
SELECT s, p, o, o_is_literal FROM t
"""

# ---- near-dup dedup oracles (LSH-free re-derivation) -----------------------
# The engine generates candidates with MinHash-LSH banding and verifies
# TRUE Jaccard inside the bucket groupby; the oracle skips LSH entirely:
# ALL pairs' exact Jaccard + recursive-CTE connected components + min-id
# representative.  Equality therefore also GATES LSH RECALL = 1.0 on the
# fixture corpus (a missed candidate pair would surface as a row diff) —
# tests/test_ops.py locks the same property at sf0.001.
#
# TWO fixture assumptions make engine == oracle, both gated by
# tests/test_oracle_fixture_invariants.py:
# 1. BUCKET PAIR EMISSION: the engine emits ALL in-bucket pairs for
#    buckets <= 32 rows (complete graph — exactly the oracle's all-pairs
#    union) and star + trailing-window pairs above that.  A miss now
#    requires a >32-row bucket with a >8 id-gap between the true pair in
#    EVERY shared band (late-r3: the earlier star-only emission missed a
#    true isolated pair at sf0.001 because every shared bucket had a
#    smaller-id dissimilar hub — the all-pairs-under-cap fix closed it).
# 2. ASCII TEXTS: char_shingles windows over UTF-8 BYTES; the SQL oracle
#    shingles with substr() over CHARACTERS.  Identical only while fixture
#    document texts are pure ASCII.

# shared all-pairs minhash re-derivation chain; the caller supplies the
# ``norm(doc_id, t)`` CTE (full corpus for dedup_minhash, the filtered
# subset for curate — exact-dup removal before near-dedup is provably a
# no-op for components, identical texts share every neighbor)
_MINHASH_CHAIN = r"""
idx AS (SELECT i FROM generate_series(1, 4096) g(i)),
sh AS (  -- distinct 5-char shingles (engine: ops/dedup.py char_shingles)
  SELECT DISTINCT n.doc_id, substr(n.t, CAST(idx.i AS INTEGER), 5) AS s
  FROM norm n JOIN idx ON idx.i <= greatest(1, length(n.t) - 4)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
edges AS (
  SELECT da, db FROM inter
  JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
),
edges2 AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM norm
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges2 e ON e.a = r.b
)
SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) = a"""

ORACLES["dedup_minhash"] = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
),""" + _MINHASH_CHAIN

# curate: the composed training-data curation pipeline — quality filter
# (n_tokens >= 30, punctuation bound) ∩ langid == 'en' ∩ exact+minhash
# dedup over the SURVIVING subset (min-id per near-dup component).
# ORACLE-side scale limit: the all-pairs shingle self-join is quadratic;
# at sf0.1 (5000 docs) DuckDB's spill exceeds the sandbox disk — the
# driver's sf0.01 gate is the supported scale for this oracle (the
# ENGINE side streams fine at any sf).
ORACLES["curate"] = (
    "WITH RECURSIVE "
    + _langid_cte()
    + r""",
q AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct
  FROM documents
),
kept AS (
  SELECT q.doc_id FROM q JOIN pred p ON p.doc_id = q.doc_id
  WHERE q.n_tokens >= 30 AND q.n_punct * 2 <= greatest(1, q.n_tokens)
    AND p.lang_pred = 'en'
),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)
),"""
    + _MINHASH_CHAIN
)

ORACLES["dedup_ngram"] = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id,
         str_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
idx AS (SELECT i FROM generate_series(1, 4096) g(i)),
ng AS (  -- distinct word 3-grams (engine: ops/dedup.py word_ngrams)
  SELECT DISTINCT n.doc_id,
         CASE WHEN len(n.w) < 3 THEN array_to_string(n.w, ' ')
              ELSE n.w[CAST(idx.i AS INTEGER)] || ' ' ||
                   n.w[CAST(idx.i AS INTEGER) + 1] || ' ' ||
                   n.w[CAST(idx.i AS INTEGER) + 2]
         END AS s
  FROM norm n JOIN idx ON idx.i <= greatest(1, len(n.w) - 2)
),
sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM ng a JOIN ng b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
edges AS (
  SELECT da, db FROM inter
  JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
),
edges2 AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM norm
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges2 e ON e.a = r.b
)
SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) = a
"""

# dedup_simhash: EXACT bit-level re-derivation (not LSH-free — the 16-bit
# banding IS the operator's semantics and is replicated):
# DuckDB md5_number_upper == int.from_bytes(md5[:8], 'little'), the same
# word hash as ops/dedup.py _hash_str; per-bit weighted sign -> signature;
# identical band chunk -> candidate per _sorted_bucket_pair_idx (COMPLETE
# in-bucket pair graph for buckets <= 32 rows, bucket-min star + trailing
# window of 8 id-ranks above — r4, replacing the star-only rule); Hamming
# <= 3 verify; connected components.  At sf0.1 the largest band bucket is
# 291 rows, so the cap branch is exercised by the gate.  Caveat: assumes
# no empty doc texts (str_split('') yields [''] while Python ''.split()
# yields []).
ORACLES["dedup_simhash"] = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id, str_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
words AS (
  SELECT n.doc_id, u.word, count(*) AS cnt
  FROM norm n, unnest(n.w) AS u(word)
  GROUP BY n.doc_id, u.word
),
bits AS (SELECT CAST(i AS INTEGER) AS b FROM generate_series(0, 63) g(i)),
acc AS (
  SELECT w.doc_id, bits.b,
         sum(w.cnt * (CASE WHEN (md5_number_upper(w.word) >> bits.b) & 1 = 1
                           THEN 1 ELSE -1 END)) AS s
  FROM words w CROSS JOIN bits
  GROUP BY w.doc_id, bits.b
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS UBIGINT) << b)
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS h
  FROM acc GROUP BY doc_id
),
bandidx AS (SELECT CAST(i AS INTEGER) AS band FROM generate_series(0, 3) g(i)),
bands AS (
  SELECT s.doc_id, s.h, bi.band, (s.h >> (16 * bi.band)) & 65535 AS chunk
  FROM sig s CROSS JOIN bandidx bi
),
ranked AS (
  SELECT doc_id, band, chunk,
         row_number() OVER (PARTITION BY band, chunk ORDER BY doc_id) AS rk,
         count(*) OVER (PARTITION BY band, chunk) AS sz
  FROM bands
),
cand AS (
  SELECT DISTINCT ra.doc_id AS da, rb.doc_id AS db
  FROM ranked ra JOIN ranked rb
    ON ra.band = rb.band AND ra.chunk = rb.chunk AND ra.rk < rb.rk
  WHERE ra.sz <= 32 OR ra.rk = 1 OR rb.rk - ra.rk <= 8
),
edges AS (
  SELECT c.da, c.db FROM cand c
  JOIN sig sa ON sa.doc_id = c.da JOIN sig sb ON sb.doc_id = c.db
  WHERE bit_count(xor(sa.h, sb.h)) <= 3
),
edges2 AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM norm
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges2 e ON e.a = r.b
)
SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) = a
"""

# dedup_embedding: LSH-free all-pairs cosine re-derivation.  The fixture
# embeddings are near-orthogonal (max pairwise cosine ≈ 0.51 at sf0.01),
# so at threshold 0.98 the oracle gates that the operator drops NOTHING
# spuriously (ids + schema + hash); true near-dup dropping is gated by
# tests/test_ops.py::test_embedding_dedup on constructed duplicates and
# the sf0.001 golden lock.
ORACLES["dedup_embedding"] = r"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS da, b.vec_id AS db
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
),
edges2 AS (SELECT da AS a, db AS b FROM pairs UNION ALL SELECT db, da FROM pairs),
reach(a, b) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges2 e ON e.a = r.b
)
SELECT a AS vec_id FROM reach GROUP BY a HAVING min(b) = a
"""

# ---- corpus-curation oracles (ops/curation.py, all integer-exact) ----------
# decontaminate: benchmark = docs with doc_id % 37 == 0 (the engine-side
# wrapper in __ray_entry__ uses the same filter); n = 8 token grams.
# List slicing w[i:i+7] is 1-based inclusive-inclusive (8 elements).
ORACLES["decontaminate"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
g AS (
  SELECT d.doc_id, array_to_string(d.w[ix.i:ix.i+7], ' ') AS gram
  FROM d JOIN ix ON ix.i <= len(d.w) - 7
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM g JOIN bench USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(greatest(len(d.w) - 7, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM d LEFT JOIN hits h USING (doc_id)
"""

# Bloom-filter decontamination (bounded gate): the oracle re-derives the
# EXACT contaminated count; the boolean constants assert the engine-side
# Bloom bounds (superset of exact, <=1% extra flags) — same pattern as
# the ANN recall gates.
ORACLES["decontaminate_bloom"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
g AS (
  SELECT d.doc_id, array_to_string(d.w[ix.i:ix.i+7], ' ') AS gram
  FROM d JOIN ix ON ix.i <= len(d.w) - 7
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_contaminated,
       TRUE AS bloom_superset,
       TRUE AS bloom_extra_le_1pct
FROM g JOIN bench USING (gram)
"""

# sample_stratified: md5_number_upper(key) == int.from_bytes(md5[:8],
# 'little') (the engine's stable_bucket_u64) — deterministic per-stratum
# percentage keep.  Rates mirror the engine wrapper: en 60 / es 30 /
# default 10.
ORACLES["sample_stratified"] = r"""
SELECT doc_id, lang,
       CAST(md5_number_upper(doc_id::VARCHAR) % 100 AS BIGINT) AS bucket
FROM documents
WHERE md5_number_upper(doc_id::VARCHAR) % 100 <
      CASE lang WHEN 'en' THEN 60 WHEN 'es' THEN 30 ELSE 10 END
"""

# rebalance_mixture: target-domain-mixture resampling (ops/curation.
# rebalance_mixture) — per-domain counts, largest feasible output size
# cap = min(C_d * 10000 // w_d), keep rate r_d = min(10000,
# cap * w_d // C_d), survive iff md5 % 10000 < r_d.  All
# integer; weights mirror the engine wrapper (en 6000 / de 2000 /
# fr 2000; zh/es dropped — a mixture defines its domains).
ORACLES["rebalance_mixture"] = r"""
WITH w AS (
  SELECT * FROM (VALUES ('en', 6000), ('de', 2000), ('fr', 2000)) t(lang, w_bp)
),
c AS (
  SELECT d.lang, count(*) AS n FROM documents d JOIN w USING (lang)
  GROUP BY d.lang
),
cap AS (SELECT min(c.n * 10000 // w.w_bp) AS cap FROM c JOIN w USING (lang)),
r AS (
  SELECT c.lang, least(10000, cap.cap * w.w_bp // c.n) AS r_bp
  FROM c JOIN w USING (lang) CROSS JOIN cap
)
SELECT d.doc_id, d.lang,
       CAST(md5_number_upper(d.doc_id::VARCHAR) % 10000 AS BIGINT) AS bucket
FROM documents d JOIN r USING (lang)
WHERE md5_number_upper(d.doc_id::VARCHAR) % 10000 < r.r_bp
"""

# redact_pii: chained global regexp_replace over the regex fixture corpus
# (sources/fixtures.regex_docs_table template rebuilt in SQL — the
# oracle-coupling invariant applies to this CTE too).  Arrow
# replace_substring_regex and DuckDB regexp_replace are BOTH RE2, so the
# redacted text matches byte-for-byte; rule order (MAIL then DATE)
# mirrors ops/text.REDACT_RULES.
ORACLES["redact_pii"] = r"""
WITH ro AS (
  SELECT o_orderkey AS okey, strftime(o_orderdate, '%Y-%m-%d') AS d
  FROM orders ORDER BY o_orderkey LIMIT 500
),
t AS (
  SELECT 'doc-regex-' || okey::VARCHAR AS doc_id,
         'Order ' || okey::VARCHAR || ' placed ' || d || ' total ' ||
         (okey % 1000)::VARCHAR || '.' ||
         lpad(((okey * 7) % 100)::VARCHAR, 2, '0') ||
         ' contact c' || okey::VARCHAR || '@tpch.example refs ' ||
         ((okey * 7) % 10000)::VARCHAR || '.' AS text
  FROM ro
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\d{4}-\d{2}-\d{2}', '<DATE>', 'g') AS redacted
FROM t
"""

# sampled_quantiles: quantiles over the deterministic bottom-k-md5 sample
# (ops/sketch.bottomk_sample — the unbounded-cardinality quantile path;
# mergeable: bottom-k of a union == bottom-k of per-shard bottom-ks).
# The oracle draws the IDENTICAL sample, so the gate is hash-exact, not
# an error bound.
ORACLES["sampled_quantiles"] = r"""
WITH s AS (
  SELECT n_chars AS v FROM documents
  ORDER BY md5_number_upper(doc_id::VARCHAR), doc_id
  LIMIT 256
)
SELECT CAST(10 AS BIGINT) AS q_pct, CAST(quantile_disc(v, 0.10) AS BIGINT) AS val FROM s
UNION ALL SELECT 25, CAST(quantile_disc(v, 0.25) AS BIGINT) FROM s
UNION ALL SELECT 50, CAST(quantile_disc(v, 0.50) AS BIGINT) FROM s
UNION ALL SELECT 75, CAST(quantile_disc(v, 0.75) AS BIGINT) FROM s
UNION ALL SELECT 90, CAST(quantile_disc(v, 0.90) AS BIGINT) FROM s
"""

# shuffle_rank: deterministic global shuffle order (ops/curation.
# global_shuffle_rank) — rank under unsigned md5_number_upper ordering,
# tie-break on the key (md5 collisions are ~impossible but the tie-break
# keeps both sides total orders).
ORACLES["shuffle_rank"] = r"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5_number_upper(doc_id::VARCHAR),
                               doc_id) - 1 AS BIGINT) AS shuffle_pos
FROM documents
"""

# cross_doc_grams: substring-dedup measurement (ops/curation.
# cross_doc_grams) — per doc, the number of 8-token windows whose gram
# occurs in >= 2 distinct docs.  Same gram CTE as decontaminate (512-token
# cap is the established fixture bound); engine-side hashing is injective
# up to the documented 2^-64 collision tolerance.
ORACLES["cross_doc_grams"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
g AS (
  SELECT d.doc_id, array_to_string(d.w[ix.i:ix.i+7], ' ') AS gram
  FROM d JOIN ix ON ix.i <= len(d.w) - 7
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
  ) WHERE df >= 2
),
hits AS (
  SELECT g.doc_id, count(*) AS n FROM g JOIN dup USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(greatest(len(d.w) - 7, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_dup_windows
FROM d LEFT JOIN hits h USING (doc_id)
"""

# dedup_substrings: the ACTION half of cross_doc_grams (ops/curation.
# dedup_substrings) — rewrite each doc dropping every token covered by an
# 8-token window whose gram occurs in >= 2 distinct docs; kept tokens
# re-joined with single spaces (byte-exact; the redact_pii gate pattern).
# Same gram CTE + 512-token fixture bound as cross_doc_grams (the engine
# query pins max_tokens=512 so a longer corpus fails loudly).
ORACLES["dedup_substrings"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
g AS (
  SELECT d.doc_id, ix.i AS i, array_to_string(d.w[ix.i:ix.i+7], ' ') AS gram
  FROM d JOIN ix ON ix.i <= len(d.w) - 7
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
  ) WHERE df >= 2
),
hit AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)),
tok AS (
  SELECT d.doc_id, ix.i AS j, d.w[ix.i] AS token
  FROM d JOIN ix ON ix.i <= len(d.w)
  WHERE d.w[ix.i] <> ''
),
cov AS (
  SELECT DISTINCT t.doc_id, t.j FROM tok t
  JOIN hit h ON h.doc_id = t.doc_id AND t.j BETWEEN h.i AND h.i + 7
),
kept AS (
  SELECT t.doc_id, t.j, t.token FROM tok t
  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.j = t.j
  WHERE c.j IS NULL
),
ka AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY j) AS clean_text
  FROM kept GROUP BY doc_id
),
ca AS (SELECT doc_id, COUNT(*) AS n_dropped FROM cov GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(ka.clean_text, '') AS clean_text,
       CAST(COALESCE(ca.n_dropped, 0) AS BIGINT) AS n_dropped
FROM d LEFT JOIN ka USING (doc_id) LEFT JOIN ca USING (doc_id)
"""

# chunk_documents: fixed-token-window chunking with overlap (ops/
# curation.chunk_documents, size=64 stride=48) — chunk k covers tokens
# [k*48, min(k*48+64, T)); row-local, byte-exact.  list_filter drops the
# '' token an all-whitespace doc would contribute (engine emits no chunk
# for token-less docs); generate_series bound 0..63 covers the fixture's
# 512-token max (engine query pins max_tokens=512).
ORACLES["chunk_docs"] = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
ck AS (SELECT c FROM generate_series(0, 63) t(c)),
chunks AS (
  SELECT d.doc_id, ck.c AS chunk_idx,
         array_to_string(d.w[ck.c*48+1 : least(ck.c*48+64, len(d.w))], ' ')
           AS chunk_text,
         CAST(least(ck.c*48+64, len(d.w)) - ck.c*48 AS BIGINT) AS n_tokens
  FROM d JOIN ck ON ck.c*48 < len(d.w)
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text, n_tokens
FROM chunks
"""

# decontaminate_rewrite: the ACTION half of decontaminate (ops/curation.
# decontaminate_rewrite) — surgically drop tokens covered by an 8-token
# window whose gram appears in the benchmark slice (doc_id % 37 = 0, the
# decontaminate oracle's benchmark derivation); byte-exact rewrite.
ORACLES["decontaminate_rewrite"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
g AS (
  SELECT d.doc_id, ix.i AS i, array_to_string(d.w[ix.i:ix.i+7], ' ') AS gram
  FROM d JOIN ix ON ix.i <= len(d.w) - 7
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
hit AS (SELECT g.doc_id, g.i FROM g JOIN bench USING (gram)),
tok AS (
  SELECT d.doc_id, ix.i AS j, d.w[ix.i] AS token
  FROM d JOIN ix ON ix.i <= len(d.w) WHERE d.w[ix.i] <> ''
),
cov AS (
  SELECT DISTINCT t.doc_id, t.j FROM tok t
  JOIN hit h ON h.doc_id = t.doc_id AND t.j BETWEEN h.i AND h.i + 7
),
kept AS (
  SELECT t.doc_id, t.j, t.token FROM tok t
  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.j = t.j WHERE c.j IS NULL
),
ka AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY j) AS clean_text
  FROM kept GROUP BY doc_id
),
ca AS (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id)
SELECT d.doc_id, COALESCE(ka.clean_text, '') AS clean_text,
       CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_dropped
FROM d LEFT JOIN ka USING (doc_id) LEFT JOIN ca USING (doc_id)
"""

# prune_rare_tokens: vocabulary-tail pruning (ops/curation.
# prune_rare_tokens) — drop tokens with corpus document frequency below
# n_docs // 10 (scale-relative so the drop path is exercised at every
# fixture scale).  Same rewrite semantics + 512-token bound as
# dedup_substrings; byte-exact.
ORACLES["prune_rare_tokens"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
thr AS (SELECT COUNT(*) // 10 AS min_df FROM documents),
tok AS (
  SELECT d.doc_id, ix.i AS j, d.w[ix.i] AS token
  FROM d JOIN ix ON ix.i <= len(d.w) WHERE d.w[ix.i] <> ''
),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
kept AS (
  SELECT t.doc_id, t.j, t.token FROM tok t JOIN df USING (token), thr
  WHERE df.df >= thr.min_df
),
ka AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY j) AS pruned_text
  FROM kept GROUP BY doc_id
),
ca AS (
  SELECT t.doc_id, COUNT(*) AS n FROM tok t JOIN df USING (token), thr
  WHERE df.df < thr.min_df GROUP BY t.doc_id
)
SELECT d.doc_id, COALESCE(ka.pruned_text, '') AS pruned_text,
       CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_dropped
FROM d LEFT JOIN ka USING (doc_id) LEFT JOIN ca USING (doc_id)
"""

# remove_tokens: stop-list removal (ops/curation.remove_tokens) — the
# broadcast-small-side companion to prune_rare_tokens; the constant list
# mirrors the engine query.  Byte-exact.
ORACLES["remove_tokens"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
tok AS (
  SELECT d.doc_id, ix.i AS j, d.w[ix.i] AS token
  FROM d JOIN ix ON ix.i <= len(d.w) WHERE d.w[ix.i] <> ''
),
kept AS (SELECT * FROM tok WHERE token NOT IN ('a', 'data', 'join', 'the')),
ka AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY j) AS filtered_text
  FROM kept GROUP BY doc_id
),
ca AS (
  SELECT doc_id, COUNT(*) AS n FROM tok
  WHERE token IN ('a', 'data', 'join', 'the') GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(ka.filtered_text, '') AS filtered_text,
       CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_dropped
FROM d LEFT JOIN ka USING (doc_id) LEFT JOIN ca USING (doc_id)
"""

# chunker_f1: bounded gate for the TRAINED slot-4 NP chunker (same
# pattern as decontaminate_bloom / the ANN recall gates): the engine
# trains from the reference's conll2000 zips at the fast budget
# (1500 sentences, 3 iterations — measured held-out NP F1 0.906; full
# corpus 0.918) and emits corpus sizes + the F1 bar as booleans; the
# oracle re-states the constants.  The corpus is the reference's own
# fixed training data (8936 train / 2012 test sentences, 20 chunk
# labels in the first 1500 train sentences).
ORACLES["chunker_f1"] = r"""
SELECT CAST(8936 AS BIGINT) AS n_train_sentences,
       CAST(2012 AS BIGINT) AS n_test_sentences,
       CAST(20 AS BIGINT) AS n_labels,
       TRUE AS f1_ge_88
"""

# pack_sequences: global prefix sum of whitespace token counts in doc_id
# order, budget 256 (engine: ops/curation.pack_sequences distributed
# prefix-sum; a doc may straddle sequences — causal-LM packing).
ORACLES["pack_sequences"] = r"""
WITH q AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM q
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % 256 AS BIGINT) AS seq_off
FROM c
"""

# repetition_stats: within-doc duplicate-token / duplicate-2-gram
# counters (Gopher quality-signal numerators), integer-exact.
ORACLES["repetition_stats"] = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
t AS (SELECT doc_id, unnest(w) AS tok FROM d),
ts AS (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct_tokens
  FROM t GROUP BY doc_id
),
ix AS (SELECT i FROM generate_series(1, 512) t(i)),
g AS (
  SELECT d.doc_id, array_to_string(d.w[ix.i:ix.i+1], ' ') AS gram
  FROM d JOIN ix ON ix.i <= len(d.w) - 1
),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
gs AS (
  SELECT doc_id, sum(c) AS n_2grams, count(*) AS n_distinct_2grams,
         max(c) AS top_2gram_count
  FROM gc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(ts.n_tokens AS BIGINT) AS n_tokens,
       CAST(ts.n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
       CAST(COALESCE(gs.n_2grams, 0) AS BIGINT) AS n_2grams,
       CAST(COALESCE(gs.n_distinct_2grams, 0) AS BIGINT) AS n_distinct_2grams,
       CAST(COALESCE(gs.top_2gram_count, 0) AS BIGINT) AS top_2gram_count
FROM d JOIN ts USING (doc_id) LEFT JOIN gs USING (doc_id)
"""

# ---- as-of join oracles (relational/asof.py) -------------------------------
# Backward as-of join: DuckDB's native ASOF JOIN is the oracle.  The
# engine emits the matched right-TIMESTAMP value (not a row id), which is
# deterministic even when several right rows tie on (key, ts).
ORACLES["events_last_order"] = r"""
SELECT e.event_id, e.user_id,
       CAST(COALESCE(epoch_us(o.o_orderdate) // 86400000000, -1) AS BIGINT)
         AS last_order_day
FROM events e ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""

# strict (<) variant with genuinely interleaved timestamps: for every
# event, the same user's latest strictly-earlier 'click'.
ORACLES["events_last_touch"] = r"""
SELECT e.event_id, e.user_id,
       CAST(COALESCE(epoch_us(c.ts), -1) AS BIGINT) AS last_click_us
FROM events e ASOF LEFT JOIN
  (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts > c.ts
"""

# ---- windowed aggregate oracle (relational/window.py) ----------------------
# Trailing-range window count per key; the engine's composite-searchsorted
# kernel uses an inclusive [ts - 1h, ts] window with side="right" peer
# counting, exactly SQL's RANGE ... CURRENT ROW.
# Range (interval) join (relational/range_join.py): every 'click' event
# opens a half-open 1-hour window; count the same user's events in it.
ORACLES["events_click_window"] = r"""
SELECT c.event_id, c.user_id,
       CAST(COUNT(e2.ts) AS BIGINT) AS n_events
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN events e2
  ON e2.user_id = c.user_id
 AND e2.ts >= c.ts
 AND e2.ts < c.ts + INTERVAL 1 HOUR
GROUP BY 1, 2
"""

ORACLES["events_window"] = r"""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS w_count,
       CAST(SUM(CAST(FLOOR(value) AS BIGINT)) OVER w AS BIGINT) AS w_sum
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
"""

# Per-key top-N (relational/topk.py): each user's top-3 events by value,
# 1-based rank, deterministic (value DESC, event_id ASC) tie-break.
ORACLES["events_top3_by_user"] = r"""
SELECT user_id, event_id, CAST(rn AS BIGINT) AS rnk
FROM (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id ASC
         ) AS rn
  FROM events
)
WHERE rn <= 3
"""

# Pivot/crosstab (relational/pivot.py): per-day event-type count matrix;
# engine column names are n_<category> in sorted category order.
ORACLES["events_pivot"] = r"""
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events
GROUP BY 1
"""

# Connected components (ops/graph.py): the engine runs GENERIC hash-min
# label propagation; the oracle exploits the planted graph's known
# structure (customer->nation->region is a forest of region-rooted
# trees, so a node's component is the min node id within its region
# group) — structural knowledge on the oracle side only.
ORACLES["graph_components"] = r"""
WITH nodes AS (
  SELECT 1000000 + c_custkey AS node, n_regionkey AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 2000000 + n_nationkey, n_regionkey FROM nation
  UNION ALL
  SELECT 3000000 + r_regionkey, r_regionkey FROM region
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(MIN(node) OVER (PARTITION BY rk) AS BIGINT) AS component
FROM nodes
"""

# ---- sketch / corpus-statistics oracles (ops/sketch.py) --------------------
# Tokenization parity: Arrow utf8_split_whitespace and DuckDB
# string_split_regex('\s+') both emit '' at string boundaries; both sides
# drop empty tokens.  ASCII fixture texts are gated by
# test_oracle_fixture_invariants, so char and byte tokenization agree.
ORACLES["top_tokens"] = r"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
WHERE token <> ''
GROUP BY 1
ORDER BY n DESC, token ASC
LIMIT 20
"""

# Corpus bigram top-20.  Both sides drop empty tokens before pairing;
# empties appear only at string boundaries (both split kernels merge
# whitespace runs), so dropping them cannot fabricate adjacency.  DuckDB
# lists are 1-indexed: range(1, len) yields i = 1 .. len-1.
ORACLES["top_bigrams"] = r"""
WITH d AS (
  SELECT list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS l
  FROM documents
), g AS (
  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bigram
  FROM d WHERE len(l) >= 2
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM g
GROUP BY 1
ORDER BY n DESC, bigram ASC
LIMIT 20
"""

# Lexical-diversity counters (type-token ratio as two exact integers;
# documents with no tokens emit no row on either side).
ORACLES["type_token_ratio"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents
)
SELECT doc_id,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok WHERE token <> ''
GROUP BY 1
"""

# Per-language token top-3 (grouped top-k; ties token asc).
ORACLES["lang_top_tokens"] = r"""
WITH tok AS (
  SELECT lang, unnest(string_split_regex(text, '\s+')) AS token FROM documents
), c AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok WHERE token <> '' GROUP BY 1, 2
), r AS (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rn
  FROM c
)
SELECT lang, token, n FROM r WHERE rn <= 3
"""

# Salient term per document: argmax of tf/df (≡ tf·idf with idf = N/df —
# N is constant per corpus so it drops out of the argmax).  The ratio is
# ONE IEEE-double division of exact int64s, bit-identical between numpy
# and CAST(tf AS DOUBLE) / df (NOT tf * 1.0 / df, which DuckDB computes
# in DECIMAL arithmetic); ties broken tf desc, token asc — a total order.
ORACLES["tfidf_top"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents
), tok2 AS (
  SELECT doc_id, token FROM tok WHERE token <> ''
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok2 GROUP BY 1, 2
), df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok2 GROUP BY 1
), ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.tf DESC, tf.token ASC
         ) AS rn
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df FROM ranked WHERE rn = 1
"""

# quantile_disc returns sorted[floor(q * (n-1))] — the engine's
# distributed-histogram kernel replicates that index exactly.
ORACLES["len_quantiles"] = r"""
SELECT * FROM (
  SELECT 10 AS q_pct, CAST(quantile_disc(length(text), 0.10) AS BIGINT) AS val FROM documents
  UNION ALL
  SELECT 25, CAST(quantile_disc(length(text), 0.25) AS BIGINT) FROM documents
  UNION ALL
  SELECT 50, CAST(quantile_disc(length(text), 0.50) AS BIGINT) FROM documents
  UNION ALL
  SELECT 75, CAST(quantile_disc(length(text), 0.75) AS BIGINT) FROM documents
  UNION ALL
  SELECT 90, CAST(quantile_disc(length(text), 0.90) AS BIGINT) FROM documents
) ORDER BY q_pct
"""

# Grouped variant: per-language char-length quantiles (documents carry
# a materialized n_chars column, so both sides read the same ints).
ORACLES["lang_len_quantiles"] = r"""
SELECT lang, q_pct, val FROM (
  SELECT lang, 25 AS q_pct,
         CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS val
  FROM documents GROUP BY lang
  UNION ALL
  SELECT lang, 50, CAST(quantile_disc(n_chars, 0.50) AS BIGINT)
  FROM documents GROUP BY lang
  UNION ALL
  SELECT lang, 75, CAST(quantile_disc(n_chars, 0.75) AS BIGINT)
  FROM documents GROUP BY lang
)
"""

# Per-group exact distinct-token counts (ops/sketch.
# grouped_distinct_tokens) — token-hash-partitioned pair dedup, per-group
# partials, one tiny groupby(group).sum; the grouped companion to
# vocab_distinct.
ORACLES["lang_vocab_distinct"] = r"""
SELECT lang, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct
FROM (SELECT lang, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
WHERE token <> ''
GROUP BY lang
"""

# Grouped bounded gate: exact per-language distinct counts + TRUE
# constants asserting the engine's mergeable per-group HLL lands within
# 2% (the vocab_distinct pattern, grouped — ops/sketch.
# grouped_hll_registers_ds / grouped_hll_distinct).
ORACLES["lang_vocab_hll"] = r"""
SELECT lang, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
       TRUE AS hll_within_2pct
FROM (SELECT lang, unnest(string_split_regex(text, '\s+')) AS token FROM documents)
WHERE token <> ''
GROUP BY lang
"""

# Exact distinct tokens; the engine side ALSO runs its deterministic
# p=14 splitmix64 HyperLogLog and asserts the estimate lands within 2%
# (the TRUE constant here makes the bounded gate hash-checkable, the
# same pattern as the ANN recall gates).
ORACLES["vocab_distinct"] = r"""
SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
       TRUE AS hll_within_2pct
FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
WHERE token <> ''
"""

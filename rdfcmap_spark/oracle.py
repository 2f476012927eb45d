"""DuckDB oracle SQL for the full text->KG pipeline.

Round 1 left the four pipeline-level driver queries (``kg_pipeline_full``,
``kg_canonical_mapping``, ``kg_staged_resume``, ``kg_ttl_roundtrip``)
rows-only; this module closes that gap by re-implementing the *entire*
pipeline — sentence split, mention regexes, X9 normalization, alias
resolution, UUIDv3 entity minting, cardinality grammar, literal typing and
quarantine, identity edges, union-find canonicalization (recursive CTE), and
RDF set semantics with min-provenance — as one self-contained DuckDB query
over the transcripts parquet the Spark query writes to
:data:`TRANSCRIPTS_ORACLE_PATH`.

Everything here is *generated from the same Python constants the Spark
pipeline uses* (regexes, alias rows, unit map, datatype map), so the two
engines cannot silently drift: change a constant and both sides change.
"""

from __future__ import annotations

from rdfcmap_spark import vocab
from rdfcmap_spark.functions.literals import _VALID_LEX
from rdfcmap_spark.ids import uuid_sql
from rdfcmap_spark.operators.linking import resolved_alias_rows
from rdfcmap_spark.operators.mentions import LIT_RE, REL_RE, SENT_SPLIT_RE

#: fixed location the pipeline driver queries write the synthesized
#: transcripts to (overwrite per run), so the oracle reads the same input
TRANSCRIPTS_ORACLE_PATH = "/tmp/rdfcmap_spark_oracle/transcripts"


def _sq(s: str) -> str:
    return s.replace("'", "''")


def norm_c7_sql(expr: str) -> str:
    """The pre-comma steps of the X9 ladder (normalize_label) as SQL: fixed-
    string strips in the same order as the Spark/Python mirrors, then the
    trailing-instance and combined parenthetical regexes."""
    c = expr
    for needle in ["&#10;", "&#xa;", "[", "]", "instance of", "NamedIndividual"]:
        c = f"replace({c}, '{needle}', '')"
    c = f"regexp_replace({c}, '(?i)(instance:[a-zA-Z0-9\\s]+)$', '', 'g')"
    parens = r"\(([A-Z]+_[0-9]{5,7})\)|\(([a-zA-Z\-]+:[a-zA-Z]+)\)"
    c = f"regexp_replace({c}, '{parens}', '', 'g')"
    return f"trim({c})"


def _norm_sql(expr: str) -> str:
    """The full X9 normalization ladder (normalize_label) over a SQL
    expression: :func:`norm_c7_sql` plus comma-list disambiguation preferring
    af* elements, whitespace collapse, and lower."""
    c7 = norm_c7_sql(expr)
    return (
        "lower(trim(regexp_replace("
        f"CASE WHEN len(string_split({c7}, ',')) > 1 "
        f"THEN trim(coalesce("
        f"list_filter(string_split({c7}, ','), p -> lower(trim(p)) LIKE 'af%')[1], "
        f"string_split({c7}, ',')[1])) "
        f"ELSE {c7} END, '\\s+', ' ', 'g')))"
    )


def _dict_values() -> str:
    rows = ", ".join(
        f"('{_sq(label)}', '{_sq(iri)}', '{kind}')" for label, iri, kind in resolved_alias_rows()
    )
    return f"(VALUES {rows}) AS adict(label_norm, resolved_iri, term_kind)"


def _unit_rewrite_sql(obj: str, pred: str) -> str:
    cases = " ".join(
        f"WHEN '{_sq(ind)}' THEN '{_sq(cls)}'"
        for ind, cls in vocab.UNIT_INDIVIDUAL_TO_CLASS.items()
    )
    return (
        f"CASE WHEN {pred} = '{vocab.QUDT_UNIT}' "
        f"THEN (CASE {obj} {cases} ELSE {obj} END) ELSE {obj} END"
    )


def _dt_map_sql(local: str) -> str:
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in vocab.KNOWN_DATATYPES.items())
    return f"(CASE {local} {cases} ELSE '{vocab.XSD_STRING}' END)"


def _lex_valid_sql(local: str, lex: str) -> str:
    cases = " ".join(
        f"WHEN {local} = '{k}' THEN regexp_matches({lex}, '{rx}')"
        for k, rx in _VALID_LEX.items()
    )
    return f"(CASE {cases} ELSE true END)"


def _ent_uuid(conv: str, norm: str) -> str:
    return "'urn:uuid:' || " + uuid_sql(f"'ent|' || {conv} || '|' || {norm}")


def _base_ctes() -> str:
    """CTE chain from the transcripts parquet to all_triples + mapping."""
    dict_values = _dict_values()
    subj_ent = (
        "CASE WHEN sd.term_kind = 'individual' THEN sd.resolved_iri "
        f"ELSE {_ent_uuid('p.conv_id', 'p.subj_norm')} END"
    )
    obj_ent = (
        "CASE WHEN p.obj_norm IS NULL THEN NULL "
        "WHEN od.term_kind = 'individual' THEN od.resolved_iri "
        f"ELSE {_ent_uuid('p.conv_id', 'p.obj_norm')} END"
    )
    card_node = "'urn:uuid:' || " + uuid_sql(
        "'card|' || conv_id || '|' || CAST(turn_idx AS VARCHAR) || '|' || CAST(sent_idx AS VARCHAR)"
    )
    return f"""
tr AS (SELECT * FROM read_parquet('{TRANSCRIPTS_ORACLE_PATH}/*.parquet')),
sent0 AS (
  SELECT conv_id, turn_idx, generate_subscripts(parts, 1) - 1 AS sent_idx, unnest(parts) AS sentence
  FROM (SELECT conv_id, turn_idx, string_split_regex(text, '{SENT_SPLIT_RE}') AS parts FROM tr)
),
sent AS (SELECT * FROM sent0 WHERE trim(sentence) <> ''),
raw AS (
  SELECT conv_id, turn_idx, sent_idx, sentence,
    regexp_extract(sentence, '{LIT_RE}', 1) AS lit_subj,
    regexp_extract(sentence, '{REL_RE}', 1) AS rel_subj
  FROM sent
),
parsed0 AS (
  SELECT conv_id, turn_idx, sent_idx, sentence,
    CASE WHEN lit_subj <> '' THEN 'literal'
         WHEN rel_subj <> '' THEN 'relation'
         ELSE 'none' END AS form,
    CASE WHEN lit_subj <> '' THEN lit_subj
         WHEN rel_subj <> '' THEN rel_subj END AS subj,
    CASE WHEN lit_subj <> '' THEN regexp_extract(sentence, '{LIT_RE}', 2)
         WHEN rel_subj <> '' THEN regexp_extract(sentence, '{REL_RE}', 2) END AS phrase,
    CASE WHEN lit_subj = '' AND rel_subj <> '' THEN regexp_extract(sentence, '{REL_RE}', 3) END AS card,
    CASE WHEN lit_subj = '' AND rel_subj <> ''
         THEN trim(regexp_replace(regexp_extract(sentence, '{REL_RE}', 4), '^\\[\\s*|\\s*\\]$', '', 'g')) END AS obj,
    CASE WHEN lit_subj = '' AND rel_subj <> ''
         THEN starts_with(regexp_extract(sentence, '{REL_RE}', 4), '[') ELSE false END AS obj_bnode,
    CASE WHEN lit_subj <> '' THEN regexp_extract(sentence, '{LIT_RE}', 3) END AS lex,
    CASE WHEN lit_subj <> '' THEN regexp_extract(sentence, '{LIT_RE}', 4) END AS dt_local
  FROM raw
),
parsed AS (
  SELECT *, {_norm_sql('subj')} AS subj_norm, {_norm_sql('obj')} AS obj_norm,
         {_norm_sql('phrase')} AS phrase_norm
  FROM parsed0 WHERE form <> 'none'
),
adict AS (SELECT * FROM {dict_values}),
linked AS (
  SELECT p.*,
    sd.resolved_iri AS subj_res, sd.term_kind AS subj_kind,
    od.resolved_iri AS obj_res, od.term_kind AS obj_kind_term,
    pd.resolved_iri AS pred_iri,
    {subj_ent} AS subj_entity,
    {obj_ent} AS obj_entity,
    CASE WHEN od.term_kind = 'individual' THEN 'iri'
         WHEN p.obj_bnode THEN 'bnode' ELSE 'iri' END AS obj_kind
  FROM parsed p
  LEFT JOIN adict sd ON sd.label_norm = p.subj_norm
  LEFT JOIN adict od ON od.label_norm = p.obj_norm
  LEFT JOIN (SELECT * FROM adict WHERE term_kind IN ('objectProperty', 'datatypeProperty')) pd
    ON pd.label_norm = p.phrase_norm
),
ment AS (
  SELECT conv_id, subj_norm AS norm, subj AS surface, subj_res AS res,
         subj_kind AS kind, subj_entity AS eid FROM linked
  UNION ALL
  SELECT conv_id, obj_norm, obj, obj_res, obj_kind_term, obj_entity
  FROM linked WHERE form = 'relation' AND obj_norm IS NOT NULL
),
ement AS (SELECT * FROM ment WHERE norm <> '' AND (kind IS NULL OR kind <> 'individual')),
ent_triples AS (
  SELECT eid AS subj, '{vocab.RDF_TYPE}' AS pred, 'iri' AS obj_kind,
         '{vocab.OWL_NAMED_INDIVIDUAL}' AS obj_iri, CAST(NULL AS VARCHAR) AS obj_lexical,
         CAST(NULL AS VARCHAR) AS obj_datatype, conv_id, CAST(NULL AS INTEGER) AS turn_idx
  FROM ement
  UNION ALL
  SELECT eid, '{vocab.DCT_TITLE}', 'literal', NULL, trim(surface), '{vocab.XSD_STRING}',
         conv_id, NULL FROM ement
  UNION ALL
  SELECT eid, '{vocab.RDF_TYPE}', 'iri', res, NULL, NULL, conv_id, NULL
  FROM ement WHERE res IS NOT NULL
),
rel AS (SELECT * FROM linked WHERE form = 'relation' AND obj_entity IS NOT NULL),
sameas AS (
  SELECT subj_entity AS a, obj_entity AS b FROM rel WHERE pred_iri = '{vocab.OWL_SAME_AS}'
),
rel_main AS (SELECT * FROM rel WHERE pred_iri IS NULL OR pred_iri <> '{vocab.OWL_SAME_AS}'),
rel_triples AS (
  SELECT subj_entity AS subj, coalesce(pred_iri, '{vocab.SKOS_RELATED}') AS pred,
         obj_kind, {_unit_rewrite_sql('obj_entity', 'pred_iri')} AS obj_iri,
         CAST(NULL AS VARCHAR) AS obj_lexical, CAST(NULL AS VARCHAR) AS obj_datatype,
         conv_id, turn_idx
  FROM rel_main
),
with_card0 AS (
  SELECT *, trim(replace(card, '=', '')) AS cc
  FROM rel_main WHERE card IS NOT NULL AND card <> '' AND pred_iri IS NOT NULL
),
with_card AS (
  SELECT *,
    CASE WHEN regexp_matches(cc, '[\\[\\]]') THEN NULL
         WHEN regexp_matches(cc, '^[0-9]+$') THEN '{vocab.AFV_EXACT_CARDINALITY}'
         WHEN regexp_matches(cc, '^>[0-9]+$') THEN '{vocab.AFV_MIN_CARDINALITY}'
         WHEN regexp_matches(cc, '^<[0-9]+$') THEN '{vocab.AFV_MAX_CARDINALITY}'
         WHEN regexp_matches(cc, '^[0-9]+[\\s,]+[0-9]+$') THEN '{vocab.AFV_INTERVAL_CARDINALITY}'
         ELSE NULL END AS card_type,
    CASE WHEN regexp_matches(cc, '[\\[\\]]') THEN NULL
         WHEN regexp_matches(cc, '^[0-9]+$') THEN cc
         WHEN regexp_matches(cc, '^>[0-9]+$') THEN regexp_extract(cc, '^>([0-9]+)$', 1)
         WHEN regexp_matches(cc, '^[0-9]+[\\s,]+[0-9]+$') THEN regexp_extract(cc, '^([0-9]+)[\\s,]+([0-9]+)$', 1)
         ELSE NULL END AS card_min,
    CASE WHEN regexp_matches(cc, '[\\[\\]]') THEN NULL
         WHEN regexp_matches(cc, '^[0-9]+$') THEN cc
         WHEN regexp_matches(cc, '^<[0-9]+$') THEN regexp_extract(cc, '^<([0-9]+)$', 1)
         WHEN regexp_matches(cc, '^[0-9]+[\\s,]+[0-9]+$') THEN regexp_extract(cc, '^([0-9]+)[\\s,]+([0-9]+)$', 2)
         ELSE NULL END AS card_max,
    {card_node} AS card_node
  FROM with_card0
),
card_ok AS (SELECT * FROM with_card WHERE card_type IS NOT NULL),
card_triples AS (
  SELECT card_node AS subj, '{vocab.RDF_TYPE}' AS pred, 'iri' AS obj_kind, card_type AS obj_iri,
         CAST(NULL AS VARCHAR) AS obj_lexical, CAST(NULL AS VARCHAR) AS obj_datatype, conv_id, turn_idx
  FROM card_ok
  UNION ALL
  SELECT card_node, '{vocab.AFV_ON_PROPERTY}', 'iri', pred_iri, NULL, NULL, conv_id, turn_idx FROM card_ok
  UNION ALL
  SELECT subj_entity, '{vocab.AFV}hasCardinality', 'bnode', card_node, NULL, NULL, conv_id, turn_idx FROM card_ok
  UNION ALL
  SELECT card_node, '{vocab.AFV_MIN_VALUE}', 'literal', NULL, card_min, '{vocab.XSD_INTEGER}', conv_id, turn_idx
  FROM card_ok WHERE card_min IS NOT NULL
  UNION ALL
  SELECT card_node, '{vocab.AFV_MAX_VALUE}', 'literal', NULL, card_max, '{vocab.XSD_INTEGER}', conv_id, turn_idx
  FROM card_ok WHERE card_max IS NOT NULL
),
lit AS (
  SELECT *, coalesce(pred_iri, '{vocab.SKOS_RELATED}') AS lpred,
         {_dt_map_sql('dt_local')} AS obj_datatype,
         {_lex_valid_sql('dt_local', 'lex')} AS lex_valid
  FROM linked WHERE form = 'literal'
),
lit_triples AS (
  SELECT subj_entity AS subj, lpred AS pred, 'literal' AS obj_kind,
         CAST(NULL AS VARCHAR) AS obj_iri, lex AS obj_lexical, obj_datatype, conv_id, turn_idx
  FROM lit WHERE lex_valid
),
idents AS (
  SELECT subj_entity AS entity_id, lex AS value
  FROM lit WHERE lpred = '{vocab.DCT}identifier' AND lex_valid
),
ihub AS (SELECT value, min(entity_id) AS hub FROM idents GROUP BY value),
star AS (
  SELECT h.hub AS src, i.entity_id AS dst
  FROM idents i JOIN ihub h USING (value) WHERE i.entity_id <> h.hub
),
edges0 AS (SELECT a AS src, b AS dst FROM sameas UNION ALL SELECT src, dst FROM star),
und AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
cnodes AS (SELECT DISTINCT src AS node FROM und),
reach(node, comp) AS (
  SELECT node, node FROM cnodes
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN und e ON e.src = r.node
),
mapping AS (SELECT node AS entity_id, min(comp) AS canonical_id FROM reach GROUP BY node),
all_triples AS (
  SELECT * FROM ent_triples
  UNION ALL SELECT * FROM rel_triples
  UNION ALL SELECT * FROM card_triples
  UNION ALL SELECT * FROM lit_triples
),
rew AS (
  -- kind/identity invariant (mirrors rewrite_triples): a bnode-kind object
  -- whose canonical node is NAMED (non-skolem) becomes 'iri'
  SELECT coalesce(ms.canonical_id, t.subj) AS subj, t.pred,
         CASE WHEN t.obj_kind = 'bnode'
               AND NOT starts_with(coalesce(mo.canonical_id, t.obj_iri), 'urn:uuid:')
              THEN 'iri' ELSE t.obj_kind END AS obj_kind,
         coalesce(mo.canonical_id, t.obj_iri) AS obj_iri, t.obj_lexical, t.obj_datatype,
         t.conv_id, t.turn_idx
  FROM all_triples t
  LEFT JOIN mapping ms ON ms.entity_id = t.subj
  LEFT JOIN mapping mo ON mo.entity_id = t.obj_iri
),
final AS (
  SELECT subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype, conv_id, turn_idx
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype
      ORDER BY conv_id ASC NULLS FIRST, turn_idx ASC NULLS FIRST
    ) AS rn
    FROM rew
  ) WHERE rn = 1
)"""


def pipeline_full_sql() -> str:
    """Oracle for kg_pipeline_full / kg_staged_resume (full triples table
    with min-provenance columns)."""
    return "WITH RECURSIVE " + _base_ctes() + "\nSELECT * FROM final"


def ttl_roundtrip_sql() -> str:
    """Oracle for kg_ttl_roundtrip: the same triple set with provenance
    nulled (write_ttl does not serialize conv_id/turn_idx; read_ttl restores
    them as NULL). Losslessness of the 6-column key is the pytest's job;
    here we assert the *parsed-back content* equals the pipeline's output."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + "\nSELECT subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype, "
        "CAST(NULL AS VARCHAR) AS conv_id, CAST(NULL AS INTEGER) AS turn_idx FROM final"
    )


def anonymize_sql() -> str:
    """Oracle for kg_anonymize: the useBlankNodes output transform
    (`transformToAnonymousInstances:2482-2580`) over the pipeline triples —
    urn:uuid instance subjects become ``_:b<uuid>`` labels, instance-iri
    objects flip kind to bnode, owl:NamedIndividual typing rows drop."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + """
SELECT CASE WHEN subj LIKE 'urn:uuid:%'
            THEN '_:b' || substr(subj, 10) ELSE subj END AS subj,
       pred,
       CASE WHEN obj_kind = 'iri' AND obj_iri LIKE 'urn:uuid:%'
            THEN 'bnode' ELSE obj_kind END AS obj_kind,
       obj_iri, obj_lexical, obj_datatype, conv_id, turn_idx
FROM final
WHERE NOT (subj LIKE 'urn:uuid:%'
           AND pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
           AND obj_iri = 'http://www.w3.org/2002/07/owl#NamedIndividual')
"""
    )


def nquads_roundtrip_sql() -> str:
    """Oracle for kg_nquads_roundtrip: N-Quads preserves conv_id (the graph
    label) but has no slot for turn_idx (restored as NULL)."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + "\nSELECT subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype, "
        "conv_id, CAST(NULL AS INTEGER) AS turn_idx FROM final"
    )


def canonical_mapping_sql() -> str:
    """Oracle for kg_canonical_mapping: the union-find fixed point over
    sameAs + shared-identifier star edges, as a recursive CTE."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + "\nSELECT entity_id, canonical_id FROM mapping"
    )


def entity_pmi_sql() -> str:
    """Oracle for chat_entity_pmi: conversation-level entity presence from
    the shared ``ment`` CTE (entity key = resolved IRI else normalized
    surface), pair counts via conv_id self-join, PMI over integer counts."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + """,
pents AS (SELECT DISTINCT conv_id, coalesce(res, norm) AS ent FROM ment WHERE norm <> ''),
pg AS (SELECT count(DISTINCT conv_id) AS n_convs FROM pents),
pec AS (SELECT ent, count(*) AS n_e FROM pents GROUP BY ent),
ppairs AS (
  SELECT a.ent AS ent_a, b.ent AS ent_b, count(*) AS n_pair
  FROM pents a JOIN pents b ON a.conv_id = b.conv_id AND a.ent < b.ent
  GROUP BY a.ent, b.ent
)
SELECT ent_a, ent_b, CAST(n_pair AS BIGINT) AS n_pair,
       CAST(ea.n_e AS BIGINT) AS n_a, CAST(eb.n_e AS BIGINT) AS n_b,
       round(ln(CAST(n_pair * n_convs AS DOUBLE) / CAST(ea.n_e * eb.n_e AS DOUBLE)), 6) AS pmi
FROM ppairs
JOIN pec ea ON ea.ent = ppairs.ent_a
JOIN pec eb ON eb.ent = ppairs.ent_b
CROSS JOIN pg
"""
    )


#: turn-indexed mention CTEs shared by the timeline / coref oracles —
#: mirrors mentions.mention_surfaces (subject rows for every parsed form,
#: object rows for relations, norm <> '' filter, (sent_idx, pos) order key)
#: + the transcripts._linked_mentions entity key coalesce(res, norm)
_CMENT_CTES = """
cment AS (
  SELECT conv_id, turn_idx, sent_idx, 0 AS pos, subj_norm AS norm, subj_res AS res FROM linked
  UNION ALL
  SELECT conv_id, turn_idx, sent_idx, 1, obj_norm, obj_res FROM linked
  WHERE form = 'relation' AND obj_norm IS NOT NULL
),
cm AS (SELECT *, coalesce(res, norm) AS ent FROM cment WHERE norm <> '')
"""


def entity_timeline_sql() -> str:
    """Oracle for chat_entity_timeline: per-entity first/last mention
    timestamp + mention breadth, from the shared turn-indexed mention CTE
    joined back to the turns for ts."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + ","
        + _CMENT_CTES
        + """,
ct AS (
  SELECT cm.conv_id, cm.turn_idx, cm.ent, tr.ts
  FROM cm JOIN tr ON tr.conv_id = cm.conv_id AND tr.turn_idx = cm.turn_idx
)
SELECT ent, min(ts) AS first_ts, max(ts) AS last_ts,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(DISTINCT (conv_id, turn_idx)) AS BIGINT) AS n_turns
FROM ct GROUP BY ent
"""
    )


def pronoun_antecedents_sql() -> str:
    """Oracle for chat_pronoun_coref: most-recent-prior-turn entity binding
    for pronoun-bearing turns (window last_value IGNORE NULLS mirror of the
    Spark window; the per-turn recency reduce is the same zero-padded
    single-string max)."""
    from rdfcmap_spark.operators.transcripts import PRONOUN_RE

    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + ","
        + _CMENT_CTES
        + f""",
cmx AS (
  SELECT conv_id, turn_idx,
         max(lpad(CAST(sent_idx AS VARCHAR), 6, '0') || CAST(pos AS VARCHAR) || '|' || ent) AS enc
  FROM cm GROUP BY conv_id, turn_idx
),
pt AS (
  SELECT tr.conv_id, tr.turn_idx,
         len(regexp_extract_all(lower(tr.text), '{PRONOUN_RE}')) AS n_pronouns,
         cmx.enc
  FROM tr LEFT JOIN cmx USING (conv_id, turn_idx)
),
pw AS (
  SELECT conv_id, turn_idx, n_pronouns,
         last_value(enc IGNORE NULLS) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_enc
  FROM pt
)
SELECT conv_id, turn_idx, CAST(n_pronouns AS BIGINT) AS n_pronouns,
       substr(prev_enc, 9) AS antecedent
FROM pw WHERE n_pronouns > 0
"""
    )


def triple_support_sql() -> str:
    """Oracle for kg_triple_support: distinct-provenance evidence counts
    over the pre-dedup canonical-rewrite stream (the ``rew`` CTE)."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + """
SELECT subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype,
       CAST(count(DISTINCT (conv_id, coalesce(turn_idx, -1))) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM rew
GROUP BY subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype
"""
    )


def triple_timeline_sql() -> str:
    """Oracle for kg_triple_timeline: per canonical triple, min/max
    assertion timestamp (exact integer microseconds via epoch_us over the
    transcripts CTE) + distinct-provenance turn count, over the pre-dedup
    canonical-rewrite stream (the ``rew`` CTE) — provenance deduped BEFORE
    the turn join, mirroring the Spark plan."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + """,
prov AS (
  SELECT DISTINCT subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype, conv_id, turn_idx
  FROM rew
)
SELECT p.subj, p.pred, p.obj_kind, p.obj_iri, p.obj_lexical, p.obj_datatype,
       CAST(min(epoch_us(t.ts)) AS BIGINT) AS first_asserted_us,
       CAST(max(epoch_us(t.ts)) AS BIGINT) AS last_asserted_us,
       CAST(count(*) AS BIGINT) AS n_turns
FROM prov p LEFT JOIN tr t ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
GROUP BY 1, 2, 3, 4, 5, 6
"""
    )


def rdfs_entail_sql() -> str:
    """Oracle for kg_rdfs_entail: rdfs9 type completion over the pipeline
    triples through the built-in subclass hierarchy (recursive closure),
    min-provenance per inferred (subj, class) with the source class as the
    final tie-break (total order: the pipeline triples are set-deduped)."""
    edges = ", ".join(f"('{c}', '{p}')" for c, p in vocab.SUBCLASS_EDGES)
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + f""",
sce(child, parent) AS (VALUES {edges}),
scl(src, dst) AS (
  SELECT child, parent FROM sce
  UNION
  SELECT s.src, e.parent FROM scl s JOIN sce e ON e.child = s.dst
),
etyped AS (
  SELECT subj, obj_iri, conv_id, turn_idx FROM final
  WHERE pred = '{vocab.RDF_TYPE}' AND obj_kind = 'iri'
),
einf AS (
  SELECT t.subj, t.obj_iri AS src_class, c.dst AS anc, t.conv_id, t.turn_idx
  FROM etyped t JOIN scl c ON c.src = t.obj_iri
),
enew AS (
  SELECT i.* FROM einf i
  WHERE NOT EXISTS (SELECT 1 FROM etyped t WHERE t.subj = i.subj AND t.obj_iri = i.anc)
),
er AS (
  SELECT *, row_number() OVER (
    PARTITION BY subj, anc
    ORDER BY conv_id ASC NULLS FIRST, turn_idx ASC NULLS FIRST, src_class ASC
  ) AS rn
  FROM enew
)
SELECT subj, '{vocab.RDF_TYPE}' AS pred, 'iri' AS obj_kind, anc AS obj_iri,
       CAST(NULL AS VARCHAR) AS obj_lexical, CAST(NULL AS VARCHAR) AS obj_datatype,
       conv_id, turn_idx
FROM er WHERE rn = 1"""
    )


def turn_sft_pairs_sql() -> str:
    """Oracle for kg_turn_sft_pairs: per-turn sorted canonical-triple
    serialization joined back to the turn text, over the pre-dedup
    canonical-rewrite stream (the ``rew`` CTE; both engines sort the
    token list in binary UTF-8 order)."""
    return (
        "WITH RECURSIVE "
        + _base_ctes()
        + """,
sft_prov AS (
  SELECT DISTINCT subj, pred, obj_kind, obj_iri, obj_lexical, obj_datatype,
         conv_id, turn_idx
  FROM rew
),
sft_tok AS (
  SELECT conv_id, turn_idx,
         subj || '|' || pred || '|' ||
         CASE WHEN obj_kind = 'literal'
              THEN '"' || obj_lexical || '"^^' || obj_datatype
              ELSE obj_iri END AS token
  FROM sft_prov
),
sft AS (
  SELECT conv_id, turn_idx,
         array_to_string(list_sort(list(token)), ' ; ') AS target,
         CAST(count(*) AS BIGINT) AS n_triples
  FROM sft_tok GROUP BY conv_id, turn_idx
)
SELECT s.conv_id, s.turn_idx, t.text AS prompt, s.target, s.n_triples
FROM sft s JOIN tr t ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
"""
    )

"""Stage 1 — mention detection over turn text (SURVEY.md §3.1 stage 3).

The reference unmarshals structured CXL into concept/link/connection lists
(`Cmap2TurtleConverter.java:1341-1858`); our input is free text, so this stage
recovers the same structures from the planted grammar: ``«mention»`` tokens
(french-quote style, cf. the long-comment token normalization at
`Cmap2TurtleConverter.java:758-761`), linking phrases, optional cardinality
suffixes (`CmapUtil.java:71`), and ``"v"^^xsd:t`` typed literals
(`:2416-2463`).

Implementation notes (scale): pure built-in expressions — ``split`` +
``posexplode`` + ``regexp_extract`` — i.e. one narrow, fully codegen'd map
stage with **zero shuffles and zero Python**. Filters/projections push into
the parquet scan; at 100 TB this stage is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfcmap_spark.functions.normalize import normalize_label

#: sentence boundary: generator joins sentences with ". " and ends with "."
SENT_SPLIT_RE = r"\.\s+|\.$"

#: literal sentence: «subj» phrase "lex"^^xsd:t
LIT_RE = r'«([^»]+)»\s+([a-z][a-z ]*?)\s+"([^"]*)"\^\^xsd:([A-Za-z]+)'
#: relation sentence: «subj» phrase [card] «obj»   (card optional; digits can
#: never be swallowed by the phrase group, which admits only [a-z ])
REL_RE = r"«([^»]+)»\s+([a-z][a-z ]*?)(?:\s+([\[\]=<>]*[0-9]+(?:[\s,]+[0-9]+)?[\[\]]?))?\s+«([^»]+)»"


#: group separator for the single-pass multi-group extract (never occurs in
#: transcript text; a pathological \x01 in input only misparses that sentence)
_SEP = "\x01"


def _extract4(col, regex: str):
    """All 4 capture groups of ``regex`` in ONE regex pass, or null if no
    match.

    ``regexp_extract(col, re, i)`` re-runs the full match per group — the
    round-1 plan matched each sentence ~10x. Here the sentence is rewritten
    once to ``\\x01 g1 \\x01 g2 \\x01 g3 \\x01 g4`` via a single
    ``regexp_replace`` of ``(?s).*?RE.*`` (the lazy prefix pins RE at its
    leftmost match, identical to find()-style extract semantics; an
    unmatched sentence passes through unchanged and is detected by the
    missing marker). One regex scan + one split instead of ~5 scans.
    """
    repl = _SEP + _SEP.join(f"${i}" for i in range(1, 5))
    marked = F.regexp_replace(col, "(?s).*?" + regex + ".*", repl)
    return F.when(
        marked.startswith(_SEP),
        F.split(F.substring(marked, 2, 2_000_000_000), _SEP),
    )


def extract_sentences(transcripts: DataFrame) -> DataFrame:
    """transcripts -> one row per parsed sentence with raw structure fields.

    Output columns: conv_id, turn_idx, sent_idx, form(relation|literal|none),
    subj, phrase, card, obj, obj_bnode, lex, dt_local.
    """
    sent = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.split(F.col("text"), SENT_SPLIT_RE)).alias("sent_idx", "sentence"),
        )
        .filter(F.length(F.trim(F.col("sentence"))) > 0)
    )
    # arrays materialized as real columns so every derived field reads the
    # SAME one-pass match result (never re-running the regex).
    #
    # Both heavy regexes are gated behind cheap scans (CaseWhen branches are
    # lazily evaluated per row in codegen, so a skipped branch costs zero):
    # * LIT_RE cannot match without the contiguous substring `"^^xsd:`
    #   (closing quote + datatype marker), so `contains` is an EXACT gate;
    # * rg's value is only ever read when lg is null (literal wins the form
    #   ladder), so computing it conditionally is output-identical.
    # Net: one heavy regex pass per sentence instead of two — measured
    # win on the extraction stage, and fewer allocations per task helps the
    # 32-thread shared-cache contention (BENCH.md scaling notes).
    # * both grammars REQUIRE a «mention»: a sentence with no '«' can match
    #   neither, so the mention gate is exact too. On the synthetic corpus
    #   every sentence carries a planted structure (gate is a no-op), but on
    #   real transcripts most prose sentences have no mention and this skips
    #   the REL_RE NFA entirely for them — the majority of input at 10^12
    #   turns.
    mention_gate = F.col("sentence").contains("«")
    lit_gate = F.col("sentence").contains('"^^xsd:')
    g = sent.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "sentence",
        F.when(mention_gate & lit_gate, _extract4(F.col("sentence"), LIT_RE)).alias("lg"),
        mention_gate.alias("has_mention"),
    )
    g = g.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "lg",
        F.when(
            F.col("lg").isNull() & F.col("has_mention"),
            _extract4(F.col("sentence"), REL_RE),
        ).alias("rg"),
    )
    form = (
        F.when(F.col("lg").isNotNull(), F.lit("literal"))
        .when(F.col("rg").isNotNull(), F.lit("relation"))
        .otherwise(F.lit("none"))
    )
    obj_raw = F.col("rg")[3]
    return g.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        form.alias("form"),
        F.when(form == "literal", F.col("lg")[0]).when(form == "relation", F.col("rg")[0]).alias("subj"),
        F.when(form == "literal", F.col("lg")[1])
        .when(form == "relation", F.col("rg")[1])
        .alias("phrase"),
        F.when(form == "relation", F.col("rg")[2]).alias("card"),
        F.when(form == "relation", F.trim(F.regexp_replace(obj_raw, r"^\[\s*|\s*\]$", ""))).alias("obj"),
        F.when(form == "relation", obj_raw.startswith("[")).otherwise(F.lit(False)).alias("obj_bnode"),
        F.when(form == "literal", F.col("lg")[2]).alias("lex"),
        F.when(form == "literal", F.col("lg")[3]).alias("dt_local"),
    ).filter(F.col("form") != "none")


def mention_surfaces(sentences: DataFrame) -> DataFrame:
    """Every entity-position mention (subject + non-literal object), with the
    X9-normalized surface used as the linking key (J2). ``pos`` is the
    in-sentence mention order (subject 0, object 1) so (sent_idx, pos) is a
    total within-turn mention order for recency-based consumers
    (:func:`rdfcmap_spark.operators.transcripts.pronoun_antecedents`).
    """
    subj = sentences.select(
        "conv_id", "turn_idx", "sent_idx",
        F.col("subj").alias("surface"),
        F.lit(False).alias("is_bnode"),
        F.lit(0).alias("pos"),
    )
    obj = sentences.filter(F.col("form") == "relation").select(
        "conv_id", "turn_idx", "sent_idx",
        F.col("obj").alias("surface"),
        F.col("obj_bnode").alias("is_bnode"),
        F.lit(1).alias("pos"),
    )
    return (
        subj.unionByName(obj)
        .withColumn("surface_norm", normalize_label(F.col("surface")))
        .filter(F.col("surface_norm") != "")
    )

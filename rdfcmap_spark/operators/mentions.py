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
    lit_subj = F.regexp_extract("sentence", LIT_RE, 1)
    rel_subj = F.regexp_extract("sentence", REL_RE, 1)
    form = (
        F.when(lit_subj != "", F.lit("literal"))
        .when(rel_subj != "", F.lit("relation"))
        .otherwise(F.lit("none"))
    )
    obj_raw = F.regexp_extract("sentence", REL_RE, 4)
    return sent.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        form.alias("form"),
        F.when(form == "literal", lit_subj).when(form == "relation", rel_subj).alias("subj"),
        F.when(form == "literal", F.regexp_extract("sentence", LIT_RE, 2))
        .when(form == "relation", F.regexp_extract("sentence", REL_RE, 2))
        .alias("phrase"),
        F.when(form == "relation", F.regexp_extract("sentence", REL_RE, 3)).alias("card"),
        F.when(form == "relation", F.trim(F.regexp_replace(obj_raw, r"^\[\s*|\s*\]$", ""))).alias("obj"),
        F.when(form == "relation", obj_raw.startswith("[")).otherwise(F.lit(False)).alias("obj_bnode"),
        F.when(form == "literal", F.regexp_extract("sentence", LIT_RE, 3)).alias("lex"),
        F.when(form == "literal", F.regexp_extract("sentence", LIT_RE, 4)).alias("dt_local"),
    ).filter(F.col("form") != "none")


def mention_surfaces(sentences: DataFrame) -> DataFrame:
    """Every entity-position mention (subject + non-literal object), with the
    X9-normalized surface used as the linking key (J2).
    """
    subj = sentences.select(
        "conv_id", "turn_idx", "sent_idx",
        F.col("subj").alias("surface"),
        F.lit(False).alias("is_bnode"),
    )
    obj = sentences.filter(F.col("form") == "relation").select(
        "conv_id", "turn_idx", "sent_idx",
        F.col("obj").alias("surface"),
        F.col("obj_bnode").alias("is_bnode"),
    )
    return (
        subj.unionByName(obj)
        .withColumn("surface_norm", normalize_label(F.col("surface")))
        .filter(F.col("surface_norm") != "")
    )

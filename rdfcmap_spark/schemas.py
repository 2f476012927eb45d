"""Columnar schemas for the pipeline (SURVEY.md §1.3).

The reference's dynamic Jena ``Model`` becomes a fixed-schema ``triples``
DataFrame with set semantics maintained by ``dropDuplicates`` (the reference
relies on Jena Model set semantics, observable in `util/CmapUtil.java:450-455`).
Literals keep their lexical form + datatype IRI because RDF literal equality
is (lexical, datatype) — a typed column would conflate "1.0" and "1.00"
(`Cmap2TurtleConverter.java:2416-2463`).

Language-tagged literals (``"label"@en``): RDF 1.1 literal identity is
(lexical, datatype, language), and Jena preserves tags across round trips.
The tag folds into ``obj_datatype`` as ``rdf:langString@<tag>`` — one column
carries the full identity, the 8-column schema stays stable, and the tag
participates in every set-semantics dedup key for free (TRIPLE_KEY includes
obj_datatype). The Turtle/RDF-XML readers and the TTL sink/source all encode
and decode this fold (`sources/turtle.py`, `sources/rdfxml.py`,
`sources/ttl.py`).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("surface", T.StringType(), True),        # raw surface form
        T.StructField("surface_norm", T.StringType(), True),   # X9-normalized
        T.StructField("kind", T.StringType(), True),           # subject|object|predicate|literal
        T.StructField("obj_lexical", T.StringType(), True),    # literal objects
        T.StructField("obj_datatype", T.StringType(), True),
        T.StructField("cardinality", T.StringType(), True),    # raw suffix e.g. "=1", ">2"
    ]
)

ALIAS_DICT = T.StructType(
    [
        T.StructField("iri", T.StringType(), False),
        T.StructField("prefix", T.StringType(), False),
        T.StructField("label_norm", T.StringType(), False),
        T.StructField("label_kind", T.StringType(), False),    # prefLabel | rdfsLabel
        T.StructField("term_kind", T.StringType(), False),     # class|individual|objectProperty|datatypeProperty
        T.StructField("is_deprecated", T.BooleanType(), False),
        T.StructField("replaced_by", T.StringType(), True),
        T.StructField("ns_priority", T.IntegerType(), False),  # tie-break (RdfUtil.java:449-529 preference)
    ]
)

ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),     # urn:uuid:<uuid5>
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("surface_norm", T.StringType(), True),
        T.StructField("canonical_iri", T.StringType(), True),  # resolved class IRI or null
        T.StructField("is_resolved", T.BooleanType(), False),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_kind", T.StringType(), False),      # iri | bnode | literal
        T.StructField("obj_iri", T.StringType(), True),
        T.StructField("obj_lexical", T.StringType(), True),
        T.StructField("obj_datatype", T.StringType(), True),
        # provenance / lineage (excluded from P/R compares)
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
    ]
)

TRIPLE_KEY = ["subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype"]

"""Typed-literal parsing (SURVEY.md X12).

Reference: labels of literal nodes look like ``"7.5"^^xsd:double``; the six
known datatypes are parsed, anything else falls back to ``xsd:string`` with a
warning (`Cmap2TurtleConverter.replaceLiteralNodes:2414-2463`). RDF equality
is (lexical form, datatype IRI), so we keep the lexical string verbatim and
record the resolved datatype IRI — we never cast in the triples table.

A ``valid`` flag marks lexical forms that would fail the reference's Java
parse (Double.parseDouble etc.) so downstream can quarantine instead of
aborting the job (the reference exits the JVM on bad input; at 10^12-turn
scale a poison row must not kill the pipeline).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdfcmap_spark.vocab import KNOWN_DATATYPES, XSD_STRING

LITERAL_RE = r'^"(.*)"\^\^xsd:([A-Za-z]+)$'

_VALID_LEX = {
    "double": r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$",
    "integer": r"^[+-]?[0-9]+$",
    "boolean": r"^(true|false|True|False|TRUE|FALSE)$",
    "dateTime": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$",
    "dateTimeStamp": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})$",
}


def parse_literal_py(token: str) -> tuple[str, str] | None:
    """(lexical, datatype_iri) or None if not a typed-literal token."""
    m = re.match(LITERAL_RE, token)
    if not m:
        return None
    lexical, local = m.group(1), m.group(2)
    dt = KNOWN_DATATYPES.get(local, XSD_STRING)  # unknown -> string fallback
    return lexical, dt


def literal_cols(token: Column) -> tuple[Column, Column, Column]:
    """(obj_lexical, obj_datatype, valid) Columns from a `"v"^^xsd:t` token."""
    lex = F.regexp_extract(token, LITERAL_RE, 1)
    local = F.regexp_extract(token, LITERAL_RE, 2)
    is_lit = token.rlike(LITERAL_RE)
    dt_map = F.create_map(
        *[F.lit(x) for kv in KNOWN_DATATYPES.items() for x in kv]
    )
    dt = F.when(is_lit, F.coalesce(dt_map[local], F.lit(XSD_STRING)))
    valid = F.lit(True)
    for local_name, rx in _VALID_LEX.items():
        valid = valid & F.when(local == local_name, lex.rlike(rx)).otherwise(F.lit(True))
    return (
        F.when(is_lit, lex),
        dt,
        F.when(is_lit, valid),
    )

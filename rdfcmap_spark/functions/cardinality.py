"""Cardinality grammar (SURVEY.md X3).

Reference grammar: labels may end in a cardinality token — the 13 patterns of
`cmap/cardinality/CardinalityPattern.java:19-31`, split off the label by
`util/CmapUtil.java:71` (CARDINALITY_PATTERN) and classified by
`CmapUtil.determineCardinality:809-876`:

* ``""``            -> MinCardinality 0 (default)
* ``=N`` / ``N``    -> ExactCardinality N      (``=`` is stripped first)
* ``>N``            -> MinCardinality N
* ``<N``            -> MaxCardinality N
* ``N,M`` / ``N M`` -> IntervalCardinality [N, M]
* ``[``/``]`` qualified forms -> unsupported (reference throws
  IllegalStateException `CmapUtil.java:824`; we classify as ``unknown`` and
  quarantine instead of dying — SURVEY.md §4 spill/memory row).

Note: the reference's interval branch reads regex groups 1 and 2 of
``^(([0-9]+)[\\s,]+([0-9]+))$`` as (min, max), which yields min = the whole
match — a latent bug. We implement the evident intent (min = first number,
max = second).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdfcmap_spark.vocab import (
    AFV_EXACT_CARDINALITY,
    AFV_INTERVAL_CARDINALITY,
    AFV_MAX_CARDINALITY,
    AFV_MIN_CARDINALITY,
)

#: one regex that captures every supported token (applied AFTER '=' strip)
CARD_TOKEN_RE = r"^\s*(?:([0-9]+)\s*$|>([0-9]+)\s*$|<([0-9]+)\s*$|([0-9]+)[\s,]+([0-9]+)\s*$)"


@dataclass(frozen=True)
class Cardinality:
    card_type: str  # IRI of the afv cardinality class
    card_min: str | None
    card_max: str | None


def classify_py(card: str | None) -> Cardinality | None:
    """Python mirror of determineCardinality (None = unknown/quarantine)."""
    if card is None:
        card = ""
    card = card.replace("=", "").strip()
    if card == "":
        return Cardinality(AFV_MIN_CARDINALITY, "0", None)
    if "[" in card or "]" in card:
        return None  # qualified cardinality unsupported (CmapUtil.java:824)
    m = re.match(r"^>([0-9]+)$", card)
    if m:
        return Cardinality(AFV_MIN_CARDINALITY, m.group(1), None)
    m = re.match(r"^<([0-9]+)$", card)
    if m:
        return Cardinality(AFV_MAX_CARDINALITY, None, m.group(1))
    m = re.match(r"^([0-9]+)$", card)
    if m:
        return Cardinality(AFV_EXACT_CARDINALITY, m.group(1), m.group(1))
    m = re.match(r"^([0-9]+)[\s,]+([0-9]+)$", card)
    if m:
        return Cardinality(AFV_INTERVAL_CARDINALITY, m.group(1), m.group(2))
    return None


def classify_cols(card: Column) -> tuple[Column, Column, Column]:
    """(card_type, card_min, card_max) Columns from a raw cardinality token.

    Pure built-in expressions (regexp_extract + when-ladder) so cardinality
    classification rides whole-stage codegen; a null card_type means
    unknown/unsupported -> quarantined by the caller, never a job failure.
    """
    c = F.trim(F.regexp_replace(F.coalesce(card, F.lit("")), "=", ""))
    exact = F.regexp_extract(c, r"^([0-9]+)$", 1)
    gmin = F.regexp_extract(c, r"^>([0-9]+)$", 1)
    gmax = F.regexp_extract(c, r"^<([0-9]+)$", 1)
    imin = F.regexp_extract(c, r"^([0-9]+)[\s,]+([0-9]+)$", 1)
    imax = F.regexp_extract(c, r"^([0-9]+)[\s,]+([0-9]+)$", 2)
    card_type = (
        F.when(c == "", F.lit(AFV_MIN_CARDINALITY))
        .when(c.rlike(r"[\[\]]"), F.lit(None).cast("string"))
        .when(exact != "", F.lit(AFV_EXACT_CARDINALITY))
        .when(gmin != "", F.lit(AFV_MIN_CARDINALITY))
        .when(gmax != "", F.lit(AFV_MAX_CARDINALITY))
        .when(imin != "", F.lit(AFV_INTERVAL_CARDINALITY))
        .otherwise(F.lit(None).cast("string"))
    )
    card_min = (
        F.when(c == "", F.lit("0"))
        .when(exact != "", exact)
        .when(gmin != "", gmin)
        .when(imin != "", imin)
        .otherwise(F.lit(None).cast("string"))
    )
    card_max = (
        F.when(exact != "", exact)
        .when(gmax != "", gmax)
        .when(imax != "", imax)
        .otherwise(F.lit(None).cast("string"))
    )
    return card_type, card_min, card_max

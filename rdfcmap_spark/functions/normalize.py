"""Label/mention normalization (SURVEY.md X1/X9/X10).

Regex semantics follow the reference byte-for-byte where it matters for
precision/recall:

* :func:`unbreak` — `Cmap2TurtleConverter.unbreakString:1860-1867`: turn
  ``&#10;`` and newline runs into single spaces, collapse whitespace.
* :func:`normalize_label` — the cleanup ladder of
  `RdfUtil.getResourceByLabel:205-318`: strip ``&#10;``/``&#xa;``, ``[`` ``]``
  (blank-node marker), ``instance of``, ``NamedIndividual``, trailing
  ``instance:…``, comma-list disambiguation preferring ``af*`` terms, and
  ``(PREFIX_1234567)`` / ``(prefix:Term)`` parenthetical extraction.
* :func:`slugify` — `Cmap2TurtleConverter.java:2729-2742` filename slugs.

Each function exists twice with identical behavior: a Spark ``Column``
builder (JVM-side, codegen) and a plain-Python mirror used by the golden
generator and tests. Keeping the hot path in built-ins is the whole point —
no per-row Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- X1 unbreak -----------------------------------------------------------


def unbreak(col: Column) -> Column:
    c = F.regexp_replace(col, "&#10;", "\\\\n")
    c = F.regexp_replace(c, "\\s+\\n\\s+", " ")
    c = F.regexp_replace(c, "\\\\n", "")
    c = F.regexp_replace(c, "\\s+", " ")
    return c


def unbreak_py(label: str) -> str:
    label = label.replace("&#10;", "\\n")
    label = re.sub(r"\s+\n\s+", " ", label)
    label = label.replace("\\n", "")
    label = re.sub(r"\s+", " ", label)
    return label


# --- X9 label cleanup ladder ------------------------------------------------

_AID_RE = r"\(([A-Z]+_[0-9]{5,7})\)"
_PREFIXED_IRI_RE = r"\(([a-zA-Z\-]+:[a-zA-Z]+)\)"
#: AID + prefixed-iri parentheticals as ONE alternation (one regex pass
#: instead of two; the two patterns are disjoint so alternation ≡ sequence)
_PARENS_RE = _AID_RE + "|" + _PREFIXED_IRI_RE
_INSTANCE_RE = r"(?i)(instance:[a-zA-Z0-9\s]+)$"


def normalize_label(col: Column) -> Column:
    """X9 as one chained Column expression.

    Output: the cleaned, lowercased, whitespace-collapsed label ready for the
    broadcast dictionary join (J2). Comma-list disambiguation ("a, af term"
    -> prefer the af* element) is handled, as is stripping of parenthetical
    ``(AFX_0001234)`` / ``(prefix:Term)`` disambiguators.

    Hot-path note: fixed-string steps use ``replace``/``translate`` (plain
    scans) instead of the regex engine — this ladder runs 3x per sentence
    (subject, object, phrase) at 10^12-turn scale, and regex NFA passes were
    the measured bandwidth hog of the extract stage.
    """
    c = F.replace(col, F.lit("&#10;"), F.lit(""))
    c = F.replace(c, F.lit("&#xa;"), F.lit(""))
    c = F.translate(c, "[]", "")
    c = F.replace(c, F.lit("instance of"), F.lit(""))
    c = F.replace(c, F.lit("NamedIndividual"), F.lit(""))
    # the two regex steps can only fire when a ':' / '(' is present —
    # guard them behind a cheap instr scan so the NFA never runs on the
    # overwhelmingly-plain majority of surfaces (this ladder runs 3x per
    # sentence; semantics unchanged, asserted by the fuzz equivalence test)
    c = F.when(F.instr(c, ":") > 0, F.regexp_replace(c, _INSTANCE_RE, "")).otherwise(c)
    c = F.when(F.instr(c, "(") > 0, F.regexp_replace(c, _PARENS_RE, "")).otherwise(c)
    # comma-list: prefer the first element starting with 'af' (case-insens.),
    # else keep the first element (RdfUtil.java:249-260 keeps the last probed,
    # which is the first when no af* match exists and the loop breaks early —
    # we pin "first" as the deterministic choice, see SURVEY.md §2.5).
    # Pure-regex (no higher-order array functions): array lambdas fall out of
    # whole-stage codegen AND defeat common-subexpression elimination, which
    # re-evaluates the whole regexp chain per reference (~10x stage cost
    # measured at 1M sentences).
    c = F.trim(c)
    af_elem = F.regexp_extract(c, r"(?i)(?:^|,)\s*(af[^,]*)", 1)
    first_elem = F.regexp_extract(c, r"^([^,]*)", 1)
    c = F.when(
        F.instr(c, ",") > 0,
        F.trim(F.when(af_elem != "", af_elem).otherwise(first_elem)),
    ).otherwise(c)
    c = F.lower(F.trim(F.regexp_replace(c, "\\s+", " ")))
    return c


def normalize_label_py(label: str) -> str:
    # mirrors normalize_label step for step (replace-then-translate order)
    label = label.replace("&#10;", "").replace("&#xa;", "")
    label = label.replace("[", "").replace("]", "")
    label = label.replace("instance of", "")
    label = label.replace("NamedIndividual", "")
    label = re.sub(_INSTANCE_RE, "", label)
    label = re.sub(_PARENS_RE, "", label)
    label = label.strip()
    parts = label.split(",")
    if len(parts) > 1:
        af = [p.strip() for p in parts if p.strip().lower().startswith("af")]
        label = af[0] if af else parts[0].strip()
    return re.sub(r"\s+", " ", label).strip().lower()


# --- X2 breakString (viz word-wrap) ------------------------------------------

MAX_CHARS = 15  #: Turtle2CmapConverter.java:64


def break_string_py(s: str, size: int = MAX_CHARS) -> str:
    """Word-wrap a label with ``&#10;`` breaks for CXL display — a faithful
    port of `Turtle2CmapConverter.breakString:2339-2366` including its
    quirks: the break is inserted BEFORE the first space at or past each
    ``size`` boundary; spaceless strings are chopped every ``size`` chars
    counting previously inserted entity characters; the escaped-quote fixup
    guards on a backslash (`contains("\\&#10;\"")`) but rewrites every
    ``&#10;"`` occurrence.

    One divergence, by necessity: the reference's spaceless loop compares
    the advancing cursor against the *growing* buffer length, so for
    ``size <= len("&#10;")`` it never terminates. We raise instead of
    looping forever (the reference only ever calls it with MAX_CHARS=15).
    """
    if size <= 5:
        raise ValueError("break_string: size must exceed len('&#10;')==5 to terminate")
    sb = list(s)
    pos = 0
    if " " in s:
        while True:
            joined = "".join(sb)
            idx = joined.find(" ", pos + size)
            if idx < 0:
                break
            sb[idx:idx] = list("&#10;")
            pos = idx
    else:
        while pos + size < len(sb):
            sb[pos + size : pos + size] = list("&#10;")
            pos += size
    out = "".join(sb)
    if '\\&#10;"' in out:
        out = out.replace('&#10;"', '"&#10;')
    return out


# NOTE: X2 deliberately has no Column twin — wrap insertion is iterative
# (each break moves the next search window) and it only ever runs at the
# CXL sink over a driver-sized label set (`sources/cxl.render_cxl`), never
# in the 10^12-turn hot path.

# --- X10 slug ---------------------------------------------------------------


def slugify(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), "[^A-Za-z0-9]+", "-"))


def slugify_py(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "-", s.strip()).lower()

"""Seeded fuzz: the Column implementations must match their Python mirrors
byte-for-byte on adversarial inputs (the pure-regex comma-list rewrite of
normalize_label is only valid if it IS normalize_label_py).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from rdfcmap_spark.functions.cardinality import classify_cols, classify_py
from rdfcmap_spark.functions.normalize import normalize_label, normalize_label_py

_ATOMS = [
    "af", "AF x", "afx", " af-term", "reactor", "peak area", ",", ", ,", "[", "]",
    "(CHEBI_15377)", "(AFX_0012345)", "(afe:Stirrer)", "(bad", "instance of",
    "instance:thing 9", "NamedIndividual", "&#10;", "&#xa;", "  ", "é", "x,y,z",
    "AF", "a f", "0", "café, AFFE", "instance:", "()",
    # round-3 widening: nested/unbalanced parens, tabs/newlines, prefixed-iri
    # lookalikes, multi-comma ladders, mixed-case af elems, colon soup
    "((afe:Stirrer))", "(AFX_12)", "(AFX_123456789)", "(a-b:C)(afe:D)",
    "\t", "a\tb", "a\nb", ",af,", "x, Af y, AF z", "a:b:c", "(:x)",
    "instance:thing(AFX_0012345)", "instance: ", "NamedIndividualaf",
    "instance ofinstance of", "]a[", "(afe:Stirrer", "afe:Stirrer)",
]


def _fuzz_strings(n: int = 400) -> list[str]:
    rng = random.Random(20260817)
    out = []
    for i in range(n):
        k = rng.randint(1, 6)
        out.append("".join(rng.choice(_ATOMS) for _ in range(k)))
    # hash-derived ascii soup too
    for i in range(100):
        h = hashlib.md5(f"fuzz|{i}".encode()).hexdigest()
        out.append(",".join(h[j : j + 4] for j in range(0, 16, 4)))
    return out


def test_normalize_column_equals_python(spark):
    cases = _fuzz_strings()
    df = spark.createDataFrame([(c,) for c in cases], "label string")
    rows = df.select("label", normalize_label(F.col("label")).alias("norm")).collect()
    for r in rows:
        assert r["norm"] == normalize_label_py(r["label"]), repr(r["label"])


_BPE_ATOMS = [
    "it's", "don't", "we're", "I'll", "he'd", "you've", "I'm", "'", "''",
    "abc", "ABC", "42", "3.14", "!", "!!", "a-b", " ", "  ", "\t", "\n",
    "e2e", "x'y", "'tis", "über", "…", "a_b", "#tag", "100%", "",
]


def test_bpe_token_count_column_equals_re_findall(spark):
    """The JVM regexp_count of BPE_TOKEN_RE must equal Python re.findall
    length on adversarial concatenations — the cross-engine claim the
    token_stats oracle rests on (Java regex / RE2 / Python re all
    leftmost-first on this lookahead-free pattern)."""
    import re

    from rdfcmap_spark.operators.textstats import BPE_TOKEN_RE

    rng = random.Random(20260819)
    cases = [
        "".join(rng.choice(_BPE_ATOMS) for _ in range(rng.randint(1, 8)))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    rows = df.select(
        "text", F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias("n")
    ).collect()
    for r in rows:
        assert r["n"] == len(re.findall(BPE_TOKEN_RE, r["text"])), repr(r["text"])


_CARD_ATOMS = ["=", "1", "23", ">", "<", ",", " ", "[", "]", "5 7", "=2", "x"]


def test_cardinality_column_equals_python(spark):
    rng = random.Random(99)
    cases = ["".join(rng.choice(_CARD_ATOMS) for _ in range(rng.randint(0, 4))) for _ in range(300)]
    t, mn, mx = classify_cols(F.col("card"))
    df = spark.createDataFrame([(c,) for c in cases], "card string")
    rows = df.select("card", t.alias("t"), mn.alias("mn"), mx.alias("mx")).collect()
    for r in rows:
        exp = classify_py(r["card"])
        got = None if r["t"] is None else (r["t"], r["mn"], r["mx"])
        want = None if exp is None else (exp.card_type, exp.card_min, exp.card_max)
        assert got == want, repr(r["card"])

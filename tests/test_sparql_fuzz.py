"""Seeded differential fuzz: execute_sparql vs an independent pure-Python
BGP evaluator on randomly composed stores and queries.

The per-construct oracle queries (kg_sparql_*) pin each SPARQL feature in
isolation; this composes them randomly — joins of 1-3 patterns, FILTER
comparisons, OPTIONAL, UNION, ORDER BY/LIMIT — over randomized small
graphs, and compares full bag semantics against a from-scratch nested-loop
evaluator that shares no code with the executor.
"""

from __future__ import annotations

import itertools
import random

from rdfcmap_spark import vocab
from rdfcmap_spark.operators import sparql_exec as se
from rdfcmap_spark.schemas import TRIPLES

EX = "http://example.org/"
PREDS = [EX + f"p{i}" for i in range(3)]
AGE = EX + "age"
SUBJ = [EX + f"s{i}" for i in range(8)]


def _store(rng: random.Random):
    """Random graph: iri links over PREDS + integer age literals."""
    rows = []
    for _ in range(rng.randint(8, 20)):
        rows.append(
            (rng.choice(SUBJ), rng.choice(PREDS), "iri", rng.choice(SUBJ), None, None)
        )
    for s in rng.sample(SUBJ, rng.randint(2, 6)):
        rows.append(
            (s, AGE, "literal", None, str(rng.randint(1, 99)), vocab.XSD + "integer")
        )
    # dedup to set semantics (the executor's triples frame is a set)
    return sorted(set(rows))


# --- the independent evaluator -------------------------------------------


def _match(row, pat, binding):
    """pat = (s, p, o) each a var name ('?x'), IRI string, or None. Returns
    an extended binding or None. Typed literals bind in the executor's
    '"lex"^^dt' encoding, plain strings as the bare lexical."""
    s, p, k, oi, lex, dt = row
    if k == "literal":
        obj_val = lex if dt in (None, vocab.XSD + "string") else f'"{lex}"^^{dt}'
    else:
        obj_val = oi
    out = dict(binding)
    for term, val in ((pat[0], s), (pat[1], p), (pat[2], obj_val)):
        if term.startswith("?"):
            if term in out and out[term] != val:
                return None
            out[term] = val
        elif term != val:
            return None
    return out


def _eval_bgp(rows, pats, binding=None):
    """All bindings for a conjunction of patterns (bag semantics)."""
    bindings = [binding or {}]
    for pat in pats:
        bindings = [b2 for b in bindings for r in rows if (b2 := _match(r, pat, b))]
    return bindings


def _project(bindings, out_vars):
    return [tuple(b.get(v) for v in out_vars) for b in bindings]


def _q_join(rng):
    n = rng.randint(1, 3)
    pats, vars_chain = [], ["?v0"]
    for i in range(n):
        pats.append((vars_chain[-1], rng.choice(PREDS), f"?v{i + 1}"))
        vars_chain.append(f"?v{i + 1}")
    out = [vars_chain[0], vars_chain[-1]]
    body = " . ".join(f"{s} <{p}> {o}" for s, p, o in pats)
    return (
        f"SELECT {out[0]} {out[1]} WHERE {{ {body} }}",
        lambda rows: _project(_eval_bgp(rows, pats), out),
        [v[1:] for v in out],
    )


def _q_filter(rng):
    k = rng.randint(1, 99)
    op = rng.choice([">", "<", ">=", "<="])
    pats = [("?s", AGE, "?a")]
    py = {">": lambda a: a > k, "<": lambda a: a < k,
          ">=": lambda a: a >= k, "<=": lambda a: a <= k}[op]
    return (
        f"SELECT ?s ?a WHERE {{ ?s <{AGE}> ?a . FILTER(?a {op} {k}) }}",
        lambda rows: [
            t
            for t in _project(_eval_bgp(rows, pats), ["?s", "?a"])
            if py(int(t[1].split('"')[1]))
        ],
        ["s", "a"],
    )


def _q_optional(rng):
    p = rng.choice(PREDS)
    base = [("?s", p, "?o")]
    opt = [("?s", AGE, "?a")]

    def ref(rows):
        out = []
        for b in _eval_bgp(rows, base):
            ext = _eval_bgp(rows, opt, b)
            out.extend(
                [(b["?s"], b["?o"], e["?a"]) for e in ext]
                if ext
                else [(b["?s"], b["?o"], None)]
            )
        return out

    return (
        f"SELECT ?s ?o ?a WHERE {{ ?s <{p}> ?o . OPTIONAL {{ ?s <{AGE}> ?a }} }}",
        ref,
        ["s", "o", "a"],
    )


def _q_union(rng):
    p1, p2 = rng.sample(PREDS, 2)
    return (
        f"SELECT ?s ?o WHERE {{ {{ ?s <{p1}> ?o }} UNION {{ ?s <{p2}> ?o }} }}",
        lambda rows: _project(_eval_bgp(rows, [("?s", p1, "?o")]), ["?s", "?o"])
        + _project(_eval_bgp(rows, [("?s", p2, "?o")]), ["?s", "?o"]),
        ["s", "o"],
    )


def _q_order_limit(rng):
    p = rng.choice(PREDS)
    k = rng.randint(1, 4)

    def ref(rows):
        allr = sorted(_project(_eval_bgp(rows, [("?s", p, "?o")]), ["?s", "?o"]))
        return allr[:k]

    return (
        f"SELECT ?s ?o WHERE {{ ?s <{p}> ?o }} ORDER BY ?s ?o LIMIT {k}",
        ref,
        ["s", "o"],
    )


_TEMPLATES = [_q_join, _q_filter, _q_optional, _q_union, _q_order_limit]


def test_sparql_differential_fuzz(spark):
    rng = random.Random(20260820)
    failures = []
    for case in range(40):
        rows = _store(rng)
        df = spark.createDataFrame(
            [(s, p, k, oi, lex, dt, None, None) for s, p, k, oi, lex, dt in rows],
            TRIPLES,
        )
        query, ref, cols = rng.choice(_TEMPLATES)(rng)
        got_df = se.execute_sparql(df, query)
        got = [tuple(r[c] for c in cols) for r in got_df.collect()]
        want = ref(rows)
        ordered = "ORDER BY" in query
        if (got if ordered else sorted(map(repr, got))) != (
            want if ordered else sorted(map(repr, want))
        ):
            failures.append((case, query, sorted(got)[:5], sorted(want)[:5]))
    assert not failures, failures[:2]

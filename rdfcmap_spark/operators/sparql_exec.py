"""SPARQL BGP execution over the triples frame (the query side of §3.3).

The reference *generates* SPARQL text (`sparql/SparqlCreator.java`) for the
user to run against an external store. This module closes that loop inside
the engine: it parses the basic-graph-pattern subset the generator emits —
PREFIX declarations, ``SELECT [DISTINCT] ?vars``, a WHERE block of triple
statements over variables / IRIs / prefixed names / typed literals — and
executes it directly on the (subj, pred, obj_*) triples DataFrame, so a
generated query is runnable on the same cluster that built the graph.

Execution model (Spark-first, not a SPARQL-algebra port):

* each triple pattern becomes a **scan of the triples frame with its
  constants as pushed-down filters** and its variables projected as binding
  columns (`.explain` shows PushedFilters on subj/pred/obj);
* patterns are combined with **hash equi-joins on shared variables**,
  greedily ordered most-constants-first and connected-next (a pattern that
  shares no variable with the bound set is deferred; a genuinely
  disconnected group cross-joins, which is what its semantics require);
* SPARQL set semantics: SELECT is bag by default, ``DISTINCT`` adds the
  one aggregate exchange.

Binding encoding: subjects/predicates bind the raw IRI string; objects bind
the raw IRI for resource objects and the collision-free token
``"lexical"^^<datatype-iri>`` for literals (an IRI can never start with
``"``), so a variable used in both object and subject position joins
correctly and literal/IRI bindings never alias each other.

At 100 TB each pattern scan prunes to (subj, pred, obj) columns, constants
reach the parquet scan, and every join is an equi-shuffle on binding
columns (AQE handles skewed predicates); nothing is collected to the
driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfcmap_spark import vocab


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    iri: str


@dataclass(frozen=True)
class Lit:
    lex: str
    dt: str | None = None  #: datatype IRI (None -> xsd:string)


Term = Var | Iri | Lit
Pattern = tuple[Term, Term, Term]


@dataclass(frozen=True)
class ParsedQuery:
    select_vars: list[str]  #: [] means SELECT *
    distinct: bool
    patterns: list[Pattern]
    prefixes: dict[str, str]


_TERM_RE = re.compile(
    r"""
      (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<iri><[^<>]*>)
    | (?P<lit>"(?:[^"\\]|\\.)*")
      (?:\^\^(?P<dt><[^<>]*>|[A-Za-z][\w.-]*:[\w.-]+)|@(?P<lang>[A-Za-z][A-Za-z0-9-]*))?
    | (?P<pname>[A-Za-z][\w.-]*:[\w.%-]*)
    | (?P<kw_a>\ba\b)
    | (?P<dot>\.)
    """,
    re.VERBOSE,
)

_UNESCAPE = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\t": "\t", "\\r": "\r"}


def _unescape(s: str) -> str:
    return re.sub(r"\\.", lambda m: _UNESCAPE.get(m.group(0), m.group(0)[1]), s)


def _resolve_pname(pname: str, prefixes: dict[str, str]) -> str:
    prefix, local = pname.split(":", 1)
    ns = prefixes.get(prefix) or vocab.NS_PREFIX_MAP.get(prefix)
    if ns is None:
        raise ValueError(f"unknown prefix in BGP: {pname!r}")
    return ns + local


def parse_query(text: str) -> ParsedQuery:
    """Parse the BGP subset `render_sparql` emits. Comment lines (``#``) and
    PREFIX declarations are handled; the WHERE block must contain only
    triple statements (no OPTIONAL/FILTER/UNION — the generator never emits
    them, and a loud error beats silently wrong bindings)."""
    prefixes: dict[str, str] = {}
    select_vars: list[str] = []
    distinct = False
    body_lines: list[str] = []
    in_where = False
    for raw in text.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        low = line.lower()
        if low.startswith("prefix "):
            m = re.match(r"(?i)prefix\s+([A-Za-z][\w.-]*):\s*<([^<>]*)>", line)
            if not m:
                raise ValueError(f"malformed PREFIX line: {line!r}")
            prefixes[m.group(1)] = m.group(2)
            continue
        if low.startswith("select"):
            head = line
            if "{" in head:
                head, rest = head.split("{", 1)
                in_where = True
                if rest.strip():
                    body_lines.append(rest)
            distinct = bool(re.search(r"(?i)\bdistinct\b", head))
            select_vars = re.findall(r"\?[A-Za-z_][A-Za-z0-9_]*", head)
            continue
        if not in_where:
            if low.startswith("where"):
                in_where = True
                rest = line.split("{", 1)[1] if "{" in line else ""
                if rest.strip():
                    body_lines.append(rest)
            continue
        if line == "}" or line.startswith("}"):
            in_where = False
            continue
        body_lines.append(line)

    for bad in ("OPTIONAL", "FILTER", "UNION", "GRAPH", "MINUS"):
        if any(re.search(rf"(?i)\b{bad}\b", ln) for ln in body_lines):
            raise ValueError(f"unsupported SPARQL construct in BGP executor: {bad}")

    patterns: list[Pattern] = []
    terms: list[Term] = []
    for line in body_lines:
        for m in _TERM_RE.finditer(line):
            if m.group("var"):
                terms.append(Var(m.group("var")[1:]))
            elif m.group("iri"):
                terms.append(Iri(m.group("iri")[1:-1]))
            elif m.group("lit"):
                lex = _unescape(m.group("lit")[1:-1])
                dt = m.group("dt")
                lang = m.group("lang")
                if lang:
                    dt_iri = vocab.RDF + "langString@" + lang
                elif dt:
                    dt_iri = dt[1:-1] if dt.startswith("<") else _resolve_pname(dt, prefixes)
                else:
                    dt_iri = None
                terms.append(Lit(lex, dt_iri))
            elif m.group("pname"):
                terms.append(Iri(_resolve_pname(m.group("pname"), prefixes)))
            elif m.group("kw_a"):
                terms.append(Iri(vocab.RDF_TYPE))
            elif m.group("dot"):
                if len(terms) != 3:
                    raise ValueError(f"BGP statement is not a triple: {line!r}")
                patterns.append((terms[0], terms[1], terms[2]))
                terms = []
    if terms:
        raise ValueError("BGP body ends mid-statement (missing '.')")
    return ParsedQuery(select_vars, distinct, patterns, prefixes)


def _object_binding() -> F.Column:
    """Collision-free object encoding: raw IRI for resources,
    ``"lex"^^<dt>`` for literals (IRIs cannot start with '\"')."""
    return F.when(
        F.col("obj_kind") == "literal",
        F.concat(
            F.lit('"'),
            F.col("obj_lexical"),
            F.lit('"^^'),
            F.coalesce(F.col("obj_datatype"), F.lit(vocab.XSD_STRING)),
        ),
    ).otherwise(F.col("obj_iri"))


def lit_binding(lex: str, dt: str | None = None) -> str:
    """The binding string a literal object produces — for asserting results
    and for oracle SQL mirrors."""
    return f'"{lex}"^^{dt or vocab.XSD_STRING}'


def _pattern_frame(triples: DataFrame, pat: Pattern) -> tuple[DataFrame, list[str]]:
    """One pattern -> (frame of binding columns, bound var names). Constants
    become filters (pushed to the scan); a variable repeated inside the
    pattern adds the equality filter its semantics require."""
    s, p, o = pat
    df = triples
    bind: list[tuple[str, F.Column]] = []
    if isinstance(s, Var):
        bind.append((s.name, F.col("subj")))
    else:
        if not isinstance(s, Iri):
            raise ValueError("literal in subject position")
        df = df.filter(F.col("subj") == s.iri)
    if isinstance(p, Var):
        bind.append((p.name, F.col("pred")))
    else:
        if not isinstance(p, Iri):
            raise ValueError("literal in predicate position")
        df = df.filter(F.col("pred") == p.iri)
    if isinstance(o, Var):
        bind.append((o.name, _object_binding()))
    elif isinstance(o, Iri):
        df = df.filter((F.col("obj_kind") != "literal") & (F.col("obj_iri") == o.iri))
    else:
        df = df.filter(
            (F.col("obj_kind") == "literal")
            & (F.col("obj_lexical") == o.lex)
            & (
                F.coalesce(F.col("obj_datatype"), F.lit(vocab.XSD_STRING))
                == (o.dt or vocab.XSD_STRING)
            )
        )
    seen: dict[str, F.Column] = {}
    for name, col in bind:
        if name in seen:
            df = df.filter(seen[name] == col)  # e.g. ?x ex:knows ?x
        else:
            seen[name] = col
    if not seen:  # fully ground pattern: pure existence constraint
        probe = df.select(F.lit(1).alias("__exists")).limit(1)
        return probe, []
    out = df.select(*[c.alias(n) for n, c in seen.items()])
    return out, list(seen)


def execute_bgp(
    triples: DataFrame, patterns: list[Pattern], select_vars: list[str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """Execute a BGP: per-pattern filtered scans hash-joined on shared
    variables, greedy most-constants-first / connected-next order."""
    if not patterns:
        raise ValueError("empty BGP")
    frames = [_pattern_frame(triples, p) for p in patterns]

    def n_consts(i: int) -> int:
        return sum(1 for t in patterns[i] if not isinstance(t, Var))

    order = sorted(range(len(frames)), key=lambda i: (-n_consts(i), i))
    remaining = list(order)
    first = remaining.pop(0)
    acc, bound = frames[first]
    bound = set(bound)
    while remaining:
        best, best_shared = None, -1
        for i in remaining:
            shared = len(bound & set(frames[i][1]))
            if shared > best_shared:
                best, best_shared = i, shared
        remaining.remove(best)
        nf, nvars = frames[best]
        shared_cols = sorted(bound & set(nvars))
        if shared_cols:
            acc = acc.join(nf, shared_cols)
        else:
            acc = acc.crossJoin(nf)  # disconnected group or existence probe
        bound |= set(nvars)
        if "__exists" in acc.columns:
            acc = acc.drop("__exists")
            bound.discard("__exists")
    if select_vars:
        names = [v.lstrip("?") for v in select_vars]  # columns drop the '?'
        missing = [v for v in names if v not in bound]
        if missing:
            raise ValueError(f"SELECT variables never bound in the BGP: {missing}")
        acc = acc.select(*names)
    elif bound:
        acc = acc.select(*sorted(bound))
    if distinct:
        acc = acc.distinct()
    return acc


def execute_sparql(triples: DataFrame, query_text: str) -> DataFrame:
    """Parse + execute a generated SPARQL query against the triples frame —
    one binding row per BGP match, one column per SELECT variable."""
    q = parse_query(query_text)
    return execute_bgp(triples, q.patterns, q.select_vars or None, q.distinct)

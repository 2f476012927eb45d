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
  one aggregate exchange;
* ``OPTIONAL { … }`` groups become **left outer joins** on the shared
  variables (a group's own FILTERs are applied inside the group before the
  left join, per SPARQL group scoping);
* ``{ … } UNION { … }`` branches execute independently and union by name
  (branches must bind the same variable set — the compatible-bindings
  corner where branches differ is rejected loudly, not silently wrong);
* ``FILTER(…)`` expressions compile to JVM-side Column predicates —
  comparisons (numeric via ``try_cast``, so a non-numeric lexical maps
  SPARQL's type *error* onto SQL NULL and the row drops, exactly the
  error→false rule), ``regex`` / ``contains`` / ``strstarts`` /
  ``strends`` / ``bound`` / ``isIRI`` / ``isLiteral`` / ``isBlank`` /
  ``isNumeric`` / ``sameTerm`` (term identity on the collision-free
  binding encoding, no numeric promotion) / ``str``, and ``!`` / ``&&`` /
  ``||`` — no Python evaluation per row anywhere;
* ``ORDER BY`` / ``LIMIT`` / ``OFFSET`` modifiers map to
  ``orderBy``/``limit``/``offset`` (ordering is binary-collation string
  order over the binding encoding, documented below);
* aggregates ``(COUNT|SUM|AVG|MIN|MAX|SAMPLE|GROUP_CONCAT([DISTINCT]
  ?v|*) AS ?alias)`` with ``GROUP BY`` map to one hash-aggregate exchange
  (map-side partial aggregation for free); SUM/AVG go through the same
  try_cast-to-double lexical extraction as FILTER comparisons;
  GROUP_CONCAT honors ``; SEPARATOR="…"`` and concatenates sorted
  lexical forms (deterministic); ``HAVING`` compiles to a
  post-aggregation filter over hidden aggregate columns;
* property paths in predicate position: ``p+`` (transitive closure via
  distributed pointer-doubling, predicate filter pushed below the
  closure), ``p*`` / ``p?`` (zero-length self-pairs over graph terms ∪
  closure / direct edges), ``^p`` (inverse), ``p1/p2`` (sequence
  composition), ``p1|p2`` (alternation, lowest precedence, bag union),
  ``!p`` / ``!(p1|^p2)`` (negated property sets — NOT-IN predicates pushed
  to the scan, split by direction per the §9.1 translation);
* ``FILTER [NOT] EXISTS { … }`` → left-semi / left-anti joins on the
  shared variables; ``MINUS { … }`` → left-anti (disjoint-domain MINUS is
  a no-op per spec);
* ``VALUES`` inline tables → broadcast frames joined first (the most
  selective unit; UNDEF is rejected — unbound-compatible join semantics
  diverge from SQL null joins); ``DESCRIBE`` → one left-semi
  node-description scan;
* nested ``{ SELECT … }`` subqueries → evaluated bottom-up through the
  same SELECT pipeline (aggregates/ORDER/LIMIT included) and hash-joined
  into the outer group on their projected variables (aggregate outputs
  bind as plain lexical values, documented);
* ``?x [NOT] IN (e1, e2, …)`` → the spec's equality-disjunction
  expansion; ``DATATYPE(?v)`` → the binding encoding's datatype suffix
  (lang-tagged → ``rdf:langString``, IRI → NULL/type-error);
* ``BIND(expr AS ?var)`` → ``withColumn`` over the joined group: arithmetic
  (evaluated in double, result ``xsd:double``), ABS/ROUND/CEIL/FLOOR
  (XPath fn:round ties toward +INF, not Spark's away-from-zero),
  STR/STRLEN/UCASE/LCASE/CONCAT/SUBSTR/REPLACE/STRBEFORE/STRAFTER
  (result ``xsd:string``), IF/COALESCE (binding passthrough). Scoping divergence, documented: the expression sees the
  whole group's bindings (the spec scopes it to *preceding* patterns);
  rebinding an in-scope variable is the same loud error as the spec.
  ``GRAPH`` → the engine's lineage columns ARE its named graphs: each
  triple's conversation is the graph ``urn:conv:<conv_id>`` and the
  default graph is the union of everything (Jena's union-default-graph
  dataset config). ``GRAPH <iri> { … }`` is one pushed-down lineage
  filter on the scans; ``GRAPH ?g { … }`` binds ?g per pattern so
  same-group patterns co-scope through the hash join — no per-graph
  loop, no driver involvement. Nested GRAPH, paths inside GRAPH ?var,
  and subqueries inside GRAPH ?var raise loudly. SERVICE remains a loud
  error (no federation).
* SPARQL 1.1 **Update** (`execute_update`): INSERT DATA / DELETE DATA
  (incl. quad forms — ``GRAPH <urn:conv:X> { … }`` blocks scope ground
  triples to a lineage named graph; graph-scoped deletes remove the
  triple from that graph only, graph-scoped inserts dedupe on
  KEY6+conv_id) / DELETE WHERE / DELETE-INSERT-WHERE as pure
  frame→frame transformations
  — templates instantiate against the original store's bindings, then
  ``store := (store − deletes) ∪ inserts`` via null-safe anti-joins on
  the triple identity key (set semantics; DELETE removes every
  provenance row, INSERTs carry NULL lineage). Graph management (§3.2:
  CLEAR / DROP / CREATE / ADD / COPY / MOVE, SILENT accepted) runs over
  the lineage named graphs via `execute_graph_update` — partition-
  prunable filters + unions, CLEAR≡DROP and CREATE a no-op because
  graphs exist iff they have rows. Update sequences, WITH / USING, and
  LOAD raise loudly.

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


@dataclass(frozen=True)
class PathStep:
    """One step of a property path: an IRI, optionally inverted (``^p``),
    optionally repeated (``p+`` one-or-more, ``p*`` zero-or-more, ``p?``
    zero-or-one). A negated property set ``!p`` / ``!(p1|^p2|…)`` is a step
    with ``iri == ''`` and the negated members split by direction per the
    SPARQL 1.1 NPS translation: ``neg`` holds forward members, ``neg_inv``
    inverse members (either may be None when that direction is absent)."""

    iri: str
    inverse: bool = False
    many: str = ""  #: '' | '+' | '*' | '?'
    neg: tuple[str, ...] | None = None  #: forward-negated predicate IRIs
    neg_inv: tuple[str, ...] | None = None  #: inverse-negated predicate IRIs

    @property
    def negated(self) -> bool:
        return self.neg is not None or self.neg_inv is not None


@dataclass(frozen=True)
class Path:
    """A property path in predicate position: ``|``-alternation (lowest
    precedence, per the SPARQL grammar) over ``/``-sequences of steps.
    ``steps`` is the first alternative; ``alts`` the rest."""

    steps: tuple[PathStep, ...]
    alts: tuple[tuple[PathStep, ...], ...] = ()


Term = Var | Iri | Lit
Pattern = tuple[Term, "Term | Path", Term]


@dataclass(frozen=True)
class Group:
    """One ``{ … }`` graph pattern: triple patterns plus nested structure."""

    patterns: list[Pattern]
    filters: list[str]  #: raw FILTER expression texts, compiled at execution
    optionals: list["Group"]
    unions: list[list["Group"]]  #: each entry = the branches of one UNION chain
    exists: tuple["Group", ...] = ()  #: FILTER EXISTS { … } subgroups
    not_exists: tuple["Group", ...] = ()  #: FILTER NOT EXISTS { … } subgroups
    minuses: tuple["Group", ...] = ()  #: MINUS { … } subgroups
    #: VALUES blocks: (var names, rows of binding-encoded strings)
    values: tuple[tuple[tuple[str, ...], tuple[tuple[str, ...], ...]], ...] = ()
    #: BIND clauses in textual order: (raw expression text, target var name)
    binds: tuple[tuple[str, str], ...] = ()
    #: nested `{ SELECT … }` subqueries, parsed with the outer prefixes
    subselects: tuple["ParsedQuery", ...] = ()
    #: GRAPH clauses: (graph term — Var or Iri, inner group)
    graphs: tuple[tuple[Term, "Group"], ...] = ()


@dataclass(frozen=True)
class SelectItem:
    """One SELECT clause entry: a plain variable, an aggregate
    ``(AGG([DISTINCT] ?v|*) AS ?alias)``, or a projection expression
    ``(expr AS ?alias)`` (the BIND value grammar)."""

    var: str | None = None  #: plain variable name (no '?')
    agg: str | None = None  #: 'count'|'sum'|'avg'|'min'|'max'|'sample'|'group_concat'
    target: str | None = None  #: aggregated var name, or '*' (COUNT only)
    distinct: bool = False
    alias: str | None = None  #: output column name (no '?')
    expr: str | None = None  #: raw value-expression text (non-aggregate)
    sep: str | None = None  #: GROUP_CONCAT separator (default ' ' per spec)


@dataclass(frozen=True)
class ParsedQuery:
    select_vars: list[str]  #: [] means SELECT *
    distinct: bool
    patterns: list[Pattern]  #: top-level mandatory patterns (== group.patterns)
    prefixes: dict[str, str]
    group: Group | None = None
    order_by: tuple[tuple[str, bool], ...] = ()  #: (var, descending)
    limit: int | None = None
    offset: int | None = None
    select_items: tuple[SelectItem, ...] = ()
    group_by: tuple[str, ...] = ()
    form: str = "select"  #: 'select' | 'construct' | 'ask' | 'describe'
    template: tuple[Pattern, ...] = ()  #: CONSTRUCT template patterns
    describe_iris: tuple[str, ...] = ()  #: constant DESCRIBE targets
    #: HAVING constraint with aggregate calls rewritten to ?__hN hidden
    #: variables, plus the hidden aggregates themselves (alias = __hN)
    having: str | None = None
    having_aggs: tuple[SelectItem, ...] = ()


_TERM_RE = re.compile(
    r"""
      (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<iri><[^<>]*>)
    | (?P<lit>"(?:[^"\\]|\\.)*")
      (?:\^\^(?P<dt><[^<>]*>|[A-Za-z][\w.-]*:[\w.-]+)|@(?P<lang>[A-Za-z][A-Za-z0-9-]*))?
    | (?P<pname>[A-Za-z][\w.-]*:[\w.%-]*)
    | (?P<kw_a>\ba\b)
    | (?P<dot>\.)
    | (?P<semi>;)
    | (?P<comma>,)
    | (?P<pathmod>[+*?])
    | (?P<caret>\^)
    | (?P<slash>/)
    | (?P<pipe>\|)
    | (?P<bang>!)
    | (?P<lparen>\()
    | (?P<rparen>\))
    """,
    re.VERBOSE,
)

#: the aggregate-call grammar shared by SELECT (with the trailing AS) and
#: HAVING (bare calls): AGG([DISTINCT] ?v|*) with GROUP_CONCAT's optional
#: `; SEPARATOR="..."` clause
_AGG_CALL = r"""(?P<agg>COUNT|SUM|AVG|MIN|MAX|SAMPLE|GROUP_CONCAT)\s*\(\s*
        (?P<dist>DISTINCT\s+)?
        (?P<tgt>\?[A-Za-z_][A-Za-z0-9_]*|\*)\s*
        (?:;\s*SEPARATOR\s*=\s*"(?P<sep>(?:[^"\\]|\\.)*)"\s*)?\)"""

_SEL_AGG_RE = re.compile(
    r"\(\s*" + _AGG_CALL + r"\s+AS\s+(?P<alias>\?[A-Za-z_][A-Za-z0-9_]*)\s*\)",
    re.I | re.VERBOSE,
)

_HAVING_AGG_RE = re.compile(_AGG_CALL, re.I | re.VERBOSE)

_UNESCAPE = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\t": "\t", "\\r": "\r"}


def _unescape(s: str) -> str:
    return re.sub(r"\\.", lambda m: _UNESCAPE.get(m.group(0), m.group(0)[1]), s)


def _resolve_pname(pname: str, prefixes: dict[str, str]) -> str:
    prefix, local = pname.split(":", 1)
    ns = prefixes.get(prefix) or vocab.NS_PREFIX_MAP.get(prefix)
    if ns is None:
        raise ValueError(f"unknown prefix in BGP: {pname!r}")
    return ns + local


def _skip_string(text: str, i: int) -> int:
    """i points at an opening '\"'; return the index just past the close."""
    n = len(text)
    j = i + 1
    while j < n and text[j] != '"':
        j += 2 if text[j] == "\\" else 1
    return min(j + 1, n)


def _matching(text: str, i: int, open_ch: str, close_ch: str) -> int:
    """Index of the close matching the open at ``text[i]``, quote-aware."""
    depth = 0
    n = len(text)
    j = i
    while j < n:
        c = text[j]
        if c == '"':
            j = _skip_string(text, j)
            continue
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError(f"unbalanced {open_ch}…{close_ch} in SPARQL text")


def _term_of(m: re.Match, prefixes: dict[str, str]) -> Term | None:
    """Build a Var/Iri/Lit from a _TERM_RE match, or None for non-terms."""
    if m.group("var"):
        return Var(m.group("var")[1:])
    if m.group("iri"):
        return Iri(m.group("iri")[1:-1])
    if m.group("lit"):
        lex = _unescape(m.group("lit")[1:-1])
        dt = m.group("dt")
        lang = m.group("lang")
        if lang:
            dt_iri = vocab.RDF + "langString@" + lang
        elif dt:
            dt_iri = dt[1:-1] if dt.startswith("<") else _resolve_pname(dt, prefixes)
        else:
            dt_iri = None
        return Lit(lex, dt_iri)
    if m.group("pname"):
        return Iri(_resolve_pname(m.group("pname"), prefixes))
    if m.group("kw_a"):
        return Iri(vocab.RDF_TYPE)
    return None


def _parse_statements(body: str, prefixes: dict[str, str]) -> list[Pattern]:
    """Parse triple statements: subject, predicate (a plain term or a
    property path — ``^p`` inverse, ``p+`` transitive, ``p1/p2`` sequence),
    object, '.'."""
    patterns: list[Pattern] = []
    phase = "subj"
    subj: Term | None = None
    pred: Term | Path | None = None
    obj: Term | None = None
    steps: list[PathStep] = []
    alt_seqs: list[tuple[PathStep, ...]] = []  # completed '|' alternatives
    pending_inv = False
    after_step = False  # a step IRI just completed; a modifier may attach
    pending_neg = False  # '!' seen; an NPS member or '(' set follows
    # open '!( … )' set being collected: {"fwd": [...], "inv": [...], "caret": bool}
    neg_set: dict | None = None

    def finish_pred() -> Term | Path:
        if (
            not alt_seqs
            and len(steps) == 1
            and not steps[0].inverse
            and not steps[0].many
            and not steps[0].negated
        ):
            return Iri(steps[0].iri)
        seqs = [*alt_seqs, tuple(steps)]
        return Path(seqs[0], tuple(seqs[1:]))

    def nps_step(fwd: list[str], inv: list[str], inverse: bool) -> PathStep:
        if not fwd and not inv:
            raise ValueError("empty negated property set: !()")
        return PathStep(
            "", inverse, "",
            tuple(fwd) if fwd else None, tuple(inv) if inv else None,
        )

    for m in _TERM_RE.finditer(body):
        # after ';' anything but the statement terminator resumes at pred
        if phase == "pred_after_semi" and not m.group("dot"):
            phase = "pred"
        # inside an open '!( … )' negated set: only ^/|/terms/')' are legal
        if neg_set is not None:
            if m.group("caret"):
                neg_set["caret"] = True
                continue
            if m.group("pipe"):
                continue
            if m.group("rparen"):
                steps.append(
                    nps_step(neg_set["fwd"], neg_set["inv"], pending_inv)
                )
                pending_inv = False
                neg_set = None
                after_step = True
                continue
            term = _term_of(m, prefixes)
            if not isinstance(term, Iri):
                raise ValueError(
                    "negated property sets admit only IRIs / 'a' / '^IRI'"
                )
            neg_set["inv" if neg_set["caret"] else "fwd"].append(term.iri)
            neg_set["caret"] = False
            continue
        if m.group("bang"):
            if phase != "pred" or after_step:
                raise ValueError("'!' must start a predicate-position path step")
            pending_neg = True
            continue
        if m.group("lparen"):
            if not pending_neg:
                raise ValueError(
                    "parenthesized (non-negated) property paths are not supported"
                )
            pending_neg = False
            neg_set = {"fwd": [], "inv": [], "caret": False}
            continue
        if m.group("rparen"):
            raise ValueError("unbalanced ')' in a BGP statement")
        if pending_neg:
            term = _term_of(m, prefixes)
            if not isinstance(term, Iri):
                raise ValueError("'!' must be followed by an IRI or '(set)'")
            steps.append(nps_step([term.iri], [], pending_inv))
            pending_inv = pending_neg = False
            after_step = True
            continue
        if m.group("dot"):
            # "pred_after_semi" = a trailing ';' before the '.' (legal)
            if phase not in ("done", "pred_after_semi"):
                raise ValueError(f"BGP statement is not a triple: {body!r}")
            if phase == "done":
                patterns.append((subj, pred, obj))
            phase, subj, pred, obj = "subj", None, None, None
            steps, alt_seqs, pending_inv, after_step = [], [], False, False
            continue
        if m.group("semi"):
            # predicate-object list: emit and keep the subject
            if phase != "done":
                raise ValueError(f"';' before a complete triple in: {body!r}")
            patterns.append((subj, pred, obj))
            phase, pred, obj = "pred_after_semi", None, None
            steps, alt_seqs, pending_inv, after_step = [], [], False, False
            continue
        if m.group("comma"):
            # object list: emit and keep subject + predicate
            if phase != "done":
                raise ValueError(f"',' before a complete triple in: {body!r}")
            patterns.append((subj, pred, obj))
            phase, obj = "obj", None
            continue
        if m.group("caret"):
            if phase != "pred" or after_step:
                raise ValueError("'^' must directly precede a path step IRI")
            pending_inv = True
            continue
        if m.group("pathmod"):
            if phase != "pred" or not after_step:
                raise ValueError("path modifier without a preceding step")
            if steps[-1].many:
                raise ValueError("double path modifier on one step")
            steps[-1] = PathStep(
                steps[-1].iri, steps[-1].inverse, m.group("pathmod"),
                steps[-1].neg, steps[-1].neg_inv,
            )
            continue
        if m.group("slash"):
            if phase != "pred" or not after_step:
                raise ValueError("'/' without a preceding path step")
            after_step = False
            continue
        if m.group("pipe"):
            if phase != "pred" or not after_step:
                raise ValueError("'|' without a completed path alternative")
            alt_seqs.append(tuple(steps))
            steps = []
            after_step = False
            continue
        term = _term_of(m, prefixes)
        if phase == "subj":
            subj = term
            phase = "pred"
        elif phase == "pred":
            if after_step:  # the path ended; this term is the object
                pred = finish_pred()
                obj = term
                phase = "done"
            elif isinstance(term, Var):
                if steps or pending_inv:
                    raise ValueError("a variable cannot appear inside a property path")
                pred = term
                phase = "obj"
            elif isinstance(term, Lit):
                raise ValueError("literal in predicate position")
            else:
                steps.append(PathStep(term.iri, pending_inv, ""))
                pending_inv = False
                after_step = True
        elif phase == "obj":
            obj = term
            phase = "done"
        else:
            raise ValueError(f"unexpected term after the object in: {body!r}")
    if phase == "done":
        # the grammar permits omitting the '.' after the block's final triple
        patterns.append((subj, pred, obj))
    elif phase not in ("subj", "pred_after_semi"):  # trailing ';' is legal too
        raise ValueError("BGP body ends mid-statement (missing '.')")
    return patterns


def _next_structural(body: str, i: int) -> int:
    """First index ≥ i where an OPTIONAL/FILTER/'{' construct starts (quote-
    and IRI-aware so keyword lookalikes inside literals don't trigger)."""
    n = len(body)
    j = i
    while j < n:
        c = body[j]
        if c == '"':
            j = _skip_string(body, j)
            continue
        if c == "<":
            k = body.find(">", j + 1)
            j = k + 1 if k != -1 else j + 1
            continue
        if c == "{":
            return j
        if re.match(
            r"(?i)(?:OPTIONAL\s*\{|FILTER\s*\(|FILTER\s+(?:NOT\s+)?EXISTS\s*\{"
            r"|MINUS\s*\{|VALUES\s*[(?]|BIND\s*\(|GRAPH\s+[?<A-Za-z])",
            body[j:],
        ) and (j == 0 or not (body[j - 1].isalnum() or body[j - 1] in "_:?")):
            return j
        j += 1
    return n


def _binding_of(term: Term) -> str:
    """The binding-encoded string a constant term contributes (VALUES rows)."""
    if isinstance(term, Iri):
        return term.iri
    if isinstance(term, Lit):
        return lit_binding(term.lex, term.dt)
    raise ValueError("variable inside a VALUES data row")


def _parse_values(block: str, vars_text: str, prefixes: dict[str, str]):
    """One VALUES block -> (var names, rows of binding strings)."""
    if re.search(r"(?i)\bUNDEF\b", block):
        raise ValueError(
            "UNDEF in VALUES is not supported (unbound-compatible join"
            " semantics diverge from SQL null joins)"
        )
    names = tuple(v[1:] for v in re.findall(r"\?[A-Za-z_][A-Za-z0-9_]*", vars_text))
    if not names:
        raise ValueError("VALUES with no variables")
    terms: list[str] = []
    rows: list[tuple[str, ...]] = []
    depth_rows = "(" in block
    if depth_rows:
        for mrow in re.finditer(r"\(([^()]*)\)", block):
            row = [
                _binding_of(t)
                for t in (_term_of(m, prefixes) for m in _TERM_RE.finditer(mrow.group(1)))
                if t is not None
            ]
            if len(row) != len(names):
                raise ValueError(
                    f"VALUES row width {len(row)} != variable count {len(names)}"
                )
            rows.append(tuple(row))
    else:
        if len(names) != 1:
            raise ValueError("multi-variable VALUES rows must be parenthesized")
        terms = [
            _binding_of(t)
            for t in (_term_of(m, prefixes) for m in _TERM_RE.finditer(block))
            if t is not None
        ]
        rows = [(v,) for v in terms]
    if not rows:
        raise ValueError("empty VALUES block")
    return names, tuple(rows)


def _parse_group(body: str, prefixes: dict[str, str], in_graph: bool = False) -> Group:
    """Parse one group graph pattern body (text between its braces)."""
    for bad in ("SERVICE",):
        # reject before structure-parsing: a loud error beats silent misparse
        if re.search(rf"(?i)\b{bad}\s*[({{]", body) or re.search(
            rf"(?i)\b{bad}\s+[?<]", body
        ):
            raise ValueError(f"unsupported SPARQL construct in executor: {bad}")
    filters: list[str] = []
    graphs: list[tuple[Term, Group]] = []
    optionals: list[Group] = []
    unions: list[list[Group]] = []
    exists: list[Group] = []
    not_exists: list[Group] = []
    minuses: list[Group] = []
    values_blocks: list = []
    binds: list[tuple[str, str]] = []
    subselects: list[ParsedQuery] = []
    plain: list[str] = []
    i, n = 0, len(body)
    while i < n:
        if body[i].isspace():
            i += 1
            continue
        mg = re.match(
            r"(?i)GRAPH\s+(\?[A-Za-z_][A-Za-z0-9_]*|<[^<>]*>|[A-Za-z][\w.-]*:[\w.%-]+)\s*\{",
            body[i:],
        )
        if mg:
            if in_graph:
                raise ValueError(
                    "nested GRAPH inside GRAPH is not supported — the inner"
                    " clause would address the full dataset, not the outer"
                    " graph's scope, and this executor scopes by filtering"
                )
            tok = mg.group(1)
            if tok.startswith("?"):
                gterm: Term = Var(tok[1:])
            elif tok.startswith("<"):
                gterm = Iri(tok[1:-1])
            else:
                gterm = Iri(_resolve_pname(tok, prefixes))
            start = i + mg.end() - 1
            end = _matching(body, start, "{", "}")
            graphs.append(
                (gterm, _parse_group(body[start + 1 : end], prefixes, in_graph=True))
            )
            i = end + 1
            continue
        mo = re.match(r"(?i)OPTIONAL\s*\{", body[i:])
        if mo:
            start = i + mo.end() - 1
            end = _matching(body, start, "{", "}")
            optionals.append(_parse_group(body[start + 1 : end], prefixes))
            i = end + 1
            continue
        me = re.match(r"(?i)FILTER\s+(NOT\s+)?EXISTS\s*\{", body[i:])
        if me:
            start = i + me.end() - 1
            end = _matching(body, start, "{", "}")
            sub = _parse_group(body[start + 1 : end], prefixes)
            (not_exists if me.group(1) else exists).append(sub)
            i = end + 1
            continue
        mm = re.match(r"(?i)MINUS\s*\{", body[i:])
        if mm:
            start = i + mm.end() - 1
            end = _matching(body, start, "{", "}")
            minuses.append(_parse_group(body[start + 1 : end], prefixes))
            i = end + 1
            continue
        mv = re.match(r"(?i)VALUES\s*(\([^)]*\)|\?[A-Za-z_][A-Za-z0-9_]*)\s*\{", body[i:])
        if mv:
            start = i + mv.end() - 1
            end = _matching(body, start, "{", "}")
            values_blocks.append(
                _parse_values(body[start + 1 : end], mv.group(1), prefixes)
            )
            i = end + 1
            continue
        mb = re.match(r"(?i)BIND\s*\(", body[i:])
        if mb:
            start = i + mb.end() - 1
            end = _matching(body, start, "(", ")")
            inner = body[start + 1 : end]
            # greedy .* → the LAST "AS ?var" tail, so string constants that
            # happen to contain " AS " don't split the expression early
            ma = re.match(r"(?is)^(.*)\bAS\s+\?([A-Za-z_][A-Za-z0-9_]*)\s*$", inner)
            if not ma:
                raise ValueError("BIND must have the form BIND(expr AS ?var)")
            binds.append((ma.group(1).strip(), ma.group(2)))
            i = end + 1
            continue
        mf = re.match(r"(?i)FILTER\s*\(", body[i:])
        if mf:
            start = i + mf.end() - 1
            end = _matching(body, start, "(", ")")
            filters.append(body[start + 1 : end])
            i = end + 1
            continue
        if body[i] == "{":
            end0 = _matching(body, i, "{", "}")
            inner0 = body[i + 1 : end0]
            if re.match(r"(?is)\s*SELECT\b", inner0):
                # nested subquery: evaluated independently, its projection
                # joins the outer group on shared variables. Parsed with
                # the OUTER prefixes prepended (a subquery has no PREFIX
                # block of its own).
                if re.match(r"(?i)\s*UNION\s*\{", body[end0 + 1 :]):
                    raise ValueError("a subquery cannot be a UNION branch")
                header = "\n".join(
                    f"PREFIX {p}: <{ns}>" for p, ns in prefixes.items()
                )
                subselects.append(parse_query(header + "\n" + inner0))
                i = end0 + 1
                continue
            branches: list[Group] = []
            j = i
            while True:
                end = _matching(body, j, "{", "}")
                if re.match(r"(?is)\s*SELECT\b", body[j + 1 : end]):
                    raise ValueError("a subquery cannot be a UNION branch")
                branches.append(_parse_group(body[j + 1 : end], prefixes))
                mu = re.match(r"(?i)\s*UNION\s*\{", body[end + 1 :])
                if not mu:
                    i = end + 1
                    break
                j = end + 1 + mu.end() - 1
            if len(branches) < 2:
                raise ValueError("braced group without UNION — flatten it into the BGP")
            unions.append(branches)
            continue
        nxt = _next_structural(body, i)
        if nxt == i:  # structural start the dispatch above didn't take: malformed
            raise ValueError(f"malformed group graph pattern near: {body[i:i+40]!r}")
        plain.append(body[i:nxt])
        i = nxt
    patterns = _parse_statements(" ".join(plain), prefixes)
    return Group(
        patterns, filters, optionals, unions,
        tuple(exists), tuple(not_exists), tuple(minuses), tuple(values_blocks),
        tuple(binds), tuple(subselects), tuple(graphs),
    )


def parse_query(text: str) -> ParsedQuery:
    """Parse the subset the generator emits plus the common query-side
    constructs: PREFIX declarations, ``SELECT [DISTINCT]``, a WHERE group
    with triple statements, ``OPTIONAL { … }``, ``FILTER(…)``,
    ``{ … } UNION { … }``, and trailing ``ORDER BY`` / ``LIMIT`` /
    ``OFFSET``. Anything else (SERVICE/…) raises — a loud error
    beats silently wrong bindings."""
    # strip full-line comments ('#' appears inside IRIs, so only line starts)
    text = "\n".join(
        ln for ln in text.split("\n") if not ln.lstrip().startswith("#")
    )
    prefixes: dict[str, str] = {}
    for m in re.finditer(r"(?i)\bprefix\s+([A-Za-z][\w.-]*):\s*<([^<>]*)>", text):
        prefixes[m.group(1)] = m.group(2)

    mform = re.search(r"(?i)\b(select|construct|ask|describe)\b", text)
    if not mform:
        raise ValueError("no SELECT / CONSTRUCT / ASK / DESCRIBE in SPARQL text")
    form = mform.group(1).lower()

    if form == "describe":
        rest = text[mform.end() :]
        brace = rest.find("{")
        head = rest if brace == -1 else rest[:brace]
        dvars = re.findall(r"\?[A-Za-z_][A-Za-z0-9_]*", head)
        iris = [m[1:-1] for m in re.findall(r"<[^<>]*>", head)]
        iris += [
            _resolve_pname(p, prefixes)
            for p in re.findall(r"(?<![<?\w])([A-Za-z][\w.-]*:[\w.%-]+)", head)
            if not re.match(r"(?i)where$", p)
        ]
        if not dvars and not iris:
            raise ValueError("DESCRIBE with no targets")
        group = None
        if brace != -1:
            open_idx = mform.end() + brace
            close_idx = _matching(text, open_idx, "{", "}")
            group = _parse_group(text[open_idx + 1 : close_idx], prefixes)
        elif dvars:
            raise ValueError("DESCRIBE ?var requires a WHERE group")
        return ParsedQuery(
            dvars, False, group.patterns if group else [], prefixes,
            group=group, form="describe", describe_iris=tuple(iris),
        )

    if form in ("construct", "ask"):
        template: tuple[Pattern, ...] = ()
        pos = mform.end()
        if form == "construct" and re.search(
            r"(?i)\bwhere\b", text[pos : text.index("{", pos)]
        ):
            # §10.2.3 CONSTRUCT WHERE { BGP } shorthand: the pattern IS the
            # template; only a plain BGP is legal in this form
            open_idx = text.index("{", pos)
            close_idx = _matching(text, open_idx, "{", "}")
            group = _parse_group(text[open_idx + 1 : close_idx], prefixes)
            if (
                group.filters or group.optionals or group.unions or group.binds
                or group.exists or group.not_exists or group.minuses
                or group.values or group.subselects or group.graphs
            ):
                raise ValueError("CONSTRUCT WHERE takes a plain BGP (§10.2.3)")
            for s, p, o in group.patterns:
                if isinstance(p, Path):
                    raise ValueError("property path in a CONSTRUCT WHERE pattern")
            if not group.patterns:
                raise ValueError("empty CONSTRUCT WHERE pattern")
            tail = text[close_idx + 1 :]
            ml = re.search(r"(?i)\blimit\s+(\d+)", tail)
            return ParsedQuery(
                [], False, group.patterns, prefixes, group=group,
                limit=int(ml.group(1)) if ml else None,
                form="construct", template=tuple(group.patterns),
            )
        if form == "construct":
            topen = text.index("{", pos)
            tclose = _matching(text, topen, "{", "}")
            template = tuple(_parse_statements(text[topen + 1 : tclose], prefixes))
            if not template:
                raise ValueError("empty CONSTRUCT template")
            for s, p, o in template:
                if isinstance(p, Path):
                    raise ValueError("property path in a CONSTRUCT template")
            pos = tclose + 1
        open_idx = text.index("{", pos)
        close_idx = _matching(text, open_idx, "{", "}")
        group = _parse_group(text[open_idx + 1 : close_idx], prefixes)
        tail = text[close_idx + 1 :]
        if re.search(r"(?i)\b(order\s+by|group\s+by|having)\b", tail):
            raise ValueError(f"solution modifiers are not supported on {form.upper()}")
        ml = re.search(r"(?i)\blimit\s+(\d+)", tail)
        return ParsedQuery(
            [],
            False,
            group.patterns,
            prefixes,
            group=group,
            limit=int(ml.group(1)) if ml else None,
            form=form,
            template=template,
        )

    msel = re.search(r"(?is)\bselect\b(.*?)\{", text)
    if not msel:
        raise ValueError("no SELECT … { in SPARQL text")
    head = re.sub(r"(?i)\bwhere\b", " ", msel.group(1))
    # DISTINCT must follow SELECT directly — \bdistinct\b anywhere would
    # false-positive on COUNT(DISTINCT ?v)
    distinct = bool(re.match(r"(?i)\s*distinct\b", head))
    if distinct:
        head = re.sub(r"(?i)^\s*distinct\b", " ", head)
    elif re.match(r"(?i)\s*reduced\b", head):
        # REDUCED permits (but does not require) duplicate elimination —
        # keeping the bag is a conforming implementation and costs nothing
        head = re.sub(r"(?i)^\s*reduced\b", " ", head)
    select_items: list[SelectItem] = []
    hi, hn = 0, len(head)
    while hi < hn:
        ch = head[hi]
        if ch.isspace():
            hi += 1
            continue
        if ch == "(":
            hend = _matching(head, hi, "(", ")")
            chunk = head[hi : hend + 1]
            magg = _SEL_AGG_RE.fullmatch(chunk)
            if magg:
                tgt = magg.group("tgt")
                agg = magg.group("agg").lower()
                if tgt == "*" and agg != "count":
                    raise ValueError(f"{agg.upper()}(*) is not a SPARQL aggregate")
                select_items.append(
                    SelectItem(
                        agg=agg,
                        target=tgt if tgt == "*" else tgt[1:],
                        distinct=bool(magg.group("dist")),
                        alias=magg.group("alias")[1:],
                        sep=_unescape(magg.group("sep")) if magg.group("sep") is not None else None,
                    )
                )
            else:
                # projection expression: (expr AS ?alias), the BIND grammar
                ma = re.match(
                    r"(?is)^(.*)\bAS\s+\?([A-Za-z_][A-Za-z0-9_]*)\s*$", chunk[1:-1]
                )
                if not ma:
                    raise ValueError(f"unsupported SELECT item: {chunk!r}")
                select_items.append(
                    SelectItem(expr=ma.group(1).strip(), alias=ma.group(2))
                )
            hi = hend + 1
            continue
        mp = re.match(r"\?[A-Za-z_][A-Za-z0-9_]*", head[hi:])
        if mp:
            select_items.append(SelectItem(var=mp.group(0)[1:]))
            hi += mp.end()
            continue
        if ch == "*":  # SELECT * — no explicit items
            hi += 1
            continue
        raise ValueError(f"unsupported SELECT head near: {head[hi:hi+30]!r}")
    select_vars = ["?" + (it.var or it.alias) for it in select_items]

    open_idx = msel.end() - 1
    close_idx = _matching(text, open_idx, "{", "}")
    group = _parse_group(text[open_idx + 1 : close_idx], prefixes)

    tail = text[close_idx + 1 :]
    having: str | None = None
    having_aggs: list[SelectItem] = []
    mh = re.search(
        r"(?is)\bhaving\b(.*?)(?=\border\b|\blimit\b|\boffset\b|$)", tail
    )
    if mh:
        having, having_aggs = _rewrite_having(mh.group(1).strip())
    mg = re.search(
        r"(?is)\bgroup\s+by\b(.*?)(?=\bhaving\b|\border\b|\blimit\b|\boffset\b|$)",
        tail,
    )
    group_by = (
        tuple(v[1:] for v in re.findall(r"\?[A-Za-z_][A-Za-z0-9_]*", mg.group(1)))
        if mg
        else ()
    )
    order_by: list[tuple[str, bool]] = []
    mo = re.search(r"(?is)\border\s+by\b(.*?)(?=\blimit\b|\boffset\b|$)", tail)
    if mo:
        for mm in re.finditer(
            r"(?i)(?:(asc|desc)\s*\(\s*(\?\w+)\s*\))|(\?\w+)", mo.group(1)
        ):
            if mm.group(3):
                order_by.append((mm.group(3)[1:], False))
            else:
                order_by.append((mm.group(2)[1:], mm.group(1).lower() == "desc"))
    ml = re.search(r"(?i)\blimit\s+(\d+)", tail)
    mof = re.search(r"(?i)\boffset\s+(\d+)", tail)

    return ParsedQuery(
        select_vars,
        distinct,
        group.patterns,
        prefixes,
        group=group,
        order_by=tuple(order_by),
        limit=int(ml.group(1)) if ml else None,
        offset=int(mof.group(1)) if mof else None,
        select_items=tuple(select_items),
        group_by=group_by,
        having=having,
        having_aggs=tuple(having_aggs),
    )


def _rewrite_having(body: str) -> tuple[str, list[SelectItem]]:
    """Rewrite a HAVING constraint list into (filter text over hidden
    ``?__hN`` variables, hidden aggregate items). Each aggregate call
    becomes one extra aggregate column (deduplicated on the call's
    normalized shape); multiple top-level parenthesized constraints —
    SPARQL's ``HAVING (c1) (c2)`` — conjoin with ``&&``."""
    items: list[SelectItem] = []
    seen: dict[tuple, str] = {}

    def sub(m: re.Match) -> str:
        tgt = m.group("tgt")
        key = (
            m.group("agg").lower(),
            tgt,
            bool(m.group("dist")),
            m.group("sep"),
        )
        if key not in seen:
            alias = f"__h{len(seen)}"
            seen[key] = alias
            items.append(
                SelectItem(
                    agg=key[0],
                    target=tgt if tgt == "*" else tgt[1:],
                    distinct=key[2],
                    alias=alias,
                    sep=_unescape(key[3]) if key[3] is not None else None,
                )
            )
        return "?" + seen[key]

    rewritten = _HAVING_AGG_RE.sub(sub, body).strip()
    if not rewritten:
        raise ValueError("empty HAVING clause")
    # split top-level parenthesized constraints and conjoin
    parts: list[str] = []
    i, n = 0, len(rewritten)
    while i < n:
        if rewritten[i].isspace():
            i += 1
            continue
        if rewritten[i] != "(":
            parts = [rewritten]  # single unparenthesized constraint
            break
        end = _matching(rewritten, i, "(", ")")
        parts.append(rewritten[i : end + 1])
        i = end + 1
    return " && ".join(parts), items


#: named-graph IRI namespace: each triple's lineage conversation is its
#: named graph, `urn:conv:<conv_id>`. Triples with NULL conv_id (derived /
#: vocabulary triples) live only in the default graph. The default graph is
#: the UNION of everything (Jena's common "union default graph" dataset
#: configuration), so a query without GRAPH sees the whole frame.
GRAPH_NS = "urn:conv:"


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


def _graph_terms(triples: DataFrame) -> DataFrame:
    """Every RDF term occurring in the graph, one column ``n`` — the
    zero-length-path universe of ``p*`` / ``p?`` (W3C ZeroOrMorePath /
    ZeroOrOnePath: the zero-length path relates each graph term to itself).
    One distinct exchange over (subjects ∪ object bindings); predicates-only
    terms are not path endpoints and are excluded, matching the spec's node
    evaluation. Deviation, documented: a ground subject/object NOT occurring
    in the graph does not zero-length-match itself here (the spec's ALP
    start-node rule); the restriction is to graph terms."""
    return (
        triples.select(F.col("subj").alias("n"))
        .unionByName(triples.select(_object_binding().alias("n")))
        .distinct()
    )


def _step_edges(triples: DataFrame, step: PathStep) -> DataFrame:
    """(src, dst) edge relation for one path step. The predicate constant is
    a pushed-down filter on the scan BEFORE any closure, so a ``p+`` only
    ever closes over p-edges, never the whole graph. ``p*`` is the
    transitive closure ∪ the zero-length self-pairs over graph terms; ``p?``
    the direct edges ∪ the self-pairs — both sets (distinct), per the spec's
    arbitrary-length-path evaluation."""
    if step.negated:
        # SPARQL 1.1 §9.1 NPS translation: !(p1|…|^q1|…) = forward edges
        # whose predicate ∉ {p…} ∪ inverse edges whose predicate ∉ {q…};
        # a direction with no negated members contributes nothing. The
        # NOT-IN compiles to a pushed-down scan predicate.
        parts = []
        if step.neg is not None:
            parts.append(
                triples.filter(~F.col("pred").isin(*step.neg)).select(
                    F.col("subj").alias("src"), _object_binding().alias("dst")
                )
            )
        if step.neg_inv is not None:
            parts.append(
                triples.filter(~F.col("pred").isin(*step.neg_inv)).select(
                    _object_binding().alias("src"), F.col("subj").alias("dst")
                )
            )
        edges = parts[0]
        for p in parts[1:]:
            edges = edges.unionByName(p)
        if step.inverse:  # '^!(…)': invert the whole NPS relation
            edges = edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
    else:
        df = triples.filter(F.col("pred") == step.iri)
        src: F.Column = F.col("subj")
        dst: F.Column = _object_binding()
        if step.inverse:
            src, dst = dst, src
        edges = df.select(src.alias("src"), dst.alias("dst"))
    if step.many in ("+", "*"):
        from rdfcmap_spark.operators.graph import transitive_closure

        edges = transitive_closure(edges)
    if step.many in ("*", "?"):
        self_pairs = _graph_terms(triples).select(
            F.col("n").alias("src"), F.col("n").alias("dst")
        )
        edges = edges.unionByName(self_pairs).distinct()
    return edges


def _seq_edges(triples: DataFrame, seq: tuple[PathStep, ...]) -> DataFrame:
    """Compose one ``/``-sequence of steps by equi-join."""
    acc = _step_edges(triples, seq[0])
    for st in seq[1:]:
        nxt = _step_edges(triples, st)
        acc = (
            acc.alias("l")
            .join(nxt.alias("r"), F.col("l.dst") == F.col("r.src"))
            .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
        )
    return acc


def _path_frame(triples: DataFrame, pat: Pattern) -> tuple[DataFrame, list[str]]:
    """A pattern whose predicate is a property path: compose each
    ``/``-sequence's step edge relations by equi-join, bag-union the
    ``|``-alternatives (SPARQL translates simple alternation to UNION, so a
    pair reachable through both alternatives yields two solutions), then
    apply the subject/object constants or variable bindings exactly like a
    plain pattern."""
    s, path, o = pat
    acc = _seq_edges(triples, path.steps)
    for alt in path.alts:
        acc = acc.unionByName(_seq_edges(triples, alt))
    df = acc
    bind: dict[str, F.Column] = {}
    if isinstance(s, Var):
        bind[s.name] = F.col("src")
    elif isinstance(s, Iri):
        df = df.filter(F.col("src") == s.iri)
    else:
        raise ValueError("literal in subject position")
    if isinstance(o, Var):
        if o.name in bind:
            df = df.filter(F.col("src") == F.col("dst"))  # ?x p+ ?x: cycles
        else:
            bind[o.name] = F.col("dst")
    elif isinstance(o, Iri):
        df = df.filter(F.col("dst") == o.iri)
    else:
        df = df.filter(F.col("dst") == lit_binding(o.lex, o.dt))
    if not bind:  # fully ground path: pure existence constraint
        probe = df.select(F.lit(1).alias("__exists")).limit(1)
        return probe, []
    out = df.select(*[c.alias(n) for n, c in bind.items()])
    return out, list(bind)


def _pattern_frame(
    triples: DataFrame, pat: Pattern, graph_var: str | None = None
) -> tuple[DataFrame, list[str]]:
    """One pattern -> (frame of binding columns, bound var names). Constants
    become filters (pushed to the scan); a variable repeated inside the
    pattern adds the equality filter its semantics require. Inside
    ``GRAPH ?g { … }`` each pattern additionally binds ``graph_var`` to the
    lineage graph IRI, so same-group patterns co-scope by the join."""
    s, p, o = pat
    if isinstance(p, Path):
        if graph_var is not None:
            raise ValueError(
                "property paths inside GRAPH ?var are not supported — the"
                " closure would have to be computed per graph"
            )
        return _path_frame(triples, pat)
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
    if graph_var is not None:
        gcol = F.concat(F.lit(GRAPH_NS), F.col("conv_id"))
        if graph_var in seen:  # GRAPH ?g { ?g … }: equality, not rebinding
            df = df.filter(seen[graph_var] == gcol)
        else:
            seen[graph_var] = gcol
    if not seen:  # fully ground pattern: pure existence constraint
        probe = df.select(F.lit(1).alias("__exists")).limit(1)
        return probe, []
    out = df.select(*[c.alias(n) for n, c in seen.items()])
    return out, list(seen)


# ---------------------------------------------------------------- FILTERs

_XSD = "http://www.w3.org/2001/XMLSchema#"
_NUMERIC_DTS = {
    _XSD + t
    for t in (
        "integer", "int", "long", "short", "byte", "decimal", "double", "float",
        "nonNegativeInteger", "positiveInteger", "negativeInteger",
        "nonPositiveInteger", "unsignedInt", "unsignedLong",
    )
}

_F_TOK_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<str>"(?:[^"\\]|\\.)*")(?:\^\^(?P<dt><[^<>]*>|[A-Za-z][\w.-]*:[\w.-]+))?
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<iri><[^<>]*>)
    | (?P<pname>[A-Za-z][\w.-]*:[\w.%-]+)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>&&|\|\||!=|<=|>=|=|<|>|!|\(|\)|,|\+|-|\*|/)
    """,
    re.VERBOSE,
)


@dataclass
class _Opnd:
    """A FILTER/BIND operand: a variable binding, a constant, or a computed
    column — 'lex' holds a lexical-form column, 'numcol' a double column
    (arithmetic results), 'bind' a fully binding-encoded column (IF/COALESCE
    passthrough)."""

    kind: str  #: 'var' | 'num' | 'str' | 'iri' | 'lex' | 'numcol' | 'bind'
    name: str | None = None
    num: float | None = None
    s: str | None = None
    dt: str | None = None
    col: F.Column | None = None  #: for kind in ('lex', 'numcol', 'bind')


def _lex_of(col: F.Column) -> F.Column:
    """Lexical form of a binding column: strip the `"lex"^^dt` literal
    encoding (greedy match → last `"^^`), pass IRIs through."""
    return F.when(
        col.startswith('"'), F.regexp_extract(col, r'^"(.*)"\^\^', 1)
    ).otherwise(col)


def _opnd_lex(o: _Opnd) -> F.Column:
    if o.kind == "var":
        return _lex_of(F.col(o.name))
    if o.kind == "lex":
        return o.col
    if o.kind == "numcol":
        return o.col.cast("string")
    if o.kind == "bind":
        return _lex_of(o.col)
    if o.kind in ("str", "iri"):
        return F.lit(o.s)
    return F.lit(repr(o.num))


def _opnd_num(o: _Opnd) -> F.Column:
    """Numeric value; a non-numeric lexical becomes NULL (try_cast), mapping
    SPARQL's comparison *type error* onto SQL NULL → row dropped, which is
    exactly the SPARQL error→false FILTER rule."""
    if o.kind == "num":
        return F.lit(o.num)
    if o.kind == "numcol":
        return o.col
    if o.kind == "str":
        return F.lit(float(o.s))
    return _opnd_lex(o).try_cast("double")


_CMP = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
}


def _compare(op: str, l: _Opnd, r: _Opnd) -> F.Column:
    def numeric(o: _Opnd) -> bool:
        return (
            o.kind in ("num", "numcol")
            or (o.kind == "str" and o.dt in _NUMERIC_DTS)
        )

    if numeric(l) or numeric(r):
        return _CMP[op](_opnd_num(l), _opnd_num(r))
    if l.kind == "iri" or r.kind == "iri":
        if op not in ("=", "!="):
            raise ValueError(f"ordering comparison on IRIs: {op}")

        def b(o: _Opnd) -> F.Column:
            if o.kind == "var":
                return F.col(o.name)
            if o.kind in ("lex", "bind"):  # computed column (e.g. DATATYPE)
                return o.col
            return F.lit(o.s)

        return _CMP[op](b(l), b(r))
    if l.kind == "var" and r.kind == "var":
        if op in ("=", "!="):  # term equality on the full binding encoding
            return _CMP[op](F.col(l.name), F.col(r.name))
        # dynamic typing: numeric when both lexicals parse, else string order
        ln, rn = _opnd_num(l), _opnd_num(r)
        return F.when(
            ln.isNotNull() & rn.isNotNull(), _CMP[op](ln, rn)
        ).otherwise(_CMP[op](_opnd_lex(l), _opnd_lex(r)))
    return _CMP[op](_opnd_lex(l), _opnd_lex(r))


def _binding_encode(o: _Opnd) -> F.Column:
    """A value expression's result as a binding-encoded column (module
    docstring encoding: raw IRI strings, ``"lex"^^dt`` literals). A NULL
    lexical propagates to a NULL binding — SPARQL's expression-error →
    unbound BIND rule."""
    if o.kind == "var":
        return F.col(o.name)
    if o.kind == "bind":
        return o.col
    if o.kind == "iri":
        return F.lit(o.s)
    if o.kind == "num":
        return F.lit(f'"{o.num}"^^{vocab.XSD_DOUBLE}')
    if o.kind == "numcol":
        return F.concat(
            F.lit('"'), o.col.cast("string"), F.lit('"^^' + vocab.XSD_DOUBLE)
        )
    if o.kind == "str":
        return F.lit(f'"{o.s}"^^{o.dt or vocab.XSD_STRING}')
    return F.concat(F.lit('"'), o.col, F.lit('"^^' + vocab.XSD_STRING))  # lex


def _num_binop(op: str, l: _Opnd, r: _Opnd) -> _Opnd:
    """Arithmetic evaluated in double; non-numeric lexicals are NULL
    (try_cast) and division by zero is NULL (try_divide), not an ANSI
    throw — both map SPARQL expression errors onto unbound results."""
    ln, rn = _opnd_num(l), _opnd_num(r)
    if op == "/":
        col = F.try_divide(ln, rn)
    else:
        col = {"+": ln + rn, "-": ln - rn, "*": ln * rn}[op]
    return _Opnd("numcol", col=col)


class _FilterParser:
    """Recursive-descent FILTER/BIND expression → pyspark Column (boolean
    for FILTER via :meth:`parse`, binding-encoded for BIND via
    :meth:`parse_value`)."""

    def __init__(self, text: str, prefixes: dict[str, str], bound: set[str]):
        self.toks: list[tuple[str, str, str | None]] = []
        pos = 0
        while pos < len(text):
            m = _F_TOK_RE.match(text, pos)
            if not m:
                raise ValueError(f"bad FILTER token near: {text[pos:pos+20]!r}")
            pos = m.end()
            kind = m.lastgroup if m.lastgroup != "dt" else "str"
            if kind == "ws":
                continue
            self.toks.append((kind, m.group(kind), m.group("dt") if kind == "str" else None))
        self.i = 0
        self.prefixes = prefixes
        self.bound = bound

    def _peek(self) -> tuple[str, str, str | None] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str, str | None]:
        t = self._peek()
        if t is None:
            raise ValueError("FILTER expression ends unexpectedly")
        self.i += 1
        return t

    def _expect_op(self, text: str) -> None:
        t = self._next()
        if t[0] != "op" or t[1] != text:
            raise ValueError(f"expected {text!r} in FILTER, got {t[1]!r}")

    def parse(self) -> F.Column:
        c = self._or()
        if self._peek() is not None:
            raise ValueError(f"trailing FILTER tokens: {self.toks[self.i:]}")
        return c

    def parse_value(self) -> F.Column:
        o = self._operand()
        if self._peek() is not None:
            raise ValueError(f"trailing BIND tokens: {self.toks[self.i:]}")
        return _binding_encode(o)

    def _or(self) -> F.Column:
        c = self._and()
        while (t := self._peek()) and t[0] == "op" and t[1] == "||":
            self._next()
            c = c | self._and()
        return c

    def _and(self) -> F.Column:
        c = self._unary()
        while (t := self._peek()) and t[0] == "op" and t[1] == "&&":
            self._next()
            c = c & self._unary()
        return c

    def _unary(self) -> F.Column:
        t = self._peek()
        if t and t[0] == "op" and t[1] == "!":
            self._next()
            return ~self._unary()
        return self._primary()

    def _var(self, tok: tuple[str, str, str | None]) -> str:
        name = tok[1][1:]
        if name not in self.bound:
            raise ValueError(f"FILTER references a variable the group never binds: ?{name}")
        return name

    def _primary(self) -> F.Column:
        t = self._peek()
        if t and t[0] == "op" and t[1] == "(":
            save = self.i
            self._next()
            try:
                c = self._or()
                self._expect_op(")")
                return c
            except ValueError:
                # not a boolean group — backtrack and re-read it as an
                # arithmetic group heading a comparison: ((?a + 1) * 2 > 4)
                self.i = save
        if t and t[0] == "name" and t[1].lower() in (
            "bound", "regex", "contains", "strstarts", "strends", "isiri", "isuri",
            "isliteral", "langmatches", "isnumeric", "isblank", "sameterm",
        ):
            return self._call(self._next()[1].lower())
        left = self._operand()
        t = self._peek()
        if t and t[0] == "op" and t[1] in _CMP:
            op = self._next()[1]
            return _compare(op, left, self._operand())
        if t and t[0] == "name" and t[1].lower() in ("in", "not"):
            # SPARQL §17.4.1.9: ?x IN (e1, e2) ≡ ?x = e1 || ?x = e2;
            # NOT IN is its negation. IN () is false, NOT IN () true.
            neg = t[1].lower() == "not"
            self._next()
            if neg:
                t2 = self._next()
                if t2[0] != "name" or t2[1].lower() != "in":
                    raise ValueError("expected IN after NOT in FILTER")
            self._expect_op("(")
            if (p := self._peek()) and p[0] == "op" and p[1] == ")":
                self._next()
                items: list[_Opnd] = []
            else:
                items = self._args_until_close()
            c: F.Column | None = None
            for it in items:
                eq = _compare("=", left, it)
                c = eq if c is None else (c | eq)
            if c is None:
                c = F.lit(False)
            return ~c if neg else c
        raise ValueError("FILTER operand is not part of a comparison or boolean call")

    def _call(self, fn: str) -> F.Column:
        self._expect_op("(")
        if fn == "bound":
            name = self._var(self._next())
            self._expect_op(")")
            return F.col(name).isNotNull()
        if fn in ("isiri", "isuri", "isliteral", "isblank", "isnumeric"):
            name = self._var(self._next())
            self._expect_op(")")
            b = F.col(name)
            lit = b.startswith('"')
            if fn == "isliteral":
                return lit
            if fn == "isblank":
                # only raw `_:` labels read as blank; skolemized bnodes are
                # IRIs by design (RDF 1.1 skolemization is semantics-preserving)
                return b.startswith("_:")
            if fn == "isnumeric":
                # numeric literal with a valid lexical form (§17.4.2.4)
                dt = F.regexp_extract(b, r'^".*"\^\^(.*)$', 1)
                return (
                    lit
                    & dt.isin(*sorted(_NUMERIC_DTS))
                    & _lex_of(b).try_cast("double").isNotNull()
                )
            return b.isNotNull() & ~lit & ~b.startswith("_:")
        if fn == "sameterm":
            a = self._operand()
            self._expect_op(",")
            b2 = self._operand()
            self._expect_op(")")
            # the binding encoding is collision-free, so term identity is
            # plain string equality — no numeric value-promotion (unlike '=')
            return _binding_encode(a) == _binding_encode(b2)
        a = self._operand()
        self._expect_op(",")
        if fn == "regex":
            pat_tok = self._next()
            if pat_tok[0] != "str":
                raise ValueError("regex() pattern must be a string literal")
            pat = _unescape(pat_tok[1][1:-1])
            flags = ""
            if (t := self._peek()) and t[0] == "op" and t[1] == ",":
                self._next()
                ftok = self._next()
                if ftok[0] != "str":
                    raise ValueError("regex() flags must be a string literal")
                known = {"i", "s", "m"}
                got = set(ftok[1][1:-1])
                if not got <= known:
                    raise ValueError(f"unsupported regex flags: {sorted(got - known)}")
                flags = "".join(sorted(got))
            self._expect_op(")")
            if flags:
                pat = f"(?{flags}){pat}"
            return _opnd_lex(a).rlike(pat)
        b = self._operand()
        self._expect_op(")")
        la, lb = _opnd_lex(a), _opnd_lex(b)
        if fn == "langmatches":
            # RFC 4647 basic filtering: "*" matches any tagged literal;
            # a range matches the tag itself or any subtag extension
            # (langMatches("en-US" tag, "en") is true)
            la_low, lb_low = F.lower(la), F.lower(lb)
            return F.when(lb == "*", la != "").otherwise(
                (la_low == lb_low) | la_low.startswith(F.concat(lb_low, F.lit("-")))
            )
        if fn == "contains":
            return la.contains(lb)
        if fn == "strstarts":
            return la.startswith(lb)
        return la.endswith(lb)  # strends

    def _operand(self) -> _Opnd:
        """Value expression: additive precedence level."""
        left = self._mult()
        while t := self._peek():
            if t[0] == "op" and t[1] in ("+", "-"):
                self._next()
                left = _num_binop(t[1], left, self._mult())
            elif t[0] == "num" and t[1][0] in "+-":
                # the num token swallowed the sign: '?a -1' → num('-1')
                self._next()
                left = _num_binop(t[1][0], left, _Opnd("num", num=float(t[1][1:])))
            else:
                break
        return left

    def _mult(self) -> _Opnd:
        left = self._value_atom()
        while (t := self._peek()) and t[0] == "op" and t[1] in ("*", "/"):
            self._next()
            left = _num_binop(t[1], left, self._value_atom())
        return left

    def _args_until_close(self) -> list[_Opnd]:
        """Comma-separated value expressions up to the closing paren
        (the opening paren is already consumed)."""
        parts = [self._operand()]
        while (t := self._peek()) and t[0] == "op" and t[1] == ",":
            self._next()
            parts.append(self._operand())
        self._expect_op(")")
        return parts

    def _str_const(self, what: str) -> str:
        tok = self._next()
        if tok[0] != "str":
            raise ValueError(f"{what} must be a string literal")
        return _unescape(tok[1][1:-1])

    def _value_atom(self) -> _Opnd:
        t = self._next()
        kind, text, dt = t
        if kind == "op" and text == "(":
            inner = self._operand()
            self._expect_op(")")
            return inner
        if kind == "var":
            self.i -= 1
            return _Opnd("var", name=self._var(self._next()))
        if kind == "num":
            return _Opnd("num", num=float(text))
        if kind == "str":
            dt_iri = None
            if dt:
                dt_iri = dt[1:-1] if dt.startswith("<") else _resolve_pname(dt, self.prefixes)
            return _Opnd("str", s=_unescape(text[1:-1]), dt=dt_iri)
        if kind == "iri":
            return _Opnd("iri", s=text[1:-1])
        if kind == "pname":
            return _Opnd("iri", s=_resolve_pname(text, self.prefixes))
        if kind == "name" and text.lower() == "str":
            self._expect_op("(")
            inner = self._operand()
            self._expect_op(")")
            return _Opnd("lex", col=_opnd_lex(inner))
        if kind == "name" and text.lower() == "lang":
            # the tag rides in the binding's datatype suffix
            # (schemas.py: obj_datatype = rdf:langString@<tag>); '' for
            # plain/typed literals and IRIs, like SPARQL's lang() on
            # untagged literals
            self._expect_op("(")
            name = self._var(self._next())
            self._expect_op(")")
            return _Opnd(
                "lex",
                col=F.regexp_extract(
                    F.col(name), r"\^\^.*langString@([A-Za-z0-9-]+)$", 1
                ),
            )
        if kind == "name" and text.lower() == "datatype":
            # literal bindings carry `"lex"^^<dt>`; lang-tagged ones fold the
            # tag into the datatype (rdf:langString@tag → rdf:langString per
            # spec); a plain `"lex"` literal never occurs (the encoder always
            # writes xsd:string). DATATYPE of an IRI is a type error → NULL
            # → the row drops, SPARQL's error→false FILTER rule.
            self._expect_op("(")
            name = self._var(self._next())
            self._expect_op(")")
            b = F.col(name)
            dt = F.when(b.startswith('"'), F.regexp_extract(b, r'^".*"\^\^(.*)$', 1))
            dt = F.when(
                dt.startswith(vocab.RDF + "langString@"),
                F.lit(vocab.RDF + "langString"),
            ).otherwise(dt)
            return _Opnd("lex", col=dt)
        if kind == "name" and text.lower() == "strlen":
            self._expect_op("(")
            (inner,) = self._args_until_close()
            return _Opnd("numcol", col=F.length(_opnd_lex(inner)).cast("double"))
        if kind == "name" and text.lower() in ("ucase", "lcase"):
            self._expect_op("(")
            (inner,) = self._args_until_close()
            f = F.upper if text.lower() == "ucase" else F.lower
            return _Opnd("lex", col=f(_opnd_lex(inner)))
        if kind == "name" and text.lower() == "concat":
            self._expect_op("(")
            parts = self._args_until_close()
            return _Opnd("lex", col=F.concat(*[_opnd_lex(p) for p in parts]))
        if kind == "name" and text.lower() == "substr":
            self._expect_op("(")
            args = self._args_until_close()
            if len(args) not in (2, 3) or any(a.kind != "num" for a in args[1:]):
                raise ValueError("SUBSTR needs (expr, start[, length]) numeric constants")
            start = int(args[1].num)
            length = int(args[2].num) if len(args) == 3 else (1 << 31) - 1
            return _Opnd("lex", col=F.substring(_opnd_lex(args[0]), start, length))
        if kind == "name" and text.lower() == "replace":
            self._expect_op("(")
            inner = self._operand()
            self._expect_op(",")
            pat = self._str_const("REPLACE() pattern")
            self._expect_op(",")
            rep = self._str_const("REPLACE() replacement")
            self._expect_op(")")
            return _Opnd("lex", col=F.regexp_replace(_opnd_lex(inner), pat, rep))
        if kind == "name" and text.lower() in ("abs", "round", "ceil", "floor"):
            self._expect_op("(")
            (inner,) = self._args_until_close()
            x = _opnd_num(inner)
            fname = text.lower()
            if fname == "abs":
                col = F.abs(x)
            elif fname == "round":
                # XPath fn:round: ties go toward +INF (round(-2.5) = -2),
                # unlike Spark's away-from-zero HALF_UP
                col = F.floor(x + F.lit(0.5)).cast("double")
            elif fname == "ceil":
                col = F.ceil(x).cast("double")
            else:
                col = F.floor(x).cast("double")
            return _Opnd("numcol", col=col)
        if kind == "name" and text.lower() in ("strbefore", "strafter"):
            self._expect_op("(")
            args = self._args_until_close()
            if len(args) != 2:
                raise ValueError(f"{text.upper()} needs (expr, expr)")
            la, lb = _opnd_lex(args[0]), _opnd_lex(args[1])
            pos = F.instr(la, lb)  # instr('x','') == 1: the spec's '' cases fall out
            if text.lower() == "strbefore":
                col = F.when(pos > 0, F.substring(la, F.lit(1), pos - 1)).otherwise("")
            else:
                col = F.when(
                    pos > 0, F.substring(la, pos + F.length(lb), F.length(la))
                ).otherwise("")
            return _Opnd("lex", col=col)
        if kind == "name" and text.lower() == "if":
            self._expect_op("(")
            cond = self._or()
            self._expect_op(",")
            a = self._operand()
            self._expect_op(",")
            b = self._operand()
            self._expect_op(")")
            return _Opnd(
                "bind", col=F.when(cond, _binding_encode(a)).otherwise(_binding_encode(b))
            )
        if kind == "name" and text.lower() == "coalesce":
            self._expect_op("(")
            parts = self._args_until_close()
            return _Opnd("bind", col=F.coalesce(*[_binding_encode(p) for p in parts]))
        if kind == "name" and text.lower() in (
            "bound", "regex", "contains", "strstarts", "strends", "isiri", "isuri",
            "isliteral", "langmatches", "isnumeric", "isblank", "sameterm",
        ):
            # boolean call in a VALUE position (BIND(isIRI(?x) AS ?f)):
            # effective boolean value -> xsd:boolean literal; NULL (SPARQL
            # error) stays NULL -> unbound
            self.i -= 1
            cond = self._primary()
            return _Opnd(
                "bind",
                col=F.when(cond, F.lit(lit_binding("true", vocab.XSD + "boolean")))
                .when(~cond, F.lit(lit_binding("false", vocab.XSD + "boolean"))),
            )
        if kind == "name" and text.lower() in ("md5", "sha1", "sha256", "sha384", "sha512"):
            # §17.4.4.12-16: lowercase-hex digest of the lexical form,
            # simple-literal result. JVM-side (F.md5/F.sha1/F.sha2 emit
            # lowercase hex already).
            self._expect_op("(")
            (inner,) = self._args_until_close()
            lex = _opnd_lex(inner)
            fname = text.lower()
            if fname == "md5":
                col = F.md5(lex)
            elif fname == "sha1":
                col = F.sha1(lex)
            else:
                col = F.sha2(lex, int(fname[3:]))
            return _Opnd("lex", col=col)
        if kind == "name" and text.lower() in (
            "year", "month", "day", "hours", "minutes", "seconds", "tz"
        ):
            # §17.4.5: component accessors over the literal's OWN lexical
            # form (no timezone normalization — the spec operates on the
            # xsd:dateTime value as written). A non-dateTime lexical makes
            # every group empty -> NULL -> expression error -> unbound/row
            # dropped, the SPARQL error rule.
            self._expect_op("(")
            (inner,) = self._args_until_close()
            lex = _opnd_lex(inner)
            fname = text.lower()
            pat = (
                r"^(-?\d{4,})-(\d{2})-(\d{2})T(\d{2}):(\d{2})"
                r":(\d{2}(?:\.\d+)?)(Z|[+-]\d{2}:\d{2})?$"
            )
            idx = {
                "year": 1, "month": 2, "day": 3,
                "hours": 4, "minutes": 5, "seconds": 6, "tz": 7,
            }[fname]
            part = F.regexp_extract(lex, pat, idx)
            if fname == "tz":
                # "" when the dateTime carries no zone, per spec — but a
                # non-dateTime input must still error: gate on the match
                return _Opnd(
                    "lex",
                    col=F.when(F.regexp_extract(lex, pat, 1) != "", part),
                )
            return _Opnd("numcol", col=part.try_cast("double"))
        if kind == "name" and text.lower() in ("iri", "uri"):
            # §17.4.2.8 (no BASE in this engine: the argument is the
            # absolute IRI); the result binds as a raw-IRI term
            self._expect_op("(")
            (inner,) = self._args_until_close()
            return _Opnd("bind", col=_opnd_lex(inner))
        if kind == "name" and text.lower() == "strdt":
            self._expect_op("(")
            inner = self._operand()
            self._expect_op(",")
            dtok = self._next()
            if dtok[0] == "iri":
                dt_iri = dtok[1][1:-1]
            elif dtok[0] == "pname":
                dt_iri = _resolve_pname(dtok[1], self.prefixes)
            else:
                raise ValueError("STRDT datatype must be an IRI")
            self._expect_op(")")
            return _Opnd(
                "bind",
                col=F.concat(F.lit('"'), _opnd_lex(inner), F.lit('"^^' + dt_iri)),
            )
        if kind == "name" and text.lower() == "strlang":
            self._expect_op("(")
            inner = self._operand()
            self._expect_op(",")
            tag = self._str_const("STRLANG language tag")
            self._expect_op(")")
            # tag rides in the datatype suffix, the same encoding the
            # pattern scanner emits for lang-tagged literals
            return _Opnd(
                "bind",
                col=F.concat(
                    F.lit('"'),
                    _opnd_lex(inner),
                    F.lit('"^^' + vocab.RDF + "langString@" + tag.lower()),
                ),
            )
        if kind == "name" and text.lower() == "encode_for_uri":
            # §17.4.3.4: percent-encode everything outside RFC 3986
            # unreserved, uppercase hex over the UTF-8 bytes. Pure column
            # fold: split to chars, hex-encode the non-unreserved ones.
            self._expect_op("(")
            (inner,) = self._args_until_close()
            lex = _opnd_lex(inner)
            col = F.concat_ws(
                "",
                F.transform(
                    F.split(lex, ""),
                    lambda c: F.when(c.rlike("^[A-Za-z0-9_.~-]$"), c).otherwise(
                        F.regexp_replace(F.hex(F.encode(c, "UTF-8")), "(..)", r"%$1")
                    ),
                ),
            )
            return _Opnd("lex", col=F.when(lex.isNotNull(), col))
        raise ValueError(f"unsupported FILTER/BIND operand: {text!r}")


def compile_filter(text: str, prefixes: dict[str, str], bound: set[str]) -> F.Column:
    """Compile one FILTER expression into a boolean Column over the binding
    columns — entirely JVM-side, no per-row Python."""
    return _FilterParser(text, prefixes, bound).parse()


def compile_bind(text: str, prefixes: dict[str, str], bound: set[str]) -> F.Column:
    """Compile one BIND value expression into a binding-encoded Column —
    entirely JVM-side, no per-row Python."""
    return _FilterParser(text, prefixes, bound).parse_value()


def _join_units(units: list[tuple[DataFrame, list[str], int]]) -> tuple[DataFrame, set[str]]:
    """Hash-join (frame, vars, n_consts) units on shared variables, greedy
    most-constants-first / connected-next order. Returns (frame, bound)."""
    order = sorted(range(len(units)), key=lambda i: (-units[i][2], i))
    remaining = list(order)
    first = remaining.pop(0)
    acc, bound0, _ = units[first]
    bound = set(bound0)
    while remaining:
        best, best_shared = None, -1
        for i in remaining:
            shared = len(bound & set(units[i][1]))
            if shared > best_shared:
                best, best_shared = i, shared
        remaining.remove(best)
        nf, nvars, _ = units[best]
        shared_cols = sorted(bound & set(nvars))
        if shared_cols:
            acc = acc.join(nf, shared_cols)
        else:
            acc = acc.crossJoin(nf)  # disconnected group or existence probe
        bound |= set(nvars)
        if "__exists" in acc.columns:
            acc = acc.drop("__exists")
            bound.discard("__exists")
    if "__exists" in acc.columns:  # single fully-ground pattern
        acc = acc.drop("__exists")
        bound.discard("__exists")
    return acc, bound


def execute_bgp(
    triples: DataFrame, patterns: list[Pattern], select_vars: list[str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """Execute a plain BGP (kept as the narrow public entry point; the full
    group execution with OPTIONAL/FILTER/UNION is `execute_group`)."""
    if not patterns:
        raise ValueError("empty BGP")
    units = [
        (*_pattern_frame(triples, p), sum(1 for t in p if not isinstance(t, Var)))
        for p in patterns
    ]
    acc, bound = _join_units(units)
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


def execute_group(
    triples: DataFrame, group: Group, prefixes: dict[str, str],
    graph_var: str | None = None,
) -> tuple[DataFrame, set[str]]:
    """Execute one group graph pattern: mandatory patterns and UNION blocks
    hash-joined, OPTIONAL groups left-joined on their shared variables, the
    group's FILTERs applied last (SPARQL group scoping: a filter sees the
    whole group, including optional bindings, so ``!bound(?x)`` works).
    ``graph_var`` is set when this group is the body of ``GRAPH ?g { … }``:
    every pattern additionally binds ?g to the lineage graph IRI."""
    if graph_var is not None and group.subselects:
        raise ValueError(
            "a subquery inside GRAPH ?var is not supported — the spec"
            " evaluates it once per named graph"
        )
    units = [
        (*_pattern_frame(triples, p, graph_var), sum(1 for t in p if not isinstance(t, Var)))
        for p in group.patterns
    ]
    for gterm, ggroup in group.graphs:
        if isinstance(gterm, Iri):
            # a constant graph scopes the scan: one pushed-down lineage
            # filter, then the inner group executes as usual
            if gterm.iri.startswith(GRAPH_NS):
                scoped = triples.filter(F.col("conv_id") == gterm.iri[len(GRAPH_NS):])
            else:  # an IRI outside the lineage namespace names no graph
                scoped = triples.filter(F.lit(False))
            gf, gvars = execute_group(scoped, ggroup, prefixes)
        elif isinstance(gterm, Var):
            scoped = triples.filter(F.col("conv_id").isNotNull())
            gf, gvars = execute_group(scoped, ggroup, prefixes, graph_var=gterm.name)
        else:
            raise ValueError("literal as GRAPH name")
        units.append((gf, sorted(gvars), 1 if isinstance(gterm, Iri) else 0))
    for names, rows in group.values:
        vf = triples.sparkSession.createDataFrame(
            list(rows), ", ".join(f"{n} string" for n in names)
        )
        # an inline table is by construction tiny: broadcast it, and give it
        # top join priority (it is the most selective unit)
        units.append((F.broadcast(vf), list(names), 3))
    for branches in group.unions:
        executed = [execute_group(triples, b, prefixes, graph_var) for b in branches]
        varsets = [frozenset(vs) for _, vs in executed]
        if len(set(varsets)) != 1:
            raise ValueError(
                f"UNION branches bind different variable sets: {sorted(map(sorted, varsets))}"
                " — the executor requires aligned branches"
            )
        cols = sorted(varsets[0])
        uf = executed[0][0].select(*cols)
        for f, _ in executed[1:]:
            uf = uf.unionByName(f.select(*cols))
        units.append((uf, cols, 0))
    for sq in group.subselects:
        f = _select_frame(triples, sq)
        # aggregate / expression outputs are raw values; cast to string so
        # joins against binding columns type-check. Caveat, documented: an
        # aggregate value binds as its plain lexical form, so it joins/
        # compares against other computed values, not against graph-literal
        # binding encodings.
        f = f.select(*[F.col(c).cast("string").alias(c) for c in f.columns])
        units.append((f, list(f.columns), 0))
    if not units:
        raise ValueError("group graph pattern has no triple patterns or UNION blocks")
    acc, bound = _join_units(units)
    optional_vars: set[str] = set()
    for og in group.optionals:
        f, ovars = execute_group(triples, og, prefixes, graph_var)
        join_vars = bound & set(ovars)
        if join_vars & optional_vars:
            raise ValueError(
                "OPTIONAL joins on a variable another OPTIONAL introduced"
                f" ({sorted(join_vars & optional_vars)}) — SPARQL's unbound-"
                "compatible semantics diverge from SQL null joins here"
            )
        new = set(ovars) - bound
        if join_vars:
            acc = acc.join(f, sorted(join_vars), "left")
        else:
            acc = acc.join(f, F.lit(True), "left")
        bound |= set(ovars)
        optional_vars |= new
    for sub, how, is_minus in (
        [(g, "left_semi", False) for g in group.exists]
        + [(g, "left_anti", False) for g in group.not_exists]
        + [(g, "left_anti", True) for g in group.minuses]
    ):
        f, svars = execute_group(triples, sub, prefixes, graph_var)
        shared = sorted(bound & svars)
        if not shared:
            if is_minus:
                continue  # MINUS with disjoint domains removes nothing (spec)
            raise ValueError(
                "EXISTS/NOT EXISTS subgroup shares no variable with the outer group"
            )
        # semi/anti joins never duplicate left rows — no distinct needed
        acc = acc.join(f.select(*shared), shared, how)
    for expr_text, var in group.binds:
        if var in bound:
            raise ValueError(
                f"BIND target ?{var} is already in scope in the group"
                " (a static error per the SPARQL spec)"
            )
        acc = acc.withColumn(var, compile_bind(expr_text, prefixes, bound))
        bound.add(var)
    # FILTERs run after BINDs: SPARQL scopes a group's filters over the
    # whole group, including BIND-introduced variables
    for ftext in group.filters:
        acc = acc.filter(compile_filter(ftext, prefixes, bound))
    return acc, bound


def _aggregate(acc: DataFrame, bound: set[str], q: ParsedQuery) -> DataFrame:
    """SPARQL aggregation → one hash-aggregate exchange (map-side partials
    for free). COUNT works on the binding columns directly; SUM/AVG extract
    the lexical form and ``try_cast`` to double (a non-numeric binding
    aggregates as NULL — SPARQL's error semantics); MIN/MAX compare the
    binding encoding (binary string order, same as ORDER BY). SAMPLE picks
    the binding MIN (the spec allows any element; min is deterministic at
    every parallelism, T3). GROUP_CONCAT concatenates the SORTED lexical
    forms (the spec leaves order undefined; sorting pins it) with the
    ``SEPARATOR`` clause or the spec's single-space default. HAVING runs as
    a post-aggregation filter: its aggregate calls were rewritten at parse
    time into hidden ``__hN`` aggregate columns, so the constraint compiles
    through the ordinary FILTER expression compiler and the hidden columns
    drop before projection."""
    plain = [it.var for it in q.select_items if it.var]
    all_aggs = [it for it in q.select_items if it.agg] + list(q.having_aggs)
    targets = [it.target for it in all_aggs if it.target != "*"]
    missing = [v for v in {*plain, *q.group_by, *targets} if v not in bound]
    if missing:
        raise ValueError(f"SELECT/GROUP BY variables never bound: {sorted(missing)}")
    stray = [v for v in plain if v not in q.group_by]
    if stray:
        raise ValueError(f"non-aggregated SELECT variables outside GROUP BY: {stray}")

    def agg_col(it: SelectItem) -> F.Column:
        if it.agg == "count":
            if it.target == "*":
                c = F.count(F.lit(1))
            elif it.distinct:
                c = F.count_distinct(F.col(it.target))
            else:
                c = F.count(F.col(it.target))
            return c
        if it.agg in ("sum", "avg"):
            num = _lex_of(F.col(it.target)).try_cast("double")
            if it.distinct:
                if it.agg == "avg":
                    raise ValueError("AVG(DISTINCT) is not supported")
                return F.sum_distinct(num)
            return F.sum(num) if it.agg == "sum" else F.avg(num)
        if it.agg == "group_concat":
            lex = _lex_of(F.col(it.target))
            arr = F.collect_set(lex) if it.distinct else F.collect_list(lex)
            return F.array_join(F.array_sort(arr), it.sep if it.sep is not None else " ")
        col = F.col(it.target)
        if it.agg in ("min", "sample"):
            return F.min(col)
        return F.max(col)

    aggs = [agg_col(it).alias(it.alias) for it in all_aggs]
    grouped = acc.groupBy(*q.group_by) if q.group_by else acc.groupBy()
    out = grouped.agg(*aggs)
    names = [it.var or it.alias for it in q.select_items]
    if q.having:
        # hidden aggregate columns cast to string so the expression
        # compiler's lexical/numeric coercions apply uniformly
        for it in q.having_aggs:
            out = out.withColumn(it.alias, F.col(it.alias).cast("string"))
        hb = {*q.group_by, *(it.alias for it in q.having_aggs)}
        out = out.filter(compile_filter(q.having, q.prefixes, hb))
    out = out.select(*names)
    if q.distinct:
        out = out.distinct()
    if q.order_by:
        bad = [v for v, _ in q.order_by if v not in names]
        if bad:
            raise ValueError(f"ORDER BY variables outside the projection: {bad}")
        out = out.orderBy(*[F.col(v).desc() if d else F.col(v).asc() for v, d in q.order_by])
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def _instantiate(
    acc: DataFrame, bound: set[str], template: tuple[Pattern, ...]
) -> DataFrame:
    """Instantiate a triple template per binding row and union the results
    into a TRIPLES-shaped 6-column frame (set semantics: one distinct
    exchange). The object binding encoding is decoded back into
    obj_kind/obj_iri/obj_lexical/obj_datatype columns. Shared by CONSTRUCT
    and the UPDATE forms' DELETE/INSERT templates."""
    null_s = F.lit(None).cast("string")

    def node_col(term: Term, position: str) -> F.Column:
        if isinstance(term, Var):
            if term.name not in bound:
                raise ValueError(f"template variable never bound: ?{term.name}")
            return F.col(term.name)
        if isinstance(term, Iri):
            return F.lit(term.iri)
        raise ValueError(f"literal in template {position} position")

    frames = []
    for s, p, o in template:
        if isinstance(p, Path):
            raise ValueError("property path in a triple template")
        subj = node_col(s, "subject")
        pred = node_col(p, "predicate")
        if isinstance(o, Lit):
            kind = F.lit("literal")
            obj_iri = null_s
            lex = F.lit(o.lex)
            dt = F.lit(o.dt or vocab.XSD_STRING)
        elif isinstance(o, Iri):
            kind = F.lit("iri")
            obj_iri = F.lit(o.iri)
            lex, dt = null_s, null_s
        else:
            if o.name not in bound:
                raise ValueError(f"template variable never bound: ?{o.name}")
            b = F.col(o.name)
            is_lit = b.startswith('"')
            kind = F.when(is_lit, F.lit("literal")).otherwise(F.lit("iri"))
            obj_iri = F.when(~is_lit, b)
            lex = F.when(is_lit, _lex_of(b))
            # greedy match -> the LAST "^^ delimiter, same as _lex_of
            dt = F.when(is_lit, F.regexp_extract(b, r'^".*"\^\^(.*)$', 1))
        frames.append(
            acc.select(
                subj.alias("subj"),
                pred.alias("pred"),
                kind.alias("obj_kind"),
                obj_iri.alias("obj_iri"),
                lex.alias("obj_lexical"),
                dt.alias("obj_datatype"),
            ).filter(
                # an unbound (OPTIONAL-null) variable anywhere in the
                # template skips that instantiation, per SPARQL CONSTRUCT
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & (F.col("obj_iri").isNotNull() | F.col("obj_lexical").isNotNull())
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def _construct(acc: DataFrame, bound: set[str], q: ParsedQuery) -> DataFrame:
    """CONSTRUCT: template instantiation into a TRIPLES-shaped frame."""
    out = _instantiate(acc, bound, q.template)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def _describe(triples: DataFrame, q: ParsedQuery) -> DataFrame:
    """DESCRIBE: every triple whose subject is a described node — one
    left-semi join of the triples frame against the distinct node set (the
    graph is scanned once however many nodes match; AQE converts the semi
    join to broadcast at runtime when the node set is small, and a
    million-node DESCRIBE still works as a shuffle join — no forced
    broadcast)."""
    spark = triples.sparkSession
    frames = []
    if q.select_vars:
        acc, bound = execute_group(triples, q.group, q.prefixes)
        names = [v.lstrip("?") for v in q.select_vars]
        missing = [v for v in names if v not in bound]
        if missing:
            raise ValueError(f"DESCRIBE variables never bound: {missing}")
        for v in names:
            frames.append(acc.select(F.col(v).alias("node")))
    if q.describe_iris:
        frames.append(
            spark.createDataFrame([(i,) for i in q.describe_iris], "node string")
        )
    nodes = frames[0]
    for f in frames[1:]:
        nodes = nodes.unionByName(f)
    nodes = nodes.distinct()
    return (
        triples.join(nodes, F.col("subj") == F.col("node"), "left_semi")
        .select("subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype")
        .distinct()
    )


def execute_sparql(triples: DataFrame, query_text: str) -> DataFrame:
    """Parse + execute a generated SPARQL query against the triples frame —
    one binding row per group-pattern match, one column per SELECT variable,
    ORDER BY / LIMIT / OFFSET applied after projection. CONSTRUCT returns a
    TRIPLES-shaped frame; ASK returns a single boolean `ask` row; DESCRIBE
    returns the distinct subject-description graph of its targets."""
    q = parse_query(query_text)
    if q.form == "describe":
        return _describe(triples, q)
    if q.form in ("construct", "ask"):
        acc, bound = execute_group(triples, q.group, q.prefixes)
        if q.form == "construct":
            return _construct(acc, bound, q)
        return acc.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))
    return _select_frame(triples, q)


def _select_frame(triples: DataFrame, q: ParsedQuery) -> DataFrame:
    """The SELECT pipeline (group → aggregates/expressions → projection →
    DISTINCT/ORDER/OFFSET/LIMIT) — shared by top-level SELECTs and nested
    `{ SELECT … }` subqueries."""
    acc, bound = execute_group(triples, q.group, q.prefixes)
    agg_items = [it for it in q.select_items if it.agg]
    expr_items = [it for it in q.select_items if it.expr]
    if q.group_by and not agg_items and not q.having_aggs:
        raise ValueError("GROUP BY without an aggregate in SELECT or HAVING")
    if agg_items or q.having_aggs:
        if expr_items:
            raise ValueError(
                "projection expressions alongside aggregates are not supported"
            )
        return _aggregate(acc, bound, q)
    # SELECT expressions evaluate in item order, so a later expression can
    # reference an earlier alias (SPARQL select-expression scoping)
    for it in expr_items:
        if it.alias in bound:
            raise ValueError(
                f"SELECT expression alias ?{it.alias} is already in scope"
            )
        acc = acc.withColumn(it.alias, compile_bind(it.expr, q.prefixes, bound))
        bound.add(it.alias)
    if q.select_vars:
        names = [v.lstrip("?") for v in q.select_vars]
        missing = [v for v in names if v not in bound]
        if missing:
            raise ValueError(f"SELECT variables never bound in the query: {missing}")
        scope = names
    else:
        scope = sorted(bound)
    # ORDER BY may reference non-projected variables (legal per the SPARQL
    # algebra: ordering applies to solutions BEFORE projection) — but not
    # under DISTINCT, where ordering over dropped vars is ill-defined
    extra_order = [v for v, _ in q.order_by if v not in scope]
    if extra_order:
        bad = [v for v in extra_order if v not in bound]
        if bad:
            raise ValueError(f"ORDER BY variables never bound: {bad}")
        if q.distinct:
            raise ValueError(
                f"ORDER BY on non-projected variables under DISTINCT: {extra_order}"
            )
    acc = acc.select(*scope, *extra_order)
    if q.distinct:
        acc = acc.distinct()
    if q.order_by:
        acc = acc.orderBy(
            *[F.col(v).desc() if d else F.col(v).asc() for v, d in q.order_by]
        )
    if q.offset:
        acc = acc.offset(q.offset)
    if q.limit is not None:
        acc = acc.limit(q.limit)
    return acc.select(*scope) if extra_order else acc


# ---------------------------------------------------------------- UPDATE

#: the triple identity key (provenance excluded) — mirrors schemas.TRIPLE_KEY
_KEY6 = ("subj", "pred", "obj_kind", "obj_iri", "obj_lexical", "obj_datatype")


@dataclass(frozen=True)
class ParsedUpdate:
    """One SPARQL 1.1 Update operation over the (single) graph store:
    ``INSERT DATA`` / ``DELETE DATA`` (ground templates, no WHERE),
    ``DELETE WHERE`` (the pattern is its own template), or the general
    ``[DELETE { t }] [INSERT { t }] WHERE { g }``."""

    prefixes: dict[str, str]
    delete_template: tuple[Pattern, ...]
    insert_template: tuple[Pattern, ...]
    group: Group | None  #: None for the DATA forms
    #: graph-scoped ground triples from ``GRAPH <urn:conv:X> { … }`` blocks
    #: inside the DATA forms: (conv_id, statement) pairs
    delete_quads: tuple[tuple[str, Pattern], ...] = ()
    insert_quads: tuple[tuple[str, Pattern], ...] = ()


_GRAPH_BLOCK_RE = re.compile(r"(?is)\bgraph\s+<([^<>]*)>\s*\{")


def _split_graph_blocks(body: str) -> tuple[str, list[tuple[str, str]]]:
    """Split ``GRAPH <iri> { … }`` blocks out of a DATA-form body: returns
    (text outside the blocks, [(conv_id, inner text), …]). The keyword is
    found by regex — a quoted literal containing ``GRAPH <…> {`` would
    confuse it; ground DATA bodies with such literals are not supported."""
    rest: list[str] = []
    blocks: list[tuple[str, str]] = []
    pos = 0
    while m := _GRAPH_BLOCK_RE.search(body, pos):
        start = m.end() - 1
        end = _matching(body, start, "{", "}")
        rest.append(body[pos:m.start()])
        blocks.append((_conv_of_graph_iri(m.group(1)), body[start + 1 : end]))
        pos = end + 1
    rest.append(body[pos:])
    return "".join(rest), blocks


def _ground_statements(body: str, prefixes: dict[str, str]) -> tuple[Pattern, ...]:
    stmts = tuple(_parse_statements(body, prefixes))
    for s, p, o in stmts:
        if isinstance(s, Var) or isinstance(p, (Var, Path)) or isinstance(o, Var):
            raise ValueError("INSERT/DELETE DATA requires ground triples (no variables)")
    return stmts


def parse_update(text: str) -> ParsedUpdate:
    """Parse one TEMPLATE update operation. Sequences (``;``-separated
    operations), ``WITH``/``USING`` dataset clauses, and LOAD raise loudly;
    the graph-management forms are handled by :func:`parse_graph_update`
    BEFORE this parser runs (reaching one here means it was malformed, so
    the loud error below is correct for them too)."""
    text = "\n".join(
        ln for ln in text.split("\n") if not ln.lstrip().startswith("#")
    )
    prefixes: dict[str, str] = {}
    for m in re.finditer(r"(?i)\bprefix\s+([A-Za-z][\w.-]*):\s*<([^<>]*)>", text):
        prefixes[m.group(1)] = m.group(2)
    # blank the PREFIX declarations offset-preservingly so the form regexes
    # can anchor at the operation keyword
    text = re.sub(
        r"(?i)\bprefix\s+[A-Za-z][\w.-]*:\s*<[^<>]*>",
        lambda m: " " * len(m.group(0)),
        text,
    )
    first_brace = text.find("{")
    header = text if first_brace == -1 else text[:first_brace]
    for bad in ("WITH", "USING", "LOAD", "CLEAR", "CREATE", "DROP", "COPY", "MOVE", "ADD"):
        if re.search(rf"(?i)\b{bad}\b", header):
            raise ValueError(f"unsupported UPDATE construct: {bad}")

    def tail_check(pos: int) -> None:
        rest = text[pos:].strip()
        if rest:
            if rest.startswith(";"):
                raise ValueError(
                    "update sequences (';') are not supported — apply one"
                    " operation per execute_update call"
                )
            raise ValueError(f"unexpected trailing update text: {rest[:40]!r}")

    mdata = re.search(r"(?i)\b(insert|delete)\s+data\s*\{", text)
    if mdata:
        start = mdata.end() - 1
        end = _matching(text, start, "{", "}")
        tail_check(end + 1)
        plain_body, graph_blocks = _split_graph_blocks(text[start + 1 : end])
        stmts = _ground_statements(plain_body, prefixes)
        quads = tuple(
            (conv, st)
            for conv, inner in graph_blocks
            for st in _ground_statements(inner, prefixes)
        )
        if mdata.group(1).lower() == "insert":
            return ParsedUpdate(prefixes, (), stmts, None, insert_quads=quads)
        return ParsedUpdate(prefixes, stmts, (), None, delete_quads=quads)

    mdw = re.search(r"(?i)\bdelete\s+where\s*\{", text)
    if mdw:
        start = mdw.end() - 1
        end = _matching(text, start, "{", "}")
        tail_check(end + 1)
        group = _parse_group(text[start + 1 : end], prefixes)
        if (
            group.optionals or group.unions or group.filters or group.binds
            or group.graphs or group.subselects
        ):
            raise ValueError("DELETE WHERE takes a plain BGP (its pattern IS the template)")
        for s, p, o in group.patterns:
            if isinstance(p, Path):
                raise ValueError("property path in a DELETE WHERE pattern")
        return ParsedUpdate(prefixes, tuple(group.patterns), (), group)

    del_t: tuple[Pattern, ...] = ()
    ins_t: tuple[Pattern, ...] = ()
    pos = 0
    def template_body(start: int, end: int) -> str:
        body = text[start + 1 : end]
        if _GRAPH_BLOCK_RE.search(body):
            raise ValueError(
                "GRAPH blocks in update templates are only supported in the"
                " DATA forms (INSERT DATA / DELETE DATA)"
            )
        return body

    mdel = re.match(r"(?is)\s*delete\s*\{", text)
    if mdel:
        start = mdel.end() - 1
        end = _matching(text, start, "{", "}")
        del_t = tuple(_parse_statements(template_body(start, end), prefixes))
        pos = end + 1
    mins = re.match(r"(?is)\s*insert\s*\{", text[pos:])
    if mins:
        start = pos + mins.end() - 1
        end = _matching(text, start, "{", "}")
        ins_t = tuple(_parse_statements(template_body(start, end), prefixes))
        pos = end + 1
    if not del_t and not ins_t:
        raise ValueError("no INSERT/DELETE operation in SPARQL update text")
    mw = re.match(r"(?is)\s*where\s*\{", text[pos:])
    if not mw:
        raise ValueError("DELETE/INSERT requires a WHERE group (or use the DATA forms)")
    start = pos + mw.end() - 1
    end = _matching(text, start, "{", "}")
    tail_check(end + 1)
    group = _parse_group(text[start + 1 : end], prefixes)
    return ParsedUpdate(prefixes, del_t, ins_t, group)


@dataclass(frozen=True)
class GraphUpdate:
    """A SPARQL 1.1 Update graph-management operation over the lineage
    named-graph model (`urn:conv:<conv_id>`; the default graph slot is the
    NULL-lineage rows that INSERT also targets)."""

    op: str  #: 'clear' | 'drop' | 'create' | 'add' | 'copy' | 'move'
    scope: str | None = None  #: for clear/drop: 'graph' | 'default' | 'named' | 'all'
    src: str | None = None  #: conv_id (None = default graph)
    dst: str | None = None


def _conv_of_graph_iri(iri: str) -> str:
    if not iri.startswith(GRAPH_NS):
        raise ValueError(
            f"graph IRI outside the lineage namespace {GRAPH_NS!r}: <{iri}>"
        )
    return iri[len(GRAPH_NS):]


_GM_CLEAR_RE = re.compile(
    r"(?is)^\s*(?P<op>clear|drop)\s+(?:silent\s+)?"
    r"(?:graph\s+<(?P<iri>[^<>]*)>|(?P<kw>default|named|all))\s*$"
)
_GM_CREATE_RE = re.compile(
    r"(?is)^\s*create\s+(?:silent\s+)?graph\s+<(?P<iri>[^<>]*)>\s*$"
)
_GM_MOVE_RE = re.compile(
    r"(?is)^\s*(?P<op>add|copy|move)\s+(?:silent\s+)?"
    r"(?:(?:graph\s+)?<(?P<src>[^<>]*)>|(?P<srcdef>default))\s+to\s+"
    r"(?:(?:graph\s+)?<(?P<dst>[^<>]*)>|(?P<dstdef>default))\s*$"
)


def parse_graph_update(text: str) -> GraphUpdate | None:
    """Parse a graph-management form (§3.2: CLEAR/DROP/CREATE/ADD/COPY/
    MOVE), or return None for the template forms. LOAD (remote fetch) is
    NOT supported and falls through to :func:`parse_update`'s loud error."""
    body = "\n".join(
        ln for ln in text.split("\n") if not ln.lstrip().startswith("#")
    )
    # a prologue of PREFIX declarations is legal before any operation
    # (§19.2); graph-management forms never use prefixed names, so blank it
    body = re.sub(
        r"(?i)\bprefix\s+[A-Za-z][\w.-]*:\s*<[^<>]*>",
        lambda m: " " * len(m.group(0)),
        body,
    )
    if m := _GM_CLEAR_RE.match(body):
        if m.group("kw"):
            return GraphUpdate(m.group("op").lower(), scope=m.group("kw").lower())
        return GraphUpdate(
            m.group("op").lower(), scope="graph",
            src=_conv_of_graph_iri(m.group("iri")),
        )
    if m := _GM_CREATE_RE.match(body):
        _conv_of_graph_iri(m.group("iri"))  # namespace check only
        return GraphUpdate("create")
    if m := _GM_MOVE_RE.match(body):
        src = None if m.group("srcdef") else _conv_of_graph_iri(m.group("src"))
        dst = None if m.group("dstdef") else _conv_of_graph_iri(m.group("dst"))
        return GraphUpdate(m.group("op").lower(), src=src, dst=dst)
    return None


def _in_graph(conv: str | None) -> F.Column:
    # eqNullSafe: negating a plain == would silently drop NULL-conv_id
    # (default-graph) rows from a named-graph CLEAR's survivors
    col = F.col("conv_id")
    return col.isNull() if conv is None else col.eqNullSafe(F.lit(conv))


def execute_graph_update(triples: DataFrame, gu: GraphUpdate) -> DataFrame:
    """Apply one graph-management operation as a frame→frame transformation.

    Graphs exist iff they have rows here (no empty-graph bookkeeping), so
    CLEAR and DROP coincide and CREATE is a documented no-op; SILENT is
    always accepted. Moving rows INTO the default graph nulls ``turn_idx``
    too (a turn position is meaningless outside its conversation — the same
    NULL-lineage convention as template INSERTs). ADD is idempotent: only
    rows not already present in the destination (null-safe all-column
    anti-join) are added, so re-running an ADD never duplicates provenance.

    Scale shape: CLEAR/DROP are pushed-down partition-prunable filters;
    ADD/COPY/MOVE are one filter + union (+ one anti-join for ADD keyed on
    the full row) — no driver-side work."""
    if gu.op in ("clear", "drop"):
        if gu.scope == "all":
            return triples.limit(0)
        if gu.scope == "named":
            return triples.filter(F.col("conv_id").isNull())
        if gu.scope == "default":
            return triples.filter(F.col("conv_id").isNotNull())
        return triples.filter(~_in_graph(gu.src))
    if gu.op == "create":
        return triples
    if gu.src == gu.dst:  # ADD/COPY/MOVE onto itself: no-op per spec
        return triples
    moved = triples.filter(_in_graph(gu.src))
    if gu.dst is None:
        moved = moved.withColumn("conv_id", F.lit(None).cast("string")).withColumn(
            "turn_idx", F.lit(None).cast("int")
        )
    else:
        moved = moved.withColumn("conv_id", F.lit(gu.dst))
    base = triples
    if gu.op in ("copy", "move"):
        base = base.filter(~_in_graph(gu.dst))
    if gu.op == "move":
        base = base.filter(~_in_graph(gu.src))
    if gu.op == "add":
        cols = triples.columns
        r = base.select(*[F.col(c).alias("__r_" + c) for c in cols])
        cond = None
        for c in cols:
            eq = F.col(c).eqNullSafe(F.col("__r_" + c))
            cond = eq if cond is None else (cond & eq)
        moved = moved.join(r, cond, "left_anti")
    return base.unionByName(moved)


def execute_update(triples: DataFrame, update_text: str) -> DataFrame:
    """Apply one SPARQL 1.1 Update operation and return the NEW triples
    frame (the input is never mutated — updates compose with the engine's
    snapshot/lineage model instead of an in-place store).

    Semantics (spec §3.1.3): both templates are instantiated against the
    bindings of the ORIGINAL store, then ``store := (store − deletes) ∪
    inserts``. Set semantics on the triple identity key: DELETE removes
    every provenance row of a matched triple; INSERT adds a triple only if
    no row with its key survives, with NULL lineage (derived, not sourced
    from a conversation — same convention as the pipeline's vocab triples).

    Scale shape: one group execution (pushed-filter scans + hash joins) +
    at most two null-safe anti-joins keyed on the full triple — the same
    exchange class as the pipeline's set-semantics dedup; nothing
    driver-side.

    Graph-management forms (CLEAR/DROP/CREATE/ADD/COPY/MOVE over the
    lineage named graphs) dispatch to :func:`execute_graph_update`; LOAD
    (remote fetch) raises."""
    gu = parse_graph_update(update_text)
    if gu is not None:
        return execute_graph_update(triples, gu)
    u = parse_update(update_text)
    spark = triples.sparkSession
    if u.group is not None:
        acc, bound = execute_group(triples, u.group, u.prefixes)
    else:
        acc, bound = spark.range(1), set()

    def anti(
        left: DataFrame, right_keys: DataFrame, keys: tuple[str, ...] = _KEY6
    ) -> DataFrame:
        r = right_keys.select(*[F.col(c).alias("__r_" + c) for c in keys])
        cond = None
        for c in keys:
            eq = F.col(c).eqNullSafe(F.col("__r_" + c))
            cond = eq if cond is None else (cond & eq)
        return left.join(r, cond, "left_anti")

    def quad_frame(quads: tuple[tuple[str, Pattern], ...]) -> DataFrame:
        # graph-scoped ground triples -> 7-col (KEY6 + conv_id) frame
        by_conv: dict[str, list[Pattern]] = {}
        for conv, st in quads:
            by_conv.setdefault(conv, []).append(st)
        frames = [
            _instantiate(spark.range(1), set(), tuple(sts)).withColumn(
                "conv_id", F.lit(conv)
            )
            for conv, sts in by_conv.items()
        ]
        f = frames[0]
        for g in frames[1:]:
            f = f.unionByName(g)
        return f

    KEY7 = _KEY6 + ("conv_id",)
    out = triples
    if u.delete_template:
        out = anti(out, _instantiate(acc, bound, u.delete_template))
    if u.delete_quads:
        # graph-scoped DELETE DATA removes the triple from THAT graph only
        # (all its provenance rows there); other graphs keep it
        out = anti(out, quad_frame(u.delete_quads), KEY7)
    if u.insert_template:
        ins = _instantiate(acc, bound, u.insert_template)
        new = anti(ins, out.select(*_KEY6)).select(
            *_KEY6,
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
        )
        out = out.unionByName(new)
    if u.insert_quads:
        q = quad_frame(u.insert_quads)
        new = anti(q, out.select(*KEY7), KEY7).select(
            *KEY7, F.lit(None).cast("int").alias("turn_idx")
        )
        out = out.unionByName(new)
    return out


def split_update_script(text: str) -> list[str]:
    """Split a SPARQL 1.1 Update SCRIPT (§3: operations separated by ``;``)
    into its single operations, quote-/IRI-/brace-aware. PREFIX declarations
    accumulate over the script (§19.2 grammar: a prologue may precede each
    operation and stays in force), so every returned operation is re-prefixed
    with all declarations seen up to and including its own segment."""
    text = "\n".join(
        ln for ln in text.split("\n") if not ln.lstrip().startswith("#")
    )
    segs: list[str] = []
    depth = 0
    i = 0
    start = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == '"':
            i = _skip_string(text, i)
            continue
        if c == "<":
            j = text.find(">", i)
            i = (j + 1) if j != -1 else i + 1
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        elif c == ";" and depth == 0:
            segs.append(text[start:i])
            start = i + 1
        i += 1
    segs.append(text[start:])

    prefix_re = re.compile(r"(?i)\bprefix\s+[A-Za-z][\w.-]*:\s*<[^<>]*>")
    seen_prefixes: list[str] = []
    ops: list[str] = []
    for seg in segs:
        seen_prefixes.extend(m.group(0) for m in prefix_re.finditer(seg))
        bare = prefix_re.sub(lambda m: " " * len(m.group(0)), seg)
        if not bare.strip():
            continue  # prologue-only or empty segment (e.g. trailing ';')
        ops.append("\n".join(seen_prefixes) + "\n" + bare)
    return ops


def execute_update_script(triples: DataFrame, script_text: str) -> DataFrame:
    """Apply a whole SPARQL 1.1 Update script — ``;``-separated operations,
    template and graph-management forms mixed freely — as a left fold of
    :func:`execute_update` over the frame. Each operation sees the store
    state the previous one produced (§3.1: operations execute in order).

    Scale note: the fold builds ONE composed lazy plan; nothing materializes
    until the caller acts on the result. Long scripts of anti-join-heavy
    operations deepen the plan linearly — checkpoint between operations if a
    script runs to hundreds of steps."""
    out = triples
    for op in split_update_script(script_text):
        out = execute_update(out, op)
    return out

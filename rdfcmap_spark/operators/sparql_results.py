"""W3C SPARQL 1.1 Query Results serialization — CSV, TSV and JSON.

The reference emits generated SPARQL *query text* (`SparqlCreator.java`) and
leaves execution to an external store; this repo also executes the queries
(`operators/sparql_exec.py`), so the missing last mile is the standard
result-set wire formats a downstream consumer expects:

* **CSV** (`sparql11-results-csv-tsv` §3): header = bare variable names;
  IRIs and blank-node labels written plainly, literals as their lexical
  form only (datatype/lang dropped — CSV is the lossy "spreadsheet" form);
  RFC-4180 quoting when a field contains a quote, comma or newline.
* **TSV** (§4): header = ``?var`` names; every value in full SPARQL
  surface syntax — ``<iri>``, ``_:bnode``, ``"lex"`` with ``@lang`` /
  ``^^<dt>`` (plain ``xsd:string`` literals drop the datatype, per the
  spec's canonical examples); tab/newline/backslash/quote escaped inside
  the quoted lexical form.
* **JSON** (`sparql11-results-json`): ``{"head":{"vars":[…]},"results":
  {"bindings":[…]}}`` with per-binding ``{"type","value","datatype",
  "xml:lang"}`` objects; unbound variables are absent from their row's
  binding object.
* **XML** (`sparql11-results-xml`): ``<sparql><head><variable…/></head>
  <results><result><binding name="…"><uri>/<literal>/<bnode>`` elements,
  the five XML 1.0 entity escapes, unbound bindings omitted.

Input is a SELECT result frame from :func:`sparql_exec.execute_sparql` —
one column per variable, values in the module's collision-free binding
encoding (IRIs raw, literals ``"lex"^^<dt>``, language tags folded as
``rdf:langString@tag``, blank nodes ``_:label``, unbound NULL).

All row serialization is JVM-side column expressions (the per-row work is
string assembly — exactly what whole-stage codegen is for). The line
ordinal uses a result-set-global ``row_number`` — a serialized result file
is an inherently ordered, human/consumer-sized product (the same contract
as the generated query text itself, `operators/sparql.py`); do not feed a
corpus-sized frame through a serializer, write parquet instead.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdfcmap_spark import vocab

_LANG_PREFIX = vocab.RDF + "langString@"


def _is_literal(v: F.Column) -> F.Column:
    return v.startswith('"')


def _is_bnode(v: F.Column) -> F.Column:
    return v.startswith("_:")


def _lex(v: F.Column) -> F.Column:
    """Lexical form of an encoded literal — everything between the opening
    quote and the LAST ``"^^`` (greedy, so embedded quotes survive);
    (?s) because lexical forms may span lines."""
    return F.regexp_extract(v, r'(?s)^"(.*)"\^\^([^^]*)$', 1)


def _dt(v: F.Column) -> F.Column:
    return F.regexp_extract(v, r'(?s)^"(.*)"\^\^([^^]*)$', 2)


def _lang(dt: F.Column) -> F.Column:
    """Language tag when the datatype carries the schemas.py fold
    (``rdf:langString@tag``), else NULL."""
    tag = F.regexp_extract(dt, r"langString@([A-Za-z0-9-]+)$", 1)
    return F.when(dt.startswith(_LANG_PREFIX), tag)


def _csv_field(v: F.Column) -> F.Column:
    """One CSV field: plain IRI / bnode label / literal lexical form,
    RFC-4180-quoted when it contains a quote, comma, CR or LF; unbound →
    empty field."""
    raw = F.when(_is_literal(v), _lex(v)).otherwise(v)
    quoted = F.concat(F.lit('"'), F.regexp_replace(raw, '"', '""'), F.lit('"'))
    return F.coalesce(
        F.when(raw.rlike('[",\r\n]'), quoted).otherwise(raw), F.lit("")
    )


def _tsv_escape(s: F.Column) -> F.Column:
    """Backslash-escape the characters TSV cannot carry raw inside a quoted
    lexical form: ``\\`` first, then tab/LF/CR/quote."""
    s = F.regexp_replace(s, r"\\", r"\\\\")
    s = F.regexp_replace(s, "\t", r"\\t")
    s = F.regexp_replace(s, "\n", r"\\n")
    s = F.regexp_replace(s, "\r", r"\\r")
    return F.regexp_replace(s, '"', r'\\"')


def _tsv_field(v: F.Column) -> F.Column:
    """One TSV field in SPARQL surface syntax; unbound → empty field."""
    dt = _dt(v)
    lang = _lang(dt)
    lex = F.concat(F.lit('"'), _tsv_escape(_lex(v)), F.lit('"'))
    lit = F.when(lang.isNotNull(), F.concat(lex, F.lit("@"), lang)).otherwise(
        F.when(dt == vocab.XSD_STRING, lex).otherwise(
            F.concat(lex, F.lit("^^<"), dt, F.lit(">"))
        )
    )
    return F.coalesce(
        F.when(_is_literal(v), lit)
        .when(_is_bnode(v), v)
        .otherwise(F.concat(F.lit("<"), v, F.lit(">"))),
        F.lit(""),
    )


def _json_binding(v: F.Column) -> F.Column:
    """The per-variable binding object as a struct (NULL when unbound —
    ``to_json`` then omits the key, the spec's absent-binding rule).
    Datatype is included for non-string non-lang literals; ``xml:lang``
    for tagged ones (datatype then normalizes to plain ``rdf:langString``,
    unfolding the schemas.py tag carry)."""
    dt = _dt(v)
    lang = _lang(dt)
    null_s = F.lit(None).cast("string")
    return F.when(
        v.isNull(), F.lit(None).cast("struct<type:string,value:string,datatype:string,`xml:lang`:string>")
    ).otherwise(
        F.struct(
            F.when(_is_literal(v), F.lit("literal"))
            .when(_is_bnode(v), F.lit("bnode"))
            .otherwise(F.lit("uri"))
            .alias("type"),
            F.when(_is_literal(v), _lex(v))
            .when(_is_bnode(v), F.substring(v, 3, 2**30))  # bare label per spec
            .otherwise(v)
            .alias("value"),
            F.when(
                _is_literal(v) & (dt != vocab.XSD_STRING),
                F.when(lang.isNotNull(), F.lit(vocab.RDF + "langString")).otherwise(dt),
            )
            .otherwise(null_s)
            .alias("datatype"),
            lang.alias("xml:lang"),
        )
    )


def _with_ord(result: DataFrame, fields: list, start: int) -> F.Column:
    """Deterministic line ordinal: row_number over the serialized fields
    (ties are byte-identical lines, so any tie order yields the same file).
    Result-set-sized by contract — see module docstring."""
    return F.row_number().over(Window.orderBy(*fields)) + (start - 1)


def csv_header(varnames: list[str]) -> str:
    return ",".join(varnames)


def tsv_header(varnames: list[str]) -> str:
    return "\t".join("?" + n for n in varnames)


def _lines(result: DataFrame, varnames: list[str], field_of, sep: str, header: str) -> DataFrame:
    fields = [field_of(F.col(n)).alias("_f_" + n) for n in varnames]
    rows = result.select(*fields)
    body = rows.select(
        _with_ord(rows, [F.col("_f_" + n) for n in varnames], 1).alias("ord"),
        F.concat_ws(sep, *[F.col("_f_" + n) for n in varnames]).alias("line"),
    )
    head = result.sparkSession.createDataFrame([(0, header)], "ord int, line string")
    return head.unionByName(body.select(F.col("ord").cast("int"), "line"))


def select_csv(result: DataFrame, varnames: list[str]) -> DataFrame:
    """(ord, line) — ord 0 is the header; join lines with CRLF for the wire
    form (`sparql11-results-csv-tsv` §3 mandates CRLF EOLs)."""
    return _lines(result, varnames, _csv_field, ",", csv_header(varnames))


def select_tsv(result: DataFrame, varnames: list[str]) -> DataFrame:
    """(ord, line) — ord 0 is the header; LF EOLs on the wire (§4)."""
    return _lines(result, varnames, _tsv_field, "\t", tsv_header(varnames))


def select_json_bindings(result: DataFrame, varnames: list[str]) -> DataFrame:
    """(ord, binding) — one compact JSON object per result row (the
    ``results.bindings`` array elements), unbound variables omitted."""
    objs = result.select(*[_json_binding(F.col(n)).alias(n) for n in varnames])
    return objs.select(
        _with_ord(objs, [F.to_json(F.col(n)) for n in varnames], 1).alias("ord"),
        F.to_json(F.struct(*[F.col(n) for n in varnames])).alias("binding"),
    )


def _xml_escape(s: F.Column) -> F.Column:
    """The five XML 1.0 entity escapes, '&' first."""
    s = F.regexp_replace(s, "&", "&amp;")
    s = F.regexp_replace(s, "<", "&lt;")
    s = F.regexp_replace(s, ">", "&gt;")
    s = F.regexp_replace(s, '"', "&quot;")
    return F.regexp_replace(s, "'", "&apos;")


def _xml_binding(name: str, v: F.Column) -> F.Column:
    """One ``<binding name="…">…</binding>`` element (NULL when unbound —
    the spec omits unbound variables from their ``<result>``)."""
    dt = _dt(v)
    lang = _lang(dt)
    lex = _xml_escape(_lex(v))
    lit = F.when(
        lang.isNotNull(),
        F.concat(F.lit('<literal xml:lang="'), lang, F.lit('">'), lex, F.lit("</literal>")),
    ).otherwise(
        F.when(dt == vocab.XSD_STRING, F.concat(F.lit("<literal>"), lex, F.lit("</literal>")))
        .otherwise(
            F.concat(F.lit('<literal datatype="'), _xml_escape(dt), F.lit('">'), lex, F.lit("</literal>"))
        )
    )
    term = (
        F.when(_is_literal(v), lit)
        .when(_is_bnode(v), F.concat(F.lit("<bnode>"), F.substring(v, 3, 2**30), F.lit("</bnode>")))
        .otherwise(F.concat(F.lit("<uri>"), _xml_escape(v), F.lit("</uri>")))
    )
    return F.when(
        v.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(F.lit(f'<binding name="{name}">'), term, F.lit("</binding>"))
    )


def select_xml_results(result: DataFrame, varnames: list[str]) -> DataFrame:
    """(ord, result) — one ``<result>…</result>`` element per row (the
    ``sparql11-results-xml`` ``<results>`` children), unbound bindings
    omitted; :func:`render_xml` wraps the envelope."""
    frags = [ _xml_binding(n, F.col(n)).alias("_x_" + n) for n in varnames ]
    rows = result.select(*frags)
    cols = [F.col("_x_" + n) for n in varnames]
    return rows.select(
        _with_ord(rows, cols, 1).alias("ord"),
        F.concat(F.lit("<result>"), F.concat_ws("", *cols), F.lit("</result>")).alias("result"),
    )


def render_xml(result: DataFrame, varnames: list[str]) -> str:
    """The complete ``application/sparql-results+xml`` document (driver-side
    assembly, result-set-sized product)."""
    rows = [
        r["result"]
        for r in select_xml_results(result, varnames).orderBy("ord").collect()
    ]
    head = "".join(f'<variable name="{n}"/>' for n in varnames)
    return (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        f"<head>{head}</head><results>" + "".join(rows) + "</results></sparql>"
    )


def render_json(result: DataFrame, varnames: list[str]) -> str:
    """The complete ``application/sparql-results+json`` document (driver-
    side assembly of a result-set-sized product, same contract as
    ``sparql.render_sparql``)."""
    rows = [
        json.loads(r["binding"])
        for r in select_json_bindings(result, varnames).orderBy("ord").collect()
    ]
    return json.dumps(
        {"head": {"vars": varnames}, "results": {"bindings": rows}},
        separators=(",", ":"),
    )

"""TTL/N-Triples source + sink (SURVEY.md S3/S4/S7).

The reference reads vocabularies with Jena (`Turtle2CmapConverter.java:
87-108`) and writes its output model as Turtle with a version-signature
comment line (`CmapUtil.appendSignature:1016-1030`). Here:

* :func:`write_ttl` — triples DataFrame -> line-oriented Turtle (one triple
  per line, prefixed names where possible, ``# created with`` signature).
  Rendering is pure column expressions; the write is a distributed text
  sink (one shard per partition, exactly how a 100 TB dump must leave the
  cluster — never a driver collect).
* :func:`read_ttl` — the inverse: distributed line parser (regexp) for the
  line-oriented subset we emit + full N-Triples. Vocabulary files are tiny
  (driver-side broadcast path, S4); instance dumps are huge (this path).

Round-trip (write -> read) is asserted lossless by tests for every
obj_kind / datatype / escaping case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.schemas import TRIPLES

SIGNATURE = "# created with rdfcmap-spark"

#: lang-tag fold marker (see sources/turtle.py): obj_datatype of a
#: language-tagged literal is rdf:langString@<tag>
_LANG_DT_PREFIX = vocab.RDF + "langString@"

#: longest-namespace-first so e.g. afv# wins over af-x# if nested
_PREFIXES = sorted(vocab.NS_PREFIX_MAP.items(), key=lambda kv: -len(kv[1]))


def _to_prefixed(iri_col):
    """IRI -> prefix:local when a namespace matches and the local name is
    PN_LOCAL-safe, else <iri>. The when-ladder nests so the LONGEST matching
    namespace wins (e.g. obo/CHEBI beats obo/ for chebi:_123) — the loop
    iterates shortest-first because each iteration wraps the previous ladder
    as its ``otherwise`` branch, putting the longest namespace outermost."""
    out = None
    for prefix, ns in reversed(_PREFIXES):
        local = F.substring(iri_col, len(ns) + 1, 10_000)
        ok = iri_col.startswith(ns) & local.rlike(r"^[A-Za-z0-9_\-]+$")
        expr = F.concat(F.lit(prefix + ":"), local)
        out = F.when(ok, expr).otherwise(out) if out is not None else F.when(ok, expr)
    return F.coalesce(out, F.concat(F.lit("<"), iri_col, F.lit(">")))


def _esc_literal(lex):
    # NUL is forbidden in Turtle literals and doubles as read_ttl's unescape
    # sentinel — strip it before escaping
    c = F.regexp_replace(lex, "\x00", "")
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", "\\\\n")
    c = F.regexp_replace(c, "\r", "\\\\r")
    c = F.regexp_replace(c, "\t", "\\\\t")
    return c


def ttl_line_col(use_prefixes: bool = True):
    """Column expression rendering one triple row as a Turtle line — works on
    any DataFrame carrying the triples columns (so sinks can keep extra
    bookkeeping columns alongside).

    ``use_prefixes=False`` is the reference's ``--noprefixes``
    (`Cmap2TurtleConverter.java:1918-1923` skips setNsPrefixes, so Jena
    writes raw ``<iri>`` terms): every IRI is angle-wrapped, no qnames.
    ``a`` for rdf:type is Turtle grammar, not a prefix, and stays."""
    term = _to_prefixed if use_prefixes else (
        lambda c: F.concat(F.lit("<"), c, F.lit(">"))
    )
    subj = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(term(F.col("subj")))
    pred = F.when(F.col("pred") == vocab.RDF_TYPE, F.lit("a")).otherwise(term(F.col("pred")))
    lit = F.concat(
        F.lit('"'),
        _esc_literal(F.col("obj_lexical")),
        F.lit('"'),
        F.when(
            # lang-tagged literal: "lex"@tag (tag folded into obj_datatype)
            F.col("obj_datatype").startswith(_LANG_DT_PREFIX),
            F.concat(F.lit("@"), F.substring(F.col("obj_datatype"), len(_LANG_DT_PREFIX) + 1, 100)),
        )
        .when(
            F.col("obj_datatype").isNotNull() & (F.col("obj_datatype") != vocab.XSD_STRING),
            F.concat(F.lit("^^"), term(F.col("obj_datatype"))),
        )
        .otherwise(F.lit("")),
    )
    # bnode-kind objects carry skolem IRIs (G8) — render as _:b<uuid> labels
    # so kind survives the round trip; read_ttl re-skolemizes
    bnode_label = F.concat(F.lit("_:b"), F.regexp_replace(F.col("obj_iri"), "^urn:uuid:", ""))
    obj = (
        F.when(F.col("obj_kind") == "literal", lit)
        .when(F.col("obj_kind") == "bnode", bnode_label)
        .otherwise(term(F.col("obj_iri")))
    )
    return F.concat_ws(" ", subj, pred, obj, F.lit("."))


def triples_to_ttl_lines(triples: DataFrame, use_prefixes: bool = True) -> DataFrame:
    """(line: string) — one rendered triple per row (deterministic content;
    ordering is up to the writer)."""
    return triples.select(ttl_line_col(use_prefixes).alias("line"))


def prefix_header() -> list[str]:
    return [f"@prefix {p}: <{ns}> ." for p, ns in sorted(vocab.NS_PREFIX_MAP.items())]


def write_ttl(
    triples: DataFrame, path: str, use_prefixes: bool = True, add_titles: bool = True
) -> None:
    """Distributed text write: header+signature as one tiny shard, body as
    one shard per partition.

    Shard-order contract: ``unionByName`` concatenates the parents'
    partitions in order and the text writer names output files by partition
    index, so the single header partition is always ``part-00000`` — tools
    that read shards in filename order (cat, getmerge) see the signature +
    @prefix block first, like a single-file Turtle document. Pinned by
    ``tests/test_ttl.py::test_header_shard_is_first``.

    ``use_prefixes=False`` (the reference's ``--noprefixes``) writes raw
    ``<iri>`` terms and omits the @prefix block; ``add_titles=False``
    (``--notitles``) drops dct:title statements from the output, the
    reference's `removeTitles` on the instance model
    (`Cmap2TurtleConverter.java:2072-2075`). Both round-trip through
    read_ttl unchanged apart from the removed titles."""
    spark = triples.sparkSession
    if not add_titles:
        triples = triples.filter(F.col("pred") != vocab.DCT_TITLE)
    head_lines = [SIGNATURE, *(prefix_header() if use_prefixes else [])]
    header = spark.createDataFrame(
        [(l,) for l in head_lines], "line string"
    ).coalesce(1)
    header.unionByName(triples_to_ttl_lines(triples, use_prefixes)).write.mode(
        "overwrite"
    ).text(path)


#: the reference's ID-token scan (`addCommentsWithHumanReadableIds:2252`)
#: — same java.util.regex find() semantics in Spark, so the alternating
#: boundary-consumption behavior is reproduced bit-for-bit
_HR_TOKEN_RE = r"(?:^|\s)(([a-z\-]+):[A-Z]*_[0-9]{7,})(?:$|\s)"


def annotate_human_readable(lines: DataFrame, labels: DataFrame) -> DataFrame:
    """(line) -> (line) with the reference's human-readable ID comments
    (`Cmap2TurtleConverter.addCommentsWithHumanReadableIds:2248-2317`, the
    default the ``--machine`` flag turns OFF): every vocab ID qname token
    (``afe:AFE_0001234``) found on a line contributes ``prefix:label`` (or
    ``unknown``) and the line is padded to column 120 then suffixed with
    ``' # '`` + the comma-joined labels, in token order.

    ``labels`` is (iri, label) — dictionary-scale, broadcast. Line identity
    is preserved by id (duplicate lines keep their multiplicity); the
    re-aggregation is one shuffle keyed on the line id, fine for a sink.
    """
    qlabels = labels.select(
        _to_prefixed(F.col("iri")).alias("tok"),
        F.concat(
            F.regexp_extract(_to_prefixed(F.col("iri")), r"^([a-z\-]+):", 1),
            F.lit(":"),
            F.col("label"),
        ).alias("display"),
    ).filter(F.col("tok").rlike(r"^[a-z\-]+:[A-Z]*_[0-9]{7,}$"))
    l = lines.withColumn("_id", F.monotonically_increasing_id())
    toks = l.select(
        "_id",
        F.posexplode(F.regexp_extract_all(F.col("line"), F.lit(_HR_TOKEN_RE), 1)).alias(
            "pos", "tok"
        ),
    )
    ann = (
        toks.join(F.broadcast(qlabels), "tok", "left")
        .groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos").alias("p"),
                                F.coalesce("display", F.lit("unknown")).alias("lab"),
                            )
                        )
                    ),
                    lambda s: s["lab"],
                ),
                ", ",
            ).alias("labs")
        )
    )
    pad = F.repeat(F.lit(" "), F.greatest(F.lit(120) - F.length("line"), F.lit(0)))
    return l.join(ann, "_id", "left").select(
        F.when(
            F.col("labs").isNotNull(),
            F.concat(F.col("line"), pad, F.lit(" # "), F.col("labs")),
        )
        .otherwise(F.col("line"))
        .alias("line")
    )


def write_ttl_human_readable(triples: DataFrame, labels: DataFrame, path: str) -> None:
    """The reference's companion ``-instance-model-human-readable.ttl``
    product (written alongside the plain file when ``--machine`` is NOT
    given, `Cmap2TurtleConverter.java:2125-2136`): the same Turtle lines
    with ID-comment annotations. A side product for humans — not intended
    to be re-read (the reference never re-parses it either)."""
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(l,) for l in [SIGNATURE, *prefix_header()]], "line string"
    ).coalesce(1)
    body = annotate_human_readable(triples_to_ttl_lines(triples), labels)
    header.unionByName(body).write.mode("overwrite").text(path)


def instance_slug(title_col):
    """Faithful port of the separate-file slug chain
    (`writeSeparateTurtleFiles:2737-2747`): non-word runs -> space, lower,
    whitespace -> '-', empty/'-' -> 'unlabeled', and the reference's
    leading+trailing-dash bracket quirk ('-x-' -> '[x]')."""
    t = F.regexp_replace(title_col, r"\W+", " ")
    t = F.regexp_replace(F.lower(t), r"\s", "-")
    t = F.when((t == "") | (t == "-"), F.lit("unlabeled")).otherwise(t)
    return F.regexp_replace(t, r"^-(.*)-$", r"[$1]")


def write_instance_files(
    triples: DataFrame, out_dir: str, max_statements: int = 200_000
) -> dict[str, str]:
    """One TTL file per instance (S8 full semantics,
    `writeSeparateTurtleFiles:2585-2770`): filename is the slugified
    dct:title (IRI when untitled) with ``_1, _2, ...`` suffixes on collision
    (the reference probes the filesystem with an incrementing index,
    `:2748-2756`); each file carries the instance's statements plus its
    blank-node closure (`addStatementsWithBlankNodes`) and ends with the
    signature line (`CmapUtil.appendSignature`).

    Spark split: statement->owner assignment, rendering and slugging are
    distributed column work; name allocation and the actual many-small-file
    writes are driver-side — the product is a per-concept file set (a cmap
    has hundreds of instances), gated loudly at ``max_statements``. The
    100 TB path is :func:`write_ttl` / ``sink.write_snapshot``. The
    reference's iteration order is Jena-incidental; ours pins instances by
    IRI so name allocation is deterministic.

    Returns {instance IRI -> filename}.
    """
    import os
    from collections import defaultdict

    # a statement's owner: its subject, or — for skolemized-bnode subjects —
    # the instance whose object chain reaches it (depth-bounded pointer walk;
    # cmap bnode satellites are 1-2 levels deep)
    bnode_parent = (
        triples.filter(F.col("obj_kind") == "bnode")
        .select(F.col("obj_iri").alias("child"), F.col("subj").alias("parent"))
        .distinct()
    )
    bnode_subjects = {r["child"] for r in bnode_parent.select("child").distinct().collect()}
    owned = triples.withColumn("owner", F.col("subj"))
    for _ in range(10):
        owned = (
            owned.join(bnode_parent, owned["owner"] == bnode_parent["child"], "left")
            .withColumn("owner", F.coalesce(F.col("parent"), F.col("owner")))
            .drop("child", "parent")
        )
    titles = (
        triples.filter((F.col("pred") == vocab.DCT_TITLE) & (F.col("obj_kind") == "literal"))
        .groupBy("subj")
        .agg(F.min("obj_lexical").alias("title"))
        .withColumnRenamed("subj", "owner")
    )
    rendered = (
        owned.join(titles, "owner", "left")
        .withColumn("slug", instance_slug(F.coalesce(F.col("title"), F.col("owner"))))
        .select("owner", "slug", ttl_line_col().alias("line"))
    )
    n = rendered.count()
    if n > max_statements:
        raise ValueError(
            f"write_instance_files over {n} statements exceeds the "
            f"per-concept-file gate ({max_statements}); use write_ttl / "
            "sink.write_snapshot for batch output"
        )
    per_owner: dict[str, list[str]] = defaultdict(list)
    slug_of: dict[str, str] = {}
    for r in rendered.collect():
        per_owner[r["owner"]].append(r["line"])
        slug_of[r["owner"]] = r["slug"]

    os.makedirs(out_dir, exist_ok=True)
    taken: set[str] = set()
    names: dict[str, str] = {}
    header = "\n".join(prefix_header())
    # instances pinned by IRI (bnode owners resolved above never appear as
    # owners of their own file)
    for owner in sorted(per_owner):
        if owner in bnode_subjects:
            continue  # defensive: unresolved orphan bnodes are skipped
        slug = slug_of[owner]
        # the reference's filesystem-probe loop (`:2748-2756`)
        fname, index = slug + ".ttl", 1
        while fname in taken:
            fname = f"{slug}_{index}.ttl"
            index += 1
        taken.add(fname)
        names[owner] = fname
        body = "\n".join(sorted(per_owner[owner]))
        with open(os.path.join(out_dir, fname), "w", encoding="utf-8") as f:
            # appendSignature adds a newline + the signature comment at EOF
            f.write(header + "\n" + body + "\n\n" + SIGNATURE + "\n")
    return names


_PN = r"[A-Za-z0-9_\-]+"
_TERM = rf"(<[^>]*>|{_PN}:{_PN}|_:{_PN}|a)"
_LIT = (
    r'"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^(<[^>]*>|[A-Za-z0-9_\-]+:[A-Za-z0-9_\-]+)|@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?"
)
TRIPLE_RE = rf"^\s*{_TERM}\s+{_TERM}\s+(?:{_LIT}|{_TERM})\s*\.\s*$"


def ttl_rejects(spark: SparkSession, path: str) -> DataFrame:
    """(line) — input lines that are neither comments/@prefix/blank nor
    parseable triples: the quarantine view of :func:`read_ttl`'s silent
    drop. The reference aborts the JVM on unparseable input
    (`CmapUtil.extractModelFromOntologyFile` lets Jena throw); at
    10^12-turn scale a poison line must neither kill the job NOR vanish
    unaccounted — monitoring asserts ``ttl_rejects(...).count() == 0`` (or
    routes the rows to a dead-letter sink). Same pushed-down scan shape as
    the parser, just the complement predicate."""
    return (
        spark.read.text(path)
        .filter(
            ~F.col("value").startswith("#")
            & ~F.col("value").startswith("@prefix")
            & (F.length(F.trim(F.col("value"))) > 0)
            & ~F.col("value").rlike(TRIPLE_RE)
        )
        .select(F.col("value").alias("line"))
    )


def read_ttl(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parse of the line-oriented TTL subset back into the
    triples schema. Prefix expansion is a broadcast-free when-ladder over
    the static prefix map; comment/@prefix lines are filtered out by one
    pushed-down predicate. Lines that match neither form are dropped from
    this view and surfaced by :func:`ttl_rejects`."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & ~F.col("value").startswith("@prefix")
        & (F.length(F.trim(F.col("value"))) > 0)
    )
    g = lambda i: F.regexp_extract(F.col("value"), TRIPLE_RE, i)

    def expand(col):
        bare = F.regexp_replace(col, r"^<|>$", "")
        out = bare
        for prefix, ns in _PREFIXES:
            out = F.when(
                col.startswith(prefix + ":"),
                F.concat(F.lit(ns), F.substring(col, len(prefix) + 2, 10_000)),
            ).otherwise(out)
        return out

    def unesc(col):
        # `\\` FIRST (via a NUL sentinel, stripped on write) so a literal
        # backslash followed by t/n/r/" — e.g. 'C:\new' escaped to 'C:\\new'
        # — is not mis-decoded by the char escapes; mirrors the write-side
        # order (backslash first).
        c = F.regexp_replace(col, r"\\\\", "\x00")
        c = F.regexp_replace(c, r"\\t", "\t")
        c = F.regexp_replace(c, r"\\r", "\r")
        c = F.regexp_replace(c, r"\\n", "\n")
        c = F.regexp_replace(c, r'\\"', '"')
        c = F.regexp_replace(c, "\x00", r"\\")  # replaceAll: `\\` -> one backslash
        return c

    subj_t, pred_t, lit_lex, lit_dt, lit_lang, obj_t = g(1), g(2), g(3), g(4), g(5), g(6)
    is_lit = F.col("value").rlike(r'"') & (obj_t == "")
    pred = F.when(pred_t == "a", F.lit(vocab.RDF_TYPE)).otherwise(expand(pred_t))
    parsed = lines.filter(F.col("value").rlike(TRIPLE_RE)).select(
        expand(subj_t).alias("subj"),
        pred.alias("pred"),
        F.when(is_lit, F.lit("literal"))
        .when(obj_t.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("iri"))
        .alias("obj_kind"),
        F.when(obj_t.startswith("_:b"), F.concat(F.lit("urn:uuid:"), F.substring(obj_t, 4, 10_000)))
        .when(~is_lit, expand(obj_t))
        .alias("obj_iri"),
        F.when(is_lit, unesc(lit_lex)).alias("obj_lexical"),
        F.when(
            is_lit,
            F.when(lit_lang != "", F.concat(F.lit(_LANG_DT_PREFIX), lit_lang))
            .when(lit_dt != "", expand(lit_dt))
            .otherwise(F.lit(vocab.XSD_STRING)),
        ).alias("obj_datatype"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )
    return parsed.select(*[F.col(f.name).cast(f.dataType) for f in TRIPLES.fields])

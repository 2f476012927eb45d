"""N-Quads sink/source (sources/nquads.py): grammar forms, escaping, the
lineage graph-label mapping, and the write→read round trip. Content
equivalence vs the pipeline is the kg_nquads_roundtrip oracle's job; these
pin the serialization contract itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.sources import nquads as NQ


def _rows():
    return [
        # iri object inside a named graph
        ("urn:uuid:s1", "http://e/p", "iri", "http://e/o", None, None, "conv-1", 3),
        # literal with every escape class
        ("urn:uuid:s1", "http://e/lab", "literal", None,
         'he said "hi"\nok\t\\x', vocab.XSD_STRING, "conv-1", 2),
        # typed literal in the DEFAULT graph (NULL conv_id -> 3-term line)
        ("urn:uuid:s2", "http://e/age", "literal", None, "42",
         vocab.XSD + "integer", None, None),
        # language-tagged literal (datatype fold decoded to @fr)
        ("urn:uuid:s2", "http://e/name", "literal", None, "bonjour",
         vocab.RDF + "langString@fr", "conv-2", 1),
        # skolemized bnode object -> _:b<uuid> label
        ("urn:uuid:s2", "http://e/card", "bnode", "urn:uuid:deadbeef",
         None, None, "conv-2", 5),
        # bnode subject stays a label
        ("_:sub", "http://e/p", "iri", "http://e/z", None, None, None, None),
    ]


def _write(spark, tmp_path):
    df = spark.createDataFrame(_rows(), TRIPLES)
    path = str(tmp_path / "out.nq")
    NQ.write_nquads(df, path)
    return df, path


def test_quad_grammar_forms(spark, tmp_path):
    _, path = _write(spark, tmp_path)
    lines = sorted(
        r["value"] for r in spark.read.text(path).collect()
        if not r["value"].startswith("#")
    )
    assert '<urn:uuid:s1> <http://e/p> <http://e/o> <urn:conv:conv-1> .' in lines
    # default graph = 3-term line, typed literal keeps ^^<dt>
    assert (
        '<urn:uuid:s2> <http://e/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .'
        in lines
    )
    assert '<urn:uuid:s2> <http://e/name> "bonjour"@fr <urn:conv:conv-2> .' in lines
    assert '<urn:uuid:s2> <http://e/card> _:bdeadbeef <urn:conv:conv-2> .' in lines
    assert '_:sub <http://e/p> <http://e/z> .' in lines
    # escape classes: quote, newline, tab, backslash
    assert (
        '<urn:uuid:s1> <http://e/lab> "he said \\"hi\\"\\nok\\t\\\\x" <urn:conv:conv-1> .'
        in lines
    )


def test_roundtrip_preserves_everything_but_turn_idx(spark, tmp_path):
    df, path = _write(spark, tmp_path)
    back = NQ.read_nquads(spark, path)
    exp = {(r[0], r[1], r[2], r[3], r[4], r[5], r[6], None) for r in _rows()}
    assert {tuple(r) for r in back.collect()} == exp
    # fixed point: writing the parsed frame again reproduces the same set
    path2 = str(tmp_path / "out2.nq")
    NQ.write_nquads(back, path2)
    assert {tuple(r) for r in NQ.read_nquads(spark, path2).collect()} == exp


def test_signature_shard_is_first(spark, tmp_path):
    import glob

    _, path = _write(spark, tmp_path)
    first = sorted(glob.glob(path + "/part-*"))[0]
    assert open(first, encoding="utf-8").read().startswith("# created with")


def test_foreign_graph_label_is_carried_verbatim(spark, tmp_path):
    path = str(tmp_path / "f.nq")
    with open(path, "w", encoding="utf-8") as f:
        f.write("<http://e/s> <http://e/p> <http://e/o> <http://other/graph> .\n")
    back = NQ.read_nquads(spark, path).collect()
    assert back[0]["conv_id"] == "http://other/graph"


def test_read_is_shuffle_free_with_pushed_filter(spark, tmp_path):
    _, path = _write(spark, tmp_path)
    plan = (
        NQ.read_nquads(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_roundtrip_adversarial_literal_batch(spark, tmp_path):
    """One batched write->read over pseudo-random adversarial literals
    (quotes, backslash runs, tabs/newlines/CRs, unicode, IRI-ish text,
    N-Quads metacharacters) — the escape chain must be a bijection."""
    import random

    rng = random.Random(20260819)
    alphabet = list('abc "\\\\\n\r\t<>._:^^@日本語é€') + ["\\n", '\\"', "\\\\"]
    rows = []
    for i in range(300):
        lex = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        conv = f"c{i % 7}" if i % 3 else None
        rows.append(
            (f"urn:uuid:s{i}", "http://e/p", "literal", None, lex,
             vocab.XSD_STRING, conv, None)
        )
    df = spark.createDataFrame(rows, TRIPLES)
    path = str(tmp_path / "fuzz.nq")
    NQ.write_nquads(df, path)
    got = {tuple(r) for r in NQ.read_nquads(spark, path).collect()}
    exp = {tuple(r) for r in rows}
    # NUL is the one documented exclusion (stripped, forbidden in the grammar)
    assert got == exp
    # every non-comment output line matches the quad grammar exactly
    bad = (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#") & ~F.col("value").rlike(NQ.QUAD_RE))
        .count()
    )
    assert bad == 0

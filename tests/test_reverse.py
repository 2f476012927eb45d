"""§3.2 reverse mapping: title ladder + triples -> cmap shape -> triples
round trip (`Turtle2CmapConverter.createTitle:2049-2130`, `:142-314`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.operators.reverse import (
    link_edges,
    reassemble_triples,
    reconstruct_cmap,
    title_ladder,
)
from rdfcmap_spark.plans.pipeline import run_pipeline
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.synth import transcripts_df


def _lit(s, p, lex):
    return (s, p, "literal", None, lex, vocab.XSD_STRING, None, None)


def _iri(s, p, o):
    return (s, p, "iri", o, None, None, None, None)


def test_title_ladder_priority(spark):
    rows = [
        # every tier present -> dct:title wins
        _lit("e1", vocab.DCT_TITLE, "the title"),
        _lit("e1", vocab.SKOS_PREF_LABEL, "the preflabel"),
        _lit("e1", vocab.DCT + "identifier", "ID-1"),
        _lit("e1", vocab.RDFS_LABEL, "the label"),
        # prefLabel beats identifier/label
        _lit("e2", vocab.SKOS_PREF_LABEL, "pl2"),
        _lit("e2", vocab.RDFS_LABEL, "l2"),
        # type-label fallback: e3 typed with a titled class
        _iri("e3", vocab.RDF_TYPE, "c:T"),
        _lit("c:T", vocab.DCT_TITLE, "Type Title"),
        # nothing at all -> "instance"
        _iri("e4", "ex:related", "e1"),
        # first-match pinned to lexicographic min
        _lit("e5", vocab.DCT_TITLE, "zebra"),
        _lit("e5", vocab.DCT_TITLE, "aardvark"),
    ]
    df = spark.createDataFrame(rows, TRIPLES)
    got = {r["subj"]: (r["title"], r["title_source"]) for r in title_ladder(df).collect()}
    assert got["e1"] == ("the title", "title")
    assert got["e2"] == ("pl2", "prefLabel")
    assert got["e3"] == ("Type Title", "type")
    assert got["e4"] == ("instance", "instance")
    assert got["e5"] == ("aardvark", "title")
    assert got["c:T"] == ("Type Title", "title")


def test_title_ladder_multiple_types_joined_sorted(spark):
    rows = [
        _iri("e1", vocab.RDF_TYPE, "c:B"),
        _iri("e1", vocab.RDF_TYPE, "c:A"),
        _lit("c:B", vocab.RDFS_LABEL, "beta"),
        _lit("c:A", vocab.RDFS_LABEL, "alpha"),
    ]
    got = {r["subj"]: r["title"] for r in title_ladder(spark.createDataFrame(rows, TRIPLES)).collect()}
    assert got["e1"] == "alpha, beta"  # sorted, ", "-joined (pinned HashSet order)


def test_reconstruct_roundtrip_pipeline_triples(spark):
    """triples -> (concepts, links, connections) -> two-hop reassembly must
    reproduce exactly the relation edges with their ladder labels (P/R=1.0)."""
    triples = run_pipeline(transcripts_df(spark, 6, 4).localCheckpoint()).triples.localCheckpoint()
    concepts, links, connections = reconstruct_cmap(triples)
    back = {
        (r["subj"], r["link_label"], r["obj"])
        for r in reassemble_triples(concepts, links, connections).collect()
    }
    # expected: link_edges labelled through the same ladder (computed
    # independently of the link minting/joins under test)
    titles = {r["subj"]: r["title"] for r in title_ladder(triples).collect()}
    import re

    def label_of(pred):
        t = titles.get(pred)
        if t is not None and t != "instance":
            return t
        return re.search(r"([^#/]+)$", pred).group(1)

    expected = {
        (r["subj"], label_of(r["pred"]), r["obj"]) for r in link_edges(triples).collect()
    }
    assert back == expected and len(back) > 0
    # every connection endpoint resolves to a concept or a link (closed shape)
    ids = {r["concept_id"] for r in concepts.collect()} | {r["link_id"] for r in links.collect()}
    for r in connections.collect():
        assert r["from_id"] in ids and r["to_id"] in ids

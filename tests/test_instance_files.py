"""S8 per-instance TTL files (`writeSeparateTurtleFiles:2585-2770`): the
slug chain, the `_1,_2` filesystem-probe collision contract, the bracket
quirk, blank-node closure and the appended signature."""

from __future__ import annotations

import os

import pytest

from rdfcmap_spark import vocab
from rdfcmap_spark.schemas import TRIPLES
from rdfcmap_spark.sources.ttl import SIGNATURE, write_instance_files

EX = "http://example.org/"


def _title(subj, title):
    return (subj, vocab.DCT_TITLE, "literal", None, title, vocab.XSD_STRING, None, None)


def _iri(subj, pred, obj, kind="iri"):
    return (subj, pred, kind, obj, None, None, None, None)


@pytest.fixture()
def fixture(spark):
    rows = [
        # two instances with the SAME title -> slug collision
        _title("urn:uuid:a1", "Reactor Vessel"),
        _iri("urn:uuid:a1", EX + "p", EX + "X"),
        _title("urn:uuid:a2", "Reactor Vessel"),
        _iri("urn:uuid:a2", EX + "p", EX + "X"),
        # an instance whose NATURAL slug collides with a2's allocated name
        _title("urn:uuid:a3", "reactor vessel_1"),
        _iri("urn:uuid:a3", EX + "p", EX + "X"),
        # untitled -> IRI slug
        _iri("urn:uuid:d9", EX + "p", EX + "X"),
        # degenerate title -> 'unlabeled'
        _title("urn:uuid:e1", " ~~ "),
        # parenthesized title -> the reference's bracket quirk
        _title("urn:uuid:f1", "(x)"),
        # bnode satellite: lands in its owner's file
        _iri("urn:uuid:a1", EX + "r", "urn:uuid:bn-k", kind="bnode"),
        ("urn:uuid:bn-k", vocab.RDFS_LABEL, "literal", None, "sat", vocab.XSD_STRING, None, None),
    ]
    return spark.createDataFrame(rows, TRIPLES)


def test_filename_contract(spark, fixture, tmp_path):
    names = write_instance_files(fixture, str(tmp_path / "out"))
    assert names["urn:uuid:a1"] == "reactor-vessel.ttl"
    assert names["urn:uuid:a2"] == "reactor-vessel_1.ttl"
    # a3's natural slug is taken by a2's collision suffix -> probe continues
    assert names["urn:uuid:a3"] == "reactor-vessel_1_1.ttl"
    assert names["urn:uuid:d9"] == "urn-uuid-d9.ttl"
    assert names["urn:uuid:e1"] == "unlabeled.ttl"
    assert names["urn:uuid:f1"] == "[x].ttl"
    # no file for the bnode satellite itself
    assert "urn:uuid:bn-k" not in names
    assert sorted(os.listdir(tmp_path / "out")) == sorted(names.values())


def test_bnode_closure_and_signature(spark, fixture, tmp_path):
    out = tmp_path / "out"
    names = write_instance_files(fixture, str(out))
    content = (out / names["urn:uuid:a1"]).read_text()
    # the satellite's own statement is in the owner's file
    assert '"sat"' in content
    assert "reactor-vessel" not in names.get("urn:uuid:bn-k", "")
    # signature is the last line (appendSignature semantics)
    assert content.rstrip("\n").splitlines()[-1] == SIGNATURE
    # prefix header present
    assert content.startswith("@prefix")


def test_gate_is_loud(spark, fixture):
    with pytest.raises(ValueError, match="gate"):
        write_instance_files(fixture, "/tmp/unused_gate_dir", max_statements=2)

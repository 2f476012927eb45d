"""T1 golden round-trip fixture tests (SURVEY.md §5).

The generator plants known concept-map structures into transcript text; the
golden oracle (`synth.expected_triples`) independently applies the reference
semantics (resolution ladder, deprecation redirect, cardinality grammar,
literal typing, unit rewrite, skolemization, union-find canonicalization).
The pipeline's emitted triple set must match at P/R >= 0.95 (BASELINE.json);
at this scale we expect exact equality.

Also covers T3 determinism: identical output at different parallelism and
per-turn text equality under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import pytest

from rdfcmap_spark import synth
from rdfcmap_spark.plans.pipeline import pipeline_metrics, run_pipeline
from rdfcmap_spark.schemas import TRANSCRIPTS, TRIPLE_KEY

N_CONVS, TURNS = 12, 8


@pytest.fixture(scope="module")
def fixture_df(spark):
    pdf = synth.transcripts_pdf(N_CONVS, TURNS)
    return spark.createDataFrame(pdf, TRANSCRIPTS).cache()


def _collect_triples(df):
    return {
        (r["subj"], r["pred"], r["obj_kind"], r["obj_iri"], r["obj_lexical"], r["obj_datatype"])
        for r in df.select(*TRIPLE_KEY).collect()
    }


def test_pipeline_matches_golden(fixture_df):
    golden = synth.expected_triples(N_CONVS, TURNS)
    got = _collect_triples(run_pipeline(fixture_df).triples)
    tp = len(got & golden.triples)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(golden.triples) if golden.triples else 0.0
    missing = list(golden.triples - got)[:5]
    extra = list(got - golden.triples)[:5]
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f}\nmissing={missing}\nextra={extra}"
    )
    # at fixture scale we expect the exact set
    assert precision == 1.0 and recall == 1.0, (precision, recall, missing, extra)


def test_metrics_match_golden(fixture_df):
    golden = synth.expected_triples(N_CONVS, TURNS)
    m = pipeline_metrics(fixture_df)
    assert m["unresolved_subjects"] + m["unresolved_objects"] == golden.unresolved_mentions
    assert m["unresolved_phrases"] == golden.unresolved_phrases
    assert m["quarantined_literals"] >= 0
    assert m["sentences"] > 0


def test_determinism_across_parallelism(spark, fixture_df):
    """Same triple set regardless of partitioning (two-cluster-size invariant)."""
    t1 = _collect_triples(run_pipeline(fixture_df.repartition(1)).triples)
    t8 = _collect_triples(run_pipeline(fixture_df.repartition(16)).triples)
    assert t1 == t8


def test_distributed_generator_matches_pandas(spark):
    """mapInPandas generation is a pure function of the global index."""
    pdf = synth.transcripts_pdf(4, 5).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df = synth.transcripts_df(spark, 4, 5, partitions=7).toPandas()
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(df["text"]) == list(pdf["text"])
    assert list(df["role"]) == list(pdf["role"])


def test_per_turn_text_equality(spark, fixture_df):
    """input_hint invariant: the pipeline never mutates turn text; reading it
    back ordered by (conv_id, turn_idx) is byte-identical at any parallelism."""
    a = fixture_df.orderBy("conv_id", "turn_idx").select("text").collect()
    b = fixture_df.repartition(13).orderBy("conv_id", "turn_idx").select("text").collect()
    assert [r["text"] for r in a] == [r["text"] for r in b]


def test_pipeline_with_visualization_twins(fixture_df):
    """with_visualization=True appends the afv: twin model: instance set
    unchanged, every urn:uuid subject gains exactly one twin carrying the
    11-statement template, twin ids are the uuid prefix swap, and the
    walk coordinates advance 25/25 in subject order."""
    from rdfcmap_spark import vocab
    from rdfcmap_spark.ids import VIZ_PREFIX

    base = _collect_triples(run_pipeline(fixture_df).triples)
    got = _collect_triples(run_pipeline(fixture_df, with_visualization=True).triples)
    twins = got - base
    assert base <= got
    # golden instance rows unchanged
    golden = synth.expected_triples(N_CONVS, TURNS)
    assert golden.triples <= got

    inst_subjects = {t[0] for t in base if t[0].startswith("urn:uuid:")}
    twin_subjects = {t[0] for t in twins if t[0].startswith(VIZ_PREFIX)}
    map_iri = next(
        t[0] for t in twins if t[1] == vocab.RDF_TYPE and t[3] == vocab.AFV_MAP
    )
    # one afx:hasObject per instance, pointing back via prefix swap
    has_obj = {t[0]: t[3] for t in twins if t[1] == vocab.AFX_HAS_OBJECT}
    assert set(has_obj.values()) == inst_subjects
    for viz, inst in has_obj.items():
        assert viz == VIZ_PREFIX + inst[len("urn:uuid:"):]
    # full 11-statement template per twin (+2 map rows)
    assert len(twins) == 11 * len(inst_subjects) + 2
    for viz in has_obj:
        preds = {t[1] for t in twins if t[0] == viz}
        assert preds == {
            vocab.AFX_HAS_OBJECT, vocab.RDF_TYPE, vocab.DCT_IDENTIFIER,
            vocab.DCT_TITLE, vocab.AFV_HAS_MAP, vocab.AFV_SHORT_COMMENT,
            vocab.AFV_LONG_COMMENT, vocab.AFV_X_POSITION, vocab.AFV_Y_POSITION,
            vocab.AFV_WIDTH, vocab.AFV_HEIGHT,
        }
        assert (viz, vocab.AFV_HAS_MAP, "iri", map_iri, None, None) in twins
    # diagonal walk in instance-subject order
    xs = {t[0]: int(t[4]) for t in twins if t[1] == vocab.AFV_X_POSITION}
    ys = {t[0]: int(t[4]) for t in twins if t[1] == vocab.AFV_Y_POSITION}
    order = sorted(inst_subjects)
    for i, inst in enumerate(order):
        viz = VIZ_PREFIX + inst[len("urn:uuid:"):]
        assert xs[viz] == 10 + 25 * i and ys[viz] == 10 + 25 * i
    assert twin_subjects == set(has_obj) | {map_iri}

"""JSONL transcripts source (sources/jsonl.py): schema-enforced read,
malformed-line quarantine, and write->read round trip with timestamps."""

from __future__ import annotations

import os
from datetime import datetime, timezone

from rdfcmap_spark.sources.jsonl import (
    read_transcripts_jsonl,
    split_quarantine,
    write_transcripts_jsonl,
)

_TS = datetime(2026, 1, 1, 12, 30, 45, 123456, tzinfo=timezone.utc)


def test_roundtrip_exact(spark, tmp_path):
    rows = [
        ("A", 0, "user", 'he said "hi" \\ there', "", _TS),
        ("A", 1, "assistant", "ünïcode · «mention»", "", _TS),
        ("B", 0, "tool", None, "search", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    path = os.path.join(str(tmp_path), "t")
    write_transcripts_jsonl(df, path)
    good, bad = split_quarantine(read_transcripts_jsonl(spark, path))
    assert bad.count() == 0
    got = sorted(
        ((r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
          r["ts"].replace(tzinfo=timezone.utc) if r["ts"] else None)
         for r in good.collect())
    )
    assert got == sorted(rows)


def test_quarantine_captures_bad_lines(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part-00000.json").write_text(
        '{"conv_id": "A", "turn_idx": 0, "role": "user", "text": "ok", '
        '"tool": "", "ts": "2026-01-01 00:00:00.000000"}\n'
        "this is not json at all\n"
        '{"conv_id": "B", "turn_idx": "NaN-ish", "role": "user"}\n'
    )
    good, bad = split_quarantine(read_transcripts_jsonl(spark, str(p)))
    assert [r["conv_id"] for r in good.collect()] == ["A"]
    raw = [r["raw_line"] for r in bad.collect()]
    assert len(raw) == 2
    assert "not json" in raw[0] or "not json" in raw[1]


def test_jsonl_stream_equals_batch(spark, tmp_path):
    """The streaming JSONL reader yields exactly the batch reader's rows,
    and composes with the streaming triple emission."""
    from rdfcmap_spark.sources.jsonl import read_transcripts_jsonl_stream
    from rdfcmap_spark.synth import transcripts_df

    d = os.path.join(str(tmp_path), "logs")
    turns = transcripts_df(spark, n_convs=4, turns_per_conv=5)
    write_transcripts_jsonl(turns, d)

    stream = read_transcripts_jsonl_stream(spark, d)
    good_stream = stream.filter(stream["_corrupt"].isNull()).drop("_corrupt")
    q = (
        good_stream.writeStream.format("memory")
        .queryName("jsonl_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("jsonl_stream")
    batch, _ = split_quarantine(read_transcripts_jsonl(spark, d), materialize=False)
    key = ["conv_id", "turn_idx", "role", "text", "tool"]
    assert {tuple(r) for r in got.select(*key).collect()} == {
        tuple(r) for r in batch.select(*key).collect()
    }
    assert got.count() == 20

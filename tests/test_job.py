"""spark-submit entry point (jobs/run_pipeline.py): end-to-end run with the
reference's output flags (--ttl-output --noprefixes --notitles
--noblanknodes --separate) against a tiny synthetic input."""

from __future__ import annotations

import json
import sys


def test_job_main_with_output_flags(spark, tmp_path, monkeypatch, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import run_pipeline

    argv = [
        "run_pipeline.py",
        "--synthetic-convs", "12",
        "--workdir", str(tmp_path / "wd"),
        "--output", str(tmp_path / "out"),
        "--ttl-output", str(tmp_path / "ttl"),
        "--noprefixes",
        "--separate", str(tmp_path / "sep"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    # the job's getOrCreate reuses the test session; don't let it stop it
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    run_pipeline.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["triples"] > 0 and out["separate_files"] > 0
    assert out["ttl_output"] == str(tmp_path / "ttl")
    # --noprefixes: no @prefix block anywhere in the TTL dump
    lines = [r["value"] for r in spark.read.text(str(tmp_path / "ttl")).collect()]
    assert not any(l.startswith("@prefix") for l in lines)
    # default useBlankNodes: instance subjects are anonymous
    assert any(l.startswith("_:b") for l in lines)
    assert not any(l.startswith("<urn:uuid:") for l in lines)
    # per-instance files exist with slug names
    sep = list((tmp_path / "sep").iterdir())
    assert sep and all(f.suffix == ".ttl" for f in sep)


def test_job_table_output_append_and_resume(spark, tmp_path, monkeypatch, capsys):
    """--table-output commits through the versioned table log; a re-run of
    the identical job is a content-idempotent replay (same version, no
    duplicate rows) — the restart-without-recompute property end to end."""
    sys.path.insert(0, "/root/repo/jobs")
    import run_pipeline

    from rdfcmap_spark.sources.table_log import read_table

    argv = [
        "run_pipeline.py",
        "--synthetic-convs", "8",
        "--workdir", str(tmp_path / "wd"),
        "--output", str(tmp_path / "out"),
        "--table-output", str(tmp_path / "tbl"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    run_pipeline.main()
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["table_version"] == 1

    run_pipeline.main()
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["table_version"] == 1  # replay absorbed
    assert second["table_snapshot_id"] == first["table_snapshot_id"]

    df, snap = read_table(spark, str(tmp_path / "tbl"))
    assert df.count() == snap["row_count"] == first["triples"]
    assert sum(snap["partition_counts"].values()) == snap["row_count"]

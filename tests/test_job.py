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

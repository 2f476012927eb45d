"""Versioned table log (Iceberg-style snapshots over parquet): append /
overwrite / time travel / atomic pointer / idempotent replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfcmap_spark.sources.table_log import (
    commit,
    current_version,
    history,
    read_table,
    snapshot,
)


def _docs(spark, lo, hi, part="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit(part).alias("src"),
    )


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = commit(_docs(spark, 0, 10), t, mode="append", partition_by=["src"])
    assert s1["version"] == 1 and s1["row_count"] == 10
    assert s1["partition_counts"] == {"a": 10}

    s2 = commit(_docs(spark, 10, 15, part="b"), t, mode="append", partition_by=["src"])
    assert s2["version"] == 2 and s2["row_count"] == 15
    assert s2["partition_counts"] == {"a": 10, "b": 5}
    # append reuses v1's data dirs — no rewrite
    assert s1["data_dirs"][0] in s2["data_dirs"] and len(s2["data_dirs"]) == 2

    # time travel: v1 still reads exactly the first batch
    df1, snap1 = read_table(spark, t, version=1)
    assert df1.count() == 10 and snap1["snapshot_id"] == s1["snapshot_id"]
    dfc, _ = read_table(spark, t)
    assert dfc.count() == 15

    s3 = commit(_docs(spark, 100, 103, part="c"), t, mode="overwrite", partition_by=["src"])
    assert s3["version"] == 3 and s3["row_count"] == 3 and len(s3["data_dirs"]) == 1
    assert current_version(t) == 3
    # history keeps every snapshot; v2 remains readable after the overwrite
    assert [h["version"] for h in history(t)] == [1, 2, 3]
    df2, _ = read_table(spark, t, version=2)
    assert df2.count() == 15


def test_idempotent_append_replay(spark, tmp_path):
    """Re-committing a batch whose content fingerprint is already in the
    table is a no-op returning the existing snapshot — the resume
    property for a restarted final stage."""
    t = str(tmp_path / "tbl")
    commit(_docs(spark, 0, 10), t)
    s2 = commit(_docs(spark, 10, 20), t)
    replay = commit(_docs(spark, 10, 20), t)  # same content, different run
    assert replay["version"] == s2["version"] == current_version(t)
    df, _ = read_table(spark, t)
    assert df.count() == 20  # no duplicate rows


def test_snapshot_id_parallelism_invariant(spark, tmp_path):
    """The content fingerprint is order-insensitive: identical logical
    rows written at different parallelism produce the same snapshot id."""
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    a = commit(_docs(spark, 0, 50).repartition(1), t1)
    b = commit(_docs(spark, 0, 50).repartition(13), t2)
    assert a["snapshot_id"] == b["snapshot_id"]
    assert a["batch_fingerprint"] == b["batch_fingerprint"]


def test_pipeline_triples_through_table_log(spark, tmp_path):
    """The flagship product commits through the log partitioned by
    obj_kind; per-partition lineage counts survive and a second identical
    commit is absorbed."""
    from rdfcmap_spark.plans.pipeline import run_pipeline
    from rdfcmap_spark.synth import transcripts_df

    t = str(tmp_path / "triples_tbl")
    triples = run_pipeline(transcripts_df(spark, n_convs=4, turns_per_conv=4)).triples
    s1 = commit(triples, t, mode="append", partition_by=["obj_kind"])
    assert s1["row_count"] > 0
    assert set(s1["partition_counts"]) <= {"iri", "bnode", "literal"}
    assert sum(s1["partition_counts"].values()) == s1["row_count"]
    s2 = commit(triples, t, mode="append", partition_by=["obj_kind"])
    assert s2["version"] == s1["version"]  # idempotent replay


def test_commit_race_rebases_not_overwrites(spark, tmp_path, monkeypatch):
    """r4 ADVICE: two writers racing to the same version must not lose
    rows. Simulate the losing side: its current_version read is stale (a
    rival committed v2 between the read and the O_EXCL snapshot create),
    so its first attempt collides on v2.json and it must REBASE onto the
    rival's snapshot — the final table contains both writers' batches."""
    from rdfcmap_spark.sources import table_log

    t = str(tmp_path / "tbl")
    commit(_docs(spark, 0, 10), t)
    s2 = commit(_docs(spark, 10, 20), t)  # the "rival" commit (v2)

    real_cv = table_log.current_version
    state = {"stale": True}

    def stale_once(table):
        v = real_cv(table)
        if state["stale"]:
            state["stale"] = False
            return (v or 0) - 1 or None  # pretend we never saw the rival
        return v

    monkeypatch.setattr(table_log, "current_version", stale_once)
    s3 = table_log.commit(_docs(spark, 20, 25), t)
    monkeypatch.undo()

    # landed as v3 on top of the rival's v2 — nothing overwritten
    assert s3["version"] == 3 and current_version(t) == 3
    assert set(s2["data_dirs"]) < set(s3["data_dirs"])
    df, _ = read_table(spark, t)
    assert df.count() == 25  # 10 + 10 + 5: the rival's batch survived


def test_commit_crashed_rival_raises_not_overwrites(spark, tmp_path, monkeypatch):
    """A rival that created v2.json but died before swapping _current must
    never be silently overwritten: the writer waits (bounded), then
    raises."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from rdfcmap_spark.sources import table_log

    t = str(tmp_path / "tbl")
    commit(_docs(spark, 0, 10), t)
    # fake a crashed rival: v2.json exists, _current still says 1
    with open(_os.path.join(t, "metadata", "v2.json"), "x") as f:
        _json.dump({"version": 2, "data_dirs": []}, f)
    monkeypatch.setattr(table_log, "_COMMIT_RETRIES", 2)
    monkeypatch.setattr(table_log.time, "sleep", lambda s: None)  # fast wait-out
    with _pytest.raises(RuntimeError, match="optimistic-concurrency"):
        table_log.commit(_docs(spark, 10, 20), t)

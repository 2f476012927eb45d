"""Fast guard: every ``oracle_sql()`` string must be valid DuckDB SQL over
the driver's registered views. Catches dialect/syntax regressions in seconds
under plain ``pytest`` (the full value comparison is tools/check_oracle.py /
the driver gate)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from rdfcmap_spark.oracle import TRANSCRIPTS_ORACLE_PATH
from rdfcmap_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_sql_plans(con, name):
    sql = _ORACLES[name]
    if TRANSCRIPTS_ORACLE_PATH in sql and not os.path.isdir(TRANSCRIPTS_ORACLE_PATH):
        pytest.skip("pipeline oracle needs the transcripts parquet a query run writes")
    con.sql("EXPLAIN " + sql)  # binder + planner run; raises on any error


#: queries the driver may check rows-only: genuinely non-SQL-expressible ops
#: (iterative float fixed points). Every entry here needs a dedicated pytest
#: instead (kg_g9_layout: tests/test_layout.py convergence + determinism).
ROWS_ONLY_OK = {"kg_g9_layout"}


def test_every_query_has_oracle():
    """~0 rows-only: every queries() entry must carry an oracle (the round-1
    gap this repo closed) unless it is on the explicit, justified
    ROWS_ONLY_OK list. A new query without one should fail loudly here,
    not silently downgrade the correctness gate."""
    missing = sorted(set(entrymod.queries()) - set(_ORACLES) - ROWS_ONLY_OK)
    assert missing == [], f"queries without oracle_sql: {missing}"
    # the allowlist must not rot: entries there must still exist and must
    # not silently grow an oracle (then they should come off the list)
    assert ROWS_ONLY_OK <= set(entrymod.queries())
    assert not (ROWS_ONLY_OK & set(_ORACLES))

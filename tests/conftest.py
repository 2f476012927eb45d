from __future__ import annotations

import pytest

from rdfcmap_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(cpus=8, app_name="rdfcmap_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()

"""G1 canonicalization: driver fast-path vs distributed loop equivalence,
convergence on adversarial shapes, and parallelism invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rdfcmap_spark.operators.canonicalize import connected_components, identity_edges


def _random_edges(n_nodes: int, n_edges: int, seed: str) -> list[tuple[str, str]]:
    out = []
    for i in range(n_edges):
        h = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:12], 16)
        a, b = h % n_nodes, (h // n_nodes) % n_nodes
        if a != b:
            out.append((f"n{a:04d}", f"n{b:04d}"))
    return out


CASES = {
    "chain": [(f"c{i}", f"c{i+1}") for i in range(40)],  # long diameter
    "star": [("hub", f"s{i}") for i in range(50)],
    "cycle": [(f"y{i}", f"y{(i+1) % 7}") for i in range(7)],
    "two_comps": [("a", "b"), ("b", "c"), ("p", "q")],
    "random_sparse": _random_edges(200, 150, "sparse"),
    "random_dense": _random_edges(50, 300, "dense"),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_driver_equals_distributed(spark, name):
    df = spark.createDataFrame(CASES[name], "src string, dst string")
    drv = sorted(map(tuple, connected_components(df).collect()))
    dist = sorted(map(tuple, connected_components(df, driver_threshold=0).collect()))
    assert drv == dist
    # representative is the component min — spot-check closure property
    comp_of = dict(drv)
    for s, d in CASES[name]:
        assert comp_of[s] == comp_of[d]


def test_identity_edges_star_not_quadratic(spark):
    """A hot identifier value yields k-1 star edges, never k^2 pairs."""
    idents = spark.createDataFrame(
        [(f"e{i}", "ID-hot") for i in range(100)] + [("e900", "ID-x"), ("e901", "ID-x")],
        "entity_id string, value string",
    )
    sameas = spark.createDataFrame([], "a string, b string")
    edges = identity_edges(sameas, idents)
    assert edges.count() == 99 + 1
    mapping = connected_components(edges)
    comps = {r["canonical_id"] for r in mapping.collect()}
    assert comps == {"e0", "e900"}


def test_mapping_invariant_to_partitioning(spark):
    rows = CASES["random_sparse"]
    df1 = spark.createDataFrame(rows, "src string, dst string").repartition(1)
    df16 = spark.createDataFrame(rows, "src string, dst string").repartition(16)
    a = sorted(map(tuple, connected_components(df1, driver_threshold=0).collect()))
    b = sorted(map(tuple, connected_components(df16, driver_threshold=0).collect()))
    assert a == b

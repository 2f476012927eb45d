"""M1 / O3 / G9 layout operators (SURVEY.md §2.7/§2.8) vs literal reference
ports and structural properties."""

import random

import pytest
from pyspark.sql import functions as F

from rdfcmap_spark.operators import layout


# --- M1 node sizing ----------------------------------------------------------


def test_node_sizes_reference_table(spark):
    # VisualizationInfoBuilder.java:1228-1268 — integer division + clamps +
    # font ladder, checked at every ladder boundary.
    levels = list(range(0, 16)) + [-1, -7, 100]
    df = spark.createDataFrame([(f"n{l}", l) for l in levels], "node string, level long")
    got = {r["node"]: (r["width"], r["height"], r["font_size"]) for r in layout.node_sizes(df).collect()}
    for l in levels:
        expected = layout.node_sizes_py(l)
        if expected is None:
            assert f"n{l}" not in got  # negative levels are unsized
        else:
            assert got[f"n{l}"] == expected, f"level {l}"
    # spot values straight from the Java math
    assert got["n0"] == (2000, 500, 800)  # level 0 -> 1
    assert got["n7"] == (1428, 357, 100)  # 10000/7 int-div = 1428 (not 1429)
    assert got["n13"] == (769, 192, 12)  # past the ladder -> default font
    assert got["n100"] == (100, 25, 12)  # clamped to minimums


# --- O3 overlap removal ------------------------------------------------------


def test_remove_overlap_py_matches_java_quirks():
    # coordinate at 0 is treated as no-hit (the `hit > 0` guard)
    assert layout.remove_overlap_py([0], 0) == 0
    # a hit within 5 bumps by 10 until clear
    assert layout.remove_overlap_py([100], 98) == 108
    # chain of coords keeps bumping: 100,110,120 within window each step
    assert layout.remove_overlap_py([100, 110, 120], 97) == 127
    # far hit: untouched
    assert layout.remove_overlap_py([500], 100) == 100
    # no hit at all: untouched
    assert layout.remove_overlap_py([50], 100) == 100


def test_link_positions_matches_python_mirror(spark):
    rng = random.Random(7)
    concepts, links, expected = [], [], {}
    for conv in range(6):
        nodes = [(f"c{conv}", f"n{i}", rng.randrange(0, 300), rng.randrange(0, 300)) for i in range(40)]
        concepts += nodes
        xs = [n[2] for n in nodes]
        ys = [n[3] for n in nodes]
        by_name = {n[1]: n for n in nodes}
        for j in range(30):
            a, b = rng.sample(list(by_name), 2)
            links.append((f"c{conv}", f"l{j}", a, b))
            mx = (by_name[a][2] + by_name[b][2] + 1) // 2  # Math.round(0.5*(x1+x2))
            my = (by_name[a][3] + by_name[b][3] + 1) // 2
            expected[(f"c{conv}", f"l{j}")] = (
                layout.remove_overlap_py(xs, mx),
                layout.remove_overlap_py(ys, my),
            )
    cdf = spark.createDataFrame(concepts, "conv_id string, node string, x long, y long")
    ldf = spark.createDataFrame(links, "conv_id string, link_id string, src string, dst string")
    got = {
        (r["conv_id"], r["link_id"]): (r["x"], r["y"])
        for r in layout.link_positions(cdf, ldf).collect()
    }
    assert got == expected


# --- G9 force layout ---------------------------------------------------------


@pytest.fixture(scope="module")
def g9_edges(spark):
    rows = []
    for conv in range(4):
        # two 6-node cliques bridged by one edge -> clear cluster structure
        for grp in range(2):
            names = [f"v{conv}_{grp}_{i}" for i in range(6)]
            rows += [(f"c{conv}", a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
        rows.append((f"c{conv}", f"v{conv}_0_0", f"v{conv}_1_0"))
    return spark.createDataFrame(rows, "conv_id string, src string, dst string")


def test_force_layout_deterministic_and_shifted(spark, g9_edges):
    a = sorted(map(tuple, layout.force_layout(g9_edges).collect()))
    b = sorted(map(tuple, layout.force_layout(g9_edges.repartition(13)).collect()))
    assert a == b  # deterministic incl. under repartitioning
    import collections

    mins = collections.defaultdict(lambda: [1 << 60, 1 << 60])
    for conv, _n, x, y in a:
        mins[conv][0] = min(mins[conv][0], x)
        mins[conv][1] = min(mins[conv][1], y)
    # Layouter.java:146-151 — min coordinate lands at +100 per map
    for conv, (mx, my) in mins.items():
        assert mx == 100 and my == 100, conv


def test_force_layout_separates_clusters(spark, g9_edges):
    pos = {
        (r["conv_id"], r["node"]): (r["x"], r["y"])
        for r in layout.force_layout(g9_edges).collect()
    }

    def dist(c, a, b):
        (x1, y1), (x2, y2) = pos[(c, a)], pos[(c, b)]
        return ((x1 - x2) ** 2 + (y1 - y2) ** 2) ** 0.5

    for conv in ["c0", "c1", "c2", "c3"]:
        intra = [dist(conv, f"v{conv[1]}_0_{i}", f"v{conv[1]}_0_{j}") for i in range(6) for j in range(i + 1, 6)]
        inter = [dist(conv, f"v{conv[1]}_0_{i}", f"v{conv[1]}_1_{i}") for i in range(6)]
        # clique members sit closer together than cross-cluster pairs on average
        assert sum(intra) / len(intra) < sum(inter) / len(inter), conv


def test_force_layout_grid_fallback(spark):
    n = layout.FORCE_MAX_NODES + 10
    edges = spark.createDataFrame(
        [("big", f"n{i:05d}", f"n{(i + 1) % n:05d}") for i in range(n)],
        "conv_id string, src string, dst string",
    )
    rows = layout.force_layout(edges).collect()
    assert len(rows) == n
    assert min(r["x"] for r in rows) == 100 and min(r["y"] for r in rows) == 100


def test_render_cxl_uses_layout_positions(spark):
    """Layout-computed coordinates land in the CXL appearance lists
    (Layouter writes positions into the model, Turtle2CmapConverter emits
    them); un-positioned elements keep the grid walk."""
    import xml.etree.ElementTree as ET

    from rdfcmap_spark.sources.cxl import render_cxl

    concepts = spark.createDataFrame(
        [("cA", "alpha"), ("cB", "beta")], "concept_id string, label string"
    )
    links = spark.createDataFrame([("l1", "has")], "link_id string, label string")
    conns = spark.createDataFrame(
        [("cA", "l1"), ("l1", "cB")], "from_id string, to_id string"
    )
    positions = spark.createDataFrame(
        [("cA", 123, 456), ("l1", 77, 88)], "node string, x long, y long"
    )
    root = ET.fromstring(render_cxl(concepts, links, conns, positions=positions))
    ns = "{http://cmap.ihmc.us/xml/cmap/}"
    capp = {e.get("id"): (e.get("x"), e.get("y")) for e in root.findall(f".//{ns}concept-appearance")}
    lapp = {e.get("id"): (e.get("x"), e.get("y")) for e in root.findall(f".//{ns}linking-phrase-appearance")}
    assert capp["cA"] == ("123", "456")
    assert capp["cB"] == ("20", "20")  # grid walk fallback (2nd element)
    assert lapp["l1"] == ("77", "88")

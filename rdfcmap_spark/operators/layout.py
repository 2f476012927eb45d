"""Layout geometry operators — SURVEY.md M1 / O3 / G9.

The reference computes concept-map geometry in three places:

* **M1 node sizing** — `VisualizationInfoBuilder.java:1215-1277`: box width
  ``clamp(10000 / level, 100, 2000)`` and height ``clamp(2500 / level, 25,
  500)`` (Java *integer* division — level 7 gives width 1428, not 1429),
  level 0 coerced to 1, negative levels left unsized, plus the 13-case font
  ladder (`:1232-1268`).
* **O3 link positioning / overlap removal** — `Layouter.updateLinkLocations:
  178-255`: each linking phrase lands at the rounded midpoint of its two
  concept endpoints, then `removeOverlap(:257-302)` probes the *sorted
  concept coordinate list* per axis: find the first coordinate ≥ pos; while
  it exists, is > 0, and sits within 5, bump pos by 10 — at most 21 probes
  (loop ``j = 0..20``).
* **G9 force-directed auto-layout** — `Layouter.doAutoLayout:773-794`: gephi
  YifanHu (70 % of the budget, optimal distance 1000) then two ForceAtlas
  refinement phases (25 % + 5 %); afterwards every node is shifted so the
  minimum coordinate is +100 and printed ``%.0f`` (`:146-151`).

Spark-first shape: a concept map is tiny (10s-100s of nodes) but a transcript
corpus holds *millions* of them — so M1/O3 are pure column expressions that
run per-row with per-conversation coordinate context carried as a small
aggregated array (no driver collect, no UDF), and G9 is one vectorized
numpy kernel per map under ``applyInPandas`` (the idiomatic per-group
iterative-algorithm shape; parallelism comes from the number of maps, the
per-map O(n²) kernel is gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: removeOverlap probe count: Layouter.java:276 ``for (int j = 0; j <= 20; ...)``
OVERLAP_ROUNDS = 21
#: overlap window / bump step: Layouter.java:274,280
OVERLAP_WINDOW = 5
OVERLAP_STEP = 10

# ---------------------------------------------------------------------------
# M1 — node box sizing from class-hierarchy level
# ---------------------------------------------------------------------------

#: font ladder, VisualizationInfoBuilder.java:1232-1268 (switch on the
#: 0-coerced-to-1 level; cases 1,2 -> 800 ... default 12)
_FONT_LADDER = [
    ((1, 2), 800),
    ((3, 3), 600),
    ((4, 4), 500),
    ((5, 5), 300),
    ((6, 6), 200),
    ((7, 9), 100),
    ((10, 10), 80),
    ((11, 11), 50),
    ((12, 12), 25),
]


def node_sizes(levels: DataFrame) -> DataFrame:
    """(node, level) -> (node, level, width, height, font_size).

    Faithful to `VisualizationInfoBuilder.java:1215-1277` including the Java
    integer division (``10000 / level`` truncates before the clamp) and the
    negative-level early return (those nodes are emitted unsized by the
    reference; we *filter* them, the observable contract for sized output).
    Pure column expressions — codegen'd, shuffle-free.
    """
    lvl = F.when(F.col("level") == 0, F.lit(1)).otherwise(F.col("level")).cast("bigint")
    width = F.least(F.greatest(F.lit(10000).cast("bigint") / lvl, F.lit(100)), F.lit(2000))
    height = F.least(F.greatest(F.lit(2500).cast("bigint") / lvl, F.lit(25)), F.lit(500))
    font = F.lit(12)
    for (lo, hi), size in reversed(_FONT_LADDER):
        font = F.when((lvl >= lo) & (lvl <= hi), F.lit(size)).otherwise(font)
    return levels.filter(F.col("level") >= 0).select(
        "node",
        F.col("level").cast("bigint").alias("level"),
        F.floor(width).cast("bigint").alias("width"),
        F.floor(height).cast("bigint").alias("height"),
        font.cast("bigint").alias("font_size"),
    )


def node_sizes_py(level: int) -> tuple[int, int, int] | None:
    """Plain-Python mirror of :func:`node_sizes` for tests/goldens."""
    if level < 0:
        return None
    lvl = 1 if level == 0 else level
    width = min(max(10000 // lvl, 100), 2000)
    height = min(max(2500 // lvl, 25), 500)
    font = 12
    for (lo, hi), size in _FONT_LADDER:
        if lo <= lvl <= hi:
            font = size
            break
    return width, height, font


# ---------------------------------------------------------------------------
# O3 — link midpoint + overlap removal
# ---------------------------------------------------------------------------


def _bump(pos, coords):
    """The removeOverlap probe (`Layouter.java:257-302`) as a bounded fold.

    Per probe: ``hit = min(c in coords where c >= pos)``; bump ``pos += 10``
    iff hit exists, hit > 0 (the reference's ``hit > 0`` guard treats a
    coordinate at 0 as no-hit), and ``hit - pos <= 5``.  A fold over a
    literal 1..21 sequence keeps the expression tree linear (an unrolled
    ``when`` chain would reference each prior step several times and blow up
    exponentially) and the runtime per-element — coords arrays are map-sized.
    """
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(OVERLAP_ROUNDS)),
        pos.cast("bigint"),
        lambda acc, _i: (
            lambda hit: F.when(
                hit.isNotNull() & (hit > 0) & ((hit - acc) <= OVERLAP_WINDOW),
                acc + OVERLAP_STEP,
            ).otherwise(acc)
        )(F.array_min(F.filter(coords, lambda c: c >= acc))),
    )


def link_positions(concepts: DataFrame, links: DataFrame) -> DataFrame:
    """Midpoint + overlap-shifted linking-phrase positions (O3).

    ``concepts``: (conv_id, node, x, y) — positioned concept boxes.
    ``links``: (conv_id, link_id, src, dst) — linking phrases between them.
    Output: (conv_id, link_id, x, y) with the reference's exact probe-and-bump
    semantics per axis (`Layouter.updateLinkLocations:178-255`).

    Scale shape: the per-map coordinate context is a ``collect_list`` array
    (maps are small by construction; the reference loads the whole map on one
    JVM), joined back per conversation — millions of maps parallelize across
    the cluster, zero driver involvement, no UDF.
    """
    coords = concepts.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(F.col("x").cast("bigint"))).alias("xs"),
        F.array_sort(F.collect_list(F.col("y").cast("bigint"))).alias("ys"),
    )
    src = concepts.select(
        "conv_id",
        F.col("node").alias("src"),
        F.col("x").cast("bigint").alias("x1"),
        F.col("y").cast("bigint").alias("y1"),
    )
    dst = concepts.select(
        "conv_id",
        F.col("node").alias("dst"),
        F.col("x").cast("bigint").alias("x2"),
        F.col("y").cast("bigint").alias("y2"),
    )
    mid = (
        links.join(src, ["conv_id", "src"])
        .join(dst, ["conv_id", "dst"])
        # Java Math.round(0.5 * (x1 + x2)): floor(v + 0.5) on the double
        .select(
            "conv_id",
            "link_id",
            F.floor((F.col("x1") + F.col("x2")) * 0.5 + 0.5).alias("mx"),
            F.floor((F.col("y1") + F.col("y2")) * 0.5 + 0.5).alias("my"),
        )
    )
    return (
        mid.join(coords, "conv_id")
        .select(
            "conv_id",
            "link_id",
            _bump(F.col("mx"), F.col("xs")).alias("x"),
            _bump(F.col("my"), F.col("ys")).alias("y"),
        )
    )


def remove_overlap_py(coords: list[int], pos: int) -> int:
    """Literal Python port of `Layouter.removeOverlap:257-302` (test mirror).

    Kept structurally identical to the Java (initial-hit guard, probe loop
    with recompute + early break) so the fold in :func:`_bump` is verified
    against the reference's actual control flow, quirks included.
    """
    coords = sorted(coords)

    def first_ge(p: int) -> int:
        for c in coords:
            if c >= p:
                return c
        return -1

    hit = first_ge(pos)
    if hit > 0:
        for _j in range(OVERLAP_ROUNDS):
            if hit > 0 and abs(hit - pos) <= OVERLAP_WINDOW:
                pos += OVERLAP_STEP
            hit = first_ge(pos)
            if hit < 0:
                break
    return pos


# ---------------------------------------------------------------------------
# G9 — force-directed auto-layout (per-map kernel under applyInPandas)
# ---------------------------------------------------------------------------

#: YifanHu optimal distance, Layouter.java:784 (``optimalDistanceProperty``)
OPTIMAL_DISTANCE = 1000.0
#: per-map node ceiling for the O(n²) kernel; larger maps get the
#: deterministic grid fallback (a concept map this size is unrenderable
#: anyway — the reference would OOM gephi long before)
FORCE_MAX_NODES = 2000


def _seed_xy(name: str) -> tuple[float, float]:
    """Deterministic initial position from the node name (md5-derived unit
    square, scaled by the optimal distance) — replaces gephi's Random()."""
    import hashlib

    h = hashlib.md5(name.encode("utf-8")).hexdigest()
    return (
        (int(h[:8], 16) / 0xFFFFFFFF - 0.5) * OPTIMAL_DISTANCE,
        (int(h[8:16], 16) / 0xFFFFFFFF - 0.5) * OPTIMAL_DISTANCE,
    )


def _force_kernel(nodes: list[str], edges: list[tuple[int, int]], iters: int):
    """YifanHu-style spring-electrical layout, fully numpy-vectorized.

    Repulsion ``k²/d`` between all pairs, attraction ``d²/k`` along edges —
    the force model gephi's YifanHuLayout implements — under a bounded
    linear-cooling step (gephi's adaptive ``step/0.9`` growth diverges on
    symmetric graphs; a monotone schedule converges and is deterministic).
    The reference's trailing ForceAtlas phases only polish node spacing,
    which the +100 min-shift and O3 overlap pass subsume.  Deterministic:
    seeded positions, fixed iteration count, no RNG.
    """
    import numpy as np

    n = len(nodes)
    pos = np.array([_seed_xy(s) for s in nodes], dtype=np.float64)
    if n <= 1 or not edges:
        return pos
    k = OPTIMAL_DISTANCE
    ei = np.array([e[0] for e in edges], dtype=np.int64)
    ej = np.array([e[1] for e in edges], dtype=np.int64)
    for it in range(iters):
        step = k * max(1.0 - it / iters, 0.02)
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.sqrt((delta**2).sum(-1))
        np.fill_diagonal(dist, 1.0)
        # repulsion k^2 / d on every pair
        rep = (k * k / (dist**3))[:, :, None] * delta
        np.fill_diagonal(rep[:, :, 0], 0.0)
        np.fill_diagonal(rep[:, :, 1], 0.0)
        force = rep.sum(axis=1)
        # attraction d^2 / k along edges
        ed = pos[ej] - pos[ei]
        edist = np.sqrt((ed**2).sum(-1))[:, None]
        att = ed * (edist / k)
        np.add.at(force, ei, att)
        np.add.at(force, ej, -att)
        norm = np.sqrt((force**2).sum(-1))[:, None]
        norm[norm < 1e-12] = 1e-12
        # displacement capped at the cooling step (Fruchterman-Reingold cap)
        pos = pos + force / norm * np.minimum(norm, step)
    return pos


def _grid_kernel(nodes: list[str]):
    """Deterministic grid fallback for maps past :data:`FORCE_MAX_NODES`."""
    import math

    import numpy as np

    side = max(1, math.isqrt(len(nodes)) + 1)
    return np.array(
        [((i % side) * OPTIMAL_DISTANCE, (i // side) * OPTIMAL_DISTANCE) for i in range(len(nodes))],
        dtype=np.float64,
    )


def force_layout(edges: DataFrame, iters: int = 60) -> DataFrame:
    """G9: per-conversation force-directed layout.

    ``edges``: (conv_id, src, dst).  Output: (conv_id, node, x, y) with the
    reference's post-layout transform applied — shift so min(x) = min(y) =
    100 per map, then round to whole units (`Layouter.java:146-151`
    ``n.x() - minX + 100`` formatted ``%.0f``).

    One Arrow batch per map via ``applyInPandas``; a 10^12-turn corpus is
    millions of independent small maps, so parallelism scales with data while
    the O(n²) kernel stays bounded by :data:`FORCE_MAX_NODES`.
    """
    import pandas as pd

    def layout_one(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        names = sorted(set(pdf["src"]) | set(pdf["dst"]))
        idx = {s: i for i, s in enumerate(names)}
        # orientation-canonical: the spring model is undirected, so a
        # reciprocal edge pair (A->B plus B->A) must not double that
        # edge's attraction vs a one-way statement of the same link
        pairs = sorted(
            {
                (min(idx[a], idx[b]), max(idx[a], idx[b]))
                for a, b in zip(pdf["src"], pdf["dst"])
                if a != b
            }
        )
        if len(names) > FORCE_MAX_NODES:
            pos = _grid_kernel(names)
        else:
            pos = _force_kernel(names, pairs, iters)
        # Layouter.java:146-151: shift min to +100, emit %.0f (half-up)
        import numpy as np

        pos = pos - pos.min(axis=0, keepdims=True) + 100.0
        xy = np.floor(pos + 0.5).astype("int64")
        return pd.DataFrame(
            {"conv_id": conv, "node": names, "x": xy[:, 0], "y": xy[:, 1]}
        )

    return (
        edges.select("conv_id", "src", "dst")
        .groupBy("conv_id")
        .applyInPandas(layout_one, "conv_id string, node string, x bigint, y bigint")
    )

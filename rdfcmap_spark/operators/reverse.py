"""Reverse mapping: triples -> cmap shape (SURVEY.md §3.2).

The reference's TTL->CXL direction resolves a display title per resource via
a fixed priority ladder (`Turtle2CmapConverter.createTitle:2049-2130`):

    dct:title ▷ skos:prefLabel ▷ dct:identifier ▷ rdfs:label
    ▷ joined labels of the rdf:type objects ▷ "instance"

with *first-match* semantics per tier (Jena ``.next()`` — incidental
iteration order, pinned here as the lexicographic min, SURVEY §2.5), and
reconstructs (concepts, links, connections) from the instance triples
(`Turtle2CmapConverter.java:142-314`). Minted link ids use fresh UUIDs in
the reference; here they are deterministic uuid3 of (subj, pred, obj) so the
round trip is stable under resume and cluster size.

Everything is DataFrame-native: conditional aggregation for the ladder (one
shuffle on subj), a broadcast-sized self-join for type labels, and a single
explode for the connection pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfcmap_spark import vocab
from rdfcmap_spark.ids import name_uuid_col

#: self-defense bound for the single-map visualization walk (r4 review
#: item 6): a rendered concept map is human-sized by contract; above this
#: many distinct instances :func:`viz_twins` raises instead of pushing the
#: entity set through one window partition (same device as
#: ``canonicalize.DRIVER_CC_MAX_EDGES``).
VIZ_MAX_CONCEPTS = 500_000

#: label tiers for the subject itself, in ladder priority order
_SUBJ_TIERS = [
    ("title", vocab.DCT_TITLE),
    ("prefLabel", vocab.SKOS_PREF_LABEL),
    ("identifier", vocab.DCT + "identifier"),
    ("label", vocab.RDFS_LABEL),
]

#: label tiers for a TYPE resource (the reference's type branch probes
#: title ▷ identifier ▷ label ▷ prefLabel — a different order than the
#: subject ladder; mirrored faithfully)
_TYPE_TIERS = [vocab.DCT_TITLE, vocab.DCT + "identifier", vocab.RDFS_LABEL, vocab.SKOS_PREF_LABEL]


def _local_name(iri):
    return F.regexp_extract(iri, r"([^#/]+)$", 1)


def _label_pivot(triples: DataFrame, preds: list[str]) -> DataFrame:
    """(subj, one min-lexical column per predicate) — conditional aggregation,
    a single shuffle; min pins the reference's incidental first-match."""
    lab = triples.filter(F.col("pred").isin(preds) & (F.col("obj_kind") == "literal"))
    aggs = [
        F.min(F.when(F.col("pred") == p, F.col("obj_lexical"))).alias(f"_l{i}")
        for i, p in enumerate(preds)
    ]
    return lab.groupBy("subj").agg(*aggs)


def title_ladder(triples: DataFrame) -> DataFrame:
    """(subj, title, title_source) for every subject in the triple set.

    ``title_source`` names the ladder tier that fired (title / prefLabel /
    identifier / label / type / instance) — useful for QA and asserted by
    the driver oracle.
    """
    subj_preds = [p for _, p in _SUBJ_TIERS]
    own = _label_pivot(triples, subj_preds)

    # type branch: each rdf:type object resolves its own (differently
    # ordered) mini-ladder, fallback = IRI local name; multiple types join
    # ", " over the sorted distinct label set (reference joins a HashSet —
    # order pinned here)
    type_lab = _label_pivot(triples, _TYPE_TIERS).withColumnRenamed("subj", "type_iri")
    types = triples.filter(
        (F.col("pred") == vocab.RDF_TYPE) & (F.col("obj_kind") == "iri")
    ).select("subj", F.col("obj_iri").alias("type_iri"))
    tl = F.coalesce(
        *[F.col(f"_l{i}") for i in range(len(_TYPE_TIERS))], _local_name(F.col("type_iri"))
    )
    type_titles = (
        types.join(type_lab, "type_iri", "left")
        .select("subj", tl.alias("type_label"))
        .groupBy("subj")
        .agg(F.array_join(F.sort_array(F.collect_set("type_label")), ", ").alias("type_title"))
    )

    subjects = triples.select("subj").distinct()
    out = subjects.join(own, "subj", "left").join(type_titles, "subj", "left")
    tiers = [F.col(f"_l{i}") for i in range(len(subj_preds))]
    title = F.coalesce(*tiers, F.col("type_title"), F.lit("instance"))
    source = F.lit(None).cast("string")
    for (name, _), col in reversed(list(zip(_SUBJ_TIERS, tiers))):
        source = F.when(col.isNotNull(), F.lit(name)).otherwise(source)
    # when() above builds priority bottom-up; earlier tiers overwrite later
    source = F.coalesce(
        source,
        F.when(F.col("type_title").isNotNull(), F.lit("type")),
        F.lit("instance"),
    )
    return out.select("subj", title.alias("title"), source.alias("title_source"))


#: predicates that never become cmap links (F3 skip-list + label tiers)
_SKIP_LINK_PREDS = [p for _, p in _SUBJ_TIERS] + [vocab.RDF_TYPE]


def link_edges(triples: DataFrame) -> DataFrame:
    """Relation triples that become (concept -> link -> concept) structures:
    non-literal objects, non-schema predicates (F3 skip-list), instance-
    namespace or vocab-resolved endpoints."""
    return triples.filter(
        (F.col("obj_kind") != "literal")
        & ~F.col("pred").isin(_SKIP_LINK_PREDS)
        & ~F.col("pred").startswith(vocab.RDF)
        & ~F.col("pred").startswith(vocab.RDFS)
        & ~F.col("pred").startswith(vocab.OWL)
    ).select("subj", "pred", F.col("obj_iri").alias("obj"))


def _ns_to_prefix_map():
    """namespace -> prefix lookup (inverse of vocab.NS_PREFIX_MAP) as a map
    literal — tiny, stays inside codegen. Built lazily: F.lit needs an
    active SparkContext, so this cannot be a module constant."""
    return F.create_map(
        *[
            F.lit(x)
            for ns_pfx in ((ns, p) for p, ns in vocab.NS_PREFIX_MAP.items())
            for x in ns_pfx
        ]
    )


def _title_prefix(pred, label):
    """``prefix:label`` when the predicate's namespace is in the prefix
    dictionary, with the OBO idspace special case
    (`Turtle2CmapConverter.addPrefix:2284-2300` →
    `getPrefixForOboTermLabel:835-871`, the X7 ladder)."""
    local = _local_name(pred)
    ns = F.regexp_extract(pred, r"^(.*[#/])", 1)
    base = _ns_to_prefix_map()[ns]
    obo = (
        F.when(local.startswith("BFO"), F.lit("bfo"))
        .when(local.startswith("IAO"), F.lit("iao"))
        .when(local.startswith("OBI"), F.lit("obi"))
        .when(local.startswith("RO"), F.lit("ro"))
        .when(local.startswith("CHEBI"), F.lit("chebi"))
        .when(local.startswith("PATO"), F.lit("pato"))
        .when(F.instr(local, "_") > 0, F.lower(F.substring_index(local, "_", 1)))
        .otherwise(F.lit("obo"))
    )
    prefix = F.when(base == "obo", obo).otherwise(base)
    return F.when(
        prefix.isNotNull() & (prefix != ""), F.concat(prefix, F.lit(":"), label)
    ).otherwise(label)


def literal_nodes(triples: DataFrame, titles: DataFrame | None = None) -> DataFrame:
    """One row per literal statement of the instance graph that becomes a
    (concept, link, two connections) group in the CXL — the reference's
    DEFAULT ``visualizeLiterals=true`` path, which ``--hideliterals`` turns
    off (`Turtle2CmapConverter.addLiteralNodesForVisualization:438-620`,
    skip-list = dct:title only, `isLiteralPropertyToSkip:771-779`).

    Output (subj, pred, concept_id, concept_label, link_id, link_label):

    * ``concept_label`` — ``"lexical"^^xsd:t`` with ONLY the XSD namespace
      compacted, exactly the reference's `:470-472` replaceAll;
    * ``link_label`` — the predicate's ladder title (or local name) with
      the prefix prepended per `addPrefix:2284-2300`;
    * ids are deterministic uuid3 of (kind, subj, pred, lexical, datatype)
      replacing the reference's fresh UUIDs (the X5 policy used for all
      minted ids in this repo, stable under resume and cluster size).

    Plan shape: a filter + projection over the triples scan plus the same
    broadcast-sized title join ``reconstruct_cmap`` already does — no new
    shuffle.
    """
    lit = triples.filter(
        (F.col("obj_kind") == "literal")
        & (F.col("pred") != vocab.DCT_TITLE)
        & (F.col("subj").startswith("urn:uuid:") | F.col("subj").startswith("_:"))
    )
    if titles is None:
        titles = title_ladder(triples)
    pred_titles = (
        titles.withColumnRenamed("subj", "pred")
        .withColumnRenamed("title", "pred_title")
        .select("pred", "pred_title")
    )
    dt = F.coalesce(F.col("obj_datatype"), F.lit(vocab.XSD_STRING))
    concept_label = F.concat(
        F.lit('"'),
        F.col("obj_lexical"),
        F.lit('"^^'),
        F.regexp_replace(dt, "^" + vocab.XSD, "xsd:"),
    )
    key = F.concat_ws("|", F.col("subj"), F.col("pred"), F.col("obj_lexical"), dt)
    raw_label = F.when(
        F.col("pred_title").isNotNull() & (F.col("pred_title") != "instance"),
        F.col("pred_title"),
    ).otherwise(_local_name(F.col("pred")))
    return (
        lit.join(pred_titles, "pred", "left")
        .select(
            "subj",
            "pred",
            F.concat(F.lit("urn:uuid:"), name_uuid_col(F.concat(F.lit("litnode|"), key))).alias(
                "concept_id"
            ),
            concept_label.alias("concept_label"),
            F.concat(F.lit("urn:uuid:"), name_uuid_col(F.concat(F.lit("litlink|"), key))).alias(
                "link_id"
            ),
            _title_prefix(F.col("pred"), raw_label).alias("link_label"),
        )
    )


def reconstruct_cmap(
    triples: DataFrame, visualize_literals: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """triples -> (concepts, links, connections) — the §3.2 reverse mapping.

    ``visualize_literals=True`` additionally emits one concept + link +
    two connections per literal statement (:func:`literal_nodes`) — the
    reference's default; False is its ``--hideliterals``. This repo's
    historical default (False) is kept for signature stability; pass True
    for reference-default parity.

    * ``concepts(concept_id, label)`` — every relation endpoint, labelled by
      the title ladder;
    * ``links(link_id, label)`` — one minted link node per relation triple
      (id = uuid3(subj|pred|obj), replacing the reference's fresh UUIDs at
      `Turtle2CmapConverter.java:288-314`); label = the predicate's
      ladder title (vocab prefLabel when the predicate is described in the
      triple set, else its local name);
    * ``connections(from_id, to_id)`` — two rows per relation
      (concept->link, link->concept), emitted by ONE explode.
    """
    edges = link_edges(triples)
    titles = title_ladder(triples)

    endpoints = (
        edges.select(F.col("subj").alias("concept_id"))
        .unionByName(edges.select(F.col("obj").alias("concept_id")))
        .distinct()
    )
    concepts = (
        endpoints.join(titles.withColumnRenamed("subj", "concept_id"), "concept_id", "left")
        .select("concept_id", F.coalesce("title", F.lit("instance")).alias("label"))
    )

    pred_titles = titles.withColumnRenamed("subj", "pred").withColumnRenamed("title", "pred_title")
    with_link = (
        edges.join(pred_titles.select("pred", "pred_title"), "pred", "left")
        .withColumn(
            "link_id",
            F.concat(F.lit("link:"), name_uuid_col(F.concat_ws("|", "subj", "pred", "obj"))),
        )
        .withColumn(
            "label",
            F.when(
                F.col("pred_title").isNotNull() & (F.col("pred_title") != "instance"),
                F.col("pred_title"),
            ).otherwise(_local_name(F.col("pred"))),
        )
    )
    links = with_link.select(F.col("link_id"), "label").distinct()
    connections = (
        with_link.select(
            F.explode(
                F.array(
                    F.struct(F.col("subj").alias("from_id"), F.col("link_id").alias("to_id")),
                    F.struct(F.col("link_id").alias("from_id"), F.col("obj").alias("to_id")),
                )
            ).alias("c")
        )
        .select("c.*")
        .distinct()
    )
    if visualize_literals:
        lr = literal_nodes(triples, titles=titles)
        concepts = concepts.unionByName(
            lr.select(F.col("concept_id"), F.col("concept_label").alias("label"))
        )
        links = links.unionByName(
            lr.select("link_id", F.col("link_label").alias("label"))
        )
        connections = connections.unionByName(
            lr.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("subj").alias("from_id"), F.col("link_id").alias("to_id")
                        ),
                        F.struct(
                            F.col("link_id").alias("from_id"),
                            F.col("concept_id").alias("to_id"),
                        ),
                    )
                ).alias("c")
            ).select("c.*")
        )
    return concepts, links, connections


def reassemble_triples(concepts: DataFrame, links: DataFrame, connections: DataFrame) -> DataFrame:
    """cmap shape -> (subj, link_label, obj) via the J1 two-hop join — the
    forward direction used to assert the §3.2 round trip (P/R = 1.0)."""
    c2l = connections.join(
        links.select(F.col("link_id"), F.col("label")), connections.to_id == F.col("link_id")
    ).select(F.col("from_id").alias("subj"), "link_id", "label")
    l2c = connections.join(
        links.select(F.col("link_id").alias("lid")), connections.from_id == F.col("lid")
    ).select(F.col("lid"), F.col("to_id").alias("obj"))
    return c2l.join(l2c, c2l.link_id == l2c.lid).select("subj", F.col("label").alias("link_label"), "obj")


def viz_twins(triples: DataFrame, map_name: str = "map") -> DataFrame:
    """Mint the ``afv:`` visualization twin per instance entity — the
    reference's `VisualizationInfoBuilder.createOrUpdateVisualizationInfo`
    (`VisualizationInfoBuilder.java:40-350`): instance ``urn:uuid:<id>``
    pairs with UI twin ``afv:<id>`` (prefix swap — the J4 machinery),
    carrying ``afx:hasObject`` back to the instance, ``rdf:type
    afv:Concept``, ``dct:identifier`` (its own IRI, `:112`), ``dct:title``
    from the reverse title ladder (`:124`), ``afv:hasMap`` to the single
    map node (`:126-130`), empty short/long comments (`:132-150`), the
    default-walk coordinates (x,y starting at 10,10 and advancing +25/+25
    per new concept, `:50-51`, `:534-535`) and the "100"/"25" default
    width/height (`:337`, `:346`).

    Positions need a total order over the map's concepts, so this is a
    per-map window — concept maps are human-sized by the same contract as
    the layout family (a map that renders to CXL); the 10^12-turn graph
    never takes this path, and the contract is ENFORCED (r4 review item
    6): more than ``VIZ_MAX_CONCEPTS`` distinct instances raises instead
    of funneling the entity set through one window partition. Everything
    else is one ladder aggregation plus a constant-factor template
    explode; twin IRIs are prefix swaps of the already-deterministic
    skolems, so output is cluster-size-invariant.

    Output: the 6 triple columns (callers add conv_id/turn_idx lineage).
    """
    from pyspark.sql import Window

    from rdfcmap_spark.ids import VIZ_PREFIX, name_uuid, uuid_of_iri
    from rdfcmap_spark.operators.shapes import _explode, _t

    subj = triples.filter(F.col("subj").startswith("urn:uuid:")).select("subj").distinct()
    probe = subj.limit(VIZ_MAX_CONCEPTS + 1).count()
    if probe > VIZ_MAX_CONCEPTS:
        raise ValueError(
            f"viz_twins renders a human-sized concept map (single-map "
            f"ordinal walk); bounded at {VIZ_MAX_CONCEPTS} concepts — "
            f"got more. Do not point it at the full entity set."
        )
    ents = subj.join(title_ladder(triples), "subj", "left")
    w = Window.partitionBy(F.lit(map_name)).orderBy("subj")
    ents = ents.select(
        "subj",
        F.coalesce(F.col("title"), F.lit("instance")).alias("title"),
        (F.row_number().over(w) - 1).alias("ordinal"),
    )

    map_iri = VIZ_PREFIX + name_uuid("vizmap|" + map_name)
    viz = F.concat(F.lit(VIZ_PREFIX), uuid_of_iri(F.col("subj")))
    xs = (F.lit(10) + F.col("ordinal") * 25).cast("string")
    ys = (F.lit(10) + F.col("ordinal") * 25).cast("string")
    twin_rows = _explode(
        ents,
        F.array(
            _t(viz, vocab.AFX_HAS_OBJECT, "iri", F.col("subj")),
            _t(viz, vocab.RDF_TYPE, "iri", F.lit(vocab.AFV_CONCEPT)),
            _t(viz, vocab.DCT_IDENTIFIER, "literal", lex=viz, dt=vocab.XSD_STRING),
            _t(viz, vocab.DCT_TITLE, "literal", lex=F.col("title"), dt=vocab.XSD_STRING),
            _t(viz, vocab.AFV_HAS_MAP, "iri", F.lit(map_iri)),
            _t(viz, vocab.AFV_SHORT_COMMENT, "literal", lex=F.lit(""), dt=vocab.XSD_STRING),
            _t(viz, vocab.AFV_LONG_COMMENT, "literal", lex=F.lit(""), dt=vocab.XSD_STRING),
            _t(viz, vocab.AFV_X_POSITION, "literal", lex=xs, dt=vocab.XSD_STRING),
            _t(viz, vocab.AFV_Y_POSITION, "literal", lex=ys, dt=vocab.XSD_STRING),
            _t(viz, vocab.AFV_WIDTH, "literal", lex=F.lit("100"), dt=vocab.XSD_STRING),
            _t(viz, vocab.AFV_HEIGHT, "literal", lex=F.lit("25"), dt=vocab.XSD_STRING),
        ),
    )
    map_rows = _explode(
        triples.sparkSession.range(1),
        F.array(
            _t(F.lit(map_iri), vocab.RDF_TYPE, "iri", F.lit(vocab.AFV_MAP)),
            _t(F.lit(map_iri), vocab.DCT_TITLE, "literal", lex=F.lit(map_name),
               dt=vocab.XSD_STRING),
        ),
    )
    return twin_rows.unionByName(map_rows)

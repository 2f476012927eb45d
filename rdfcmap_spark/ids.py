"""Deterministic ID minting.

The reference mints every instance/viz resource with ``UUID.randomUUID()``
(`cmap/VisualizationInfoBuilder.java:70-73`, `util/CmapUtil.java:943`), which
is nondeterministic and breaks resumability / cluster-size-invariant output.
We replace it with RFC-4122 **UUIDv3** (MD5, name-based) over stable natural
keys — same `urn:uuid:` shape as the reference output, but reproducible.
(v3 rather than v5 because MD5 is the one name-hash available in every engine
we cross-check against — DuckDB 1.0 has no sha1 — so the driver's oracle can
mint the *same* IDs in pure SQL.)

Three implementations kept byte-identical by tests:

* :func:`name_uuid` — driver-side (stdlib) for fixtures/goldens.
* :func:`name_uuid_col` — a pure Spark Column expression (md5 + string
  surgery), JVM-side and whole-stage-codegen friendly, so ID minting never
  leaves the executor or touches Python in the hot path.
* :func:`uuid_sql` — the same computation as a DuckDB SQL expression string,
  used by ``__spark_entry__.oracle_sql`` to verify the full pipeline.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Namespace for every ID this engine mints. The 16 namespace bytes are the
#: ASCII string "rdfcmap-spark.kg" (exactly 16 chars), so the v3 digest is
#: md5 of a plain UTF-8 string ("rdfcmap-spark.kg" + name) — computable
#: identically in Spark, Python, and DuckDB (whose md5 takes VARCHAR only).
_NS_ASCII = "rdfcmap-spark.kg"
NAMESPACE = uuid.UUID(bytes=_NS_ASCII.encode("ascii"))

INSTANCE_PREFIX = "urn:uuid:"
# twin-resource scheme of the reference (`VisualizationInfoBuilder.java:70-73`):
# instance `urn:uuid:<id>` vs visualization `afv:<id>`; prefix-swap convertible.
VIZ_PREFIX = "http://purl.allotrope.org/ontologies/visualization#"


def name_uuid(name: str) -> str:
    """Driver-side name-based UUID (v3/MD5) under the engine namespace."""
    return str(uuid.uuid3(NAMESPACE, name))


def instance_iri(name: str) -> str:
    return INSTANCE_PREFIX + name_uuid(name)


def name_uuid_col(name: Column) -> Column:
    """UUIDv3 as a Spark Column (hex string formatted 8-4-4-4-12).

    RFC 4122 name-based MD5: digest = md5(namespace_bytes || name_utf8),
    version nibble forced to 3, variant bits to 10xx.
    All built-in functions — stays inside codegen.
    """
    # namespace bytes are ASCII (see NAMESPACE) -> plain string concat
    digest = F.md5(F.encode(F.concat(F.lit(_NS_ASCII), name), "UTF-8"))
    # variant: high 2 bits of byte 8 (hex char 17) -> 10xx
    variant_nibble = F.conv(
        (F.conv(F.substring(digest, 17, 1), 16, 10).cast("int") % 4 + 8).cast("string"),
        10,
        16,
    )
    return F.lower(
        F.concat_ws(
            "-",
            F.substring(digest, 1, 8),
            F.substring(digest, 9, 4),
            F.concat(F.lit("3"), F.substring(digest, 14, 3)),
            F.concat(variant_nibble, F.substring(digest, 18, 3)),
            F.substring(digest, 21, 12),
        )
    )


def uuid_sql(name_expr: str) -> str:
    """The same UUIDv3 as a DuckDB SQL expression over ``name_expr`` (a SQL
    string expression). Byte-identical to :func:`name_uuid` /
    :func:`name_uuid_col` — asserted by tests — so the driver's DuckDB oracle
    can reproduce every minted ID."""
    d = f"md5('{_NS_ASCII}' || {name_expr})"
    return (
        "lower(concat("
        f"substr({d}, 1, 8), '-', "
        f"substr({d}, 9, 4), '-3', "
        f"substr({d}, 14, 3), '-', "
        f"lower(to_hex(('0x' || substr({d}, 17, 1))::INTEGER % 4 + 8)), "
        f"substr({d}, 18, 3), '-', "
        f"substr({d}, 21, 12)))"
    )


def instance_iri_col(name: Column) -> Column:
    return F.concat(F.lit(INSTANCE_PREFIX), name_uuid_col(name))


def viz_iri_col(name: Column) -> Column:
    return F.concat(F.lit(VIZ_PREFIX), name_uuid_col(name))


def uuid_of_iri(iri: Column) -> Column:
    """Shared-UUID key for the twin-resource equi-join (SURVEY.md J4).

    The reference converts between twins by literal prefix replace
    (`Cmap2TurtleConverter.java:1258`, `:2635`); we derive the bare uuid once
    and join on it.
    """
    return F.regexp_replace(iri, "^(urn:uuid:|" + VIZ_PREFIX + ")", "")

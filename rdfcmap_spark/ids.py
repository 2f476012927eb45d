"""Deterministic ID minting.

The reference mints every instance/viz resource with ``UUID.randomUUID()``
(`cmap/VisualizationInfoBuilder.java:70-73`, `util/CmapUtil.java:943`), which
is nondeterministic and breaks resumability / cluster-size-invariant output.
We replace it with RFC-4122 **UUIDv5** (SHA-1, name-based) over stable natural
keys — same `urn:uuid:` shape as the reference output, but reproducible.

Two implementations kept byte-identical by tests:

* :func:`uuid5` — driver-side (stdlib) for fixtures/goldens.
* :func:`uuid5_col` — a pure Spark Column expression (sha1 + string surgery),
  JVM-side and whole-stage-codegen friendly, so ID minting never leaves the
  executor or touches Python in the hot path.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Namespace for every ID this engine mints (itself uuid5 of the DNS ns).
NAMESPACE = uuid.uuid5(uuid.NAMESPACE_DNS, "rdfcmap-spark.kg")

INSTANCE_PREFIX = "urn:uuid:"
# twin-resource scheme of the reference (`VisualizationInfoBuilder.java:70-73`):
# instance `urn:uuid:<id>` vs visualization `afv:<id>`; prefix-swap convertible.
VIZ_PREFIX = "http://purl.allotrope.org/ontologies/visualization#"


def uuid5(name: str) -> str:
    """Driver-side uuid5 under the engine namespace."""
    return str(uuid.uuid5(NAMESPACE, name))


def instance_iri(name: str) -> str:
    return INSTANCE_PREFIX + uuid5(name)


def uuid5_col(name: Column) -> Column:
    """UUIDv5 as a Spark Column (hex string formatted 8-4-4-4-12).

    RFC 4122 name-based SHA-1: digest = sha1(namespace_bytes || name_utf8),
    first 16 bytes, version nibble forced to 5, variant bits to 10xx.
    All built-in functions — stays inside codegen.
    """
    ns_hex = NAMESPACE.hex  # 32 hex chars -> 16 raw bytes via unhex
    digest = F.sha1(F.concat(F.unhex(F.lit(ns_hex)), F.encode(name, "UTF-8")))
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
            F.concat(F.lit("5"), F.substring(digest, 14, 3)),
            F.concat(variant_nibble, F.substring(digest, 18, 3)),
            F.substring(digest, 21, 12),
        )
    )


def instance_iri_col(name: Column) -> Column:
    return F.concat(F.lit(INSTANCE_PREFIX), uuid5_col(name))


def viz_iri_col(name: Column) -> Column:
    return F.concat(F.lit(VIZ_PREFIX), uuid5_col(name))


def uuid_of_iri(iri: Column) -> Column:
    """Shared-UUID key for the twin-resource equi-join (SURVEY.md J4).

    The reference converts between twins by literal prefix replace
    (`Cmap2TurtleConverter.java:1258`, `:2635`); we derive the bare uuid once
    and join on it.
    """
    return F.regexp_replace(iri, "^(urn:uuid:|" + VIZ_PREFIX + ")", "")

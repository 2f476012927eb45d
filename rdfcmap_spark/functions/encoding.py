"""Compact lossless column encodings for shuffle-heavy stages.

At 10^12-turn scale the set-semantics aggregate shuffles every candidate
triple; its row is six wide strings (~250 B). Most of those bytes are
``urn:uuid:`` IRIs (45 chars carrying 16 bytes of entropy) and closed-set
datatype IRIs. These helpers encode such columns to tagged binaries before
the shuffle and decode them after — pure built-in expressions both ways
(unhex/hex/translate/when ladders), so the round trip never leaves codegen
and the decode needs **no joins**.

Encodings (first byte = tag):

* ``0x01 || unhex(uuid-hex)`` — ``urn:uuid:<rfc-4122>`` IRIs (17 bytes);
* ``0x00 || utf8(string)``    — any other IRI/string (1 byte overhead).

Datatype IRIs use a tag-per-known-datatype ladder (1 byte for the xsd set,
tagged-utf8 fallback). Null in = null out for every function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdfcmap_spark import vocab

_UUID_PREFIX = "urn:uuid:"
#: 'urn:uuid:' + 8-4-4-4-12 = 45 chars
_UUID_LEN = 45

_TAG_STR = bytes([0])
_TAG_UUID = bytes([1])

#: closed datatype set -> single-byte tags (2..)
_DT_TAGS: list[tuple[str, bytes]] = [
    (iri, bytes([i + 2]))
    for i, iri in enumerate(
        [*dict.fromkeys(vocab.KNOWN_DATATYPES.values()), vocab.RDF + "langString"]
    )
]


def enc_iri(c: Column) -> Column:
    """IRI/string -> tagged binary; ``urn:uuid:`` IRIs become 17 bytes."""
    hex32 = F.translate(F.substring(c, len(_UUID_PREFIX) + 1, 36), "-", "")
    uuid_enc = F.concat(F.lit(_TAG_UUID), F.unhex(hex32))
    is_uuid = (
        c.startswith(_UUID_PREFIX)
        & (F.length(c) == _UUID_LEN)
        & F.unhex(hex32).isNotNull()  # unhex -> null on non-hex: safe fallback
    )
    return F.when(is_uuid, uuid_enc).otherwise(
        F.concat(F.lit(_TAG_STR), F.encode(c, "UTF-8"))
    )


def dec_iri(b: Column) -> Column:
    h = F.lower(F.hex(F.substring(b, 2, 16)))
    uuid_str = F.concat(
        F.lit(_UUID_PREFIX),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
    )
    return F.when(F.substring(b, 1, 1) == F.lit(_TAG_UUID), uuid_str).otherwise(
        F.decode(F.substring(b, 2, 2_000_000_000), "UTF-8")
    )


def enc_datatype(c: Column) -> Column:
    out = F.concat(F.lit(_TAG_STR), F.encode(c, "UTF-8"))
    for iri, tag in reversed(_DT_TAGS):
        out = F.when(c == iri, F.lit(tag)).otherwise(out)
    return out


def dec_datatype(b: Column) -> Column:
    out = F.decode(F.substring(b, 2, 2_000_000_000), "UTF-8")
    for iri, tag in reversed(_DT_TAGS):
        out = F.when(b == F.lit(tag), F.lit(iri)).otherwise(out)
    return out


#: obj_kind closed set -> tinyint
_KINDS = ["iri", "bnode", "literal"]


def enc_kind(c: Column) -> Column:
    out = F.lit(None).cast("tinyint")
    for i, k in enumerate(_KINDS):
        out = F.when(c == k, F.lit(i).cast("tinyint")).otherwise(out)
    return out


def dec_kind(c: Column) -> Column:
    out = F.lit(None).cast("string")
    for i, k in enumerate(_KINDS):
        out = F.when(c == i, F.lit(k)).otherwise(out)
    return out

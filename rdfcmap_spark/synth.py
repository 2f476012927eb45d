"""Deterministic synthetic transcript generator + golden-triple oracle.

FIXTURES.md §1: each turn's ``text`` is assembled from a seeded grammar that
plants concept-map-equivalent structures — mention tokens wrapped in french
quotes ``«»`` (the reference normalizes ``«»`` in long comments,
`Cmap2TurtleConverter.java:758-761`), linking phrases with optional
cardinality suffixes (`CmapUtil.java:71`, `CardinalityPattern.java:19-31`),
and typed literals (`Cmap2TurtleConverter.java:2416-2463`).

Everything is derived from md5(seed|key) so generation is independent of
partitioning / parallelism / wall clock. The same planting functions feed

* :func:`transcripts_pdf` / :func:`transcripts_df` — the input table
  (pandas for fixtures; ``mapInPandas`` over ``spark.range`` at bench scale);
* :func:`expected_triples` — an independent driver-side implementation of the
  full reference semantics (resolution, cardinality, literals, skolemization,
  unit rewrite, union-find canonicalization) used as the P/R golden.

Sentence forms (one planted structure per sentence):

=========  =====================================================================
relation   ``«subj» <phrase>[ <card>] «obj»at.``    obj may be ``[ x ]`` (bnode)
literal    ``«subj» has value "lex"^^xsd:t.``
unit       ``«subj» unit «degree celsius».``          (J6 rewrite case)
ident      ``«subj» has identifier "ID-n"^^xsd:string.``  (cross-conv merge key)
coref      ``«a» is same as «b».``                    (owl:sameAs edge)
noise      filler words, no mentions
=========  =====================================================================
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import pandas as pd

from rdfcmap_spark import vocab
from rdfcmap_spark.functions.cardinality import classify_py
from rdfcmap_spark.functions.normalize import normalize_label_py
from rdfcmap_spark.ids import name_uuid

SEED = 42
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

#: bump whenever generation output changes — write-once fixture caches
#: (e.g. the DuckDB pipeline-oracle transcripts parquet) key on it
SYNTH_VERSION = 3

_FILLERS = ["", "note that ", "we observe ", "per the protocol ", "then "]
_NOISE = [
    "ok let us continue with the run",
    "the instrument warmed up as expected",
    "no anomalies were seen in this step",
    "logging this for the record",
]
_CARDS = ["=1", "=2", "2", ">1", "<5", "2,4", "3 5", ">2["]  # last = unsupported
_ROLES = ["user", "assistant", "tool"]
_IDENT_HOT_SHARE = 5  # h % 5 == 0 -> hot identifier (skew fixture, FIXTURES.md §5)


def _h(key: str) -> int:
    return int(hashlib.md5(f"{SEED}|{key}".encode()).hexdigest()[:12], 16)


@dataclass
class Sentence:
    form: str
    subj: str = ""
    phrase: str = ""
    card: str = ""
    obj: str = ""
    obj_bnode: bool = False
    lex: str = ""
    dt_local: str = ""
    filler: str = ""

    def render(self) -> str:
        if self.form == "noise":
            return self.filler + self.phrase + "."
        if self.form in ("literal", "ident"):
            return f'{self.filler}«{self.subj}» {self.phrase} "{self.lex}"^^xsd:{self.dt_local}.'
        obj = f"[ {self.obj} ]" if self.obj_bnode else self.obj
        card = f" {self.card}" if self.card else ""
        return f"{self.filler}«{self.subj}» {self.phrase}{card} «{obj}»."


def _pick(lst, h):
    return lst[h % len(lst)]


def _ident_value(key: str, n_convs: int) -> str:
    h = _h("identval|" + key)
    if h % _IDENT_HOT_SHARE == 0:
        return "ID-hot"  # hot key: exercises salted-join canonicalization
    pool = max(4, n_convs // 2)
    return f"ID-{h % pool:04d}"


def _literal_value(key: str) -> tuple[str, str]:
    h = _h("lit|" + key)
    kind = h % 100
    if kind < 25:
        return (f"{(h % 5000) / 10.0:.1f}", "double")
    if kind < 45:
        return (str(h % 1000), "integer")
    if kind < 55:
        return ("true" if h % 2 else "false", "boolean")
    if kind < 65:
        return (f"2025-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:00:00Z", "dateTime")
    if kind < 72:
        return (f"2025-{1 + h % 12:02d}-{1 + h % 28:02d}T{h % 24:02d}:15:00Z", "dateTimeStamp")
    if kind < 80:
        return (f"{(h % 100)}", "float")  # unknown datatype -> string fallback
    if kind < 88:
        return ("n/a", "double")  # invalid lexical -> quarantined
    return (f"lot {h % 50}", "string")


def sentences_for_turn(conv_id: str, turn_idx: int, n_convs: int) -> list[Sentence]:
    out: list[Sentence] = []
    n_sent = 1 + _h(f"nsent|{conv_id}|{turn_idx}") % 3
    ents = vocab.ENTITY_SURFACES
    for s in range(n_sent):
        k = f"{conv_id}|{turn_idx}|{s}"
        w = _h("form|" + k) % 100
        filler = _pick(_FILLERS, _h("fill|" + k))
        if w < 42:  # relation
            card = _pick(_CARDS, _h("card|" + k)) if _h("hascard|" + k) % 10 < 3 else ""
            out.append(
                Sentence(
                    "relation",
                    subj=_pick(ents, _h("s|" + k)),
                    phrase=_pick(vocab.RELATION_PHRASES, _h("p|" + k)),
                    card=card,
                    obj=_pick(ents, _h("o|" + k)),
                    obj_bnode=_h("bn|" + k) % 8 == 0,
                    filler=filler,
                )
            )
        elif w < 56:  # literal
            lex, dt = _literal_value(k)
            out.append(
                Sentence("literal", subj=_pick(ents, _h("s|" + k)), phrase="has value",
                         lex=lex, dt_local=dt, filler=filler)
            )
        elif w < 64:  # unit (J6)
            out.append(
                Sentence("relation", subj=_pick(["temperature", "pressure"], _h("s|" + k)),
                         phrase="unit",
                         obj=_pick(["degree celsius", "kilopascal"], _h("o|" + k)),
                         filler=filler)
            )
        elif w < 74:  # identifier (cross-conv canonicalization key)
            out.append(
                Sentence("ident", subj=_pick(ents, _h("s|" + k)), phrase="has identifier",
                         lex=_ident_value(k, n_convs), dt_local="string", filler=filler)
            )
        elif w < 82:  # coref within conversation
            out.append(
                Sentence("relation", subj=_pick(ents, _h("s|" + k)), phrase="is same as",
                         obj=_pick(ents, _h("o|" + k)), filler=filler)
            )
        elif w < 90:  # unresolved mention / phrase (must hit the metric)
            if _h("ur|" + k) % 2:
                out.append(
                    Sentence("relation", subj=_pick(vocab.UNRESOLVED_SURFACES, _h("s|" + k)),
                             phrase=_pick(vocab.RELATION_PHRASES, _h("p|" + k)),
                             obj=_pick(ents, _h("o|" + k)), filler=filler)
                )
            else:
                out.append(
                    Sentence("relation", subj=_pick(ents, _h("s|" + k)),
                             phrase=vocab.UNRESOLVED_PHRASES[0],
                             obj=_pick(ents, _h("o|" + k)), filler=filler)
                )
        else:
            out.append(Sentence("noise", phrase=_pick(_NOISE, _h("n|" + k)), filler=filler))
    return out


def turn_text(conv_id: str, turn_idx: int, n_convs: int) -> str:
    return " ".join(s.render() for s in sentences_for_turn(conv_id, turn_idx, n_convs))


def _turn_row(conv: int, turn: int, n_convs: int) -> dict:
    conv_id = f"conv-{conv:06d}"
    role = _pick(_ROLES, _h(f"role|{conv_id}|{turn}"))
    return {
        "conv_id": conv_id,
        "turn_idx": turn,
        "role": role,
        "text": turn_text(conv_id, turn, n_convs),
        "tool": "search" if role == "tool" else "",
        "ts": BASE_TS + timedelta(seconds=conv * 3600 + turn * 30),
    }


def transcripts_pdf(n_convs: int, turns_per_conv: int) -> pd.DataFrame:
    rows = [_turn_row(c, t, n_convs) for c in range(n_convs) for t in range(turns_per_conv)]
    return pd.DataFrame(rows)


def transcripts_df(spark, n_convs: int, turns_per_conv: int, partitions: int | None = None):
    """Distributed generation: ``spark.range`` + ``mapInPandas``.

    Rows are a pure function of the global index, so output is identical at
    any parallelism (the two-cluster-size invariant, BASELINE.md).
    """
    from rdfcmap_spark.schemas import TRANSCRIPTS

    n = n_convs * turns_per_conv
    rng = spark.range(n, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"]
            rows = [_turn_row(int(i) // turns_per_conv, int(i) % turns_per_conv, n_convs) for i in idx]
            yield pd.DataFrame(rows)

    return rng.mapInPandas(gen, schema=TRANSCRIPTS)


# ---------------------------------------------------------------------------
# Golden oracle: independent driver-side implementation of the KG semantics
# ---------------------------------------------------------------------------


@dataclass
class Golden:
    triples: set = field(default_factory=set)
    unresolved_mentions: int = 0
    unresolved_phrases: int = 0
    quarantined: int = 0


def _resolve(norm: str) -> tuple[str, str] | None:
    """(iri, term_kind) after tie-break + deprecated redirect, or None.

    Tie-break: lowest ns_priority, then lexicographic IRI
    (`RdfUtil.java:449-529` af*-preference, made total/deterministic).
    Deprecated terms follow dct:isReplacedBy (`Cmap2TurtleConverter.java:997-1015`).
    """
    hits = [r for r in vocab.alias_rows() if r[2] == norm]
    if not hits:
        return None
    hits.sort(key=lambda r: (r[7], r[0]))
    iri, _, _, _, kind, deprecated, replaced_by, _ = hits[0]
    if deprecated and replaced_by:
        iri = replaced_by
    return iri, kind


def expected_triples(n_convs: int, turns_per_conv: int) -> Golden:
    g = Golden()
    ent_triples: set = set()
    rel_triples: list = []
    sameas_edges: list[tuple[str, str]] = []
    ident_of: dict[str, list[str]] = {}

    def entity_for(conv_id: str, surface: str, bnode: bool) -> tuple[str, str]:
        """(entity_iri, obj_kind); registers NamedIndividual/title/type triples."""
        norm = normalize_label_py(surface)
        res = _resolve(norm)
        if res and res[1] == "individual":
            # J7: named individuals of the ontology use their real IRI
            return res[0], "iri"
        eid = "urn:uuid:" + name_uuid(f"ent|{conv_id}|{norm}")
        kind = "bnode" if bnode else "iri"
        title = surface.strip()
        ent_triples.add((eid, vocab.RDF_TYPE, "iri", vocab.OWL_NAMED_INDIVIDUAL, None, None))
        ent_triples.add((eid, vocab.DCT_TITLE, "literal", None, title, vocab.XSD_STRING))
        if res:
            ent_triples.add((eid, vocab.RDF_TYPE, "iri", res[0], None, None))
        else:
            g.unresolved_mentions += 1
        return eid, kind

    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        for t in range(turns_per_conv):
            for si, s in enumerate(sentences_for_turn(conv_id, t, n_convs)):
                if s.form == "noise":
                    continue
                subj, _ = entity_for(conv_id, s.subj, False)
                if s.form in ("literal", "ident"):
                    prop = _resolve(normalize_label_py(s.phrase))
                    dt = vocab.KNOWN_DATATYPES.get(s.dt_local, vocab.XSD_STRING)
                    from rdfcmap_spark.functions.literals import _VALID_LEX
                    import re as _re

                    rx = _VALID_LEX.get(s.dt_local)
                    if rx and not _re.match(rx, s.lex):
                        g.quarantined += 1
                        continue
                    rel_triples.append((subj, prop[0], "literal", None, s.lex, dt))
                    if s.form == "ident":
                        ident_of.setdefault(s.lex, []).append(subj)
                    continue
                # relation-shaped
                obj_surface = s.obj
                obj, obj_kind = entity_for(conv_id, obj_surface, s.obj_bnode)
                pres = _resolve(normalize_label_py(s.phrase))
                if pres is None:
                    g.unresolved_phrases += 1
                    rel_triples.append((subj, vocab.SKOS_RELATED, obj_kind, obj, None, None))
                    continue
                pred = pres[0]
                if pred == vocab.OWL_SAME_AS:
                    sameas_edges.append((subj, obj))
                    continue
                if pred == vocab.QUDT_UNIT:
                    obj = vocab.UNIT_INDIVIDUAL_TO_CLASS.get(obj, obj)  # J6
                rel_triples.append((subj, pred, obj_kind, obj, None, None))
                if s.card:
                    card = classify_py(s.card)
                    if card is None:
                        g.quarantined += 1
                    else:
                        cnode = "urn:uuid:" + name_uuid(f"card|{conv_id}|{t}|{si}")
                        rel_triples.append((cnode, vocab.RDF_TYPE, "iri", card.card_type, None, None))
                        rel_triples.append((cnode, vocab.AFV_ON_PROPERTY, "iri", pred, None, None))
                        rel_triples.append((subj, vocab.AFV + "hasCardinality", "bnode", cnode, None, None))
                        if card.card_min is not None:
                            rel_triples.append((cnode, vocab.AFV_MIN_VALUE, "literal", None, card.card_min, vocab.XSD_INTEGER))
                        if card.card_max is not None:
                            rel_triples.append((cnode, vocab.AFV_MAX_VALUE, "literal", None, card.card_max, vocab.XSD_INTEGER))

    # --- canonicalization (G1): union-find over sameAs + shared identifiers
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for a, b in sameas_edges:
        union(a, b)
    for ids in ident_of.values():
        for other in ids[1:]:
            union(ids[0], other)

    def rep(x):
        return find(x) if x in parent else x

    for s, p, k, oi, ol, od in ent_triples | set(rel_triples):
        s2 = rep(s)
        oi2 = rep(oi) if oi is not None else None
        # kind/identity invariant (mirrors rewrite_triples): canonicalizing a
        # bracket-marked entity onto a NAMED vocab node un-bnodes the object
        if k == "bnode" and oi2 is not None and not oi2.startswith("urn:uuid:"):
            k = "iri"
        g.triples.add((s2, p, k, oi2, ol, od))
    return g

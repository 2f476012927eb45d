"""Conversation-level training-data assembly over the transcripts table.

No reference counterpart — rdfcmap consumes one CXL file at a time — but the
input here is an Iceberg-shaped table of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts), and a transcripts→training-data
pipeline needs conversation-level transforms after the document-level
dedup/quality family:

* :func:`chat_render` — render each conversation into ONE training document
  with role tags (``<|role|>`` / ``<|tool:name|>``), turns concatenated in
  ``turn_idx`` order. This is the "chat template" step that turns a turn
  table into pretraining/SFT documents.
* :func:`sft_pairs` — per *assistant* turn, assemble an (prompt, completion)
  example: the prompt is the previous ≤k turns rendered with role tags, the
  completion is the assistant text. The standard SFT-pair extraction.
* :func:`role_check` — per-conversation role-sequence validation flags
  (starts-with-user, tool-only-after-assistant, no consecutive user turns)
  — the filter step that drops malformed agent traces before training.
* :func:`conv_stats` — per-conversation metadata (turn/role/tool-call
  counts, total characters, wall-clock duration) for corpus dashboards and
  length-based filtering.
* :func:`tool_transitions` — corpus-wide tool-call transition matrix
  (which tool follows which) over the per-conversation call sequences.
* :func:`truncate_to_budget` — context-window truncation: the maximal
  conversation suffix whose token cost fits a budget.
* :func:`conv_dup_groups` — conversation-level near-dup groups
  (chat_render composed with the document dedup family).
* :func:`conv_quality` — the trainability gate: role validity + turn /
  character / empty-text bounds and a final ``keep`` bit, in one
  aggregate.

Scale posture: every operator is exactly ONE shuffle keyed on ``conv_id``
(hash aggregate with map-side partial ``collect_list``/counts, or one
window exchange for :func:`sft_pairs`). ``conv_id`` cardinality is huge
(10^9+ conversations at the target scale) and conversations are short
(bounded turns), so there is no hot key; per-group state is one
conversation's turns. All expressions are JVM column expressions — no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: rendered-turn role-tag template, mirrored verbatim in the DuckDB oracles:
#: ``<|role|>text`` — tool turns carry the tool name, ``<|tool:search|>text``
def _rendered(role="role", tool="tool", text="text") -> F.Column:
    return F.concat(
        F.lit("<|"),
        F.col(role),
        F.when(
            F.col(tool).isNotNull() & (F.col(tool) != ""),
            F.concat(F.lit(":"), F.col(tool)),
        ).otherwise(F.lit("")),
        F.lit("|>"),
        F.coalesce(F.col(text), F.lit("")),
    )


#: SQL mirror of :func:`_rendered` (DuckDB)
RENDERED_SQL = (
    "'<|' || role || CASE WHEN tool IS NOT NULL AND tool <> '' "
    "THEN ':' || tool ELSE '' END || '|>' || coalesce(text, '')"
)


def _ordered_concat(col: F.Column, sep: str) -> F.Column:
    """``collect_list(struct(turn_idx, v))`` → sort → join: deterministic
    in-conversation ordering independent of partitioning (turn_idx is unique
    per conversation, so the struct sort is total)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("turn_idx").alias("i"), col.alias("v")))),
            lambda s: s["v"],
        ),
        sep,
    )


def chat_render(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, text) — one rendered training document per
    conversation, turns in ``turn_idx`` order joined with newlines.

    One map-side-combinable hash aggregate on ``conv_id``; the sort is
    per-group over a bounded turn list (no window, no global sort).
    """
    return (
        turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            _ordered_concat(_rendered(), "\n").alias("text"),
        )
    )


def sft_pairs(turns: DataFrame, k: int = 4) -> DataFrame:
    """(conv_id, turn_idx, prompt, completion) — one SFT example per
    assistant turn at ``turn_idx ≥ 1``: prompt = the previous ≤k turns
    rendered with role tags (newline-joined, conversation order),
    completion = the assistant turn's raw text.

    One window exchange on ``conv_id`` (frame = ROWS k PRECEDING..1
    PRECEDING, so the running list never exceeds k turns of state).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    return (
        turns.withColumn("prompt", F.array_join(F.collect_list(_rendered()).over(w), "\n"))
        .filter((F.col("role") == "assistant") & (F.col("turn_idx") >= 1))
        .select("conv_id", "turn_idx", "prompt", F.col("text").alias("completion"))
    )


def role_check(turns: DataFrame) -> DataFrame:
    """(conv_id, role_seq, starts_with_user, tool_ok, no_consecutive_user,
    valid) — per-conversation role-sequence validation.

    ``role_seq`` is the conversation's role-initial string in turn order
    (``u``/``a``/``t``). Flags (ints, engine-portable):

    * ``starts_with_user`` — turn 0 is a user turn;
    * ``tool_ok`` — every tool turn is preceded by an assistant or tool
      turn (no leading ``t``, no ``ut``);
    * ``no_consecutive_user`` — no ``uu`` anywhere;
    * ``valid`` — all of the above.

    Same single hash-aggregate shape as :func:`chat_render`.
    """
    seq = _ordered_concat(F.substring("role", 1, 1), "")
    g = turns.groupBy("conv_id").agg(seq.alias("role_seq"))
    starts = (F.substring("role_seq", 1, 1) == "u").cast("int")
    tool_ok = (
        ~F.col("role_seq").startswith("t") & ~F.col("role_seq").contains("ut")
    ).cast("int")
    no_uu = (~F.col("role_seq").contains("uu")).cast("int")
    return g.select(
        "conv_id",
        "role_seq",
        starts.alias("starts_with_user"),
        tool_ok.alias("tool_ok"),
        no_uu.alias("no_consecutive_user"),
        (starts * tool_ok * no_uu).alias("valid"),
    )


def tool_transitions(turns: DataFrame) -> DataFrame:
    """(prev_tool, tool, n_transitions) — the corpus-wide tool-call
    transition matrix over agent transcripts: for every conversation, the
    tool-call sequence in turn order (rows with ``role='tool'`` and a
    non-empty ``tool``), with ``<start>`` marking a conversation's first
    call. The Markov-transition view an agent-trace dashboard needs
    (which tool follows which, where do chains start).

    One window exchange on ``conv_id`` (the ``lag``) over the *filtered*
    call rows only, then one hash aggregate whose key space is
    |tools|² — tiny, map-side combinable, skew-free.
    """
    calls = turns.filter(
        (F.col("role") == "tool") & F.col("tool").isNotNull() & (F.col("tool") != "")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        calls.withColumn("prev_tool", F.lag("tool", 1, "<start>").over(w))
        .groupBy("prev_tool", "tool")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def truncate_to_budget(turns: DataFrame, budget: int = 48) -> DataFrame:
    """(conv_id, turn_idx, role, text, n_tokens, cum_tokens) — the maximal
    SUFFIX of each conversation whose total token cost fits ``budget``: the
    context-window truncation step before rendering/packing (keep the most
    recent turns, drop the oldest). A conversation whose last turn alone
    exceeds the budget contributes no rows.

    ``n_tokens`` is the whitespace token count of the raw text plus 1 for
    the role tag (``regexp_count(text, '\\S+') + 1`` — the engine-portable
    count :mod:`rdfcmap_spark.operators.textstats` uses). ``cum_tokens``
    accumulates from the conversation END backwards, so the filter
    ``cum_tokens <= budget`` selects exactly the maximal feasible suffix.

    One window exchange on ``conv_id`` (running sum over the reversed turn
    order, O(1) frame state); the filter is a pure post-projection.
    """
    n_tok = (
        F.regexp_count(F.coalesce(F.col("text"), F.lit("")), F.lit(r"\S+")) + F.lit(1)
    ).cast("bigint")
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        turns.withColumn("n_tokens", n_tok)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("conv_id", "turn_idx", "role", "text", "n_tokens", "cum_tokens")
    )


def conv_quality(
    turns: DataFrame,
    min_turns: int = 2,
    max_turns: int = 64,
    min_chars: int = 10,
    max_chars: int = 20000,
    max_empty: int = 0,
) -> DataFrame:
    """(conv_id, n_turns, total_chars, n_empty, role_valid, turns_ok,
    chars_ok, empty_ok, keep) — the conversation-level trainability gate:
    one row per conversation with integer flags and the final ``keep`` bit
    a corpus-assembly pipeline filters on before rendering/packing.

    Gates: the :func:`role_check` role-sequence validity, turn-count
    bounds, total-character bounds, and at most ``max_empty`` empty/null
    turn texts. All flags are integers over integer stats — engine-exact.

    Everything is computed in ONE map-side-combinable hash aggregate on
    ``conv_id`` (stats and the role-initial string together), not a join
    of :func:`conv_stats` and :func:`role_check` — one shuffle, not two
    plus a join exchange.
    """
    seq = _ordered_concat(F.substring("role", 1, 1), "")
    g = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
        F.sum(
            (F.coalesce(F.col("text"), F.lit("")) == "").cast("long")
        ).alias("n_empty"),
        seq.alias("role_seq"),
    )
    role_valid = (
        (F.substring("role_seq", 1, 1) == "u")
        & ~F.col("role_seq").startswith("t")
        & ~F.col("role_seq").contains("ut")
        & ~F.col("role_seq").contains("uu")
    ).cast("int")
    turns_ok = (
        (F.col("n_turns") >= min_turns) & (F.col("n_turns") <= max_turns)
    ).cast("int")
    chars_ok = (
        (F.col("total_chars") >= min_chars) & (F.col("total_chars") <= max_chars)
    ).cast("int")
    empty_ok = (F.col("n_empty") <= max_empty).cast("int")
    return g.select(
        "conv_id",
        "n_turns",
        "total_chars",
        "n_empty",
        role_valid.alias("role_valid"),
        turns_ok.alias("turns_ok"),
        chars_ok.alias("chars_ok"),
        empty_ok.alias("empty_ok"),
        (role_valid * turns_ok * chars_ok * empty_ok).alias("keep"),
    )


def conv_dup_groups(turns: DataFrame, min_jaccard: float = 0.8) -> DataFrame:
    """(doc_id, canonical_id) at CONVERSATION granularity — near-duplicate
    conversation detection: render each conversation to its training
    document (:func:`chat_render`) and run the exact-collapse → LSH →
    verify → connected-components dedup (:func:`rdfcmap_spark.operators.
    dedup.dup_groups`) over the rendered texts, keyed by ``conv_id``.

    This is the dedup granularity a transcript corpus actually needs:
    re-run agent sessions and copy-pasted conversations duplicate *whole
    conversations*, which document-level dedup over individual turns
    cannot see. Scale posture inherits both parents': one conv_id hash
    aggregate to render, then the banded/clique-collapsed dedup whose
    candidate volume stays linear in the number of conversations.

    The rendered frame is checkpointed before the dedup: ``dup_groups``
    consumes its input ~7 times (exact-collapse, minhash, the verify's
    three shingle passes, the final id join) — recompute-per-consumer is
    the right call when the input is a parquet scan (see the persist A/B
    in :func:`~rdfcmap_spark.operators.dedup.dup_groups`), but here each
    recompute would re-run the 2M-turn render aggregate: measured 867 s →
    re-measured after this checkpoint at 256k convs / 2M turns (BENCH.md
    chat family section). The rendered table is ~1 row/conversation, far
    smaller than the shingle stream the A/B rejected caching.
    """
    from rdfcmap_spark.operators import dedup

    docs = (
        chat_render(turns)
        .select(F.col("conv_id").alias("doc_id"), "text")
        .localCheckpoint()
    )
    return dedup.dup_groups(docs, min_jaccard=min_jaccard)


def conv_stats(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool_calls, total_chars,
    duration_secs) — per-conversation metadata for corpus dashboards and
    length/shape filtering. One map-side-combinable hash aggregate; every
    stat is an integer (engine-exact, no floating point).
    """
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.sum(
            ((F.col("role") == "tool") & (F.col("tool") != "")).cast("long")
        ).alias("n_tool_calls"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_secs"),
    )


def entity_pmi(turns: DataFrame, min_pair: int = 1) -> DataFrame:
    """PMI edge weights between entities co-mentioned in a conversation —
    the KG-analytics step that turns raw co-occurrence into an
    association-strength signal for downstream edge pruning / entity
    clustering (no reference counterpart: rdfcmap sees one map at a time,
    so corpus-level statistics only exist at this pipeline's scale).

    Entity key = the J2-resolved vocabulary IRI when the mention links,
    else the X9-normalized surface — conversation-independent, so counts
    aggregate across the corpus. ``pmi = ln(n_pair * n_convs / (n_a *
    n_b))`` over conversation-level presence counts, rounded to 6
    decimals (cross-engine-stable: all inputs are exact integers).

    Scale posture: the pair fan-out is per conversation (quadratic only in
    DISTINCT entities per conversation, bounded by conversation length —
    never corpus-wide); pair counting is one map-side-combinable hash
    aggregate; the two entity-count joins shuffle on the entity key with
    AQE splitting the hot-entity skew; ``n_convs`` rides a 1-row
    broadcast.
    """
    ents = _linked_mentions(turns).select("conv_id", "ent").distinct()
    n_convs = ents.agg(F.countDistinct("conv_id").alias("n_convs"))
    ec = ents.groupBy("ent").agg(F.count(F.lit(1)).alias("n_e"))
    pairs = (
        ents.alias("a")
        .join(
            ents.alias("b"),
            (F.col("a.conv_id") == F.col("b.conv_id")) & (F.col("a.ent") < F.col("b.ent")),
        )
        .groupBy(F.col("a.ent").alias("ent_a"), F.col("b.ent").alias("ent_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair)
    )
    return (
        pairs.join(ec.select(F.col("ent").alias("ent_a"), F.col("n_e").alias("n_a")), "ent_a")
        .join(ec.select(F.col("ent").alias("ent_b"), F.col("n_e").alias("n_b")), "ent_b")
        .crossJoin(F.broadcast(n_convs))
        .select(
            "ent_a",
            "ent_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    (F.col("n_pair") * F.col("n_convs")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def _linked_mentions(turns: DataFrame) -> DataFrame:
    """Shared mention-extraction head: linked mention rows with the
    conversation-independent entity key ``ent`` = J2-resolved vocabulary IRI
    when the mention links, else the X9-normalized surface (the same key
    :func:`entity_pmi` aggregates on, so corpus statistics line up across
    operators)."""
    from rdfcmap_spark.operators.linking import link_mentions, resolved_alias_df
    from rdfcmap_spark.operators.mentions import extract_sentences, mention_surfaces

    ments = link_mentions(
        mention_surfaces(extract_sentences(turns)), resolved_alias_df(turns.sparkSession)
    )
    return ments.withColumn(
        "ent", F.coalesce(F.col("resolved_iri"), F.col("surface_norm"))
    )


def entity_timeline(turns: DataFrame) -> DataFrame:
    """Temporal provenance per entity — the temporal-KG signal over the
    constructed graph: when an entity first/last appears in the corpus and
    how broadly it is mentioned (no reference counterpart: rdfcmap sees one
    map at a time; an entity timeline only exists at corpus scale).

    Output: (ent, first_ts, last_ts, n_mentions, n_convs, n_turns) where
    ``ent`` is the shared conversation-independent entity key (J2-resolved
    IRI else normalized surface) and the timestamps come from the turns the
    mentions occur in.

    Scale posture: mentions join back to turns on (conv_id, turn_idx) — an
    equi-join both sides of which are partitioned by the same compound key
    (no hot key: conversations are bounded); the timeline itself is ONE
    map-side-combinable hash aggregate on ``ent`` (min/max/count all have
    partial aggregates; the two distinct counts expand to a two-level
    aggregate, still map-side combined per group). AQE splits hot-entity
    skew on the final exchange.
    """
    ments = _linked_mentions(turns).select("conv_id", "turn_idx", "ent")
    withts = ments.join(turns.select("conv_id", "turn_idx", "ts"), ["conv_id", "turn_idx"])
    return withts.groupBy("ent").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.countDistinct("conv_id", "turn_idx").alias("n_turns"),
    )


#: pronoun alternation shared verbatim with the DuckDB oracle (all-ASCII, so
#: RE2's ASCII-only \b and Java's \b agree; alternatives are whole words
#: bounded by \b, so alternation-order semantics cannot differ either)
PRONOUN_RE = r"\b(it|they|this|that|these|those)\b"


def pronoun_antecedents(turns: DataFrame) -> DataFrame:
    """Coreference-lite: for every turn that contains a bare pronoun, bind
    it to the most recent entity mention in any EARLIER turn of the same
    conversation (classic recency heuristic — the deterministic stand-in
    for a learned coref model, and the mention-stage enrichment a
    transcripts→KG pipeline needs so pronoun-only turns still attach to an
    entity).

    "Most recent" is exact: mentions are ordered within a turn by
    (sent_idx, pos) — subject before object within a sentence — and the
    per-turn last mention is reduced with a single-string ``max`` over a
    zero-padded sort key (hash-aggregatable; ``max(struct)`` would force a
    SortAggregate). The antecedent is then ``last(…, ignorenulls)`` over
    the conversation's preceding turns.

    Output: (conv_id, turn_idx, n_pronouns, antecedent) for turns with ≥1
    pronoun; ``antecedent`` NULL when no prior mention exists (a turn-0
    pronoun) — kept, because the unresolved-pronoun rate is itself a
    corpus-quality signal.

    Scale posture: one (conv_id, turn_idx) hash aggregate over mentions,
    one per-conversation window (bounded partitions — conversations are
    short), no joins against anything corpus-sized except the mention
    frame itself. All JVM expressions.
    """
    ments = _linked_mentions(turns)
    # within-turn recency key: sent_idx (≤ 6 digits) then pos (1 digit),
    # then '|' + entity — fixed 8-char prefix, so the entity substring
    # starts at 9 regardless of content
    enc = F.concat(
        F.lpad(F.col("sent_idx").cast("string"), 6, "0"),
        F.col("pos").cast("string"),
        F.lit("|"),
        F.col("ent"),
    )
    last_in_turn = ments.groupBy("conv_id", "turn_idx").agg(F.max(enc).alias("enc"))
    t = turns.select(
        "conv_id",
        "turn_idx",
        F.regexp_count(F.lower(F.col("text")), F.lit(PRONOUN_RE)).alias("n_pronouns"),
    ).join(last_in_turn, ["conv_id", "turn_idx"], "left")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.withColumn("prev_enc", F.last("enc", ignorenulls=True).over(w))
        .filter(F.col("n_pronouns") > 0)
        .select(
            "conv_id",
            "turn_idx",
            F.col("n_pronouns").cast("long").alias("n_pronouns"),
            F.expr("substr(prev_enc, 9)").alias("antecedent"),
        )
    )


def turn_latency(turns: DataFrame) -> DataFrame:
    """Per-conversation response-latency profile — the agent-analytics
    signal behind "how long do assistant/tool turns take": the gap between
    each turn's timestamp and its predecessor's (stable (conv_id,
    turn_idx) order, the BASELINE per-turn invariant), aggregated per
    conversation overall and for the assistant's turns specifically.

    All stats are exact integer microseconds (``unix_micros`` — the
    seconds-truncation trap documented in the verify recipe) except the
    derived mean, a deterministic ratio of exact BIGINTs rounded to 6 dp.

    Scale posture: one window (partition = conv_id, bounded by
    conversation length) + one map-side-combinable hash aggregate — the
    same single-shuffle contract as the rest of the transcripts family.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    g = turns.select(
        "conv_id",
        "role",
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)).alias(
            "gap_us"
        ),
    )
    asst = F.when(F.col("role") == "assistant", F.col("gap_us"))
    return g.groupBy("conv_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.count(asst).alias("n_assistant_gaps"),
        F.coalesce(F.sum(asst), F.lit(0)).alias("sum_assistant_gap_us"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1e6), 6
        ).alias("mean_gap_secs"),
    )


#: interrogative leads and imperative verbs for the dialog-act ladder —
#: module constants so the DuckDB oracle is generated from the same lists
DIALOG_INTERROGATIVES = (
    "what why how when where who which can could would will is are do does did"
).split()
DIALOG_IMPERATIVES = (
    "run create write fix show give list make add explain generate find "
    "update delete implement summarize translate"
).split()


def dialog_acts(turns: DataFrame) -> DataFrame:
    """Heuristic per-turn dialog-act tagging — the conversation-structure
    signal (question/command/code/statement mix) used for SFT corpus
    filtering and agent-behavior dashboards. Deterministic first-match
    ladder, all plain column regexes (no Python):

    1. ``code``      — the turn carries a ``` fence marker
    2. ``question``  — trimmed text ends with '?' OR opens with an
       interrogative lead word
    3. ``command``   — opens with an imperative verb
    4. ``statement`` — everything else

    Output: (conv_id, turn_idx, role, act). Pure projection — zero
    shuffles; the regexes run inside whole-stage codegen.
    """
    low = F.lower(F.trim(F.col("text")))
    q_re = r"^(" + "|".join(DIALOG_INTERROGATIVES) + r")\b"
    c_re = r"^(" + "|".join(DIALOG_IMPERATIVES) + r")\b"
    act = (
        F.when(F.col("text").contains("```"), F.lit("code"))
        .when(low.endswith("?") | low.rlike(q_re), F.lit("question"))
        .when(low.rlike(c_re), F.lit("command"))
        .otherwise(F.lit("statement"))
    )
    return turns.select("conv_id", "turn_idx", "role", act.alias("act"))

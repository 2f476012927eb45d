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

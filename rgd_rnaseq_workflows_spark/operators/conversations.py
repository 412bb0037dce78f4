"""Conversation (SFT / chat) assembly from row-per-turn event streams.

Instruction-tuning corpora arrive as flat interaction logs — one row
per utterance with an actor and a payload — and the training pipeline
must reassemble them into chat-template strings with the invariants
trainers assume: turns ordered, consecutive same-role utterances
merged into one turn, the conversation trimmed to complete
user→assistant exchanges (no leading assistant turn, no dangling user
turn), and per-conversation token accounting for packing / budget
decisions downstream.

Scale shape: everything is keyed by the conversation id —
1. one window pass (partitioned by conversation, ordered by the turn
   order) marks role-change boundaries and a running turn counter
   (gaps-and-islands, the scd.py pattern);
2. one (conversation, turn) aggregation merges same-role runs with an
   ordered join (collect → sort_array → array_join, the house ordered-
   concat idiom — deterministic, no ``string_agg`` order ambiguity);
3. one conversation-scale aggregation trims and renders.
No joins, no driver collects; the heaviest state is one conversation's
turn list, bounded by per-entity activity, never corpus-scale. With
binary roles, merging guarantees alternation, so the trim drops at
most one turn at each end.

Exactness: renders and counts are pure string/integer expressions —
the DuckDB twin (:func:`assemble_conversations_sql`) produces the
byte-identical rendered string, so the driver value-hash covers the
template itself. Conversations with no complete exchange left after
the trim are dropped on both engines.

LLM-pipeline extension (no reference counterpart); same family as
``pack_sequences`` / ``rag_chunk_documents``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

USER = "user"
ASSISTANT = "assistant"


def assemble_conversations(df: DataFrame, conv_col: str,
                           order_cols: list[str], role_col: str,
                           content_col: str) -> DataFrame:
    """Reassemble per-utterance rows into rendered conversations.

    ``role_col`` must be binary ``'user'`` / ``'assistant'``;
    ``order_cols`` must totally order rows within a conversation
    (ties would make the merge nondeterministic). Output, one row per
    conversation that retains at least one complete exchange:
    ``conv_col, n_events, n_turns, n_user_turns, n_assistant_turns,
    n_tokens, rendered`` — ``rendered`` is
    ``<|role|>content`` concatenated over trimmed turns, ``n_tokens``
    whitespace tokens of the trimmed contents.
    """
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    flagged = df.withColumn(
        "_brk",
        F.when(F.lag(role_col).over(w).eqNullSafe(F.col(role_col)),
               F.lit(0)).otherwise(F.lit(1)))
    numbered = flagged.withColumn(
        "_turn", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    turns = (numbered.groupBy(conv_col, "_turn")
             .agg(F.first(role_col).alias("_role"),
                  F.count("*").alias("_n_events"),
                  F.array_join(
                      F.transform(
                          F.sort_array(F.collect_list(F.struct(
                              *[F.col(c) for c in order_cols],
                              F.col(content_col).alias("_c")))),
                          lambda s: s["_c"]),
                      " ").alias("_content")))
    conv = (turns.groupBy(conv_col)
            .agg(F.sum("_n_events").alias("n_events"),
                 F.sort_array(F.collect_list(F.struct(
                     F.col("_turn"), F.col("_role"),
                     F.col("_content")))).alias("_ts")))
    lo = (F.col("_ts")[0]["_role"] == ASSISTANT).cast("int")
    hi = (F.element_at("_ts", -1)["_role"] == USER).cast("int")
    trimmed = conv.withColumn(
        "_kept", F.slice("_ts", lo + 1,
                         F.greatest(F.size("_ts") - lo - hi, F.lit(0))))
    kept = F.col("_kept")
    return (trimmed.filter(F.size(kept) > 0)
            .select(
                conv_col,
                F.col("n_events").cast("long").alias("n_events"),
                F.size(kept).cast("long").alias("n_turns"),
                F.size(F.filter(kept, lambda t: t["_role"] == USER))
                .cast("long").alias("n_user_turns"),
                F.size(F.filter(kept, lambda t: t["_role"] != USER))
                .cast("long").alias("n_assistant_turns"),
                F.aggregate(
                    kept, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.size(F.split(t["_content"],
                                                        " ")))
                .alias("n_tokens"),
                F.array_join(
                    F.transform(kept, lambda t: F.concat(
                        F.lit("<|"), t["_role"], F.lit("|>"),
                        t["_content"])), "").alias("rendered")))


def assemble_conversations_sql(source_sql: str, conv_col: str,
                               order_sql: str, role_col: str,
                               content_col: str) -> str:
    """DuckDB twin — same merge/trim/render semantics via windows +
    ordered ``string_agg``. ``order_sql`` is the comma-separated order
    expression list (e.g. ``"us, event_id"``)."""
    return f"""
WITH src AS ({source_sql}),
flagged AS (
  SELECT *, CASE WHEN lag({role_col}) OVER w IS NOT DISTINCT FROM {role_col}
                 THEN 0 ELSE 1 END AS brk
  FROM src WINDOW w AS (PARTITION BY {conv_col} ORDER BY {order_sql})),
numbered AS (
  SELECT *, sum(brk) OVER (PARTITION BY {conv_col} ORDER BY {order_sql}
                           ROWS UNBOUNDED PRECEDING) AS turn
  FROM flagged),
turns AS (
  SELECT {conv_col}, turn, any_value({role_col}) AS role,
         count(*) AS n_events,
         string_agg({content_col}, ' ' ORDER BY {order_sql}) AS content
  FROM numbered GROUP BY {conv_col}, turn),
bounds AS (
  SELECT {conv_col},
         min(turn) + CASE WHEN arg_min(role, turn) = '{ASSISTANT}'
                          THEN 1 ELSE 0 END AS lo,
         max(turn) - CASE WHEN arg_max(role, turn) = '{USER}'
                          THEN 1 ELSE 0 END AS hi,
         CAST(sum(n_events) AS BIGINT) AS n_events
  FROM turns GROUP BY {conv_col}),
kept AS (
  SELECT t.*, b.n_events AS total_events
  FROM turns t JOIN bounds b USING ({conv_col})
  WHERE t.turn BETWEEN b.lo AND b.hi)
SELECT {conv_col},
       any_value(total_events) AS n_events,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (WHERE role = '{USER}') AS BIGINT)
         AS n_user_turns,
       CAST(count(*) FILTER (WHERE role <> '{USER}') AS BIGINT)
         AS n_assistant_turns,
       CAST(sum(len(string_split(content, ' '))) AS BIGINT) AS n_tokens,
       string_agg('<|' || role || '|>' || content, '' ORDER BY turn)
         AS rendered
FROM kept GROUP BY {conv_col}
"""

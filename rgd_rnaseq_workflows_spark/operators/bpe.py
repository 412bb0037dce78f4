"""Distributed BPE vocabulary training (byte-pair-encoding merges).

The canonical LLM tokenizer-construction step (Sennrich et al. 2016),
shaped for 100 TB the way production trainers shape it: BPE statistics
depend only on the corpus WORD COUNTS, so the corpus is touched exactly
once (token explode → groupBy word, map-side combined); every merge
round after that runs on the vocabulary table (millions of rows at web
scale, not billions) and each chosen merge is driver-side metadata —
the same "collect only metadata" rule the k-means/PQ trainers follow.

Merge-application semantics (pinned, engine-portable): a LEFT FOLD over
the word's symbol sequence — if the accumulated output's last symbol is
``left`` and the incoming symbol is ``right``, the last symbol is
replaced by the concatenation, else the symbol is appended. This is
equivalent to the standard greedy left-to-right pair scan: a merged
symbol ``left||right`` can never equal ``right`` (it is strictly
longer), so a replacement can never retroactively create a new match
with its predecessor. The DuckDB oracle implements the identical fold
as a positional recursive CTE, so both engines agree row-for-row.

Exactness: pair scores are integer word-count sums (order-independent);
the argmax tie-breaks on (count DESC, left ASC, right ASC) — fully
deterministic, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_MARK = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus pass: distinct words + occurrence counts (ONE shuffle,
    map-side combined)."""
    from rgd_rnaseq_workflows_spark.functions import text as TX
    return (docs.select(F.explode(TX.tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("wc")))


def _initial_symbols(word) -> F.Column:
    """word → [c1, c2, ..., cn, </w>] (character symbols + end marker)."""
    chars = F.transform(F.sequence(F.lit(1), F.length(word)),
                        lambda i: word.substr(i, F.lit(1)))
    return F.concat(chars, F.array(F.lit(END_MARK)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair totals weighted by word count: explode the
    (sym_i, sym_{i+1}) zip — vocabulary-scale rows only."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s as l, syms[i + 1] as r))")
    return (vocab.select("wc", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("wc").alias("pair_count")))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """One merge round over the vocabulary: the left fold documented in
    the module docstring, as an ``aggregate`` HOF (vocabulary-scale —
    the interpreted-lambda cost is bounded by Σ word_len over DISTINCT
    words, never by corpus size)."""
    merged = left + right
    folded = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: NULL (not an ANSI error) on the empty acc
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))))
        .otherwise(F.concat(acc, F.array(x))))
    return vocab.withColumn("syms", folded)


def train_bpe(docs: DataFrame, rounds: int = 3,
              text_col: str = "text") -> DataFrame:
    """Train ``rounds`` BPE merges; returns one row per merge:
    (round, left, right, merged, pair_count) — the merge table a
    tokenizer ships. Each round: vocabulary pair count (shuffle on the
    pair key), deterministic argmax collected as driver metadata, fold
    applied lazily for the next round."""
    spark = docs.sparkSession
    vocab = (word_counts(docs, text_col)
             .select("wc", _initial_symbols(F.col("word")).alias("syms"))
             .localCheckpoint())  # reused every round; corpus never re-read
    out = []
    for rnd in range(1, rounds + 1):
        best = (_pair_counts(vocab)
                .orderBy(F.desc("pair_count"), "left", "right")
                .limit(1).collect())
        if not best:
            break
        b = best[0]
        out.append((rnd, b["left"], b["right"], b["left"] + b["right"],
                    b["pair_count"]))
        if rnd < rounds:
            vocab = _apply_merge(vocab, b["left"], b["right"]) \
                .localCheckpoint()
    return spark.createDataFrame(
        out, "round int, left string, right string, merged string, "
             "pair_count long")


# --- oracle SQL builder -------------------------------------------------------

def _fold_cte(src: str, out: str, left_expr: str, right_expr: str) -> str:
    """Positional recursive CTE applying the module's left fold to every
    word in ``src`` (vec of columns: wc, syms). The merge pair comes from
    the 1-row CTEs named by ``left_expr``/``right_expr``."""
    return f"""{out}_steps(wc, syms, pos, acc) AS (
  SELECT wc, syms, 1, CAST([] AS VARCHAR[]) FROM {src}
  UNION ALL
  SELECT wc, syms, pos + 1,
         CASE WHEN len(acc) > 0 AND acc[-1] = {left_expr}
                   AND syms[pos] = {right_expr}
              THEN list_slice(acc, 1, len(acc) - 1)
                   || [{left_expr} || {right_expr}]
              ELSE acc || [syms[pos]] END
  FROM {out}_steps WHERE pos <= len(syms)),
{out} AS MATERIALIZED (
  SELECT wc, acc AS syms FROM {out}_steps WHERE pos = len(syms) + 1)"""


def train_bpe_sql(table: str = "documents", rounds: int = 3,
                  text_col: str = "text") -> str:
    """The full trainer unrolled in SQL: word counts → char symbols →
    per-round (pair count, argmax, recursive-CTE fold). Mirrors
    :func:`train_bpe` operation-for-operation."""
    from rgd_rnaseq_workflows_spark.functions import text as TX
    toks = TX.tokens_sql(text_col)
    # AS MATERIALIZED everywhere: DuckDB inlines CTEs by default, so the
    # scalar subqueries inside the recursive fold would re-run the whole
    # upstream chain (corpus word count included) once per step row —
    # measured 70 s for a 31-word vocabulary vs ~0.5 s materialized
    head = f"""wcnt AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({toks}) AS word FROM {table})
  GROUP BY word),
v0 AS MATERIALIZED (
  SELECT wc,
         list_transform(range(1, len(word) + 1),
                        i -> word[i]) || ['{END_MARK}'] AS syms
  FROM wcnt)"""
    chain = [head]
    prev = "v0"
    for rnd in range(1, rounds + 1):
        chain.append(f"""p{rnd} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(wc) AS BIGINT) AS n
  FROM (SELECT wc, syms, unnest(range(1, len(syms))) AS i FROM {prev})
  GROUP BY 1, 2),
b{rnd} AS MATERIALIZED (
  SELECT l, r, n FROM p{rnd}
  ORDER BY n DESC, l, r LIMIT 1)""")
        if rnd < rounds:
            chain.append(_fold_cte(
                prev, f"v{rnd}",
                f"(SELECT l FROM b{rnd})", f"(SELECT r FROM b{rnd})"))
            prev = f"v{rnd}"
    selects = "\nUNION ALL\n".join(
        f'SELECT {r} AS round, l AS "left", r AS "right",'
        f" l || r AS merged, n AS pair_count FROM b{r}"
        for r in range(1, rounds + 1))
    body = ",\n".join(chain)
    return f"""
WITH RECURSIVE {body}
{selects}
ORDER BY round
"""

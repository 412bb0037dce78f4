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

from pyspark.sql import DataFrame
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


def _fold_py(syms: list, left: str, right: str, merged: str) -> list:
    """Driver-side twin of :func:`_apply_merge`'s left fold (identical
    semantics: greedy left-to-right, a fresh merge never re-matches its
    predecessor because ``merged`` is strictly longer than ``right``)."""
    out: list = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = merged
        else:
            out.append(s)
    return out


def _train_bpe_driver(rows, rounds: int) -> tuple[list, list]:
    """Exact incremental BPE on the collected word-count table.

    Classic trainer shape (Sennrich et al. 2016; what SentencePiece/HF
    tokenizers run in-memory): maintain weighted adjacent-pair counts,
    an inverted pair→word-ids index, and a lazy-deletion max-heap keyed
    (count DESC, left ASC, right ASC). Each merge touches only the words
    that contain the chosen pair, so total work is bounded by the number
    of pair-count *changes*, not rounds × vocabulary. Counts are integer
    word-count sums — bit-identical to the distributed per-round path.
    """
    import heapq
    from collections import defaultdict

    words = []                       # [mutable syms list, wc]
    pair_counts: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for word, wc in rows:
        syms = list(word) + [END_MARK]
        idx = len(words)
        words.append([syms, wc])
        for p in zip(syms, syms[1:]):
            pair_counts[p] += wc
            pair_words[p].add(idx)
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)
    out: list = []
    for rnd in range(1, rounds + 1):
        # lazy deletion: skip entries whose stored count went stale
        while heap and pair_counts.get(
                (heap[0][1], heap[0][2]), 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break
        negc, left, right = heapq.heappop(heap)
        merged = left + right
        out.append((rnd, left, right, merged, -negc))
        touched: set = set()
        for i in pair_words.get((left, right), ()):
            syms, wc = words[i]
            if not any(a == left and b == right
                       for a, b in zip(syms, syms[1:])):
                continue  # stale inverted-index entry
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= wc
                touched.add(p)
            new_syms = _fold_py(syms, left, right, merged)
            words[i][0] = new_syms
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] += wc
                pair_words[p].add(i)
                touched.add(p)
        pair_counts.pop((left, right), None)
        pair_words.pop((left, right), None)
        touched.discard((left, right))
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    # words carries the FINAL symbol state per word (maintained
    # incrementally by the merge loop) — the encoder's free by-product
    return out, words


def _train_bpe_distributed(vocab: DataFrame, rounds: int) -> list:
    """Fallback for vocabularies too large to collect: one Spark round
    per merge (pair count shuffle → deterministic argmax → lazy fold).
    Exact but serial — the driver path above is the fast path."""
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
    return out


def train_bpe(docs: DataFrame, rounds: int = 3, text_col: str = "text",
              max_driver_vocab: int = 5_000_000) -> DataFrame:
    """Train ``rounds`` BPE merges; returns one row per merge:
    (round, left, right, merged, pair_count) — the merge table a
    tokenizer ships.

    The corpus is touched exactly ONCE (token explode → word groupBy,
    map-side combined). The distinct-word count table is vocabulary-
    scale — millions of rows at web scale, independent of corpus size —
    so when it fits under ``max_driver_vocab`` rows it is collected and
    all merge rounds run as exact incremental updates on the driver
    (ONE Spark job total, vs one job *per merge* before; a 32k-merge
    production vocabulary is 32k serial Spark rounds on the old path).
    Oversized vocabularies fall back to the distributed per-round loop.
    Both paths produce bit-identical merge tables (integer counts,
    (count DESC, left ASC, right ASC) argmax, identical fold).
    """
    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    rows = [(r["word"], r["wc"])
            for r in wc.limit(max_driver_vocab + 1).collect()]
    if len(rows) <= max_driver_vocab:
        out, _ = _train_bpe_driver(rows, rounds)
    else:
        vocab = (wc.select("wc", _initial_symbols(F.col("word")).alias("syms"))
                 .localCheckpoint())  # reused every round; corpus never re-read
        out = _train_bpe_distributed(vocab, rounds)
    return spark.createDataFrame(
        out, "round int, left string, right string, merged string, "
             "pair_count long")


# --- oracle SQL builder -------------------------------------------------------

def _fold_cte(src: str, out: str, left_expr: str, right_expr: str,
              key_cols: tuple[str, ...] = ()) -> str:
    """Positional recursive CTE applying the module's left fold to every
    word in ``src`` (vec of columns: key_cols…, wc, syms). The merge
    pair comes from the 1-row CTEs named by ``left_expr``/``right_expr``;
    ``key_cols`` (e.g. the word itself) are carried through unchanged —
    the fertility oracle needs per-word identity, the budget oracle
    doesn't."""
    k = "".join(f"{c}, " for c in key_cols)
    return f"""{out}_steps({k}wc, syms, pos, acc) AS (
  SELECT {k}wc, syms, 1, CAST([] AS VARCHAR[]) FROM {src}
  UNION ALL
  SELECT {k}wc, syms, pos + 1,
         CASE WHEN len(acc) > 0 AND acc[-1] = {left_expr}
                   AND syms[pos] = {right_expr}
              THEN list_slice(acc, 1, len(acc) - 1)
                   || [{left_expr} || {right_expr}]
              ELSE acc || [syms[pos]] END
  FROM {out}_steps WHERE pos <= len(syms)),
{out} AS MATERIALIZED (
  SELECT {k}wc, acc AS syms FROM {out}_steps WHERE pos = len(syms) + 1)"""


def _train_chain_sql(table: str, rounds: int, text_col: str,
                     fold_last: bool = False,
                     carry_word: bool = False) -> tuple[list[str], str]:
    """The shared trainer CTE chain: word counts → char symbols →
    per-round (pair count, argmax, recursive-CTE fold). Returns
    (chain, last_vocab_cte). ``fold_last`` also applies the final
    round's merge (needed by the encoder; the trainer itself never
    consumes the post-last-merge vocabulary). ``carry_word`` threads the
    word itself (as ``w``) through every fold — per-word encoded lengths
    (the fertility oracle) need identity, the global budget doesn't."""
    from rgd_rnaseq_workflows_spark.functions import text as TX
    toks = TX.tokens_sql(text_col)
    key = "word AS w, " if carry_word else ""
    key_cols = ("w",) if carry_word else ()
    # AS MATERIALIZED everywhere: DuckDB inlines CTEs by default, so the
    # scalar subqueries inside the recursive fold would re-run the whole
    # upstream chain (corpus word count included) once per step row —
    # measured 70 s for a 31-word vocabulary vs ~0.5 s materialized
    head = f"""wcnt AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({toks}) AS word FROM {table})
  GROUP BY word),
v0 AS MATERIALIZED (
  SELECT {key}wc,
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
        if rnd < rounds or fold_last:
            chain.append(_fold_cte(
                prev, f"v{rnd}",
                f"(SELECT l FROM b{rnd})", f"(SELECT r FROM b{rnd})",
                key_cols=key_cols))
            prev = f"v{rnd}"
    return chain, prev


def train_bpe_sql(table: str = "documents", rounds: int = 3,
                  text_col: str = "text") -> str:
    """The full trainer unrolled in SQL — mirrors :func:`train_bpe`
    operation-for-operation."""
    chain, _ = _train_chain_sql(table, rounds, text_col)
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


# --- corpus encoding (token budgeting) ---------------------------------------

def bpe_encode_stats(docs: DataFrame, rounds: int = 4,
                     text_col: str = "text",
                     max_driver_vocab: int = 5_000_000) -> DataFrame:
    """Train ``rounds`` merges, then ENCODE the corpus with them and
    report the token budget — the number a pretraining-data pipeline
    needs before it can mix, pack, or price a corpus:
    one row (n_words, corpus_syms_initial, corpus_syms_encoded,
    compression).

    Encoding happens on the VOCABULARY (distinct words × wc), never the
    corpus: one word-count shuffle, then the driver trainer's final
    symbol states — maintained incrementally by the merge loop — are the
    encoding for free (summing them is O(vocab)). The previous form
    re-applied the merge list as ``rounds`` chained aggregate-HOF plans:
    18 s for 200 merges at the 10× replica from PLAN DEPTH alone, and a
    32k-merge production vocabulary would be unplannable. Oversized
    vocabularies fall back to the distributed fold chain with periodic
    lineage truncation.
    ``corpus_syms_initial`` counts the char symbols + end marker per
    word occurrence; ``compression`` = initial/encoded, rounded 6.
    """
    import math

    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    rows = [(r["word"], r["wc"])
            for r in wc.limit(max_driver_vocab + 1).collect()]
    if len(rows) <= max_driver_vocab:
        _, words = _train_bpe_driver(rows, rounds)
        ini = sum(w * (len(word) + 1) for word, w in rows)
        enc = sum(w * len(syms) for syms, w in words)
        # half-away-from-zero on the same IEEE quotient both engines round
        comp = math.floor(ini / enc * 10**6 + 0.5) / 10**6
        return spark.createDataFrame(
            [(len(rows), ini, enc, comp)],
            "n_words long, corpus_syms_initial long, "
            "corpus_syms_encoded long, compression double")
    merges_df = train_bpe(docs, rounds, text_col)
    merges = [(r["left"], r["right"])
              for r in merges_df.orderBy("round").collect()]
    vocab = wc.select(
        "wc",
        (F.length("word") + 1).cast("long").alias("n0"),
        _initial_symbols(F.col("word")).alias("syms"))
    for i, (left, right) in enumerate(merges, 1):
        vocab = _apply_merge(vocab, left, right)
        if i % 20 == 0:  # bound plan depth on the fallback path
            from rgd_rnaseq_workflows_spark.session import checkpoint_df
            vocab = checkpoint_df(vocab)
    return (vocab.agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.col("wc") * F.col("n0")).cast("long")
        .alias("corpus_syms_initial"),
        F.sum(F.col("wc") * F.size("syms")).cast("long")
        .alias("corpus_syms_encoded"))
        .select("n_words", "corpus_syms_initial", "corpus_syms_encoded",
                F.round(F.col("corpus_syms_initial")
                        / F.col("corpus_syms_encoded"), 6)
                .alias("compression")))


def bpe_encode_stats_sql(table: str = "documents", rounds: int = 4,
                         text_col: str = "text") -> str:
    """DuckDB twin of :func:`bpe_encode_stats`: the shared trainer chain
    with the final fold applied, then exact-integer budget sums.
    ``corpus_syms_initial`` comes from wcnt (len(word)+1 — the fold
    chain doesn't carry word identity and doesn't need to)."""
    chain, last = _train_chain_sql(table, rounds, text_col, fold_last=True)
    body = ",\n".join(chain)
    return f"""
WITH RECURSIVE {body},
enc AS (
  SELECT CAST(sum(wc * len(syms)) AS BIGINT) AS corpus_syms_encoded
  FROM {last}),
ini AS (
  SELECT CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(wc * (length(word) + 1)) AS BIGINT)
           AS corpus_syms_initial
  FROM wcnt)
SELECT n_words, corpus_syms_initial, corpus_syms_encoded,
       round(CAST(corpus_syms_initial AS DOUBLE) / corpus_syms_encoded, 6)
         AS compression
FROM ini, enc"""


def bpe_fertility_by_lang(docs: DataFrame, rounds: int = 4,
                          lang_col: str = "lang", text_col: str = "text",
                          max_driver_vocab: int = 5_000_000) -> DataFrame:
    """Per-language tokenizer FERTILITY of a globally-trained BPE:
    (lang, n_words, n_tokens, n_bpe_tokens, fertility6) where
    ``fertility6 = BPE symbols per whitespace token`` — the number that
    tells a mix designer how a shared tokenizer taxes each language
    (English-heavy merges make other scripts pay more symbols/word;
    per-lang budgets should be set in BPE tokens, not words).

    One corpus pass: the (lang, word, wc) table is the only shuffle; the
    GLOBAL word counts derive from it by a driver-side rollup, merges
    train once (incremental driver trainer), and each word's final
    symbol state — maintained by the trainer — prices every language's
    occurrences. ``fertility6`` is one division of exact integers.

    The per-language vocabulary table must fit the driver gate (same
    ``max_driver_vocab`` contract as :func:`train_bpe`); beyond it,
    raise rather than silently sample — the distributed path would be
    :func:`bpe_encode_stats`'s fold chain with a lang column.
    """
    from collections import defaultdict

    from rgd_rnaseq_workflows_spark.functions import text as TX

    spark = docs.sparkSession
    wcl = (docs.select(F.col(lang_col).alias("lang"),
                       F.explode(TX.tokens(text_col)).alias("word"))
           .groupBy("lang", "word").agg(F.count("*").alias("wc")))
    rows_l = [(r["lang"], r["word"], r["wc"])
              for r in wcl.limit(max_driver_vocab + 1).collect()]
    if len(rows_l) > max_driver_vocab:
        raise ValueError(
            f"per-language vocabulary exceeds max_driver_vocab="
            f"{max_driver_vocab}; raise the gate or use "
            f"bpe_encode_stats's distributed fold chain per language")
    gw: dict = defaultdict(int)
    for _lang, word, wc in rows_l:
        gw[word] += wc
    global_rows = sorted(gw.items())
    _, words = _train_bpe_driver(global_rows, rounds)
    enc_len = {word: len(syms)
               for (word, _), (syms, _) in zip(global_rows, words)}
    per: dict = defaultdict(lambda: [0, 0, 0])   # words, toks, bpe
    for lang, word, wc in rows_l:
        p = per[lang]
        p[0] += 1
        p[1] += wc
        p[2] += wc * enc_len[word]
    import math
    # half-away-from-zero on the same IEEE quotient both engines round
    # (Python's round() is banker's — the bpe_encode_stats precedent);
    # None-safe sort: a NULL lang group must report, not TypeError
    # (the oracle returns its NULL-lang row)
    out = [(lang, p[0], p[1], p[2],
            math.floor(p[2] / p[1] * 10**6 + 0.5) / 10**6)
           for lang, p in sorted(per.items(),
                                 key=lambda kv: (kv[0] is None, kv[0]))]
    return spark.createDataFrame(
        out, "lang string, n_words long, n_tokens long, "
             "n_bpe_tokens long, fertility6 double")




def bpe_fertility_by_lang_sql(table: str = "documents", rounds: int = 4,
                              lang_col: str = "lang",
                              text_col: str = "text") -> str:
    """DuckDB twin of :func:`bpe_fertility_by_lang`: the SHARED trainer
    chain (``carry_word=True`` threads the word key through every fold),
    plus a per-language count CTE joined onto the final per-word symbol
    states."""
    from rgd_rnaseq_workflows_spark.functions import text as TX
    toks = TX.tokens_sql(text_col)
    chain, last = _train_chain_sql(table, rounds, text_col,
                                   fold_last=True, carry_word=True)
    wcl = f"""wcl AS MATERIALIZED (
  SELECT {lang_col} AS lang, word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT {lang_col}, unnest({toks}) AS word FROM {table})
  GROUP BY 1, 2)"""
    body = ",\n".join([wcl] + chain)
    return f"""
WITH RECURSIVE {body}
SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(c.wc) AS BIGINT) AS n_tokens,
       CAST(sum(c.wc * len(v.syms)) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(c.wc * len(v.syms)) AS DOUBLE)
             / sum(c.wc), 6) AS fertility6
FROM wcl c JOIN {last} v ON c.word = v.w
GROUP BY lang
"""

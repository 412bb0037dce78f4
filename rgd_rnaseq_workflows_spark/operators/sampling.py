"""Deterministic stratified sampling for training-mix construction.

Building a training mix means sampling each stratum (language, source,
quality band) at its own rate. ``df.sample`` is seed-dependent per
partitioning and not reproducible across engines; the scalable,
reproducible form is HASH-BUCKET Bernoulli sampling:

    keep row  ⇔  md5(seed:key) mod 10000  <  rate(stratum) * 10000

Scale design (100 TB):
- a pure FILTER — no shuffle, no sort, no state; runs inside the parquet
  scan's whole-stage codegen and composes with predicate pushdown on the
  stratum column;
- deterministic in the row KEY, not the partitioning: the same row is
  kept on any cluster size, any engine with md5 (the DuckDB oracle
  reproduces the exact kept set);
- changing one stratum's rate only touches that stratum's rows
  (monotone: raising a rate only ADDS rows — bucket thresholds nest),
  which makes mix iteration cheap and auditable.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql

BUCKETS = 10_000  # basis points: rates quantized to 0.01%


def _bps(fraction: float) -> int:
    bps = int(round(fraction * BUCKETS))
    if not 0 <= bps <= BUCKETS:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return bps


def sample_bucket(key_col: Column | str, seed: int = 1) -> Column:
    """The row's sampling bucket in [0, 10000) — md5-derived, so identical
    in any engine (``md5_long``'s contract)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return md5_long(c.cast("string"), seed=seed) % BUCKETS


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], key_col: str,
                           seed: int = 1,
                           default: float = 0.0) -> DataFrame:
    """Keep each stratum at its own rate, deterministically in ``key_col``.

    ``fractions`` maps stratum value → keep rate in [0, 1]; strata not
    listed keep ``default``. The per-stratum threshold is a broadcast-free
    literal map lookup (``element_at`` on a map literal — JVM expression,
    no join).
    """
    thresholds = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(_bps(v))) for k, v in sorted(fractions.items())))
    thr = F.coalesce(F.element_at(thresholds, F.col(strata_col)),
                     F.lit(_bps(default)))
    return df.filter(sample_bucket(key_col, seed) < thr)


def stratified_hash_sample_sql(src: str, strata_col: str,
                               fractions: dict[str, float], key_col: str,
                               seed: int = 1,
                               default: float = 0.0) -> str:
    """ANSI-SQL twin of :func:`stratified_hash_sample` (DuckDB oracle)."""
    whens = "\n".join(
        f"    WHEN '{k}' THEN {_bps(v)}"
        for k, v in sorted(fractions.items()))
    bucket = f"{md5_long_sql(f'CAST({key_col} AS VARCHAR)', seed=seed)} % {BUCKETS}"
    return f"""
SELECT * FROM {src}
WHERE {bucket} < (CASE {strata_col}
{whens}
    ELSE {_bps(default)} END)
"""


# --- temperature-resampled mix ------------------------------------------------

WEIGHT_SCALE = 1 << 20  # fixed-point weight numerators (exact bigints)


def temperature_mix(df: DataFrame, strata_col: str, key_col: str,
                    total_fraction: float = 0.3, seed: int = 1) -> DataFrame:
    """Temperature-resampled stratum mix (the mT5/CC-mix α=0.5 scheme):
    stratum weight ∝ √count, so rare strata are up-weighted relative to
    their corpus share; each stratum keeps
    ``rate = min(1, target·w_s / count_s)`` of its rows, deterministically
    in ``key_col``'s md5 bucket (same bucket family as
    :func:`stratified_hash_sample`).

    Cross-engine exactness (drives the DuckDB oracle): the weight
    numerator is ``floor(√count · 2^20)`` — √ is correctly rounded per
    IEEE-754 on every engine, the scale-by-2^20 and floor are exact — so
    the denominator is an exact BIGINT sum, and the final basis-point
    threshold is one explicitly-parenthesized double expression whose
    every operation both engines round identically. α is fixed at 0.5:
    general ``pow(x, α)`` carries no cross-engine correct-rounding
    guarantee, √ does.

    Scale shape (100 TB): one metadata-scale count agg (k strata rows),
    a 1-row total cross-joined in, rates broadcast back onto the corpus,
    then a pure md5-bucket filter — the corpus itself is never shuffled.
    Returns the kept rows + the per-stratum threshold (``mix_bps``) for
    mix auditing.
    """
    c = F.col
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    counts = counts.withColumn(
        "_num", F.floor(F.sqrt(c("_n").cast("double")) * WEIGHT_SCALE)
        .cast("long"))
    tot = counts.agg(F.sum("_num").alias("_denom"),
                     F.sum("_n").alias("_total"))
    target = F.floor(F.lit(total_fraction) * c("_total").cast("double")) \
        .cast("double")
    bps = F.least(
        F.lit(BUCKETS).cast("long"),
        F.floor(((target * c("_num").cast("double")) * float(BUCKETS))
                / (c("_denom").cast("double") * c("_n").cast("double"))))
    rates = (counts.crossJoin(F.broadcast(tot))
             .select(strata_col, bps.alias("mix_bps")))
    return (df.join(F.broadcast(rates), strata_col)
            .filter(sample_bucket(key_col, seed) < c("mix_bps")))


def temperature_mix_sql(src: str, strata_col: str, key_col: str,
                        total_fraction: float = 0.3, seed: int = 1,
                        cols: str = "*") -> str:
    """ANSI-SQL twin of :func:`temperature_mix` — identical arithmetic,
    operation for operation (parenthesization matters: both engines must
    round the same double intermediates)."""
    bucket = (f"{md5_long_sql(f'CAST({key_col} AS VARCHAR)', seed=seed)}"
              f" % {BUCKETS}")
    return f"""
WITH _cnt AS (
  SELECT {strata_col}, count(*) AS _n,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {WEIGHT_SCALE})
              AS BIGINT) AS _num
  FROM {src} GROUP BY {strata_col}),
_tot AS (
  SELECT CAST(sum(_num) AS BIGINT) AS _denom,
         CAST(sum(_n) AS BIGINT) AS _total FROM _cnt),
_rates AS (
  SELECT {strata_col},
         LEAST(CAST({BUCKETS} AS BIGINT),
               CAST(floor(((CAST(floor({total_fraction} *
                                       CAST(_total AS DOUBLE)) AS DOUBLE)
                            * CAST(_num AS DOUBLE)) * {float(BUCKETS)})
                          / (CAST(_denom AS DOUBLE) * CAST(_n AS DOUBLE)))
                    AS BIGINT)) AS mix_bps
  FROM _cnt CROSS JOIN _tot)
SELECT {cols}, r.mix_bps
FROM {src} d JOIN _rates r USING ({strata_col})
WHERE {bucket} < r.mix_bps
"""


# --- token-budget mix ---------------------------------------------------------


def token_budget_mix(df: DataFrame, strata_col: str, tokens_col: str,
                     budgets: dict[str, int], key_col: str,
                     seed: int = 1) -> DataFrame:
    """Sample each stratum down to a TOKEN budget — the unit a
    pretraining run actually allocates (a mix spec says "30B tokens of
    code, 5B of German", not document fractions).

    Per stratum: rate_bps = min(10000, ⌊budget·10000 / Σ tokens⌋), then
    the same deterministic md5-bucket filter the other samplers use —
    the kept token count lands within one bucket-quantum of the budget
    in expectation. Strata without a budget are DROPPED (a mix spec is
    exhaustive). All-integer arithmetic end to end (exact bigint token
    sums, integer floor-division) — the DuckDB oracle reproduces the
    exact kept set. Emits ``budget_bps`` for mix auditing.

    Scale shape (100 TB): one metadata-scale agg (k strata rows), rates
    broadcast back, then a pure filter — the corpus never shuffles.
    """
    for k, v in budgets.items():
        if v < 0:
            raise ValueError(f"negative budget for {k!r}")
    c = F.col
    totals = df.groupBy(strata_col).agg(
        F.sum(c(tokens_col).cast("long")).alias("_tok"))
    bmap = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(int(v))) for k, v in sorted(budgets.items())))
    # integer `div`, not double `/` + floor: budget·10⁴ and the token
    # sum are exact bigints, and both engines must floor the same exact
    # quotient (a double division could mis-round at exact boundaries)
    rates = (totals
             .withColumn("_budget",
                         F.element_at(bmap, c(strata_col)).cast("long"))
             .filter(c("_budget").isNotNull())
             .withColumn("budget_bps",
                         F.least(F.lit(BUCKETS).cast("long"),
                                 F.expr(f"(_budget * {BUCKETS}) div _tok")))
             .select(strata_col, "budget_bps"))
    return (df.join(F.broadcast(rates), strata_col)
            .filter(sample_bucket(key_col, seed) < c("budget_bps")))


def token_budget_mix_sql(src: str, strata_col: str, tokens_col: str,
                         budgets: dict[str, int], key_col: str,
                         seed: int = 1, cols: str = "*") -> str:
    """ANSI-SQL twin of :func:`token_budget_mix` (identical integer
    arithmetic; DuckDB's // is floor division on BIGINTs)."""
    whens = "\n".join(f"    WHEN '{k}' THEN {int(v)}"
                      for k, v in sorted(budgets.items()))
    bucket = (f"{md5_long_sql(f'CAST({key_col} AS VARCHAR)', seed=seed)}"
              f" % {BUCKETS}")
    return f"""
WITH _tot AS (
  SELECT {strata_col}, CAST(sum({tokens_col}) AS BIGINT) AS _tok
  FROM {src} GROUP BY {strata_col}),
_rates AS (
  SELECT {strata_col},
         LEAST(CAST({BUCKETS} AS BIGINT),
               (CASE {strata_col}
{whens}
    ELSE NULL END) * {BUCKETS} // _tok) AS budget_bps
  FROM _tot
  WHERE (CASE {strata_col}
{whens}
    ELSE NULL END) IS NOT NULL)
SELECT {cols}, r.budget_bps
FROM {src} d JOIN _rates r USING ({strata_col})
WHERE {bucket} < r.budget_bps
"""


def epoch_budget_waterfall(totals: dict[str, int], weights: dict[str, int],
                           budget: int, max_epochs: int
                           ) -> dict[str, dict]:
    """Data-constrained token allocation (the Muennighoff et al. 2023
    shape): split ``budget`` tokens across strata ∝ integer ``weights``,
    capping each stratum at ``max_epochs`` passes over its available
    tokens and re-flowing the excess to uncapped strata.

    Pure-Python water-filling over METADATA (k strata rows) — exactly
    ``len(weights)`` rounds, each round giving every active stratum
    ``(remaining · wᵢ) div Σw_active`` tokens (floor) and retiring
    strata that hit their cap; the fixed round count (not an early-stop)
    is part of the contract so the unrolled SQL oracle replays it
    bit-for-bit. Python ints are exact at any scale; the SQL twin runs
    the products in HUGEINT. The ≤ Σw floor residue of the final round
    stays unallocated (documented; negligible at token scale).

    Returns {stratum: {tokens_available, weight, tokens_allocated,
    epochs_bps, capped}} for every weighted stratum (absent strata have
    0 available tokens and cap at 0).
    """
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    if budget < 0:
        raise ValueError(f"negative budget {budget}")
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {k!r}")
    names = sorted(weights)
    tok = {s: int(totals.get(s, 0)) for s in names}
    cap = {s: max_epochs * tok[s] for s in names}
    alloc = {s: 0 for s in names}
    active = {s: weights[s] > 0 for s in names}
    for _ in range(len(names)):
        w_sum = sum(weights[s] for s in names if active[s])
        remaining = budget - sum(alloc.values())
        if w_sum <= 0 or remaining <= 0:
            break
        for s in names:
            if not active[s]:
                continue
            give = (remaining * weights[s]) // w_sum
            if alloc[s] + give >= cap[s]:
                alloc[s] = cap[s]
                active[s] = False
            else:
                alloc[s] += give
    return {s: {"tokens_available": tok[s], "weight": weights[s],
                "tokens_allocated": alloc[s],
                "epochs_bps": (alloc[s] * BUCKETS) // tok[s] if tok[s]
                else 0,
                "capped": alloc[s] >= cap[s]}
            for s in names}


def epoch_budget_manifest(df: DataFrame, strata_col: str, tokens_col: str,
                          weights: dict[str, int], budget: int,
                          max_epochs: int = 4) -> DataFrame:
    """The allocation as a manifest frame: (stratum, tokens_available,
    weight, tokens_allocated, epochs_bps, capped), ``epochs_bps`` > 10000
    meaning repetition (multiple passes). One metadata-scale aggregation
    over the corpus; the waterfall itself runs on the k collected stratum
    totals (driver metadata, the codebook precedent)."""
    totals = {r[0]: r[1] for r in
              df.groupBy(strata_col)
              .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"))
              .collect()}
    plan = epoch_budget_waterfall(totals, weights, budget, max_epochs)
    spark = df.sparkSession
    rows = [(s, p["tokens_available"], p["weight"], p["tokens_allocated"],
             p["epochs_bps"], p["capped"]) for s, p in sorted(plan.items())]
    return spark.createDataFrame(
        rows, f"{strata_col} string, tokens_available long, weight long, "
              "tokens_allocated long, epochs_bps long, capped boolean")


def epoch_budget_waterfall_sql(src: str, strata_col: str, tokens_col: str,
                               weights: dict[str, int], budget: int,
                               max_epochs: int = 4) -> str:
    """DuckDB twin of :func:`epoch_budget_manifest`: the same fixed
    ``len(weights)`` rounds unrolled as chained CTEs (the BPE-oracle
    pattern), HUGEINT products, floor division."""
    names = sorted(weights)
    wvals = ", ".join(f"('{s}', {int(weights[s])})" for s in names)
    rounds = []
    prev = "r0"
    for i in range(1, len(names) + 1):
        rounds.append(f"""
{prev}_tot AS (
  SELECT coalesce(sum(w) FILTER (WHERE active), 0) AS w_sum,
         {budget} - sum(alloc) AS remaining
  FROM {prev}),
r{i} AS (
  SELECT s, tok, w, cap,
         CASE WHEN NOT active OR w_sum <= 0 OR remaining <= 0 THEN alloc
              WHEN alloc + CAST((CAST(remaining AS HUGEINT) * w) // w_sum
                                AS BIGINT) >= cap THEN cap
              ELSE alloc + CAST((CAST(remaining AS HUGEINT) * w) // w_sum
                                AS BIGINT) END AS alloc,
         active AND w_sum > 0 AND remaining > 0
           AND alloc + CAST((CAST(remaining AS HUGEINT) * w) // w_sum
                            AS BIGINT) < cap AS active
  FROM {prev}, {prev}_tot)""")
        prev = f"r{i}"
    return f"""
WITH wts(s, w) AS (VALUES {wvals}),
tots AS (
  SELECT {strata_col} AS s, CAST(sum({tokens_col}) AS BIGINT) AS tok
  FROM {src} GROUP BY 1),
r0 AS (
  SELECT s, coalesce(tok, 0) AS tok, w,
         CAST({max_epochs} AS BIGINT) * coalesce(tok, 0) AS cap,
         CAST(0 AS BIGINT) AS alloc, w > 0 AS active
  FROM wts LEFT JOIN tots USING (s)),{",".join(rounds)}
SELECT s AS {strata_col}, tok AS tokens_available,
       CAST(w AS BIGINT) AS weight, alloc AS tokens_allocated,
       CASE WHEN tok > 0
            THEN CAST(CAST(alloc AS HUGEINT) * {BUCKETS} // tok AS BIGINT)
            ELSE 0 END AS epochs_bps,
       alloc >= cap AS capped
FROM {prev} ORDER BY s"""


def epoch_budget_mix(df: DataFrame, strata_col: str, key_col: str,
                     epochs_bps: dict[str, int],
                     seed: int = 1) -> DataFrame:
    """Materialize an epoch allocation (``epochs_bps`` per stratum, from
    :func:`epoch_budget_waterfall`'s manifest) as the REPEATED corpus:
    every row of a stratum appears ``epochs_bps div 10000`` times (full
    passes) plus one more iff its md5 bucket falls under the fractional
    remainder — e.g. 23,500 bps = every doc twice, ~35% of docs a third
    time. Output adds ``epoch`` (1-based pass index) so a data loader
    can interleave passes; strata without an allocation drop.

    Scale shape: a literal map lookup + ``explode(sequence(...))`` —
    zero shuffle, zero joins, runs inside the scan's codegen; the
    replication factor is the allocation itself, so output tokens track
    the budget by construction (the same one-bucket-quantum error as
    every sampler here).
    """
    for k, v in epochs_bps.items():
        if v < 0:
            raise ValueError(f"negative epochs_bps for {k!r}")
    emap = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(int(v))) for k, v in sorted(epochs_bps.items())))
    bps = F.element_at(emap, F.col(strata_col))
    # ints < 2^53: the double division is exact and floor == int div
    full = F.floor(bps / F.lit(BUCKETS)).cast("long")
    frac = bps % BUCKETS
    n = full + F.when(sample_bucket(key_col, seed) < frac, 1).otherwise(0)
    return (df.withColumn("_n", n)
            .filter(F.col("_n") > 0)
            .withColumn("epoch",
                        F.explode(F.sequence(F.lit(1).cast("long"),
                                             F.col("_n"))))
            .drop("_n"))


def epoch_budget_mix_sql(src: str, strata_col: str, key_col: str,
                         epochs_bps: dict[str, int], seed: int = 1,
                         cols: str = "*") -> str:
    """DuckDB twin of :func:`epoch_budget_mix` (same buckets, same
    replication counts)."""
    whens = "\n".join(f"    WHEN '{k}' THEN {int(v)}"
                      for k, v in sorted(epochs_bps.items()))
    bucket = (f"{md5_long_sql(f'CAST({key_col} AS VARCHAR)', seed=seed)}"
              f" % {BUCKETS}")
    case = f"CASE {strata_col}\n{whens}\n    ELSE NULL END"
    return f"""
WITH marked AS (
  SELECT *, ({case}) // {BUCKETS}
            + CASE WHEN {bucket} < ({case}) % {BUCKETS}
                   THEN 1 ELSE 0 END AS _n
  FROM {src}
  WHERE ({case}) IS NOT NULL)
SELECT {cols}, CAST(e.epoch AS BIGINT) AS epoch
FROM marked, unnest(range(1, CAST(_n AS BIGINT) + 1)) AS e(epoch)
WHERE _n > 0
"""


# --- per-key frequency capping ------------------------------------------------

def cap_per_key(df: DataFrame, key_col: str, cap: int, id_col: str,
                seed: int = 1, n_salts: int = 8) -> DataFrame:
    """Keep at most ``cap`` rows per key (domain/source frequency capping
    for crawl corpora), choosing survivors uniformly-at-random but
    reproducibly: rank rows within each key by ``md5(seed:id)`` (tie →
    id) and keep ranks ≤ cap.

    Skew-safe two-phase top-K — a hot key (one domain with 10⁹ pages at
    100 TB) must not funnel through a single window task:

    1. rank within (key, salt) where salt = id-hash mod ``n_salts``;
       survivors ≤ cap per salt — this window's partitions are the hot
       key split ``n_salts`` ways;
    2. re-rank the ≤ cap·n_salts survivors per key; keep ranks ≤ cap.

    Phase 1 is lossless for the final top-cap (every global top-cap row
    is in its own salt's top-cap), so the result is EXACTLY the
    single-window answer — the oracle twin is that plain global form.
    Emits ``keep_rank`` (1-based, deterministic) for auditability.
    """
    from pyspark.sql import Window
    ord_col = md5_long(F.col(id_col).cast("string"), seed=seed)
    # salt from the rank hash itself (not id % n_salts): works for any
    # id type, and phase 1 is lossless under ANY salt assignment
    t = df.withColumn("_ord", ord_col) \
          .withColumn("_salt", F.pmod(F.col("_ord"), F.lit(n_salts)))
    w1 = Window.partitionBy(key_col, "_salt").orderBy("_ord", id_col)
    survivors = (t.withColumn("_r1", F.row_number().over(w1))
                 .filter(F.col("_r1") <= cap))
    w2 = Window.partitionBy(key_col).orderBy("_ord", id_col)
    return (survivors.withColumn("keep_rank",
                                 F.row_number().over(w2).cast("long"))
            .filter(F.col("keep_rank") <= cap)
            .drop("_ord", "_salt", "_r1"))


def cap_per_key_sql(src: str, key_col: str, cap: int, id_col: str,
                    seed: int = 1, cols: str = "*") -> str:
    """Single-window twin of :func:`cap_per_key` (the two-phase plan is
    exact, so the plain form is the oracle)."""
    ord_sql = md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    return f"""
SELECT {cols}, keep_rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY {key_col} ORDER BY {ord_sql}, {id_col}) AS BIGINT)
    AS keep_rank
  FROM {src})
WHERE keep_rank <= {cap}
"""


# --- deterministic train/val/test splits --------------------------------------

def split_assign(key_col: Column | str, seed: int = 1, train: float = 0.8,
                 val: float = 0.1) -> Column:
    """Deterministic split label from the row key's md5 bucket:
    train/val/test at (train, val, rest). The split is a property of the
    KEY — stable under repartitioning, re-ingestion, engine change —
    which is what makes downstream leakage auditing meaningful."""
    b = sample_bucket(key_col, seed)
    t, v = _bps(train), _bps(train) + _bps(val)
    return (F.when(b < t, F.lit("train"))
            .when(b < v, F.lit("val"))
            .otherwise(F.lit("test")))


def split_assign_sql(key_col: str, seed: int = 1, train: float = 0.8,
                     val: float = 0.1) -> str:
    b = (f"{md5_long_sql(f'CAST({key_col} AS VARCHAR)', seed=seed)}"
         f" % {BUCKETS}")
    t, v = _bps(train), _bps(train) + _bps(val)
    return (f"CASE WHEN {b} < {t} THEN 'train' "
            f"WHEN {b} < {v} THEN 'val' ELSE 'test' END")

def cluster_split_assign(docs: DataFrame, comps: DataFrame,
                         id_col: str = "doc_id", seed: int = 1,
                         train: float = 0.8,
                         val: float = 0.1) -> DataFrame:
    """Leakage-free train/val/test assignment: the split is a property
    of the near-dup CLUSTER, not the document. Every member of a
    connected component hashes the component label (its min reachable
    id); singletons hash their own id — so two near-duplicate documents
    can never land on opposite sides of the split, closing the gap
    ``split_leakage_report`` measures (a per-doc hash split leaks: a
    test doc with a train near-twin is memorization masquerading as
    generalization).

    ``comps`` is ``connected_components(pairs)`` output (id, comp) —
    compute the pair graph ONCE (plans.neardup) and feed it to both the
    dedup keepers and this assignment. Output: (id, rep, split).

    Scale shape: one left join of docs onto the component table
    (component rows ≈ duplicated docs only, usually a small fraction —
    broadcastable in the common case) + a pure hash projection; the
    split stays deterministic under repartitioning, re-ingestion and
    engine change because rep and md5 are.
    """
    lab = (docs.select(F.col(id_col).cast("long").alias("id"))
           .join(comps, "id", "left")
           .withColumn("rep", F.coalesce("comp", F.col("id"))))
    return lab.select(
        "id", "rep",
        split_assign(F.col("rep"), seed=seed, train=train,
                     val=val).alias("split"))

def duplicate_downweight(docs: DataFrame, comps: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """SOFT dedup for training mixes: instead of keeping one member
    per near-dup cluster (the keeper policy), every member gets weight
    ``1/cluster_size`` so the CLUSTER contributes one document's worth
    of probability mass — the standard soft-dedup alternative when
    hard dropping loses legitimate variation (forks, translations,
    templated-but-distinct pages).

    Output: (id, cluster_size, weight_bp) with ``weight_bp`` =
    ``10000 div cluster_size`` in integer basis points (singletons =
    10000) — exact, engine-identical, directly consumable by the
    budget/mix operators as a per-doc rate.

    ``comps`` is ``connected_components(pairs)`` output; one
    cluster-size aggregation (duplicated-doc scale) + one left join —
    the same shape as :func:`cluster_split_assign`, and the same
    single pair-graph the keepers/splits/leakage reports share.
    """
    sizes = comps.groupBy("comp").agg(
        F.count("*").cast("long").alias("cluster_size"))
    lab = (docs.select(F.col(id_col).cast("long").alias("id"))
           .join(comps, "id", "left")
           .join(sizes, "comp", "left")
           .select("id", F.coalesce("cluster_size", F.lit(1))
                   .cast("long").alias("cluster_size")))
    return lab.select(
        "id", "cluster_size",
        F.expr("10000 div cluster_size").cast("long").alias("weight_bp"))



# =============================================================================
# Systematic PPS sampling (probability proportional to size, exact-k)
# =============================================================================

PPS_HASH_BITS = 60          # md5_long's range is [0, 2^60)
PPS_BUCKETS = 64            # range buckets for the distributed prefix sum


def pps_systematic(df: DataFrame, id_col: str, weight_col: str,
                   k: int, seed: int = 1) -> DataFrame:
    """Systematic PPS sample (Madow's method): EXACTLY ``k`` draws with
    inclusion probability proportional to an integer weight — the
    classic "sample k docs proportional to token count" primitive for
    eval sets, inspection panels and Horvitz-Thompson corpus estimates.

    Construction (all exact integer arithmetic, engine-identical):
    rows are laid on a circle in md5 order (``h = md5(seed:id)``, ties
    by id), each covering ``[cum, cum + w)`` of the total weight ``W``;
    ``k`` equally-spaced grid points ``R + m*W`` (scaled by ``k``; the
    offset ``R = md5('pps:seed') mod W`` is data-independent given W)
    select whichever intervals they land in.  A doc with ``w > W/k``
    can be hit more than once — ``n_copies`` reports multiplicity, and
    ``sum(n_copies) = k`` exactly, always.

    Output: the selected rows only — (id, weight, n_copies, incl_bp)
    with ``incl_bp = min(10000, w*k*10000 div W)`` the exact
    inclusion probability in basis points (the HT reweighting input).

    Scale design (100 TB): the cumulative sum is a DISTRIBUTED prefix
    sum, not a global-window sort — md5 range buckets (high bits of h,
    so bucket order == hash order) aggregate to ``PPS_BUCKETS`` totals,
    the driver folds those into per-bucket offsets (64 rows of
    metadata, never data), and the intra-bucket running total is a
    window partitioned BY BUCKET.  Grid products are computed in
    decimal(38,0) (the drift-monitor discipline): ``cum*k`` overflows
    int64 around W*k > 9.2e18, which a 10-trillion-token corpus with a
    million-point sample reaches.

    Weights must be >= 1 (a zero-weight row can never be selected and
    breaks the interval partition) — enforced with ``raise_error``, the
    winnowing overflow-cap precedent, and the SQL twin errors
    identically.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    step = (1 << PPS_HASH_BITS) // PPS_BUCKETS
    w = (F.when(F.col(weight_col) >= 1, F.col(weight_col))
         .otherwise(F.raise_error(F.concat(
             F.lit("pps_systematic: weight < 1 for id "),
             F.col(id_col).cast("string")))).cast("long"))
    base = (df.select(F.col(id_col).alias("id"), w.alias("w"))
            .withColumn("h", md5_long(F.col("id").cast("string"),
                                      seed=seed))
            .withColumn("bkt", F.expr(f"h div {step}")))
    # freeze the lineage BEFORE the totals collect: the final job
    # re-reads `base`, and a source that changed (or is
    # non-deterministic) between the two jobs would silently break the
    # sum(n_copies) == k invariant — W and R are baked in as literals
    # (the connected_components adjacency discipline); the checkpoint
    # also saves the second full corpus scan.
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    base = checkpoint_df(base)
    totals = {r["bkt"]: r["tw"]
              for r in base.groupBy("bkt")
              .agg(F.sum("w").alias("tw")).collect()}
    W = sum(totals.values())
    if W == 0:
        return base.select("id", F.col("w").alias("weight"),
                           F.lit(0).cast("long").alias("n_copies"),
                           F.lit(0).cast("long").alias("incl_bp")
                           ).filter(F.lit(False))
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    import hashlib
    R = int(hashlib.md5(f"{seed}:pps".encode()).hexdigest()[:15], 16) % W
    off = F.create_map(*[F.lit(x) for pair in offsets.items()
                         for x in pair])
    from pyspark.sql import Window
    win = (Window.partitionBy("bkt").orderBy("h", "id")
           .rowsBetween(Window.unboundedPreceding, -1))
    cum = (base
           .withColumn("lo", (F.coalesce(F.sum("w").over(win), F.lit(0))
                              + off[F.col("bkt")]).cast("long")))
    dec = "decimal(38,0)"
    lo_k = f"CAST(lo AS {dec}) * {k}"
    hi_k = f"CAST(lo + w AS {dec}) * {k}"
    n_copies = (f"(({hi_k} - {R} - 1 + {W}) div {W})"
                f" - (({lo_k} - {R} - 1 + {W}) div {W})")
    incl = f"least(CAST(10000 AS BIGINT), CAST(w AS {dec}) * {k} * 10000 div {W})"
    return (cum.select("id", F.col("w").alias("weight"),
                       F.expr(n_copies).cast("long").alias("n_copies"),
                       F.expr(incl).cast("long").alias("incl_bp"))
            .filter(F.col("n_copies") > 0)
            .orderBy("id"))


def pps_systematic_sql(src: str, id_col: str, weight_col: str,
                       k: int, seed: int = 1) -> str:
    """DuckDB twin of :func:`pps_systematic` — same hash order, same
    offset derivation, same grid identity in HUGEINT (the oracle's
    decimal(38,0)); the global window ORDER BY (h, id) is the
    single-node equivalent of the bucketed prefix sum."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    r_raw = md5_long_sql(f"'pps'", seed=seed)
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         CAST(CASE WHEN {weight_col} >= 1 THEN {weight_col}
              ELSE error('pps_systematic: weight < 1 for id '
                         || CAST({id_col} AS VARCHAR)) END AS BIGINT) AS w,
         {h} AS h
  FROM {src}),
tot AS (SELECT CAST(sum(w) AS HUGEINT) AS tot_w FROM base),
par AS (SELECT tot_w, {r_raw} % tot_w AS grid_r FROM tot),
cum AS (
  SELECT id, w,
         CAST(coalesce(sum(w) OVER (ORDER BY h, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS HUGEINT) AS lo
  FROM base),
sel AS (
  SELECT id, w,
         ((lo + w) * {k} - grid_r - 1 + tot_w) // tot_w
           - (lo * {k} - grid_r - 1 + tot_w) // tot_w AS n_copies,
         least(CAST(10000 AS HUGEINT),
               CAST(w AS HUGEINT) * {k} * 10000 // tot_w) AS incl_bp
  FROM cum, par)
SELECT id, CAST(w AS BIGINT) AS weight,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(incl_bp AS BIGINT) AS incl_bp
FROM sel WHERE n_copies > 0
"""


def token_waterfill_allocation(docs: DataFrame, budget_pct: int = 60,
                               by: str = "source",
                               weight_col: str = "n_tokens") -> DataFrame:
    """Water-filling token-budget allocation — the mix primitive
    between a hard per-source cap and temperature sampling: given a
    global budget of ``budget_pct`` percent of the corpus's tokens,
    find the unique level L such that granting every source
    ``min(supply, L)`` spends the budget; small sources keep
    everything (saturated), large sources are clipped to the common
    level — the max-min fair allocation (classic water-filling).

    EXACT integer semantics, engine-identical: sources sorted by
    (supply, name); with j sources saturated, the candidate level is
    ``L_j = (B − P_j) div (n − j)`` (P_j = sum of the j smallest
    supplies) and exactly one j satisfies ``s_j ≤ L_j < s_{j+1}``;
    the remainder ``(B − P_j) mod (n − j)`` hands one extra token to
    each of the first R unsaturated sources in sort order, so
    ``sum(allocated) == B`` exactly.

    Scale shape: ONE map-side-combined corpus aggregation (per-source
    token sums); everything after rides the |sources|-row metadata
    frame (the partition-less windows are domain-scale by
    construction). Output: (source, supply_tokens, allocated_tokens,
    saturated), ordered by source.
    """
    if not 1 <= budget_pct <= 99:
        raise ValueError("budget_pct must be in [1, 99] (100+ means "
                         "no clipping - the allocation is the supply)")
    sup = (docs.groupBy(F.col(by).alias("_g"))
           .agg(F.sum(F.col(weight_col)).cast("long").alias("_s")))
    return waterfill_from_supply(sup, budget_pct, by)


def waterfill_from_supply(supply: DataFrame, budget_pct: int = 60,
                          by: str = "source") -> DataFrame:
    """The level search + allocation fold over a PREBUILT (group,
    token-sum) supply table — exposed separately because the supply is
    the allocation's sufficient statistic: a stream maintains it
    incrementally (``streaming.corpus_stream.stream_token_supply``)
    and this fold reads the live allocation off the sink without
    re-reading the corpus. ``supply`` must yield (group, tokens) —
    metadata-scale by construction."""
    if not 1 <= budget_pct <= 99:
        raise ValueError("budget_pct must be in [1, 99] (100+ means "
                         "no clipping - the allocation is the supply)")
    from pyspark.sql import Window
    cols = supply.columns
    # negative supply would break the sorted-prefix level-search proof
    # (s_j <= L_j < s_{j+1} assumes a monotone cumulative sum) and can
    # make the valid-level predicate match more than one row — fail
    # loudly (the cap_tokens_per_key negative-weight contract)
    s_raw = F.col(cols[1]).cast("long")
    s_guard = F.when(s_raw < 0, F.raise_error(F.concat(
        F.lit("waterfill_from_supply: negative supply for group "),
        F.col(cols[0]).cast("string"),
        F.lit(" — token supplies must be >= 0")))).otherwise(s_raw)
    sup = supply.select(F.col(cols[0]).alias("_g"),
                        s_guard.alias("_s"))
    w_ord = Window.orderBy("_s", "_g")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    t = (sup.withColumn("_rn", F.row_number().over(w_ord))
         .withColumn("_P", F.sum("_s").over(w_cum))
         .withColumn("_n", F.count("*").over(w_all))
         .withColumn("_B", F.expr(
             f"{budget_pct} * sum(_s) over () div 100"))
         .withColumn("_lag", F.lag("_s").over(w_ord))
         .withColumn("_tot", F.sum("_s").over(w_all)))
    lj = F.expr("(_B - (_P - _s)) div (_n - _rn + 1)")
    # Degenerate total-supply-0 corpus: no row satisfies lj < s (every
    # s is 0), which would make lvl EMPTY and silently empty the whole
    # allocation via the crossJoin (ADVICE r8). Short-circuit: accept
    # the rn=1 row as the level (L=0, j=0, R=0), so every group gets
    # allocated_tokens=0 / saturated=true instead of vanishing.
    valid = ((((F.col("_rn") == 1) | (F.col("_lag") <= lj))
              & (lj < F.col("_s")))
             | ((F.col("_rn") == 1) & (F.col("_tot") == 0)))
    lvl = (t.filter(valid)
           .select(lj.alias("_L"), (F.col("_rn") - 1).alias("_j"),
                   F.expr("(_B - (_P - _s)) % (_n - _rn + 1)")
                   .alias("_R")))
    return (t.crossJoin(F.broadcast(lvl))
            .select(F.col("_g").alias(by),
                    F.col("_s").alias("supply_tokens"),
                    F.when(F.col("_s") <= F.col("_L"), F.col("_s"))
                    .otherwise(F.col("_L") + (F.col("_rn") - F.col("_j")
                                              <= F.col("_R"))
                               .cast("long"))
                    .cast("long").alias("allocated_tokens"),
                    (F.col("_s") <= F.col("_L")).alias("saturated"))
            .orderBy(by))


def token_waterfill_sql(table: str, budget_pct: int = 60,
                        by: str = "source",
                        weight_expr: str | None = None,
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`token_waterfill_allocation` — identical
    sort order, level search, integer division and remainder hand-out.
    ``weight_expr`` defaults to the house whitespace token count."""
    if not 1 <= budget_pct <= 99:
        raise ValueError("budget_pct must be in [1, 99]")
    if weight_expr is None:
        from rgd_rnaseq_workflows_spark.functions.text import (
            token_count_sql)
        weight_expr = token_count_sql(text_col)
    return f"""
WITH sup AS (
  SELECT {by} AS g, CAST(sum({weight_expr}) AS BIGINT) AS s
  FROM {table} GROUP BY 1),
t AS (
  SELECT g, s,
         row_number() OVER (ORDER BY s, g) AS rn,
         sum(s) OVER (ORDER BY s, g
                      ROWS UNBOUNDED PRECEDING) AS p,
         count(*) OVER () AS n,
         ({budget_pct} * sum(s) OVER ()) // 100 AS b,
         lag(s) OVER (ORDER BY s, g) AS lag_s,
         sum(s) OVER () AS tot
  FROM sup),
lvl AS (
  SELECT (b - (p - s)) // (n - rn + 1) AS l,
         rn - 1 AS j,
         (b - (p - s)) % (n - rn + 1) AS r
  FROM t
  WHERE ((rn = 1 OR lag_s <= (b - (p - s)) // (n - rn + 1))
         AND (b - (p - s)) // (n - rn + 1) < s)
     OR (rn = 1 AND tot = 0))
SELECT t.g AS {by},
       t.s AS supply_tokens,
       CAST(CASE WHEN t.s <= lvl.l THEN t.s
                 ELSE lvl.l + CAST(t.rn - lvl.j <= lvl.r AS BIGINT)
            END AS BIGINT) AS allocated_tokens,
       t.s <= lvl.l AS saturated
FROM t CROSS JOIN lvl
ORDER BY {by}
"""


def cap_tokens_per_key(df: DataFrame, key_col: str, budgets: DataFrame,
                       weight_col: str, id_col: str, seed: int = 1,
                       n_salts: int = 8) -> DataFrame:
    """Enforce a per-key TOKEN budget (the :func:`token_waterfill_
    allocation` companion): walk each key's rows in md5(seed:id) rank
    order and keep the greedy prefix whose cumulative weight stays
    within the key's budget — reproducible uniform-random survivor
    choice, exact integer accounting (``cum_tokens`` emitted for
    audit; per-key kept weight never exceeds the budget).

    Skew-safe two-phase prefix-sum (the :func:`cap_per_key` discipline
    adapted to weights, which need one extra guard): a row's
    salt-local cumulative weight LOWER-bounds its global one (its salt
    predecessors are a subset of its global predecessors), so every
    truly-kept row survives the per-(key, salt) phase-1 prune — but a
    phase-1 DROP carries information too: the dropped row's true cum
    already exceeds the budget, and weights are non-negative, so NO
    row at or after the key's earliest dropped position is keepable.
    Phase 2 therefore cuts survivors at that per-key position
    (metadata-scale broadcast) — before it, the survivor prefix IS the
    true prefix — and re-walks only them: exactly the single-window
    answer, with a hot key split across ``n_salts`` window partitions
    and phase-2 input bounded by the kept prefix itself.

    Weights must be >= 0 (the cumulative walk relies on monotone
    prefixes). ``budgets`` must yield (key_col, allocated_tokens) —
    metadata-scale, broadcast.
    """
    from pyspark.sql import Window
    b = F.broadcast(budgets.select(
        F.col(budgets.columns[0]).alias(key_col),
        F.col(budgets.columns[1]).cast("long").alias("_budget")))
    ord_col = md5_long(F.col(id_col).cast("string"), seed=seed)
    # weight >= 0 is a hard contract (the two-phase proof needs
    # monotone prefixes: a negative weight makes the salt-local cumsum
    # stop lower-bounding the global one, silently diverging from the
    # single-window oracle) — fail loudly like attribution.py does for
    # negative conversion values.
    w_raw = F.col(weight_col).cast("long")
    w_guarded = F.when(w_raw >= 0, w_raw).otherwise(
        F.raise_error(F.lit(
            "cap_tokens_per_key: negative weight — weights must be "
            ">= 0 (the cumulative walk relies on monotone prefixes)"))
        .cast("long"))
    t = (df.join(b, key_col)
         .withColumn("_w", w_guarded)
         .withColumn("_ord", ord_col)
         .withColumn("_salt", F.pmod(F.col("_ord"), F.lit(n_salts))))
    w1 = (Window.partitionBy(key_col, "_salt").orderBy("_ord", id_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    walked = t.withColumn("_c1", F.sum("_w").over(w1))
    pos = F.struct(F.col("_ord"), F.col(id_col))
    cut = (walked.filter(F.col("_c1") > F.col("_budget"))
           .groupBy(key_col).agg(F.min(pos).alias("_cut")))
    survivors = (walked.filter(F.col("_c1") <= F.col("_budget"))
                 .join(F.broadcast(cut), key_col, "left")
                 .filter(F.col("_cut").isNull() | (pos < F.col("_cut"))))
    w2 = (Window.partitionBy(key_col).orderBy("_ord", id_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    return (survivors.withColumn("cum_tokens",
                                 F.sum("_w").over(w2).cast("long"))
            .filter(F.col("cum_tokens") <= F.col("_budget"))
            .drop("_w", "_ord", "_salt", "_c1", "_cut", "_budget"))


def cap_tokens_per_key_sql(src: str, key_col: str, budgets_sql: str,
                           weight_expr: str, id_col: str, seed: int = 1,
                           cols: str = "*") -> str:
    """Single-window twin of :func:`cap_tokens_per_key` (the two-phase
    plan is exact, so the plain cumulative form is the oracle).
    ``budgets_sql`` must select (key, allocated_tokens)."""
    ord_sql = md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    return f"""
WITH budgets AS ({budgets_sql}),
walked AS (
  SELECT s.*, b.allocated_tokens AS _budget,
         CAST(sum({weight_expr}) OVER (
             PARTITION BY s.{key_col} ORDER BY {ord_sql}, s.{id_col}
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM {src} s JOIN budgets b ON b.{key_col} = s.{key_col})
SELECT {cols}, cum_tokens FROM walked WHERE cum_tokens <= _budget
"""


def neyman_allocation(df: DataFrame, strata_col: str, value_col: str,
                      n_total: int = 1000) -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a survey
    budget of ``n_total`` draws, allocate to each stratum
    ``n_h ∝ N_h·σ_h`` (Neyman 1934) — the allocation that minimizes the
    variance of the stratified mean estimator, the design step that
    runs BEFORE :func:`stratified_hash_sample` decides per-stratum
    rates. High-variance strata (diverse web text) get more budget
    than uniform ones (boilerplate-heavy crawls) of the same size.

    Exactness across engines: ``value_col`` must be integral, so the
    un-normalized variance ``D_h = n_h·Σx² − (Σx)²`` is an EXACT
    integer (decimal-38 sums — no float accumulation), and
    ``N_h·σ_h = √D_h``. IEEE sqrt is correctly rounded (unlike ln), so
    both engines produce the bit-identical double, floored to milli
    units (``w_milli``). Seats are the largest-remainder method on the
    integer weights: base ``n_total·w_h div W``, leftovers by
    remainder rank (ties by stratum) — pure integer arithmetic, so the
    allocation is engine-identical. Zero-variance strata weigh 0 (their
    mean is known from any single draw — the Neyman limit).

    Scale shape: one map-side-combined aggregation to |strata| rows;
    the rank/remainder windows run on the strata frame (metadata
    scale — documented single-partition allowlist), and the corpus is
    read once and never shuffled."""
    if n_total < 0:
        raise ValueError(f"n_total {n_total} must be >= 0")
    from pyspark.sql import Window
    x = F.col(value_col).cast("decimal(38,0)")
    st = (df.groupBy(F.col(strata_col).alias("stratum"))
          .agg(F.count("*").cast("decimal(38,0)").alias("n"),
               F.sum(x).alias("sx"),
               F.sum(x * x).alias("sxx")))
    d_h = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    st = st.withColumn(
        "w_milli",
        F.floor(F.sqrt(F.greatest(d_h, F.lit(0)).cast("double"))
                * 1000).cast("long"))
    tot = st.agg(F.sum("w_milli").cast("long").alias("_wt"))
    seats = (st.crossJoin(F.broadcast(tot))
             .withColumn("base", F.expr(
                 f"CASE WHEN _wt = 0 THEN 0 "
                 f"ELSE {n_total} * w_milli div _wt END").cast("long"))
             .withColumn("rem", F.expr(
                 f"CASE WHEN _wt = 0 THEN 0 "
                 f"ELSE ({n_total} * w_milli) % _wt END").cast("long")))
    w_rank = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    return (seats
            .withColumn("_left", F.lit(n_total) - F.sum("base").over(w_all))
            .withColumn("_rk", F.row_number().over(w_rank))
            .select("stratum", F.col("n").cast("long").alias("n_rows"),
                    "w_milli",
                    (F.col("base") + F.when(
                        (F.col("rem") > 0) & (F.col("_rk") <= F.col("_left")),
                        1).otherwise(0)).cast("long").alias("alloc"))
            .orderBy("stratum"))


def neyman_allocation_sql(src: str, strata_col: str, value_col: str,
                          n_total: int = 1000) -> str:
    """DuckDB twin of :func:`neyman_allocation` — HUGEINT sums keep
    ``D_h`` exact; the same milli-floor, base/remainder and
    largest-remainder rank."""
    return f"""
WITH st AS (
  SELECT {strata_col} AS stratum, count(*) AS n,
         sum(CAST({value_col} AS HUGEINT)) AS sx,
         sum(CAST({value_col} AS HUGEINT)
             * CAST({value_col} AS HUGEINT)) AS sxx
  FROM {src} GROUP BY {strata_col}),
w AS (
  SELECT stratum, n,
         CAST(floor(sqrt(CAST(greatest(n * sxx - sx * sx, 0) AS DOUBLE))
                    * 1000) AS BIGINT) AS w_milli
  FROM st),
seats AS (
  SELECT *,
         CAST(CASE WHEN sum(w_milli) OVER () = 0 THEN 0
              ELSE {n_total} * w_milli // sum(w_milli) OVER ()
              END AS BIGINT) AS base,
         CAST(CASE WHEN sum(w_milli) OVER () = 0 THEN 0
              ELSE ({n_total} * w_milli) % (sum(w_milli) OVER ())
              END AS BIGINT) AS rem
  FROM w)
SELECT stratum, CAST(n AS BIGINT) AS n_rows, w_milli,
       CAST(base + CASE WHEN rem > 0 AND
              row_number() OVER (ORDER BY rem DESC, stratum)
                <= {n_total} - sum(base) OVER ()
            THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM seats ORDER BY stratum
"""


def _poisson1_thresholds(universe: int) -> list[int]:
    """Inverse-CDF cut points of Poisson(1) scaled to the integer hash
    universe, capped at weight 7 (P(X>7) < 1e-8). Computed driver-side
    with exact doubles and embedded as integer literals, so BOTH
    engines compare the identical thresholds — the constant-folding
    discipline from the LSH family."""
    from math import exp, factorial
    cdf, acc = [], 0.0
    for k in range(8):
        acc += exp(-1.0) / factorial(k)
        cdf.append(min(acc, 1.0))
    return [int(c * universe) for c in cdf]


def bootstrap_mean_ci(df: DataFrame, by: str, value_col: str,
                      id_col: str = "doc_id", n_replicas: int = 32,
                      lo_pct: int = 5, hi_pct: int = 95,
                      seed: int = 11) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group mean —
    the error bar a mixing/curation decision should carry before
    trusting a per-source statistic. The classic with-replacement
    bootstrap needs each group resident in one place; the POISSON
    bootstrap (replica weight ~ Poisson(1) per row, independent across
    rows) is its distributed form: every replica's weighted mean folds
    map-side in ONE corpus pass — no resampling shuffle, no driver
    state.

    Determinism (both engines, any partitioning): the (row, replica)
    weight is the inverse-CDF of Poisson(1) applied to the universal
    hash ``(a_r·x + b_r) mod p`` of the row's ``id_col`` — ONE md5 per
    row, ``n_replicas`` integer hashes derived from it (the
    minhash-params discipline) compared against integer thresholds
    embedded as literals (:func:`_poisson1_thresholds`). Replica means
    are exact-integer milli divisions; CI bounds are exact lower
    (type-1) quantiles of the replica means — no float anywhere.

    Output per group: (``by``, n_rows, mean_milli, ci_lo_milli,
    ci_hi_milli, n_replicas_used); replicas with total weight 0
    (possible only for tiny groups) drop out of ``n_replicas_used``.

    Scale shape: the replica explode is a codegen-inline generator
    over literal (slot, a, b) structs — never materialized; the only
    corpus-scale shuffle is the map-side-combined
    groupBy(group, replica) collapsing to |groups|·n_replicas rows;
    the quantile folds run on n_replicas-row partitions."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        MINHASH_P, minhash_params)
    if not 0 < lo_pct <= hi_pct <= 100:
        raise ValueError("need 0 < lo_pct <= hi_pct <= 100")
    cuts = _poisson1_thresholds(MINHASH_P)
    params = minhash_params(n_replicas)
    x = F.pmod(md5_long(F.col("id").cast("string"), seed=seed),
               F.lit(1 << 30))
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("long").alias("v"),
                     F.col(id_col).alias("id")) \
        .select("g", "v", x.alias("x"))
    # slot r = −1 is the POINT estimate riding the same pass with
    # weight 1 (u = sentinel below every threshold +1 trick handled in
    # the weight expression) — one corpus scan serves the point mean,
    # the row count, and every replica
    slots = F.array(
        F.struct(F.lit(-1).alias("r"), F.lit(0).alias("u")),
        *[F.struct(F.lit(r).alias("r"),
                   ((F.col("x") * a + b) % MINHASH_P).alias("u"))
          for r, (a, b) in enumerate(params)])
    pw = sum((F.col("s.u") >= c).cast("long") for c in cuts[:-1])
    w = F.when(F.col("s.r") == -1, F.lit(1)).otherwise(pw)
    rep = (base.select("g", "v", F.explode(slots).alias("s"))
           .select("g", F.col("s.r").alias("r"), "v", w.alias("w"))
           .groupBy("g", "r")
           .agg(F.sum(F.col("w") * F.col("v")).cast("long").alias("sv"),
                F.sum("w").cast("long").alias("sw"))
           .filter(F.col("sw") > 0)
           .select("g", "r", "sw",
                   F.expr("1000 * sv div sw").cast("long").alias("m")))
    # rep is |groups|·(replicas+1) rows feeding four branches — freeze
    # it so the corpus explode runs exactly once
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    rep = checkpoint_df(rep, eager=False)
    from pyspark.sql import Window
    boot = rep.filter(F.col("r") >= 0).select("g", "m")
    ww = Window.partitionBy("g").orderBy("m")
    cum = boot.withColumn("_rk", F.row_number().over(ww))
    tot = boot.groupBy("g").agg(F.count("*").cast("long").alias("_b"))
    qs = (cum.join(F.broadcast(tot), "g")
          .groupBy("g")
          .agg(F.max("_b").alias("n_replicas_used"),
               F.min(F.when(
                   F.col("_rk") >= F.expr(
                       f"(_b * {lo_pct} + 99) div 100"),
                   F.col("m"))).cast("long").alias("ci_lo_milli"),
               F.min(F.when(
                   F.col("_rk") >= F.expr(
                       f"(_b * {hi_pct} + 99) div 100"),
                   F.col("m"))).cast("long").alias("ci_hi_milli")))
    point = (rep.filter(F.col("r") == -1)
             .select("g", F.col("sw").alias("n_rows"),
                     F.col("m").alias("mean_milli")))
    return (point.join(qs, "g")
            .select(F.col("g").alias(by), "n_rows", "mean_milli",
                    "ci_lo_milli", "ci_hi_milli",
                    F.col("n_replicas_used").cast("long")
                    .alias("n_replicas_used"))
            .orderBy(by))


def bootstrap_mean_ci_sql(src: str, by: str, value_col: str,
                          id_col: str = "doc_id", n_replicas: int = 32,
                          lo_pct: int = 5, hi_pct: int = 95,
                          seed: int = 11) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci` — identical hash
    family, Poisson thresholds, integer milli means and type-1
    quantile folds."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        MINHASH_P, minhash_params)
    cuts = _poisson1_thresholds(MINHASH_P)
    params = minhash_params(n_replicas)
    h = md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    arms = " UNION ALL ".join(
        f"SELECT g, v, {r} AS r, ((x * {a} + {b}) % {MINHASH_P}) AS u "
        f"FROM base" for r, (a, b) in enumerate(params))
    wexpr = " + ".join(
        f"CASE WHEN u >= {c} THEN 1 ELSE 0 END" for c in cuts[:-1])
    return f"""
WITH base AS (
  SELECT {by} AS g, CAST({value_col} AS BIGINT) AS v,
         ({h}) % {1 << 30} AS x
  FROM {src}),
slots AS ({arms}),
rep AS (
  SELECT g, r, CAST(1000 * sum(({wexpr}) * v)
                    // sum({wexpr}) AS BIGINT) AS m
  FROM slots GROUP BY g, r
  HAVING sum({wexpr}) > 0),
ranked AS (
  SELECT g, m, row_number() OVER (PARTITION BY g ORDER BY m) AS rk,
         count(*) OVER (PARTITION BY g) AS b
  FROM rep),
qs AS (
  SELECT g, CAST(max(b) AS BIGINT) AS n_replicas_used,
         CAST(min(CASE WHEN rk >= (b * {lo_pct} + 99) // 100
                       THEN m END) AS BIGINT) AS ci_lo_milli,
         CAST(min(CASE WHEN rk >= (b * {hi_pct} + 99) // 100
                       THEN m END) AS BIGINT) AS ci_hi_milli
  FROM ranked GROUP BY g),
point AS (
  SELECT {by} AS g, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(1000 * sum(CAST({value_col} AS BIGINT))
              // count(*) AS BIGINT) AS mean_milli
  FROM {src} GROUP BY {by})
SELECT p.g AS {by}, p.n_rows, p.mean_milli,
       q.ci_lo_milli, q.ci_hi_milli, q.n_replicas_used
FROM point p JOIN qs q USING (g)
ORDER BY {by}
"""

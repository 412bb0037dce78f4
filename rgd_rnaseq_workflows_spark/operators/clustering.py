"""Distributed k-means over embedding columns + SemDeDup-style semantic
deduplication (cluster, then drop near-identical members per cluster).

Extends the engine's LLM-data-pipeline surface (the reference has no
vector ops; its numeric kernels are external binaries — SURVEY §7). The
design follows the classic Spark/MLlib k-means shape: centroids are
driver-side metadata (k×dims values, scalar scale — the same "collect
only metadata" rule the component loop follows), every per-row pass is
executor-side.

Cross-engine exactness: all distance comparisons are computed from
fixed-point integers (``round(x * SCALE)`` as int64 — exact for float32
inputs since the double product carries ≤38 mantissa bits). A centroid
is kept as (sum-vector, count) of exact ints, and the argmin compares
``Σ(xi·n_c − s_c)² / n_c²``: the numerator is exact int64 arithmetic,
identical in Spark, numpy and the DuckDB oracle; the single int→double
cast + division is IEEE-deterministic. Bounds: |x|≤1, SCALE=1e4,
n≤2e4 rows/cluster keeps the summed numerator < 2^62 (documented at
the call site; a 100 TB deployment re-derives SCALE from its norm
bound or moves to DecimalType).

Rounding parity: Spark ``round`` and DuckDB ``round`` are
half-away-from-zero; numpy's ``rint`` is half-even, so the kernel
emulates half-away with ``floor(|a| + 0.5)·sign(a)`` — exact here
because a has ≤38 mantissa bits and |a| < 2^14, so a+0.5 and the floor
are both representable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 10_000


@dataclass(frozen=True)
class Centroid:
    """Exact-integer centroid: element-wise sum vector + member count.
    The mean is ``s/(n·SCALE)`` but is never materialized as a float —
    distances compare scaled integer numerators instead."""
    cid: int
    s: tuple[int, ...]
    n: int


def _int_vec(vec_col: Column | str) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.round(x.cast("double") * SCALE)
                       .cast("long"))


def _unit_int_vec(vec_col: Column | str) -> Column:
    """Spherical form: normalize to the unit sphere, then fix-point.
    Exactness chain (identical in SQL and numpy): raw ints
    ``xi = round(x·SCALE)`` are exact; ``ss = Σxi²`` is exact int64;
    the unit component is ``round(xi·SCALE / √ss)`` — every input an
    exactly-represented double, so sqrt/divide/round are one IEEE
    rounding each, bit-identical on every engine. L2 over unit vectors
    is monotone in cosine (‖a−b‖² = 2−2cosθ), so this makes the k-means
    spherical — the geometry SemDeDup and embedding dedup actually use.
    Bound: |unit int| ≤ SCALE ⇒ distance numerators stay inside int64
    while cluster size n < √(2^63/(dims·SCALE²)) ≈ 3.8e4 at dims=64 —
    beyond that, lower SCALE or sub-shard clusters."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    xi = F.transform(c, lambda x: F.round(x.cast("double") * SCALE)
                     .cast("long"))
    ss = F.aggregate(xi, F.lit(0).cast("long"),
                     lambda acc, v: acc + v * v)
    safe = F.greatest(ss, F.lit(1).cast("long"))
    return F.transform(
        xi, lambda v: F.round(v.cast("double") * SCALE
                              / F.sqrt(safe.cast("double"))).cast("long"))


def _round_half_away(a: np.ndarray) -> np.ndarray:
    return (np.floor(np.abs(a) + 0.5) * np.sign(a)).astype(np.int64)


def _unit_int_np(V: np.ndarray) -> np.ndarray:
    """Batch unit-int vectors (numpy twin of :func:`_unit_int_vec` —
    bit-identical by the module's exactness contract)."""
    XI = _round_half_away(V.astype(np.float64, copy=False) * SCALE)
    SS = np.maximum((XI * XI).sum(axis=1), 1)
    return _round_half_away(XI.astype(np.float64) * SCALE
                            / np.sqrt(SS.astype(np.float64))[:, None])


def unit_int_kernel():
    """Arrow kernel: embedding → unit-int vector. The Column form
    (:func:`_unit_int_vec`) nests an ``aggregate`` HOF inside a
    ``transform`` lambda; Catalyst inlines the aggregate into the
    per-element lambda body, so the interpreted evaluation is O(dims³)
    per row — measured 3.3 s for 2000×64 at sf0.1 vs 0.1 s vectorized.
    Corpus-scale passes (update/summary explodes) use this kernel; the
    Column form remains for metadata-scale sites (k-row seed collect)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def unit_ints(vecs: pd.Series) -> pd.Series:
        U = _unit_int_np(np.stack(vecs.to_numpy()))
        return pd.Series(list(U))

    return unit_ints


def assign_kernel(centroids: list[Centroid]):
    """Vectorized Arrow assignment: nearest centroid by exact-int squared
    distance numerator (ties → smallest cluster id, via strict ``<``)."""
    from pyspark.sql.functions import pandas_udf

    cents = sorted(centroids, key=lambda c: c.cid)
    S = [np.asarray(c.s, dtype=np.int64) for c in cents]
    N = [c.n for c in cents]
    IDS = [c.cid for c in cents]

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        XI = _unit_int_np(np.stack(vecs.to_numpy()))
        best = np.full(len(XI), -1, dtype=np.int64)
        bestd = np.full(len(XI), np.inf)
        for c in range(len(N)):
            num = ((XI * N[c] - S[c]) ** 2).sum(axis=1)  # exact int64
            d = num.astype(np.float64) / (N[c] * N[c])
            take = d < bestd
            best[take] = IDS[c]
            bestd[take] = d[take]
        return pd.Series(best)

    return assign


def assign_topn_kernel(centroids: list[Centroid], nprobe: int):
    """Vectorized Arrow top-``nprobe`` assignment: the ``nprobe``
    nearest centroids per vector, ordered by (exact-int distance
    numerator / n², then cluster id) — the IVF probe set for a
    multi-list candidate search. Tie discipline matches
    :func:`assign_kernel` and the SQL rank (stable argsort over
    ascending cluster ids)."""
    from pyspark.sql.functions import pandas_udf

    cents = sorted(centroids, key=lambda c: c.cid)
    S = [np.asarray(c.s, dtype=np.int64) for c in cents]
    N = [c.n for c in cents]
    IDS = np.asarray([c.cid for c in cents], dtype=np.int64)
    n_take = min(nprobe, len(cents))

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        XI = _unit_int_np(np.stack(vecs.to_numpy()))
        D = np.stack(
            [((XI * N[c] - S[c]) ** 2).sum(axis=1).astype(np.float64)
             / (N[c] * N[c]) for c in range(len(N))], axis=1)
        order = np.argsort(D, axis=1, kind="stable")[:, :n_take]
        return pd.Series([IDS[row].tolist() for row in order])

    return assign


def init_centroids(emb: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[Centroid]:
    """Deterministic seed: the k vectors with the smallest ids, each a
    singleton centroid (sum=vector, n=1). Model-free — any engine
    reproduces the same seed from the data alone."""
    rows = (emb.orderBy(id_col).limit(k)
            .select(_unit_int_vec(vec_col).alias("iv")).collect())
    return [Centroid(cid=i, s=tuple(r.iv), n=1) for i, r in enumerate(rows)]


def update_centroids(assigned: DataFrame, vec_col: str = "embedding",
                     cluster_col: str = "cluster") -> list[Centroid]:
    """One Lloyd update: exact int sums per (cluster, dim) via posexplode
    + map-side-combined groupBy (shuffle reduces to k×dims rows), then a
    k×dims collect — driver-side metadata, same scale class as the
    component loop's convergence scalar. Empty clusters vanish (matching
    the SQL twin, where an absent cluster simply has no centroid row)."""
    e = assigned.select(F.col(cluster_col).alias("c"),
                        F.posexplode(unit_int_kernel()(F.col(vec_col)))
                        .alias("d", "xi"))
    rows = (e.groupBy("c", "d")
            .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
            .collect())
    by_c: dict[int, dict[int, int]] = {}
    n_c: dict[int, int] = {}
    for r in rows:
        by_c.setdefault(r.c, {})[r.d] = r.s
        n_c[r.c] = r.n
    out = []
    for cid in sorted(by_c):
        dims = by_c[cid]
        out.append(Centroid(cid=cid,
                            s=tuple(dims[d] for d in range(len(dims))),
                            n=n_c[cid]))
    return out


def kmeans_fit(emb: DataFrame, k: int = 10, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               persist: bool = True) -> tuple[DataFrame, list[Centroid]]:
    """``iters`` assignment passes with ``iters−1`` centroid updates
    between them (iters=2 ⇒ assign → update → assign). Returns (input
    with a ``cluster`` column, the centroids the final assignment used)
    — the centroid list is what an IVF probe scores a query against.

    The returned assignment frame is ``persist()``-ed (MEMORY_AND_DISK:
    a 100 TB assignment spills rather than OOMs) because downstream
    consumers (summary's two aggs, semdedup's a×b pair join, an IVF
    probe) branch it 2-4× and the Arrow assign kernel should run ONCE
    per row. **The caller owns the cache**: call ``.unpersist()`` on the
    returned frame once its branches are consumed, or pass
    ``persist=False`` to keep the lineage lazy. (Dropping every
    reference also works eventually — the ContextCleaner unpersists
    GC'd frames — but long-lived sessions issuing many fits should
    unpersist explicitly.)"""
    cents = init_centroids(emb, k, id_col, vec_col)
    assigned = emb.withColumn("cluster", assign_kernel(cents)(F.col(vec_col)))
    for _ in range(iters - 1):
        cents = update_centroids(assigned, vec_col)
        assigned = emb.withColumn("cluster",
                                  assign_kernel(cents)(F.col(vec_col)))
    return (assigned.persist() if persist else assigned), cents


def kmeans_assign(emb: DataFrame, k: int = 10, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  persist: bool = True) -> DataFrame:
    return kmeans_fit(emb, k, iters, id_col, vec_col, persist=persist)[0]


def kmeans_summary(assigned: DataFrame, label_col: str = "label",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-cluster summary: size, exact-int centroid norm, majority
    label. ``centroid_norm = √(Σ_d s_d²)/(n·SCALE)`` — Σs² is exact
    int64 on every engine; one sqrt + one division are IEEE-identical."""
    e = assigned.select("cluster",
                        F.posexplode(unit_int_kernel()(F.col(vec_col)))
                        .alias("d", "xi"))
    per_cd = e.groupBy("cluster", "d").agg(F.sum("xi").alias("s"),
                                           F.count("*").alias("n"))
    norms = (per_cd.groupBy("cluster")
             .agg(F.sum(F.col("s") * F.col("s")).alias("ss"),
                  F.first("n").alias("n_members"))
             .select("cluster", "n_members",
                     F.round(F.sqrt(F.col("ss").cast("double"))
                             / (F.col("n_members") * SCALE), 6)
                     .alias("centroid_norm")))
    from pyspark.sql import Window
    w = Window.partitionBy("cluster").orderBy(F.desc("n_lab"), label_col)
    top = (assigned.groupBy("cluster", label_col)
           .agg(F.count("*").alias("n_lab"))
           .withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1)
           .select("cluster", F.col(label_col).alias("top_label"),
                   F.col("n_lab").alias("top_label_n")))
    return norms.join(top, "cluster")


def semdedup(emb: DataFrame, k: int = 10, iters: int = 2,
             threshold: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023 shape): k-means cluster, then within
    each cluster drop every member that has a smaller-id near-neighbor
    (cosine ≥ threshold). The pair join is cluster-blocked equi — never
    cross; the keeper rule is a deterministic anti-join, no component
    loop. Returns per-cluster (n_members, n_dropped, n_kept)."""
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        embedding_near_dup)
    assigned = kmeans_assign(emb, k, iters, id_col, vec_col)
    pairs = embedding_near_dup(assigned, block_col="cluster", id_col=id_col,
                               vec_col=vec_col, threshold=threshold)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (assigned.join(dropped.withColumn("_drop", F.lit(1)),
                          id_col, "left")
            .groupBy("cluster")
            .agg(F.count("*").alias("n_members"),
                 F.sum(F.when(F.col("_drop").isNotNull(), 1).otherwise(0))
                 .cast("long").alias("n_dropped"))
            .withColumn("n_kept",
                        (F.col("n_members") - F.col("n_dropped"))
                        .cast("long")))


# --- oracle SQL builders ------------------------------------------------------

def kmeans_assign_cte(k: int = 10, iters: int = 2,
                      table: str = "embeddings",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      prefix: str = "") -> str:
    """CTE chain ending in ``{prefix}af`` (vec_id, c) = the final
    assignment — the Lloyd unrolling of :func:`kmeans_assign` in
    exact-int SQL. ``prefix`` namespaces every CTE name at generation
    time so two chains (e.g. IVF's coarse k-means next to the PQ
    codebook chain) can coexist in one WITH clause without collisions —
    callers must never rename by post-hoc regex, which would also
    rewrite matching tokens inside literals or aliases."""
    p = prefix
    pts = f"""{p}raw AS (
  SELECT {id_col} AS vec_id, d, CAST(round(x * {SCALE}) AS BIGINT) AS xi
  FROM (SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS x,
               generate_subscripts({vec_col}, 1) AS d FROM {table})),
{p}nrm AS (SELECT vec_id, CAST(sum(xi * xi) AS BIGINT) AS ss
        FROM {p}raw GROUP BY vec_id),
{p}pts AS (
  SELECT r.vec_id, r.d,
         CAST(round(CAST(r.xi AS DOUBLE) * {SCALE}
              / sqrt(CAST(greatest(n.ss, 1) AS DOUBLE))) AS BIGINT) AS xi
  FROM {p}raw r JOIN {p}nrm n USING (vec_id)),
{p}seed_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
  FROM (SELECT {id_col} AS vec_id FROM {table} ORDER BY {id_col} LIMIT {k})),
{p}c0 AS (
  SELECT s.c, p.d, p.xi AS s, CAST(1 AS BIGINT) AS n
  FROM {p}pts p JOIN {p}seed_ids s USING (vec_id))"""
    chain = [pts]
    prev_c = f"{p}c0"
    for it in range(1, iters + 1):
        chain.append(f"""{p}d{it} AS (
  SELECT p.vec_id, c.c,
         CAST(sum((p.xi * c.n - c.s) * (p.xi * c.n - c.s)) AS BIGINT) AS num,
         c.n
  FROM {p}pts p JOIN {prev_c} c USING (d)
  GROUP BY p.vec_id, c.c, c.n),
{p}a{it} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, row_number() OVER (
      PARTITION BY vec_id
      ORDER BY CAST(num AS DOUBLE) / (n * n), c) AS rk
    FROM {p}d{it})
  WHERE rk = 1)""")
        if it < iters:
            chain.append(f"""{p}c{it} AS (
  SELECT a.c, p.d, CAST(sum(p.xi) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM {p}pts p JOIN {p}a{it} a USING (vec_id)
  GROUP BY a.c, p.d)""")
            prev_c = f"{p}c{it}"
    chain.append(f"{p}af AS (SELECT vec_id, c FROM {p}a{iters})")
    return ",\n".join(chain)


def label_silhouette_report(emb: DataFrame, label_col: str = "label",
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Partition-quality eval for a LABEL column in embedding space —
    the simplified silhouette (Hruschka et al. 2004: distances to
    CENTROIDS, not all pairs, so it runs at corpus scale): per point,
    a = distance to its own label's centroid, b = distance to the
    nearest OTHER label's centroid, s = (b−a)/max(a,b) ∈ [−1, 1].
    High mean s ⇒ the labels carve real structure (safe to stratify /
    train on); s < 0 points sit closer to a foreign centroid — the
    misplaced count is the label-noise estimate a curation pass reads
    before trusting a classifier's labels at 100 TB.

    Exactness: unit-int vectors (the module's fixed-point contract);
    centroid components are the trunc-division ``Σxi div n`` (signed
    trunc is engine-identical — verified both engines truncate toward
    zero); squared distances are exact int64 sums; a and b are one
    IEEE sqrt each of exact integers, s is one rounded micro division;
    per-label means are integer sums div counts. Singleton labels get
    a = 0 ⇒ s = 10⁶ (the simplified-silhouette convention, documented
    divergence from the classic s=0); a single-label input has no
    foreign centroid and reports s = 0.

    Scale shape: one corpus pass for unit-int vectors; centroids via
    ONE posexplode aggregation (shuffle reduces to |labels|·dims rows,
    map-side combined); the distance pass is a BROADCAST cross join
    against the |labels|-row centroid-array frame with the zip_with
    fold inside codegen — the corpus is never re-shuffled and no
    point pair is ever formed. Bound: |xi| ≤ SCALE ⇒ d² ≤
    dims·(2·SCALE)² ≈ 2.6e10 at dims=64 — int64-safe at any corpus
    size (per-point quantities only)."""
    kern = unit_int_kernel()
    pts = emb.select(F.col(id_col).alias("id"),
                     F.col(label_col).alias("lab"),
                     kern(F.col(vec_col)).alias("xi"))
    e = pts.select("lab", F.posexplode("xi").alias("d", "v"))
    cent = (e.groupBy("lab", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .select("lab", "d", F.expr("s div n").alias("m")))
    carr = (cent.groupBy("lab")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m")))
                 .alias("dm"))
            .select(F.col("lab").alias("clab"),
                    F.transform("dm", lambda x: x["m"]).alias("cv")))
    d2 = F.aggregate(
        F.zip_with("xi", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    j = (pts.crossJoin(F.broadcast(carr))
         .select("id", "lab", "clab", d2.alias("d2")))
    per = (j.groupBy("id", "lab")
           .agg(F.max(F.when(F.col("lab") == F.col("clab"),
                             F.col("d2"))).alias("a2"),
                F.min(F.when(F.col("lab") != F.col("clab"),
                             F.col("d2"))).alias("b2")))
    a = F.sqrt(F.col("a2").cast("double"))
    b = F.sqrt(F.col("b2").cast("double"))
    s_ppm = (F.when(F.col("b2").isNull(), F.lit(0))
             .when(F.greatest(F.col("a2"), F.col("b2")) == 0, F.lit(0))
             .otherwise(F.round(F.lit(1e6) * (b - a)
                                / F.greatest(a, b)))).cast("long")
    mis = (F.col("b2").isNotNull()
           & (F.col("b2") < F.col("a2"))).cast("long")
    return (per.select("lab", s_ppm.alias("s"), mis.alias("mis"))
            .groupBy("lab")
            .agg(F.count("*").cast("long").alias("n_points"),
                 F.sum("mis").cast("long").alias("n_misplaced"),
                 F.expr("sum(s) div count(*)").cast("long")
                 .alias("mean_silhouette_ppm"))
            .select(F.col("lab").alias(label_col), "n_points",
                    "n_misplaced", "mean_silhouette_ppm")
            .orderBy(label_col))


def label_silhouette_sql(table: str = "embeddings",
                         label_col: str = "label",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`label_silhouette_report` — identical
    unit-int vectors, trunc-division centroids, exact d², one sqrt."""
    return f"""
WITH raw AS (
  SELECT {id_col} AS id, lab, d, CAST(round(x * {SCALE}) AS BIGINT) AS xi
  FROM (SELECT {id_col}, {label_col} AS lab,
               unnest(CAST({vec_col} AS DOUBLE[])) AS x,
               generate_subscripts({vec_col}, 1) AS d FROM {table})),
nrm AS (SELECT id, CAST(sum(xi * xi) AS BIGINT) AS ss
        FROM raw GROUP BY id),
pts AS (
  SELECT r.id, r.lab, r.d,
         CAST(round(CAST(r.xi AS DOUBLE) * {SCALE}
              / sqrt(CAST(greatest(n.ss, 1) AS DOUBLE))) AS BIGINT) AS xi
  FROM raw r JOIN nrm n USING (id)),
cent AS (
  SELECT lab AS clab, d, CAST(sum(xi) // count(*) AS BIGINT) AS m
  FROM pts GROUP BY lab, d),
d2 AS (
  SELECT p.id, p.lab, c.clab,
         CAST(sum((p.xi - c.m) * (p.xi - c.m)) AS BIGINT) AS d2
  FROM pts p JOIN cent c USING (d)
  GROUP BY p.id, p.lab, c.clab),
per AS (
  SELECT id, lab,
         max(CASE WHEN lab = clab THEN d2 END) AS a2,
         min(CASE WHEN lab <> clab THEN d2 END) AS b2
  FROM d2 GROUP BY id, lab),
sil AS (
  SELECT lab,
         CASE WHEN b2 IS NULL THEN 0
              WHEN greatest(a2, b2) = 0 THEN 0
              ELSE CAST(round(1e6 * (sqrt(CAST(b2 AS DOUBLE))
                                     - sqrt(CAST(a2 AS DOUBLE)))
                   / greatest(sqrt(CAST(a2 AS DOUBLE)),
                              sqrt(CAST(b2 AS DOUBLE)))) AS BIGINT)
         END AS s,
         CASE WHEN b2 IS NOT NULL AND b2 < a2 THEN 1 ELSE 0 END AS mis
  FROM per)
SELECT lab AS {label_col}, CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(mis) AS BIGINT) AS n_misplaced,
       CAST(sum(s) // count(*) AS BIGINT) AS mean_silhouette_ppm
FROM sil GROUP BY lab ORDER BY lab
"""

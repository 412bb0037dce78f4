"""Distributed PCA over embedding columns, exact where it must be.

Principal components power the heavy hitters of embedding-scale data
work — whitening before clustering, dimensionality reduction before
ANN indexing (the OPQ rotation's little sibling), and drift
diagnostics ("which direction did the corpus move"). The scale
decomposition is classic: a d-dimensional PCA needs only the
d×d SECOND-MOMENT (scatter) matrix plus the mean vector — O(d²)
driver metadata — no matter how many rows contributed, so 100 TB of
vectors collapses into one mergeable aggregation, and the
eigendecomposition of the tiny d×d matrix runs driver-side (the same
sufficient-statistic discipline as the k-means centroids, HLL
registers and BPE vocabulary: the corpus never leaves the cluster,
the STATISTICS do).

Exactness: float sums are order-dependent, so the scatter entries are
accumulated as fix-point int64 — ``xi = round(x·SCALE)`` (the
clustering.py convention, half-away rounding proven bit-identical
across Spark/DuckDB/numpy in that module) and
``g_ij = Σ xi·xj`` exactly. Per-batch partials come from an Arrow
kernel computing an integer XᵀX GEMM (the measured ~30× win over
interpreted HOF folds — clustering.py precedent); a JVM posexplode
aggregation supplies the exact per-dim sums and count. Headroom:
|xi| ≤ SCALE for unit-ish embeddings ⇒ |xi·xj| ≤ 1e8 ⇒ int64 holds
~9e10 contributing rows per (i,j); past that, raise to DecimalType at
the same call sites (the drift-monitor precedent).

The driver-side eigen step (``pca_fit``) and the projection kernel
(``pca_project``) are numpy; the registry query exposes the scatter
matrix itself — every entry an exact integer, value-oracled against a
DuckDB double-unnest twin.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.clustering import (
    SCALE, _round_half_away)


def scatter_matrix(vecs: DataFrame, vec_col: str = "embedding",
                   dims: int = 64) -> DataFrame:
    """Upper-triangle exact second moments: one row per dimension pair
    ``i ≤ j`` — (i, j, n, s_i, s_j, g_ij) with
    ``g_ij = Σ round(x_i·SCALE)·round(x_j·SCALE)`` (exact int64),
    ``s_i`` the per-dim fix-point sums and ``n`` the row count.

    Plan shape: ONE corpus pass — an Arrow kernel folds each batch into
    a d(d+1)/2-row integer XᵀX partial plus d moment rows (tagged
    j = −1) and one count row (i = j = −1), so the corpus crosses the
    Python boundary once and is scanned once; a single hash aggregation
    merges all partials, and the d-row moment table broadcasts onto the
    pair grid. Output is O(d²) metadata."""
    schema = "i int, j int, g long"
    iu, ju = np.triu_indices(dims)

    def xtx(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy())
            XI = _round_half_away(X.astype(np.float64) * SCALE)
            G = XI.T @ XI          # exact int64 within documented bounds
            i = np.concatenate([iu, np.arange(dims), [-1]]).astype("int32")
            j = np.concatenate([ju, np.full(dims, -1), [-1]]).astype("int32")
            g = np.concatenate([G[iu, ju], XI.sum(axis=0),
                                [len(XI)]]).astype("int64")
            yield pd.DataFrame({"i": i, "j": j, "g": g})

    raw = (vecs.select(vec_col).mapInPandas(xtx, schema=schema)
           .groupBy("i", "j").agg(F.sum("g").alias("g")))
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    raw = checkpoint_df(raw, eager=False)   # O(d^2) rows; three readers
    pairs = (raw.filter(F.col("j") >= 0)
             .select("i", "j", F.col("g").alias("g_ij")))
    n_row = raw.filter(F.col("i") == -1).select(F.col("g").alias("n"))
    moments = (raw.filter((F.col("i") >= 0) & (F.col("j") == -1))
               .select(F.col("i").alias("dim"), F.col("g").alias("s"))
               .crossJoin(F.broadcast(n_row)))
    return (pairs
            .join(F.broadcast(moments.select(
                F.col("dim").alias("i"), F.col("s").alias("s_i"),
                "n")), "i")
            .join(F.broadcast(moments.select(
                F.col("dim").alias("j"), F.col("s").alias("s_j"))), "j")
            .select(F.col("i").cast("long").alias("i"),
                    F.col("j").cast("long").alias("j"),
                    "n", "s_i", "s_j", "g_ij"))


def scatter_matrix_sql(table: str, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`scatter_matrix` (identical fix-point
    rounding; the pair grid comes from a double positional unnest,
    re-paired on ``id_col`` — parquet views have no rowid)."""
    return f"""
WITH xi AS (
  SELECT {id_col} AS rid, CAST(i - 1 AS BIGINT) AS dim,
         CAST(round(CAST({vec_col}[i] AS DOUBLE) * {SCALE}) AS BIGINT)
           AS v
  FROM {table}, unnest(range(1, len({vec_col}) + 1)) AS r(i)),
moments AS (
  SELECT dim, CAST(sum(v) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM xi GROUP BY dim),
pairs AS (
  SELECT a.dim AS i, b.dim AS j, CAST(sum(a.v * b.v) AS BIGINT) AS g_ij
  FROM xi a JOIN xi b ON a.rid = b.rid AND a.dim <= b.dim
  GROUP BY a.dim, b.dim)
SELECT i, j, mi.n AS n, mi.s AS s_i, mj.s AS s_j, g_ij
FROM pairs JOIN moments mi ON mi.dim = i
           JOIN moments mj ON mj.dim = j"""


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,) in original embedding units
    components: np.ndarray    # (k, d) rows = principal axes, unit norm
    explained_var: np.ndarray        # (k,) eigenvalues, desc
    explained_var_ratio: np.ndarray  # (k,) fractions of total variance


def pca_fit(scatter: DataFrame, k: int = 8) -> PCAModel:
    """Driver-side eigendecomposition of the exact scatter matrix:
    covariance ``C = (G − s·sᵀ/n) / n`` reconstructed from the integer
    sufficient statistics (one float op per entry), top-``k`` axes by
    eigenvalue with a deterministic sign convention (largest-|coord|
    component positive). The collect is O(d²) metadata — the codebook/
    centroid precedent."""
    rows = scatter.collect()
    if not rows:
        raise ValueError("empty scatter matrix")
    d = max(r.j for r in rows) + 1
    n = rows[0].n
    G = np.zeros((d, d), dtype=np.float64)
    s = np.zeros(d, dtype=np.float64)
    for r in rows:
        G[r.i, r.j] = G[r.j, r.i] = float(r.g_ij)
        s[r.i] = float(r.s_i)
    C = (G - np.outer(s, s) / n) / n / (SCALE * SCALE)
    vals, vecs = np.linalg.eigh(C)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # deterministic sign: flip each axis so its largest-|.| coord is +
    flips = np.sign(comps[np.arange(len(order)),
                          np.abs(comps).argmax(axis=1)])
    flips[flips == 0] = 1.0
    comps = comps * flips[:, None]
    ev = np.maximum(vals[order], 0.0)
    total = float(np.sum(np.maximum(vals, 0.0))) or 1.0
    return PCAModel(mean=s / n / SCALE, components=comps,
                    explained_var=ev,
                    explained_var_ratio=ev / total)


def pca_project(vecs: DataFrame, model: PCAModel,
                vec_col: str = "embedding",
                out_col: str = "pc") -> DataFrame:
    """Append the centered top-k projection as ``array<double>`` via an
    Arrow kernel (components are a broadcast-scale numpy literal; the
    matmul is one BLAS call per batch)."""
    from pyspark.sql.functions import pandas_udf
    mean = model.mean
    W = model.components

    @pandas_udf("array<double>")
    def proj(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64)
        P = (X - mean) @ W.T
        return pd.Series(list(P))

    return vecs.withColumn(out_col, proj(F.col(vec_col)))


def isotropy_report(vecs: DataFrame, vec_col: str = "embedding",
                    dims: int = 64) -> DataFrame:
    """Embedding-space isotropy diagnostics from exact sufficient
    statistics — the "is this encoder collapsing?" gate an ANN /
    semdedup build should run before trusting cosine geometry at
    100 TB. Anisotropic spaces (all vectors crowded in a narrow cone,
    or energy piled on a few rogue dimensions) silently wreck cosine
    thresholds; the two standard symptoms are measured exactly:

    - ``avg_cos_bp`` — the Ethayarajh-style mean pairwise similarity
      proxy: Σ_{p≠q} <v_p, v_q> equals ‖Σv‖² − Σ‖v‖², so the all-pairs
      average needs only the per-dim fix-point SUM vector and the total
      squared norm — O(d) mergeable integers, no pair join ever;
    - ``max/min_dim_energy_bp`` — per-dimension second-moment share,
      the dimension-collapse detector (one rogue dim hoarding energy,
      or dead dims contributing none).

    Scale shape: ONE corpus pass — posexplode to (dim, fix-point
    value), a map-side-combined per-dim aggregation (d rows), then a
    d-row fold to a single metadata row; everything JVM-side, all
    integers until three final divisions. int64 headroom: per-dim
    ``Σ xi`` caps at SCALE·n and its square must hold — fine to ~9e5
    rows per unit of SCALE² (1e8), i.e. ~3e10 unit-norm rows; past
    that raise the three sum columns to DecimalType at these call
    sites (the drift-monitor precedent).
    """
    return isotropy_from_moments(isotropy_moments(vecs, vec_col))


def isotropy_moments(vecs: DataFrame,
                     vec_col: str = "embedding") -> DataFrame:
    """The report's sufficient statistic: per-dim (s, q, c) fix-point
    integer moments — d mergeable rows. Factored out because a
    Structured Streaming aggregation maintains the identical rows
    incrementally (``streaming.corpus_stream.stream_isotropy_moments``)
    and :func:`isotropy_from_moments` folds the live report off the
    sink — the embedding-health / correlation-moments pattern."""
    xi = (vecs.select(F.posexplode(vec_col).alias("dim", "x"))
          .select("dim", F.round(F.col("x").cast("double") * SCALE)
                  .cast("long").alias("v")))
    return xi.groupBy("dim").agg(
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
        F.count("*").alias("c"))


def isotropy_from_moments(perdim: DataFrame) -> DataFrame:
    """Fold the d-row moment table into the one-row isotropy report
    (exact integers, three final divisions)."""
    fold = perdim.agg(
        F.max("c").cast("long").alias("n"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ns"),
        F.sum("q").cast("long").alias("t"),
        F.max("q").cast("long").alias("mq"),
        F.min("q").cast("long").alias("mnq"))
    den = (F.col("n") - 1) * F.col("t")
    return fold.select(
        F.col("n").alias("n_vecs"),
        F.col("t").alias("sum_sq_norm"),
        F.col("ns").alias("sq_norm_of_sum"),
        F.when(den != 0,
               F.lit(10000.0) * (F.col("ns") - F.col("t")) / den)
        .alias("avg_cos_bp"),
        F.when(F.col("t") != 0, F.lit(10000.0) * F.col("mq")
               / F.col("t")).alias("max_dim_energy_bp"),
        F.when(F.col("t") != 0, F.lit(10000.0) * F.col("mnq")
               / F.col("t")).alias("min_dim_energy_bp"))


def isotropy_report_sql(table: str, vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`isotropy_report` — identical fix-point
    rounding and identical final float expressions over the same exact
    integers."""
    return f"""
WITH xi AS (
  SELECT CAST(i - 1 AS BIGINT) AS dim,
         CAST(round(CAST({vec_col}[i] AS DOUBLE) * {SCALE}) AS BIGINT)
           AS v
  FROM {table}, unnest(range(1, len({vec_col}) + 1)) AS r(i)),
perdim AS (
  SELECT dim, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS c
  FROM xi GROUP BY dim),
fold AS (
  SELECT CAST(max(c) AS BIGINT) AS n, CAST(sum(s * s) AS BIGINT) AS ns,
         CAST(sum(q) AS BIGINT) AS t, CAST(max(q) AS BIGINT) AS mq,
         CAST(min(q) AS BIGINT) AS mnq
  FROM perdim)
SELECT n AS n_vecs, t AS sum_sq_norm, ns AS sq_norm_of_sum,
       CASE WHEN (n - 1) * t <> 0
            THEN 10000.0 * (ns - t) / ((n - 1) * t) END AS avg_cos_bp,
       CASE WHEN t <> 0 THEN 10000.0 * mq / t END
         AS max_dim_energy_bp,
       CASE WHEN t <> 0 THEN 10000.0 * mnq / t END
         AS min_dim_energy_bp
FROM fold"""

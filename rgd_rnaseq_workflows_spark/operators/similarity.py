"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
variant as the scale path (candidate generation via random-hyperplane
signs derived from the portable md5 hash family — deterministic, no
stored model). All arithmetic is built-in ``aggregate``/``zip_with`` on
JVM arrays: no UDF, no collect of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate (sequential fold → deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_kernel():
    """Vectorized Arrow cosine over two array columns: numpy row-wise
    dot/norms per batch instead of three interpreted 64-step folds per
    row. Downstream consumers round to 6 decimals, which absorbs the
    (≤1 ulp) summation-order difference vs the sequential fold — same
    tolerance the DuckDB oracle already relies on."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64, copy=False)
        B = np.stack(b.to_numpy()).astype(np.float64, copy=False)
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        return pd.Series(num / den)

    return cos


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def brute_force_topk(emb: DataFrame, query: DataFrame, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of every corpus vector against ONE query row
    (DataFrame with a single ``qvec`` array column).

    The query broadcasts (one row); the corpus scan is embarrassingly
    parallel; top-k is `orderBy(limit)` which Spark executes as
    per-partition TakeOrdered — no full sort, no shuffle of the corpus.
    """
    scored = (emb.crossJoin(F.broadcast(query))
              .select(F.col(id_col),
                      F.round(cosine(_as_double(vec_col),
                                     F.col("qvec")), 6).alias("cosine_sim")))
    return scored.orderBy(F.desc("cosine_sim"), id_col).limit(k)


def query_vector(emb: DataFrame, query_id: int, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """The query vector as a 1-row DataFrame (kept distributed; no collect)."""
    return (emb.filter(F.col(id_col) == query_id)
            .select(_as_double(vec_col).alias("qvec")))


def plane_components(dims: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """±1 hyperplane normals derived from the portable md5 family —
    computed DRIVER-SIDE (hashlib md5 == Spark md5 == any engine's md5),
    so the executor plan carries plain float literals instead of
    n_planes×dims hash expressions (which cost ~30 s of codegen)."""
    import hashlib
    out = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            h = int(hashlib.md5(f"{seed}:{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append(1.0 if h & 1 else -1.0)
        out.append(row)
    return out


def hyperplane_signature(vec: Column, dims: int, n_planes: int = 16,
                         seed: int = 7) -> Column:
    """Random-hyperplane LSH signature: plane p's normal has component
    md5-derived in {-1, +1} per dimension; bit p = sign(v · n_p).

    Deterministic and model-free: any engine reproduces the same
    signature from (seed, dims, n_planes).
    """
    bits = None
    for p, comps in enumerate(plane_components(dims, n_planes, seed)):
        arr = F.array(*[F.lit(c) for c in comps])
        proj = F.aggregate(F.zip_with(vec, arr, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, v: acc + v)
        bit = F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("long")


def hyperplane_signature_kernel(dims: int, n_planes: int = 16,
                                seed: int = 7):
    """Vectorized Arrow twin of ``hyperplane_signature``: same md5-derived
    plane signs, same left-fold accumulation order over dimensions —
    each projection is built ``((0 + s₀v₀) + s₁v₁) + …`` with IEEE double
    adds, so every rounding step (hence every sign, hence the signature)
    is bit-identical to the sequential ``aggregate`` fold and to the
    oracle's left-associated ± chain. The fold runs once per (plane, dim)
    as a numpy op over the whole Arrow batch instead of once per row in
    the interpreter — this is the corpus-side hot path at scale
    (signatures for millions of rows); the HOF form remains for one-row
    query signatures and as the plan-readable specification."""
    from pyspark.sql.functions import pandas_udf

    planes = plane_components(dims, n_planes, seed)

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        out = np.zeros(len(V), dtype=np.int64)
        for p in range(n_planes):
            acc = np.zeros(len(V), dtype=np.float64)
            for d in range(dims):
                # sign*col is an exact product (±1.0); the add is the
                # same IEEE step the sequential fold performs
                acc = acc + planes[p][d] * V[:, d]
            out |= (acc > 0).astype(np.int64) << p
        return pd.Series(out)

    return sig


def with_signature(emb: DataFrame, dims: int, n_planes: int = 16,
                   seed: int = 7, vec_col: str = "embedding",
                   sig_col: str = "_sig") -> DataFrame:
    """Materialize the hyperplane signature as a column — the
    precompute-at-ingest path: run once when the corpus lands, store
    alongside the vectors (or as a bucketed sort key), and every
    query-time prune is a cheap long comparison instead of 16 folds."""
    # raw float arrays go straight to Arrow (half the transfer bytes);
    # the kernel widens float→double, exact — same as _as_double
    k = hyperplane_signature_kernel(dims, n_planes, seed)
    return emb.withColumn(sig_col, k(F.col(vec_col)))


def lsh_topk(emb: DataFrame, query: DataFrame, dims: int, k: int = 10,
             n_planes: int = 16, max_hamming: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: prune the corpus to vectors whose hyperplane
    signature is within ``max_hamming`` bits of the query's, then exact
    cosine on the survivors. The corpus signature runs through the
    vectorized Arrow kernel (bit-identical to the fold — see
    ``hyperplane_signature_kernel``); at scale it is precomputed once
    via ``with_signature`` and reused across queries."""
    corpus = with_signature(emb, dims, n_planes, vec_col=vec_col)
    # kernel on the 1-row query too: the HOF form expands to a 16×dims
    # literal tree whose analysis/codegen alone costs ~1s per plan
    q = with_signature(query, dims, n_planes, vec_col="qvec",
                       sig_col="_qsig")
    cos = cosine_kernel()
    scored = (corpus.crossJoin(F.broadcast(q))
              .filter(F.bit_count(F.col("_sig").bitwiseXOR(F.col("_qsig")))
                      <= max_hamming)
              .select(F.col(id_col),
                      F.round(cos(F.col(vec_col),
                                  F.col("qvec")), 6).alias("cosine_sim")))
    return scored.orderBy(F.desc("cosine_sim"), id_col).limit(k)


def _blocked_candidates(v: DataFrame, id_col: str) -> DataFrame:
    """Ordered candidate pairs from the (id, _blk, _sub, v) frame: equi
    self-join on the composite block key — never a cross join."""
    a, b = v.alias("a"), v.alias("b")
    return (a.join(b, (F.col("a._blk") == F.col("b._blk"))
                   & (F.col("a._sub") == F.col("b._sub")))
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))


def _gemm_pair_schema() -> str:
    return "id_a long, id_b long, cosine_sim double"


def _gemm_block_pairs(id_col: str, threshold: float, tile: int = 1024):
    """applyInPandas kernel: all pairs of one block via tiled GEMM.

    One block's vectors land in memory ONCE (n×d), against the join
    path's 2×d floats per candidate pair row — at 2 000-row blocks
    that's ~1 000× less data movement for the same pair set. The tile
    bound keeps the similarity buffer at ``tile × n`` doubles however
    hot the block is. NaNs (zero-norm vectors) never pass the pandas
    ``>=`` mask, mirroring an explicit not-NaN filter on the join path.
    """
    import numpy as np
    import pandas as pd

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                 "cosine_sim": np.zeros(0)})
        norms = np.sqrt((V * V).sum(axis=1))
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            S = (V[lo:hi] @ V.T) / np.outer(norms[lo:hi], norms)
            r, c = np.nonzero(
                np.round(S, 6) >= threshold)
            keep = c > (r + lo)  # upper triangle: id_a < id_b by sort
            r, c = r[keep], c[keep]
            out_a.append(ids[r + lo])
            out_b.append(ids[c])
            out_s.append(np.round(S[r, c], 6))
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine_sim": np.concatenate(out_s)})

    return pairs


def embedding_near_dup(emb: DataFrame, block_col: str = "label",
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       threshold: float = 0.9,
                       max_block: int | None = None,
                       dims: int | None = None,
                       n_planes: int = 8, seed: int = 11,
                       impl: str = "gemm") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on ``block_col``
    (cluster/label/LSH bucket) so the pair join is equi, never cross.

    Skew guard: a hot block degrades the within-block self-join to
    near-quadratic. With ``max_block`` set (requires ``dims``), any block
    larger than it is sub-blocked by a secondary hyperplane-LSH bucket
    (``n_planes`` bits, independent ``seed``), capping the per-partition
    pair fan-out at roughly ``(n/2^n_planes)²`` per hot block. Exact
    duplicates always share a signature, so true duplicate pairs survive
    sub-blocking; near-pairs split across buckets are the standard LSH
    recall trade-off (raise ``n_planes`` bands upstream if needed)."""
    v = emb.select(F.col(id_col), F.col(block_col).alias("_blk"),
                   _as_double(vec_col).alias("v"))
    if max_block is not None:
        if dims is None:
            raise ValueError("max_block guard needs dims for the "
                             "secondary LSH signature")
        sizes = v.groupBy("_blk").agg(F.count("*").alias("_bn"))
        k = hyperplane_signature_kernel(dims, n_planes, seed)
        v = (v.join(sizes, "_blk")
             .withColumn("_sub", F.when(F.col("_bn") > max_block,
                                        k(F.col("v"))).otherwise(F.lit(0)))
             .drop("_bn"))
    else:
        v = v.withColumn("_sub", F.lit(0))
    if impl == "gemm":
        # default: per-block tiled GEMM (applyInPandas). The block's
        # vectors cross the Arrow boundary once; the 10× sweep measured
        # the pair-join form at 91–116 s for ~20M-pair workloads vs ~2 s
        # here — the join path serializes 2×dims doubles per PAIR.
        # round(·,6) absorbs GEMM-vs-sequential summation ulps (the
        # lsh_topk tolerance precedent).
        return (v.groupBy("_blk", "_sub")
                .applyInPandas(_gemm_block_pairs(id_col, threshold),
                               _gemm_pair_schema()))
    # impl="join": pure-DataFrame equi self-join + Arrow pair cosine —
    # the shape the DuckDB oracle mirrors 1:1; every candidate pair pays
    # a 3×dims fold and carries both vectors through the shuffle.
    sim = F.round(cosine_kernel()(F.col("a.v"), F.col("b.v")), 6)
    return (_blocked_candidates(v, id_col)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    sim.alias("cosine_sim"))
            # Spark orders NaN above every number, so a bare >= would
            # PASS zero-norm (NaN-cosine) pairs that the GEMM path's
            # pandas mask drops — guard so both impls agree.
            .filter(~F.isnan("cosine_sim")
                    & (F.col("cosine_sim") >= threshold)))


def _margin_block_kernel(k: int, tile: int = 1024):
    """applyInPandas kernel for ONE margin block (shard key / IVF
    list): left vectors (role 1) against right candidates (role 0) via
    tiled GEMM; per left vector emits its LOCAL top-k positive-cosine
    matches (ci desc, id_right asc — the global window's order, so the
    local cut is lossless for the global top-k: any global top-k match
    is top-k within its own block). Cosine discipline matches the join
    path bit-for-bit at the 6-decimal contract: round(S, 6) > 0 gate,
    then round(·c6 · 10⁶) micro-cosine integers (the hard-negative
    kernel's rounding, oracle-green since r11). Only ≤ k rows per
    (left, block) leave the task — the join path shuffled every
    candidate pair row through ArrowEval + the rank window."""
    import numpy as np
    import pandas as pd

    cols = ["id_left", "id_right", "_ci"]
    empty = pd.DataFrame({c: np.zeros(0, dtype=np.int64) for c in cols})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        L = pdf[pdf["role"] == 1]
        R = pdf[pdf["role"] == 0].sort_values("id")
        if len(L) == 0 or len(R) == 0:
            return empty
        lid = L["id"].to_numpy(dtype=np.int64)
        rid = R["id"].to_numpy(dtype=np.int64)
        VL = np.stack(L["v"].to_numpy()).astype(np.float64)
        VR = np.stack(R["v"].to_numpy()).astype(np.float64)
        nl = np.sqrt((VL * VL).sum(axis=1))
        nr = np.sqrt((VR * VR).sum(axis=1))
        out_l, out_r, out_c = [], [], []
        for lo in range(0, len(lid), tile):
            hi = min(lo + tile, len(lid))
            with np.errstate(divide="ignore", invalid="ignore"):
                S = (VL[lo:hi] @ VR.T) / np.outer(nl[lo:hi], nr)
            S6 = np.round(S, 6)
            for r in range(hi - lo):
                row = S6[r]
                valid = np.nonzero(~np.isnan(row) & (row > 0))[0]
                if valid.size == 0:
                    continue
                ci = np.round(row[valid] * 1_000_000).astype(np.int64)
                order = np.lexsort((rid[valid], -ci))[:k]
                take = valid[order]
                out_l.append(np.full(take.size, lid[lo + r],
                                     dtype=np.int64))
                out_r.append(rid[take])
                out_c.append(ci[order])
        if not out_l:
            return empty
        return pd.DataFrame({"id_left": np.concatenate(out_l),
                             "id_right": np.concatenate(out_r),
                             "_ci": np.concatenate(out_c)})

    return fold


def margin_alignment(left: DataFrame, right: DataFrame, k: int = 4,
                     min_margin_ppm: int = 1_000_000,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     block_col: str | None = None) -> DataFrame:
    """Cross-set alignment mining with the MARGIN criterion (Artetxe &
    Schwenk 2019 — the bitext-mining scorer): for each left vector, its
    best right-side match, kept only when the top-1 cosine stands out
    from the neighborhood,

        margin = cos(top1) / mean(cos of the top-k matches) ≥ τ.

    Absolute-cosine thresholds mine garbage in dense regions and miss
    pairs in sparse ones; the margin is the standard fix. Returns
    (id_left, id_right, cosine_sim, margin6).

    Cross-engine exactness: per-pair cosines round to 6 decimals (the
    house cosine tolerance), are scaled to exact micro-cosine integers,
    and the margin is ONE bigint floor division
    ``c1·k·10⁶ div Σ top-k`` — no float accumulation anywhere, so the
    DuckDB twin reproduces the kept set bit-for-bit. Only matches with
    positive cosine participate; left ids with fewer than k positive
    matches drop (mining wants dense neighborhoods — documented).

    Scale: with ``block_col`` (an LSH bucket / cluster id, the
    ``embedding_near_dup`` discipline) the whole per-block fold runs
    inside ONE tiled-GEMM ``applyInPandas`` kernel
    (:func:`_margin_block_kernel`) — candidate pairs never leave the
    task, only ≤ k local-top-k rows per (left, block) do, and the
    global rank below is candidate-scale (≤ k·nprobe rows per left),
    never a pair shuffle; without it the join is the exact cross
    product — the test/oracle shape, not the 100 TB one.
    """
    from pyspark.sql import Window
    if block_col:
        # per-block GEMM fold (the r11 hard-negative kernel shape):
        # candidate pairs never leave the task — each (left, block)
        # contributes its local top-k rows, lossless for the global
        # top-k, and the global rank below runs at ≤ k·(blocks per
        # left) candidate scale instead of pair scale
        l = left.select(F.col(block_col).alias("_blk"),
                        F.lit(1).alias("role"),
                        F.col(id_col).alias("id"),
                        _as_double(vec_col).alias("v"))
        r = right.select(F.col(block_col).alias("_blk"),
                         F.lit(0).alias("role"),
                         F.col(id_col).alias("id"),
                         _as_double(vec_col).alias("v"))
        sc = (l.unionByName(r)
              .groupBy("_blk")
              .applyInPandas(_margin_block_kernel(k),
                             "id_left long, id_right long, _ci long"))
    else:
        l = left.select(F.col(id_col).alias("id_left"),
                        _as_double(vec_col).alias("_vl"))
        r = right.select(F.col(id_col).alias("id_right"),
                         _as_double(vec_col).alias("_vr"))
        joined = l.crossJoin(r)
        # Arrow pair cosine, not the interpreted 3×dims HOF fold per
        # pair — round(·,6) absorbs kernel-vs-sequential ulps (the
        # embedding_near_dup join-impl precedent, driver-green since r4)
        cos6 = F.round(cosine_kernel()(F.col("_vl"), F.col("_vr")), 6)
        sc = (joined.select("id_left", "id_right", cos6.alias("_c"))
              .filter(~F.isnan("_c") & (F.col("_c") > 0))
              .select("id_left", "id_right",
                      F.round(F.col("_c") * 1_000_000).cast("long")
                      .alias("_ci")))
    w = Window.partitionBy("id_left").orderBy(F.desc("_ci"), "id_right")
    rk = sc.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k)
    # ONE aggregation over the ranked frame: the top-1 row rides the
    # k-sum group as a min_by struct instead of a best⋈top self-join —
    # the join form recomputed the whole candidate/cosine lineage once
    # per branch (2 sort-merge joins, pair generation ×2); this agg
    # reuses the window's hash partitioning, so candidates are
    # generated, Arrow-scored, and ranked exactly once.
    agg = (rk.groupBy("id_left")
           .agg(F.count("*").alias("_n"),
                F.sum("_ci").cast("long").alias("_s"),
                F.min_by(F.struct("id_right", "_ci"), "_rn")
                .alias("_b"))
           .filter(F.col("_n") == k))
    margin_ppm = F.expr(f"(_b._ci * {k} * 1000000) div _s")
    return (agg.withColumn("_m", margin_ppm)
            .filter(F.col("_m") >= min_margin_ppm)
            .select("id_left", F.col("_b.id_right").alias("id_right"),
                    F.round(F.col("_b._ci") / 1_000_000.0, 6)
                    .alias("cosine_sim"),
                    F.round(F.col("_m") / 1_000_000.0, 6)
                    .alias("margin6")))


def margin_alignment_sql(left_src: str, right_src: str, k: int = 4,
                         min_margin_ppm: int = 1_000_000,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         block_col: str | None = None) -> str:
    """DuckDB twin of :func:`margin_alignment` — identical micro-cosine
    integers and floor-divided margins; with ``block_col`` the candidate
    join is equi on the block, else the exact cross product."""
    bsel = f", {block_col}" if block_col else ""
    jn = (f"l JOIN r USING ({block_col})" if block_col else "l, r")
    return f"""
WITH l AS (SELECT {id_col} AS id_left,
                  CAST({vec_col} AS DOUBLE[]) AS vl{bsel}
           FROM {left_src}),
r AS (SELECT {id_col} AS id_right,
             CAST({vec_col} AS DOUBLE[]) AS vr{bsel}
      FROM {right_src}),
sc AS MATERIALIZED (
  SELECT id_left, id_right,
         CAST(round(c * 1000000) AS BIGINT) AS ci
  FROM (SELECT id_left, id_right,
               round(list_cosine_similarity(vl, vr), 6) AS c
        FROM {jn})
  WHERE NOT isnan(c) AND c > 0),
rk AS (SELECT *, row_number() OVER (
         PARTITION BY id_left ORDER BY ci DESC, id_right) AS rn
       FROM sc),
top AS (SELECT id_left, count(*) AS n, CAST(sum(ci) AS BIGINT) AS s
        FROM rk WHERE rn <= {k} GROUP BY id_left),
best AS (SELECT id_left, id_right, ci FROM rk WHERE rn = 1)
SELECT b.id_left, b.id_right,
       round(b.ci / 1000000.0, 6) AS cosine_sim,
       round(((b.ci * {k} * 1000000) // t.s) / 1000000.0, 6) AS margin6
FROM best b JOIN top t USING (id_left)
WHERE t.n = {k} AND (b.ci * {k} * 1000000) // t.s >= {min_margin_ppm}
"""


def margin_alignment_ivf(left: DataFrame, right: DataFrame,
                         kc: int = 10, nprobe: int = 2, iters: int = 2,
                         k: int = 4, min_margin_ppm: int = 1_000_000,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """:func:`margin_alignment` with IVF blocking — the 100 TB form
    whose block cardinality TRACKS the corpus (kc ∝ N/list-size, the
    SemDeDup/IVF sizing rule) instead of a fixed enum:

    - coarse k-means fits on the RIGHT side (the lake/index side);
    - every right vector lives in exactly its nearest list;
    - every left vector probes its ``nprobe`` nearest lists, so a pair
      appears at most once and recall follows the standard IVF
      nprobe/kc trade.

    All candidate generation is the exact-int centroid machinery of
    ``operators.clustering`` (driver-metadata centroids, Arrow assign
    kernels), so the unrolled-Lloyd SQL twin replays the same lists."""
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        assign_topn_kernel, kmeans_fit)
    assigned_r, cents = kmeans_fit(right, k=kc, iters=iters,
                                   id_col=id_col, vec_col=vec_col,
                                   persist=False)
    r_blk = assigned_r.withColumnRenamed("cluster", "blk")
    l_blk = left.withColumn(
        "blk", F.explode(assign_topn_kernel(cents, nprobe)(F.col(vec_col))))
    return margin_alignment(l_blk, r_blk, k=k,
                            min_margin_ppm=min_margin_ppm,
                            id_col=id_col, vec_col=vec_col,
                            block_col="blk")


def margin_alignment_from_index(spark, path: str, left: DataFrame,
                                nprobe: int = 2, k: int = 4,
                                min_margin_ppm: int = 1_000_000,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> DataFrame:
    """:func:`margin_alignment` against a PERSISTED IVF index
    (``operators.ivf_index``) — the production alignment shape: the
    lake side is clustered, partitioned, and centroid-summarized ONCE
    (``run_corpus --ann-index``); every alignment batch then pays only
    its own coarse ranking plus a DIRECTORY-PRUNED scan of the probed
    lists. Nothing re-fits, nothing re-clusters, and unprobed lists are
    never even listed — vs :func:`margin_alignment_ivf`, which runs the
    k-means fit + full lake assignment inside every query.

    Coarse rule: the INDEX'S OWN ranking (exact integer centroid dot
    DESC, label ASC — ``ivf_index.probe_labels_batch``), so a batch
    lands on exactly the lists a probe for each vector would scan;
    note this is the dot rule every ivf_index probe uses, not
    ``margin_alignment_ivf``'s k-means distance rule, so probed lists
    can differ between the two forms (documented trade; equality with
    an unpruned reference under the same rule is test-pinned). Margin
    fold, exact-integer margins, and tie-breaks are byte-identical to
    :func:`margin_alignment` (shared code path)."""
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        probe_labels_batch, probe_scan)
    qlabels = probe_labels_batch(spark, left, path, nprobe,
                                 id_col=id_col, vec_col=vec_col)
    # project left to the used columns first: a caller-side 'label'
    # column would collide with the probe assignment's
    l_blk = (left.select(id_col, vec_col)
             .join(qlabels.withColumnRenamed("qid", id_col), id_col)
             .withColumnRenamed("label", "blk"))
    labels = [r["label"] for r in
              qlabels.select("label").distinct().collect()]
    r_blk = probe_scan(spark, path, labels) \
        .withColumnRenamed("label", "blk")
    return margin_alignment(l_blk, r_blk, k=k,
                            min_margin_ppm=min_margin_ppm,
                            id_col=id_col, vec_col=vec_col,
                            block_col="blk")


def margin_alignment_ivf_sql(left_src: str, right_src: str,
                             kc: int = 10, nprobe: int = 2,
                             iters: int = 2, k: int = 4,
                             min_margin_ppm: int = 1_000_000,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`margin_alignment_ivf`: the unrolled-Lloyd
    coarse chain over the right side (``kmeans_assign_cte``), the left
    side ranked against the SAME final centroids (top-``nprobe``), then
    the margin chain over the list join."""
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        SCALE, kmeans_assign_cte)
    coarse = kmeans_assign_cte(k=kc, iters=iters, table=right_src,
                               id_col=id_col, vec_col=vec_col,
                               prefix="rv")
    cent_cte = f"rvc{iters - 1}" if iters > 1 else "rvc0"
    return f"""
WITH {coarse},
lfraw AS (
  SELECT {id_col} AS vec_id, d, CAST(round(x * {SCALE}) AS BIGINT) AS xi
  FROM (SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS x,
               generate_subscripts({vec_col}, 1) AS d FROM {left_src})),
lfnrm AS (SELECT vec_id, CAST(sum(xi * xi) AS BIGINT) AS ss
          FROM lfraw GROUP BY vec_id),
lfpts AS (
  SELECT r.vec_id, r.d,
         CAST(round(CAST(r.xi AS DOUBLE) * {SCALE}
              / sqrt(CAST(greatest(n.ss, 1) AS DOUBLE))) AS BIGINT) AS xi
  FROM lfraw r JOIN lfnrm n USING (vec_id)),
ld AS (
  SELECT p.vec_id, c.c,
         CAST(sum((p.xi * c.n - c.s) * (p.xi * c.n - c.s)) AS BIGINT)
           AS num, c.n
  FROM lfpts p JOIN {cent_cte} c USING (d)
  GROUP BY p.vec_id, c.c, c.n),
lblk AS (
  SELECT vec_id AS id_left, c AS blk FROM (
    SELECT vec_id, c, row_number() OVER (
      PARTITION BY vec_id
      ORDER BY CAST(num AS DOUBLE) / (n * n), c) AS rk
    FROM ld)
  WHERE rk <= {nprobe}),
rblk AS (SELECT vec_id AS id_right, c AS blk FROM rvaf),
lv AS (SELECT {id_col} AS id_left,
              CAST({vec_col} AS DOUBLE[]) AS vl FROM {left_src}),
rv AS (SELECT {id_col} AS id_right,
              CAST({vec_col} AS DOUBLE[]) AS vr FROM {right_src}),
sc AS MATERIALIZED (
  SELECT id_left, id_right, CAST(round(c * 1000000) AS BIGINT) AS ci
  FROM (SELECT b.id_left, rb.id_right,
               round(list_cosine_similarity(vl, vr), 6) AS c
        FROM lblk b JOIN rblk rb USING (blk)
        JOIN lv USING (id_left) JOIN rv USING (id_right))
  WHERE NOT isnan(c) AND c > 0),
rk AS (SELECT *, row_number() OVER (
         PARTITION BY id_left ORDER BY ci DESC, id_right) AS rn
       FROM sc),
topk AS (SELECT id_left, count(*) AS n, CAST(sum(ci) AS BIGINT) AS s
         FROM rk WHERE rn <= {k} GROUP BY id_left),
best AS (SELECT id_left, id_right, ci FROM rk WHERE rn = 1)
SELECT b.id_left, b.id_right,
       round(b.ci / 1000000.0, 6) AS cosine_sim,
       round(((b.ci * {k} * 1000000) // t.s) / 1000000.0, 6) AS margin6
FROM best b JOIN topk t USING (id_left)
WHERE t.n = {k} AND (b.ci * {k} * 1000000) // t.s >= {min_margin_ppm}
"""


def cross_split_leakage(emb: DataFrame, block_col: str = "label",
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.4, seed: int = 1,
                        train: float = 0.8, val: float = 0.1) -> DataFrame:
    """SEMANTIC split-leakage report — the embedding-level twin of the
    n-gram ``split_leakage_report``: near-identical vectors landing in
    different train/val/test splits leak evaluation signal that exact
    and n-gram dedup both miss (paraphrases, translations, re-encodes).

    Pairs come from :func:`embedding_near_dup` (blocked equi-join /
    per-block GEMM — never a cross product); split labels are the same
    deterministic md5-bucket assignment the rest of the split family
    uses, so this report composes with ``split_assign`` /
    ``cluster_split_assign`` output. One aggregation at PAIR scale.

    Output: (split_lo, split_hi, n_pairs, max_sim, sum_sim_e6) per
    unordered cross-split pair of splits. ``sum_sim_e6`` is the exact
    integer sum of the (already round-6) similarities ×1e6 — the
    engine-identical mean numerator; a mean is one division away and
    the sum itself never carries float-summation order dependence.

    Rounding contract: the one cross-engine float op is the FIRST
    round-6 of the cosine (numpy half-to-even vs DuckDB half-away).
    The rules differ only on exact decimal halves, which are not
    representable as binary doubles — a disagreement needs the
    ``x*1e6`` intermediate to round onto an exact ``n + 0.5`` double,
    a measure-zero coincidence accepted here rather than re-plumbing
    every similarity kernel through integer-scaled rounding; every
    LATER stage (``sum_sim_e6``, margins) re-rounds values already on
    the 6-decimal grid, where the engines agree identically.
    """
    from rgd_rnaseq_workflows_spark.operators.sampling import split_assign
    pairs = embedding_near_dup(emb, block_col=block_col, id_col=id_col,
                               vec_col=vec_col, threshold=threshold)
    lab = emb.select(F.col(id_col).alias("_sid"),
                     split_assign(F.col(id_col), seed=seed, train=train,
                                  val=val).alias("_split"))
    joined = (pairs
              .join(lab.withColumnRenamed("_sid", "id_a")
                    .withColumnRenamed("_split", "_sa"), "id_a")
              .join(lab.withColumnRenamed("_sid", "id_b")
                    .withColumnRenamed("_split", "_sb"), "id_b")
              .filter(F.col("_sa") != F.col("_sb")))
    return (joined
            .select(F.least("_sa", "_sb").alias("split_lo"),
                    F.greatest("_sa", "_sb").alias("split_hi"),
                    "cosine_sim",
                    F.round(F.col("cosine_sim") * 1_000_000)
                    .cast("long").alias("_e6"))
            .groupBy("split_lo", "split_hi")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.max("cosine_sim").alias("max_sim"),
                 F.sum("_e6").cast("long").alias("sum_sim_e6"))
            .orderBy("split_lo", "split_hi"))


def cross_split_leakage_sql(emb_table: str, threshold: float = 0.4,
                            seed: int = 1, train: float = 0.8,
                            val: float = 0.1) -> str:
    """DuckDB twin of :func:`cross_split_leakage` (label-blocked exact
    pairs, identical split assignment, integer-exact similarity sum)."""
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        split_assign_sql)
    split = split_assign_sql("vec_id", seed=seed, train=train, val=val)
    return f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve
           FROM {emb_table}),
pairs AS (
  SELECT id_a, id_b, cosine_sim FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine_sim
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
  WHERE NOT isnan(cosine_sim) AND cosine_sim >= {threshold}),
lab AS (SELECT vec_id, {split} AS split FROM {emb_table})
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       max(cosine_sim) AS max_sim,
       CAST(sum(CAST(round(cosine_sim * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_sim_e6
FROM pairs p
JOIN lab sa ON sa.vec_id = p.id_a
JOIN lab sb ON sb.vec_id = p.id_b
WHERE sa.split <> sb.split
GROUP BY 1, 2
"""


# =============================================================================
# Retrieval evaluation: recall@k / MRR of an ANN path vs exact truth
# =============================================================================


def hyperplane_signature_sql(dims: int, n_planes: int, seed: int,
                             vec_expr: str) -> str:
    """DuckDB SQL for the hyperplane signature of ``vec_expr`` — the
    same md5-derived ±1 planes as :func:`plane_components`, each
    projection emitted as a left-associated ± chain so every IEEE
    rounding step matches Spark's sequential fold."""
    comps = plane_components(dims, n_planes, seed)
    terms = []
    for p, row in enumerate(comps):
        proj = " ".join(
            ("+" if c > 0 else "-") + f" {vec_expr}[{d + 1}]"
            for d, c in enumerate(row)).lstrip("+ ")
        terms.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + "\n       + ".join(terms) + " AS BIGINT)"


def _grouped_topk(scored: DataFrame, k: int, n_buckets: int = 32,
                  extra: tuple[str, ...] = ()) -> DataFrame:
    """Per-group top-k WITHOUT a corpus-in-one-task window: phase 1
    ranks inside (group, hash-bucket) partitions (corpus/buckets rows
    each), phase 2 ranks the groups × buckets × k survivors — the
    cap_per_source two-phase discipline. Bucketing never changes the
    result (a global top-k row is a top-k row of its bucket); ranks
    are total-ordered by (sim desc, id).

    ``extra`` names additional ranking-group columns beyond ``qid``
    (the shared kernel for the eval reports: MELT every ranking —
    truth arm, candidate arm, each truncation level — into one frame
    keyed by (qid, *extra) so a single two-phase pass serves them all,
    instead of one exchange-pair per ranking)."""
    from pyspark.sql import Window
    keys = ["qid", *extra]
    bkt = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_buckets))
    w1 = (Window.partitionBy(*keys, "_bkt")
          .orderBy(F.desc("cosine_sim"), F.col("vec_id")))
    w2 = Window.partitionBy(*keys).orderBy(F.desc("cosine_sim"),
                                           F.col("vec_id"))
    return (scored.withColumn("_bkt", bkt)
            .withColumn("_rb", F.row_number().over(w1))
            .filter(F.col("_rb") <= k)
            .withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= k)
            .select(*keys, "vec_id", "rn"))


def retrieval_recall_report(emb: DataFrame, query_ids: list[int],
                            dims: int, k: int = 10, n_planes: int = 16,
                            max_hamming: int = 5, seed: int = 7,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Measured retrieval quality — the "measure, don't guess" gate for
    the ANN family: for each query vector, exact brute-force cosine
    top-k is the truth set, the hyperplane-LSH path is the candidate
    retriever, and the report is (query_id, n_hits, recall_bp, mrr_e6)
    with ``recall_bp = 10000·hits div k`` and ``mrr_e6 = 1e6 div
    (candidate rank of the true #1)`` (0 when missed) — exact integer
    metrics, engine-identical. The query itself is EXCLUDED from both
    sides (its self-match would fake recall).

    Scale shape: queries broadcast (a handful of rows); the corpus is
    scanned once for all queries; truth and candidate arms MELT into
    one (qid, arm) frame so a single two-phase bucketed top-k ranks
    both (no corpus-in-one-task window, no per-arm exchange pair);
    the report is |queries| rows.
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    sigs = with_signature(emb, dims, n_planes, seed=seed,
                          vec_col=vec_col)
    corpus = sigs.select(F.col(id_col).alias("vec_id"),
                         _as_double(vec_col).alias("_v"),
                         F.col("_sig"))
    queries = (corpus.filter(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("qid"),
                       F.col("_v").alias("_qv"),
                       F.col("_sig").alias("_qsig")))
    cos = cosine_kernel()
    joined = (corpus.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("qid"))
              .withColumn("cosine_sim",
                          F.round(cos(F.col("_v"), F.col("_qv")), 6)))
    # arm 0 = exact truth (every row), arm 1 = LSH candidates (null
    # sim outside the hamming ball, dropped before ranking)
    in_ball = (F.bit_count(F.col("_sig").bitwiseXOR(F.col("_qsig")))
               <= max_hamming)
    melted = (joined.select("qid", "vec_id", F.explode(F.array(
        F.struct(F.lit(0).alias("arm"),
                 F.col("cosine_sim").alias("cosine_sim")),
        F.struct(F.lit(1).alias("arm"),
                 F.when(in_ball, F.col("cosine_sim"))
                 .alias("cosine_sim")))).alias("_a"))
        .select("qid", "vec_id", "_a.arm", "_a.cosine_sim")
        .filter(F.col("cosine_sim").isNotNull()))
    # ranked is <= |q| * 2 * k rows but its lineage is the full corpus
    # melt + ranking; freeze it so truth/approx/hits/mrr branches read
    # the tiny result instead of re-running the corpus subtree
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    ranked = checkpoint_df(_grouped_topk(melted, k, extra=("arm",)),
                           eager=False)
    truth = ranked.filter(F.col("arm") == 0).select("qid", "vec_id", "rn")
    approx = (ranked.filter(F.col("arm") == 1)
              .select("qid", "vec_id", "rn"))
    # every post-ranking frame is <= |q| * arms * k rows -> broadcast
    hits = (truth.join(F.broadcast(approx.select("qid", "vec_id")),
                       ["qid", "vec_id"])
            .groupBy("qid").agg(F.count("*").cast("long").alias("n_hits")))
    mrr = (truth.filter(F.col("rn") == 1)
           .join(F.broadcast(approx.select("qid", "vec_id",
                                           F.col("rn").alias("_arn"))),
                 ["qid", "vec_id"], "left")
           .select("qid", F.coalesce(F.expr("1000000 div _arn"),
                                     F.lit(0)).cast("long")
                   .alias("mrr_e6")))
    return (queries.select("qid")
            .join(F.broadcast(hits), "qid", "left")
            .join(F.broadcast(mrr), "qid", "left")
            .select(F.col("qid").alias("query_id"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.expr(f"10000 * coalesce(n_hits, 0) div {k}")
                    .cast("long").alias("recall_bp"),
                    F.coalesce("mrr_e6", F.lit(0)).cast("long")
                    .alias("mrr_e6"))
            .orderBy("query_id"))


def retrieval_recall_report_sql(emb_table: str, query_ids: list[int],
                                dims: int, k: int = 10,
                                n_planes: int = 16, max_hamming: int = 5,
                                seed: int = 7) -> str:
    """DuckDB twin of :func:`retrieval_recall_report` — identical plane
    folds, rounded ranking order, integer metrics."""
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    sig = hyperplane_signature_sql(dims, n_planes, seed, "ve")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
           FROM {emb_table}),
s AS (SELECT vec_id, ve, {sig} AS sig FROM v),
q AS (SELECT vec_id AS qid, ve AS qv, sig AS qsig FROM s
      WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.qid, s.vec_id, s.sig, q.qsig,
         round(list_cosine_similarity(s.ve, q.qv), 6) AS c
  FROM s, q WHERE s.vec_id <> q.qid),
truth AS (
  SELECT qid, vec_id, rn FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY c DESC, vec_id) AS rn
    FROM scored) WHERE rn <= {k}),
approx AS (
  SELECT qid, vec_id, rn FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY c DESC, vec_id) AS rn
    FROM scored WHERE bit_count(xor(sig, qsig)) <= {max_hamming})
  WHERE rn <= {k}),
hits AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits
         FROM truth t JOIN approx a USING (qid, vec_id) GROUP BY t.qid),
mrr AS (SELECT t.qid,
               CAST(coalesce(1000000 // a.rn, 0) AS BIGINT) AS mrr_e6
        FROM truth t LEFT JOIN approx a USING (qid, vec_id)
        WHERE t.rn = 1)
SELECT q.qid AS query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((10000 * coalesce(h.n_hits, 0)) // {k} AS BIGINT)
         AS recall_bp,
       CAST(coalesce(m.mrr_e6, 0) AS BIGINT) AS mrr_e6
FROM q LEFT JOIN hits h ON h.qid = q.qid
       LEFT JOIN mrr m ON m.qid = q.qid
ORDER BY query_id
"""


def truncation_recall_report(emb: DataFrame, query_ids: list[int],
                             dims_list: list[int], k: int = 10,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Matryoshka-style truncation evaluation: how much retrieval
    quality survives when vectors are cut to their first ``d``
    dimensions — the question behind MRL-trained embeddings and every
    "store 64 of the 768 dims" storage decision. For each query and
    each ``d`` in ``dims_list``: exact FULL-dimension cosine top-k is
    truth, exact ``d``-dimension cosine top-k is the candidate, and
    the report carries exact-integer recall_bp + mrr_e6 (the
    :func:`retrieval_recall_report` metrics; query excluded from both
    sides).

    Scale shape: ONE corpus scan computes every (query, d) score —
    the truncated dot/norm reuse the same broadcast-joined row — and
    all the rankings (full-dimension truth + every truncation level)
    MELT into one (qid, dims) frame served by a single two-phase
    bucketed top-k pass, instead of one exchange pair per level;
    output is |queries| × |dims_list| rows.
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if not dims_list:
        raise ValueError("dims_list must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    if len(set(dims_list)) != len(dims_list) or min(dims_list) < 1:
        raise ValueError("dims_list must be distinct positive ints")
    corpus = emb.select(F.col(id_col).alias("vec_id"),
                        _as_double(vec_col).alias("_v"))
    queries = (corpus.filter(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("qid"),
                       F.col("_v").alias("_qv")))
    cos = cosine_kernel()
    joined = (corpus.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("qid")))
    # dims=0 is the full-dimension truth arm; every sim is computed in
    # the same projection over the same broadcast-joined row
    arms = [F.struct(F.lit(0).cast("int").alias("dims"),
                     F.round(cos(F.col("_v"), F.col("_qv")), 6)
                     .alias("cosine_sim"))]
    arms += [F.struct(F.lit(d).cast("int").alias("dims"),
                      F.round(cos(F.slice("_v", 1, d),
                                  F.slice("_qv", 1, d)), 6)
                      .alias("cosine_sim"))
             for d in dims_list]
    melted = (joined.select("qid", "vec_id",
                            F.explode(F.array(*arms)).alias("_a"))
              .select("qid", "vec_id", "_a.dims", "_a.cosine_sim"))
    # freeze the tiny ranked frame (<= |q| * (levels+1) * k rows) so
    # the corpus melt + ranking runs once, not once per consumer branch
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    ranked = checkpoint_df(_grouped_topk(melted, k, extra=("dims",)),
                           eager=False)
    truth = (ranked.filter(F.col("dims") == 0)
             .select("qid", "vec_id", "rn"))
    approx = ranked.filter(F.col("dims") != 0)
    # every post-ranking frame is <= |q| * levels * k rows -> broadcast
    hits = (truth.join(F.broadcast(approx.select("qid", "dims",
                                                 "vec_id")),
                       ["qid", "vec_id"])
            .groupBy("qid", "dims")
            .agg(F.count("*").cast("long").alias("n_hits")))
    mrr = (truth.filter(F.col("rn") == 1)
           .join(F.broadcast(approx.select("qid", "dims", "vec_id",
                                           F.col("rn").alias("_arn"))),
                 ["qid", "vec_id"])
           .select("qid", "dims", F.expr("1000000 div _arn")
                   .cast("long").alias("mrr_e6")))
    base = queries.select("qid", F.explode(F.array(
        *[F.lit(d).cast("int") for d in dims_list])).alias("dims"))
    return (base.join(F.broadcast(hits), ["qid", "dims"], "left")
            .join(F.broadcast(mrr), ["qid", "dims"], "left")
            .select(F.col("qid").alias("query_id"), "dims",
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.expr(f"10000 * coalesce(n_hits, 0) div {k}")
                    .cast("long").alias("recall_bp"),
                    F.coalesce("mrr_e6", F.lit(0)).cast("long")
                    .alias("mrr_e6"))
            .orderBy("query_id", "dims"))


def truncation_recall_report_sql(emb_table: str, query_ids: list[int],
                                 dims_list: list[int],
                                 k: int = 10) -> str:
    """DuckDB twin of :func:`truncation_recall_report`."""
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if not dims_list:
        raise ValueError("dims_list must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    if len(set(dims_list)) != len(dims_list) or min(dims_list) < 1:
        raise ValueError("dims_list must be distinct positive ints")
    ids = ", ".join(str(i) for i in query_ids)
    arms = []
    for d in dims_list:
        arms.append(f"""
SELECT q.qid AS query_id, {d} AS dims,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((10000 * coalesce(h.n_hits, 0)) // {k} AS BIGINT)
         AS recall_bp,
       CAST(coalesce(m.mrr_e6, 0) AS BIGINT) AS mrr_e6
FROM q
LEFT JOIN (
  SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits
  FROM truth t JOIN (
    SELECT qid, vec_id, rn FROM (
      SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        ORDER BY round(list_cosine_similarity(ve[1:{d}], qv[1:{d}]), 6)
          DESC, vec_id) AS rn
      FROM sc) WHERE rn <= {k}) a USING (qid, vec_id)
  GROUP BY t.qid) h ON h.qid = q.qid
LEFT JOIN (
  SELECT t.qid, CAST(coalesce(1000000 // a.rn, 0) AS BIGINT) AS mrr_e6
  FROM truth t LEFT JOIN (
    SELECT qid, vec_id, rn FROM (
      SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        ORDER BY round(list_cosine_similarity(ve[1:{d}], qv[1:{d}]), 6)
          DESC, vec_id) AS rn
      FROM sc) WHERE rn <= {k}) a USING (qid, vec_id)
  WHERE t.rn = 1) m ON m.qid = q.qid""")
    union_arms = "\nUNION ALL\n".join(arms)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
           FROM {emb_table}),
q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id IN ({ids})),
sc AS MATERIALIZED (
  SELECT q.qid, s.vec_id, s.ve, q.qv
  FROM v s, q WHERE s.vec_id <> q.qid),
truth AS (
  SELECT qid, vec_id, rn FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
             ORDER BY round(list_cosine_similarity(ve, qv), 6)
               DESC, vec_id) AS rn
    FROM sc) WHERE rn <= {k})
{union_arms}
ORDER BY query_id, dims
"""


def ivf_probe_sweep_report(emb: DataFrame, query_ids: list[int],
                           probes: list[int] = (1, 2, 4), k: int = 10,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           label_col: str = "label") -> DataFrame:
    """IVF probe-count sweep — the recall-vs-nprobe curve every IVF
    deployment tunes, measured instead of guessed (the third member of
    the eval family after :func:`retrieval_recall_report` and
    :func:`truncation_recall_report`): for each query and each
    ``nprobe``, the candidate set is the vectors whose pre-assigned
    cluster (``label_col``) ranks in the query's top-``nprobe``
    centroids by EXACT integer dot product (the ``ann_ivf_topk``
    probe rule), and the report carries exact-integer recall_bp +
    mrr_e6 against the brute-force truth. Query excluded from both
    sides.

    Scale shape: centroids are one per-dimension aggregation; label
    ranks are a |queries|×|labels| metadata frame (broadcast); the
    corpus is scanned ONCE and every (query, nprobe) ranking — plus
    the truth arm — melts into a single (qid, arm)-keyed two-phase
    bucketed top-k pass (the shared ``_grouped_topk`` kernel), frozen
    before the metadata-scale report joins.
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    probes = list(probes)
    if (not probes or len(set(probes)) != len(probes)
            or min(probes) < 1):
        raise ValueError("probes must be distinct positive ints")
    if k < 1:
        raise ValueError("k must be >= 1")
    corpus = emb.select(F.col(id_col).alias("vec_id"),
                        F.col(label_col).alias("_lbl"),
                        _as_double(vec_col).alias("_v"))
    queries = (corpus.filter(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("qid"),
                       F.col("_v").alias("_qv")))
    # exact integer centroid components (the ann_ivf_topk probe rule)
    e = (corpus.select("_lbl", F.posexplode("_v").alias("_d0", "_x"))
         .select("_lbl", (F.col("_d0") + 1).alias("_d"),
                 F.round(F.col("_x") * 10000000).cast("long").alias("_xi")))
    centroid = e.groupBy("_lbl", "_d").agg(F.sum("_xi").alias("_c"))
    qv = (emb.filter(F.col(id_col).isin(query_ids))
          .select(F.col(id_col).alias("qid"),
                  F.posexplode(_as_double(vec_col)).alias("_d0", "_x"))
          .select("qid", (F.col("_d0") + 1).alias("_d"),
                  F.round(F.col("_x") * 10000000).cast("long")
                  .alias("_qx")))
    from pyspark.sql import Window
    rank_w = Window.partitionBy("qid").orderBy(F.desc("_dot"), "_lbl")
    label_rank = (centroid.join(qv, "_d")
                  .groupBy("qid", "_lbl")
                  .agg(F.sum(F.col("_c") * F.col("_qx")).alias("_dot"))
                  .select("qid", "_lbl",
                          F.row_number().over(rank_w).alias("_lrank")))
    cos = cosine_kernel()
    joined = (corpus.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("qid"))
              .join(F.broadcast(label_rank), ["qid", "_lbl"])
              .withColumn("cosine_sim",
                          F.round(cos(F.col("_v"), F.col("_qv")), 6)))
    # arm 0 = brute-force truth; arm p = top-p-probed candidates
    arms = [F.struct(F.lit(0).cast("int").alias("arm"),
                     F.col("cosine_sim").alias("cosine_sim"))]
    arms += [F.struct(F.lit(p).cast("int").alias("arm"),
                      F.when(F.col("_lrank") <= p, F.col("cosine_sim"))
                      .alias("cosine_sim"))
             for p in probes]
    melted = (joined.select("qid", "vec_id",
                            F.explode(F.array(*arms)).alias("_a"))
              .select("qid", "vec_id", "_a.arm", "_a.cosine_sim")
              .filter(F.col("cosine_sim").isNotNull()))
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    ranked = checkpoint_df(_grouped_topk(melted, k, extra=("arm",)),
                           eager=False)
    truth = (ranked.filter(F.col("arm") == 0)
             .select("qid", "vec_id", "rn"))
    approx = ranked.filter(F.col("arm") != 0)
    hits = (truth.join(F.broadcast(approx.select("qid", "arm", "vec_id")),
                       ["qid", "vec_id"])
            .groupBy("qid", "arm")
            .agg(F.count("*").cast("long").alias("n_hits")))
    mrr = (truth.filter(F.col("rn") == 1)
           .join(F.broadcast(approx.select("qid", "arm", "vec_id",
                                           F.col("rn").alias("_arn"))),
                 ["qid", "vec_id"])
           .select("qid", "arm", F.expr("1000000 div _arn")
                   .cast("long").alias("mrr_e6")))
    base = queries.select("qid", F.explode(F.array(
        *[F.lit(p).cast("int") for p in probes])).alias("arm"))
    return (base.join(F.broadcast(hits), ["qid", "arm"], "left")
            .join(F.broadcast(mrr), ["qid", "arm"], "left")
            .select(F.col("qid").alias("query_id"),
                    F.col("arm").alias("nprobe"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.expr(f"10000 * coalesce(n_hits, 0) div {k}")
                    .cast("long").alias("recall_bp"),
                    F.coalesce("mrr_e6", F.lit(0)).cast("long")
                    .alias("mrr_e6"))
            .orderBy("query_id", "nprobe"))


def ivf_probe_sweep_sql(emb_table: str, query_ids: list[int],
                        probes: list[int] = (1, 2, 4),
                        k: int = 10) -> str:
    """DuckDB twin of :func:`ivf_probe_sweep_report` — identical
    integer centroid dots, probe ranks, rounded cosine ranking order
    and integer metrics."""
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    probes = list(probes)
    if (not probes or len(set(probes)) != len(probes)
            or min(probes) < 1):
        raise ValueError("probes must be distinct positive ints")
    if k < 1:
        raise ValueError("k must be >= 1")
    ids = ", ".join(str(i) for i in query_ids)
    probe_rows = ", ".join(f"({p})" for p in probes)
    return f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve
           FROM {emb_table}),
q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id IN ({ids})),
e AS (SELECT label, unnest(ve) AS x, generate_subscripts(ve, 1) AS d
      FROM v),
centroid AS (
  SELECT label, d, CAST(sum(CAST(round(x * 10000000) AS BIGINT))
                        AS BIGINT) AS c
  FROM e GROUP BY label, d),
qe AS (SELECT qid, CAST(round(unnest(qv) * 10000000) AS BIGINT) AS qx,
              generate_subscripts(qv, 1) AS d
       FROM q),
label_rank AS (
  SELECT qid, label,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sum(c * qx) DESC, label) AS lrank
  FROM centroid JOIN qe USING (d) GROUP BY qid, label),
scored AS (
  SELECT q.qid, s.vec_id, lr.lrank,
         round(list_cosine_similarity(s.ve, q.qv), 6) AS cs
  FROM v s
  JOIN q ON s.vec_id <> q.qid
  JOIN label_rank lr ON lr.qid = q.qid AND lr.label = s.label),
truth AS (
  SELECT qid, vec_id, rn FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cs DESC, vec_id) AS rn
    FROM scored) WHERE rn <= {k}),
probes(p) AS (VALUES {probe_rows}),
approx AS (
  SELECT p, qid, vec_id, rn FROM (
    SELECT p.p, s.qid, s.vec_id,
           row_number() OVER (PARTITION BY p.p, s.qid
                              ORDER BY s.cs DESC, s.vec_id) AS rn
    FROM scored s JOIN probes p ON s.lrank <= p.p)
  WHERE rn <= {k}),
hits AS (SELECT a.p, t.qid, CAST(count(*) AS BIGINT) AS n_hits
         FROM truth t JOIN approx a USING (qid, vec_id)
         GROUP BY a.p, t.qid),
mrr AS (SELECT a.p, t.qid,
               CAST(1000000 // a.rn AS BIGINT) AS mrr_e6
        FROM truth t JOIN approx a USING (qid, vec_id)
        WHERE t.rn = 1)
SELECT q.qid AS query_id, CAST(p.p AS INTEGER) AS nprobe,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((10000 * coalesce(h.n_hits, 0)) // {k} AS BIGINT)
         AS recall_bp,
       CAST(coalesce(m.mrr_e6, 0) AS BIGINT) AS mrr_e6
FROM q CROSS JOIN probes p
LEFT JOIN hits h ON h.qid = q.qid AND h.p = p.p
LEFT JOIN mrr m ON m.qid = q.qid AND m.p = p.p
ORDER BY query_id, nprobe
"""


def _hardneg_block_kernel(k: int, margin_ppm: int, tile: int = 1024):
    """applyInPandas kernel: the COMPLETE hard-negative fold for one
    self-contained block — tiled GEMM cosines (the _gemm_block_pairs
    memory discipline: n×d vectors once, tile×n similarity buffer),
    exact micro-cosine integers, per-anchor positive max and negative
    top-k with the (ci desc, neg_id asc) tiebreak, FaceNet status
    taxonomy. Values are bit-identical to the join+window form: the
    same round-to-6 → ×10⁶ integer chain, the same comparisons."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({
        "anchor_id": np.zeros(0, dtype=np.int64),
        "neg_id": np.zeros(0, dtype=np.int64),
        "rank": np.zeros(0, dtype=np.int64),
        "cosine_sim": np.zeros(0), "pos_best_sim": np.zeros(0),
        "status": pd.Series([], dtype=object)})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        labs = pdf["label"].to_numpy()
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        n = len(ids)
        if n < 2:
            return empty
        norms = np.sqrt((V * V).sum(axis=1))
        rows = []
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = (V[lo:hi] @ V.T) / np.outer(norms[lo:hi], norms)
            CI = np.round(np.round(S, 6) * 1_000_000)
            for r in range(hi - lo):
                i = lo + r
                ci = CI[r]
                valid = ~np.isnan(ci)
                valid[i] = False
                same = valid & (labs == labs[i])
                diff = valid & (labs != labs[i])
                pb = ci[same].max() if same.any() else None
                nidx = np.nonzero(diff)[0]
                if nidx.size == 0:
                    continue
                order = np.lexsort((ids[nidx], -ci[nidx]))[:k]
                for rk, j in enumerate(nidx[order], start=1):
                    c = int(ci[j])
                    if pb is None:
                        st = "no_positive"
                    elif c >= pb:
                        st = "violation"
                    elif c + margin_ppm >= pb:
                        st = "semi_hard"
                    else:
                        st = "easy"
                    rows.append((int(ids[i]), int(ids[j]), rk,
                                 round(c / 1_000_000.0, 6),
                                 None if pb is None
                                 else round(pb / 1_000_000.0, 6), st))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=[
            "anchor_id", "neg_id", "rank", "cosine_sim",
            "pos_best_sim", "status"])

    return fold


def hard_negative_report(emb: DataFrame, k: int = 5,
                         margin_ppm: int = 50_000,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label",
                         block_col: str | None = None,
                         candidates: DataFrame | None = None) -> DataFrame:
    """Hard-negative mining for contrastive / metric training: per
    anchor, its top-k most-similar DIFFERENT-label vectors, each graded
    against the anchor's nearest positive (FaceNet triplet taxonomy,
    Schroff 2015): ``violation`` — negative at least as close as the
    best positive (an active triplet); ``semi_hard`` — within
    ``margin_ppm`` micro-cosine of it (the negatives one actually
    trains on); ``easy`` otherwise; ``no_positive`` — anchor has no
    same-label candidate in its block. Returns
    (anchor_id, neg_id, rank, cosine_sim, pos_best_sim, status).

    Cross-engine exactness: the margin_alignment discipline — Arrow
    pair cosine rounded to 6, micro-cosine bigints, pure integer
    comparisons; zero-norm (NaN) candidates drop on every path.

    Scale: with ``block_col`` (LSH bucket / cluster id — the
    ``embedding_near_dup`` discipline) candidates join EQUI on the
    block; both window passes share ONE anchor-hash exchange (the
    unordered positive-max and the ordered negative rank partition
    identically), and per-anchor state is block-bounded. Without a
    block the join is the exact cross product — the test/oracle shape,
    not the 100 TB one. A fixed-enum block (label groups) keeps blocks
    growing WITH the corpus — the 100 TB form is
    :func:`hard_negative_report_ivf`, whose block cardinality tracks N.

    ``candidates``: an optional separate candidate frame (same id /
    vec / label / block columns) — the IVF path passes anchors probing
    ``nprobe`` lists against candidates living in exactly one list, so
    a pair appears at most once.

    Plan (blocked self-join case): the whole per-anchor fold — pair
    cosines, positive max, negative top-k, status — runs INSIDE one
    ``applyInPandas`` GEMM kernel per block (r11: the join+window form
    shuffled every pair row twice and paid the per-pair Arrow cosine;
    the block is self-contained, so nothing but the anchors×k report
    ever leaves the task — measured 13.6 → 0.8 s warm at sf0.1, and
    the shuffle no longer scales with pairs). The join+window path remains
    for the IVF ``candidates`` form (anchors probe FOREIGN lists) and
    the unblocked oracle shape.
    """
    from pyspark.sql import Window
    if block_col is not None and candidates is None:
        v = emb.select(F.col(block_col).alias("_blk"),
                       F.col(id_col).alias("id"),
                       F.col(label_col).alias("label"),
                       _as_double(vec_col).alias("v"))
        return (v.groupBy("_blk")
                .applyInPandas(
                    _hardneg_block_kernel(k, margin_ppm),
                    "anchor_id long, neg_id long, rank long, "
                    "cosine_sim double, pos_best_sim double, "
                    "status string"))
    blk = [block_col] if block_col else []
    cand = candidates if candidates is not None else emb
    a = emb.select(*blk, F.col(id_col).alias("anchor_id"),
                   F.col(label_col).alias("_la"),
                   _as_double(vec_col).alias("_va"))
    b = cand.select(*blk, F.col(id_col).alias("neg_id"),
                    F.col(label_col).alias("_lb"),
                    _as_double(vec_col).alias("_vb"))
    joined = (a.join(b, blk) if blk else a.crossJoin(b)).filter(
        F.col("anchor_id") != F.col("neg_id"))
    cos6 = F.round(cosine_kernel()(F.col("_va"), F.col("_vb")), 6)
    sc = (joined.select("anchor_id", "neg_id", "_la", "_lb",
                        cos6.alias("_c"))
          .filter(~F.isnan("_c"))
          .withColumn("_ci",
                      F.round(F.col("_c") * 1_000_000).cast("long")))
    w_all = Window.partitionBy("anchor_id")
    sc = sc.withColumn(
        "_pb", F.max(F.when(F.col("_la") == F.col("_lb"),
                            F.col("_ci"))).over(w_all))
    w_rank = Window.partitionBy("anchor_id").orderBy(
        F.desc("_ci"), F.asc("neg_id"))
    out = (sc.filter(F.col("_la") != F.col("_lb"))
           .withColumn("_rn", F.row_number().over(w_rank))
           .filter(F.col("_rn") <= k))
    status = (F.when(F.col("_pb").isNull(), "no_positive")
              .when(F.col("_ci") >= F.col("_pb"), "violation")
              .when(F.col("_ci") + margin_ppm >= F.col("_pb"),
                    "semi_hard")
              .otherwise("easy"))
    return out.select(
        "anchor_id", "neg_id", F.col("_rn").cast("long").alias("rank"),
        F.round(F.col("_ci") / 1_000_000.0, 6).alias("cosine_sim"),
        F.round(F.col("_pb") / 1_000_000.0, 6).alias("pos_best_sim"),
        status.alias("status"))


def hard_negative_report_sql(src: str, k: int = 5,
                             margin_ppm: int = 50_000,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             label_col: str = "label",
                             block_sql: str | None = None) -> str:
    """DuckDB twin of :func:`hard_negative_report` — identical
    micro-cosine integers, window shapes, and status thresholds.
    ``block_sql`` is an expression over the source columns."""
    bsel = f", {block_sql} AS blk" if block_sql else ""
    jn = ("a.blk = b.blk AND a.id <> b.id" if block_sql
          else "a.id <> b.id")
    return f"""
WITH e AS (SELECT {id_col} AS id, {label_col} AS label,
                  CAST({vec_col} AS DOUBLE[]) AS v{bsel}
           FROM {src}),
sc AS MATERIALIZED (
  SELECT anchor_id, neg_id, la, lb,
         CAST(round(c * 1000000) AS BIGINT) AS ci
  FROM (SELECT a.id AS anchor_id, b.id AS neg_id,
               a.label AS la, b.label AS lb,
               round(list_cosine_similarity(a.v, b.v), 6) AS c
        FROM e a JOIN e b ON {jn})
  WHERE NOT isnan(c)),
pb AS (SELECT *, max(CASE WHEN la = lb THEN ci END)
                 OVER (PARTITION BY anchor_id) AS pbest
       FROM sc),
rk AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
                 ORDER BY ci DESC, neg_id) AS rn
       FROM pb WHERE la <> lb)
SELECT anchor_id, neg_id, CAST(rn AS BIGINT) AS rank,
       round(ci / 1000000.0, 6) AS cosine_sim,
       round(pbest / 1000000.0, 6) AS pos_best_sim,
       CASE WHEN pbest IS NULL THEN 'no_positive'
            WHEN ci >= pbest THEN 'violation'
            WHEN ci + {margin_ppm} >= pbest THEN 'semi_hard'
            ELSE 'easy' END AS status
FROM rk WHERE rn <= {k}
"""


def _hardneg_probe_kernel(k: int, margin_ppm_unused: int,
                          tile: int = 1024):
    """applyInPandas kernel for ONE probed list: anchors (role 1)
    against member candidates (role 0) via tiled GEMM; per anchor
    emits its LOCAL top-k negatives (lossless for the global top-k —
    a global winner is top-k within its own list) and its local
    positive max as a sentinel row (neg_id NULL). The global merge
    (max of local positive maxes + re-rank over ≤ nprobe·k
    candidates) happens at candidate scale outside the kernel."""
    import numpy as np
    import pandas as pd

    cols = ["anchor_id", "neg_id", "ci", "pb"]
    empty = pd.DataFrame({c: np.zeros(0, dtype=np.int64)
                          for c in cols})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        A = pdf[pdf["role"] == 1].sort_values("id")
        C = pdf[pdf["role"] == 0].sort_values("id")
        if len(A) == 0 or len(C) == 0:
            return empty
        aid = A["id"].to_numpy(dtype=np.int64)
        cid = C["id"].to_numpy(dtype=np.int64)
        la = A["label"].to_numpy()
        lc = C["label"].to_numpy()
        VA = np.stack(A["v"].to_numpy()).astype(np.float64)
        VC = np.stack(C["v"].to_numpy()).astype(np.float64)
        na = np.sqrt((VA * VA).sum(axis=1))
        nc = np.sqrt((VC * VC).sum(axis=1))
        rows = []
        for lo in range(0, len(aid), tile):
            hi = min(lo + tile, len(aid))
            with np.errstate(divide="ignore", invalid="ignore"):
                S = (VA[lo:hi] @ VC.T) / np.outer(na[lo:hi], nc)
            CI = np.round(np.round(S, 6) * 1_000_000)
            for r in range(hi - lo):
                i = lo + r
                ci = CI[r]
                valid = ~np.isnan(ci) & (cid != aid[i])
                same = valid & (lc == la[i])
                diff = valid & (lc != la[i])
                if same.any():
                    rows.append((int(aid[i]), None, None,
                                 int(ci[same].max())))
                nidx = np.nonzero(diff)[0]
                if nidx.size:
                    order = np.lexsort((cid[nidx], -ci[nidx]))[:k]
                    for j in nidx[order]:
                        rows.append((int(aid[i]), int(cid[j]),
                                     int(ci[j]), None))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=cols)

    return fold


def hard_negative_report_ivf(emb: DataFrame, kc: int = 8,
                             nprobe: int = 2, iters: int = 2,
                             k: int = 5, margin_ppm: int = 50_000,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             label_col: str = "label") -> DataFrame:
    """:func:`hard_negative_report` with IVF blocking — the 100 TB form
    whose block cardinality TRACKS the corpus (kc ∝ N/list-size, the
    margin_alignment_ivf sizing rule) instead of a fixed label enum:
    every candidate lives in exactly its nearest coarse list, every
    anchor probes its ``nprobe`` nearest lists, so a pair appears at
    most once and the negative pool follows the standard IVF
    nprobe/kc recall trade. Candidate generation is the exact-int
    centroid machinery of ``operators.clustering``, so the
    unrolled-Lloyd SQL twin replays the same lists.

    Plan (r11): pair work runs INSIDE a per-list GEMM kernel
    (:func:`_hardneg_probe_kernel`) — each probed list folds its
    anchors' local top-k negatives and local positive max, and only
    ≤ (k+1)·nprobe rows per anchor leave the task; the global merge
    (positive max across probes + re-rank) is a candidate-scale
    window, never a pair shuffle. A pair appears at most once (a
    candidate lives in exactly one list), so no dedup is needed, and
    the local top-k cut is lossless for the global top-k."""
    from pyspark.sql import Window
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        assign_topn_kernel, kmeans_fit)
    assigned, cents = kmeans_fit(emb, k=kc, iters=iters,
                                 id_col=id_col, vec_col=vec_col,
                                 persist=False)
    cand = (assigned.select(F.col("cluster").alias("blk"),
                            F.lit(0).alias("role"),
                            F.col(id_col).alias("id"),
                            F.col(label_col).alias("label"),
                            _as_double(vec_col).alias("v")))
    anch = (emb.withColumn(
        "blk", F.explode(assign_topn_kernel(cents, nprobe)
                         (F.col(vec_col))))
        .select("blk", F.lit(1).alias("role"),
                F.col(id_col).alias("id"),
                F.col(label_col).alias("label"),
                _as_double(vec_col).alias("v")))
    s1 = (cand.unionByName(anch)
          .groupBy("blk")
          .applyInPandas(_hardneg_probe_kernel(k, margin_ppm),
                         "anchor_id long, neg_id long, ci long, "
                         "pb long"))
    pbg = s1.groupBy("anchor_id").agg(F.max("pb").alias("_pb"))
    w = Window.partitionBy("anchor_id").orderBy(F.desc("ci"),
                                                F.asc("neg_id"))
    negs = (s1.filter(F.col("neg_id").isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .join(pbg, "anchor_id"))
    status = (F.when(F.col("_pb").isNull(), "no_positive")
              .when(F.col("ci") >= F.col("_pb"), "violation")
              .when(F.col("ci") + margin_ppm >= F.col("_pb"),
                    "semi_hard")
              .otherwise("easy"))
    return negs.select(
        "anchor_id", "neg_id", F.col("_rn").cast("long").alias("rank"),
        F.round(F.col("ci") / 1_000_000.0, 6).alias("cosine_sim"),
        F.round(F.col("_pb") / 1_000_000.0, 6).alias("pos_best_sim"),
        status.alias("status"))


def hard_negative_report_ivf_sql(src: str, kc: int = 8, nprobe: int = 2,
                                 iters: int = 2, k: int = 5,
                                 margin_ppm: int = 50_000,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 label_col: str = "label") -> str:
    """DuckDB twin of :func:`hard_negative_report_ivf`: the
    unrolled-Lloyd coarse chain (``kmeans_assign_cte``), anchors
    ranked against the SAME final centroids (top-``nprobe``), then the
    hard-negative window chain over the list join."""
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        SCALE, kmeans_assign_cte)
    coarse = kmeans_assign_cte(k=kc, iters=iters, table=src,
                               id_col=id_col, vec_col=vec_col,
                               prefix="rv")
    cent_cte = f"rvc{iters - 1}" if iters > 1 else "rvc0"
    return f"""
WITH {coarse},
lfraw AS (
  SELECT {id_col} AS vec_id, d, CAST(round(x * {SCALE}) AS BIGINT) AS xi
  FROM (SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS x,
               generate_subscripts({vec_col}, 1) AS d FROM {src})),
lfnrm AS (SELECT vec_id, CAST(sum(xi * xi) AS BIGINT) AS ss
          FROM lfraw GROUP BY vec_id),
lfpts AS (
  SELECT r.vec_id, r.d,
         CAST(round(CAST(r.xi AS DOUBLE) * {SCALE}
              / sqrt(CAST(greatest(n.ss, 1) AS DOUBLE))) AS BIGINT) AS xi
  FROM lfraw r JOIN lfnrm n USING (vec_id)),
ld AS (
  SELECT p.vec_id, c.c,
         CAST(sum((p.xi * c.n - c.s) * (p.xi * c.n - c.s)) AS BIGINT)
           AS num, c.n
  FROM lfpts p JOIN {cent_cte} c USING (d)
  GROUP BY p.vec_id, c.c, c.n),
lblk AS (
  SELECT vec_id AS anchor_id, c AS blk FROM (
    SELECT vec_id, c, row_number() OVER (
      PARTITION BY vec_id
      ORDER BY CAST(num AS DOUBLE) / (n * n), c) AS rk
    FROM ld)
  WHERE rk <= {nprobe}),
rblk AS (SELECT vec_id AS neg_id, c AS blk FROM rvaf),
lv AS (SELECT {id_col} AS anchor_id, {label_col} AS la,
              CAST({vec_col} AS DOUBLE[]) AS vl FROM {src}),
rv AS (SELECT {id_col} AS neg_id, {label_col} AS lb,
              CAST({vec_col} AS DOUBLE[]) AS vr FROM {src}),
sc AS MATERIALIZED (
  SELECT anchor_id, neg_id, la, lb,
         CAST(round(c * 1000000) AS BIGINT) AS ci
  FROM (SELECT b.anchor_id, rb.neg_id, lv.la, rv.lb,
               round(list_cosine_similarity(vl, vr), 6) AS c
        FROM lblk b JOIN rblk rb USING (blk)
        JOIN lv USING (anchor_id) JOIN rv USING (neg_id)
        WHERE b.anchor_id <> rb.neg_id)
  WHERE NOT isnan(c)),
pb AS (SELECT *, max(CASE WHEN la = lb THEN ci END)
                 OVER (PARTITION BY anchor_id) AS pbest
       FROM sc),
rk AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
                 ORDER BY ci DESC, neg_id) AS rn
       FROM pb WHERE la <> lb)
SELECT anchor_id, neg_id, CAST(rn AS BIGINT) AS rank,
       round(ci / 1000000.0, 6) AS cosine_sim,
       round(pbest / 1000000.0, 6) AS pos_best_sim,
       CASE WHEN pbest IS NULL THEN 'no_positive'
            WHEN ci >= pbest THEN 'violation'
            WHEN ci + {margin_ppm} >= pbest THEN 'semi_hard'
            ELSE 'easy' END AS status
FROM rk WHERE rn <= {k}
"""

"""Product-quantization (PQ) ANN: the FAISS-style memory-scale path.

A 100 TB embedding corpus cannot hold float32 vectors in executor RAM;
PQ stores each vector as ``m`` one-byte codes (64-dim float32 → 4 bytes
at m=4, a 64× cut) and answers top-k with asymmetric distance
computation (ADC): the query precomputes a tiny m×k distance table to
every codebook centroid, and scoring a vector is ``m`` table lookups +
an integer sum — no per-pair float math at all.

Training follows :mod:`clustering`'s exact-arithmetic discipline so the
whole pipeline is bit-identical across Spark, numpy and the DuckDB
oracle (Jégou et al. 2011 for the algorithm; the exactness scheme is
ours):

- sub-vectors are fixed-point ints ``xi = round(x·SCALE)`` (NO unit
  normalization — PQ quantizes raw residual geometry);
- per-subspace codebooks are Lloyd k-means with exact integer distance
  numerators ``Σ(xi·n − s)²`` (centroid = exact (sum, count) pair);
- the ADC table entry is ``round(num/(n²)·1e6)`` — one divide, one
  multiply, one half-away round, all IEEE-deterministic — stored as
  int64, so the final per-vector score ``Σ_j tab[j][code_j]`` is an
  EXACT integer sum (order-independent, no float accumulation).

Scale shape: training = ``iters`` corpus passes, each one
map-side-combined groupBy shuffling m·k·sub_dims rows (metadata);
codebooks/ADC tables live on the driver like MLlib models and broadcast
into the encode/score kernels. Encoding is a pure Arrow projection;
top-k is TakeOrdered. The corpus is never shuffled, never joined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.clustering import (
    SCALE, Centroid, _round_half_away)

ADC_SCALE = 1_000_000


def _sub_ints(V: np.ndarray) -> np.ndarray:
    """Fixed-point ints of a float vector batch (no normalization)."""
    return _round_half_away(V.astype(np.float64) * SCALE)


def encode_kernel(books: list[list[Centroid]], sub_dims: int):
    """Arrow kernel: vector → array of m codebook codes (argmin of the
    exact-int distance numerator over n², ties → smallest code id)."""
    from pyspark.sql.functions import pandas_udf

    prepared = []
    for cents in books:
        cs = sorted(cents, key=lambda c: c.cid)
        prepared.append((np.stack([np.asarray(c.s, dtype=np.int64)
                                   for c in cs]),
                         np.asarray([c.n for c in cs], dtype=np.int64),
                         np.asarray([c.cid for c in cs], dtype=np.int64)))

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        XI = _sub_ints(np.stack(vecs.to_numpy()))
        out = np.empty((len(XI), len(prepared)), dtype=np.int32)
        for j, (S, N, IDS) in enumerate(prepared):
            Xj = XI[:, j * sub_dims:(j + 1) * sub_dims]
            best = np.full(len(Xj), -1, dtype=np.int64)
            bestd = np.full(len(Xj), np.inf)
            for c in range(len(N)):
                num = ((Xj * N[c] - S[c]) ** 2).sum(axis=1)  # exact int64
                d = num.astype(np.float64) / (N[c] * N[c])
                take = d < bestd
                best[take] = IDS[c]
                bestd[take] = d[take]
            out[:, j] = best
        return pd.Series(list(out))

    return encode


def init_books(emb: DataFrame, m: int, k: int, sub_dims: int,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> list[list[Centroid]]:
    """Deterministic seed: per subspace, the k smallest-id sub-vectors as
    singleton centroids (mirrors :func:`clustering.init_centroids`)."""
    rows = (emb.orderBy(id_col).limit(k)
            .select(F.transform(vec_col,
                                lambda x: F.round(x.cast("double") * SCALE)
                                .cast("long")).alias("iv"))
            .collect())
    books = []
    for j in range(m):
        books.append([
            Centroid(cid=i, s=tuple(r.iv[j * sub_dims:(j + 1) * sub_dims]),
                     n=1)
            for i, r in enumerate(rows)])
    return books


def update_books(encoded: DataFrame, m: int, sub_dims: int,
                 vec_col: str = "embedding",
                 codes_col: str = "codes") -> list[list[Centroid]]:
    """One Lloyd update for ALL subspaces in one shuffle: posexplode the
    int vector, derive (subspace j, within-dim dd, assigned code) per
    element, groupBy (j, code, dd) with map-side combine → m·k·sub_dims
    rows collected as driver metadata."""
    iv = F.transform(F.col(vec_col),
                     lambda x: F.round(x.cast("double") * SCALE)
                     .cast("long"))
    e = (encoded.select(F.col(codes_col).alias("cs"),
                        F.posexplode(iv).alias("d", "xi"))
         .select((F.col("d") / sub_dims).cast("int").alias("j"),
                 F.pmod(F.col("d"), F.lit(sub_dims)).alias("dd"),
                 F.element_at("cs", (F.col("d") / sub_dims).cast("int") + 1)
                 .alias("c"),
                 "xi"))
    rows = (e.groupBy("j", "c", "dd")
            .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
            .collect())
    acc: dict[tuple[int, int], dict[int, int]] = {}
    n_of: dict[tuple[int, int], int] = {}
    for r in rows:
        acc.setdefault((r.j, r.c), {})[r.dd] = r.s
        n_of[(r.j, r.c)] = r.n
    books: list[list[Centroid]] = [[] for _ in range(m)]
    for (j, c) in sorted(acc):
        dims = acc[(j, c)]
        books[j].append(Centroid(
            cid=c, s=tuple(dims[d] for d in range(len(dims))),
            n=n_of[(j, c)]))
    return books


def pq_encode(emb: DataFrame, m: int = 4, k: int = 8, iters: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dims: int | None = None) -> tuple[DataFrame, list[list[Centroid]]]:
    """Train per-subspace codebooks (``iters`` assignment passes,
    ``iters−1`` updates) and return (corpus with ``codes``, books)."""
    if dims is None:
        dims = len(emb.select(vec_col).first()[0])
    sub_dims = dims // m
    books = init_books(emb, m, k, sub_dims, id_col, vec_col)
    enc = emb.withColumn("codes",
                         encode_kernel(books, sub_dims)(F.col(vec_col)))
    for _ in range(iters - 1):
        books = update_books(enc, m, sub_dims, vec_col)
        enc = emb.withColumn("codes",
                             encode_kernel(books, sub_dims)(F.col(vec_col)))
    return enc, books


def adc_table(books: list[list[Centroid]], qvec: list[float],
              sub_dims: int) -> list[list[int]]:
    """Query-side ADC table: ``tab[j][cid] = round(Σ(qi·n−s)²/n²·1e6)``
    as int64 (missing codes → int64-max/4 sentinel, never assigned)."""
    QI = _sub_ints(np.asarray(qvec, dtype=np.float64))
    k_max = max(c.cid for cents in books for c in cents) + 1
    tab: list[list[int]] = []
    for j, cents in enumerate(books):
        Qj = QI[j * sub_dims:(j + 1) * sub_dims]
        row = [2 ** 61] * k_max
        for c in cents:
            S = np.asarray(c.s, dtype=np.int64)
            num = int(((Qj * c.n - S) ** 2).sum())
            row[c.cid] = int(_round_half_away(
                np.float64(num) / (c.n * c.n) * ADC_SCALE))
        tab.append(row)
    return tab


def pq_topk(emb: DataFrame, query_id: int, k: int = 10, m: int = 4,
            k_codes: int = 8, iters: int = 2, id_col: str = "vec_id",
            vec_col: str = "embedding",
            candidates: DataFrame | None = None,
            rerank: int | None = None) -> DataFrame:
    """Top-k by PQ/ADC distance: encode the corpus, build the query's
    ADC table (driver metadata), score = exact int Σ_j tab[j][code_j]
    via array-literal lookups (pure codegen projection), TakeOrdered.

    ``candidates`` (optional, an ``id_col`` frame) restricts SCORING to
    a candidate set via a semi-join — codebooks still train on the full
    corpus (an IVF probe narrows who is scored, never what the
    quantizer learned).

    ``rerank`` (optional, R > k): the FAISS ``IndexRefineFlat`` pattern —
    ADC is a COARSE ranker, and with small codebooks whole neighborhoods
    tie in one code cell (measured: 67-way tie at the minimum on a 20k
    clustered corpus), so the id tiebreak buries true neighbors. With
    rerank, the top-R by ADC (R rows — driver-scale) are re-scored by
    EXACT fixed-point integer L2 against the full vectors and the top-k
    of that ordering returns. Output schema is unchanged; only the
    ordering becomes exact."""
    dims = len(emb.select(vec_col).first()[0])
    sub_dims = dims // m
    enc, books = pq_encode(emb, m, k_codes, iters, id_col, vec_col, dims)
    if candidates is not None:
        enc = enc.join(candidates.select(id_col), id_col, "semi")
    qvec = emb.filter(F.col(id_col) == query_id).select(vec_col).first()[0]
    tab = adc_table(books, qvec, sub_dims)
    terms = [
        F.element_at(F.array(*[F.lit(v).cast("long") for v in tab[j]]),
                     F.element_at("codes", j + 1) + 1)
        for j in range(m)]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    scores = (enc.filter(F.col(id_col) != query_id)
              .select(F.col(id_col).alias("id"), total.alias("adc_dist6")))
    if rerank is None:
        return scores.orderBy("adc_dist6", "id").limit(k)
    # materialize once: the cutoff action below AND the candidate filter
    # both consume `scores`, whose lineage is the full-corpus pandas_udf
    # encode pass — without this the corpus is encoded twice per query
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    scores = checkpoint_df(scores, eager=False)
    qi = _sub_ints(np.asarray(qvec, dtype=np.float64))
    qarr = F.array(*[F.lit(int(x)).cast("long") for x in qi])
    # tie-COMPLETE pool: every row at or below the R-th ADC distance —
    # an id-tiebroken top-R silently drops true neighbors whenever one
    # code cell's tie group exceeds R (measured: recall collapsed 0.4→0.1
    # as the corpus grew and the minimum cell outgrew the pool)
    cutoff = (scores.orderBy("adc_dist6").limit(max(rerank, k))
              .agg(F.max("adc_dist6")).first()[0])
    cand = scores.filter(F.col("adc_dist6") <= cutoff)
    xi = F.transform(F.col(vec_col),
                     lambda x: F.round(x.cast("double") * SCALE)
                     .cast("long"))
    l2 = F.aggregate(F.zip_with(xi, qarr, lambda a, b: (a - b) * (a - b)),
                     F.lit(0).cast("long"), lambda acc, v: acc + v)
    # join FIRST, score after: only pool rows pay the exact-L2 fold
    return (cand.join(emb.select(F.col(id_col).alias("id"), vec_col), "id")
            .select("id", "adc_dist6", l2.alias("_l2"))
            .orderBy("_l2", "id").limit(k)
            .select("id", "adc_dist6"))


def ivfpq_topk(emb: DataFrame, query_id: int, k: int = 10, kc: int = 10,
               nprobe: int = 3, c_iters: int = 2, m: int = 4,
               k_codes: int = 8, iters: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding",
               rerank: int | None = None) -> DataFrame:
    """IVF + PQ (the FAISS ``IVFADC`` index, Jégou et al. 2011 §V): a
    coarse spherical k-means partitions the corpus into ``kc`` inverted
    lists; a query probes only its ``nprobe`` nearest lists and
    ADC-scores just those members. At 100 TB this is the difference
    between scanning every code and scanning ``nprobe/kc`` of them —
    the probe set is driver metadata (kc centroid distances), the
    candidate restriction is a semi-join that prunes before any
    scoring work.

    Exactness: the probe ranks centroids by the same exact-int distance
    numerator the assignment kernel uses (``Σ(qi·n−s)²`` int64, one
    IEEE divide), ties → smaller cluster id; the SQL twin reproduces
    the ranking bit-for-bit.
    """
    import numpy as np

    from rgd_rnaseq_workflows_spark.operators.clustering import (
        SCALE as CSCALE, _round_half_away, kmeans_fit)

    assigned, cents = kmeans_fit(emb, kc, c_iters, id_col, vec_col)
    qvec = emb.filter(F.col(id_col) == query_id).select(vec_col).first()[0]
    XI = _round_half_away(np.asarray(qvec, dtype=np.float64) * CSCALE)
    ss = max(int((XI * XI).sum()), 1)
    XI = _round_half_away(XI.astype(np.float64) * CSCALE
                          / np.sqrt(np.float64(ss)))
    ranked = sorted(
        (float(int(((XI * c.n - np.asarray(c.s, dtype=np.int64)) ** 2)
                   .sum())) / (c.n * c.n), c.cid)
        for c in cents)
    probe = [cid for _, cid in ranked[:nprobe]]
    cand = assigned.filter(F.col("cluster").isin(probe)).select(id_col)
    return pq_topk(emb, query_id, k, m, k_codes, iters, id_col, vec_col,
                   candidates=cand, rerank=rerank)


# --- oracle SQL builder -------------------------------------------------------

def pq_topk_sql(table: str = "embeddings", query_id: int = 0, k: int = 10,
                m: int = 4, k_codes: int = 8, iters: int = 2, dims: int = 64,
                id_col: str = "vec_id", vec_col: str = "embedding",
                extra_ctes: str = "", cand_cte: str | None = None,
                rerank: int | None = None) -> str:
    """The full PQ pipeline unrolled in exact-int SQL: fixed-point
    sub-vectors → seeded Lloyd per subspace (all subspaces in one CTE
    chain, ``j`` as a grouping column) → ADC table → integer-sum top-k.
    Mirrors :func:`pq_topk` operation-for-operation.

    ``extra_ctes``/``cand_cte`` are the IVF injection points: extra CTEs
    are prepended to the WITH chain, and when ``cand_cte`` names one of
    them (a ``vec_id`` set), scoring is restricted to its members —
    the SQL form of :func:`pq_topk`'s ``candidates`` semi-join."""
    sub_dims = dims // m
    head = f"""raw AS (
  SELECT {id_col} AS vec_id,
         CAST((d - 1) // {sub_dims} AS INTEGER) AS j,
         CAST((d - 1) % {sub_dims} AS INTEGER) AS dd,
         CAST(round(x * {SCALE}) AS BIGINT) AS xi
  FROM (SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS x,
               generate_subscripts({vec_col}, 1) AS d FROM {table})),
seed_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
  FROM (SELECT {id_col} AS vec_id FROM {table}
        ORDER BY {id_col} LIMIT {k_codes})),
c0 AS (
  SELECT r.j, s.c, r.dd, r.xi AS s, CAST(1 AS BIGINT) AS n
  FROM raw r JOIN seed_ids s USING (vec_id))"""
    chain = [head]
    prev = "c0"
    for it in range(1, iters + 1):
        chain.append(f"""d{it} AS (
  SELECT r.vec_id, r.j, c.c,
         CAST(sum((r.xi * c.n - c.s) * (r.xi * c.n - c.s)) AS BIGINT)
           AS num,
         c.n
  FROM raw r JOIN {prev} c ON c.j = r.j AND c.dd = r.dd
  GROUP BY r.vec_id, r.j, c.c, c.n),
a{it} AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c, row_number() OVER (
      PARTITION BY vec_id, j
      ORDER BY CAST(num AS DOUBLE) / (n * n), c) AS rk
    FROM d{it})
  WHERE rk = 1)""")
        if it < iters:
            chain.append(f"""c{it} AS (
  SELECT r.j, a.code AS c, r.dd, CAST(sum(r.xi) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM raw r JOIN a{it} a ON a.vec_id = r.vec_id AND a.j = r.j
  GROUP BY r.j, a.code, r.dd)""")
            prev = f"c{it}"
    chain.append(f"""qsub AS (
  SELECT j, dd, xi FROM raw WHERE vec_id = {query_id}),
tab AS (
  SELECT c.j, c.c,
         CAST(round(CAST(num AS DOUBLE) / (n * n) * {ADC_SCALE}) AS BIGINT)
           AS di
  FROM (SELECT b.j, b.c, b.n,
               CAST(sum((q.xi * b.n - b.s) * (q.xi * b.n - b.s)) AS BIGINT)
                 AS num
        FROM {prev if iters == 1 else f'c{iters - 1}'} b
        JOIN qsub q ON q.j = b.j AND q.dd = b.dd
        GROUP BY b.j, b.c, b.n) AS c)""")
    cand = (f"\n  WHERE a.vec_id IN (SELECT vec_id FROM {cand_cte})"
            if cand_cte else "")
    chain.append(f"""scores AS (
  SELECT a.vec_id AS id, CAST(sum(t.di) AS BIGINT) AS adc_dist6
  FROM a{iters} a JOIN tab t ON t.j = a.j AND t.c = a.code{cand}
  GROUP BY a.vec_id)""")
    if rerank is not None:
        # tie-complete exact-L2 rerank twin: cutoff = R-th ADC distance,
        # pool = every id at or below it, exact Σ(xa−xq)² over the SAME
        # fixed-point ints the raw CTE already holds
        chain.append(f"""spos AS MATERIALIZED (
  SELECT id, adc_dist6 FROM scores WHERE id != {query_id}),
cutv AS MATERIALIZED (
  SELECT max(adc_dist6) AS c FROM (
    SELECT adc_dist6 FROM spos ORDER BY adc_dist6
    LIMIT {max(rerank, k)})),
pool AS MATERIALIZED (
  SELECT id FROM spos, cutv WHERE adc_dist6 <= c),
ql2 AS MATERIALIZED (
  SELECT j, dd, xi FROM raw WHERE vec_id = {query_id}),
rl2 AS MATERIALIZED (
  SELECT r.vec_id AS id,
         CAST(sum((r.xi - q.xi) * (r.xi - q.xi)) AS BIGINT) AS l2
  FROM raw r JOIN ql2 q ON q.j = r.j AND q.dd = r.dd
  JOIN pool p ON p.id = r.vec_id
  GROUP BY r.vec_id)""")
        body = ",\n".join(chain)
        head_ctes = f"{extra_ctes},\n" if extra_ctes else ""
        return f"""
WITH {head_ctes}{body}
SELECT s.id, s.adc_dist6
FROM spos s JOIN rl2 USING (id)
ORDER BY rl2.l2, s.id LIMIT {k}
"""
    body = ",\n".join(chain)
    head_ctes = f"{extra_ctes},\n" if extra_ctes else ""
    return f"""
WITH {head_ctes}{body}
SELECT id, adc_dist6 FROM scores
WHERE id != {query_id}
ORDER BY adc_dist6, id LIMIT {k}
"""


def ivfpq_topk_sql(table: str = "embeddings", query_id: int = 0, k: int = 10,
                   kc: int = 10, nprobe: int = 3, c_iters: int = 2,
                   m: int = 4, k_codes: int = 8, iters: int = 2,
                   dims: int = 64, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`ivfpq_topk`: the coarse k-means chain
    (``iv``-prefixed at generation time to avoid CTE-name collisions
    with the PQ chain), the exact-int probe ranking, then the PQ chain
    scored only on probed-cluster members."""
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        kmeans_assign_cte)

    km = kmeans_assign_cte(k=kc, iters=c_iters, table=table,
                           id_col=id_col, vec_col=vec_col, prefix="iv")
    final_cents = f"ivc{c_iters - 1}" if c_iters > 1 else "ivc0"
    probe = f"""{km},
ivq AS (SELECT d, xi FROM ivpts WHERE vec_id = {query_id}),
ivpd AS (
  SELECT c.c,
         CAST(sum((q.xi * c.n - c.s) * (q.xi * c.n - c.s)) AS BIGINT)
           AS num,
         c.n
  FROM {final_cents} c JOIN ivq q USING (d) GROUP BY c.c, c.n),
ivprobe AS (
  SELECT c FROM (
    SELECT c, row_number() OVER (
      ORDER BY CAST(num AS DOUBLE) / (n * n), c) AS rk
    FROM ivpd)
  WHERE rk <= {nprobe}),
ivcand AS (
  SELECT vec_id FROM ivaf WHERE c IN (SELECT c FROM ivprobe))"""
    return pq_topk_sql(table, query_id, k, m, k_codes, iters, dims,
                       id_col, vec_col, extra_ctes=probe,
                       cand_cte="ivcand")

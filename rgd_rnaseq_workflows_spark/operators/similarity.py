"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
variant as the scale path (candidate generation via random-hyperplane
signs derived from the portable md5 hash family — deterministic, no
stored model). All arithmetic is built-in ``aggregate``/``zip_with`` on
JVM arrays: no UDF, no collect of the corpus.
"""

from __future__ import annotations

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


def lsh_topk(emb: DataFrame, query: DataFrame, dims: int, k: int = 10,
             n_planes: int = 16, max_hamming: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: prune the corpus to vectors whose hyperplane
    signature is within ``max_hamming`` bits of the query's, then exact
    cosine on the survivors. At scale the signature is precomputed and
    bucketed; here it is inlined for a self-contained plan."""
    sig = hyperplane_signature(_as_double(vec_col), dims, n_planes)
    corpus = emb.withColumn("_sig", sig)
    q = query.withColumn("_qsig",
                         hyperplane_signature(F.col("qvec"), dims, n_planes))
    scored = (corpus.crossJoin(F.broadcast(q))
              .filter(F.bit_count(F.col("_sig").bitwiseXOR(F.col("_qsig")))
                      <= max_hamming)
              .select(F.col(id_col),
                      F.round(cosine(_as_double(vec_col),
                                     F.col("qvec")), 6).alias("cosine_sim")))
    return scored.orderBy(F.desc("cosine_sim"), id_col).limit(k)


def embedding_near_dup(emb: DataFrame, block_col: str = "label",
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on ``block_col``
    (cluster/label/LSH bucket) so the pair join is equi, never cross."""
    v = emb.select(F.col(id_col), F.col(block_col).alias("_blk"),
                   _as_double(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (a.join(b, F.col("a._blk") == F.col("b._blk"))
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))

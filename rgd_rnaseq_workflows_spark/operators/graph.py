"""Iterative graph analytics over document-similarity graphs.

Beyond connected components (operators/components.py), the other classic
iterative shape a corpus pipeline runs is PageRank-style importance over
a near-duplicate / citation / link graph — e.g. picking the canonical
representative of a duplicate cluster by centrality instead of min-id,
or weighting a crawl frontier.

Engine-portable exactness: ranks are fixed-point integers (RANK_SCALE),
the degree division is integer ``div`` (floor — positive operands, so
Spark's ``div`` and DuckDB's ``//`` agree), and the damping factor is a
rational ``damping_pct/100`` applied as integer multiply-then-div. Every
iteration is therefore bit-identical across engines and partition
orders — the oracle unrolls the same T iterations in SQL.

Scale design: one shuffle per iteration (groupBy dst of the contribution
join); the rank table is |V| rows, edges |E| rows, both partitioned by
node key; lineage is checkpoint-truncated every iteration via
``checkpoint_df`` (reliable checkpoint when a dir is configured) —
the same pattern the components fixpoint uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.session import checkpoint_df

RANK_SCALE = 1_000_000_000  # 1e9 fixed-point rank units


def _sym_edges(pairs: DataFrame, src: str = "id_a",
               dst: str = "id_b") -> DataFrame:
    """Undirected pair list → symmetric directed edge list."""
    a = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    b = pairs.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    return a.unionByName(b)


def pagerank(pairs: DataFrame, iters: int = 3, damping_pct: int = 85,
             src: str = "id_a", dst: str = "id_b",
             checkpoint_every: int = 5) -> DataFrame:
    """Fixed-point PageRank over the undirected graph of ``pairs``.

    Nodes are the ids appearing in any pair (symmetric edges ⇒ no
    dangling nodes). Returns (id, rank) with
    ``rank = r_int / RANK_SCALE`` rounded to 6 — r_int exact-integer all
    the way: r₀ = RANK_SCALE;
    r_{t+1} = (100-d)·S/100 + d/100 · Σ_{u→v} (r_t(u) div deg(u)).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct={damping_pct} outside (0,100)")
    edges = _sym_edges(pairs, src, dst)
    deg = edges.groupBy("u").agg(F.count("*").cast("long").alias("deg"))
    # lazy (r11): the loop runs no per-round action (fixed iters,
    # cadence truncation below), so the blocks materialize inside the
    # caller's single action and the ranks-init + every iteration
    # reuse them — the eager form paid a separate materialization job.
    # Measured 3.45 -> 3.01 s on graph_pagerank_neardup at sf0.1.
    edges = checkpoint_df(edges.join(deg, "u"), eager=False)
    teleport = (100 - damping_pct) * RANK_SCALE // 100
    # ranks init off the CHECKPOINTED frame: deriving it from `deg`
    # would re-run the caller's whole pair GENERATION a second time
    # (deg's lineage is the pre-checkpoint edge list — measured as the
    # bulk of graph_pagerank_neardup's wall, pair gen replayed once
    # for the iterations and once for the init)
    ranks = (edges.groupBy("u").agg(F.count("*"))
             .select("u", F.lit(RANK_SCALE).cast("long").alias("r")))
    for t in range(1, iters + 1):
        contrib = (edges.join(ranks, "u")
                   .select(F.col("v").alias("u"),
                           F.expr("r div deg").alias("c")))
        ranks = (contrib.groupBy("u")
                 .agg(F.sum("c").cast("long").alias("_in"))
                 .select("u",
                         (F.lit(teleport).cast("long")
                          + F.expr(f"(_in * {damping_pct}) div 100"))
                         .alias("r")))
        # truncate lineage periodically, not per-round: an eager
        # checkpoint is a full job, and a 3-iteration plan is shallow
        # enough to leave fused — the cadence only matters for long runs
        if t % checkpoint_every == 0 and t < iters:
            ranks = checkpoint_df(ranks)
    return ranks.select(F.col("u").alias("id"),
                        F.round(F.col("r") / RANK_SCALE, 6).alias("rank"))


def pagerank_sql(pairs_sql: str, iters: int = 3,
                 damping_pct: int = 85) -> str:
    """DuckDB twin of :func:`pagerank`: the identical integer iteration
    unrolled. ``pairs_sql`` must yield columns (id_a, id_b)."""
    teleport = (100 - damping_pct) * RANK_SCALE // 100
    chain = [f"""pairs AS MATERIALIZED ({pairs_sql}),
edges AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs),
deg AS MATERIALIZED (
  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
r0 AS (SELECT u, CAST({RANK_SCALE} AS BIGINT) AS r FROM deg)"""]
    prev = "r0"
    for t in range(1, iters + 1):
        chain.append(f"""r{t} AS MATERIALIZED (
  SELECT e.v AS u,
         CAST({teleport} + (sum(r.r // d.deg) * {damping_pct}) // 100
              AS BIGINT) AS r
  FROM edges e JOIN {prev} r ON e.u = r.u JOIN deg d ON e.u = d.u
  GROUP BY e.v)""")
        prev = f"r{t}"
    body = ",\n".join(chain)
    return f"""
WITH {body}
SELECT u AS id, round(CAST(r AS DOUBLE) / {RANK_SCALE}, 6) AS rank
FROM {prev}"""


def centrality_keepers(pairs: DataFrame, iters: int = 3,
                       damping_pct: int = 85) -> DataFrame:
    """Canonical-document selection by CENTRALITY instead of min-id:
    per duplicate cluster, keep the member with the highest PageRank
    over the near-dup graph (ties → min id) — the hub that most other
    duplicates point at, usually the original.

    (comp, n_members, keeper_id, keeper_rank). Composes the two
    consumers of one pair graph — connected components and pagerank —
    so callers should pass a CHECKPOINTED pair frame
    (``plans.neardup.near_dup_pairs_cached``): both replay the cached
    edge scan, the pair join runs once. Ranks are the exact fixed-point
    integers rounded once, so the argmax ordering is engine-identical.
    """
    from pyspark.sql import Window

    from rgd_rnaseq_workflows_spark.operators.components import (
        connected_components)
    comps = connected_components(pairs)
    ranks = pagerank(pairs, iters=iters, damping_pct=damping_pct)
    w = Window.partitionBy("comp").orderBy(F.desc("rank"), "id")
    return (comps.join(ranks, "id")
            .withColumn("_rk", F.row_number().over(w))
            .withColumn("n_members",
                        F.count("*").over(Window.partitionBy("comp"))
                        .cast("long"))
            .filter(F.col("_rk") == 1)
            .select("comp", "n_members",
                    F.col("id").alias("keeper_id"),
                    F.col("rank").alias("keeper_rank")))


def centrality_keepers_sql(pairs_sql: str, iters: int = 3,
                           damping_pct: int = 85) -> str:
    """DuckDB twin: recursive-CTE components + the unrolled integer
    pagerank, argmax per component by (rank DESC, id). The pair CTE is
    MATERIALIZED once and the nested pagerank chain references it
    (``SELECT * FROM cpairs``) instead of re-deriving the pairs —
    halves the oracle's cost."""
    pr = pagerank_sql("SELECT * FROM cpairs", iters, damping_pct).strip()
    return f"""
WITH RECURSIVE cpairs AS MATERIALIZED ({pairs_sql}),
cedges AS (SELECT id_a AS a, id_b AS b FROM cpairs
           UNION SELECT id_b, id_a FROM cpairs),
reach(id, lbl) AS (
  SELECT a, a FROM cedges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN cedges e ON e.a = r.id),
comps AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
pr AS (SELECT * FROM ({pr}) q),
ranked AS (
  SELECT c.comp, c.id, p.rank,
         row_number() OVER (PARTITION BY c.comp
                            ORDER BY p.rank DESC, c.id) AS rk,
         count(*) OVER (PARTITION BY c.comp) AS nm
  FROM comps c JOIN pr p ON c.id = p.id)
SELECT comp, CAST(nm AS BIGINT) AS n_members, id AS keeper_id,
       rank AS keeper_rank
FROM ranked WHERE rk = 1"""


def triangle_stats(pairs: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Global triangle census of an undirected pair graph — the cluster
    DENSITY diagnostic for a near-dup graph (a high transitivity means
    duplicate clusters are tight cliques that collapse safely; a low
    one means chains of borderline matches that a single threshold
    would over-merge): one row
    (n_nodes, n_edges, n_wedges, n_triangles, transitivity) with
    ``transitivity = 3·triangles / wedges`` (the global clustering
    coefficient), NULL on a wedge-free graph.

    Scale shape — the degree-ordered NODE-ITERATOR (compact-forward):
    every edge is oriented from its lower (deg, id) endpoint to the
    higher, which turns the graph into a DAG whose out-degrees are
    O(√E) amortized, so the wedge self-join (out-neighbor pairs per
    source) never explodes on hubs — the textbook fix for the naive
    edge-iterator that squares a celebrity node's degree. Wedge
    closure is one more equi-join against the oriented edge list; the
    ordering key is a (deg, id) STRUCT comparison (no packed-integer
    overflow at any degree). Counts are exact integers; the wedge
    total is Σ deg·(deg−1)/2, computed long-exact.
    """
    # the edge list feeds degree, orientation and closure — checkpoint
    # it (and the oriented DAG below) so upstream pair GENERATION runs
    # once, not once per consumer (the centrality_keepers pattern;
    # without this the plan replays the pair join ~6×)
    e = checkpoint_df(
        pairs.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct())
    deg = (_sym_edges(e, "a", "b")
           .groupBy("u").agg(F.count("*").cast("long").alias("deg")))
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("degb"))
    ka = F.struct(F.col("dega").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("degb").alias("d"), F.col("b").alias("i"))
    o = checkpoint_df(
        e.join(da, "a").join(db, "b")
        .select(F.when(ka < kb, F.col("a")).otherwise(F.col("b"))
                .alias("u"),
                F.when(ka < kb, F.col("b")).otherwise(F.col("a"))
                .alias("v"),
                F.when(ka < kb, kb).otherwise(ka).alias("kv")))
    w1 = o.select("u", F.col("v").alias("x"), F.col("kv").alias("kx"))
    w2 = o.select("u", F.col("v").alias("y"), F.col("kv").alias("ky"))
    wedges = (w1.join(w2, "u")
              .filter(F.col("kx") < F.col("ky"))
              .select("x", "y"))
    closed = wedges.join(o.select(F.col("u").alias("x"),
                                  F.col("v").alias("y")), ["x", "y"])
    tri = closed.agg(F.count("*").cast("long").alias("n_triangles"))
    stats = (deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.expr("sum(deg) div 2").cast("long").alias("n_edges"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long")
        .alias("n_wedges")))
    return (stats.crossJoin(tri)   # two 1-row frames
            .select("n_nodes", "n_edges", "n_wedges", "n_triangles",
                    F.when(F.col("n_wedges") > 0,
                           F.round(3 * F.col("n_triangles")
                                   / F.col("n_wedges").cast("double"), 6))
                    .alias("transitivity")))


def triangle_stats_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`triangle_stats` — identical orientation
    (row-value (deg, id) comparison), wedge closure and exact counts.
    ``pairs_sql`` must yield columns (id_a, id_b)."""
    return f"""
WITH tpairs AS MATERIALIZED ({pairs_sql}),
e AS MATERIALIZED (
  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
  FROM tpairs WHERE id_a <> id_b),
deg AS MATERIALIZED (
  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS u FROM e UNION ALL SELECT b FROM e) GROUP BY u),
o AS MATERIALIZED (
  SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END
           AS u,
         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END
           AS v,
         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg
              ELSE da.deg END AS dv
  FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM o w1 JOIN o w2 ON w1.u = w2.u
                     AND (w1.dv, w1.v) < (w2.dv, w2.v)
  JOIN o c ON c.u = w1.v AND c.v = w2.v),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN round(3.0 * n_triangles / n_wedges, 6) END
         AS transitivity
FROM stats, tri"""


def k_core(pairs: DataFrame, k: int = 2, src: str = "id_a",
           dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """k-core decomposition of the undirected pair graph: iteratively
    peel every vertex of degree < ``k`` until the fixpoint, then report
    the surviving vertices with their within-core degree — (id,
    core_deg).  On a near-dup graph the 2-core separates genuine
    duplicate CLIQUES (template farms, mirrored sites) from incidental
    chain/star matches that a pure connected-components view lumps
    together; the 3-core is the standard dense-community filter.

    Scale design (100 TB corpora → pair-scale graphs): state is only
    the surviving EDGE list; each round is one vertex-scale degree
    aggregation + one semi-join back onto edges (both keyed on compact
    ids), checkpointed per round to keep the iterative lineage flat.
    Peeling is monotone (edges only leave), so the count fixpoint IS
    the set fixpoint; like ``connected_components``, a graph that has
    not converged within ``max_iter`` raises rather than returning a
    wrong core (peeling converges in <= #vertices rounds; real near-dup
    graphs take a handful).

    ``pairs`` must be distinct undirected pairs (the near-dup
    generators' contract); symmetrization dedups defensively to match
    the SQL twin's UNION.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # lazy + count: the count action materializes the checkpoint blocks
    # itself — eager would run a separate materialization job per round
    edges = checkpoint_df(_sym_edges(pairs, src, dst).distinct(),
                          eager=False)
    n_prev = edges.count()
    if n_prev == 0:
        return edges.select(F.col("u").alias("id"),
                            F.lit(0).cast("long").alias("core_deg"))
    for _ in range(max_iter):
        keep = (edges.groupBy("u").agg(F.count("*").alias("_deg"))
                .filter(F.col("_deg") >= k).select("u"))
        edges = checkpoint_df(
            edges.join(keep, "u")
            .join(keep.withColumnRenamed("u", "v"), "v")
            .select("u", "v"), eager=False)
        n_cur = edges.count()
        if n_cur == n_prev:
            break
        n_prev = n_cur
    else:
        raise RuntimeError(
            f"k_core: no fixpoint after {max_iter} peeling rounds — "
            f"raise max_iter (rounds are one agg + one semi-join each)")
    return (edges.groupBy("u")
            .agg(F.count("*").cast("long").alias("core_deg"))
            .select(F.col("u").alias("id"), "core_deg"))


def k_core_sql(pairs_sql: str, k: int = 2, iters: int = 20) -> str:
    """DuckDB twin of :func:`k_core`: the peel is a recursive CTE whose
    working set is the surviving edge list, degrees via COUNT windows
    (single reference to the recursive table), iterated a fixed
    ``iters`` rounds — past the fixpoint each round reproduces the same
    edges under a new iteration stamp, so ``iter = iters`` IS the
    fixpoint whenever peeling converged within the bound. A guard arm
    compares the last two iterations' edge counts and calls ``error()``
    on mismatch, so a too-small ``iters`` FAILS loudly instead of
    returning a non-fixpoint partial core (the Spark twin raises; a
    standalone SQL user gets the same signal)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges0 AS (SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
core(iter, u, v) AS (
  SELECT 0, u, v FROM edges0
  UNION
  SELECT iter + 1, u, v FROM (
    SELECT iter, u, v,
           count(*) OVER (PARTITION BY iter, u) AS du,
           count(*) OVER (PARTITION BY iter, v) AS dv
    FROM core) s
  WHERE du >= {k} AND dv >= {k} AND iter < {iters}),
guard AS (
  SELECT CASE WHEN (SELECT count(*) FROM core WHERE iter = {iters}) =
                   (SELECT count(*) FROM core WHERE iter = {iters - 1})
         THEN 1 ELSE error('k_core_sql: no fixpoint within {iters} '
                           'peeling rounds - raise iters') END AS ok)
SELECT u AS id, CAST(count(*) AS BIGINT) AS core_deg
FROM core JOIN guard ON guard.ok = 1 WHERE iter = {iters} GROUP BY u
"""


def assortativity_report(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b") -> DataFrame:
    """Degree assortativity of the undirected pair graph — Newman's r:
    the Pearson correlation of the degrees at the two ends of every
    edge (both orientations, the standard undirected convention). A
    near-dup graph with r ≫ 0 is hub-clustered (template farms linking
    to template farms — dedup components will be giant); r < 0 means
    hubs attach to leaves (star-shaped duplicate families — components
    stay shallow). The number a graph-aware dedup reads next to
    :func:`triangle_stats` before choosing the component strategy.

    Exactness: degrees are exact counts; all five correlation moments
    accumulate as decimal(38,0) over the directed edge list (the
    group_trend/Neyman discipline — the numerators
    ``num = m·Sxy − Sx·Sy`` etc. are exact integers), and
    ``r_milli = round(10³·num/√(dx·dy))`` is one fixed double tree
    (IEEE sqrt of exact-integer doubles). A degree-regular graph has
    dx = dy = 0 — r is undefined and both engines report NULL.

    Scale shape: degree table via one map-side-combined groupBy; two
    equi-joins attach end degrees at edge scale; one aggregation to a
    single metadata row. No window, no pair-of-pairs blowup. The edge
    list is checkpoint-truncated first (the triangle_stats/LPA
    pattern): deg, ends and nodes all replay the materialized edge
    scan instead of re-running the caller's pair GENERATION once per
    consuming subtree."""
    edges = checkpoint_df(_sym_edges(pairs, src, dst))
    deg = edges.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    ends = (edges.join(deg, "u")
            .withColumnRenamed("d", "du")
            .join(deg.select(F.col("u").alias("v"),
                             F.col("d").alias("dv")), "v"))
    x = F.col("du").cast("decimal(38,0)")
    y = F.col("dv").cast("decimal(38,0)")
    st = ends.agg(F.count("*").cast("decimal(38,0)").alias("m"),
                  F.sum(x).alias("sx"), F.sum(y).alias("sy"),
                  F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
                  F.sum(x * y).alias("sxy"))
    st = (st.withColumn("num", F.expr("m * sxy - sx * sy"))
          .withColumn("dx", F.expr("m * sxx - sx * sx"))
          .withColumn("dy", F.expr("m * syy - sy * sy")))
    nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"),
                    F.sum("d").cast("long").alias("_dsum"))
    bad = (F.col("dx") == 0) | (F.col("dy") == 0)
    return (st.crossJoin(F.broadcast(nodes))
            .select(F.col("n_nodes"),
                    (F.col("m") / 2).cast("long").alias("n_edges"),
                    F.expr("1000 * _dsum div n_nodes").cast("long")
                    .alias("mean_degree_milli"),
                    F.when(bad, F.lit(None)).otherwise(F.round(
                        F.lit(1e3) * F.col("num").cast("double")
                        / F.sqrt(F.col("dx").cast("double")
                                 * F.col("dy").cast("double"))))
                    .cast("long").alias("assortativity_milli")))


def assortativity_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`assortativity_report` — HUGEINT moments,
    identical double tree."""
    return f"""
WITH pairs AS ({pairs_sql}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY u),
ends AS (
  SELECT CAST(a.d AS HUGEINT) AS du, CAST(b.d AS HUGEINT) AS dv
  FROM edges e JOIN deg a ON a.u = e.u JOIN deg b ON b.u = e.v),
st AS (
  SELECT CAST(count(*) AS HUGEINT) AS m,
         sum(du) AS sx, sum(dv) AS sy,
         sum(du * du) AS sxx, sum(dv * dv) AS syy,
         sum(du * dv) AS sxy
  FROM ends),
mo AS (SELECT m, m * sxy - sx * sy AS num,
              m * sxx - sx * sx AS dx, m * syy - sy * sy AS dy
       FROM st),
nodes AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST(sum(d) AS BIGINT) AS dsum FROM deg)
SELECT n_nodes, CAST(m // 2 AS BIGINT) AS n_edges,
       CAST(1000 * dsum // n_nodes AS BIGINT) AS mean_degree_milli,
       CASE WHEN dx = 0 OR dy = 0 THEN NULL
            ELSE CAST(round(1e3 * CAST(num AS DOUBLE)
                            / sqrt(CAST(dx AS DOUBLE)
                                   * CAST(dy AS DOUBLE))) AS BIGINT)
       END AS assortativity_milli
FROM mo, nodes
"""


def label_propagation_communities(pairs: DataFrame, iters: int = 3,
                                  src: str = "id_a",
                                  dst: str = "id_b") -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007) — communities ≠ connectivity: a bridge
    between two dense near-dup families keeps them ONE connected
    component but TWO communities, and dedup keeper policies / split
    hygiene often want the community grain. Deterministic variant:
    every node simultaneously adopts the MODE of its neighbors'
    previous labels (count desc, label asc tiebreak; labels start as
    node ids), ``iters`` fixed rounds — no random order, no early
    stop, so both engines walk the identical label trajectory
    (synchronous LPA can oscillate on bipartite stars; a fixed round
    count makes that a deterministic, documented outcome rather than
    a nontermination).

    Output: one row per final community — (community, n_members,
    min_member), the :func:`cluster_keepers` shape at the community
    grain.

    Scale shape: per round ONE edge-scale join (labels onto edge
    sources, shuffle co-keyed on node) + ONE map-side-combined
    (node, label) count + ONE argmax-by-struct aggregation (max of
    (count, −label) — no per-node window); labels are
    checkpoint-truncated each round exactly like the pagerank loop.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # lazy edge checkpoint + cadence label truncation (r11, the
    # pagerank discipline): the loop runs NO per-round action — rounds
    # are fixed, there is no convergence probe — so an eager checkpoint
    # per round paid iters extra job launches for lineage that a
    # 3-round plan keeps shallow anyway. Edges materialize once inside
    # the single final action and all round joins + the label init
    # reuse the blocks; labels re-truncate every 5 rounds only (long
    # runs stay bounded). Measured 3.83 -> 3.32 s at sf0.1 on the
    # simhash graph, identical communities.
    edges = checkpoint_df(_sym_edges(pairs, src, dst), eager=False)
    labels = edges.select("u").distinct() \
        .select("u", F.col("u").alias("lab"))
    for t in range(1, iters + 1):
        votes = (edges.join(labels, "u")
                 .groupBy(F.col("v").alias("u"), "lab")
                 .agg(F.count("*").alias("c")))
        labels = (votes.groupBy("u")
                  .agg(F.max(F.struct(F.col("c"),
                                      (-F.col("lab")).alias("nl")))
                       .alias("m"))
                  .select("u", (-F.col("m.nl")).cast("long").alias("lab")))
        if t % 5 == 0 and t < iters:
            labels = checkpoint_df(labels)
    return (labels.groupBy(F.col("lab").alias("community"))
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.min("u").cast("long").alias("min_member"))
            .orderBy("community"))


def label_propagation_sql(pairs_sql: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`label_propagation_communities` — the
    round loop unrolled, argmax via a window with the identical
    (count desc, label asc) tiebreak."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    parts = [f"""
WITH pairs AS ({pairs_sql}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
l0 AS (SELECT DISTINCT u, u AS lab FROM edges)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
v{t} AS (
  SELECT e.v AS u, l.lab, count(*) AS c
  FROM edges e JOIN l{t - 1} l ON l.u = e.u
  GROUP BY e.v, l.lab),
l{t} AS (
  SELECT u, lab FROM (
    SELECT u, lab, row_number() OVER (
      PARTITION BY u ORDER BY c DESC, lab ASC) AS rk
    FROM v{t})
  WHERE rk = 1)""")
    parts.append(f"""
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(u) AS BIGINT) AS min_member
FROM l{iters} GROUP BY lab ORDER BY community""")
    return "".join(parts)

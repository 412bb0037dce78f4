"""Fixed-point PageRank: matches an independent driver-side reference."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.graph import (
    RANK_SCALE, pagerank)


def _ref_pagerank(pairs, iters=3, damping_pct=85):
    """Plain-python twin of the integer iteration."""
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    deg = {u: len(vs) for u, vs in edges.items()}
    r = {u: RANK_SCALE for u in deg}
    teleport = (100 - damping_pct) * RANK_SCALE // 100
    for _ in range(iters):
        incoming = {u: 0 for u in deg}
        for u, vs in edges.items():
            c = r[u] // deg[u]
            for v in vs:
                incoming[v] += c
        r = {u: teleport + (incoming[u] * damping_pct) // 100 for u in deg}
    return {u: _round6_half_up(x / RANK_SCALE) for u, x in r.items()}


@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (3, 4)],                      # path
    [(1, 2), (1, 3), (1, 4), (1, 5)],              # star: hub dominates
    [(1, 2), (2, 3), (3, 1), (4, 5)],              # triangle + isolated edge
])
def test_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.id: r.rank for r in pagerank(df, iters=3).collect()}
    assert got == _ref_pagerank(pairs, iters=3)


def test_hub_outranks_leaves(spark):
    pairs = [(1, i) for i in range(2, 8)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.id: r.rank for r in pagerank(df, iters=3).collect()}
    assert got[1] > max(got[i] for i in range(2, 8))


def test_bad_damping_raises(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def _round6_half_up(x: float) -> float:
    """Spark/DuckDB round() semantics (HALF_UP on the shortest decimal
    repr) — python's builtin round() is banker's and disagrees at exact
    .xxxxxx5 rank values (hypothesis found one)."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def test_centrality_keepers_picks_hub(spark):
    """A star cluster keeps its hub (max pagerank), not min id; the
    keeper is a cluster member and every cluster reports once."""
    from rgd_rnaseq_workflows_spark.operators.graph import (
        centrality_keepers)
    # star: node 9 is the hub but has the LARGEST id; min-id would pick 1
    star = [(9, i) for i in (1, 2, 3, 4)]
    # separate 2-cycle cluster
    edges = star + [(20, 21)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long")
    out = {r.comp: r for r in centrality_keepers(pairs).collect()}
    assert len(out) == 2
    star_comp = out[1]          # comp label = min reachable id
    assert star_comp.keeper_id == 9 and star_comp.n_members == 5
    pair_comp = out[20]
    assert pair_comp.n_members == 2
    # symmetric 2-cycle: equal ranks -> min-id tiebreak
    assert pair_comp.keeper_id == 20


# --- triangle_stats (degree-ordered node-iterator census) --------------------

class TestTriangleStats:
    def _brute(self, edges):
        from itertools import combinations
        nodes = sorted({x for e in edges for x in e})
        adj = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b); adj[b].add(a)
        wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
        tris = sum(1 for a, b, c in combinations(nodes, 3)
                   if b in adj[a] and c in adj[a] and c in adj[b])
        return len(nodes), len(edges), wedges, tris

    def _run(self, spark, edges):
        from rgd_rnaseq_workflows_spark.operators.graph import triangle_stats
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long")
        return triangle_stats(pairs).collect()[0]

    def test_triangle_plus_tail(self, spark):
        # K3 on {1,2,3} plus a tail 3-4: 1 triangle, wedges 3+2=5... rely
        # on the brute-force reference for the exact numbers
        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        r = self._run(spark, edges)
        n, m, w, t = self._brute(edges)
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == \
            (n, m, w, t)
        assert r.transitivity == round(3 * t / w, 6)

    def test_wedge_free_graph_null_transitivity(self, spark):
        r = self._run(spark, [(1, 2), (3, 4)])
        assert (r.n_triangles, r.n_wedges) == (0, 0)
        assert r.transitivity is None

    def test_random_graph_matches_brute_force(self, spark):
        import random
        rng = random.Random(11)
        nodes = list(range(40))
        edges = sorted({(min(a, b), max(a, b))
                        for a, b in (rng.sample(nodes, 2)
                                     for _ in range(160))})
        r = self._run(spark, edges)
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == \
            self._brute(edges)

    def test_duplicate_and_reversed_pairs_collapse(self, spark):
        # same undirected edge presented twice and reversed: counted once
        r1 = self._run(spark, [(1, 2), (2, 3), (1, 3)])
        from rgd_rnaseq_workflows_spark.operators.graph import triangle_stats
        pairs = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)],
            "id_a long, id_b long")
        r2 = triangle_stats(pairs).collect()[0]
        assert r1 == r2

    def test_matches_sql_twin(self, spark):
        import duckdb
        import random
        from rgd_rnaseq_workflows_spark.operators.graph import (
            triangle_stats, triangle_stats_sql)
        rng = random.Random(5)
        edges = sorted({(min(a, b), max(a, b))
                        for a, b in (rng.sample(range(30), 2)
                                     for _ in range(90))})
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long")
        got = triangle_stats(pairs).collect()[0]
        con = duckdb.connect()
        con.register("ep", pairs.toPandas())
        [exp] = con.execute(
            triangle_stats_sql("SELECT id_a, id_b FROM ep")).fetchall()
        assert (got.n_nodes, got.n_edges, got.n_wedges,
                got.n_triangles, got.transitivity) == exp


def test_k_core_peels_chains_keeps_cliques(spark):
    from rgd_rnaseq_workflows_spark.operators.graph import k_core
    # triangle {1,2,3} + pendant chain 3-4-5 + isolated pair 6-7:
    # the 2-core is exactly the triangle, every chain vertex peels
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (6, 7)],
        ["id_a", "id_b"])
    core = k_core(edges, k=2)
    rows = {r["id"]: r["core_deg"] for r in core.collect()}
    assert rows == {1: 2, 2: 2, 3: 2}


def test_k_core_cascade_and_empty(spark):
    from rgd_rnaseq_workflows_spark.operators.graph import k_core
    # removing one low-degree vertex cascades: a path's 2-core is empty
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["id_a", "id_b"])
    assert k_core(edges, k=2).count() == 0
    # k=1 keeps everything with its degree
    rows = {r["id"]: r["core_deg"] for r in k_core(edges, k=1).collect()}
    assert rows[0] == 1 and rows[3] == 2


def test_k_core_matches_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.graph import k_core, k_core_sql
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6),
             (6, 7), (5, 7), (6, 8)]
    sdf = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["id"], r["core_deg"]) for r in k_core(sdf, k=2).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE e(id_a INT, id_b INT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    exp = set(con.execute(
        k_core_sql("SELECT id_a, id_b FROM e", k=2, iters=20))
        .fetchall())
    assert got == exp and len(got) > 0


def test_k_core_sql_guard_errors_on_non_fixpoint(spark):
    """ADVICE r6: a too-small iters must FAIL loudly in the SQL twin
    (a chain of n vertices needs ~n/2 peeling rounds), matching the
    Spark side's raise — never a silent partial core."""
    import duckdb
    import pytest

    from rgd_rnaseq_workflows_spark.operators.graph import k_core_sql
    chain = [(i, i + 1) for i in range(1, 30)]  # needs ~14 rounds at k=2
    con = duckdb.connect()
    con.execute("CREATE TABLE e(id_a INT, id_b INT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", chain)
    with pytest.raises(Exception, match="no fixpoint"):
        con.execute(k_core_sql("SELECT id_a, id_b FROM e", k=2, iters=3))
    # converged within the bound: guard passes, chain fully peels
    assert con.execute(k_core_sql("SELECT id_a, id_b FROM e", k=2,
                                  iters=20)).fetchall() == []
    with pytest.raises(ValueError):
        k_core_sql("SELECT 1, 2", k=2, iters=0)


def test_assortativity_star_vs_clique(spark):
    """A star graph is maximally disassortative (r = -1); inside a
    clique every end degree is equal -> degree-regular -> NULL."""
    from rgd_rnaseq_workflows_spark.operators.graph import (
        assortativity_report)
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a long, id_b long")
    r = assortativity_report(star).collect()[0]
    assert r["assortativity_milli"] == -1000
    assert r["n_nodes"] == 6 and r["n_edges"] == 5
    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "id_a long, id_b long")
    r2 = assortativity_report(clique).collect()[0]
    assert r2["assortativity_milli"] is None  # degree-regular


def test_assortativity_matches_duckdb_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.graph import (
        assortativity_report, assortativity_sql)
    rows = [(i, (i * 7 + 1) % 40) for i in range(60)
            if i != (i * 7 + 1) % 40]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = [tuple(r) for r in assortativity_report(df).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(
        assortativity_sql("SELECT id_a, id_b FROM p")).fetchall()]
    assert got == exp


def test_dp_noisy_counts_release_properties(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        dp_noisy_counts)
    rows = [(f"g{i % 5}",) for i in range(500)]
    df = spark.createDataFrame(rows, "g string")
    out = dp_noisy_counts(df, "g", epsilon_milli=1000).collect()
    assert len(out) == 5
    for r in out:
        assert r["n"] == 100
        assert r["n_noisy"] == max(0, r["n"] + r["noise"])
        assert abs(r["noise"]) < 50  # b=1: P(|noise|>=50) ~ e^-50
    # deterministic under repartitioning, epsilon scales the noise
    out2 = dp_noisy_counts(df.repartition(7), "g",
                           epsilon_milli=1000).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: ONE connected
    component but TWO LPA communities (each clique converges to its
    min id); the bridge endpoints stay with their own clique."""
    from rgd_rnaseq_workflows_spark.operators.graph import (
        label_propagation_communities)
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = spark.createDataFrame(c1 + c2 + [(3, 10)],
                                  "id_a long, id_b long")
    out = {r["community"]: r["n_members"] for r in
           label_propagation_communities(pairs, iters=3).collect()}
    assert out == {0: 4, 10: 4}


def test_lpa_matches_duckdb_twin_and_numeric_tiebreak(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.graph import (
        label_propagation_communities, label_propagation_sql)
    rows = [(i, (i * 11 + 3) % 30) for i in range(50)
            if i != (i * 11 + 3) % 30]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = [tuple(r) for r in
           label_propagation_communities(df, iters=3).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(label_propagation_sql(
        "SELECT id_a, id_b FROM p", iters=3)).fetchall()]
    assert got == exp

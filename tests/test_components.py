"""Connected components / cluster keepers over near-dup pair edges."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.components import (
    cluster_keepers, connected_components)


def test_chain_collapses_to_one_component(spark):
    # a-b, b-c, c-d chain: (a,d) never a pair, still one cluster —
    # multiple propagation iterations required
    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (9, 8)], ["id_a", "id_b"])
    comps = {r["id"]: r["comp"]
             for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_cluster_keepers_report(spark):
    edges = spark.createDataFrame(
        [(5, 1), (5, 3), (7, 6)], ["id_a", "id_b"])
    rows = {r["comp"]: (r["n_members"], r["keeper_id"])
            for r in cluster_keepers(edges).collect()}
    assert rows == {1: (3, 1), 6: (2, 6)}


def test_long_path_converges(spark):
    # a 12-node path exercises the iteration cap logic well past one hop
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"])
    comps = connected_components(edges)
    assert comps.select("comp").distinct().count() == 1
    assert comps.count() == 13


def test_pointer_jumping_rounds_are_logarithmic(spark):
    # 64-hop path: one-hop propagation alone would need ~63 rounds;
    # pointer jumping (path halving) must converge in O(log d) — well
    # within 9 rounds including the fixpoint-confirmation round
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["id_a", "id_b"])
    comps = connected_components(edges, max_iter=9, driver_gate=0)
    assert comps.select("comp").distinct().count() == 1
    assert comps.count() == 65
    assert {r["comp"] for r in comps.collect()} == {0}


def test_non_convergence_raises_not_silent(spark):
    # a chain whose diameter exceeds max_iter must raise, never return
    # silently-wrong partial labels (r2 ADVICE: components.py fixpoint)
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=2, driver_gate=0)
    # and one extra iteration headroom is enough for this diameter
    ok = connected_components(edges, max_iter=8, driver_gate=0)
    assert ok.select("comp").distinct().count() == 1


def test_string_id_chain_fully_merges(spark):
    # REGRESSION (r6): the old label-SUM convergence fingerprint is
    # NULL on string node ids (sum of strings), and NULL == NULL broke
    # the loop after one round — a >3-diameter STRING chain silently
    # under-merged.  The changed-label count must converge it fully.
    names = [f"name_{c}" for c in "abcdefghij"]
    edges = spark.createDataFrame(
        [(names[i], names[i + 1]) for i in range(len(names) - 1)],
        ["id_a", "id_b"])
    for gate in (0, 100_000):     # distributed loop AND union-find path
        comps = connected_components(edges, driver_gate=gate)
        assert comps.select("comp").distinct().count() == 1
        assert {r["comp"] for r in comps.collect()} == {"name_a"}
        assert comps.count() == len(names)


def test_empty_graph_converges_immediately(spark):
    # REGRESSION (r6): SUM of the changed-label count over an EMPTY
    # label frame is NULL; the loop must treat that as converged (zero
    # changes), not iterate to max_iter and raise — the corpus CLI at
    # threshold 0.999 produces exactly this empty pair graph
    from pyspark.sql.types import LongType, StructField, StructType
    edges = spark.createDataFrame(
        [], StructType([StructField("id_a", LongType()),
                        StructField("id_b", LongType())]))
    for gate in (0, 100_000):
        comps = connected_components(edges, max_iter=3, driver_gate=gate)
        assert comps.count() == 0


def test_union_find_path_equals_distributed_path(spark):
    # the size-gated driver union-find must produce exactly the
    # distributed loop's labeling (min member id per component)
    import random
    rng = random.Random(42)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {(r["id"], r["comp"]) for r in
            connected_components(df).collect()}
    slow = {(r["id"], r["comp"]) for r in
            connected_components(df, driver_gate=0).collect()}
    assert fast == slow and len(fast) > 0


def test_gate_boundary_string_ids_identical_labels(spark):
    # VERDICT r6 task 7: a graph that STRADDLES the gate — driver
    # union-find one run (adj == gate), distributed loop the next
    # (adj > gate) — must label identically, with STRING ids (the
    # fuzzy value-pair graphs cluster string keys)
    import random
    rng = random.Random(7)
    und = {tuple(sorted((f"v{rng.randrange(25):02d}",
                         f"v{rng.randrange(25):02d}")))
           for _ in range(40)}
    und = [(a, b) for a, b in und if a != b]
    df = spark.createDataFrame(und, ["id_a", "id_b"])
    n_adj = 2 * len(und)  # distinct directed adjacency size
    at_gate = {(r["id"], r["comp"]) for r in
               connected_components(df, driver_gate=n_adj).collect()}
    above_gate = {(r["id"], r["comp"]) for r in
                  connected_components(df, driver_gate=n_adj - 1).collect()}
    forced_distributed = {(r["id"], r["comp"]) for r in
                          connected_components(df, driver_gate=0).collect()}
    assert at_gate == above_gate == forced_distributed
    assert len(at_gate) > 0
    assert all(isinstance(i, str) for i, _ in at_gate)

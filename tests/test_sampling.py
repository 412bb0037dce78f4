"""Stratified hash sampling: determinism, monotone rates, stratum defaults."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.sampling import (
    BUCKETS, sample_bucket, stratified_hash_sample)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        ["doc_id", "lang"]).cache()


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_deterministic_and_seed_sensitive(docs):
    a = _ids(stratified_hash_sample(docs, "lang", {"en": 0.5, "de": 0.5},
                                    "doc_id", seed=1))
    b = _ids(stratified_hash_sample(docs, "lang", {"en": 0.5, "de": 0.5},
                                    "doc_id", seed=1))
    c = _ids(stratified_hash_sample(docs, "lang", {"en": 0.5, "de": 0.5},
                                    "doc_id", seed=2))
    assert a == b            # same seed → identical kept set
    assert a != c            # different seed → different set
    assert 800 < len(a) < 1200   # ~50% of 2000


def test_rates_are_monotone_nested(docs):
    # raising a stratum's rate only ADDS rows (bucket thresholds nest) —
    # the property that makes mix iteration auditable
    small = _ids(stratified_hash_sample(docs, "lang", {"en": 0.2}, "doc_id"))
    big = _ids(stratified_hash_sample(docs, "lang", {"en": 0.6}, "doc_id"))
    assert small <= big


def test_per_stratum_rates_and_default(docs):
    out = stratified_hash_sample(docs, "lang", {"en": 1.0}, "doc_id",
                                 default=0.0)
    rows = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    assert by_lang == {"en": 1000}          # de fully dropped via default


def test_bucket_range_and_bounds(docs, spark):
    from pyspark.sql import functions as F
    stats = (docs.select(sample_bucket("doc_id").alias("b"))
             .agg(F.min("b"), F.max("b")).collect()[0])
    assert 0 <= stats[0] and stats[1] < BUCKETS
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "lang", {"en": 1.5}, "doc_id")


def test_plan_is_pure_filter(docs):
    # the 100 TB contract: sampling must not shuffle — no Exchange in the
    # physical plan, just filter over the scan
    plan = (stratified_hash_sample(docs, "lang", {"en": 0.5}, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# --- temperature mix ----------------------------------------------------------

def test_temperature_mix_upweights_rare_strata(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import temperature_mix
    # en 1800 / de 200: alpha=0.5 weights sqrt(1800):sqrt(200) = 3:1, so
    # de's keep RATE must exceed en's (rare-language upweighting)
    rows = [(i, "en" if i < 1800 else "de") for i in range(2000)]
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mix(d, "lang", "doc_id", total_fraction=0.3)
    bps = {r["lang"]: r["mix_bps"]
           for r in out.select("lang", "mix_bps").distinct().collect()}
    assert bps["de"] > bps["en"]
    # target is ~600 docs total; md5 buckets are uniform so ±20% is slack
    n = out.count()
    assert 450 < n < 750


def test_temperature_mix_uniform_strata_equal_rates(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import temperature_mix
    rows = [(i, ["en", "de", "zh", "fr"][i % 4]) for i in range(2000)]
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mix(d, "lang", "doc_id", total_fraction=0.4)
    bps = {r["mix_bps"] for r in out.select("mix_bps").distinct().collect()}
    assert len(bps) == 1                 # equal counts -> equal rates


def test_temperature_mix_never_exceeds_full_keep(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        BUCKETS, temperature_mix)
    # a tiny stratum whose weighted target exceeds its size clamps at 10000
    rows = [(i, "en" if i < 1995 else "xx") for i in range(2000)]
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mix(d, "lang", "doc_id", total_fraction=0.9)
    xx = out.filter("lang = 'xx'")
    assert xx.count() == 5               # clamped rate keeps every row
    assert xx.select("mix_bps").first()[0] == BUCKETS


def test_temperature_mix_corpus_never_shuffled(spark):
    # the corpus side must reach the filter without an Exchange: the only
    # exchanges in the plan belong to the metadata-scale rate computation
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.sampling import temperature_mix
    d = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"))
    plan = (temperature_mix(d, "lang", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --- per-key frequency capping ------------------------------------------------

def test_cap_per_key_matches_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    from rgd_rnaseq_workflows_spark.operators.sampling import cap_per_key
    # skewed: source s0 has 900 rows, s1 has 80, s2 has 20
    rows = [(i, "s0" if i < 900 else ("s1" if i < 980 else "s2"))
            for i in range(1000)]
    d = spark.createDataFrame(rows, ["doc_id", "source"])
    got = cap_per_key(d, "source", 50, "doc_id", seed=3, n_salts=8)
    w = Window.partitionBy("source").orderBy("_o", "doc_id")
    want = (d.withColumn("_o", md5_long(F.col("doc_id").cast("string"),
                                        seed=3))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 50))
    assert ({(r.doc_id, r.source, r.keep_rank) for r in got.collect()}
            == {(r.doc_id, r.source, r.rk) for r in want.collect()})


def test_cap_per_key_respects_cap_and_small_keys(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import cap_per_key
    rows = [(i, "hot" if i < 500 else "cold") for i in range(520)]
    d = spark.createDataFrame(rows, ["doc_id", "source"])
    out = cap_per_key(d, "source", 30, "doc_id").groupBy("source").count()
    by = {r["source"]: r["count"] for r in out.collect()}
    assert by == {"hot": 30, "cold": 20}   # under-cap keys keep everything


# --- deterministic splits + leakage -------------------------------------------

def test_split_assign_partition_and_determinism(spark):
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.sampling import split_assign
    d = spark.range(5000).select(F.col("id").alias("doc_id"))
    s = d.select("doc_id", split_assign("doc_id", seed=13).alias("split"))
    counts = {r["split"]: r["count"]
              for r in s.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000          # disjoint + exhaustive
    assert 3800 < counts["train"] < 4200         # ~80%
    s2 = d.select("doc_id", split_assign("doc_id", seed=13).alias("split"))
    assert s.collect() == s2.collect()           # key-deterministic


def test_split_leakage_detects_cross_split_near_dup(spark):
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.dedup import ngram_jaccard_pairs
    from rgd_rnaseq_workflows_spark.operators.sampling import split_assign
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # find two ids in different splits, make them near-duplicates
    d0 = spark.range(200).select(F.col("id").alias("doc_id"),
                                 split_assign("doc_id", seed=13)
                                 .alias("split"))
    by_split = {r["split"]: r["doc_id"]
                for r in d0.orderBy("doc_id").collect()}
    a, b = by_split["train"], by_split["test"]
    rows = [(a, "en", base), (b, "en", base + " tail"),
            (999, "en", "totally different words entirely here now")]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    pairs = ngram_jaccard_pairs(docs, block_col="lang", shingle_n=2,
                                threshold=0.5)
    s = docs.select("doc_id", split_assign("doc_id", seed=13).alias("sp"))
    rep = (pairs
           .join(s.select(F.col("doc_id").alias("id_a"),
                          F.col("sp").alias("_sa")), "id_a")
           .join(s.select(F.col("doc_id").alias("id_b"),
                          F.col("sp").alias("_sb")), "id_b")
           .select(F.least("_sa", "_sb").alias("lo"),
                   F.greatest("_sa", "_sb").alias("hi")))
    got = {(r["lo"], r["hi"]) for r in rep.collect()}
    assert ("test", "train") in got              # the planted leak


def test_token_budget_mix_rates_and_determinism(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        BUCKETS, token_budget_mix)
    rows = [(i, "en" if i % 4 else "de", 10 + i % 7) for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    budgets = {"en": 1200, "fr": 50}          # de unbudgeted -> dropped
    out = token_budget_mix(d, "lang", "n_tokens", budgets, "doc_id", seed=3)
    got = out.collect()
    assert {r.lang for r in got} == {"en"}    # de dropped, fr absent
    # rate check: en rate_bps = floor(1200*10000 / sum_en_tokens)
    sum_en = sum(t for _, l, t in rows if l == "en")
    bps = min(BUCKETS, 1200 * BUCKETS // sum_en)
    assert all(r.budget_bps == bps for r in got)
    # kept token mass lands near the budget (one-bucket quantum noise)
    kept = sum(r.n_tokens for r in got)
    assert 0 < kept < 2 * 1200
    # deterministic: same call -> same kept set
    again = {r.doc_id for r in
             token_budget_mix(d, "lang", "n_tokens", budgets,
                              "doc_id", seed=3).collect()}
    assert again == {r.doc_id for r in got}


def test_token_budget_mix_caps_at_full_keep(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        BUCKETS, token_budget_mix)
    d = spark.createDataFrame([(1, "en", 5), (2, "en", 5)],
                              "doc_id long, lang string, n_tokens long")
    out = token_budget_mix(d, "lang", "n_tokens", {"en": 10_000},
                          "doc_id").collect()
    assert len(out) == 2 and all(r.budget_bps == BUCKETS for r in out)

    import pytest
    with pytest.raises(ValueError, match="negative budget"):
        token_budget_mix(d, "lang", "n_tokens", {"en": -1}, "doc_id")


def test_epoch_budget_waterfall_caps_and_reflows():
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        epoch_budget_waterfall)
    totals = {"en": 10_000, "de": 1_000, "zh": 2_000}
    w = {"en": 50, "de": 30, "zh": 20}
    # de's proportional share (30%) far exceeds 2 epochs of 1k tokens:
    # it caps at 2000 and the excess flows to en/zh
    out = epoch_budget_waterfall(totals, w, budget=10_000, max_epochs=2)
    assert out["de"]["tokens_allocated"] == 2_000 and out["de"]["capped"]
    assert out["de"]["epochs_bps"] == 20_000          # 2 full epochs
    # invariants: within caps, within budget, reflow happened
    assert sum(s["tokens_allocated"] for s in out.values()) <= 10_000
    for s, r in out.items():
        assert r["tokens_allocated"] <= 2 * totals[s]
    assert out["en"]["tokens_allocated"] > 5_000      # > its naive share


def test_epoch_budget_waterfall_edges():
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        epoch_budget_waterfall)
    # budget beyond every cap: everything saturates
    out = epoch_budget_waterfall({"a": 100, "b": 50}, {"a": 1, "b": 1},
                                 budget=10_000, max_epochs=3)
    assert out["a"]["tokens_allocated"] == 300
    assert out["b"]["tokens_allocated"] == 150
    assert all(r["capped"] for r in out.values())
    # weighted stratum absent from the corpus: 0 tokens, capped at 0
    out = epoch_budget_waterfall({"a": 100}, {"a": 1, "ghost": 5},
                                 budget=100, max_epochs=1)
    assert out["ghost"] == {"tokens_available": 0, "weight": 5,
                            "tokens_allocated": 0, "epochs_bps": 0,
                            "capped": True}
    assert out["a"]["tokens_allocated"] == 100


def test_epoch_budget_python_equals_sql_twin():
    """The fixed-round contract: the pure-Python waterfall and the
    unrolled-CTE SQL replay identically on randomized inputs."""
    import random

    import duckdb
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        epoch_budget_waterfall, epoch_budget_waterfall_sql)
    rng = random.Random(42)
    con = duckdb.connect()
    for trial in range(20):
        strata = [f"s{i}" for i in range(rng.randint(1, 6))]
        totals = {s: rng.randint(0, 50_000) for s in strata}
        weights = {s: rng.randint(0, 100) for s in strata}
        budget = rng.randint(0, 200_000)
        me = rng.randint(1, 5)
        vals = ", ".join(f"('{s}', {t})" for s, t in totals.items())
        sql = epoch_budget_waterfall_sql(
            f"(SELECT * FROM (VALUES {vals}) t(lang, n_tokens))",
            "lang", "n_tokens", weights, budget, me)
        duck = {r[0]: (r[1], r[2], r[3], r[4], r[5])
                for r in con.execute(sql).fetchall()}
        py = epoch_budget_waterfall(totals, weights, budget, me)
        want = {s: (r["tokens_available"], r["weight"],
                    r["tokens_allocated"], r["epochs_bps"], r["capped"])
                for s, r in py.items()}
        assert duck == want, f"trial {trial}: {duck} != {want}"


def test_epoch_budget_mix_replicates_and_chains(spark):
    """The mix materializes the manifest: full passes for everyone in
    the stratum, the fractional pass only for bucket-selected keys, and
    the manifest→mix chain lands within one bucket-quantum of the
    allocated tokens."""
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        epoch_budget_mix, epoch_budget_waterfall)
    rows = [(i, "en" if i < 80 else "de", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                     "n_tokens long")
    out = epoch_budget_mix(df, "lang", "doc_id",
                           {"en": 25_000, "de": 5_000}, seed=1).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
    # every en doc appears 2 or 3 times with contiguous epoch indices
    en_counts = {len(v) for d, v in per_doc.items() if d < 80}
    assert en_counts <= {2, 3} and 3 in en_counts and 2 in en_counts
    for d, v in per_doc.items():
        assert sorted(v) == list(range(1, len(v) + 1))
    # de at 0.5 epochs: only bucket-selected docs, exactly once
    de_docs = [d for d in per_doc if d >= 80]
    assert 0 < len(de_docs) < 20
    assert all(per_doc[d] == [1] for d in de_docs)

    # chain: allocation → mix reproduces the allocated token volume
    totals = {"en": 800, "de": 200}
    plan = epoch_budget_waterfall(totals, {"en": 3, "de": 1},
                                  budget=1500, max_epochs=2)
    bps = {s: r["epochs_bps"] for s, r in plan.items()}
    mixed = epoch_budget_mix(df, "lang", "doc_id", bps, seed=1)
    got_tokens = mixed.groupBy("lang").sum("n_tokens").collect()
    got = {r[0]: r[1] for r in got_tokens}
    for s in ("en", "de"):
        want = plan[s]["tokens_allocated"]
        # one bucket-quantum = totals[s] / 10000 per doc-selection step;
        # with 10-token docs the band is +-10% here
        assert abs(got[s] - want) <= max(2 * totals[s] // 10, 40), \
            (s, got[s], want)


class TestClusterSplitAssign:
    def test_components_never_cross_split(self, spark):
        from rgd_rnaseq_workflows_spark.operators.components import (
            connected_components)
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            cluster_split_assign)
        # chain 1-2-3, pair 10-11, singletons 20..40
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
        docs = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 10, 11] + list(range(20, 41))],
            "doc_id long")
        asg = cluster_split_assign(docs, connected_components(pairs),
                                   seed=7)
        rows = {r.id: r for r in asg.collect()}
        assert len(rows) == 26
        # every clustered doc carries the component min as rep and the
        # whole component shares one split
        assert {rows[i].rep for i in (1, 2, 3)} == {1}
        assert {rows[i].split for i in (1, 2, 3)} == {rows[1].split}
        assert {rows[i].split for i in (10, 11)} == {rows[10].split}
        # singletons hash their own id
        assert rows[25].rep == 25

    def test_assignment_is_partition_invariant(self, spark):
        from rgd_rnaseq_workflows_spark.operators.components import (
            connected_components)
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            cluster_split_assign)
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        docs = spark.createDataFrame([(i,) for i in range(1, 30)],
                                     "doc_id long")
        comps = connected_components(pairs)
        a = sorted(map(tuple, cluster_split_assign(
            docs, comps, seed=3).collect()))
        b = sorted(map(tuple, cluster_split_assign(
            docs.repartition(7), comps, seed=3).collect()))
        assert a == b


class TestDuplicateDownweight:
    def test_cluster_mass_is_one_doc(self, spark):
        from rgd_rnaseq_workflows_spark.operators.components import (
            connected_components)
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            duplicate_downweight)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
        docs = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 10, 11, 20]], "doc_id long")
        got = {r.id: r for r in duplicate_downweight(
            docs, connected_components(pairs)).collect()}
        assert got[1].cluster_size == 3 and got[1].weight_bp == 3333
        assert got[2].weight_bp == 3333 and got[3].weight_bp == 3333
        assert got[10].cluster_size == 2 and got[10].weight_bp == 5000
        assert got[20].cluster_size == 1 and got[20].weight_bp == 10000


def test_pps_systematic_exact_k_and_ht_bounds(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import pps_systematic
    rows = [(i, 1 + (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    for k in (1, 7, 50):
        out = pps_systematic(df, "id", "w", k=k, seed=3).collect()
        assert sum(r["n_copies"] for r in out) == k  # Madow: exact k, always
        for r in out:
            assert 1 <= r["incl_bp"] <= 10000
    # a dominant weight (> W/k) must be hit multiple times
    big = spark.createDataFrame([(1, 1000), (2, 1), (3, 1)], ["id", "w"])
    out = {r["id"]: r["n_copies"] for r in
           pps_systematic(big, "id", "w", k=10, seed=1).collect()}
    assert out[1] >= 9


def test_pps_systematic_partitioning_invariant(spark):
    # the bucketed prefix sum must give the identical sample on any
    # physical partitioning — determinism lives in the md5 order
    from rgd_rnaseq_workflows_spark.operators.sampling import pps_systematic
    rows = [(i, 1 + i % 13) for i in range(300)]
    a = spark.createDataFrame(rows, ["id", "w"]).repartition(1)
    b = spark.createDataFrame(rows, ["id", "w"]).repartition(17, "w")
    sa = sorted((r["id"], r["n_copies"])
                for r in pps_systematic(a, "id", "w", k=29, seed=5).collect())
    sb = sorted((r["id"], r["n_copies"])
                for r in pps_systematic(b, "id", "w", k=29, seed=5).collect())
    assert sa == sb and len(sa) > 0


def test_pps_systematic_rejects_bad_weights(spark):
    import pytest

    from rgd_rnaseq_workflows_spark.operators.sampling import pps_systematic
    df = spark.createDataFrame([(1, 5), (2, 0)], ["id", "w"])
    with pytest.raises(Exception, match="weight < 1"):
        pps_systematic(df, "id", "w", k=2, seed=1).collect()


def test_pps_systematic_matches_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.sampling import (
        pps_systematic, pps_systematic_sql)
    rows = [(i, 1 + (i * 17) % 50) for i in range(150)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = sorted((r["id"], r["weight"], r["n_copies"], r["incl_bp"])
                 for r in pps_systematic(df, "id", "w", k=23,
                                         seed=9).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, w INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.execute(
        pps_systematic_sql("t", "id", "w", k=23, seed=9)).fetchall())
    assert got == exp


def test_token_waterfill_hand_case_and_budget_invariant(spark):
    """Hand-computed level: supplies (10, 100, 1000) at 60% budget
    (666 tokens) -> level 556, small sources saturated; the budget is
    spent EXACTLY; DuckDB twin agrees on a messier corpus."""
    import random

    import duckdb

    from rgd_rnaseq_workflows_spark.operators.sampling import (
        token_waterfill_allocation, token_waterfill_sql)

    rows = [("a", 10), ("b", 100), ("c", 1000)]
    docs = spark.createDataFrame(rows, ["source", "n_tokens"])
    got = {r["source"]: (r["supply_tokens"], r["allocated_tokens"],
                         r["saturated"])
           for r in token_waterfill_allocation(docs, 60).collect()}
    assert got == {"a": (10, 10, True), "b": (100, 100, True),
                   "c": (1000, 556, False)}
    assert sum(a for _, a, _ in got.values()) == (60 * 1110) // 100

    # messier corpus incl. remainder hand-out; twin equality
    rng = random.Random(7)
    words = ["tok%d" % i for i in range(20)]
    drows = [(i, "s%d" % (i % 7),
              " ".join(rng.choice(words)
                       for _ in range(rng.randint(1, 40))))
             for i in range(300)]
    sdf = (spark.createDataFrame(drows, ["doc_id", "source", "text"]))
    from rgd_rnaseq_workflows_spark.functions import text as TX
    alloc = token_waterfill_allocation(
        sdf.withColumn("n_tokens", TX.token_count("text")), 37)
    srows = sorted(tuple(r) for r in alloc.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", drows)
    exp = sorted(tuple(r) for r in con.execute(
        token_waterfill_sql("documents", 37)).fetchall())
    assert srows == exp
    total = sum(s for _, s, _, _ in srows)
    assert sum(a for _, _, a, _ in srows) == (37 * total) // 100


def test_cap_tokens_per_key_budget_never_exceeded_and_lossless(spark):
    """The two-phase prefix-sum equals the plain single-window walk
    (DuckDB twin), the kept weight per key never exceeds its budget,
    and adding the NEXT-ranked doc would always overflow (greedy
    maximality); weight-0 rows never consume budget."""
    import random

    import duckdb

    from rgd_rnaseq_workflows_spark.functions import text as TX
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        cap_tokens_per_key, cap_tokens_per_key_sql)

    rng = random.Random(11)
    rows = [(i, "s%d" % (i % 3),
             " ".join("w%d" % rng.randint(0, 9)
                      for _ in range(rng.choice([0, 3, 10, 25]))))
            for i in range(200)]
    docs = (spark.createDataFrame(rows, ["doc_id", "source", "text"])
            .withColumn("n_tokens", TX.token_count("text")))
    budgets = spark.createDataFrame(
        [("s0", 120), ("s1", 55), ("s2", 0)],
        ["source", "allocated_tokens"])
    out = cap_tokens_per_key(docs, "source", budgets, "n_tokens",
                             "doc_id", seed=5)
    got = out.select("doc_id", "source", "n_tokens",
                     "cum_tokens").collect()
    spent = {}
    for r in got:
        spent[r["source"]] = max(spent.get(r["source"], 0),
                                 r["cum_tokens"])
    assert spent.get("s0", 0) <= 120 and spent.get("s1", 0) <= 55
    # s2 budget 0: only the weight-0 PREFIX survives (the first
    # positive-weight doc overflows and closes the key)
    assert all(r["n_tokens"] == 0 for r in got if r["source"] == "s2")

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                    [(i, s, t) for i, s, t in rows])
    con.execute("CREATE TABLE b(source VARCHAR, "
                "allocated_tokens BIGINT)")
    con.executemany("INSERT INTO b VALUES (?, ?)",
                    [("s0", 120), ("s1", 55), ("s2", 0)])
    src = (f"(SELECT doc_id, source, {TX.token_count_sql('text')} "
           f"AS n_tokens FROM documents)")
    exp = sorted(tuple(r) for r in con.execute(cap_tokens_per_key_sql(
        src, "source", "SELECT source, allocated_tokens FROM b",
        "n_tokens", "doc_id", seed=5,
        cols="doc_id, source, n_tokens")).fetchall())
    assert sorted(tuple(r) for r in got) == exp


def test_cap_tokens_per_key_rejects_negative_weight(spark):
    """Regression (ADVICE r8): a negative weight silently breaks the
    two-phase prefix-sum proof — the guard must fail loudly instead."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    from rgd_rnaseq_workflows_spark.operators.sampling import (
        cap_tokens_per_key)

    docs = spark.createDataFrame(
        [(1, "s0", 5), (2, "s0", -3), (3, "s0", 4)],
        ["doc_id", "source", "n_tokens"])
    budgets = spark.createDataFrame([("s0", 100)],
                                    ["source", "allocated_tokens"])
    out = cap_tokens_per_key(docs, "source", budgets, "n_tokens",
                             "doc_id")
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception),
                       match="negative weight"):
        out.collect()


def test_waterfill_zero_supply_short_circuits(spark):
    """Regression (ADVICE r8): a total-supply-0 corpus used to yield
    an EMPTY allocation frame (no level row satisfies lj < s), which
    would silently drop every document downstream. Now every group is
    allocated 0 / saturated, and the DuckDB twin agrees."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.sampling import (
        token_waterfill_allocation, token_waterfill_sql)

    docs = spark.createDataFrame(
        [(1, "a", ""), (2, "b", ""), (3, "a", "")],
        ["doc_id", "source", "text"])
    from rgd_rnaseq_workflows_spark.functions import text as TX
    alloc = token_waterfill_allocation(
        docs.withColumn("n_tokens", TX.token_count("text")), 60)
    got = sorted(tuple(r) for r in alloc.collect())
    assert got == [("a", 0, 0, True), ("b", 0, 0, True)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                    [(1, "a", ""), (2, "b", ""), (3, "a", "")])
    exp = sorted(tuple(r) for r in con.execute(
        token_waterfill_sql("documents", 60)).fetchall())
    assert got == exp


def test_waterfill_raises_on_negative_supply(spark):
    import pytest

    from rgd_rnaseq_workflows_spark.operators.sampling import (
        waterfill_from_supply)
    sup = spark.createDataFrame([("a", -5), ("b", 5)],
                                ["source", "tokens"])
    with pytest.raises(Exception, match="negative supply"):
        waterfill_from_supply(sup, 60).collect()


def test_neyman_allocation_hand_computed(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        neyman_allocation)
    # stratum a: values 0, 10  -> D = 2*100 - 100 = 100, w = 10_000
    # stratum b: values 0, 0, 30 -> D = 3*900 - 900 = 1800,
    #   w = floor(sqrt(1800)*1000) = 42426
    # stratum c: constant -> D = 0, w = 0
    rows = [("a", 0), ("a", 10), ("b", 0), ("b", 0), ("b", 30),
            ("c", 7), ("c", 7)]
    df = spark.createDataFrame(rows, "src string, v long")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "src", "v", n_total=10).collect()}
    assert out["a"]["w_milli"] == 10_000
    assert out["b"]["w_milli"] == 42_426
    assert out["c"]["w_milli"] == 0 and out["c"]["alloc"] == 0
    # W = 52426; base_a = 100000 div 52426 = 1 (rem 47574),
    # base_b = 424260 div 52426 = 8 (rem 4852); leftover = 1 -> a
    assert out["a"]["alloc"] == 2 and out["b"]["alloc"] == 8
    assert sum(r["alloc"] for r in out.values()) == 10


def test_neyman_allocation_all_constant_gives_zero(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        neyman_allocation)
    df = spark.createDataFrame([("a", 5), ("b", 5)], "src string, v long")
    out = neyman_allocation(df, "src", "v", n_total=4).collect()
    assert all(r["alloc"] == 0 and r["w_milli"] == 0 for r in out)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        bootstrap_mean_ci)
    rows = [(i, "g", 100 + (i * 37) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "n_chars long")
    r = bootstrap_mean_ci(df, "source", "n_chars").collect()[0]
    assert r["n_rows"] == 400 and r["n_replicas_used"] == 32
    # CI must bracket the point estimate and be reasonably tight for
    # a 400-row group (bootstrap se ~ sd/sqrt(n) ~ 0.7 chars)
    assert r["ci_lo_milli"] <= r["mean_milli"] <= r["ci_hi_milli"]
    assert r["ci_hi_milli"] - r["ci_lo_milli"] < 10_000
    # deterministic across partitionings
    r2 = bootstrap_mean_ci(df.repartition(13), "source",
                           "n_chars").collect()[0]
    assert tuple(r) == tuple(r2)


def test_bootstrap_ci_poisson_weights_mean_one(spark):
    """The planted-weight sanity: across rows and replicas the Poisson
    weights must average ~1 (the bootstrap's unbiasedness)."""
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        MINHASH_P, minhash_params)
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        _poisson1_thresholds)
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    cuts = _poisson1_thresholds(MINHASH_P)
    params = minhash_params(8)
    df = spark.range(2000).select(
        F.pmod(md5_long(F.col("id").cast("string"), seed=11),
               F.lit(1 << 30)).alias("x"))
    slots = F.array(*[((F.col("x") * a + b) % MINHASH_P).alias(f"u{r}")
                      for r, (a, b) in enumerate(params)])
    w = df.select(F.explode(slots).alias("u")).select(
        sum((F.col("u") >= c).cast("long") for c in cuts[:-1])
        .alias("w"))
    m = w.agg(F.avg("w")).collect()[0][0]
    assert 0.95 < m < 1.05


def test_bootstrap_ci_matches_duckdb_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        bootstrap_mean_ci, bootstrap_mean_ci_sql)
    rows = [(i, f"s{i % 3}", 50 + (i * 13) % 90) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "n_chars long")
    got = [tuple(r) for r in
           bootstrap_mean_ci(df, "source", "n_chars",
                             n_replicas=16).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, source VARCHAR, "
                "n_chars BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = [tuple(r) for r in con.execute(bootstrap_mean_ci_sql(
        "t", "source", "n_chars", n_replicas=16)).fetchall()]
    assert got == exp

"""Stateful streaming dedup: state persists across micro-batches, is sized
one row per distinct fingerprint, and is evicted once the event-time
watermark passes a fingerprint's last sighting + TTL."""

from __future__ import annotations

import os
from datetime import datetime

from rgd_rnaseq_workflows_spark.streaming.stateful import (
    batch_dedup_kernel, stream_dedup)

SCHEMA = "doc_id long, text string"
TS_SCHEMA = "doc_id long, text string, ts timestamp"


def test_batch_kernel_dedups(spark):
    docs = spark.createDataFrame([(1, "aaa"), (2, "aaa"), (3, "bbb")],
                                 schema=SCHEMA)
    out = batch_dedup_kernel(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]


def _state_rows(q):
    return next(op["numRowsTotal"] for op in q.lastProgress["stateOperators"])


def test_stream_dedup_across_microbatches(spark, tmp_out):
    src = os.path.join(tmp_out, "stream_src")
    os.makedirs(src)
    # micro-batch 1: docs 1,2 (2 duplicates 1); micro-batch 2 replays the
    # same text with new ids — state must drop them
    b1 = spark.createDataFrame([(1, "xxx"), (2, "xxx"), (3, "yyy")],
                               schema=SCHEMA)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (stream_dedup(stream).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append").start())
    try:
        q.processAllAvailable()
        first = {r["doc_id"] for r in
                 spark.sql("SELECT * FROM dedup_out").collect()}
        assert first == {1, 3}

        b2 = spark.createDataFrame([(10, "xxx"), (11, "zzz")], schema=SCHEMA)
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        after = {r["doc_id"] for r in
                 spark.sql("SELECT * FROM dedup_out").collect()}
        # doc 10 replays batch-1 content → dropped; doc 11 is new
        assert after == {1, 3, 11}

        # state is ONE ROW PER DISTINCT FINGERPRINT (xxx, yyy, zzz) — not
        # a per-shard set that re-serializes wholesale every batch
        assert _state_rows(q) == 3
    finally:
        q.stop()


def test_stream_dedup_multi_chunk_group(spark, tmp_out):
    """A fingerprint group spanning multiple Arrow chunks in one trigger:
    the kernel's concat must reindex (ignore_index) or idxmin/.loc returns
    a multi-row frame and the query crashes (r2 ADVICE)."""
    src = os.path.join(tmp_out, "chunk_src")
    os.makedirs(src)
    docs = [(i, "same-text") for i in range(9, 2, -1)] + [(100, "other")]
    spark.createDataFrame(docs, schema=SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (stream_dedup(stream).writeStream.format("memory")
             .queryName("dedup_chunks").outputMode("append").start())
        try:
            q.processAllAvailable()
            assert q.exception() is None
            got = {r["doc_id"] for r in
                   spark.sql("SELECT * FROM dedup_chunks").collect()}
            assert got == {3, 100}      # min doc_id across ALL chunks
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_stream_dedup_event_time_ttl_evicts_state(spark, tmp_out):
    """TTL = 30 min of EVENT time: eviction is driven by the watermark, so
    the test advances timestamps, not the wall clock."""
    src = os.path.join(tmp_out, "ttl_src")
    os.makedirs(src)

    def send(*rows):
        spark.createDataFrame(
            [(i, t, datetime(2026, 1, 1, h, m)) for i, t, h, m in rows],
            schema=TS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

    stream = spark.readStream.schema(TS_SCHEMA).parquet(src)
    q = (stream_dedup(stream, ts_col="ts", ttl="30 minutes")
         .writeStream.format("memory").queryName("dedup_ttl")
         .outputMode("append").start())
    try:
        send((1, "xxx", 10, 0), (2, "xxx", 10, 0), (3, "yyy", 10, 0))
        send((10, "xxx", 10, 5), (11, "zzz", 10, 5))   # replay dropped
        got = {r["doc_id"] for r in
               spark.sql("SELECT * FROM dedup_ttl").collect()}
        assert got == {1, 3, 11}
        assert _state_rows(q) == 3

        # jump event time to 12:00 → next batch's watermark (11:30) passes
        # every timeout (≤ 10:35), evicting xxx/yyy/zzz
        send((20, "www", 12, 0))
        send((21, "qqq", 12, 1))
        assert _state_rows(q) == 2                      # www, qqq only

        # an evicted fingerprint is re-admitted on its next sighting —
        # the dropDuplicatesWithinWatermark contract
        send((30, "xxx", 12, 2))
        got = {r["doc_id"] for r in
               spark.sql("SELECT * FROM dedup_ttl").collect()}
        assert got == {1, 3, 11, 20, 21, 30}
    finally:
        q.stop()


# --- streaming funnel -----------------------------------------------------------

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _last_rows(spark, table):
    """Latest emitted row per user from an update-mode memory sink —
    memory sink appends update rows, so max-batch wins."""
    import pandas as pd
    pdf = spark.sql(f"SELECT * FROM {table}").toPandas()
    pdf["_i"] = range(len(pdf))
    return {int(r.user): (r.t1, r.t2, r.t3)
            for r in pdf.sort_values("_i").groupby("user").last()
            .reset_index().itertuples()}


def test_stream_funnel_equals_batch_out_of_order(spark, tmp_out):
    """Events split across micro-batches in NON-chronological order: the
    final per-user chain must equal the batch operator (order-robust
    state). Includes a late-arriving earlier step-1 event that unlocks
    a step-2 event already seen and discarded."""
    import pandas as pd
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_user_steps)
    from rgd_rnaseq_workflows_spark.streaming.stateful import stream_funnel

    t = lambda sec: datetime.fromtimestamp(sec)
    # user 1: b@100, c@200 arrive FIRST; a@50 arrives in batch 2 -> the
    # chain only completes after the late a unlocks b then c
    # user 2: a@10 then b@5 (before a -> never converts)
    batch1 = [(1, t(100), 1, "b"), (2, t(200), 1, "c"),
              (3, t(10), 2, "a"), (4, t(5), 2, "b")]
    batch2 = [(5, t(50), 1, "a")]
    src = os.path.join(tmp_out, "funnel_src")
    os.makedirs(src)
    spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_funnel(stream, ("a", "b", "c"))
         .writeStream.format("memory").queryName("funnel_out")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        mid = _last_rows(spark, "funnel_out")
        import pandas as pd
        assert all(pd.isna(x) for x in mid[1])   # no a yet -> nothing
        spark.createDataFrame(batch2, EV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = _last_rows(spark, "funnel_out")
    finally:
        q.stop()

    all_events = spark.createDataFrame(batch1 + batch2, EV_SCHEMA)
    want = {r.user_id: (r.t1, r.t2, r.t3) for r in
            funnel_user_steps(all_events, ("a", "b", "c")).collect()}
    def norm(v):
        return tuple(None if x is None or pd.isna(x) else int(x)
                     for x in v)
    assert {u: norm(v) for u, v in got.items()} == \
        {u: norm(v) for u, v in want.items()}
    # the late a@50 really did unlock b@100 -> c@200
    assert norm(got[1]) == (50, 100, 200)


def test_stream_funnel_conversion_window(spark, tmp_out):
    """max_gap flows through: b@100 is outside a@50's 30s window."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.streaming.stateful import stream_funnel
    t = lambda sec: datetime.fromtimestamp(sec)
    rows = [(1, t(50), 1, "a"), (2, t(100), 1, "b"),
            (3, t(60), 2, "a"), (4, t(80), 2, "b")]
    src = os.path.join(tmp_out, "funnel_gap_src")
    os.makedirs(src)
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_funnel(stream, ("a", "b"), max_gap_seconds=30)
         .writeStream.format("memory").queryName("funnel_gap_out")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM funnel_gap_out").toPandas()
    finally:
        q.stop()
    got = {int(r.user): r.t2 for r in pdf.itertuples()}
    import pandas as pd
    assert pd.isna(got[1])          # 50s gap > 30
    assert int(got[2]) == 80        # 20s gap converts


def test_stream_scd2_equals_batch_out_of_order(spark, tmp_out):
    import pandas as pd
    """Observations split across micro-batches NON-chronologically: a
    late-arriving middle observation must SPLIT an existing run, which
    only a recompute-from-state operator can revise. Each user's
    max-ver emission must equal the batch scd2_history."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.operators.scd import scd2_history
    from rgd_rnaseq_workflows_spark.streaming.stateful import stream_scd2

    t = lambda sec: datetime.fromtimestamp(sec)
    # user 1: a@10, a@30 arrive first (one run); b@20 arrives LATE and
    # splits it into a / b / a. user 2: single run.
    batch1 = [(1, t(10), 1, "a"), (2, t(30), 1, "a"),
              (3, t(10), 2, "x"), (4, t(20), 2, "x")]
    batch2 = [(5, t(20), 1, "b")]
    src = os.path.join(tmp_out, "scd2_src")
    os.makedirs(src)
    spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_scd2(stream).writeStream.format("memory")
         .queryName("scd2_out").outputMode("update").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, EV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM scd2_out").toPandas()
    finally:
        q.stop()

    latest = pdf[pdf.groupby("user")["ver"].transform("max") == pdf["ver"]]
    got = sorted(
        (int(r.user), r.event_type, int(r.valid_from),
         None if pd.isna(r.valid_to) else int(r.valid_to),
         int(r.n_obs), bool(r.is_current))
        for r in latest.itertuples(index=False))

    all_events = spark.createDataFrame(batch1 + batch2, EV_SCHEMA)
    obs = all_events.selectExpr("user_id", "event_type",
                                "cast(ts as long) as sec", "event_id")
    want = sorted(
        (int(r.user_id), r.event_type, int(r.valid_from),
         None if r.valid_to is None else int(r.valid_to),
         int(r.n_obs), bool(r.is_current))
        for r in scd2_history(obs).collect())
    assert got == want
    # the late b@20 really did split user 1's a-run into a / b / a
    u1 = sorted((g for g in got if g[0] == 1), key=lambda g: g[2])
    assert [g[1] for g in u1] == ["a", "b", "a"]


def test_stream_scd2_state_eviction(spark, tmp_out):
    """Event-time TTL evicts idle entities once the watermark passes."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.streaming.stateful import stream_scd2

    t = lambda sec: datetime.fromtimestamp(sec)
    src = os.path.join(tmp_out, "scd2_ttl_src")
    os.makedirs(src)
    spark.createDataFrame([(1, t(100), 1, "a")], EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_scd2(stream, ttl="10 seconds")
         .writeStream.format("memory").queryName("scd2_ttl")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        assert _state_rows(q) == 1
        # watermark advances far past user 1's last event + ttl
        spark.createDataFrame([(2, t(10_000), 2, "b")], EV_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more empty-ish trigger lets the store apply the timeout
        spark.createDataFrame([(3, t(10_001), 2, "b")], EV_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert _state_rows(q) == 1      # only user 2 remains
    finally:
        q.stop()


def test_stream_transitions_equals_batch_out_of_order(spark, tmp_out):
    """A late-arriving middle event REWIRES two transitions (a->c
    becomes a->b and b->c) — summing every user's max-ver emission
    must equal the batch transition matrix regardless."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        transition_matrix)
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_transitions)

    t = lambda sec: datetime.fromtimestamp(sec)
    batch1 = [(1, t(10), 1, "a"), (2, t(30), 1, "c"),
              (3, t(10), 2, "x"), (4, t(20), 2, "y")]
    batch2 = [(5, t(20), 1, "b")]      # late: splits a->c
    src = os.path.join(tmp_out, "trans_src")
    os.makedirs(src)
    spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_transitions(stream).writeStream.format("memory")
         .queryName("trans_out").outputMode("update").start())
    try:
        q.processAllAvailable()
        mid = spark.sql("SELECT * FROM trans_out").toPandas()
        # before the late event: user 1 shows a->c
        m1 = mid[(mid.user == 1)
                 & (mid.groupby("user")["ver"].transform("max")
                    == mid["ver"])]
        assert [(r.from_type, r.to_type, int(r.n))
                for r in m1.itertuples(index=False)] == [("a", "c", 1)]
        spark.createDataFrame(batch2, EV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM trans_out").toPandas()
    finally:
        q.stop()

    latest = pdf[pdf.groupby("user")["ver"].transform("max")
                 == pdf["ver"]]
    got = sorted(
        ((r.from_type, r.to_type), int(r.n))
        for r in latest.itertuples(index=False))
    agg: dict = {}
    for (k, n) in got:
        agg[k] = agg.get(k, 0) + n

    all_events = spark.createDataFrame(batch1 + batch2, EV_SCHEMA)
    ev = all_events.selectExpr("user_id", "event_type",
                               "cast(ts as long) as sec", "event_id")
    want = {(r.from_type, r.to_type): int(r.n)
            for r in transition_matrix(ev).collect()}
    assert agg == want
    assert ("a", "c") not in agg     # the rewire really happened
    assert agg[("a", "b")] == 1 and agg[("b", "c")] == 1


EVV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_stream_attribution_equals_batch_out_of_order(spark, tmp_out):
    """A LATE touch landing inside the conversion's lookback REWIRES
    credit (last-touch moves to it, the linear split re-divides) —
    summing every user's max-ver rows by (model, touch_type) must
    equal the batch attribution rollup regardless of arrival order."""
    from datetime import datetime

    from rgd_rnaseq_workflows_spark.operators.attribution import (
        multi_touch_attribution)
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_attribution)

    t = lambda sec: datetime.fromtimestamp(sec)
    batch1 = [(1, t(100), 1, "click", 0.0), (2, t(300), 1, "purchase", 10.01),
              (3, t(50), 2, "purchase", 5.0)]          # user 2: direct
    batch2 = [(4, t(200), 1, "view", 0.0)]             # LATE: now last touch
    src = os.path.join(tmp_out, "attr_src")
    os.makedirs(src)
    spark.createDataFrame(batch1, EVV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVV_SCHEMA).parquet(src)
    q = (stream_attribution(stream, lookback_sec=1000)
         .writeStream.format("memory").queryName("attr_out")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        mid = spark.sql("SELECT * FROM attr_out").toPandas()
        m1 = mid[(mid.user == 1)
                 & (mid.groupby("user")["ver"].transform("max")
                    == mid["ver"])]
        # before the late view: click owns first, last AND all linear
        assert {(r.model, r.touch_type): r.credited_cents
                for r in m1.itertuples(index=False)} == {
            ("first_touch", "click"): 1001,
            ("last_touch", "click"): 1001,
            ("linear", "click"): 1001}
        spark.createDataFrame(batch2, EVV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM attr_out").toPandas()
    finally:
        q.stop()

    latest = pdf[pdf.groupby("user")["ver"].transform("max")
                 == pdf["ver"]]
    agg: dict = {}
    for r in latest.itertuples(index=False):
        k = (r.model, r.touch_type)
        n, c = agg.get(k, (0, 0))
        agg[k] = (n + int(r.n_pairs), c + int(r.credited_cents))

    all_events = spark.createDataFrame(batch1 + batch2, EVV_SCHEMA)
    ev = all_events.selectExpr("user_id", "event_type",
                               "cast(ts as long) as sec", "value",
                               "event_id")
    want = {(r["model"], r["touch_type"]): (int(r["n_pairs"]),
                                            int(r["credited_cents"]))
            for r in multi_touch_attribution(
                ev, lookback_sec=1000).collect()}
    assert agg == want
    # the rewire really happened: last touch is now the late view
    assert want[("last_touch", "view")] == (1, 1001)
    # and the linear remainder went to the MOST RECENT touch (the view)
    assert want[("linear", "view")] == (1, 501)
    assert want[("linear", "click")] == (1, 500)


def test_stream_top_paths_equals_batch_out_of_order(spark, tmp_out):
    """A LATE event inserted mid-sequence REWIRES every n-gram window
    crossing it (a>c becomes a>b and b>c for n=2) — summing every
    user's max-ver rows by path must equal the batch occurrence
    counts regardless of arrival order."""
    from datetime import datetime

    from rgd_rnaseq_workflows_spark.operators.funnel import (
        top_event_paths)
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_top_paths)

    t = lambda sec: datetime.fromtimestamp(sec)
    batch1 = [(1, t(10), 1, "a"), (2, t(30), 1, "c"),
              (3, t(10), 2, "x"), (4, t(20), 2, "y"),
              (5, t(30), 2, "x")]
    batch2 = [(6, t(20), 1, "b")]      # late: splits a>c
    src = os.path.join(tmp_out, "paths_src")
    os.makedirs(src)
    spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_top_paths(stream, n=2).writeStream.format("memory")
         .queryName("paths_out").outputMode("update").start())
    try:
        q.processAllAvailable()
        mid = spark.sql("SELECT * FROM paths_out").toPandas()
        m1 = mid[(mid.user == 1)
                 & (mid.groupby("user")["ver"].transform("max")
                    == mid["ver"])]
        assert {(r.path, int(r.n)) for r in
                m1.itertuples(index=False)} == {("a > c", 1)}
        spark.createDataFrame(batch2, EV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM paths_out").toPandas()
    finally:
        q.stop()

    latest = pdf[pdf.groupby("user")["ver"].transform("max")
                 == pdf["ver"]]
    agg: dict = {}
    for r in latest.itertuples(index=False):
        agg[r.path] = agg.get(r.path, 0) + int(r.n)

    all_events = spark.createDataFrame(batch1 + batch2, EV_SCHEMA)
    ev = all_events.selectExpr("user_id", "event_type",
                               "cast(ts as long) as sec", "event_id")
    want = {r["path"]: int(r["n_occurrences"])
            for r in top_event_paths(ev, n=2, top_k=100).collect()}
    assert agg == want
    assert "a > c" not in agg          # the rewire really happened
    assert agg["a > b"] == 1 and agg["b > c"] == 1


def test_stream_attribution_state_eviction(spark, tmp_out):
    """Event-time TTL evicts an idle user's attribution state once the
    watermark passes last event + ttl (the ADVICE-r7 fix: the kernel
    must ARM the timeout, not just select EventTimeTimeout)."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_attribution)

    t = lambda sec: datetime.fromtimestamp(sec)
    src = os.path.join(tmp_out, "attr_ttl_src")
    os.makedirs(src)
    spark.createDataFrame([(1, t(100), 1, "purchase", 1.0)], EVV_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVV_SCHEMA).parquet(src)
    q = (stream_attribution(stream, ttl="10 seconds")
         .writeStream.format("memory").queryName("attr_ttl")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        assert _state_rows(q) == 1
        spark.createDataFrame([(2, t(10_000), 2, "purchase", 1.0)],
                              EVV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more trigger lets the store apply the timeout
        spark.createDataFrame([(3, t(10_001), 2, "purchase", 1.0)],
                              EVV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        assert _state_rows(q) == 1      # only user 2 remains
    finally:
        q.stop()


def test_stream_top_paths_state_eviction(spark, tmp_out):
    """Event-time TTL evicts an idle user's path state once the
    watermark passes last event + ttl."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_top_paths)

    t = lambda sec: datetime.fromtimestamp(sec)
    src = os.path.join(tmp_out, "paths_ttl_src")
    os.makedirs(src)
    spark.createDataFrame([(1, t(100), 1, "a")], EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_top_paths(stream, n=2, ttl="10 seconds")
         .writeStream.format("memory").queryName("paths_ttl")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        assert _state_rows(q) == 1
        spark.createDataFrame([(2, t(10_000), 2, "b")], EV_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame([(3, t(10_001), 2, "b")], EV_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert _state_rows(q) == 1      # only user 2 remains
    finally:
        q.stop()


def test_stream_top_paths_null_type_matches_batch(spark, tmp_out):
    """Null event types are DROPPED before n-gramming in BOTH twins
    (the pinned contract): a null mid-sequence neither crashes the
    streaming kernel nor produces a collapsed batch path."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        top_event_paths)
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_top_paths)

    t = lambda sec: datetime.fromtimestamp(sec)
    rows = [(1, t(10), 1, "a"), (2, t(20), 1, None), (3, t(30), 1, "c")]
    src = os.path.join(tmp_out, "paths_null_src")
    os.makedirs(src)
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (stream_top_paths(stream, n=2).writeStream.format("memory")
         .queryName("paths_null").outputMode("update").start())
    try:
        q.processAllAvailable()
        pdf = spark.sql("SELECT * FROM paths_null").toPandas()
    finally:
        q.stop()
    latest = pdf[pdf.groupby("user")["ver"].transform("max")
                 == pdf["ver"]]
    got = {r.path: int(r.n) for r in latest.itertuples(index=False)}

    ev = spark.createDataFrame(rows, EV_SCHEMA).selectExpr(
        "user_id", "event_type", "cast(ts as long) as sec", "event_id")
    want = {r["path"]: int(r["n_occurrences"])
            for r in top_event_paths(ev, n=2, top_k=100).collect()}
    assert got == want == {"a > c": 1}   # null dropped, no crash


def test_stream_attribution_negative_value_raises(spark, tmp_out):
    """Negative conversion values are out of contract in ALL three
    implementations — the streaming kernel fails loudly rather than
    mis-crediting with sign-divergent rounding."""
    from datetime import datetime
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_attribution)

    t = lambda sec: datetime.fromtimestamp(sec)
    src = os.path.join(tmp_out, "attr_neg_src")
    os.makedirs(src)
    spark.createDataFrame([(1, t(100), 1, "purchase", -5.0)], EVV_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVV_SCHEMA).parquet(src)
    q = (stream_attribution(stream)
         .writeStream.format("memory").queryName("attr_neg")
         .outputMode("update").start())
    import pytest
    with pytest.raises(Exception, match="negative conversion value"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()

"""Custom stateful streaming operators via ``applyInPandasWithState``.

The scale-path use case: streaming exact deduplication of a document feed
(emit each content fingerprint's first occurrence, drop replays) — the
incremental twin of ``operators.dedup.exact_dedup``.

Scale design (100 TB feed):
- **state is keyed by the fingerprint itself**, not by a shard holding a
  growing set: each key's state is one long, so an update serializes O(1)
  bytes (a shard-keyed "seen" set would re-serialize the entire set every
  micro-batch — O(|state|) per batch, a guaranteed stall at scale), and
  the state store partitions it across executors by the shuffle hash;
- **state is bounded in event time**: with an event-time column the input
  is watermarked by ``ttl`` and every fingerprint's state carries an
  ``EventTimeTimeout`` at ``last_seen + ttl`` — once the watermark passes
  it the state is evicted (its next occurrence re-admits: the windowed
  contract of ``dropDuplicatesWithinWatermark``). Event-time timeouts
  advance only with the data, so an idle stream triggers no busy-loop of
  empty batches (a processing-time timeout does);
- the kernels are vectorized pandas, never a Python per-row loop.

``batch_dedup_kernel`` runs the same semantics on a batch DataFrame via
``applyInPandas`` (state lives for one group call) — used to cross-check
the streaming operator, and the registry's oracle checks it against
``SELECT min(doc_id) ... GROUP BY md5(text)`` exactly.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("fingerprint", T.LongType()),
])
# per-fingerprint state: the keeper doc_id — one long, O(1) serialization
STATE_SCHEMA = T.StructType([
    T.StructField("first_doc", T.LongType()),
])
N_SHARDS = 64


def _with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    return df.withColumn("fingerprint", md5_long(F.col(text_col)))


def _first_seen_fn(ttl_ms: int, carry_cols: tuple[str, ...] = ()):
    """Build the per-key state function as a closure (pickled BY VALUE to
    executors, so the parameters travel with it)."""
    def first_seen(key, rows: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(rows)
        # ignore_index: Arrow chunks arrive 0-indexed each, so a straight
        # concat has duplicate labels and .loc[idxmin] would return a
        # multi-row frame instead of a Series for large replay groups
        cat = (pd.concat(batches, ignore_index=True)
               if len(batches) > 1 else batches[0])
        keeper = cat.loc[cat["doc_id"].idxmin()]
        min_doc = int(keeper["doc_id"])
        if not state.exists:
            state.update((min_doc,))
            out = {"doc_id": [min_doc], "fingerprint": [key[0]]}
            for c in carry_cols:
                out[c] = [keeper[c]]
            yield pd.DataFrame(out)
        if ttl_ms:
            # expire at last-sighting event time + ttl (sliding), clamped
            # above the current watermark as the API requires
            max_ts = max(int(pdf["ts"].max().timestamp() * 1000)
                         for pdf in batches)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))
    return first_seen


def stream_dedup(doc_stream: DataFrame, text_col: str = "text",
                 ts_col: str | None = None,
                 ttl: str = "30 minutes",
                 carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Streaming exact dedup: emits each fingerprint's first occurrence
    only, across micro-batches.

    With ``ts_col`` (an event-time timestamp column) the state is bounded:
    the stream is watermarked by ``ttl`` and a fingerprint unseen for
    ``ttl`` of event time is evicted. Without it the state is unbounded —
    only for provably small keyspaces.

    ``carry_cols`` are passed through from the keeper row (the min-doc_id
    occurrence in its first micro-batch) — the streaming-curation path
    carries the document payload this way; state stays one long per key.
    """
    ms = 0
    if ts_col is not None:
        num, unit = ttl.split()
        ms = int(float(num) * {"millisecond": 1, "milliseconds": 1,
                               "second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000, "hours": 3_600_000}[unit])
    out_schema = T.StructType(
        DEDUP_OUT_SCHEMA.fields
        + [doc_stream.schema[c] for c in carry_cols])
    src = _with_fingerprint(doc_stream, text_col)
    keep = ["doc_id", "fingerprint", *carry_cols]
    if ts_col is not None:
        src = (src.withColumn("ts", F.col(ts_col))
               .withWatermark("ts", ttl)
               .select(*keep, "ts"))
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        src = src.select(*keep)
        timeout = GroupStateTimeout.NoTimeout
    return (src.groupBy("fingerprint")
            .applyInPandasWithState(
                _first_seen_fn(ms, tuple(carry_cols)), out_schema,
                STATE_SCHEMA, "append", timeout))


def batch_dedup_kernel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The same semantics in batch mode: min doc_id per content
    fingerprint, via the Arrow path. Grouped by a 64-way hash shard (not
    per-fingerprint) so the shuffle moves few, large groups; inside the
    kernel a vectorized sort + drop_duplicates keeps the keeper row."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return (pdf.sort_values("doc_id")
                .drop_duplicates("fingerprint", keep="first")
                [["doc_id", "fingerprint"]])
    return (_with_fingerprint(docs, text_col)
            .withColumn("shard", F.pmod(F.col("fingerprint"),
                                        F.lit(N_SHARDS)).cast("int"))
            .select("shard", "doc_id", "fingerprint")
            .groupBy("shard")
            .applyInPandas(fn, DEDUP_OUT_SCHEMA))


# --- streaming funnel ----------------------------------------------------------

def _funnel_fn(steps: tuple[str, ...], max_gap: int | None, ttl_ms: int):
    """Per-user funnel state function (closure → pickled by value).

    State: one sorted array of DISTINCT epoch-seconds per step — the
    minimal sufficient statistic that keeps the operator order-robust
    (late/out-of-order arrivals recompute the chain from the merged
    arrays, so stream == batch under ANY arrival order; an O(1)
    "current step times" state could never revise when a late earlier
    event unlocks a discarded later one). Duplicate seconds collapse,
    so state is bounded by a user's distinct active seconds per step
    (and by the event-time TTL when given).
    """
    n = len(steps)

    def update(key, rows: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(rows)
        cat = (pd.concat(batches, ignore_index=True)
               if len(batches) > 1 else batches[0])
        arrs = ([list(a or []) for a in state.get] if state.exists
                else [[] for _ in range(n)])
        for i, s in enumerate(steps):
            new = cat.loc[cat["event_type"] == s, "tsec"]
            if len(new):
                arrs[i] = sorted({*arrs[i], *(int(v) for v in new)})
        state.update(tuple(arrs))
        times, prev = [], None
        for i in range(n):
            if i == 0:
                cur = arrs[0][0] if arrs[0] else None
            elif prev is None:
                cur = None
            else:
                hi = None if max_gap is None else prev + max_gap
                cur = next((x for x in arrs[i]
                            if x > prev and (hi is None or x <= hi)), None)
            times.append(cur)
            prev = cur
        out = {"user": pd.array([key[0]], dtype="Int64")}
        for i in range(n):
            out[f"t{i + 1}"] = pd.array([times[i]], dtype="Int64")
        yield pd.DataFrame(out)
        if ttl_ms:
            max_ts = max(int(pdf["ts"].max().timestamp() * 1000)
                         for pdf in batches)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))
    return update


def stream_funnel(event_stream: DataFrame, steps,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  max_gap_seconds: int | None = None,
                  ttl: str | None = None) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel_user_steps``: emits,
    in UPDATE mode, each active user's current step-time chain
    (user, t1..tN epoch seconds) whenever a micro-batch touches them —
    a user's LATEST row equals the batch operator over everything seen.

    Same semantics contract as batch (earliest strictly-after, optional
    conversion window), order-robust by construction (see
    :func:`_funnel_fn`). With ``ttl`` the stream is watermarked and an
    idle user's state is evicted at last-event + ttl (event-time
    timeout — no empty-batch busy loop).
    """
    steps = tuple(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    ms = 0
    if ttl is not None:
        num, unit = ttl.split()
        ms = int(float(num) * {"millisecond": 1, "milliseconds": 1,
                               "second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000, "hours": 3_600_000}[unit])
    out_schema = T.StructType(
        [T.StructField("user", T.LongType())]
        + [T.StructField(f"t{i + 1}", T.LongType())
           for i in range(len(steps))])
    state_schema = T.StructType(
        [T.StructField(f"a{i}", T.ArrayType(T.LongType()))
         for i in range(len(steps))])
    src = (event_stream.filter(F.col(type_col).isin(list(steps)))
           .select(F.col(user_col).alias("user"),
                   F.col(type_col).alias("event_type"),
                   F.col(ts_col).cast("long").alias("tsec"),
                   F.col(ts_col).alias("ts")))
    if ttl is not None:
        src = src.withWatermark("ts", ttl)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        src = src.drop("ts")
        timeout = GroupStateTimeout.NoTimeout
    return (src.groupBy("user")
            .applyInPandasWithState(
                _funnel_fn(steps, max_gap_seconds, ms), out_schema,
                state_schema, "update", timeout))


# --- streaming SCD2 history ----------------------------------------------------

def _scd2_fn(ttl_ms: int):
    """Per-entity SCD2 state function (closure → pickled by value).

    State: the entity's observation set as three parallel arrays
    (sec, event_id, attr) deduplicated by event_id — the minimal state
    that keeps the operator ORDER-ROBUST: a late-arriving observation
    can split an existing run in two, which no collapsed-runs state
    could revise, so the history is recomputed from the merged set on
    every update (user-scale work, never corpus-scale). Stream == batch
    under any arrival order; event-time TTL bounds state like the
    other stateful kernels.
    """
    def update(key, rows: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(rows)
        cat = (pd.concat(batches, ignore_index=True)
               if len(batches) > 1 else batches[0])
        if state.exists:
            st = state.get
            secs, eids, attrs = (list(a or []) for a in st[:3])
            ver = int(st[3] or 0)
        else:
            secs, eids, attrs, ver = [], [], [], 0
        ver += 1
        byid = {int(e): (int(s), a) for s, e, a in
                zip(secs, eids, attrs)}
        for s, e, a in zip(cat["sec"], cat["event_id"],
                           cat["event_type"]):
            byid[int(e)] = (int(s), None if pd.isna(a) else str(a))
        obs = sorted(((s, e, a) for e, (s, a) in byid.items()),
                     key=lambda t: (t[0], t[1]))
        state.update((
            [s for s, _, _ in obs],
            [e for _, e, _ in obs],
            [a for _, _, a in obs],
            ver,
        ))
        runs = []          # [attr, valid_from, n_obs]
        for s, _, a in obs:
            if not runs or runs[-1][0] != a:
                runs.append([a, s, 0])
            runs[-1][2] += 1
        n = len(runs)
        yield pd.DataFrame({
            "user": pd.array([key[0]] * n, dtype="Int64"),
            "event_type": [r[0] for r in runs],
            "valid_from": pd.array([r[1] for r in runs], dtype="Int64"),
            "valid_to": pd.array(
                [runs[i + 1][1] if i + 1 < n else None
                 for i in range(n)], dtype="Int64"),
            "n_obs": pd.array([r[2] for r in runs], dtype="Int64"),
            "is_current": [i + 1 == n for i in range(n)],
            "ver": pd.array([ver] * n, dtype="Int64"),
        })
        if ttl_ms:
            max_ts = max(int(pdf["ts"].max().timestamp() * 1000)
                         for pdf in batches)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))
    return update


SCD2_OUT_SCHEMA = T.StructType([
    T.StructField("user", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("valid_from", T.LongType()),
    T.StructField("valid_to", T.LongType()),
    T.StructField("n_obs", T.LongType()),
    T.StructField("is_current", T.BooleanType()),
    # per-entity emission counter: consumers (and the stream==batch
    # test) identify an entity's LATEST history snapshot as its max-ver
    # rows — the CDC convention for multi-row update emissions
    T.StructField("ver", T.LongType()),
])
SCD2_STATE_SCHEMA = T.StructType([
    T.StructField("secs", T.ArrayType(T.LongType())),
    T.StructField("eids", T.ArrayType(T.LongType())),
    T.StructField("attrs", T.ArrayType(T.StringType())),
    T.StructField("ver", T.LongType()),
])


def stream_scd2(event_stream: DataFrame, user_col: str = "user_id",
                type_col: str = "event_type", ts_col: str = "ts",
                id_col: str = "event_id",
                ttl: str | None = None) -> DataFrame:
    """Streaming twin of ``operators.scd.scd2_history``: emits, in
    UPDATE mode, each touched entity's full current version history —
    an entity's LATEST emission equals the batch operator over
    everything seen (order-robust: late observations re-split runs).
    With ``ttl`` the stream is watermarked and idle entities evict at
    last-event + ttl (event-time timeout)."""
    ms = 0
    if ttl is not None:
        num, unit = ttl.split()
        ms = int(float(num) * {"millisecond": 1, "milliseconds": 1,
                               "second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000, "hours": 3_600_000}[unit])
    src = event_stream.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("long").alias("sec"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"))
    if ttl is not None:
        src = src.withWatermark("ts", ttl)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        src = src.drop("ts")
        timeout = GroupStateTimeout.NoTimeout
    return (src.groupBy("user")
            .applyInPandasWithState(
                _scd2_fn(ms), SCD2_OUT_SCHEMA, SCD2_STATE_SCHEMA,
                "update", timeout))

def _transitions_fn(ttl_ms: int):
    """Per-user transition state function: the same observation-set
    state as the SCD2 kernel (a late-arriving middle event REWIRES two
    transitions — only recompute-from-state can revise that), emitting
    the user's CURRENT consecutive-pair counts with a ver counter so
    consumers read each user's latest emission (CDC convention).
    Aggregating every user's max-ver pair rows reproduces the batch
    transition matrix under any arrival order."""
    def update(key, rows: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(rows)
        cat = (pd.concat(batches, ignore_index=True)
               if len(batches) > 1 else batches[0])
        if state.exists:
            st = state.get
            secs, eids, attrs = (list(a or []) for a in st[:3])
            ver = int(st[3] or 0)
        else:
            secs, eids, attrs, ver = [], [], [], 0
        ver += 1
        byid = {int(e): (int(s), a) for s, e, a in
                zip(secs, eids, attrs)}
        for s, e, a in zip(cat["sec"], cat["event_id"],
                           cat["event_type"]):
            byid[int(e)] = (int(s), None if pd.isna(a) else str(a))
        obs = sorted(((s, e, a) for e, (s, a) in byid.items()),
                     key=lambda t: (t[0], t[1]))
        state.update((
            [s for s, _, _ in obs],
            [e for _, e, _ in obs],
            [a for _, _, a in obs],
            ver,
        ))
        counts: dict[tuple, int] = {}
        for prev, cur in zip(obs, obs[1:]):
            k = (prev[2], cur[2])
            counts[k] = counts.get(k, 0) + 1
        n = len(counts)
        ks = sorted(counts)
        yield pd.DataFrame({
            "user": pd.array([key[0]] * n, dtype="Int64"),
            "from_type": [k[0] for k in ks],
            "to_type": [k[1] for k in ks],
            "n": pd.array([counts[k] for k in ks], dtype="Int64"),
            "ver": pd.array([ver] * n, dtype="Int64"),
        })
        if ttl_ms:
            max_ts = max(int(pdf["ts"].max().timestamp() * 1000)
                         for pdf in batches)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))
    return update


TRANS_OUT_SCHEMA = T.StructType([
    T.StructField("user", T.LongType()),
    T.StructField("from_type", T.StringType()),
    T.StructField("to_type", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("ver", T.LongType()),
])


def stream_transitions(event_stream: DataFrame,
                       user_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       id_col: str = "event_id",
                       ttl: str | None = None) -> DataFrame:
    """Streaming twin of ``operators.funnel.transition_matrix``
    (incremental view maintenance for the Markov journey matrix):
    per-user pair counts re-emitted on every touched user; summing
    each user's max-ver rows equals the batch matrix over everything
    seen, under any arrival order. Same observation-set state and
    event-time TTL as the SCD2 kernel (shared state schema)."""
    ms = 0
    if ttl is not None:
        num, unit = ttl.split()
        ms = int(float(num) * {"millisecond": 1, "milliseconds": 1,
                               "second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000, "hours": 3_600_000}[unit])
    src = event_stream.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("long").alias("sec"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"))
    if ttl is not None:
        src = src.withWatermark("ts", ttl)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        src = src.drop("ts")
        timeout = GroupStateTimeout.NoTimeout
    return (src.groupBy("user")
            .applyInPandasWithState(
                _transitions_fn(ms), TRANS_OUT_SCHEMA, SCD2_STATE_SCHEMA,
                "update", timeout))



# =============================================================================
# Streaming multi-touch attribution (twin of operators.attribution)
# =============================================================================

ATTR_OUT_SCHEMA = T.StructType([
    T.StructField("user", T.LongType()),
    T.StructField("model", T.StringType()),
    T.StructField("touch_type", T.StringType()),
    T.StructField("n_pairs", T.LongType()),
    T.StructField("credited_cents", T.LongType()),
    T.StructField("ver", T.LongType()),
])

ATTR_STATE_SCHEMA = T.StructType([
    T.StructField("secs", T.ArrayType(T.LongType())),
    T.StructField("eids", T.ArrayType(T.LongType())),
    T.StructField("types", T.ArrayType(T.StringType())),
    T.StructField("cents", T.ArrayType(T.LongType())),
    T.StructField("ver", T.LongType()),
])


def _attr_credits(obs, conv_type, touch_types, lookback_sec):
    """Exact per-user attribution from an observation list of
    (sec, event_id, type, cents) — the batch operator's semantics
    replayed: per conversion, in-window touches in (sec, id) order;
    first/last full credit, linear base + remainder to the MOST
    RECENT; '(direct)' when no touch. Returns {(model, touch_type):
    [n_pairs, credited_cents]}."""
    out: dict = {}

    def add(model, tt, cents):
        k = (model, tt)
        cur = out.setdefault(k, [0, 0])
        cur[0] += 1
        cur[1] += cents

    touches = sorted(((s, e, t) for s, e, t, _ in obs
                      if t in touch_types))
    for s, e, t, c in obs:
        if t != conv_type:
            continue
        win = [(ts, te, tt) for ts, te, tt in touches
               if ts < s and ts >= s - lookback_sec]
        if not win:
            for m in ("first_touch", "last_touch", "linear"):
                add(m, "(direct)", c)
            continue
        add("first_touch", win[0][2], c)
        add("last_touch", win[-1][2], c)
        n = len(win)
        base, rem = c // n, c % n
        for rank_desc, (_, _, tt) in enumerate(reversed(win), start=1):
            add("linear", tt, base + (1 if rank_desc <= rem else 0))
    return out


def _attribution_fn(ttl_ms: int, conv_type: str, touch_types: tuple,
                    lookback_sec: int):
    """Per-user attribution state function — the recompute-from-state
    discipline (SCD2/transitions precedent): a LATE touch landing
    inside a conversion's lookback REWIRES credit (last-touch moves,
    the linear split re-divides), which only a replay from the full
    observation set can revise. Emits the user's CURRENT credit rows
    under a ver counter; summing every user's max-ver rows equals the
    batch operator over everything seen, under any arrival order."""
    import math

    def update(key, rows: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(rows)
        cat = (pd.concat(batches, ignore_index=True)
               if len(batches) > 1 else batches[0])
        if state.exists:
            st = state.get
            secs, eids, types, cents = (list(a or []) for a in st[:4])
            ver = int(st[4] or 0)
        else:
            secs, eids, types, cents, ver = [], [], [], [], 0
        ver += 1
        byid = {int(e): (int(s), t, int(c)) for s, e, t, c in
                zip(secs, eids, types, cents)}
        for s, e, t, v in zip(cat["sec"], cat["event_id"],
                              cat["event_type"], cat["value"]):
            # HALF_UP for non-negative values — F.round / DuckDB round
            if pd.notna(v) and float(v) < 0 and str(t) == conv_type:
                raise ValueError(
                    "stream_attribution: negative conversion value — "
                    "value >= 0 required (net refunds upstream)")
            c = int(math.floor(float(v) * 100 + 0.5)) if pd.notna(v) else 0
            byid[int(e)] = (int(s), str(t), c)
        obs = sorted(((s, e, t, c) for e, (s, t, c) in byid.items()),
                     key=lambda r: (r[0], r[1]))
        state.update((
            [s for s, _, _, _ in obs],
            [e for _, e, _, _ in obs],
            [t for _, _, t, _ in obs],
            [c for _, _, _, c in obs],
            ver,
        ))
        credits = _attr_credits(obs, conv_type, touch_types,
                                lookback_sec)
        ks = sorted(credits)
        n = len(ks)
        yield pd.DataFrame({
            "user": pd.array([key[0]] * n, dtype="Int64"),
            "model": [k[0] for k in ks],
            "touch_type": [k[1] for k in ks],
            "n_pairs": pd.array([credits[k][0] for k in ks],
                                dtype="Int64"),
            "credited_cents": pd.array([credits[k][1] for k in ks],
                                       dtype="Int64"),
            "ver": pd.array([ver] * n, dtype="Int64"),
        })
        if ttl_ms:
            max_ts = max(int(pdf["ts"].max().timestamp() * 1000)
                         for pdf in batches)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))

    return update


def stream_attribution(event_stream: DataFrame,
                       conv_type: str = "purchase",
                       touch_types: tuple = ("click", "view"),
                       lookback_sec: int = 48 * 3600,
                       user_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       id_col: str = "event_id",
                       value_col: str = "value",
                       ttl: str | None = None) -> DataFrame:
    """Streaming twin of ``operators.attribution.multi_touch_
    attribution`` (incremental view maintenance for the credit
    rollup): per-user credit rows re-emitted on every touched user;
    summing each user's max-ver rows by (model, touch_type) equals
    the batch rollup over everything seen, under any arrival order.
    Same observation-set state + event-time TTL discipline as the
    SCD2/transitions kernels."""
    ms = 0
    if ttl is not None:
        num, unit = ttl.split()
        ms = int(float(num) * {"millisecond": 1, "milliseconds": 1,
                               "second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000, "hours": 3_600_000}[unit])
    src = event_stream.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("long").alias("sec"),
        F.col(id_col).alias("event_id"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("ts"))
    if ttl is not None:
        src = src.withWatermark("ts", ttl)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        src = src.drop("ts")
        timeout = GroupStateTimeout.NoTimeout
    return (src.groupBy("user")
            .applyInPandasWithState(
                _attribution_fn(ms, conv_type, tuple(touch_types),
                                lookback_sec),
                ATTR_OUT_SCHEMA, ATTR_STATE_SCHEMA, "update", timeout))


# =============================================================================
# Streaming top event paths (twin of operators.funnel.top_event_paths)
# =============================================================================

PATHS_OUT_SCHEMA = T.StructType([
    T.StructField("user", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("ver", T.LongType()),
])


def _paths_fn(ttl_ms: int, n: int, cap_per_user: int):
    """Per-user journey-path state function — a LATE event inserted
    mid-sequence REWIRES every n-gram window that crosses it (and the
    cap keeps the user's EARLIEST events, so a late-but-early event
    can evict the tail), which only a replay from the observation set
    can revise. Emits the user's CURRENT path n-gram counts under a
    ver counter; summing max-ver rows per path reproduces the batch
    occurrence counts under any arrival order."""
    def update(key, rows: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(rows)
        cat = (pd.concat(batches, ignore_index=True)
               if len(batches) > 1 else batches[0])
        if state.exists:
            st = state.get
            secs, eids, attrs = (list(a or []) for a in st[:3])
            ver = int(st[3] or 0)
        else:
            secs, eids, attrs, ver = [], [], [], 0
        ver += 1
        byid = {int(e): (int(s), a) for s, e, a in
                zip(secs, eids, attrs)}
        for s, e, a in zip(cat["sec"], cat["event_id"],
                           cat["event_type"]):
            if pd.isna(a):
                continue    # null-type contract: dropped, like the
            byid[int(e)] = (int(s), str(a))    # batch twin's filter
        obs = sorted(((s, e, a) for e, (s, a) in byid.items()),
                     key=lambda t: (t[0], t[1]))
        state.update((
            [s for s, _, _ in obs],
            [e for _, e, _ in obs],
            [a for _, _, a in obs],
            ver,
        ))
        seq = [a for _, _, a in obs[:cap_per_user]]
        counts: dict[str, int] = {}
        for i in range(max(len(seq) - n + 1, 0)):
            p = " > ".join(seq[i:i + n])
            counts[p] = counts.get(p, 0) + 1
        ks = sorted(counts)
        m = len(ks)
        yield pd.DataFrame({
            "user": pd.array([key[0]] * m, dtype="Int64"),
            "path": ks,
            "n": pd.array([counts[p] for p in ks], dtype="Int64"),
            "ver": pd.array([ver] * m, dtype="Int64"),
        })
        if ttl_ms:
            max_ts = max(int(pdf["ts"].max().timestamp() * 1000)
                         for pdf in batches)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))

    return update


def stream_top_paths(event_stream: DataFrame, n: int = 3,
                     cap_per_user: int = 50,
                     user_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts",
                     id_col: str = "event_id",
                     ttl: str | None = None) -> DataFrame:
    """Streaming twin of ``operators.funnel.top_event_paths``'
    per-user path counts (incremental view maintenance): summing each
    user's max-ver rows by path equals the batch n-gram occurrence
    counts over everything seen, under any arrival order — the global
    top-k is one metadata-scale batch aggregation away. Shares the
    SCD2/transitions observation-set state schema and TTL convention."""
    if n < 2:
        raise ValueError("n must be >= 2 (n=1 is a plain type count)")
    if cap_per_user < n:
        raise ValueError("need cap_per_user >= n")
    ms = 0
    if ttl is not None:
        num, unit = ttl.split()
        ms = int(float(num) * {"millisecond": 1, "milliseconds": 1,
                               "second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000, "hours": 3_600_000}[unit])
    src = event_stream.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("long").alias("sec"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"))
    if ttl is not None:
        src = src.withWatermark("ts", ttl)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        src = src.drop("ts")
        timeout = GroupStateTimeout.NoTimeout
    return (src.groupBy("user")
            .applyInPandasWithState(
                _paths_fn(ms, n, cap_per_user), PATHS_OUT_SCHEMA,
                SCD2_STATE_SCHEMA, "update", timeout))


# ---------------------------------------------------------------------------
# streaming crawl-frontier rate limiter (fixed event-time windows)
# ---------------------------------------------------------------------------

RATE_OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("host", T.StringType()),
    T.StructField("win", T.LongType()),
])
RATE_STATE_SCHEMA = T.StructType([
    T.StructField("admitted", T.LongType()),
])


def _rate_limit_fn(cap: int, ttl_ms: int):
    def admit(key, rows: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        host, win = key[0], int(key[1])   # numpy scalars break the
        n = int(state.get[0]) if state.exists else 0  # state JSON codec
        for pdf in rows:
            if n >= cap:
                break
            # deterministic admission inside a micro-batch: event time
            # then doc id (across micro-batches it is arrival order —
            # the crawl semantics: politeness governs when you ACT)
            pdf = pdf.sort_values(["ts", "doc_id"])
            take = pdf.iloc[: cap - n]
            n += len(take)
            if len(take):
                yield pd.DataFrame({"doc_id": take["doc_id"],
                                    "host": host, "win": win})
        state.update((n,))
        # evict once the watermark passes the window's end
        state.setTimeoutTimestamp((win + 1) * ttl_ms)
    return admit


def stream_host_rate_limit(url_stream: DataFrame, cap: int = 5,
                           window: str = "10 minutes",
                           ts_col: str = "ts",
                           url_col: str = "url") -> DataFrame:
    """Streaming crawl-frontier politeness: admit at most ``cap``
    fetches per CANONICAL HOST per fixed event-time window — the
    incremental twin of the batch ``crawl_frontier_cap`` discipline,
    enforced AS URLS ARRIVE instead of on a frontier snapshot.

    Shape: canonicalization is the same stateless ``urls`` projection;
    the key is (host, floor(ts / window)) so each key's state is ONE
    counter long (O(1) serialization — the stream_dedup state rule),
    admission within a micro-batch is deterministic ((ts, doc_id)
    order; across micro-batches it is arrival order — politeness
    governs when you act, so replaying late data does not retract an
    admission), and every key times out once the watermark passes its
    window end (state is window-bounded, not host-bounded).

    Equals the batch fixed-window cap over the same rows when arrival
    order matches event order (test-pinned); under disorder the stream
    admits earlier-arriving rows — the documented trade."""
    from rgd_rnaseq_workflows_spark.operators.urls import (
        with_canonical_url)
    num, unit = window.split()
    ttl_ms = int(float(num) * {"second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000,
                               "hours": 3_600_000}[unit])
    c = (with_canonical_url(url_stream, url_col)
         .withColumn("host", F.split_part(
             F.split_part(F.col("canonical_url"), F.lit("://"),
                          F.lit(2)), F.lit("/"), F.lit(1)))
         .withColumn("ts", F.col(ts_col))
         .withWatermark("ts", window)
         .withColumn("win", (F.unix_millis("ts") / F.lit(ttl_ms))
                     .cast("long"))
         .select("doc_id", "host", "win", "ts"))
    return (c.groupBy("host", "win")
            .applyInPandasWithState(
                _rate_limit_fn(cap, ttl_ms), RATE_OUT_SCHEMA,
                RATE_STATE_SCHEMA, "append",
                GroupStateTimeout.EventTimeTimeout))


def batch_window_cap_kernel(urls: DataFrame, cap: int = 5,
                            window: str = "10 minutes",
                            ts_col: str = "ts",
                            url_col: str = "url") -> DataFrame:
    """The batch twin: per (canonical host, fixed event-time window),
    keep the ``cap`` earliest rows by (ts, doc_id). Window-rank form
    (test scale); at corpus scale the two-phase salted prefix-sum cap
    (``sampling.cap_tokens_per_key`` shape) replaces the single
    window."""
    from pyspark.sql import Window
    from rgd_rnaseq_workflows_spark.operators.urls import (
        with_canonical_url)
    num, unit = window.split()
    ttl_ms = int(float(num) * {"second": 1000, "seconds": 1000,
                               "minute": 60_000, "minutes": 60_000,
                               "hour": 3_600_000,
                               "hours": 3_600_000}[unit])
    c = (with_canonical_url(urls, url_col)
         .withColumn("host", F.split_part(
             F.split_part(F.col("canonical_url"), F.lit("://"),
                          F.lit(2)), F.lit("/"), F.lit(1)))
         .withColumn("win", (F.unix_millis(F.col(ts_col))
                             / F.lit(ttl_ms)).cast("long")))
    w = Window.partitionBy("host", "win").orderBy(F.col(ts_col),
                                                  "doc_id")
    return (c.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .select("doc_id", "host", "win"))

"""Custom stateful streaming operators via ``applyInPandasWithState``.

The scale-path use case: streaming exact deduplication of a document feed
(emit each content fingerprint's first occurrence, drop replays) — the
incremental twin of ``operators.dedup.exact_dedup``. State per group is a
bounded "seen" set keyed by the 60-bit portable hash; the group key is a
shard of the hash space, so state distributes evenly across executors and
a watermark-driven timeout bounds it in time.

Works identically on a batch DataFrame via the same ``applyInPandas``
kernel (minus state) — one kernel, two modes, mirroring
``streaming.events_stream``'s design.
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
STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.ArrayType(T.LongType())),
])
N_SHARDS = 64


def _with_shard(df: DataFrame, text_col: str = "text") -> DataFrame:
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    fp = md5_long(F.col(text_col))
    return (df.withColumn("fingerprint", fp)
            .withColumn("shard", F.pmod(F.col("fingerprint"),
                                        F.lit(N_SHARDS)).cast("int")))


def _dedup_batch(rows: Iterable[pd.DataFrame],
                 seen: set[int]) -> Iterator[pd.DataFrame]:
    for pdf in rows:
        keep_ids, keep_fps = [], []
        for doc_id, fp in zip(pdf["doc_id"], pdf["fingerprint"]):
            if int(fp) not in seen:
                seen.add(int(fp))
                keep_ids.append(int(doc_id))
                keep_fps.append(int(fp))
        if keep_ids:
            yield pd.DataFrame({"doc_id": keep_ids, "fingerprint": keep_fps})


def _stateful_dedup(key, rows: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    seen: set[int] = set(state.get[0]) if state.exists else set()
    out = list(_dedup_batch(rows, seen))
    state.update((list(seen),))
    yield from out


def stream_dedup(doc_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: one stateful group per hash shard; emits
    first occurrences only, across ALL micro-batches."""
    return (_with_shard(doc_stream, text_col)
            .groupBy("shard")
            .applyInPandasWithState(
                _stateful_dedup, DEDUP_OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def batch_dedup_kernel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The same kernel in batch mode (state lives for one group call):
    equivalent to exact_dedup but via the Arrow path — used to cross-check
    the streaming operator's semantics in tests."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out = list(_dedup_batch([pdf], set()))
        return (pd.concat(out) if out
                else pd.DataFrame({"doc_id": [], "fingerprint": []}))
    return (_with_shard(docs, text_col)
            .groupBy("shard")
            .applyInPandas(fn, DEDUP_OUT_SCHEMA))

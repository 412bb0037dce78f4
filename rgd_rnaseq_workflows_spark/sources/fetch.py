"""SRC8 — distributed remote-fetch connector with the reference's retry
contract (``scripts/SRA2QC_production.sh:66-70,120-167``: up to 8
attempts, exponential ×2 backoff capped at 600 s, typed non-failure
routing via exit code 2).

The fetch kernel itself (prefetch/fasterq-dump or any downloader) is a
pluggable callable — SURVEY §7.0's external-kernel boundary. What the
engine owns is the DISTRIBUTION: one fetch per run, fanned out with
``mapPartitions`` (the sanctioned per-partition imperative case — this is
ingestion, not a relational op), retried per the reference's schedule,
and collected into a typed status table that downstream plans join
against (the FIL9 file-existence contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_STATUS_SCHEMA = T.StructType([
    T.StructField("Run", T.StringType()),
    T.StructField("status", T.StringType()),      # ok | routed | failed
    T.StructField("detail", T.StringType()),      # layout / error text
    T.StructField("n_attempts", T.IntegerType()),
])


class RoutedLayout(Exception):
    """The typed exit-2 signal: not a failure — the run belongs to the
    other pipeline (``SRA2QC_production.sh:227-247``). Never retried."""

    def __init__(self, layout: str):
        super().__init__(layout)
        self.layout = layout


def fetch_runs(acclist: DataFrame, fetch_fn: Callable[[str], str],
               run_col: str = "Run", attempts: int = 8,
               base_delay: float = 1.0, backoff: float = 2.0,
               max_delay: float = 600.0,
               partitions: int | None = None) -> DataFrame:
    """Fan ``fetch_fn(run) -> detail`` out across executors, one task
    batch per partition, with retry/backoff per run. Returns the status
    table; nothing is collected to the driver."""
    spark = acclist.sparkSession
    runs = acclist.select(run_col)
    if partitions:
        runs = runs.repartition(partitions)

    def part(rows):
        import time
        for row in rows:
            run = row[0]
            delay = base_delay
            err = ""
            for attempt in range(1, attempts + 1):
                try:
                    detail = fetch_fn(run)
                    yield (run, "ok", detail, attempt)
                    break
                except RoutedLayout as r:
                    yield (run, "routed", r.layout, attempt)
                    break
                except Exception as e:  # transient fetch error → retry
                    err = f"{type(e).__name__}: {e}"
                    if attempt < attempts:
                        time.sleep(delay)
                        delay = min(delay * backoff, max_delay)
            else:
                yield (run, "failed", err, attempts)

    return spark.createDataFrame(runs.rdd.mapPartitions(part),
                                 FETCH_STATUS_SCHEMA)

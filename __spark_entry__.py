"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY §2 (plus the LLM-data-pipeline extensions) as (Spark plan, DuckDB
oracle) twin pairs — see ``rgd_rnaseq_workflows_spark/registry.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rgd_rnaseq_workflows_spark import registry  # noqa: E402

_PKG_ZIP: str | None = None


def _ensure_worker_imports(spark: SparkSession) -> None:
    """Ship the package to executor Python workers (addPyFile), so
    Arrow-kernel queries work even when the driver process was launched
    from a cwd where ``rgd_rnaseq_workflows_spark`` is not importable.
    Idempotent per SparkContext; the zip is built once per process."""
    global _PKG_ZIP
    sc = spark.sparkContext
    if getattr(sc, "_rgd_pkg_shipped", False):
        return
    if _PKG_ZIP is None:
        import tempfile
        import zipfile
        root = os.path.dirname(os.path.abspath(__file__))
        pkg = os.path.join(root, "rgd_rnaseq_workflows_spark")
        fd, zpath = tempfile.mkstemp(suffix="_rgd_pkg.zip")
        os.close(fd)
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _dirs, files in os.walk(pkg):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        zf.write(full, os.path.relpath(full, root))
        _PKG_ZIP = zpath
    sc.addPyFile(_PKG_ZIP)
    sc._rgd_pkg_shipped = True


def _with_shipping(fn: Callable[[SparkSession, str], DataFrame]
                   ) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_worker_imports(spark)
        return fn(spark, sf_dir)
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_worker_imports(spark)
    return registry.REGISTRY["q1_pricing_summary"].fn(
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_shipping(fn)
            for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops)."""
    return registry.oracle_sql()

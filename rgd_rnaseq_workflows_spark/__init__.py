"""rgd_rnaseq_workflows_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities
of ``rat-genome-database/RGD_RNAseq_workflows`` (a SLURM bash/awk/Perl
RNA-seq batch pipeline), re-expressed Spark-first:

- every coreutils/awk relational idiom in the reference becomes a
  declarative DataFrame plan (Catalyst chooses the physical strategy);
- fixed ``StructType`` schemas replace positional TSV conventions;
- sentinel strings (``NA``, ``Inf``, ``Unknown``) become typed NULLs
  internally and re-materialize only at sink time;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) extend the surface for 100 TB pipelines.

Subpackages:
- ``sources``    — readers/writers (TSV, STAR logs, RSEM results, BED, JSON tracks)
- ``operators``  — relational + scale operators (joins, pivot matrix, dedup, ANN)
- ``functions``  — scalar/text column functions
- ``plans``      — end-to-end pipeline stages mirroring the reference's DAG
- ``streaming``  — Structured Streaming extensions (incremental ingestion)
- ``multimodal`` — binary-column (image/audio/video) plumbing
"""

__version__ = "0.1.0"

from rgd_rnaseq_workflows_spark.session import get_spark  # noqa: F401

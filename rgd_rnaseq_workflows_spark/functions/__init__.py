"""Scalar and text column functions (SURVEY §2.8 F1–F19 + text-analysis
extensions). All JVM-side built-ins — zero Python UDFs in the hot path."""

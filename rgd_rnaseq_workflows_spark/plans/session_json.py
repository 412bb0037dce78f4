"""M5 — JBrowse2 session document assembly (D10).

Reproduces ``scripts/make_jbrowse_session_for_bioproject.py``:
- load per-sample track documents (SRC7, with TPMbed exclusions);
- skip tracks missing a trackId with a warning (``:106-109``);
- deterministic color assignment per (Tissue, Strain-before-comma, Sex,
  Sample-Characteristics) combo in sorted first-appearance order, cycling
  a 10-color palette (WIN1, ``:33-39,81-145``);
- assemble the nested session document and serialize with ``to_json``
  (indent-free; the reference's ``json.dump(indent=2)`` formatting is
  presentation, not semantics).

The color grouping key normalizes Strain at the first comma and collapses
whitespace in characteristics (F8, ``:133,137-138``) — shared with
``plans.tracks.assign_track_colors``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's 10-color palette (make_jbrowse_session:24-31 shape)
PALETTE = ("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
           "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")


def session_tracks(tracks: DataFrame,
                   palette: tuple[str, ...] = PALETTE) -> DataFrame:
    """Track metadata table → per-track display config with palette color.

    Input needs: trackId, track_name, Tissue, Strain, Sex,
    Sample_characteristics. Rows with NULL/empty trackId are dropped (the
    reference warns and skips them).
    """
    from rgd_rnaseq_workflows_spark.plans.tracks import assign_track_colors
    valid = tracks.filter(F.col("trackId").isNotNull()
                          & (F.col("trackId") != ""))
    colored = assign_track_colors(valid, palette_size=len(palette))
    color = F.element_at(F.array(*[F.lit(c) for c in palette]),
                         F.col("palette_idx").cast("int") + 1)
    return colored.withColumn("color", color)


def session_document(tracks: DataFrame, session_name: str,
                     assembly: str = "rn7") -> str:
    """Assemble the full nested session JSON (driver-side: the session doc
    is one small document per project — SURVEY D10 'driver-side Python
    dict (small data)')."""
    rows = (session_tracks(tracks)
            .orderBy("trackId")
            .select("trackId", "track_name", "color")
            .collect())
    import json
    doc = {
        "name": session_name,
        "view": {"id": "linearGenomeView", "type": "LinearGenomeView"},
        "assembly": assembly,
        "tracks": [
            {
                "type": "QuantitativeTrack",
                "configuration": r["trackId"],
                "displays": [{
                    "type": "LinearWiggleDisplay",
                    "displayId": f"{r['trackId']}-display",
                    "color": r["color"],
                }],
            }
            for r in rows
        ],
    }
    # fail-fast validation, as the reference re-parses its heredoc output
    # (BWjson_v7.sh:169-173)
    out = json.dumps(doc, indent=2)
    json.loads(out)
    return out

"""M5 — session document: trackId guard, palette colors, valid JSON."""

from __future__ import annotations

import json

from rgd_rnaseq_workflows_spark.plans.session_json import (
    PALETTE, session_document, session_tracks)

COLS = ["trackId", "track_name", "Tissue", "Strain", "Sex",
        "Sample_characteristics"]


def _tracks(spark):
    rows = [(f"RNAseq_GSM{i}", f"track {i}", f"T{i % 3}", "BN,extra", "M", "c")
            for i in range(6)]
    rows.append((None, "broken", "T0", "BN", "M", "c"))   # skipped
    rows.append(("", "empty", "T0", "BN", "M", "c"))      # skipped
    return spark.createDataFrame(rows, COLS)


def test_session_tracks_guard_and_colors(spark):
    out = session_tracks(_tracks(spark)).collect()
    assert len(out) == 6                       # two invalid rows dropped
    colors = {r["color"] for r in out}
    assert colors <= set(PALETTE)
    # same (Tissue, strain-key, sex, chars) combo → same color
    by_combo = {}
    for r in out:
        by_combo.setdefault(r["Tissue"], set()).add(r["color"])
    assert all(len(v) == 1 for v in by_combo.values())
    assert len({next(iter(v)) for v in by_combo.values()}) == 3


def test_session_document_is_valid_nested_json(spark):
    doc = json.loads(session_document(_tracks(spark), "PRJ session"))
    assert doc["name"] == "PRJ session"
    assert len(doc["tracks"]) == 6
    t0 = doc["tracks"][0]
    assert t0["configuration"] == "RNAseq_GSM0"
    assert t0["displays"][0]["color"] in PALETTE

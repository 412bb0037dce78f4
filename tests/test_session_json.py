"""M5 — session document: trackId guard, first-appearance palette colors,
valid nested JSON, and golden parity vs the reference's own builder."""

from __future__ import annotations

import copy
import json
import os
import subprocess

import pytest

from rgd_rnaseq_workflows_spark.plans.session_json import (
    PALETTE, build_session, session_tracks)

REF_SESSION = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
               "scripts/make_jbrowse_session_for_bioproject.py")

COLS = ["trackId", "track_name", "Tissue", "Strain", "Sex",
        "Sample_characteristics"]


def _tracks_df(spark):
    rows = [(f"RNAseq_GSM{i}", f"track {i}", f"T{i % 3}", "BN,extra", "M", "c")
            for i in range(6)]
    rows.append((None, "broken", "T0", "BN", "M", "c"))   # skipped
    rows.append(("", "empty", "T0", "BN", "M", "c"))      # skipped
    return spark.createDataFrame(rows, COLS)


def test_session_tracks_guard_and_colors(spark):
    out = session_tracks(_tracks_df(spark)).collect()
    assert len(out) == 6                       # two invalid rows dropped
    colors = {r["color"] for r in out}
    assert colors <= set(PALETTE)
    # same combo → same color; 3 distinct combos → 3 distinct colors
    by_combo = {}
    for r in out:
        by_combo.setdefault(r["Tissue"], set()).add(r["color"])
    assert all(len(v) == 1 for v in by_combo.values())
    assert len({next(iter(v)) for v in by_combo.values()}) == 3
    # first-appearance order: GSM0 (T0) gets palette[0], GSM1 (T1)
    # palette[1], GSM2 (T2) palette[2]
    got = {r["trackId"]: r["color"] for r in out}
    assert got["RNAseq_GSM0"] == PALETTE[0]
    assert got["RNAseq_GSM1"] == PALETTE[1]
    assert got["RNAseq_GSM2"] == PALETTE[2]


def _write_track_fixtures(prjdir):
    os.makedirs(prjdir, exist_ok=True)
    # 13 tracks / 12 distinct combos → palette cycles past 10; the combo of
    # track 00 repeats at track 12 (first-appearance reuse)
    for i in range(13):
        combo = i % 12
        doc = {
            "trackId": f"RNAseq_GSM{i:02d}",
            "name": f"track {i}",
            "metadata": {
                "Tissue": f"T{combo}",
                "Strain": "BN/NHsdMcwi, extra strain info",
                "Sex": "M" if i % 2 else "F",
                "Sample Characteristic": "age:  12  weeks",
            },
        }
        with open(f"{prjdir}/RNAseq_GSM{i:02d}.json", "w") as f:
            json.dump(doc, f)
    # decoys that must be excluded + a track without trackId
    with open(f"{prjdir}/RNAseq_geneTPMbed.json", "w") as f:
        json.dump({"trackId": "decoy"}, f)
    with open(f"{prjdir}/RNAseq_TXTPMbed.json", "w") as f:
        json.dump({"trackId": "decoy2"}, f)
    with open(f"{prjdir}/RNAseq_broken.json", "w") as f:
        json.dump({"name": "no trackId"}, f)


def _strip_timestamp(doc):
    doc = copy.deepcopy(doc)
    doc["session"]["description"] = "NORMALIZED"
    return doc


@pytest.mark.skipif(not os.path.exists(REF_SESSION),
                    reason="reference script unavailable")
def test_session_matches_reference_builder(spark, tmp_out):
    """Run the reference's make_jbrowse_session_for_bioproject.py on shared
    track fixtures and compare the entire document (timestamp normalized)."""
    prjdir = os.path.join(tmp_out, "prj")
    basedir = os.path.join(tmp_out, "base")
    _write_track_fixtures(prjdir)

    subprocess.run(["python3", REF_SESSION, "PRJG", prjdir, basedir],
                   check=True, capture_output=True, text=True)
    golden = json.load(open(f"{basedir}/PRJG_jbrowse_session_GRCr8.json"))

    ours = build_session(spark, "PRJG", prjdir)
    assert _strip_timestamp(ours) == _strip_timestamp(golden)

    # palette cycling past 10 groups: combo 10 and 11 wrap to 0 and 1;
    # track 12 reuses combo 0's color (first-appearance reuse)
    tid_color = {
        t["configuration"]: t["displays"][0]["color"]
        for t in ours["session"]["views"][0]["tracks"][1:]
    }
    assert tid_color["RNAseq_GSM10"] == PALETTE[0]
    assert tid_color["RNAseq_GSM11"] == PALETTE[1]
    assert tid_color["RNAseq_GSM12"] == tid_color["RNAseq_GSM00"]

"""M5 — JBrowse2 session document assembly (D10).

Reproduces ``scripts/make_jbrowse_session_for_bioproject.py`` end-to-end:
- discover per-sample track JSONs (``RNAseq_*.json``; TPMbed helpers
  excluded) in sorted order (SRC7 + SRT3, ``:62-70``);
- skip tracks without a ``trackId`` with a warning (``:106-109``);
- color assignment is **first-appearance order**: the palette index is the
  rank of each composite group key by the order its first track appears in
  the sorted file list (WIN1, ``:33-39``) — NOT alphabetical combo order;
- composite key = Tissue + Strain-before-comma + Sex + collapsed Sample
  Characteristic, each trimmed; all-empty → ``Unknown`` (``:128-141``);
- force track type/adapter, rewrite the BigWig URI to the public location
  (``:115-125``), set renderer colors in both sessionTracks and the view's
  track displays, prepend the gene track, and emit the full session
  document.

The color table is computed as a DataFrame window (rank by first-seen
order); the final document is assembled driver-side — per SURVEY D10 a
session is one small document per project.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PALETTE = ("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
           "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")

# static presentation scaffolding of the emitted document (content spec,
# not engine compute — SURVEY F19)
_GENE_TRACK = {
    "id": "F-8qwRhumS",
    "type": "FeatureTrack",
    "configuration": "Rat GRCr8 (rn8) Genes and Transcripts-GRCr8",
    "minimized": False,
    "displays": [{
        "id": "uZq89S4_XC",
        "type": "LinearBasicDisplay",
        "heightPreConfig": 152,
        "configuration": ("Rat GRCr8 (rn8) Genes and Transcripts-GRCr8-"
                          "LinearBasicDisplay"),
    }],
}
_VIEW_REGION = {"assemblyName": "GRCr8", "refName": "Chr4",
                "start": 0, "end": 1_000_000_000}
_TARGET_START_1, _TARGET_END_1 = 12_315_273, 14_497_135
_VIEWPORT_PX = 2000


def discover_track_files(prjdir: str | Path) -> list[Path]:
    """SRC7 globbing with the TPMbed exclusions, in sorted order (SRT3)."""
    out = []
    for p in Path(prjdir).rglob("RNAseq_*.json"):
        if "geneTPMbed" in p.name or "TXTPMbed" in p.name:
            continue
        out.append(p)
    return sorted(out)


def _norm(x) -> str:
    return "" if x is None else str(x).strip()


def combo_key_col() -> F.Column:
    """Composite grouping key, mirroring the reference's normalization:
    Strain truncated at the first comma, Sample Characteristic whitespace
    collapsed, all parts trimmed; all-empty → 'Unknown'."""
    tissue = F.trim(F.coalesce(F.col("Tissue"), F.lit("")))
    strain = F.trim(F.split(F.trim(F.coalesce(F.col("Strain"), F.lit(""))),
                            ",").getItem(0))
    sex = F.trim(F.coalesce(F.col("Sex"), F.lit("")))
    chars = F.trim(F.regexp_replace(
        F.coalesce(F.col("SampleChar"), F.lit("")), r"\s+", " "))
    key = F.concat(F.lit("Tissue="), tissue, F.lit(";Strain="), strain,
                   F.lit(";Sex="), sex, F.lit(";SampleChar="), chars)
    empty = (tissue == "") & (strain == "") & (sex == "") & (chars == "")
    return F.when(empty, F.lit("Unknown")).otherwise(key)


def color_table(track_meta: DataFrame,
                palette: tuple[str, ...] = PALETTE) -> DataFrame:
    """(trackId, order_idx, Tissue, Strain, Sex, SampleChar) → (trackId,
    color): group keys ranked by FIRST APPEARANCE (min order_idx per key),
    palette cycled by that rank."""
    keyed = track_meta.withColumn("combo", combo_key_col())
    first_seen = keyed.withColumn(
        "first_idx", F.min("order_idx").over(Window.partitionBy("combo")))
    ranked = first_seen.withColumn(
        "palette_idx",
        F.pmod(F.dense_rank().over(Window.orderBy("first_idx")) - 1,
               F.lit(len(palette))))
    color = F.element_at(F.array(*[F.lit(c) for c in palette]),
                         F.col("palette_idx").cast("int") + 1)
    return ranked.select("trackId", color.alias("color"))


def build_session(spark: SparkSession, bioproject_id: str,
                  prjdir: str | Path, timestamp: str = "") -> dict:
    """Assemble the full session document for one project."""
    files = discover_track_files(prjdir)
    tracks: list[dict] = []
    for p in files:
        doc = json.loads(p.read_text())
        if not doc.get("trackId"):
            continue
        tracks.append(doc)
    if not tracks:
        raise ValueError(f"no usable RNAseq tracks under {prjdir}")

    meta_rows = []
    for i, t in enumerate(tracks):
        md = t.get("metadata", {})
        meta_rows.append((t["trackId"], i, _norm(md.get("Tissue")),
                          _norm(md.get("Strain")), _norm(md.get("Sex")),
                          _norm(md.get("Sample Characteristic"))))
    meta = spark.createDataFrame(
        meta_rows,
        "trackId string, order_idx int, Tissue string, Strain string, "
        "Sex string, SampleChar string")
    colors = {r["trackId"]: r["color"] for r in color_table(meta).collect()}

    session_tracks, view_tracks = [], []
    for t in tracks:
        tid = t["trackId"]
        color = colors[tid]
        t["type"] = "QuantitativeTrack"
        adapter = t.setdefault("adapter", {})
        adapter["type"] = "BigWigAdapter"
        loc = adapter.setdefault("bigWigLocation", {})
        loc["locationType"] = "UriLocation"
        loc["uri"] = (f"https://download.rgd.mcw.edu/expression/"
                      f"{bioproject_id}/Genome-wide_read_coverage_BigWig_files/"
                      f"{tid}.bigwig")
        displays = t.get("displays")
        if not isinstance(displays, list) or not displays:
            displays = [{"type": "LinearWiggleDisplay",
                         "displayId": f"{tid}-LinearWiggleDisplay"}]
            t["displays"] = displays
        for d in displays:
            d["type"] = "LinearWiggleDisplay"
            d.setdefault("displayId", f"{tid}-LinearWiggleDisplay")
            renderer = d.get("renderer", {})
            renderer["type"] = "XYPlotRenderer"
            renderer["color1"] = color
            d["renderer"] = renderer
            renderers = d.get("renderers", {})
            renderers["XYPlotRenderer"] = {"type": "XYPlotRenderer",
                                           "color1": color}
            d["renderers"] = renderers
            d["defaultRendering"] = "xyplot"
        session_tracks.append(t)
        view_tracks.append({
            "type": "QuantitativeTrack",
            "configuration": tid,
            "displays": [{"type": "LinearWiggleDisplay",
                          "displayId": f"{tid}-LinearWiggleDisplay",
                          "color": color,
                          "defaultRendering": "xyplot"}],
        })

    window_bp = max(1, _TARGET_END_1 - _TARGET_START_1 + 1)
    bp_per_px = max(1.0, window_bp / float(_VIEWPORT_PX))
    offset_px = float(_TARGET_START_1 - 1) / bp_per_px
    view = {
        "id": "lgv1",
        "type": "LinearGenomeView",
        "tracks": [_GENE_TRACK, *view_tracks],
        "displayedRegions": [dict(_VIEW_REGION)],
        "bpPerPx": bp_per_px,
        "offsetPx": offset_px,
    }
    doc = {
        "session": {
            "name": f"{bioproject_id}_RNAseq_expression",
            "description": (f"Auto-generated session for {bioproject_id} "
                            f"on {timestamp}"),
            "views": [view],
            "sessionTracks": session_tracks,
        }
    }
    json.loads(json.dumps(doc))  # fail-fast validation (BWjson_v7.sh:169-173)
    return doc


# --- generic color assignment (kept for tracks-plan reuse) -------------------

def session_tracks(tracks: DataFrame,
                   palette: tuple[str, ...] = PALETTE) -> DataFrame:
    """Track metadata table → per-track palette color; first-appearance
    ranking keyed by trackId order. Input: trackId, track_name, Tissue,
    Strain, Sex, Sample_characteristics."""
    valid = (tracks.filter(F.col("trackId").isNotNull()
                           & (F.col("trackId") != ""))
             .withColumnRenamed("Sample_characteristics", "SampleChar"))
    w = Window.orderBy("trackId")
    meta = valid.withColumn("order_idx", F.row_number().over(w))
    return valid.join(color_table(meta), "trackId")

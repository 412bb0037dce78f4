"""JSONL corpus interchange: roundtrip, corrupt-line quarantine, shards."""

from __future__ import annotations

import glob
import gzip
import json
import os

from rgd_rnaseq_workflows_spark.sources.jsonl import (
    read_jsonl, read_jsonl_split, write_jsonl)


def test_roundtrip_and_shards(spark, tmp_path):
    rows = [(i, "en", "src0", f"doc number {i} text") for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, n_shards=4)
    parts = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(parts) == 4
    # each shard is plain gzip JSONL any loader can read
    line = json.loads(gzip.open(parts[0], "rt").readline())
    assert set(line) == {"doc_id", "lang", "source", "text"}

    clean, bad = read_jsonl_split(spark, out)
    assert bad.count() == 0
    got = {(r.doc_id, r.lang, r.source, r.text) for r in clean.collect()}
    assert got == set(rows)


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [json.dumps({"doc_id": 1, "lang": "en", "source": "s",
                         "text": "good"}),
             '{"doc_id": 2, "lang": "en", TRUNCATED',
             json.dumps({"doc_id": 3, "lang": "de", "source": "s",
                         "text": "auch gut"})]
    p.write_text("\n".join(lines) + "\n")
    clean, bad = read_jsonl_split(spark, str(p))
    assert {r.doc_id for r in clean.collect()} == {1, 3}
    quarantined = [r.raw_line for r in bad.collect()]
    assert quarantined == ['{"doc_id": 2, "lang": "en", TRUNCATED']
    assert "_corrupt_record" not in clean.columns

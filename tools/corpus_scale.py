"""Scale experiment for the corpus-curation pipeline (quality → lang →
exact dedup → PPJoin near-dup pairs → connected components).

Synthesizes N documents DETERMINISTICALLY (md5-derived filler tokens, so
any run reproduces the same corpus) with planted structure:
- every doc carries its language's stopwords → language filter keeps all;
- id ≡ 0 (mod 11): exact duplicate of id-44 (same lang, langs cycle 4);
- id ≡ 1 (mod 7): near-duplicate of id-28 (same fillers + one extra
  token → 2-gram Jaccard ≈ 0.9), building chains when id-28 is itself a
  near-dup — exactly what the component pass must collapse.

Usage: python tools/corpus_scale.py [N ...]   (default: 20000 80000)
Prints per-stage wall times and result counts; paste into NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.text import STOPWORDS
from rgd_rnaseq_workflows_spark.operators.components import connected_components
from rgd_rnaseq_workflows_spark.operators.dedup import (
    exact_dedup, ngram_jaccard_pairs)
from rgd_rnaseq_workflows_spark.session import get_spark

LANGS = sorted(STOPWORDS)
N_FILLER = 12


def synth_docs(spark, n: int):
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        (F.col("doc_id") % 4 + 1).cast("int"))
    stop_text = F.element_at(
        F.array(*[F.lit(" ".join(STOPWORDS[x])) for x in LANGS]),
        (F.col("doc_id") % 4 + 1).cast("int"))
    # content id: exact dups point 44 back, near-dups share id-28's fillers
    cid = (F.when((F.col("doc_id") % 11 == 0) & (F.col("doc_id") >= 44),
                  F.col("doc_id") - 44)
           .otherwise(F.col("doc_id")))
    near = (F.col("doc_id") % 7 == 1) & (F.col("doc_id") >= 28)
    fid = F.when(near, cid - 28).otherwise(cid)
    fillers = [F.substring(F.md5(F.concat(F.lit(f"f{k}:"),
                                          fid.cast("string"))), 1, 8)
               for k in range(N_FILLER)]
    extra = F.when(near & (cid == F.col("doc_id")),
                   F.concat(F.lit(" x"), F.substring(
                       F.md5(cid.cast("string")), 1, 6))).otherwise(F.lit(""))
    text = F.concat(stop_text, F.lit(" "),
                    F.concat_ws(" ", *fillers), extra)
    return base.select("doc_id", lang.alias("lang"),
                       F.lit("synth").alias("source"), text.alias("text"))


def run(n: int) -> None:
    spark = get_spark(f"corpus-scale-{n}")
    docs = synth_docs(spark, n).localCheckpoint()
    print(f"\n== N={n} ==")
    t0 = time.time()
    uniq = exact_dedup(docs, "text", "doc_id").localCheckpoint()
    n_uniq = uniq.count()
    print(f"exact dedup: {n} -> {n_uniq} docs  [{time.time()-t0:.1f}s]")
    t0 = time.time()
    pairs = ngram_jaccard_pairs(uniq, block_col="lang", shingle_n=2,
                                threshold=0.8).localCheckpoint()
    n_pairs = pairs.count()
    print(f"ppjoin pairs: {n_pairs}  [{time.time()-t0:.1f}s]")
    t0 = time.time()
    comps = connected_components(pairs)
    n_clusters = comps.select("comp").distinct().count()
    n_members = comps.count()
    print(f"components: {n_members} nodes in {n_clusters} clusters "
          f"[{time.time()-t0:.1f}s]")
    t0 = time.time()
    keepers = comps.filter(F.col("comp") != F.col("id")) \
                   .select(F.col("id").alias("doc_id"))
    curated = uniq.join(keepers, "doc_id", "left_anti").localCheckpoint()
    final = curated.count()
    print(f"curated: {final} docs  [{time.time()-t0:.1f}s]")

    # round-3 stages: decontamination (benchmark = every 97th doc's text
    # re-labeled as an eval set) + stratified mix sampling
    from rgd_rnaseq_workflows_spark.operators.contamination import (
        decontaminate)
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        stratified_hash_sample)
    bench = docs.filter(F.col("doc_id") % 97 == 3).select(
        "doc_id", "lang", F.lit("eval").alias("source"), "text")
    t0 = time.time()
    # min_shared=8: every synthetic doc begins with its language's 8
    # stopwords, so ANY same-lang pair shares those 5 in-prefix 4-grams;
    # docs sharing a bench doc's 12 filler tokens (planted dups) clear 8
    # easily, unrelated docs never do — the threshold is doing exactly
    # its production job (common boilerplate ≠ contamination)
    clean = decontaminate(curated, bench, shingle_n=4,
                          min_shared=8).localCheckpoint()
    n_clean = clean.count()
    print(f"decontaminated: {n_clean} docs (-{final - n_clean})  "
          f"[{time.time()-t0:.1f}s]")
    t0 = time.time()
    mix = stratified_hash_sample(
        clean, "lang", {"en": 0.5, "de": 0.25}, "doc_id", default=0.1)
    n_mix = mix.count()
    print(f"training mix: {n_mix} docs  [{time.time()-t0:.1f}s]")

    # round-3 second-sitting stages: temperature mix / frequency cap /
    # bigram-LM familiarity over the curated corpus
    from rgd_rnaseq_workflows_spark.operators.quality import bigram_lm_report
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        cap_per_key, temperature_mix)
    t0 = time.time()
    n_tm = temperature_mix(clean, "lang", "doc_id", 0.3).count()
    print(f"temperature mix: {n_tm} docs  [{time.time()-t0:.1f}s]")
    t0 = time.time()
    n_cap = cap_per_key(clean, "lang", n // 8, "doc_id").count()
    print(f"freq cap (hot-key windows): {n_cap} docs  "
          f"[{time.time()-t0:.1f}s]")
    t0 = time.time()
    blm = bigram_lm_report(clean)
    n_blm, hapax = blm.agg(F.count("*"),
                           F.sum("n_hapax")).first()
    print(f"bigram LM: {n_blm} docs scored, {hapax} hapax positions "
          f"[{time.time()-t0:.1f}s]")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 80000]
    for n in sizes:
        run(n)

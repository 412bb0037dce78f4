"""CLI: curate a document corpus (the LLM-training-data pipeline).

Usage:
  python -m rgd_rnaseq_workflows_spark.run_corpus \
      --docs /data/documents.parquet --out out/corpus \
      [--min-tokens 20] [--shingle-n 2] [--threshold 0.8] \
      [--benchmark /data/eval.parquet [--contam-n 4] [--min-shared 1]] \
      [--mix en=0.5,de=0.25 [--mix-default 0.0] [--mix-seed 7]]

Reads a parquet documents table (doc_id, lang, source, text, …), runs
quality gate → language-consistency filter → exact dedup → near-dup
cluster removal (``plans/corpus.py``), writes the curated subset as
parquet partitioned by lang plus a per-language stats TSV.

With ``--benchmark`` the curated set is decontaminated against the eval
docs (n-gram overlap, ``operators/contamination.py``); with ``--mix``
each language is sampled at its rate (deterministic md5 buckets,
``operators/sampling.py``) — together the full training-mix pipeline
(registry ``corpus_training_mix``).
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import time

from rgd_rnaseq_workflows_spark.plans.corpus import curate_corpus, curation_stats
from rgd_rnaseq_workflows_spark.session import get_spark
from rgd_rnaseq_workflows_spark.sources.tsv import write_tsv


@contextlib.contextmanager
def _stage(label: str):
    """Per-stage wall clock on stderr. Lazy stages (filters, joins that
    only extend the lineage) report ~0 here and pay inside the stage
    that materializes them — the curated write, a checkpoint, or a
    report sink; the eager stages are the honest breakdown."""
    t0 = time.time()
    yield
    print(f"[corpus] stage {label}: {time.time() - t0:.1f}s",
          file=sys.stderr)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus",
        description="corpus curation: quality -> lang -> exact dedup -> "
                    "near-dup clusters")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--exact-substr", type=int, default=None,
                   metavar="L",
                   help="rewrite exact duplicated substrings out before "
                        "curation: every L-token window occurring 2+ "
                        "times keeps only its first occurrence (Lee et "
                        "al. 2022 ExactSubstr shape)")
    p.add_argument("--passage-dedup", type=int, default=None,
                   metavar="WINDOW",
                   help="pre-curation passage-level dedup rewrite: drop "
                        "every duplicated WINDOW-token passage except its "
                        "first occurrence and re-assemble documents")
    p.add_argument("--dsir-target", default=None, metavar="SQL_PRED",
                   help="DSIR selection: SQL predicate defining the "
                        "target slice (e.g. \"source = 'src0'\")")
    p.add_argument("--dsir-keep", type=float, default=0.25,
                   help="fraction of curated docs kept by DSIR weight "
                        "(with --dsir-target)")
    p.add_argument("--shingle-n", type=int, default=2)
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--benchmark", default=None,
                   help="eval-set parquet (doc-shaped); curated docs "
                        "sharing n-grams with it are dropped")
    p.add_argument("--contam-n", type=int, default=4,
                   help="contamination shingle size")
    p.add_argument("--min-shared", type=int, default=1,
                   help="shared-shingle count that flags a doc")
    p.add_argument("--token-waterfill", type=int, default=None,
                   metavar="PCT",
                   help="cap the curated set to PCT%% of its tokens via "
                        "max-min fair water-filling over sources: small "
                        "sources keep everything, large ones clip to "
                        "the common level; writes the allocation TSV "
                        "(out/waterfill) and enforces it with the "
                        "deterministic md5-rank prefix cap; mutually "
                        "exclusive with the other mix modes")
    p.add_argument("--temperature-mix", type=float, default=None,
                   metavar="FRACTION",
                   help="temperature-resampled mix (alpha=0.5): keep "
                        "~FRACTION of the corpus with per-language rates "
                        "proportional to sqrt(count) — rare languages "
                        "up-weighted; mutually exclusive with --mix")
    p.add_argument("--splits", action="store_true",
                   help="add a deterministic train/val/test column "
                        "(md5 bucket of doc_id, 80/10/10) to the curated "
                        "output — stable under repartitioning")
    p.add_argument("--cluster-splits", type=float, nargs="?",
                   const=0.5, default=None, metavar="THRESHOLD",
                   help="like --splits, but the split hashes the "
                        "near-dup COMPONENT label so near-duplicate "
                        "docs never cross train/test (leakage-free). "
                        "Pairs are computed on the CURATED docs at "
                        "this Jaccard threshold (default 0.5 — lower "
                        "than curation's, to catch the surviving "
                        "lower-similarity twins curation keeps)")
    p.add_argument("--chunks", type=int, default=None, metavar="WINDOW",
                   help="also write an overlapping chunk table (RAG/"
                        "embedding indexing) with this token window")
    p.add_argument("--chunk-stride", type=int, default=None,
                   help="chunk stride (default 3/4 of the window)")
    p.add_argument("--neardup-report", action="store_true",
                   help="also write near-dup graph reports (cluster "
                        "keepers, PageRank centrality, train/val/test "
                        "leakage) — the pair graph is computed ONCE and "
                        "shared with the curation's cluster removal")
    p.add_argument("--shards", type=int, default=None, metavar="N",
                   help="also write a training-ready shard-partitioned "
                        "copy (md5 pseudorandom shard of doc_id) plus a "
                        "per-shard manifest TSV")
    p.add_argument("--layout", choices=["zorder", "hilbert"],
                   default=None,
                   help="also write a space-filling-curve clustered "
                        "copy of the curated set (out/clustered): one "
                        "sampled range shuffle on the curve key, so "
                        "parquet footer min/max stats prune files for "
                        "multi-dimensional box predicates")
    p.add_argument("--layout-cols", default="doc_id,n_tokens",
                   metavar="C1,C2",
                   help="integer columns to interleave for --layout "
                        "(default doc_id,n_tokens)")
    p.add_argument("--layout-files", type=int, default=16,
                   help="output file count for --layout (default 16)")
    p.add_argument("--lake", default=None, metavar="PARQUET",
                   help="existing-lake documents parquet for "
                        "--containment-report")
    p.add_argument("--containment-report", type=float, default=None,
                   metavar="MIN_FRAC",
                   help="write a winnowing containment report of the "
                        "curated (incoming) docs against --lake: pairs "
                        "where >= MIN_FRAC of the incoming doc's "
                        "fingerprints appear in a lake doc (quote/"
                        "boilerplate-copy detection; join is new x lake "
                        "only)")
    p.add_argument("--cdc-containment", type=int, default=None,
                   metavar="BP",
                   help="drop documents contained in a larger one at or "
                        "above this many basis points of CDC chunk-set "
                        "containment (keep-the-larger policy; shift-"
                        "robust - an excerpt moved by one token still "
                        "matches)")
    p.add_argument("--mix", default=None,
                   help="per-language keep rates, e.g. en=0.5,de=0.25")
    p.add_argument("--mix-default", type=float, default=0.0,
                   help="keep rate for languages not in --mix")
    p.add_argument("--mix-seed", type=int, default=7)
    p.add_argument("--epoch-budget", type=int, default=None,
                   metavar="TOKENS",
                   help="data-constrained mix: allocate TOKENS across "
                        "languages by --epoch-weights, cap each at "
                        "--max-epochs passes, re-flow the excess, and "
                        "write the REPEATED corpus (epoch column); "
                        "mutually exclusive with --mix/--temperature-mix")
    p.add_argument("--epoch-weights", default=None,
                   help="integer weights for --epoch-budget, e.g. "
                        "en=50,de=20")
    p.add_argument("--max-epochs", type=int, default=4,
                   help="repetition cap for --epoch-budget")
    p.add_argument("--ann-index", default=None, metavar="PATH",
                   help="fit coarse k-means on --embeddings and persist "
                        "the IVF layout (vectors partitionBy(cluster) + "
                        "exact-int centroid table) under PATH; probe it "
                        "later with the probe-ann subcommand")
    p.add_argument("--embeddings", default=None, metavar="PARQUET",
                   help="embeddings parquet (vec_id, embedding) for "
                        "--ann-index")
    p.add_argument("--ann-clusters", type=int, default=8,
                   help="coarse quantizer cardinality for --ann-index "
                        "(production sizing: ∝ N / target list size)")
    p.add_argument("--ann-iters", type=int, default=2,
                   help="k-means assignment passes for --ann-index")
    p.add_argument("--ann-append", action="store_true",
                   help="with --ann-index: append --embeddings into "
                        "the EXISTING index (frozen coarse quantizer) "
                        "instead of rebuilding")
    p.add_argument("--lsh-index", default=None, metavar="PATH",
                   help="persist the MinHash/LSH bucket index of the "
                        "CURATED corpus under PATH (banded signatures "
                        "partitioned by band, bucket-sorted files); "
                        "probe it later with the probe-lsh subcommand")
    p.add_argument("--lsh-hashes", type=int, default=8)
    p.add_argument("--lsh-band-size", type=int, default=2)
    p.add_argument("--lsh-shingle-n", type=int, default=3)
    p.add_argument("--bm25-index", default=None, metavar="PATH",
                   help="persist the inverted (BM25) posting-list "
                        "index of the CURATED corpus under PATH "
                        "(term-hash-bucket directories, term-sorted "
                        "files); probe it later with the probe-bm25 "
                        "subcommand")
    p.add_argument("--bm25-append", action="store_true",
                   help="with --bm25-index: append the curated docs "
                        "into the EXISTING index (postings + meta "
                        "delta) instead of rebuilding")
    p.add_argument("--bm25-buckets", type=int, default=32,
                   help="term-hash directory fan-out for --bm25-index")
    p.add_argument("--epoch-key", default=None, metavar="KEY",
                   help="with --ann-append/--bm25-append/"
                        "--contam-append: commit the append under "
                        "this ledger epoch key, making the run "
                        "retry-safe (a replayed key is a no-op; "
                        "default mints a fresh batch-N key)")
    p.add_argument("--contam-index", default=None, metavar="PATH",
                   help="persist the --benchmark eval suite's "
                        "exact-substring fingerprint index under PATH "
                        "(decontamination-as-a-service: ladder the "
                        "evals once, probe every corpus delta with "
                        "probe-contam)")
    p.add_argument("--contam-append", action="store_true",
                   help="with --contam-index: append --benchmark "
                        "into the EXISTING index at its frozen "
                        "window instead of rebuilding")
    p.add_argument("--contam-window", type=int, default=8,
                   help="window length (tokens) for --contam-index "
                        "builds (frozen into the index meta)")
    p.add_argument("--ccnet-keep", default=None, metavar="BANDS",
                   help="CCNet perplexity gate: keep only the curated "
                        "docs in these comma-separated KN-perplexity "
                        "bands (head,middle,tail; Wenzek 2020 keeps "
                        "'head'); docs too short to score are dropped")
    return p


def build_probe_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus probe-ann",
        description="probe a persisted IVF index: centroid rank "
                    "(metadata) -> directory-pruned scan -> exact "
                    "cosine top-k over the probed lists only")
    p.add_argument("--index", required=True,
                   help="IVF layout written by --ann-index")
    p.add_argument("--embeddings", required=True,
                   help="embeddings parquet holding the query vector")
    p.add_argument("--query-id", type=int, required=True,
                   help="vec_id of the query vector in --embeddings")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=2)
    p.add_argument("--out", default=None, metavar="DIR",
                   help="write the top-k as TSV here (default: stdout)")
    return p


def parse_mix(spec: str) -> dict[str, float]:
    out = {}
    for part in spec.split(","):
        lang, _, rate = part.partition("=")
        if not rate:
            raise ValueError(f"--mix entry {part!r} is not lang=rate")
        out[lang.strip()] = float(rate)
    return out


def run(args: argparse.Namespace) -> int:
    spark = get_spark("corpus-curation")
    out = args.out.rstrip("/")
    docs = spark.read.parquet(args.docs)
    if args.exact_substr:
        import pyspark.sql.functions as F

        from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
            rewrite_without_duplicate_substrings)
        with _stage("exact-substring dedup (lazy)"):
            rw = rewrite_without_duplicate_substrings(
                docs, window=args.exact_substr)
            docs = (rw.drop("text", "removed_tokens", "n_spans")
                    .withColumnRenamed("clean_text", "text"))
            if "n_chars" in docs.columns:
                docs = docs.withColumn("n_chars", F.length("text"))
    if args.passage_dedup:
        from rgd_rnaseq_workflows_spark.operators.dedup import (
            remove_duplicate_passages)
        import pyspark.sql.functions as F
        with _stage("passage-dedup (lazy)"):
            clean = remove_duplicate_passages(docs,
                                              window=args.passage_dedup)
            docs = (docs.drop("text")
                    .join(clean.select("doc_id",
                                       F.col("clean_text").alias("text")),
                          "doc_id"))
    if args.neardup_report:
        # pair graph computed ONCE: cluster removal inside the curation
        # and all three graph reports read the same checkpointed edges
        from rgd_rnaseq_workflows_spark.plans.corpus import (
            curate_corpus_graph)
        from rgd_rnaseq_workflows_spark.plans.neardup import neardup_analysis
        with _stage("curation + pair graph (eager checkpoint)"):
            curated, pairs = curate_corpus_graph(
                docs, min_tokens=args.min_tokens,
                shingle_n=args.shingle_n, threshold=args.threshold)
        with _stage("neardup reports"):
            for name, rep in neardup_analysis(pairs, docs).items():
                # order by EVERY column: the leakage report ties on its
                # first column (one split_lo, many split_hi) and a
                # one-column sort leaves tie order run-dependent —
                # reports must be byte-deterministic
                write_tsv(rep.orderBy(*rep.columns),
                          f"{out}/neardup_{name}", single_file=True)
    else:
        curated = curate_corpus(docs, min_tokens=args.min_tokens,
                                shingle_n=args.shingle_n,
                                threshold=args.threshold)
    if args.dsir_target:
        import pyspark.sql.functions as F
        from rgd_rnaseq_workflows_spark.operators.dsir import (
            importance_weights, select_top_fraction)
        w = importance_weights(curated, F.expr(args.dsir_target))
        keep = select_top_fraction(w, args.dsir_keep).select("doc_id")
        curated = curated.join(keep, "doc_id", "left_semi")
    if args.benchmark:
        from rgd_rnaseq_workflows_spark.operators.contamination import (
            decontaminate)
        bench = spark.read.parquet(args.benchmark)
        curated = decontaminate(curated, bench, shingle_n=args.contam_n,
                                min_shared=args.min_shared)
    if args.ccnet_keep:
        import pyspark.sql.functions as F
        from rgd_rnaseq_workflows_spark.operators.quality import (
            ccnet_band_assign)
        bands = {b.strip() for b in args.ccnet_keep.split(",") if b.strip()}
        bad = bands - {"head", "middle", "tail"}
        if bad:
            raise SystemExit(f"--ccnet-keep: unknown band(s) {sorted(bad)}")
        with _stage(f"CCNet perplexity gate (keep {sorted(bands)})"):
            keep = (ccnet_band_assign(curated, n_buckets=3)
                    .filter(F.col("band").isin(sorted(bands)))
                    .select("doc_id"))
            curated = curated.join(keep, "doc_id", "left_semi")
    if args.cdc_containment is not None:
        import pyspark.sql.functions as F
        from rgd_rnaseq_workflows_spark.operators.chunking import (
            cdc_containment_keepers)
        with _stage("cdc containment drop (keep-the-larger)"):
            # anti-join against the LOSERS (kept=false), not semi-join
            # on winners: the keeper report only covers chunkable docs,
            # and this stage drops contained duplicates ONLY — a zero-
            # token doc is absent from the report and must pass through
            drop = (cdc_containment_keepers(
                curated, min_containment_bp=args.cdc_containment)
                .filter(~F.col("kept")).select("doc_id"))
            curated = curated.join(drop, "doc_id", "left_anti")
    mix_modes = sum(bool(m) for m in
                    (args.mix, args.temperature_mix is not None,
                     args.epoch_budget is not None,
                     args.token_waterfill is not None))
    if mix_modes > 1:
        raise SystemExit("--mix, --temperature-mix, --epoch-budget and "
                         "--token-waterfill are mutually exclusive")
    if args.epoch_budget is not None and not args.epoch_weights:
        raise SystemExit("--epoch-budget requires --epoch-weights")
    if args.token_waterfill is not None:
        import pyspark.sql.functions as F
        from rgd_rnaseq_workflows_spark.functions.text import token_count
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            cap_tokens_per_key, token_waterfill_allocation)
        with _stage("water-fill budget cap"):
            weighted = curated.withColumn("_wf_tokens",
                                          token_count("text"))
            alloc = token_waterfill_allocation(
                weighted, args.token_waterfill, by="source",
                weight_col="_wf_tokens")
            write_tsv(alloc, f"{out}/waterfill", single_file=True)
            curated = cap_tokens_per_key(
                weighted, "source",
                alloc.select("source", "allocated_tokens"),
                "_wf_tokens", "doc_id",
                seed=args.mix_seed).drop("_wf_tokens", "cum_tokens")
    if args.mix:
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            stratified_hash_sample)
        curated = stratified_hash_sample(
            curated, "lang", parse_mix(args.mix), "doc_id",
            seed=args.mix_seed, default=args.mix_default)
    elif args.temperature_mix is not None:
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            temperature_mix)
        curated = temperature_mix(curated, "lang", "doc_id",
                                  total_fraction=args.temperature_mix,
                                  seed=args.mix_seed).drop("mix_bps")
    elif args.epoch_budget is not None:
        import pyspark.sql.functions as F
        from rgd_rnaseq_workflows_spark.functions.text import token_count
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            epoch_budget_mix, epoch_budget_waterfall)
        weights = {k: int(v) for k, v in parse_mix(
            args.epoch_weights).items()}
        with _stage("epoch-budget allocation"):
            totals = {r[0]: r[1] for r in
                      curated.groupBy("lang")
                      .agg(F.sum(token_count("text")).alias("t"))
                      .collect()}
            plan = epoch_budget_waterfall(totals, weights,
                                          args.epoch_budget,
                                          args.max_epochs)
            for s, p_ in sorted(plan.items()):
                print(f"[corpus] epoch-budget {s}: "
                      f"{p_['tokens_allocated']}/{p_['tokens_available']}"
                      f" tokens, {p_['epochs_bps'] / 10000:.2f} epochs"
                      f"{' (capped)' if p_['capped'] else ''}",
                      file=sys.stderr)
            curated = epoch_budget_mix(
                curated, "lang", "doc_id",
                {s: p_["epochs_bps"] for s, p_ in plan.items()},
                seed=args.mix_seed)
    if args.splits and args.cluster_splits is not None:
        print("[corpus] --splits and --cluster-splits are mutually "
              "exclusive", file=sys.stderr)
        return 2
    if args.splits:
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            split_assign)
        curated = curated.withColumn(
            "split", split_assign("doc_id", seed=13))
    if args.cluster_splits is not None:
        from rgd_rnaseq_workflows_spark.operators.components import (
            connected_components)
        from rgd_rnaseq_workflows_spark.operators.sampling import (
            cluster_split_assign)
        from rgd_rnaseq_workflows_spark.plans.neardup import (
            near_dup_pairs_cached)
        with _stage("cluster splits"):
            # pairs on the CURATED survivors at the (lower) split
            # threshold: curation already collapsed >= its own
            # threshold; leakage protection targets the borderline
            # twins that remain
            split_pairs = near_dup_pairs_cached(
                curated, shingle_n=args.shingle_n,
                threshold=args.cluster_splits)
            asg = cluster_split_assign(
                curated, connected_components(split_pairs), seed=13)
            curated = curated.join(
                asg.withColumnRenamed("id", "doc_id")
                .select("doc_id", "split"), "doc_id", "left")
    # partition by lang: downstream training jobs prune per-language;
    # the curated set is a fraction of the input, so files stay chunky
    with _stage("curated write (materializes lazy stages)"):
        (curated.write.mode("overwrite").partitionBy("lang")
         .parquet(f"{out}/curated"))
    with _stage("stats"):
        stats = curation_stats(spark.read.parquet(f"{out}/curated"))
        write_tsv(stats.orderBy("lang"), f"{out}/stats", single_file=True)
        for r in stats.orderBy("lang").collect():
            print(f"[corpus] {r['lang']}: {r['n_docs']} docs, "
                  f"{r['total_tokens']} tokens", file=sys.stderr)
    if args.layout:
        cols = [c.strip() for c in args.layout_cols.split(",") if c.strip()]
        if len(cols) < 2:
            raise SystemExit("--layout-cols needs >= 2 columns")
        with _stage(f"{args.layout} clustered write"):
            final = spark.read.parquet(f"{out}/curated")
            if args.layout == "zorder":
                from rgd_rnaseq_workflows_spark.operators.zorder import (
                    write_zordered)
                write_zordered(final, f"{out}/clustered", cols,
                               n_files=args.layout_files)
            else:
                from rgd_rnaseq_workflows_spark.operators.hilbert import (
                    write_hilbert_clustered)
                write_hilbert_clustered(final, f"{out}/clustered", cols,
                                        n_files=args.layout_files)
    if args.chunks:
        from rgd_rnaseq_workflows_spark.operators.chunking import (
            chunk_documents)
        stride = args.chunk_stride or max(1, args.chunks * 3 // 4)
        with _stage("chunks"):
            final = spark.read.parquet(f"{out}/curated")
            (chunk_documents(final, window=args.chunks, stride=stride)
             .write.mode("overwrite").parquet(f"{out}/chunks"))
    if args.containment_report is not None:
        if not args.lake:
            raise SystemExit("--containment-report requires --lake")
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            cross_containment_pairs, winnow_fingerprints)
        with _stage("containment report"):
            final = spark.read.parquet(f"{out}/curated")
            lake = spark.read.parquet(args.lake)
            rep = cross_containment_pairs(
                winnow_fingerprints(final), winnow_fingerprints(lake),
                min_shared=2, min_containment=args.containment_report)
            write_tsv(rep.orderBy(*rep.columns), f"{out}/containment",
                      single_file=True)
    if args.shards:
        from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
        from rgd_rnaseq_workflows_spark.operators.packing import shard_corpus
        import pyspark.sql.functions as F
        with _stage("shards"):
            final = spark.read.parquet(f"{out}/curated")
            h = md5_long(F.col("doc_id").cast("string"), seed=11)
            # shard + within-shard order: the data loader reads each
            # shard as an independent pre-shuffled stream
            (final.withColumn("shard",
                              F.pmod(h, F.lit(args.shards)).cast("int"))
             .withColumn("ord", h)
             .repartition(args.shards, F.col("shard"))
             .sortWithinPartitions("shard", "ord")
             .drop("ord")  # ordering key is an implementation detail —
                           # published shard rows carry corpus columns
             .write.mode("overwrite").partitionBy("shard")
             .parquet(f"{out}/shards"))
            manifest = shard_corpus(final, n_shards=args.shards, seed=11)
            write_tsv(manifest, f"{out}/shard_manifest", single_file=True)
    if args.ann_index:
        if not args.embeddings:
            raise SystemExit("--ann-index requires --embeddings")
        if args.ann_append:
            from rgd_rnaseq_workflows_spark.operators.ivf_index import (
                append_to_ivf_index)
            with _stage("IVF index append (frozen quantizer)"):
                append_to_ivf_index(spark.read.parquet(args.embeddings),
                                    args.ann_index,
                                    epoch_key=args.epoch_key)
        else:
            from rgd_rnaseq_workflows_spark.operators.clustering import (
                kmeans_fit)
            from rgd_rnaseq_workflows_spark.operators.ivf_index import (
                write_ivf_index)
            with _stage("IVF index build (k-means fit + partitioned "
                        "write)"):
                emb = spark.read.parquet(args.embeddings)
                assigned, _ = kmeans_fit(emb, k=args.ann_clusters,
                                         iters=args.ann_iters,
                                         persist=False)
                write_ivf_index(assigned, args.ann_index,
                                label_col="cluster")
    if args.lsh_index:
        from rgd_rnaseq_workflows_spark.operators.lsh_index import (
            write_lsh_index)
        with _stage("LSH index build (sign + banded partitioned write)"):
            final = spark.read.parquet(f"{out}/curated")
            write_lsh_index(final, args.lsh_index,
                            num_hashes=args.lsh_hashes,
                            band_size=args.lsh_band_size,
                            shingle_n=args.lsh_shingle_n)
    if args.bm25_index:
        final = spark.read.parquet(f"{out}/curated")
        if args.bm25_append:
            from rgd_rnaseq_workflows_spark.operators.inverted_index \
                import append_to_inverted_index
            with _stage("BM25 index append (postings + ledger "
                        "delta)"):
                append_to_inverted_index(final, args.bm25_index,
                                         epoch_key=args.epoch_key)
        else:
            from rgd_rnaseq_workflows_spark.operators.inverted_index \
                import write_inverted_index
            with _stage("BM25 index build (posting-list partitioned "
                        "write)"):
                write_inverted_index(final, args.bm25_index,
                                     num_buckets=args.bm25_buckets)
    if args.contam_index:
        if not args.benchmark:
            raise SystemExit("--contam-index requires --benchmark")
        bench = spark.read.parquet(args.benchmark)
        if args.contam_append:
            from rgd_rnaseq_workflows_spark.operators.exact_substrings \
                import append_to_contamination_index
            with _stage("contamination index append (frozen window)"):
                append_to_contamination_index(bench, args.contam_index,
                                              epoch_key=args.epoch_key)
        else:
            from rgd_rnaseq_workflows_spark.operators.exact_substrings \
                import write_contamination_index
            with _stage("contamination index build (eval fingerprint "
                        "ladder)"):
                write_contamination_index(bench, args.contam_index,
                                          window=args.contam_window)
    return 0


def run_probe(args: argparse.Namespace) -> int:
    """probe-ann: one query against a persisted IVF layout — reads the
    k×dims centroid table plus ONLY the probed cluster directories."""
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        ivf_index_topk)
    spark = get_spark("ann-probe")
    qrow = (spark.read.parquet(args.embeddings)
            .filter(F.col("vec_id") == args.query_id)
            .select("embedding").head())
    if qrow is None:
        raise SystemExit(f"vec_id {args.query_id} not found in "
                         f"{args.embeddings}")
    with _stage(f"IVF probe (k={args.k}, nprobe={args.nprobe})"):
        topk = ivf_index_topk(spark, args.index,
                              [float(x) for x in qrow["embedding"]],
                              k=args.k, nprobe=args.nprobe)
        if args.out:
            write_tsv(topk, args.out, single_file=True)
        else:
            for r in topk.collect():
                print(f"{r['vec_id']}\t{r['cosine_sim']}")
    return 0


def build_lsh_probe_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus probe-lsh",
        description="probe a persisted LSH index: is this document a "
                    "near-dup candidate of anything in the lake? One "
                    "pruned index scan; candidates only — verify with "
                    "exact Jaccard against the corpus")
    p.add_argument("--index", required=True,
                   help="LSH layout written by --lsh-index")
    p.add_argument("--text", required=True,
                   help="query document text")
    p.add_argument("--out", default=None, metavar="DIR",
                   help="write candidate doc_ids as TSV (default: "
                        "stdout)")
    return p


def run_lsh_probe(args: argparse.Namespace) -> int:
    from rgd_rnaseq_workflows_spark.operators.lsh_index import (
        probe_lsh_index)
    spark = get_spark("lsh-probe")
    with _stage("LSH probe (pruned band scan)"):
        cands = probe_lsh_index(spark, args.index, args.text) \
            .orderBy("doc_id")
        if args.out:
            write_tsv(cands, args.out, single_file=True)
        else:
            for r in cands.collect():
                print(r["doc_id"])
    return 0


def build_bm25_probe_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus probe-bm25",
        description="probe a persisted inverted index: top-k BM25 "
                    "documents for a query string. Reads the 1-row "
                    "meta plus ONLY the query terms' bucket "
                    "directories")
    p.add_argument("--index", required=True,
                   help="inverted layout written by --bm25-index")
    p.add_argument("--query", required=True,
                   help="query text (whitespace terms, the corpus "
                        "tokenizer)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", default=None, metavar="DIR",
                   help="write (doc_id, n_terms_hit, bm25) as TSV "
                        "(default: stdout)")
    return p


def run_bm25_probe(args: argparse.Namespace) -> int:
    from rgd_rnaseq_workflows_spark.operators.inverted_index import (
        bm25_index_topk)
    spark = get_spark("bm25-probe")
    with _stage(f"BM25 probe (k={args.k}, pruned posting scan)"):
        topk = bm25_index_topk(spark, args.index, args.query, k=args.k)
        if args.out:
            write_tsv(topk, args.out, single_file=True)
        else:
            for r in topk.collect():
                print(f"{r['doc_id']}\t{r['n_terms_hit']}\t{r['bm25']}")
    return 0


def build_optimize_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus optimize-index",
        description="compact a persisted index: collapse append/"
                    "streaming epoch churn into the fresh-build "
                    "layout (one sorted run per partition directory), "
                    "published atomically via tmp+rename. Probe "
                    "results are unchanged; file count drops")
    p.add_argument("--index", required=True,
                   help="index root (the --ann-index / --lsh-index / "
                        "--bm25-index path)")
    p.add_argument("--kind", required=True,
                   choices=["bm25", "ivf", "lsh", "contam"])
    return p


def run_optimize(args: argparse.Namespace) -> int:
    from rgd_rnaseq_workflows_spark.operators.index_maintenance import (
        optimize_index)
    spark = get_spark("index-optimize")
    with _stage(f"index compaction ({args.kind})"):
        stats = optimize_index(spark, args.index, args.kind)
        print(f"{stats['kind']}: {stats['files_before']} -> "
              f"{stats['files_after']} data files")
    return 0


def build_contam_probe_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus probe-contam",
        description="probe a corpus delta against a persisted "
                    "eval-fingerprint index: per contaminated doc, "
                    "hit positions + distinct benchmarks touched. "
                    "The delta is laddered at the index's frozen "
                    "window; the eval table broadcasts")
    p.add_argument("--index", required=True,
                   help="layout written by --contam-index")
    p.add_argument("--docs", required=True,
                   help="documents parquet to screen")
    p.add_argument("--out", default=None, metavar="DIR",
                   help="write the report as TSV (default: stdout)")
    return p


def run_contam_probe(args: argparse.Namespace) -> int:
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        probe_contamination_index)
    spark = get_spark("contam-probe")
    with _stage("contamination probe (delta ladder + broadcast join)"):
        rep = probe_contamination_index(
            spark, args.index, spark.read.parquet(args.docs))
        if args.out:
            write_tsv(rep, args.out, single_file=True)
        else:
            for r in rep.collect():
                print(f"{r['doc_id']}\t{r['n_hit_positions']}\t"
                      f"{r['n_bench_docs']}")
    return 0


def build_describe_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus describe-index",
        description="operational view of a persisted index: frozen "
                    "meta params, committed ledger epochs with their "
                    "additive stats, and the data-file count (the "
                    "compaction trigger signal)")
    p.add_argument("--index", required=True)
    p.add_argument("--kind", required=True,
                   choices=["bm25", "ivf", "lsh", "contam"])
    return p


def run_describe(args: argparse.Namespace) -> int:
    from rgd_rnaseq_workflows_spark.operators.index_maintenance import (
        _LAYOUTS, _count_data_files)
    spark = get_spark("index-describe")
    sub, _, _ = _LAYOUTS[args.kind]
    try:
        for r in spark.read.parquet(f"{args.index}/meta").collect():
            print("meta:", r.asDict())
    except Exception:
        print("meta: (none — this kind keeps params elsewhere)")
    led = (spark.read.parquet(f"{args.index}/ledger")
           .orderBy("_epoch").collect())
    for r in led:
        d = r.asDict()
        print(f"epoch {d.pop('_epoch')}: {d}")
    n = _count_data_files(spark, f"{args.index}/{sub}")
    print(f"{len(led)} committed epoch(s), {n} data file(s) under "
          f"{sub}/ — run optimize-index when epochs pile up")
    return 0


def build_margin_probe_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_corpus probe-margin",
        description="margin-alignment of a vector batch against a "
                    "persisted IVF lake index (--ann-index): coarse "
                    "rank by the index's centroid table, directory-"
                    "pruned scan of the probed lists, Artetxe-Schwenk "
                    "margin gate — no re-fit, no lake re-assignment")
    p.add_argument("--index", required=True,
                   help="IVF layout written by --ann-index")
    p.add_argument("--embeddings", required=True,
                   help="batch parquet (vec_id, embedding) to align")
    p.add_argument("--nprobe", type=int, default=2)
    p.add_argument("--k", type=int, default=4,
                   help="margin neighborhood size")
    p.add_argument("--min-margin-ppm", type=int, default=1_000_000)
    p.add_argument("--out", default=None, metavar="DIR",
                   help="write (id_left, id_right, cosine_sim, "
                        "margin6) as TSV (default: stdout)")
    return p


def run_margin_probe(args: argparse.Namespace) -> int:
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment_from_index)
    spark = get_spark("margin-probe")
    with _stage(f"margin probe (nprobe={args.nprobe}, k={args.k})"):
        rep = margin_alignment_from_index(
            spark, args.index, spark.read.parquet(args.embeddings),
            nprobe=args.nprobe, k=args.k,
            min_margin_ppm=args.min_margin_ppm)
        if args.out:
            write_tsv(rep, args.out, single_file=True)
        else:
            for r in rep.collect():
                print(f"{r['id_left']}\t{r['id_right']}\t"
                      f"{r['cosine_sim']}\t{r['margin6']}")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "optimize-index":
        return run_optimize(build_optimize_parser().parse_args(argv[1:]))
    if argv and argv[0] == "probe-contam":
        return run_contam_probe(
            build_contam_probe_parser().parse_args(argv[1:]))
    if argv and argv[0] == "probe-margin":
        return run_margin_probe(
            build_margin_probe_parser().parse_args(argv[1:]))
    if argv and argv[0] == "describe-index":
        return run_describe(build_describe_parser().parse_args(argv[1:]))
    if argv and argv[0] == "probe-ann":
        return run_probe(build_probe_parser().parse_args(argv[1:]))
    if argv and argv[0] == "probe-lsh":
        return run_lsh_probe(build_lsh_probe_parser().parse_args(argv[1:]))
    if argv and argv[0] == "probe-bm25":
        return run_bm25_probe(build_bm25_probe_parser().parse_args(argv[1:]))
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())

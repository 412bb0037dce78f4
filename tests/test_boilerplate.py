"""Boilerplate n-gram detection: document frequency, not term frequency."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.boilerplate import (
    boilerplate_ngrams, boilerplate_ngrams_sql, boilerplate_score)

TEMPLATE = "accept all cookies"


def _docs(spark):
    rows = [
        # srcA: template trigram in 3 of 5 docs; doc 3 repeats it
        # in ONE doc (term frequency must NOT flag it twice)
        (0, "srcA", f"{TEMPLATE} unique zero body words"),
        (1, "srcA", f"{TEMPLATE} other one content here"),
        (2, "srcA", f"{TEMPLATE} third two article text"),
        (3, "srcA", "totally fresh page about gardens"),
        (4, "srcA", "another page concerning local news"),
        # srcB: same trigram once only — per-source isolation
        (5, "srcB", f"{TEMPLATE} lonely occurrence in b"),
        (6, "srcB", "unrelated b content entirely here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_boilerplate_ngrams_flags_by_doc_frequency(spark):
    flagged = boilerplate_ngrams(_docs(spark), shingle_n=3,
                                 min_doc_bps=5000, min_docs=2)
    got = {(r.source, r.gram): (r.n_docs, r.doc_frac6)
           for r in flagged.collect()}
    assert (("srcA", TEMPLATE) in got
            and got[("srcA", TEMPLATE)] == (3, 0.6))
    # per-source: srcB's single occurrence is NOT flagged
    assert not any(s == "srcB" for s, _ in got)
    # nothing else reaches 50% of srcA's 5 docs
    assert all(g.startswith("accept all") or g.startswith("all cookies")
               or TEMPLATE in g
               for s, g in got if s == "srcA"), got


def test_boilerplate_score_per_doc(spark):
    docs = _docs(spark)
    flagged = boilerplate_ngrams(docs, shingle_n=3,
                                 min_doc_bps=5000, min_docs=2)
    scores = {r.doc_id: r for r in
              boilerplate_score(docs, flagged, shingle_n=3).collect()}
    # doc 0: 5 trigrams ("accept all cookies" ... ), flagged ones =
    # the template-derived trigrams present in >=3 docs
    assert scores[0].n_flagged >= 1
    assert scores[3].n_flagged == 0 and scores[3].boilerplate_frac == 0.0
    # srcB doc with the template text scores 0 — flags are per-source
    assert scores[5].n_flagged == 0


def test_boilerplate_sql_twin_matches(spark):
    import duckdb
    docs = _docs(spark)
    spark_rows = {(r.source, r.gram, r.n_docs, r.doc_frac6)
                  for r in boilerplate_ngrams(
                      docs, shingle_n=3, min_doc_bps=5000,
                      min_docs=2).collect()}
    con = duckdb.connect()
    con.register("documents_pd", docs.toPandas())
    con.execute("CREATE VIEW docs_t AS SELECT * FROM documents_pd")
    sql = boilerplate_ngrams_sql("docs_t", shingle_n=3,
                                 min_doc_bps=5000, min_docs=2)
    duck_rows = {tuple(r) for r in con.execute(sql).fetchall()}
    assert spark_rows == duck_rows and spark_rows

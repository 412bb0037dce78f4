"""PII redaction: span replacement, audit counts, idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.text import pii_counts, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], ["t"])
    row = df.select(redact_pii("t").alias("clean"),
                    *pii_counts("t")).collect()[0]
    return row


def test_email_url_digits(spark):
    r = _one(spark, "mail a.user+tag@sub.example.org or call 5551234567 "
                    "see https://ex.com/p?q=1 now")
    assert r["clean"] == "mail <EMAIL> or call <ID> see <URL> now"
    assert (r["n_email"], r["n_url"], r["n_id"]) == (1, 1, 1)


def test_email_digits_not_split(spark):
    # pattern order: the address's digits belong to <EMAIL>, never <ID>
    r = _one(spark, "reach user12345@host.com ok")
    assert r["clean"] == "reach <EMAIL> ok"
    assert r["n_id"] == 0


def test_short_digit_runs_kept(spark):
    r = _one(spark, "born 1999 room 42")
    assert r["clean"] == "born 1999 room 42"
    assert r["n_id"] == 0


def test_idempotent(spark):
    df = spark.createDataFrame(
        [("x 12345678 y bob@corp.io z http://a.b/c",)], ["t"])
    once = df.select(redact_pii("t").alias("c"))
    twice = once.select(redact_pii("c").alias("c"))
    assert once.collect() == twice.collect()


def test_multiple_occurrences_counted(spark):
    r = _one(spark, "a@b.co c@d.eu 111111 222222 http://x http://y")
    assert (r["n_email"], r["n_url"], r["n_id"]) == (2, 2, 2)
    assert r["clean"] == "<EMAIL> <EMAIL> <ID> <ID> <URL> <URL>"

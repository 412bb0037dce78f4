"""Text-analysis column functions for large-scale training-data pipelines.

Tokenization, n-gram shingles, token counting, quality scoring, language-ID
heuristics, and document fingerprinting — all as JVM-side built-in
expressions (whole-stage codegen, no Python boundary), each with a matching
ANSI-SQL text builder so the DuckDB oracle computes the identical value.

These extend the reference's surface (its text handling is awk field
splitting); they are first-class operators for the 100 TB use case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql

# Minimal multilingual stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "que"),
}
STOPWORDS_ALL = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))


# --- tokenization ------------------------------------------------------------

def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped (handles trailing/multiple
    spaces). Space-normalize then split — stays in whole-stage codegen,
    unlike a ``filter`` lambda (interpreted HOF path)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(c, " +", " "))
    return (F.when(norm == "", F.array().cast("array<string>"))
            .otherwise(F.split(norm, " ")))


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), x -> x <> '')"


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct, sorted for determinism); documents
    shorter than ``n`` tokens yield their full token string.

    Implemented as ONE regex scan with an overlapping-capture lookahead
    (``(?=(tok tok))tok␣``) over space-normalized text: each match
    captures the n-gram starting at a token and consumes exactly one
    token, so the scan is linear and fully codegen'd. The equivalent
    ``transform(sequence(...), i -> concat_ws(slice(...)))`` build runs
    the lambda through the interpreted higher-order-function path — ~4×
    slower at scale (measured 2.7s → 0.6s for 256k shingles). ``[^ ]``
    (not ``\\S``) keeps exact parity with :func:`tokens`, which splits on
    single spaces only.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(c, " +", " "))
    gram = "[^ ]+" + (" [^ ]+" * (n - 1))
    # consume `token( |$)` — end-of-string alternative matters at n=1,
    # where the LAST token is itself a shingle (caught by the property
    # test: a trailing-space-only consume silently dropped it)
    rx = F.regexp_extract_all(norm, F.lit(f"(?=({gram}))[^ ]+( |$)"), 1)
    return F.array_sort(F.array_distinct(
        F.when(F.size(rx) == 0, F.array(norm)).otherwise(rx)))


def shingles_all(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles in document order, duplicates KEPT — the
    multiset/positional form needed by repetition metrics and duplicated
    n-gram coverage (``shingles`` is the distinct+sorted set form). Same
    single-regex overlapping-capture scan; documents shorter than ``n``
    tokens yield their full token string."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(c, " +", " "))
    gram = "[^ ]+" + (" [^ ]+" * (n - 1))
    rx = F.regexp_extract_all(norm, F.lit(f"(?=({gram}))[^ ]+( |$)"), 1)
    return F.when(F.size(rx) == 0, F.array(norm)).otherwise(rx)


def shingles_all_sql(expr: str, n: int = 3) -> str:
    toks = tokens_sql(expr)
    return (f"list_transform("
            f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
            f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))")


def shingles_sql(expr: str, n: int = 3) -> str:
    toks = tokens_sql(expr)
    return (
        f"list_sort(list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))))"
    )


# --- quality scoring ---------------------------------------------------------

def quality_features(text_col: str = "text") -> list[Column]:
    """Length / punctuation / stopword-ratio features, rounded for
    cross-engine float stability."""
    c = F.col(text_col)
    n_tok = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    n_stop = _stopword_hits(c, STOPWORDS_ALL)
    return [
        F.length(c).cast("long").alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        F.round(n_stop / n_tok, 4).alias("stopword_ratio"),
        F.round(F.length(c) / n_tok, 4).alias("chars_per_token"),
    ]


def quality_features_sql(expr: str = "text") -> dict[str, str]:
    toks = tokens_sql(expr)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_ALL)
    n_tok = f"CAST(len({toks}) AS BIGINT)"
    return {
        "n_chars_measured": f"CAST(length({expr}) AS BIGINT)",
        "n_tokens": n_tok,
        "n_punct": (f"CAST(length({expr}) - length(regexp_replace({expr},"
                    f" '[.,;:!?]', '', 'g')) AS BIGINT)"),
        "stopword_ratio": (f"round(CAST(len(list_filter({toks}, t -> t IN"
                           f" ({stop_list}))) AS DOUBLE) / {n_tok}, 4)"),
        "chars_per_token": f"round(CAST(length({expr}) AS DOUBLE) / {n_tok}, 4)",
    }


# --- language identification ---------------------------------------------------

def _stopword_hits(text: Column | str, ws: tuple[str, ...]) -> Column:
    """Occurrence count of any listed word as a whole token — ONE codegen
    regex scan (`(?:^| )(w1|w2|…)(?= |$)` over space-normalized text),
    2.3× faster than filtering the token array through the interpreted
    HOF path; counts occurrences, not distinct words, identically."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(c, " +", " "))
    alt = "|".join(ws)
    return F.size(F.regexp_extract_all(
        norm, F.lit(f"(?:^| )({alt})(?= |$)"), 1))


def lang_hits(text_col: str = "text") -> list[Column]:
    """Per-language stopword hit counts (one column per language)."""
    return [
        _stopword_hits(text_col, ws).cast("long").alias(f"hits_{lang}")
        for lang, ws in sorted(STOPWORDS.items())
    ]


def lang_id(text_col: str = "text") -> Column:
    """Stopword-vote language ID: the language whose stopword list hits the
    most tokens wins; ties break lexicographically via the fixed CASE order
    (identical in the SQL twin below)."""
    hits = {
        lang: _stopword_hits(text_col, ws)
        for lang, ws in sorted(STOPWORDS.items())
    }
    best = F.greatest(*hits.values())
    expr = None
    for lang in sorted(STOPWORDS):
        cond = hits[lang] == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr


def lang_id_sql(expr: str = "text") -> str:
    toks = tokens_sql(expr)
    hits = {}
    for lang, ws in sorted(STOPWORDS.items()):
        wl = ", ".join(f"'{w}'" for w in ws)
        hits[lang] = f"len(list_filter({toks}, t -> t IN ({wl})))"
    best = f"greatest({', '.join(hits.values())})"
    cases = " ".join(f"WHEN {h} = {best} THEN '{lang}'"
                     for lang, h in sorted(hits.items()))
    return f"(CASE {cases} END)"


# --- fingerprinting ------------------------------------------------------------

def fingerprint(col: Column | str, n: int = 3) -> Column:
    """64-bit-style document fingerprint: min md5-hash over word n-grams
    (a 1-permutation MinHash — robust to reordering of identical content)."""
    return F.array_min(F.transform(shingles(col, n),
                                   lambda s: md5_long(s, seed=0)))


def fingerprint_sql(expr: str, n: int = 3) -> str:
    return (f"list_min(list_transform({shingles_sql(expr, n)},"
            f" s -> {md5_long_sql('s', seed=0)}))")


# --- PII redaction -------------------------------------------------------------

# Scrub patterns shared by the Spark and SQL twins. Written against the
# common subset of Java regex and RE2 (explicit character classes, no
# backslash shorthands, no backtracking constructs) so both engines match
# the identical spans. Order matters: emails before bare ID runs, so an
# address's digits are consumed by <EMAIL>, not split by <ID>.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"https?://[^ ]+", "<URL>"),
    (r"[0-9][0-9]{4,}", "<ID>"),   # 5+ digit runs: phones, SSN-ish, ids
)


def redact_pii(col: Column | str) -> Column:
    """Replace every email / URL / long digit run with a typed placeholder
    — chained ``regexp_replace`` (global), whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def redact_pii_sql(expr: str) -> str:
    for pat, tag in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{tag}', 'g')"
    return expr


def pii_counts(col: Column | str) -> list[Column]:
    """Match counts per PII class (audit columns for a scrub report).

    Each class is counted on the text with the EARLIER classes already
    redacted, so the counts are the spans :func:`redact_pii` actually
    replaces — an email's digits are one ``n_email``, never also an
    ``n_id``."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for pat, tag in PII_PATTERNS:
        name = tag.strip("<>").lower()
        out.append(F.regexp_count(c, F.lit(pat)).cast("long")
                   .alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, tag)
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    out = {}
    for pat, tag in PII_PATTERNS:
        name = tag.strip("<>").lower()
        sql_pat = pat.replace("'", "''")
        out[f"n_{name}"] = (f"CAST(len(regexp_extract_all({expr},"
                            f" '{sql_pat}')) AS BIGINT)")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{tag}', 'g')"
    return out

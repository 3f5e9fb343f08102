"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

No reference analogue (Hadoop has no scalar-function library — SURVEY §2.8);
these are the LLM-data extensions, built ONLY from JVM-side expressions so
they whole-stage-codegen and cost zero Python at 100 TB. Every function has
an exact SQL rendering for the DuckDB oracle — determinism comes from
integer counts and md5, not floats or models.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64

# Language marker n-grams for the n-gram-profile heuristic. On real corpora
# these would be learned character n-grams; the mechanism (count markers →
# argmax with deterministic tiebreak) is the real thing.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " que "],
    "fr": [" le ", " les ", " est "],
    "zh": ["的", "是", "了"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols —
# the common pre-tokenization regex shape used by BPE vocabularies.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _count_occurrences(text: Column, marker: str) -> Column:
    """Non-overlapping occurrence count via length arithmetic — exact and
    identical in any engine (no regex dialect involved)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("bigint")


def _count_occurrences_sql(expr: str, marker: str) -> str:
    esc = marker.replace("'", "''")
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{esc}', ''))) / {len(marker)} AS BIGINT)"
    )


def lang_id(text: Column) -> Column:
    """n-gram-profile language ID: count each language's marker n-grams in
    the padded lowercased text, return the argmax language (ties → lexically
    smallest language code; no markers → 'und')."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = [
        (lang, sum_cols([_count_occurrences(padded, m) for m in markers]))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = None
    best_lang = F.lit("und")
    # Fold right-to-left so earlier (lexically smaller) languages win ties.
    for lang, score in reversed(scores):
        if best is None:
            best = score
            best_lang = F.when(score > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when((score > 0) & (score >= best), F.lit(lang)).otherwise(best_lang)
            best = F.greatest(score, best)
    return best_lang


def lang_id_sql(expr: str) -> str:
    padded = f"(' ' || lower({expr}) || ' ')"
    score_sql = {
        lang: "(" + " + ".join(_count_occurrences_sql(padded, m) for m in markers) + ")"
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    langs = sorted(score_sql)
    greatest = "greatest(" + ", ".join(score_sql[lang] for lang in langs) + ")"
    cases = " ".join(
        f"WHEN {score_sql[lang]} > 0 AND {score_sql[lang]} = {greatest} THEN '{lang}'"
        for lang in langs
    )
    return f"(CASE {cases} ELSE 'und' END)"


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (size of split, empties dropped)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda w: w != "")).cast("bigint")


def ws_token_count_sql(expr: str) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex({expr}, '\\s+'), w -> w <> '')) AS BIGINT)"
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: regex pre-tokenization occurrence count."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("bigint")


def bpe_token_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{BPE_TOKEN_RE}')) AS BIGINT)"


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio. All exact integer counts composed
    with double division at the end — deterministic."""
    n_chars = F.length(text).cast("bigint")
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    n_tokens = F.size(tokens).cast("bigint")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"]", "")).cast("bigint")
    n_stop = F.size(F.filter(tokens, lambda w: w.isin(STOPWORDS))).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(
            n_tokens > 0,
            (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double"),
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")
        ).otherwise(F.lit(0.0)),
    }


def quality_features_sql(expr: str) -> dict[str, str]:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_chars = f"CAST(length({expr}) AS BIGINT)"
    tokens = f"list_filter(string_split_regex(lower({expr}), '\\s+'), w -> w <> '')"
    n_tokens = f"CAST(len({tokens}) AS BIGINT)"
    n_punct = f"CAST(length(regexp_replace({expr}, '[^.,;:!?''\"]', '', 'g')) AS BIGINT)"
    n_stop = f"CAST(len(list_filter({tokens}, w -> w IN ({stop_list}))) AS BIGINT)"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (
            f"(CASE WHEN {n_tokens} > 0 THEN CAST({n_chars} - ({n_tokens} - 1) AS DOUBLE)"
            f" / CAST({n_tokens} AS DOUBLE) ELSE 0.0 END)"
        ),
        "punct_ratio": (
            f"(CASE WHEN {n_chars} > 0 THEN CAST({n_punct} AS DOUBLE)"
            f" / CAST({n_chars} AS DOUBLE) ELSE 0.0 END)"
        ),
        "stopword_ratio": (
            f"(CASE WHEN {n_tokens} > 0 THEN CAST({n_stop} AS DOUBLE)"
            f" / CAST({n_tokens} AS DOUBLE) ELSE 0.0 END)"
        ),
    }


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5-derived 60-bit hash of the whitespace- and
    case-normalized text. Near-dup under formatting changes collapses to the
    same fingerprint; content changes do not."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return portable_hash64(normalized)


def fingerprint_sql(expr: str) -> str:
    normalized = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    return f"CAST('0x' || substr(md5({normalized}), 1, 15) AS BIGINT)"

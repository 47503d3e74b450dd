"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split / regexp / higher-order
functions) — these run inside WholeStageCodegen over the raw text
column, so a 100 TB corpus pass is scan-bound, not CPU-bound in
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import fan_out

# Tiny stopword marker sets per language for the n-gram/stopword
# language heuristic. Deliberately minimal and deterministic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "et", "de"],
    "de": ["der", "die", "und", "das"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def word_count(text: Column) -> Column:
    return F.size(F.split(text, " ")).cast("long")


def marker_hits(text: Column, markers: list[str]) -> Column:
    """Occurrences of any marker word (whitespace tokenization)."""
    words = F.split(text, " ")
    lit_markers = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(lit_markers, F.lower(w)))).cast("long")


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-marker language heuristic: score each language by
    marker-word density, argmax with a deterministic tie-break order.
    (A real n-gram model drops into the same shape: score columns +
    greatest().)"""
    t = F.col(text_col)
    scored = fan_out(df)
    for lang, markers in LANG_MARKERS.items():
        scored = scored.withColumn(f"__s_{lang}", marker_hits(t, markers))
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = deterministic tie-break
        pred = pred.when(F.col(f"__s_{lang}") == best, F.lit(lang))
    scored = scored.withColumn(out_col, pred)
    return scored.drop(*[f"__s_{lang}" for lang in LANG_MARKERS])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality features: length, word count, mean word length,
    punctuation ratio, stopword ratio, and a blended 0-1 score.
    Everything is length arithmetic — no tokenizing UDF."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    mean_word_len = (n_chars - (n_words - 1)) / n_words  # single-spaced text
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("long")
    punct_ratio = n_punct / n_chars
    stop_lit = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_lit, F.lower(w)))).cast("long")
    stop_ratio = n_stop / n_words
    # Blend: long enough, some stopwords (fluency), low punctuation noise.
    len_term = F.least(n_words.cast("double") / 50.0, F.lit(1.0))
    score = F.round(0.4 * len_term + 0.4 * F.least(stop_ratio * 5.0, F.lit(1.0)) + 0.2 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))), 6)
    return fan_out(df).select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        score.alias("q_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (alnum runs + single punctuation marks) — the pretraining
    size-accounting pass."""
    t = F.col(text_col)
    return fan_out(df).select(
        "*",
        F.size(F.split(t, r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).cast("long").alias("n_re_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 5) -> DataFrame:
    """Document fingerprint: minimum hash over word n-gram shingles
    (winnowing-lite / rolling-hash family). Equal fingerprints ⇒
    near-dup candidates; groupable at any scale."""
    from ..session import fan_out
    from .dedup import word_shingles

    sh = word_shingles(F.col(text_col), shingle_n)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return fan_out(df).select(F.col(id_col), fp.alias("fingerprint"))

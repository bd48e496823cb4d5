"""Text-analysis operators for training-data pipelines (task brief): token
counting, quality scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in ``pyspark.sql.functions`` expressions -- JVM-side,
whole-stage-codegen'd, no Python in the hot path -- and each has an exact
ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the driver's DuckDB gate
verifies values, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic stopword sets for the language-ID heuristic; scoring is a
# plain hit-count per family, argmax with fixed tie order (en,de,es,fr,zh)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "los", "que", "una", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "zai", "le", "he"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank -> 0."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("int")


# GPT-2-style pre-tokenizer pattern, restricted to constructs both Java
# regex (Spark) and RE2 (DuckDB twin) support identically: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs, and
# residual whitespace. (The original GPT-2 pattern's trailing-space
# lookahead is not RE2-expressible; counts differ from tiktoken's by the
# merge steps anyway -- this is the standard pre-tokenization proxy.)
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer segments. A proxy for
    LLM token budgets that needs no vocabulary; ~deterministic across
    engines (see BPE_SPLIT_PATTERN)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), F.lit(0))).cast(
        "int"
    )


def char_classes(col: Column) -> dict[str, Column]:
    n = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    space = F.length(F.regexp_replace(col, r"[^ \t\n]", ""))
    return {
        "n_chars": F.length(col),
        "alpha_ratio": F.round(alpha / F.greatest(n, F.lit(1.0)), 6),
        "digit_ratio": F.round(digit / F.greatest(n, F.lit(1.0)), 6),
        "punct_ratio": F.round(punct / F.greatest(n, F.lit(1.0)), 6),
        "space_ratio": F.round(space / F.greatest(n, F.lit(1.0)), 6),
    }


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are common-English stopwords."""
    stops = "the|and|of|to|a|in|is|it|that|for"
    hits = F.size(F.regexp_extract_all(F.lower(col), F.lit(rf"\b({stops})\b"), F.lit(0)))
    return F.round(hits / F.greatest(token_count(col).cast("double"), F.lit(1.0)), 6)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha share +
    stopword presence (the usual pretraining quality gates)."""
    cc = char_classes(col)
    n = F.length(col).cast("double")
    len_ok = F.when((n >= 50) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.3))
    return F.round(
        0.4 * len_ok + 0.4 * cc["alpha_ratio"] + 0.2 * F.least(stopword_ratio(col) * 5, F.lit(1.0)),
        6,
    )


def lang_scores(col: Column) -> dict[str, Column]:
    low = F.lower(col)
    return {
        lang: F.size(
            F.regexp_extract_all(low, F.lit(r"\b(" + "|".join(words) + r")\b"), F.lit(0))
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Heuristic language-ID: stopword hit-count argmax, 'und' when all 0.
    Fixed tie order = dict order of LANG_MARKERS."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # reverse order so earlier languages win ties
    for lang in reversed(list(scores)):
        s = scores[lang]
        best_lang = F.when(s >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(s, best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text --
    catches formatting-only duplicates that sha(text) misses."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)

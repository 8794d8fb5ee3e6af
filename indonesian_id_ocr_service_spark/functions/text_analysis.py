"""Text-analysis column expressions for large-scale training-data
pipelines: language ID, quality scoring, token counting, document
fingerprinting. All pure JVM expressions (regex + hashing builtins) —
no Python in the hot path, embarrassingly parallel, no shuffle.

Hashing is md5-hex based so a DuckDB oracle can reproduce every value
bit-for-bit (Spark's xxhash64/hash are engine-specific; md5 is not).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import let

__all__ = [
    "ID_STOPWORDS",
    "EN_STOPWORDS",
    "normalize_text",
    "fingerprint",
    "lang_guess",
    "quality_score",
    "token_counts",
    "word_shingles",
]

#: high-frequency Indonesian / English function words for the n-gram
#: language heuristic
ID_STOPWORDS = ["yang", "dan", "di", "ke", "dari", "untuk", "pada",
                "dengan", "ini", "itu", "adalah", "tidak"]
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "for", "on",
                "with", "as", "that", "are"]


def normalize_text(c: Column) -> Column:
    """Lowercase + whitespace-collapse + trim (dedup canonical form)."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(c: Column) -> Column:
    """Deterministic 16-hex-char document fingerprint over the
    normalized text (portable across engines via md5)."""
    return F.substring(F.md5(normalize_text(c)), 1, 16)


def _stopword_hits(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 0))


def lang_guess(c: Column) -> Column:
    """Heuristic language ID: Indonesian vs English stopword hits."""
    return let(
        _stopword_hits(c, ID_STOPWORDS),
        lambda id_n: let(
            _stopword_hits(c, EN_STOPWORDS),
            lambda en_n: (
                F.when(id_n > en_n, F.lit("id"))
                .when(en_n > id_n, F.lit("en"))
                .otherwise(F.lit("unknown"))
            ),
        ),
    )


def quality_score(c: Column) -> Column:
    """Composite text-quality score in [0,1]:
    0.35·length-score + 0.25·alpha-ratio + 0.2·(1-punct-ratio) +
    0.2·stopword-presence. Everything ASCII-regex based so the DuckDB
    oracle matches exactly."""
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z ]", ""))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    stop = _stopword_hits(c, ID_STOPWORDS + EN_STOPWORDS)
    words = F.size(F.split(F.trim(c), r"\s+"))
    return let(
        n.cast("double"),
        lambda nn: F.round(
            F.least(nn / 2000.0, F.lit(1.0)) * 0.35
            + (alpha / F.greatest(nn, F.lit(1.0))) * 0.25
            + (1.0 - F.least(punct * 10.0 / F.greatest(nn, F.lit(1.0)),
                             F.lit(1.0))) * 0.20
            + F.least(stop.cast("double")
                      / F.greatest(words.cast("double") * 0.1,
                                   F.lit(1.0)),
                      F.lit(1.0)) * 0.20,
            6,
        ),
    )


def token_counts(c: Column) -> Column:
    """struct<ws_tokens:int, approx_bpe:int> — whitespace tokens and a
    BPE-ish estimate (ceil(chars/4), the classic rule of thumb)."""
    return F.struct(
        F.size(F.split(F.trim(c), r"\s+")).alias("ws_tokens"),
        F.ceil(F.length(c) / 4.0).cast("int").alias("approx_bpe"),
    )


def word_shingles(c: Column, k: int = 3) -> Column:
    """Array of k-word shingles over the normalized text (dedup input).
    Documents shorter than k words yield a single whole-text shingle."""
    words = F.split(normalize_text(c), " ")
    return let(
        words,
        lambda w: F.when(
            F.size(w) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array(F.concat_ws(" ", F.array_join(w, " ")))),
    )

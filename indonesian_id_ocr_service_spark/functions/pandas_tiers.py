"""Arrow-batched pandas UDFs for the fuzzy tiers (SURVEY §2.5 [PUDF]).

Plan shape (SURVEY §4 item 2 — "cheap tier first"): the JVM exact tiers
(broadcast-join / keyword expressions in ``fields.py``) resolve the bulk
of rows; these UDFs run on the residue only. Each UDF is a scalar
``pandas_udf`` — one Python invocation per Arrow batch, vectorized over
the batch, never per row via Spark's row UDF machinery.

Dictionaries ship to executors inside the closure (every vocabulary here
is ≪ 100 KB). Results are memoized per executor because OCR vocabularies
repeat heavily within a corpus.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

from ..dictionaries import (
    CANONICAL_FIELDS,
    FIELD_ENUMS,
    INDONESIAN_PLACES,
    KEWARGANEGARAAN_CANONICAL,
    PEKERJAAN_CANONICAL,
    STATUS_PERKAWINAN_CANONICAL,
)
from . import fuzzy
from ..oracle import scalars as _sem  # shared scalar semantics (pure python)

__all__ = [
    "fuzzy_normalize_pekerjaan",
    "fuzzy_normalize_status",
    "fuzzy_normalize_kewarganegaraan",
    "correct_enum_udf",
    "correct_place_udf",
    "agama_extract_one_udf",
    "field_label_partial_ratio",
]

_CORRECTION_TYPE = StructType([
    StructField("corrected", StringType()),
    StructField("confidence", DoubleType()),
])


def _canonical_map_udf(canonical_map: dict[str, list[str]], threshold: int):
    """Build a batched UDF for the N25 fuzzy tier over one alias map."""

    @lru_cache(maxsize=16384)
    def one(v: str) -> str:
        return _sem.fuzzy_normalize_field(v, canonical_map, threshold)

    @F.pandas_udf(StringType())
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: one(v) if v is not None else None)

    return udf


fuzzy_normalize_pekerjaan = None
fuzzy_normalize_status = None
fuzzy_normalize_kewarganegaraan = None


def _init_udfs() -> None:
    """UDF objects are created lazily so importing this module does not
    require an active SparkSession."""
    global fuzzy_normalize_pekerjaan, fuzzy_normalize_status
    global fuzzy_normalize_kewarganegaraan
    if fuzzy_normalize_pekerjaan is None:
        fuzzy_normalize_pekerjaan = _canonical_map_udf(PEKERJAAN_CANONICAL, 72)
        fuzzy_normalize_status = _canonical_map_udf(
            STATUS_PERKAWINAN_CANONICAL, 65)
        fuzzy_normalize_kewarganegaraan = _canonical_map_udf(
            KEWARGANEGARAAN_CANONICAL, 80)


def correct_enum_udf(field_key: str):
    """N34 enum correction (all tiers) for one field — returns
    struct<corrected, confidence>; null struct fields when no tier fires
    (ocr_corrector.py:368-401)."""
    cfg = FIELD_ENUMS[field_key]

    @lru_cache(maxsize=16384)
    def one(v: str):
        r = _sem.correct_enum(field_key, v)
        return r if r else (None, None)

    @F.pandas_udf(_CORRECTION_TYPE)
    def udf(s: pd.Series) -> pd.DataFrame:
        pairs = [one(v) if v is not None else (None, None) for v in s]
        return pd.DataFrame(pairs, columns=["corrected", "confidence"])

    _ = cfg
    return udf


def correct_place_udf(min_confidence: float = 0.82):
    """N35 place-name correction (all tiers) — struct<corrected,
    confidence> (ocr_corrector.py:423-477). The exact/char-sub/J-I tiers
    are also SQL-expressible as broadcast joins; this UDF is the full
    reference chain for use after those tiers (or standalone in tests)."""

    @lru_cache(maxsize=32768)
    def one(v: str):
        return _sem.correct_place(v, min_confidence)

    @F.pandas_udf(_CORRECTION_TYPE)
    def udf(s: pd.Series) -> pd.DataFrame:
        pairs = [one(v) if v is not None else (None, 0.0) for v in s]
        return pd.DataFrame(pairs, columns=["corrected", "confidence"])

    return udf


def agama_extract_one_udf():
    """cleanup_data's Agama tier: thefuzz ``process.extractOne`` with the
    default WRatio scorer, accept > 70 (ktp_extractor.py:623-627)."""
    vocab = tuple(["ISLAM", "KRISTEN", "KATOLIK", "HINDU", "BUDDHA",
                   "KONGHUCU", "CHRISTIAN", "CATHOLIC"])

    @lru_cache(maxsize=8192)
    def one(v: str) -> str:
        choice, score = fuzzy.extract_one(v.upper(), vocab)
        return choice if (choice is not None and score > 70) else v

    @F.pandas_udf(StringType())
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: one(v) if v is not None else None)

    return udf


def field_label_partial_ratio():
    """K1/K2 key-detection score: best partial_ratio against the 16
    canonical field labels, with thefuzz's full_process applied
    (ktp_extractor.py:256-257,290-291). Returns int score 0-100."""
    labels = tuple(CANONICAL_FIELDS)

    @lru_cache(maxsize=65536)
    def one(text: str) -> int:
        _, score = fuzzy.extract_one(text, labels,
                                     scorer=fuzzy.partial_ratio)
        return int(score)

    @F.pandas_udf(IntegerType())
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: one(v) if v is not None else 0)

    return udf

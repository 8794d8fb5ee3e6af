"""Span-corpus readers (S1 in SURVEY §2.1).

The corpus replaces the reference's HTTP request stream (app.py:35-51):
documents arrive as rows of an Iceberg/parquet table with the
BASELINE.json input shape. ``read_corpus`` is the single entry point —
parquet paths today; with an Iceberg catalog configured the same call
resolves ``catalog.db.table`` identifiers, and partition pruning /
nested-schema pruning (spans.*) apply automatically (Catalyst; SURVEY
§4).

Scale notes:
- bucket the table by ``bucket(N, doc_id)`` at write time so bucket-
  grain commits (sinks.lineage) map 1:1 onto file groups;
- media payloads stay OUT of this table (media_ref indirection) so the
  text-side scan never drags image bytes through the extraction plan —
  the media stage resolves refs separately and can be salted
  independently for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus.generator import SPAN_SCHEMA_DDL


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read a span corpus from a parquet path or a catalog table name."""
    if "/" in location or location.endswith(".parquet"):
        return spark.read.parquet(location)
    return spark.read.table(location)


def read_corpus_with_schema(spark: SparkSession, location: str) -> DataFrame:
    """Schema-enforced variant (fails fast on drift)."""
    return spark.read.schema(SPAN_SCHEMA_DDL).parquet(location)


def media_payloads(df: DataFrame) -> DataFrame:
    """(doc_id, media_ref) pairs — the media-stage work list. Salting
    hook for skew: heavy docs fan out by (doc_id, ref) rather than
    doc_id, so one 100-image document becomes 100 independent tasks."""
    return df.select(
        "doc_id",
        F.explode(
            F.transform(
                F.filter(F.col("spans"),
                         lambda s: s["kind"] == F.lit("media")),
                lambda s: s["media_ref"],
            )
        ).alias("media_ref"),
    )

"""Skew handling: salted repartitioning for media-heavy documents
(the north star's "salted repartitioning for skewed media-heavy
documents").

The extraction pipeline partitions by doc_id hash. A document with
hundreds of media spans makes its partition a straggler in the
compute-bound media stage: task time follows the max partition WEIGHT
(total media payload), not row count. ``salted_explode_media`` splits
each document's media refs into weight-bounded chunks and spreads the
chunks uniformly by (doc_id, salt) hash; the per-chunk results
reduce back to one row per document. AQE's skew-join splitter does not
cover this case — the skew is inside a mapInPandas stage, not a join —
so the salt must be explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salt_column", "salted_explode_media", "media_counts_salted"]


def salt_column(key: Column, weight: Column, unit: Column | int,
                n_max: int = 64) -> Column:
    """Deterministic salt 0..min(ceil(weight/unit), n_max)-1 derived
    from the key hash — heavy keys fan out over more salts, light keys
    keep salt 0 (no shuffle blow-up for the long tail)."""
    n = F.least(F.greatest(F.ceil(weight / unit), F.lit(1)),
                F.lit(n_max))
    return F.pmod(F.xxhash64(key), n).cast("int")


def salted_explode_media(docs: DataFrame, spans_col: str = "spans",
                         chunk: int = 8) -> DataFrame:
    """One row per (doc_id, salt) chunk of ≤``chunk`` media refs:
    heavy documents split into many chunks, each landing on its own
    partition by the (doc_id, salt) shuffle key; text-only documents
    pass through as a single empty chunk (salt 0)."""
    media = F.filter(F.col(spans_col), lambda s: s["kind"] == "media")
    refs = F.transform(media, lambda s: s["media_ref"])
    n_chunks = F.greatest(
        F.ceil(F.size(refs) / F.lit(chunk)), F.lit(1)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(refs, i * chunk + 1, chunk),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks)
                    .alias("salt", "media_refs"))
        .repartition(F.col("doc_id"), F.col("salt"))
    )


def media_counts_salted(docs: DataFrame, chunk: int = 8) -> DataFrame:
    """Demo reduction over the salted explode: per-document media
    count + total ref length computed on chunk rows, then reduced to
    one row per doc — result is independent of the salting."""
    chunks = salted_explode_media(docs, chunk=chunk)
    per_chunk = chunks.select(
        "doc_id",
        F.size("media_refs").alias("n"),
        F.aggregate(F.col("media_refs"), F.lit(0),
                    lambda acc, r: acc + F.length(r)).alias("ref_len"),
    )
    return (
        per_chunk.groupBy("doc_id")
        .agg(F.sum("n").cast("int").alias("n_media"),
             F.sum("ref_len").cast("int").alias("ref_len_total"))
    )

"""C6: two-pass field-wise coalesce merge (SURVEY §2.3).

The reference's adaptive SIM re-processing (document_processor.py:
221-236, 401-440) runs a second, more aggressive pass only for
documents that fail a quality gate, then merges field-wise: the primary
pass wins, the fallback fills its nulls.

In Spark this is two pipeline branches over the SAME classified frame —
the second branch filtered to gate failures (cheap: the gate prunes
most rows) — joined back on doc_id with per-column coalesce. The join
side is the small filtered branch, so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["coalesce_merge", "gated_second_pass"]


def coalesce_merge(primary: DataFrame, fallback: DataFrame,
                   key: str, fields: list[str]) -> DataFrame:
    """Field-wise merge: primary's non-null values win
    (document_processor.py:221-236 semantics)."""
    fb = F.broadcast(
        fallback.select(key, *[F.col(f).alias(f"_fb_{f}")
                               for f in fields]))
    out = primary.join(fb, on=key, how="left")
    return out.select(
        key,
        *[
            F.coalesce(F.col(f), F.col(f"_fb_{f}")).alias(f)
            for f in fields
        ],
    )


def gated_second_pass(df: DataFrame, gate, second_pass_fn,
                      key: str, fields: list[str]) -> DataFrame:
    """Run ``second_pass_fn`` only on rows failing ``gate`` (a boolean
    Column), merge results field-wise. Rows passing the gate stream
    through untouched (C3/C6 conditional-recompute shape)."""
    passed = df.filter(gate)
    failed = df.filter(~gate)
    if failed.isEmpty():
        return df.select(key, *fields)
    second = second_pass_fn(failed)
    merged = coalesce_merge(failed.select(key, *fields),
                            second, key, fields)
    return passed.select(key, *fields).unionByName(merged)

"""Salted repartitioning for media-heavy documents (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indonesian_id_ocr_service_spark.operators import skew


def _mk_docs(spark, heavy_refs=200, n_light=60):
    rows = []
    # one pathological media-heavy doc + a tail of light docs
    heavy = [("media", "", f"img://h/{k}", k) for k in range(heavy_refs)]
    rows.append(("heavy", [("text", "x", "", heavy_refs)] + heavy))
    for d in range(n_light):
        rows.append((f"light{d}",
                     [("text", "hello world", "", 0),
                      ("media", "", f"img://l{d}", 1)]))
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>")


def test_salted_explode_splits_heavy_docs(spark):
    docs = _mk_docs(spark)
    chunks = skew.salted_explode_media(docs, chunk=8).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    # heavy doc fans out into ceil(200/8)=25 chunks with distinct salts
    heavy = by_doc["heavy"]
    assert len(heavy) == 25
    assert sorted(r.salt for r in heavy) == list(range(25))
    assert all(len(r.media_refs) <= 8 for r in heavy)
    got = [ref for r in sorted(heavy, key=lambda r: r.salt)
           for ref in r.media_refs]
    assert got == [f"img://h/{k}" for k in range(200)]  # order kept
    # light docs stay single-chunk (no fan-out for the tail)
    assert all(len(by_doc[f"light{d}"]) == 1 for d in range(60))


def test_salted_reduction_is_salt_invariant(spark):
    docs = _mk_docs(spark)
    for chunk in (4, 8, 64):
        out = {r.doc_id: (r.n_media, r.ref_len_total)
               for r in skew.media_counts_salted(docs, chunk=chunk)
               .collect()}
        assert out["heavy"][0] == 200
        assert all(out[f"light{d}"][0] == 1 for d in range(60))
        if chunk == 4:
            base = out
    assert base == out


def test_salting_balances_partition_weight(spark):
    """The point of the salt: the max per-partition media weight drops
    from 'all of the heavy doc' to ~chunk size."""
    # AQE's small-partition coalescing merges this tiny test shuffle
    # back into one partition, hiding the balance we're measuring
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                   "false")
    docs = _mk_docs(spark, heavy_refs=240, n_light=40)
    unsalted = docs.select(
        "doc_id",
        F.size(F.filter(F.col("spans"),
                        lambda s: s["kind"] == "media")).alias("w"),
    ).repartition(8, F.col("doc_id"))
    chunks = skew.salted_explode_media(docs, chunk=8)
    salted = chunks.select("doc_id",
                           F.size("media_refs").alias("w")) \
        .repartition(8, F.col("doc_id"), F.col("salt"))

    def max_partition_weight(df):
        pw = (df.withColumn("p", F.spark_partition_id())
              .groupBy("p").agg(F.sum("w").alias("pw")).collect())
        return max(r.pw for r in pw)

    try:
        assert max_partition_weight(unsalted) >= 240
        assert max_partition_weight(salted) <= 120  # ≥2x better
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true")

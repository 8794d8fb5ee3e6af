"""Structured Streaming parity: the streaming pipeline over a corpus
directory produces exactly the batch pipeline's spans."""

from __future__ import annotations

from indonesian_id_ocr_service_spark.corpus.generator import doc_rows
from indonesian_id_ocr_service_spark.pipeline import run_pipeline
from indonesian_id_ocr_service_spark.streaming.pipeline import (
    start_extraction_stream,
)

from indonesian_id_ocr_service_spark.corpus.generator import (
    SPAN_SCHEMA_DDL as SCHEMA,
)


def test_stream_batch_parity(spark, tmp_path):
    rows = list(doc_rows(40, fractions=(0.7, 0.2, 0.1)))
    df = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extraction_stream(spark, src, out, ckpt)
    q.awaitTermination(600)

    batch = {
        r["doc_id"]: [tuple(s) for s in
                      sorted(r["out_spans"], key=lambda s: s["order"])]
        for r in run_pipeline(spark.read.parquet(src)).collect()
    }
    streamed = {
        r["doc_id"]: [tuple(s) for s in
                      sorted(r["out_spans"], key=lambda s: s["order"])]
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch

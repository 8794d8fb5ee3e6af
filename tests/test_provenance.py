"""Per-field extraction provenance (the reference's trace_info method
labels, ktp_extractor.py:344-347 / debug_ktp.py:127-133) must flow from
the spatial extractor into the metrics table."""

from __future__ import annotations

from indonesian_id_ocr_service_spark.corpus.generator import (
    SPAN_SCHEMA_DDL,
    doc_rows,
)
from indonesian_id_ocr_service_spark.pipeline import run_pipeline_fields
from indonesian_id_ocr_service_spark.sinks.lineage import (
    extraction_metrics,
)

_KNOWN_METHODS = {
    "header_strip", "inline_extraction", "geometric_match",
    "geometric_match_multiline", "geometric_below_fallback",
    "typo_recovery", "regex_kawin_recovery", "value_keyword_recovery",
    "regex_date_place_recovery", "positional_inference_name",
    "regex_recovery_16_digits",
}


def _golden_df(spark):
    lines = [
        "PROVINSI DKI JAKARTA",           # K3 header_strip
        "KARTU TANDA PENDUDUK",
        "NIK : 3171014502900001",         # K4 inline_extraction
        "Nama",                           # key …
        "SITI AMINAH",                    # … value on the same line (K5)
        "Kewarganegaraan : WNI",
    ]
    ys = [10, 40, 70, 100, 100, 130]
    spans = [{"kind": "text", "text": t, "media_ref": "", "offset": i}
             for i, t in enumerate(lines)]
    geom = [{"y": y, "x0": 30 if t != "SITI AMINAH" else 200,
             "x1": (30 if t != "SITI AMINAH" else 200) + 9 * len(t),
             "h": 22}
            for t, y in zip(lines, ys)]
    return spark.createDataFrame(
        [("g-1", spans, geom, [0.9] * len(spans), [], [])],
        SPAN_SCHEMA_DDL)


def test_methods_on_golden_doc(spark):
    fields = run_pipeline_fields(_golden_df(spark))
    m = extraction_metrics(fields).collect()[0]
    fm = dict(m["field_methods"])
    assert fm["PROVINSI"] == "header_strip"
    assert fm["NIK"] == "inline_extraction"
    assert fm["Nama"] == "geometric_match"


def test_methods_vocabulary_on_corpus(spark):
    rows = list(doc_rows(80, fractions=(1.0, 0, 0)))
    df = spark.createDataFrame(rows, SPAN_SCHEMA_DDL)
    fields = run_pipeline_fields(df)
    mets = extraction_metrics(fields).collect()
    assert len(mets) == 80
    seen = set()
    for r in mets:
        fm = dict(r["field_methods"] or {})
        assert fm, f"{r['doc_id']} carries no provenance"
        seen |= set(fm.values())
        assert set(fm.values()) <= _KNOWN_METHODS
    # the generator's noise mix should exercise several tiers
    assert len(seen) >= 3, seen

"""Property tests (SURVEY §5): partitioning determinism and
noise-repair round-trips."""

from __future__ import annotations

import random

from indonesian_id_ocr_service_spark.corpus.generator import (
    SPAN_SCHEMA_DDL as SCHEMA,
    doc_rows,
)
from indonesian_id_ocr_service_spark.oracle import scalars as S
from indonesian_id_ocr_service_spark.pipeline import run_pipeline


def test_output_invariant_under_partitioning(spark):
    """Same corpus, radically different partitioning → identical span
    outputs (candidate ranking and greedy claiming are per-document, so
    no ordering leak is possible; this asserts it)."""
    rows = list(doc_rows(80, fractions=(0.7, 0.2, 0.1)))
    df = spark.createDataFrame(rows, SCHEMA)

    def run(parts):
        out = run_pipeline(df.repartition(parts))
        return {
            r["doc_id"]: [tuple(s) for s in
                          sorted(r["out_spans"],
                                 key=lambda s: s["order"])]
            for r in out.collect()
        }

    assert run(1) == run(13)


def test_nik_noise_roundtrip():
    """In-distribution OCR noise (reverse char-substitution) on a
    structurally-valid NIK must repair back to the original through the
    candidate engine."""
    from indonesian_id_ocr_service_spark.dictionaries import TO_DIGIT

    inverse: dict[str, list[str]] = {}
    for letter, digit in TO_DIGIT.items():
        inverse.setdefault(digit, []).append(letter)
    rng = random.Random(99)
    ok = 0
    total = 200
    for _ in range(total):
        prov = rng.choice([11, 31, 32, 33, 35, 51, 73])
        nik = (f"{prov:02d}{rng.randint(1, 99):02d}"
               f"{rng.randint(1, 99):02d}{rng.randint(1, 28):02d}"
               f"{rng.randint(1, 12):02d}{rng.randint(0, 99):02d}"
               f"{rng.randint(1, 9999):04d}")
        noisy = list(nik)
        for i in rng.sample(range(16), rng.randint(1, 3)):
            noisy[i] = rng.choice(inverse[noisy[i]])
        cand = S.nik_best_candidate("".join(noisy))
        if cand and cand["value"] == nik:
            ok += 1
    # char-sub noise is exactly what the engine's tier 2 inverts
    assert ok == total, f"only {ok}/{total} repaired"


def test_date_noise_roundtrip():
    """Separator corruption + char-sub noise on valid dates must
    normalize back to the canonical DD-MM-YYYY."""
    rng = random.Random(5)
    sub_inv = {"0": "O", "1": "I", "5": "S", "8": "B"}
    ok = 0
    total = 200
    for _ in range(total):
        d, m, y = rng.randint(1, 28), rng.randint(1, 12), \
            rng.randint(1930, 2005)
        canonical = f"{d:02d}-{m:02d}-{y:04d}"
        roll = rng.random()
        if roll < 0.4:
            noisy = canonical.replace("-", " ")
        elif roll < 0.7:
            chars = list(canonical)
            idxs = [i for i, c in enumerate(chars) if c in sub_inv]
            for i in rng.sample(idxs, min(2, len(idxs))):
                chars[i] = sub_inv[chars[i]]
            noisy = "".join(chars)
        else:
            noisy = canonical.replace("-", ".")
        assert S.normalize_date_robust(noisy) == canonical, (
            noisy, canonical)
        ok += 1
    assert ok == total


def test_simhash_kernel_matches_jvm_expression(spark):
    """The Arrow-kernel SimHash and the JVM aggregate-over-zip_with
    expression produce identical bit strings (same md5 nibble votes)."""
    from pyspark.sql import functions as F

    from indonesian_id_ocr_service_spark.operators import dedup as DD

    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    jvm = df.select("doc_id", DD.simhash32(F.col("text")).alias("simhash"))
    ker = DD.simhash32_kernel(df, "doc_id", "text")
    a = {r["doc_id"]: r["simhash"] for r in jvm.collect()}
    b = {r["doc_id"]: r["simhash"] for r in ker.collect()}
    assert a == b and len(a) > 0


def test_minhash_band_rows_match_jvm_expression(spark):
    """The Arrow-kernel band rows equal the JVM expression's signature
    banding (same md5-min hashes, same band keys)."""
    from pyspark.sql import functions as F

    from indonesian_id_ocr_service_spark.functions.core import let
    from indonesian_id_ocr_service_spark.operators import dedup as DD

    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    sig = DD.minhash_signature(F.col("text"), 12)
    jvm = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(let(sig, lambda s: F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[
                    F.element_at(s, b * 2 + r + 1) for r in range(2)
                ]).alias("key"))
            for b in range(6)
        ]))).alias("bk"),
    ).select("doc", "bk.band", "bk.key")
    ker = DD.minhash_band_rows(df, "doc_id", "text")
    a = sorted(map(tuple, jvm.collect()))
    b = sorted(map(tuple, ker.collect()))
    assert a == b and len(a) > 0

"""End-to-end extraction pipeline: span corpus → extracted span table.

Plan shape (SURVEY §7):

    scan (doc_id, spans[, span_geom])
      → C1 classify (JVM expression over the packed array)
      → KTP rows:  mapInPandas spatial extraction (zero shuffle — the
                   input is already one row per document)
                   → JVM cleanup/repair/cross-validate/format
                   → span assembly
      → SIM rows:  SIM extraction path (operators.sim_extract)
      → UNKNOWN:   error span + media pass-through
      → unionByName

The only Python stages are the per-document geometric extractors and the
narrow fuzzy residue tiers; everything else is whole-stage-codegen JVM.
No joins, no aggregations — the pipeline is embarrassingly parallel over
documents, so throughput scales linearly with cores (the scaling-
efficiency criterion in BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import classify, ktp_post
from .operators.ktp_spatial import KTP_EXTRACT_SCHEMA, extract_ktp_batch

OUT_SCHEMA = ktp_post.OUT_SPAN_TYPE


def with_default_geometry(df: DataFrame) -> DataFrame:
    """Synthesize line geometry from span order when the corpus carries
    none: each text span is its own line (y = offset·30), x from 0.
    Keeps the spatial operators well-defined on geometry-free corpora."""
    if "span_geom" in df.columns:
        return df
    geom = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            (s["offset"] * 30).cast("int").alias("y"),
            F.lit(0).cast("int").alias("x0"),
            (F.length(F.coalesce(s["text"], F.lit(""))) * 9)
            .cast("int").alias("x1"),
            F.lit(22).cast("int").alias("h"),
        ),
    )
    return df.withColumn("span_geom", geom)


def _kernel_input(src: DataFrame) -> DataFrame:
    """Project the extraction kernel's input: the span-contract columns
    plus, when the corpus carries them, the alternative OCR view (C3
    UNKNOWN retry / C6 SmartSIM pass) and per-span confidences (C2).

    The alternative view is shipped LAZILY: only C3 (UNKNOWN retry) and
    C6 (SIM std↔smart second pass) ever consume it, so the JVM
    classifier (oracle-checked identical to the kernel's Python
    classifier) nulls ``spans_alt``/``alt_geom`` for the KTP majority
    before the Arrow transfer. This is the reference's lazy-recompute
    shape (SURVEY §4) expressed as a conditional projection — it keeps
    the pipeline a single zero-shuffle narrow chain, where the
    flag + filtered-second-pass alternative would add a join (shuffle)
    and re-execute the main kernel once per union branch (no AQE
    exchange reuse; see BENCH.md)."""
    cols = [F.col("doc_id"), F.col("spans"), F.col("span_geom")]
    if "spans_alt" in src.columns and "alt_geom" in src.columns:
        need_alt = classify.document_type(F.col("spans")) != F.lit("KTP")
        cols += [
            F.when(need_alt, F.col("spans_alt")).alias("spans_alt"),
            F.when(need_alt, F.col("alt_geom")).alias("alt_geom"),
        ]
    if "span_conf" in src.columns:
        cols.append(F.col("span_conf"))
    return src.select(*cols)


def classify_documents(df: DataFrame) -> DataFrame:
    return df.withColumn("doc_type",
                         classify.document_type(F.col("spans")))


def media_refs_col() -> F.Column:
    return F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media")),
        lambda s: s["media_ref"],
    )


def run_ktp_branch(ktp: DataFrame) -> DataFrame:
    """KTP rows → (doc_id, out_spans, flat output fields)."""
    extracted = ktp.select("doc_id", "spans", "span_geom").mapInPandas(
        extract_ktp_batch, schema=KTP_EXTRACT_SCHEMA
    )
    pt = ("field_methods",)   # per-field provenance for the lineage sink
    cleaned = ktp_post.apply_cleanup(extracted, passthrough=pt)
    repaired = ktp_post.apply_repair(cleaned)
    validated = ktp_post.apply_crossval(repaired)
    formatted = ktp_post.apply_format(validated, passthrough=pt)
    return ktp_post.assemble_spans(formatted)


def run_unknown_branch(unk: DataFrame) -> DataFrame:
    """UNKNOWN rows → single error span + media pass-through."""
    error_span = F.struct(
        F.lit("error").alias("kind"),
        F.lit("Unknown document type").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("order"),
    )
    out = F.concat(
        F.array(error_span),
        F.transform(
            media_refs_col(),
            lambda m, i: F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                m.alias("media_ref"),
                (i + 1).cast("int").alias("order"),
            ),
        ),
    )
    return unk.select(
        "doc_id", out.cast(ktp_post.OUT_SPAN_TYPE).alias("out_spans")
    )


def run_pipeline(df: DataFrame, include_sim: bool = True,
                 mode: str = "kernel") -> DataFrame:
    """Full pipeline → (doc_id, out_spans). ONE linear narrow chain — no
    unions, no shuffles (with three filtered branches the source scan +
    exchange + classification executed once PER BRANCH; see BENCH.md).

    Two interchangeable configurations, identical outputs:

    - ``mode='kernel'`` (scale default): the complete per-document
      grammar runs inside a single Arrow batch stage (~1-2 core-ms/doc).
      Spark's higher-order functions recompute ``dataType`` recursively
      on every evaluation, so normalizer-chain-sized expression trees
      cost ~85 core-ms/doc interpreted — measured, not guessed.
    - ``mode='jvm'`` (verification): unified extraction UDF + the JVM
      column-expression normalize chain (cleanup/repair/crossval/format)
      with column-level doc-type gating. Independently implemented and
      used by the span-equality gate; every operator in it is also
      DuckDB-oracle-checked via __spark_entry__.
    """
    from .queries import ensure_session_conf

    ensure_session_conf(df.sparkSession)
    _ = include_sim  # both modes route SIM through the unified pass
    if mode == "kernel":
        return _run_pipeline_kernel(df)
    return _run_pipeline_jvm(df)


def _run_pipeline_kernel(df: DataFrame) -> DataFrame:
    from .operators.unified_extract import (
        FULL_KERNEL_SCHEMA,
        full_kernel_batch_arrow,
    )

    src = with_default_geometry(df)
    # mapInArrow, not mapInPandas: Arrow→pandas conversion of the
    # array<struct> span columns builds a dict per span (~3.4
    # core-ms/doc, allocation-bound → also caps multi-core scaling);
    # the arrow kernel reads flattened child arrays + offsets directly
    wide = _kernel_input(src).mapInArrow(
        full_kernel_batch_arrow, schema=FULL_KERNEL_SCHEMA
    )
    is_ktp = F.col("doc_type") == "KTP"
    is_sim = F.col("doc_type") == "SIM"
    coalesced = wide.withColumn(
        "document_type", F.when(is_ktp | is_sim, F.col("doc_type"))
    )
    assembled = ktp_post.assemble_spans(coalesced)
    return assembled.select(
        "doc_id",
        F.when(is_ktp | is_sim, F.col("out_spans"))
        .otherwise(_error_spans())
        .alias("out_spans"),
    )


def _error_spans() -> F.Column:
    return F.concat(
        F.array(
            F.struct(
                F.lit("error").alias("kind"),
                F.lit("Unknown document type").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("order"),
            )
        ),
        F.transform(
            F.coalesce(F.col("media_refs"),
                       F.array().cast("array<string>")),
            lambda m, i: F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                m.alias("media_ref"),
                (i + 1).cast("int").alias("order"),
            ),
        ),
    ).cast(ktp_post.OUT_SPAN_TYPE)


def _run_pipeline_jvm(df: DataFrame) -> DataFrame:
    from .operators.unified_extract import (
        _SIM_COLS,
        UNIFIED_SCHEMA,
        unified_extract_batch,
    )

    src = with_default_geometry(df)
    wide = _kernel_input(src).mapInPandas(
        unified_extract_batch, schema=UNIFIED_SCHEMA
    )
    pt = ("doc_type", *_SIM_COLS)
    cleaned = ktp_post.apply_cleanup(wide, passthrough=pt)
    repaired = ktp_post.apply_repair(cleaned)
    validated = ktp_post.apply_crossval(repaired)
    formatted = ktp_post.apply_format(validated, passthrough=pt)

    is_ktp = F.col("doc_type") == "KTP"
    is_sim = F.col("doc_type") == "SIM"
    coalesced = formatted.withColumns({
        **{
            col: F.when(is_ktp, F.col(col)).when(
                is_sim, F.col("sim_" + col))
            for name, col in ktp_post._OUT_COLS.items()
            if name != "document_type"
        },
        "document_type": F.when(is_ktp | is_sim, F.col("doc_type")),
    })
    assembled = ktp_post.assemble_spans(coalesced)

    error_spans = F.concat(
        F.array(
            F.struct(
                F.lit("error").alias("kind"),
                F.lit("Unknown document type").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("order"),
            )
        ),
        F.transform(
            F.coalesce(F.col("media_refs"),
                       F.array().cast("array<string>")),
            lambda m, i: F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                m.alias("media_ref"),
                (i + 1).cast("int").alias("order"),
            ),
        ),
    ).cast(ktp_post.OUT_SPAN_TYPE)

    return assembled.select(
        "doc_id",
        F.when(is_ktp | is_sim, F.col("out_spans"))
        .otherwise(error_spans)
        .alias("out_spans"),
    )


def run_pipeline_fields(df: DataFrame) -> DataFrame:
    """KTP branch only, returning the flat output-field columns (for the
    metrics table and SQL-checkable queries)."""
    src = classify_documents(with_default_geometry(df))
    return run_ktp_branch(src.filter(F.col("doc_type") == "KTP"))

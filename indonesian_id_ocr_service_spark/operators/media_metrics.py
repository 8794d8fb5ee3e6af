"""Media-metrics branch for `ExtractionRun`: the north star's salted
repartitioning made load-bearing.

``media_quality_metrics`` is a ``metrics_fn`` for
``ExtractionRun.process`` (sinks/lineage.py): from the freshly
committed extraction OUTPUT it follows the pass-through media spans,
decodes each payload, computes the P1-P3 quality flags, and reduces to
one metrics row per document. The decode stage is the compute-heavy,
skew-prone part — a doc with hundreds of media spans would otherwise
pin one partition — so its input is ``salted_explode_media``
(operators/skew.py): weight-bounded (doc_id, salt) chunks spread
uniformly, per-chunk partials reduced salt-invariantly.

Plan shape (asserted in tests/test_skew.py):
- Exchange 1: the explicit (doc_id, salt) salt repartition feeding the
  decode stage — ids + refs only, no payloads shuffle.
- Exchange 2: the per-doc reduce — after a map-side partial aggregate,
  so only ≤(salts/doc) tiny partial rows per document move.

Payload resolution: media refs are URIs into a blob store the sandbox
does not have; ``payload_fn`` injects the real fetch+bytes. The
default resolver synthesizes a deterministic IMG1 card from the ref
hash (the engine-owned fixture family, FIXTURES.md) so the full
branch — salt, decode, flags, reduce, metrics write — runs for real
end-to-end here.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import salted_explode_media

__all__ = ["media_quality_metrics", "default_payload_fn"]

_CHUNK_SCHEMA = ("doc_id string, n_media int, n_decoded int, "
                 "n_blurry int, n_dark int, blur_sum double")


def default_payload_fn(ref: str) -> bytes:
    """Deterministic stand-in for the blob-store fetch: an IMG1 card
    whose background derives from the ref hash (same regime spread as
    the media_quality fixture family)."""
    from . import image_ops as I

    h = int(hashlib.md5(ref.encode()).hexdigest()[:6], 16)
    m = h % 8
    if m <= 1:
        img = I.synth_card(bg=35 + h % 16, n_stripes=0)       # dark
    elif m <= 4:
        img = I.synth_card(bg=115 + h % 11, n_stripes=8, blur_k=7)
    else:
        img = I.synth_card(bg=115 + h % 11, n_stripes=8)
    return I.encode_img1(img)


def _chunk_batches(payload_fn):
    def gen(batches):
        import pandas as pd

        from . import image_ops as I

        for pdf in batches:
            rows = []
            for doc_id, refs in zip(pdf["doc_id"], pdf["media_refs"]):
                n = len(refs)
                n_dec = n_blur = n_dark = 0
                blur_sum = 0.0
                for ref in refs:
                    img = I.decode_any(payload_fn(ref))
                    if img is None:
                        continue
                    n_dec += 1
                    lap = I.laplacian_variance(img)
                    mean, std = I.brightness_contrast(img)
                    fl = I.quality_flags(lap, mean, std)
                    n_blur += int(fl["is_blurry"])
                    n_dark += int(fl["is_dark"])
                    blur_sum += float(lap)
                rows.append((doc_id, n, n_dec, n_blur, n_dark, blur_sum))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_media", "n_decoded", "n_blurry", "n_dark",
                "blur_sum"])

    return gen


def media_quality_metrics(out: DataFrame, payload_fn=None,
                          spans_col: str = "out_spans",
                          chunk: int = 8) -> DataFrame:
    """Extraction output → one media-quality metrics row per document
    that carries media. Salt-invariant by construction: every chunk
    contributes additive partials."""
    fn = payload_fn or default_payload_fn
    chunks = salted_explode_media(out, spans_col=spans_col, chunk=chunk)
    per_chunk = chunks.mapInPandas(_chunk_batches(fn),
                                   schema=_CHUNK_SCHEMA)
    return (
        per_chunk.filter(F.col("n_media") > 0)
        .groupBy("doc_id")
        .agg(
            F.sum("n_media").cast("int").alias("n_media"),
            F.sum("n_decoded").cast("int").alias("n_decoded"),
            F.sum("n_blurry").cast("int").alias("n_blurry"),
            F.sum("n_dark").cast("int").alias("n_dark"),
            F.round(F.sum("blur_sum"), 4).alias("blur_sum"),
        )
    )

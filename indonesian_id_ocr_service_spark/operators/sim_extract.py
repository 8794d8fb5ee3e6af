"""SIM branch: per-document extraction via mapInPandas (SURVEY §2.6).

Zero-shuffle like the KTP branch — the corpus is one row per document,
so the row-clustering / section state machines (M1, M8, M9, M12) run
per row inside an Arrow batch. JVM handles routing (C4 version
detection happens inside the kernel) and output span assembly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dictionaries import OUTPUT_FIELD_ORDER
from . import ktp_post, sim_core

_SIM_COLS = [f.replace(".", "_") for f in OUTPUT_FIELD_ORDER]

SIM_EXTRACT_SCHEMA = (
    "doc_id string, media_refs array<string>, "
    + ", ".join(f"{c} string" for c in _SIM_COLS)
)


def extract_sim_batch(batches):
    for pdf in batches:
        rows = []
        for doc_id, spans, geom in zip(pdf["doc_id"], pdf["spans"],
                                       pdf["span_geom"]):
            texts, items, media = [], [], []
            for sp, g in zip(spans, geom):
                if sp["kind"] == "text":
                    texts.append(sp["text"])
                    items.append({
                        "text": sp["text"],
                        "x0": g["x0"],
                        "h": g["h"],
                        "y_center": (2 * g["y"] + g["h"]) / 2,
                    })
                elif sp["kind"] == "media":
                    media.append(sp["media_ref"])
            result = sim_core.process_sim_doc(texts, items)
            rows.append([doc_id, media]
                        + [result.get(f) for f in OUTPUT_FIELD_ORDER])
        yield pd.DataFrame(rows, columns=["doc_id", "media_refs"]
                           + _SIM_COLS)


def run_sim_branch(sim: DataFrame) -> DataFrame:
    """SIM rows → (doc_id, out_spans, flat fields)."""
    extracted = sim.select("doc_id", "spans", "span_geom").mapInPandas(
        extract_sim_batch, schema=SIM_EXTRACT_SCHEMA
    )
    # _SIM_COLS already match the span-assembly contract's column names
    # (OUTPUT_FIELD_ORDER with '.' → '_').
    return ktp_post.assemble_spans(extracted)

"""Custom stateful streaming operator (applyInPandasWithState):
span-session assembly.

The batch corpus packs each document's spans into one row; in a live
ingest the OCR service emits spans one at a time, out of order, across
micro-batches (the reference's request loop, app.py:35-51, seen as an
event stream). This operator keeps per-``doc_id`` state — the spans
seen so far — and emits one assembled document row when the document
goes quiet: no new spans before the event-time watermark passes its
last span's time + ``gap``.

State is bounded: one in-flight buffer per open document, dropped on
emission (GroupState.remove); the watermark bounds how long a document
can stay open, so state size is O(open documents within the gap
horizon) regardless of total stream length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

SPAN_EVENT_DDL = ("doc_id string, kind string, text string, "
                  "media_ref string, offset int, event_time timestamp")

ASSEMBLED_DDL = ("doc_id string, n_spans int, n_text int, n_media int, "
                 "joined_text string")

_STATE_DDL = ("kinds array<string>, texts array<string>, "
              "media array<string>, offsets array<int>, "
              "last_ms long")


def _assemble(key: str, kinds, texts, media, offsets) -> pd.DataFrame:
    order = sorted(range(len(offsets)), key=lambda i: offsets[i])
    joined = " ".join(
        texts[i] for i in order if kinds[i] == "text" and texts[i])
    n_text = sum(1 for k in kinds if k == "text")
    n_media = sum(1 for k in kinds if k == "media")
    return pd.DataFrame([{
        "doc_id": key,
        "n_spans": len(kinds),
        "n_text": n_text,
        "n_media": n_media,
        "joined_text": joined,
    }])


def _session_fn(gap_ms: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            kinds, texts, media, offsets, _last = state.get
            state.remove()
            yield _assemble(key[0], list(kinds), list(texts),
                            list(media), list(offsets))
            return
        kinds: list = []
        texts: list = []
        media: list = []
        offsets: list = []
        last_ms = 0
        if state.exists:
            k0, t0, m0, o0, last_ms = state.get
            kinds, texts, media, offsets = (list(k0), list(t0),
                                            list(m0), list(o0))
        for pdf in pdfs:
            # columnar appends — no per-row loop in the hot path
            kinds.extend(pdf["kind"].tolist())
            texts.extend(pdf["text"].fillna("").tolist())
            media.extend(pdf["media_ref"].fillna("").tolist())
            offsets.extend(pdf["offset"].astype(int).tolist())
            ts_max = pdf["event_time"].max()
            if pd.notna(ts_max):
                last_ms = max(last_ms, int(ts_max.value // 1_000_000))
        state.update((kinds, texts, media, offsets, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        return
        yield  # pragma: no cover — makes fn a generator

    return fn


def assemble_span_sessions(events, gap: str = "10 seconds",
                           watermark: str = "1 second"):
    """events (SPAN_EVENT_DDL stream) → assembled documents, one row per
    doc emitted when the watermark passes its last span + gap."""
    gap_ms = int(gap.split()[0]) * (
        1000 if gap.split()[1].startswith("second") else 60_000)
    return (
        events.withWatermark("event_time", watermark)
        .groupBy("doc_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=ASSEMBLED_DDL,
            stateStructType=_STATE_DDL,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )

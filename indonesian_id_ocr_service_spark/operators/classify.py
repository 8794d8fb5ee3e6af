"""C1/C2: document-type detection and OCR-confidence aggregation as pure
JVM expressions over the packed spans array (SURVEY §2.3).

Semantics per /root/reference/document_processor.py:32-71. Runs before
any Python stage so type routing prunes work: only KTP rows reach the
KTP extraction UDF, only SIM rows the SIM one — a filter the optimizer
pushes into the scan-side projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.core import let2

__all__ = ["joined_text", "document_type", "document_type_py"]

_SIM_CONTAINS = (("SURAT IZIN MENGEMUDI", 6), ("DRIVING LICENSE", 6),
                 ("BERLAKU SAMPAI", 4), ("KORLANTAS", 3), ("SATPAS", 2),
                 ("NOMOR SIM", 2), ("NO. SIM", 2), ("NO SIM", 2),
                 ("POLDA", 1), ("POLRES", 1), ("METRO JAYA", 1),
                 ("METROJAYA", 1))
_KTP_CONTAINS = (("KARTU TANDA PENDUDUK", 6), ("KEWARGANEGARAAN", 4),
                 ("STATUS PERKAWINAN", 4), ("BERLAKU HINGGA", 3),
                 ("PROVINSI", 2), ("KABUPATEN", 2), ("KECAMATAN", 2),
                 ("KEL/DESA", 1), ("KEL./DESA", 1), ("RT/RW", 1),
                 ("GOL. DARAH", 1))


def document_type_py(texts) -> str:
    """Python twin of the ``document_type`` Column expression (same C1
    additive scoring), for the Arrow kernel's in-batch dispatch — the
    kernel must not depend on oracle/*. Parity with both the JVM form
    and the oracle is asserted in tests/test_scalar_parity.py."""
    import re as _re

    full = " ".join(texts).upper()
    compact = _re.sub(r"\s+", "", full)
    sim = sum(p for kw, p in _SIM_CONTAINS if kw in full)
    if _re.search(r"\d{4}[-\s]\d{4}[-\s]\d{5,6}", full):
        sim += 4
    if _re.search(r"\b[1-6]\.\s+[A-Z]", full):
        sim += 2
    ktp = sum(p for kw, p in _KTP_CONTAINS if kw in full)
    if _re.search(r"\b\d{16}\b", compact):
        ktp += 5
    if _re.search(r"\bNIK\b", full):
        ktp += 3
    if sim > ktp and sim >= 2:
        return "SIM"
    if ktp >= 2:
        return "KTP"
    if _re.search(r"\d{16}", compact):
        return "KTP"
    return "UNKNOWN"


def joined_text(spans: Column) -> Column:
    """S7: all text-span texts joined with single spaces, in span order."""
    return F.array_join(
        F.transform(
            F.filter(spans, lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
        " ",
    )


def document_type(spans: Column) -> Column:
    """C1 additive keyword scoring (document_processor.py:32-64)."""

    def score(full: Column, compact: Column) -> Column:
        def has(c: Column, kw: str, pts: int) -> Column:
            return F.when(c.contains(kw), F.lit(pts)).otherwise(F.lit(0))

        def rx(c: Column, pat: str, pts: int) -> Column:
            return F.when(c.rlike(pat), F.lit(pts)).otherwise(F.lit(0))

        sim = (
            has(full, "SURAT IZIN MENGEMUDI", 6)
            + has(full, "DRIVING LICENSE", 6)
            + has(full, "BERLAKU SAMPAI", 4)
            + has(full, "KORLANTAS", 3)
            + rx(full, r"\d{4}[-\s]\d{4}[-\s]\d{5,6}", 4)
            + has(full, "SATPAS", 2)
            + has(full, "NOMOR SIM", 2)
            + has(full, "NO. SIM", 2)
            + has(full, "NO SIM", 2)
            + has(full, "POLDA", 1)
            + has(full, "POLRES", 1)
            + has(full, "METRO JAYA", 1)
            + has(full, "METROJAYA", 1)
            + rx(full, r"\b[1-6]\.\s+[A-Z]", 2)
        )
        ktp = (
            has(full, "KARTU TANDA PENDUDUK", 6)
            + has(full, "KEWARGANEGARAAN", 4)
            + has(full, "STATUS PERKAWINAN", 4)
            + has(full, "BERLAKU HINGGA", 3)
            + rx(compact, r"\b\d{16}\b", 5)
            + has(full, "PROVINSI", 2)
            + has(full, "KABUPATEN", 2)
            + has(full, "KECAMATAN", 2)
            + rx(full, r"\bNIK\b", 3)
            + has(full, "KEL/DESA", 1)
            + has(full, "KEL./DESA", 1)
            + has(full, "RT/RW", 1)
            + has(full, "GOL. DARAH", 1)
        )
        return let2(
            sim,
            ktp,
            lambda s, k: (
                F.when((s > k) & (s >= 2), F.lit("SIM"))
                .when(k >= 2, F.lit("KTP"))
                .when(compact.rlike(r"\d{16}"), F.lit("KTP"))
                .otherwise(F.lit("UNKNOWN"))
            ),
        )

    from ..functions.core import let

    return let(
        F.upper(joined_text(spans)),
        lambda full: let(
            F.regexp_replace(full, r"\s+", ""),
            lambda compact: score(full, compact),
        ),
    )

"""DataFrame-staged date normalization — the whole-stage-codegen path.

Same semantics as ``dates.normalize_date`` (the five-strategy
``DateNormalizer`` chain, /root/reference/date_normalizer.py:71-344) but
expressed as a short stack of *wide* projections over materialized
intermediate columns instead of one deep ``let``-bound expression tree.

Why this exists: Spark's higher-order functions (``transform`` /
``aggregate`` / ``get``) recompute ``dataType`` recursively per
evaluation and run interpreted, so the let-bound tree in ``dates.py``
costs ~10 core-ms/row on big inputs. Here every shared sub-expression is
a real column computed exactly once per row in generated JVM code —
zero HOFs, zero shuffles, zero Python.

Plan-shape matters twice at scale:
- runtime: adjacent projections fuse into one WholeStageCodegen stage;
  CollapseProject keeps multi-referenced non-cheap expressions
  materialized instead of re-inlining them.
- planning: Catalyst rule passes walk every Project node, so the five
  strategies' *independent* column pipelines are zip-merged into shared
  "rounds" — ~15 wide Project nodes total rather than 50+ narrow ones
  (which cost multiple driver-seconds per optimizer pass).

Two semantic-preserving rewrites vs the Column version (both covered by
the parity tests against the pure-Python oracle):

- ``repair_year`` (N21, date_normalizer.py:238-258): the 40-candidate
  generate-and-test search is replaced by its closed form. For digit
  position p, candidate(d) = base_p + d·10^(len-p) where base_p is the
  year with digit p zeroed, monotonically increasing in d — so the first
  in-range digit is d = max(0, ceil((MIN_YEAR − base_p)/step)), and the
  (position asc, digit asc) priority is a 4-way ``coalesce``.
- calendar validation (date_normalizer.py:316-321): ``try_to_date`` is
  exception-driven on invalid dates (fillInStackTrace per bad row); an
  explicit month-length + proleptic-Gregorian leap-year check is
  branch-only and equal on the guarded domain (y in 1..9999, m in 1..12,
  d in 1..31).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dictionaries import MAX_BIRTH_YEAR, MIN_BIRTH_YEAR, REFERENCE_YEAR
from .chars import digits_only, sub_date_chars
from .dates import DATE_RESULT_TYPE

__all__ = ["with_normalized_date"]

#: a strategy pipeline: (start_round, [cols-to-add per round, in order])
_Pipe = Tuple[int, List[Dict[str, Column]]]


def _null_result() -> Column:
    return F.lit(None).cast(DATE_RESULT_TYPE)


def _collapse(c: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(c, r"[-/. ]{2,}", "-"), r"[-/. ]", "-"
    )


def _days_in_month(m: Column, y: Column) -> Column:
    """Proleptic-Gregorian month length (== Spark's to_date calendar)."""
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    return (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
        .when(m.isin(4, 6, 9, 11), 30)
        .otherwise(F.when(leap, 29).otherwise(28))
    )


def _repair_year_closed(ys: Column) -> Column:
    """Closed-form N21 search over the zero-padded year string ``ys``."""
    out = []
    for p in (1, 2, 3, 4):
        base = F.concat(
            F.substring(ys, 1, p - 1), F.lit("0"), F.substr(ys, F.lit(p + 1))
        ).cast("int")
        step = F.ceil(
            F.pow(F.lit(10.0), (F.length(ys) - p).cast("double"))
        ).cast("int")
        dmin = F.greatest(
            F.lit(0), F.ceil((F.lit(MIN_BIRTH_YEAR) - base) / step).cast("int")
        )
        cand = base + dmin * step
        out.append(
            F.when((dmin <= 9) & (cand <= F.lit(REFERENCE_YEAR)), cand)
        )
    return F.coalesce(*out)


def _build_pipe(pfx: str, d_s: Column, mo_s: Column, yr_s: Column,
                conf: Column, method: Column,
                valid: Column) -> List[Dict[str, Column]]:
    """_build_result (date_normalizer.py:264-329) as a 6-round column
    pipeline; the last round adds '{pfx}res' (the result struct)."""
    d0, m0, y0 = (F.col(f"{pfx}{n}") for n in ("d0", "m0", "y0"))
    day_bad = (d0 < 1) | (d0 > 31)
    can_swap = (m0 >= 1) & (m0 <= 31) & (d0 >= 1) & (d0 <= 12)
    do_swap = day_bad & can_swap
    d1, m1, y1 = (F.col(f"{pfx}{n}") for n in ("d1", "m1", "y1"))
    inr, fl, rep = (F.col(f"{pfx}{n}") for n in ("inr", "fl", "rep"))
    y2 = F.col(f"{pfx}y2")
    cal_ok = (d1 >= 1) & (d1 <= _days_in_month(m1, y2))
    return [
        {
            f"{pfx}d0": F.trim(d_s).cast("int"),
            f"{pfx}m0": F.trim(mo_s).cast("int"),
            f"{pfx}y0": F.trim(yr_s).cast("int"),
            f"{pfx}vld": valid,
            f"{pfx}cnf": conf,
            f"{pfx}mth": method,
        },
        {
            f"{pfx}d1": F.when(do_swap, m0).otherwise(d0),
            f"{pfx}m1": F.when(do_swap, d0).otherwise(m0),
            f"{pfx}swp": do_swap,
            f"{pfx}f0": (day_bad & ~can_swap) | d0.isNull() | m0.isNull(),
            f"{pfx}y1": F.when(
                y0 < 100, F.when(y0 > 25, y0 + 1900).otherwise(y0 + 2000)
            ).otherwise(y0),
            f"{pfx}two": y0 < 100,
        },
        {
            f"{pfx}fl": F.col(f"{pfx}f0") | (m1 < 1) | (m1 > 12)
            | y1.isNull(),
            f"{pfx}c1": F.col(f"{pfx}cnf")
            * F.when(F.col(f"{pfx}swp"), 0.80).otherwise(1.0)
            * F.when(F.col(f"{pfx}two"), 0.85).otherwise(1.0),
            f"{pfx}inr": (y1 >= MIN_BIRTH_YEAR) & (y1 <= REFERENCE_YEAR),
            f"{pfx}ys": F.when(
                F.length(y1.cast("string")) > 4, y1.cast("string")
            ).otherwise(F.lpad(y1.cast("string"), 4, "0")),
        },
        {
            f"{pfx}rep": F.when(
                ~inr & ~fl, _repair_year_closed(F.col(f"{pfx}ys"))
            ),
        },
        {
            f"{pfx}y2": F.when(inr, y1).otherwise(F.coalesce(rep, y1)),
            f"{pfx}c2": F.col(f"{pfx}c1") * (
                F.when(inr, F.lit(1.0))
                .when(rep.isNotNull(), F.lit(0.80))
                .when((y1 > REFERENCE_YEAR) & (y1 <= MAX_BIRTH_YEAR),
                      F.lit(0.75))
                .otherwise(F.lit(0.15))
            ),
            f"{pfx}mt1": F.when(
                ~inr & rep.isNotNull(),
                F.concat(F.lit("year_repair_"), F.col(f"{pfx}mth")),
            ).otherwise(F.col(f"{pfx}mth")),
        },
        {
            f"{pfx}res": F.when(
                F.col(f"{pfx}vld") & ~fl & (y2 >= 1) & (y2 <= 9999)
                & cal_ok,
                F.struct(
                    F.format_string("%02d-%02d-%04d", d1, m1, y2)
                    .alias("normalized"),
                    d1.alias("day"),
                    m1.alias("month"),
                    y2.alias("year"),
                    F.col(f"{pfx}c2").alias("confidence"),
                    F.col(f"{pfx}mt1").alias("method"),
                ),
            ).otherwise(_null_result()),
        },
    ]


_STRICT_PAT = r"^(\d{1,2})-(\d{1,2})-(\d{4})$"
_EMB_PAT = r"\b(\d{1,2})-(\d{1,2})-(\d{4})\b"
_3DIGIT_PAT = r"(\d{1,2})-(\d{1,2})-(\d{3})$"
_PERMISSIVE_PAT = r"(\d{1,2})\s*[-/.]\s*(\d{1,2})\s*[-/.]\s*(\d{2,4})"


def _rescale(res: Column, scale: float, prefix: str) -> Column:
    """Reference semantics for the charsub / 7digit wrappers
    (date_normalizer.py:148-158,192-215): ×scale and method prefix apply
    to the FINISHED result ('char_sub_year_repair_strict…'). Null-safe:
    withField on a null struct stays null."""
    return res.withField(
        "confidence", res["confidence"] * F.lit(scale)
    ).withField("method", F.concat(F.lit(prefix), res["method"]))


def _standard_pipe(pfx: str, src: Column) -> List[Dict[str, Column]]:
    """Strategy 1 (date_normalizer.py:126-146): strict, else embedded —
    a matched-but-invalid strict build does NOT fall through.

    Group extraction runs the pattern ONCE (match group 0) and splits on
    the separator: the groups of these patterns are exactly the
    separator-delimited pieces of the matched substring, so split(m0)
    equals per-group regexp_extract at a third of the regex executions.
    A no-match yields m0 = "" → split gives [""] → day = "", month/year
    = null (out-of-range element_at) — the build fails on null d/m/y
    exactly as it does on the ""-groups of the per-group form."""
    isstr, strict, cln = (
        F.col(f"{pfx}isstr"), F.col(f"{pfx}str"), F.col(f"{pfx}cln"))
    pts = F.col(f"{pfx}pts")
    return [
        {f"{pfx}cln": _collapse(src)},
        {f"{pfx}str": F.trim(cln)},
        {f"{pfx}isstr": strict.rlike(_STRICT_PAT)},
        {f"{pfx}m0": F.when(isstr, strict).otherwise(
            F.regexp_extract(cln, _EMB_PAT, 0))},
        {f"{pfx}pts": F.split(F.col(f"{pfx}m0"), "-")},
    ] + _build_pipe(
        pfx,
        F.element_at(pts, 1), F.element_at(pts, 2), F.element_at(pts, 3),
        F.when(isstr, F.lit(0.97)).otherwise(F.lit(0.90)),
        F.when(isstr, F.lit("strict_dd_mm_yyyy"))
        .otherwise(F.lit("embedded_dd_mm_yyyy")),
        isstr | (F.size(pts) == 3),
    )


def _three_digit_pipe(pfx: str, src: Column,
                      pre_collapsed: Column = None
                      ) -> List[Dict[str, Column]]:
    """Strategy 3 (date_normalizer.py:160-190). Same split-of-group-0
    extraction as _standard_pipe. ``pre_collapsed`` lets the caller reuse
    an already char-subbed + collapsed column for this src."""
    c3 = F.col(f"{pfx}c3")
    pts = F.col(f"{pfx}pts")
    g3 = F.element_at(pts, 3)
    yi = F.col(f"{pfx}yi")
    return [
        {f"{pfx}c3": F.trim(
            _collapse(sub_date_chars(src)) if pre_collapsed is None
            else pre_collapsed)},
        {f"{pfx}m0": F.regexp_extract(c3, _3DIGIT_PAT, 0)},
        {f"{pfx}pts": F.split(F.col(f"{pfx}m0"), "-")},
        {f"{pfx}yi": g3.cast("int")},
        {
            f"{pfx}yf": (
                F.when((yi >= 900) & (yi <= 999), F.concat(F.lit("1"), g3))
                .when((yi >= 0) & (yi <= 25), F.concat(F.lit("20"), g3))
                .when((yi >= 26) & (yi <= 99), F.concat(F.lit("19"), g3))
                .when((yi >= 100) & (yi <= 199),
                      F.concat(F.lit("1"), g3, F.lit("0")))
            ),
            f"{pfx}cf": (
                F.when((yi >= 900) & (yi <= 999), F.lit(0.75))
                .when((yi >= 0) & (yi <= 25), F.lit(0.70))
                .when((yi >= 26) & (yi <= 99), F.lit(0.65))
                .when((yi >= 100) & (yi <= 199), F.lit(0.50))
            ),
        },
    ] + _build_pipe(
        pfx,
        F.element_at(pts, 1), F.element_at(pts, 2), F.col(f"{pfx}yf"),
        F.col(f"{pfx}cf"),
        F.lit("3digit_year_recon"),
        (F.size(pts) == 3) & F.col(f"{pfx}yf").isNotNull(),
    )


def with_normalized_date(df: DataFrame, raw_col: str,
                         out: str = "date_res") -> DataFrame:
    """Append ``out`` = normalize_date(raw_col) as the staged-projection
    plan. Column-for-column the same struct as ``dates.normalize_date``.
    """
    raw = F.col(raw_col)
    t = F.col("_nd_t")
    dig = F.col("_s4_dig")
    sub = F.col("_s2_sub")   # S5 scans the same char-subbed text as S2
    pts5 = F.col("_s5_pts")
    gy5 = F.element_at(pts5, 3)

    pipes: List[_Pipe] = [
        (0, [{"_nd_t": F.trim(raw)}]),
        # S1: standard on t — rounds 1..11
        (1, _standard_pipe("_s1_", t)),
        # S2: char-sub then standard iff the substitution changed the text
        (1, [{"_s2_sub": sub_date_chars(t)}]),
        (2, _standard_pipe("_s2_", sub)),
        (13, [{"_s2_res2": F.when(
            sub != t, _rescale(F.col("_s2_res"), 0.88, "char_sub_")
        ).otherwise(_null_result())}]),
        # S3: 3-digit-year reconstruction on t. Its collapsed input
        # trim(collapse(sub_date_chars(t))) is exactly trim(S2's cln) —
        # reuse it instead of re-running translate + 2 regexp_replace.
        (3, _three_digit_pipe("_s3_", t, pre_collapsed=F.col("_s2_cln"))),
        # S4: 7-digit — interp1 via strategy-3 (×0.82), else alt @0.45
        (1, [{"_s4_dig": digits_only(sub)}]),
        (2, [{
            "_s4_i1": F.concat_ws(
                "-", F.substring(dig, 1, 2), F.substring(dig, 3, 2),
                F.substring(dig, 5, 3)),
            "_s4_is7": F.length(dig) == 7,
        }]),
        (3, _three_digit_pipe("_s4a_", F.col("_s4_i1"))),
        (3, _build_pipe(
            "_s4b_",
            F.concat(F.lit("0"), F.substring(dig, 1, 1)),
            F.substring(dig, 2, 2), F.substring(dig, 4, 4),
            F.lit(0.45), F.lit("7digit_alt_interp"), F.lit(True),
        )),
        (14, [{"_s4_res2": F.when(
            F.col("_s4_is7"),
            F.coalesce(_rescale(F.col("_s4a_res"), 0.82, "7digit_"),
                       F.col("_s4b_res")),
        ).otherwise(_null_result())}]),
        # S5: permissive scan on the char-subbed text (split-of-group-0,
        # see _standard_pipe docstring)
        (2, [{"_s5_m0": F.regexp_extract(sub, _PERMISSIVE_PAT, 0)}]),
        (3, [{"_s5_pts": F.split(F.col("_s5_m0"), r"\s*[-/.]\s*")}]),
        (4, [{"_s5_yf": F.when(
            F.length(gy5) == 2,
            F.when(gy5.cast("int") > 25, F.concat(F.lit("19"), gy5))
            .otherwise(F.concat(F.lit("20"), gy5)),
        ).otherwise(gy5)}]),
        (5, _build_pipe(
            "_s5_",
            F.element_at(pts5, 1), F.element_at(pts5, 2),
            F.col("_s5_yf"),
            F.lit(0.55), F.lit("permissive_scan"), F.size(pts5) == 3,
        )),
    ]

    # zip-merge the pipelines into shared rounds: one wide Project per
    # round instead of one narrow Project per column-batch
    rounds: List[Dict[str, Column]] = []
    for start, pipe in pipes:
        for i, cols in enumerate(pipe):
            while len(rounds) <= start + i:
                rounds.append({})
            rounds[start + i].update(cols)

    temps: List[str] = []
    for cols in rounds:
        if cols:
            df = df.withColumns(cols)
            temps.extend(cols.keys())

    final = F.when(
        raw.isNotNull() & (t != ""),
        F.coalesce(F.col("_s1_res"), F.col("_s2_res2"), F.col("_s3_res"),
                   F.col("_s4_res2"), F.col("_s5_res")),
    ).otherwise(_null_result())
    return df.withColumn(out, final).drop(*temps)

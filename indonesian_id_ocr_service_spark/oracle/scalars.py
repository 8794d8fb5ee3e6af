"""Scalar-level oracle: date normalization, NIK repair, field correction.

Implements the *semantics* of the reference's scalar modules
(/root/reference/date_normalizer.py, nik_fuzzy.py, ocr_corrector.py,
ktp_extractor.py cleanup helpers) as compact pure functions. The Spark
engine implements the same semantics as JVM column expressions /
pandas UDFs; the pytest suite asserts equality between the two on golden
pairs and on the synthetic corpus. Citations are file:line into
/root/reference/.
"""

from __future__ import annotations

import re
from datetime import date as _date

from ..dictionaries import (
    DATE_KEEP,
    DATE_TO_DIGIT,
    FIELD_ENUMS,
    INDONESIAN_PLACES,
    KEWARGANEGARAAN_CANONICAL,
    MIN_BIRTH_YEAR,
    MAX_BIRTH_YEAR,
    NIK_INSERT_POSITIONS,
    PEKERJAAN_CANONICAL,
    REFERENCE_YEAR,
    STATUS_PERKAWINAN_CANONICAL,
    TO_DIGIT,
    TO_TEXT,
    VALID_PROVINCE_CODES,
)
from ..functions import fuzzy

# ---------------------------------------------------------------------------
# Character substitution (N1-N4)
# ---------------------------------------------------------------------------


def sub_to_digit(text: str) -> str:
    """Letters→digits, numeric context (nik_fuzzy.py:202-204)."""
    return "".join(TO_DIGIT.get(c, c) for c in text)


def sub_to_text(text: str) -> str:
    """Digits→letters after upper-casing, TEXT context
    (ocr_corrector.py:276-283)."""
    return "".join(TO_TEXT.get(c, c) for c in text.upper())


def sub_date_chars(text: str) -> str:
    """Date-context substitution: keep digits and ``-./ ,``
    (date_normalizer.py:335-344)."""
    out = []
    for ch in text:
        if ch.isdigit() or ch in DATE_KEEP:
            out.append(ch)
        else:
            out.append(DATE_TO_DIGIT.get(ch, ch))
    return "".join(out)


def sub_context_aware(text: str) -> str:
    """Token-wise: alpha-ratio ≥ 0.4 → TEXT-context sub, else upper only
    (ocr_corrector.py:294-312)."""
    if not text:
        return text
    out = []
    for token in re.split(r"(\s+)", text):
        if not token or token.isspace():
            out.append(token)
            continue
        alpha = sum(1 for c in token if c.isalpha())
        if alpha / max(len(token), 1) >= 0.4:
            out.append(sub_to_text(token))
        else:
            out.append(token.upper())
    return "".join(out)


# ---------------------------------------------------------------------------
# Date normalization (N14-N24) — date_normalizer.py semantics
# ---------------------------------------------------------------------------


def _repair_year(yr: int) -> int | None:
    """First single-digit replacement (position asc, digit asc) landing in
    [MIN_BIRTH_YEAR, REFERENCE_YEAR] (date_normalizer.py:238-258)."""
    s = str(yr).zfill(4)
    for pos in range(4):
        for repl in "0123456789":
            if repl == s[pos]:
                continue
            cand = int(s[:pos] + repl + s[pos + 1:])
            if MIN_BIRTH_YEAR <= cand <= REFERENCE_YEAR:
                return cand
    return None


def _build_date(d_s: str, mo_s: str, yr_s: str, conf: float, method: str):
    """Validate components → dict or None (date_normalizer.py:264-329)."""
    try:
        d, mo, yr = int(d_s.strip()), int(mo_s.strip()), int(yr_s.strip())
    except ValueError:
        return None
    if d < 1 or d > 31:
        if 1 <= mo <= 31 and 1 <= d <= 12:
            d, mo = mo, d
            conf *= 0.80
        else:
            return None
    if mo < 1 or mo > 12:
        return None
    if yr < 100:
        yr = (1900 + yr) if yr > 25 else (2000 + yr)
        conf *= 0.85
    if not (MIN_BIRTH_YEAR <= yr <= REFERENCE_YEAR):
        rep = _repair_year(yr)
        if rep is not None:
            yr = rep
            method = "year_repair_" + method
            conf *= 0.80
        elif REFERENCE_YEAR < yr <= MAX_BIRTH_YEAR:
            conf *= 0.75
        else:
            conf *= 0.15
    try:
        _date(yr, mo, d)
    except ValueError:
        return None
    return {
        "normalized": f"{d:02d}-{mo:02d}-{yr:04d}",
        "day": d, "month": mo, "year": yr,
        "confidence": float(conf), "method": method,
    }


def _collapse_seps(text: str) -> str:
    clean = re.sub(r"[-/. ]{2,}", "-", text)
    return re.sub(r"[-/. ]", "-", clean)


def _strategy_standard(text: str):
    clean = _collapse_seps(text)
    m = re.match(r"^(\d{1,2})-(\d{1,2})-(\d{4})$", clean.strip())
    if m:
        return _build_date(m.group(1), m.group(2), m.group(3), 0.97,
                           "strict_dd_mm_yyyy")
    m = re.search(r"\b(\d{1,2})-(\d{1,2})-(\d{4})\b", clean)
    if m:
        return _build_date(m.group(1), m.group(2), m.group(3), 0.90,
                           "embedded_dd_mm_yyyy")
    return None


def _strategy_charsub(text: str):
    sub = sub_date_chars(text)
    if sub == text:
        return None
    r = _strategy_standard(sub)
    if r:
        r["confidence"] *= 0.88
        r["method"] = "char_sub_" + r["method"]
    return r


def _strategy_3digit_year(text: str):
    clean = _collapse_seps(sub_date_chars(text))
    m = re.search(r"(\d{1,2})-(\d{1,2})-(\d{3})$", clean.strip())
    if not m:
        return None
    d_s, mo_s, y3 = m.group(1), m.group(2), m.group(3)
    yi = int(y3)
    if 900 <= yi <= 999:
        yf, conf = "1" + y3, 0.75
    elif 0 <= yi <= 25:
        yf, conf = "20" + y3, 0.70
    elif 26 <= yi <= 99:
        yf, conf = "19" + y3, 0.65
    elif 100 <= yi <= 199:
        yf, conf = "1" + y3 + "0", 0.50
    else:
        return None
    return _build_date(d_s, mo_s, yf, conf, "3digit_year_recon")


def _strategy_7digit(text: str):
    digits = re.sub(r"\D", "", sub_date_chars(text))
    if len(digits) != 7:
        return None
    r = _strategy_3digit_year(f"{digits[0:2]}-{digits[2:4]}-{digits[4:7]}")
    if r and r["confidence"] > 0:
        r["confidence"] *= 0.82
        r["method"] = "7digit_" + r["method"]
        return r
    r2 = _build_date("0" + digits[0], digits[1:3], digits[3:7], 0.45,
                     "7digit_alt_interp")
    return r2 if (r2 and r2["confidence"] > 0) else None


def _strategy_permissive(text: str):
    sub = sub_date_chars(text)
    m = re.search(r"(\d{1,2})\s*[-/.]\s*(\d{1,2})\s*[-/.]\s*(\d{2,4})", sub)
    if not m:
        return None
    d_s, mo_s, y_s = m.group(1), m.group(2), m.group(3)
    if len(y_s) == 2:
        y_s = ("19" + y_s) if int(y_s) > 25 else ("20" + y_s)
    return _build_date(d_s, mo_s, y_s, 0.55, "permissive_scan")


_STRATEGIES = (
    _strategy_standard,
    _strategy_charsub,
    _strategy_3digit_year,
    _strategy_7digit,
    _strategy_permissive,
)


def normalize_date(raw: str):
    """Full strategy chain (date_normalizer.py:71-92). Returns dict with
    confidence 0.0 when all strategies fail."""
    if not raw or not raw.strip():
        return {"normalized": None, "day": None, "month": None, "year": None,
                "confidence": 0.0, "method": "empty_input"}
    text = raw.strip()
    for strat in _STRATEGIES:
        r = strat(text)
        if r and r["confidence"] > 0.0:
            return r
    return {"normalized": None, "day": None, "month": None, "year": None,
            "confidence": 0.0, "method": "all_strategies_failed"}


def normalize_date_robust(raw: str) -> str:
    """Facade: normalized iff conf > 0.25, else the original raw
    (date_normalizer.py:354-377)."""
    if not raw:
        return raw
    r = normalize_date(raw)
    if r["normalized"] and r["confidence"] > 0.25:
        return r["normalized"]
    return raw


def split_place_date(raw: str):
    """(place, date_raw) split of a Tempat/Tgl-Lahir string
    (date_normalizer.py:94-120)."""
    if not raw:
        return None, ""
    if "," in raw:
        head, tail = raw.split(",", 1)
        return (head.strip().strip(".:- ") or None), tail.strip()
    m = re.search(r"(\d{1,2}[\s\./\-]+\d{1,2}[\s\./\-]+\d{2,4})", raw)
    if m:
        return (raw[: m.start()].strip().strip(".:- ") or None), m.group(1)
    return None, raw


def normalize_place_date(raw: str):
    place, date_raw = split_place_date(raw)
    return place, normalize_date(date_raw)


# ---------------------------------------------------------------------------
# NIK candidate engine (N5-N13) — nik_fuzzy.py semantics
# ---------------------------------------------------------------------------


def nik_structural_score(nik: str) -> float:
    """Structure-compliance score in [0,1] (nik_fuzzy.py:261-311)."""
    if not nik or not re.match(r"^\d{16}$", nik):
        return 0.0
    score = 1.0
    prov = int(nik[0:2])
    if prov not in VALID_PROVINCE_CODES:
        score *= 0.40 if (prov < 11 or prov > 94) else 0.85
    if int(nik[4:6]) == 0:
        score *= 0.70
    day = int(nik[6:8])
    if day == 0:
        score *= 0.0
    elif not (1 <= day <= 31 or 41 <= day <= 71):
        score *= 0.10
    month = int(nik[8:10])
    if month < 1 or month > 12:
        score *= 0.0
    if int(nik[12:16]) == 0:
        score *= 0.50
    return float(score)


def nik_candidates(raw: str) -> list[dict]:
    """All plausible NIK candidates, confidence-desc, ties in generation
    order (nik_fuzzy.py:108-166)."""
    if not raw:
        return []
    cands: list[dict] = []

    def add(value, source, conf):
        cands.append({"value": value, "source": source, "confidence": conf})

    exact = re.sub(r"\D", "", raw)
    if len(exact) == 16:
        add(exact, "exact", 1.0)

    sub = sub_to_digit(raw)
    sub_digits = re.sub(r"\D", "", sub)
    if len(sub_digits) == 16 and sub_digits != exact:
        add(sub_digits, "char_sub", 0.88)

    runs = re.findall(r"\d+", sub)
    run = max(runs, key=len) if runs else ""
    if 14 <= len(run) <= 16:
        padded = run.ljust(16, "0")
        base = {14: 0.50, 15: 0.72, 16: 0.93}[len(run)]
        if not any(c["value"] == padded for c in cands):
            add(padded, f"longest_run_{len(run)}", base)

    working = (sub_digits if len(sub_digits) == 15
               else (exact if len(exact) == 15 else None))
    if working:
        seen: set[str] = set()
        for pos in NIK_INSERT_POSITIONS:
            for digit in "0123456789":
                v = working[:pos] + digit + working[pos:]
                if v not in seen:
                    seen.add(v)
                    add(v, f"padded_pos{pos}", 0.62)
        for digit in "0123456789":
            for v in (digit + working, working + digit):
                if v not in seen:
                    seen.add(v)
                    add(v, "edge_pad", 0.58)

    for c in cands:
        s = nik_structural_score(c["value"])
        c["structural_score"] = s
        c["confidence"] *= 0.25 if s < 0.2 else (0.5 + 0.5 * s)

    # dedup keep-max per value (first wins ties), filter, stable sort desc
    by_value: dict[str, dict] = {}
    for c in cands:
        prev = by_value.get(c["value"])
        if prev is None or c["confidence"] > prev["confidence"]:
            by_value[c["value"]] = c
    out = [c for c in by_value.values() if c["confidence"] >= 0.30]
    out.sort(key=lambda c: -c["confidence"])
    return out


def nik_best_candidate(raw: str, min_confidence: float = 0.30):
    cands = nik_candidates(raw)
    if not cands:
        return None
    return cands[0] if cands[0]["confidence"] >= min_confidence else None


def clean_nik(raw: str):
    """16-digit extraction with substitution (ktp_extractor.py:109-128)."""
    if not raw:
        return None
    sub = sub_to_digit(raw)
    digits = re.sub(r"\D", "", sub)
    if len(digits) == 16:
        return digits
    if len(digits) > 16:
        m = re.search(r"\d{16}", sub.replace(" ", ""))
        return m.group(0) if m else None
    return None


def pad_nik_with_dob(digits_15: str, expected_dob: str):
    """Digit-major, position-minor insertion search; first candidate whose
    chars 6–11 equal the expected DOB segment (nik_cross_validator.py:271-285)."""
    for digit in "0123456789":
        for pos in range(16):
            cand = digits_15[:pos] + digit + digits_15[pos:]
            if len(cand) == 16 and cand[6:12] == expected_dob:
                return cand
    return None


# ---------------------------------------------------------------------------
# Fuzzy field normalization & correctors (N25-N37)
# ---------------------------------------------------------------------------


def fuzzy_normalize_field(value: str, canonical_map: dict[str, list[str]],
                          threshold: int = 72) -> str:
    """Exact alias tier → token_set_ratio tier (ktp_extractor.py:68-102)."""
    if not value:
        return value
    v = value.upper().strip()
    for canonical, aliases in canonical_map.items():
        if v in [a.upper() for a in aliases]:
            return canonical
    best_canonical, best = value, 0
    for canonical, aliases in canonical_map.items():
        for alias in aliases:
            s = fuzzy.token_set_ratio(v, alias.upper())
            if s > best:
                best, best_canonical = s, canonical
    return best_canonical if best >= threshold else value


def correct_enum(field_key: str, value: str):
    """Enum-field correction tiers (ocr_corrector.py:368-401).
    Returns (corrected, confidence) or None when no tier fires."""
    if not value:
        return None
    cfg = FIELD_ENUMS.get(field_key)
    if cfg is None:
        return None
    vocab, thr = cfg["values"], cfg["threshold"]
    v = value.upper().strip()
    if v in vocab:
        return v, 1.0
    sub = sub_to_text(v)
    if sub in vocab:
        return sub, 0.93
    for cand in (v, sub):
        choice, score = fuzzy.extract_one(cand, vocab,
                                          scorer=fuzzy.token_set_ratio)
        if choice is not None and score >= thr:
            return choice, score / 100.0
    return None


def _j_i_variants(text: str) -> list[str]:
    if not text:
        return []
    if text[0] == "I":
        return ["J" + text[1:]]
    if text[0] == "J":
        return ["I" + text[1:]]
    return []


def correct_place(raw: str, min_confidence: float = 0.82):
    """Place-name correction tiers (ocr_corrector.py:423-477).
    Returns (corrected, confidence)."""
    if not raw or len(raw.strip()) < 2:
        return raw, 0.0
    v = raw.upper().strip()
    db = INDONESIAN_PLACES
    db_set = set(db)
    if v in db_set:
        return v, 1.0
    sub = sub_to_text(v)
    if sub in db_set:
        return sub, 0.95
    for variant in _j_i_variants(v):
        if variant in db_set:
            return variant, 0.90
    for variant in _j_i_variants(sub):
        if variant in db_set:
            return variant, 0.87
    cands = list({v, sub} | set(_j_i_variants(v)) | set(_j_i_variants(sub)))
    best_score, best_match = 0, None
    for cand in cands:
        choice, score = fuzzy.extract_one(cand, db,
                                          scorer=fuzzy.token_set_ratio)
        if choice is not None and score > best_score:
            best_score, best_match = score, choice
    if best_match and best_score >= min_confidence * 100:
        return best_match, best_score / 100.0
    corrected = sub if sub != v else v
    return corrected, 0.35


# ---------------------------------------------------------------------------
# cleanup_data field normalizers (ktp_extractor.py:589-743)
# ---------------------------------------------------------------------------


def clean_kabupaten(raw: str) -> str:
    """Strip 1-4 leading caps before KOTA/KAB/KABUPATEN/JAKARTA
    (ktp_extractor.py:131-139)."""
    if not raw:
        return raw
    return re.sub(r"^[A-Z]{1,4}\s+(?=KOTA\b|KAB\b|KABUPATEN\b|JAKARTA\b)",
                  "", raw.strip()).strip()


def normalize_rt_rw(value: str):
    """Digit groups → zfill(3)/zfill(3); None when no digits
    (ktp_extractor.py:630-635)."""
    if not re.search(r"\d", value):
        return None
    nums = re.findall(r"\d+", value)
    if len(nums) >= 2:
        return f"{nums[0].zfill(3)}/{nums[1].zfill(3)}"
    return value


def normalize_jenis_kelamin(value: str) -> str:
    v = value.upper()
    if "LAKI" in v or "MALE" in v or "LK" in v:
        return "LAKI-LAKI"
    if "PEREMPUAN" in v or "FEMALE" in v or "PR" in v:
        return "PEREMPUAN"
    return value


def normalize_status_perkawinan(value: str) -> str:
    """Three-layer status normalization (ktp_extractor.py:655-689)."""
    v = value.upper()
    v = re.sub(r"\bCEL\s*UM\b", "BELUM", v)
    v = re.sub(r"\bSEL\s*UM\b", "BELUM", v)
    if "BELUM" in v or "SINGLE" in v or "LAJANG" in v:
        return "BELUM KAWIN"
    if re.search(r"KAWIN|MARRIED", v) and "BELUM" not in v:
        return "KAWIN"
    if "CERAI" in v or "DIVORCED" in v:
        if "HIDUP" in v:
            return "CERAI HIDUP"
        if "MATI" in v:
            return "CERAI MATI"
        return "CERAI"
    if v.startswith("BELU") and v.endswith("AWIN"):
        return "BELUM KAWIN"
    norm = fuzzy_normalize_field(value, STATUS_PERKAWINAN_CANONICAL,
                                 threshold=65)
    return norm if norm in STATUS_PERKAWINAN_CANONICAL else value


def normalize_pekerjaan(value: str) -> str:
    """Regex fixes then canonical fuzzy tier (ktp_extractor.py:697-711)."""
    v = value.replace("BURUHHARIAN", "BURUH HARIAN")
    v = re.sub(r"\bDURUH\b", "BURUH", v, flags=re.IGNORECASE)
    v = re.sub(r"\bCURLH\b", "BURUH", v, flags=re.IGNORECASE)
    v = re.sub(r"\bCURUH\b", "BURUH", v, flags=re.IGNORECASE)
    v = re.sub(r"HARIANEEPAS", "HARIAN LEPAS", v)
    v = re.sub(r"HARIAN\s*[CL]EPAS", "HARIAN LEPAS", v)
    norm = fuzzy_normalize_field(v, PEKERJAAN_CANONICAL, threshold=72)
    return norm if norm in PEKERJAAN_CANONICAL else v


def normalize_pekerjaan_sim(value: str) -> str:
    """SIM-path occupation normalization: exact alias tier then
    token_set_ratio ≥ 72 (sim_extractor.py:156-179) — the canonical-map
    pass without the KTP regex pre-fixes."""
    return fuzzy_normalize_field(value, PEKERJAAN_CANONICAL, threshold=72)


def normalize_kewarganegaraan(value: str) -> str:
    norm = fuzzy_normalize_field(value, KEWARGANEGARAAN_CANONICAL,
                                 threshold=80)
    return norm if norm in KEWARGANEGARAAN_CANONICAL else value


def normalize_alamat(value: str) -> str:
    v = re.sub(r"\s+RT.*", "", value, flags=re.IGNORECASE).strip()
    return re.sub(r"\s+RW.*", "", v, flags=re.IGNORECASE).strip()


def normalize_kecamatan(value: str) -> str:
    v = re.sub(r"\s{2,}", " ", value).strip()
    return re.sub(r"[,./\s]+$", "", v).strip()

"""Independent second implementation of the SIM extraction state
machines — M8 (legacy numbered-section walk), M9 (smart anchor layout)
and M12 (address block parser) — written directly from the reference
text (sim_extractor.py:369-477, 484-616, 786-929), NOT from
``operators/sim_core.py``.

Purpose: `oracle/sim.py` wraps the same ``sim_core`` kernel the Spark
branch drives, so for M8/M9/M12 the span-equality gate validated
routing/geometry/Arrow plumbing but not extraction semantics. This
module is the semantic cross-check: ``tests/test_sim_parity.py``
asserts 0 mismatches between the two implementations over an
adversarial generated corpus (same de-port pattern as
``functions/pandas_ktp.py`` for the KTP chain).

Shared building blocks (imported from sim_core, each golden-tested on
its own and OUTSIDE the de-ported ranges): M1 row clustering, M2 anchor
tagging, M3 job matcher, M4 garbage filter, M10 TTL parser, M11 RT/RW
OCR recovery, the region-line test, and kabupaten cleaning. The state
machines themselves — section walking, promotions, anchor/forward
scans, the address state loop — are re-derived here.
"""

from __future__ import annotations

import re

from ..operators.sim_core import (
    _is_region_line,
    _parse_ttl,
    clean_sim_kabupaten,
    cluster_rows,
    identify_field,
    is_garbage,
    is_job,
    split_rtrw_ocr,
)

__all__ = ["legacy_extract", "smart_extract", "parse_address_block"]

_ISSUER_WORDS = ("POLDA", "POLRES", "SATPAS", "METROJAYA", "METRO JAYA",
                 "KORLANTAS")


def _row_texts(items: list[dict]) -> list[str]:
    return [" ".join(x["text"] for x in row).strip()
            for row in cluster_rows(items)]


# ---------------------------------------------------------------------------
# M8 — legacy numbered-section walk (sim_extractor.py:369-477)
# ---------------------------------------------------------------------------

_EXPIRY_RX = re.compile(r"\b(\d{2}-\d{2}-20\d{2})\b")
_SIM_NUM_RX = re.compile(r"(\d{4}-\d{4}-\d{5,6})")
_SIM_NUM_PLAIN_RX = re.compile(r"(\d{12,16})")
_SECTION_RX = re.compile(r"\b([1-6])\.")
_ANY_DATE_RX = re.compile(r"\b\d{2}-\d{2}-(19|20)\d{2}\b")
_GENDER_RX = re.compile(r"\b(PRIA|WANITA|LAKI|PEREMPUAN)\b")
_ADDR_HINT_RX = re.compile(
    r"\b(RT|RW|JL|JALAN|GG|GANG|KP|PERUM|GRIYA|KOMP)\b")
_BLOOD_GENDER_RX = re.compile(r"([ABO]+)\s*[-]*\s*(PRIA|WANITA|LAKI|PEREMPUAN)")


def legacy_extract(texts: list[str], items: list[dict]) -> dict:
    out: dict = {}
    section = 0
    addr_lines: list[str] = []

    for line in _row_texts(items):
        if not line:
            continue

        exp = _EXPIRY_RX.search(line)
        if exp:
            dob = out.get("Tempat & Tgl. Lahir", "")
            if exp.group(1) not in dob:
                out["Berlaku Sampai"] = exp.group(1)
                line = line.replace(exp.group(1), "").strip()
        if not line:
            continue

        if any(w in line.upper() for w in _ISSUER_WORDS):
            out["Penerbit"] = line
            continue

        if "Nomor SIM" not in out:
            num = _SIM_NUM_RX.search(line)
            if num:
                out["Nomor SIM"] = num.group(1)
            else:
                num = _SIM_NUM_PLAIN_RX.search(
                    line.replace("-", "").replace(" ", ""))
                if num:
                    out["Nomor SIM"] = num.group(1)

        sec = _SECTION_RX.search(line)
        if sec:
            section = int(sec.group(1))
            val = re.sub(rf"{section}\.\s*", "", line).strip()
        else:
            val = line
            if (section == 0 and "Nomor SIM" in out and not is_garbage(val)
                    and not re.search(r"\d", val) and len(val) > 2):
                section = 1
            if (section < 2 and _ANY_DATE_RX.search(val)
                    and val != out.get("Berlaku Sampai")):
                section = 2
            if section < 3 and _GENDER_RX.search(val.upper()):
                section = 3
            if section < 4 and _ADDR_HINT_RX.search(val.upper()):
                section = 4
            if section < 5 and is_job(val):
                section = 5

        if not val or is_garbage(val):
            continue

        if section == 1 and len(val) > 2:
            name = re.sub(r"\d+", "", val).strip()
            if name:
                out["Nama"] = (out["Nama"] + " " + name
                               if "Nama" in out else name)
        elif section == 2:
            out["Tempat & Tgl. Lahir"] = (
                out["Tempat & Tgl. Lahir"] + " " + val
                if "Tempat & Tgl. Lahir" in out else val)
        elif section == 3:
            bg = _BLOOD_GENDER_RX.search(val.upper())
            if bg:
                out["Gol. Darah"] = bg.group(1)
                out["Jenis Kelamin"] = bg.group(2)
            else:
                out["Gol. Darah - Kelamin"] = val
        elif section == 4:
            if val.replace(".", "").strip() == str(section):
                continue
            addr_lines.append(val)
        elif section == 5:
            if val.replace(".", "").strip() == str(section):
                continue
            if "Pekerjaan" not in out:
                out["Pekerjaan"] = val
        elif section == 6:
            if "Provinsi" not in out:
                out["Provinsi"] = val

    if addr_lines:
        out["raw_address_lines"] = addr_lines
    return out


# ---------------------------------------------------------------------------
# M9 — smart anchor layout (sim_extractor.py:484-616)
# ---------------------------------------------------------------------------


def _anchor_index(tagged: list[dict], kind: str):
    for row in tagged:
        if row["type"] == kind:
            return row["index"]
    return None


def _value_forward(tagged: list[dict], start: int, lookahead: int,
                   stop_types=None):
    for i in range(start, min(start + lookahead, len(tagged))):
        row = tagged[i]
        if stop_types and row["type"] in stop_types:
            return None
        if is_garbage(row["text"]):
            continue
        if len(row["text"]) < 3 and not re.search(r"\d", row["text"]):
            continue
        return row["text"]
    return None


def smart_extract(texts: list[str], items: list[dict]) -> dict:
    out: dict = {}
    rows = _row_texts(items)

    for line in rows:
        num = _SIM_NUM_PLAIN_RX.search(
            line.replace(" ", "").replace("-", ""))
        if num:
            out["Nomor SIM"] = num.group(1)
            break

    blob = " ".join(texts)
    expiry = None
    for d, m, y in re.findall(
            r"\b(\d{2})[\s\.-]*(\d{2})[\s\.-]*(20\d{2})\b", blob):
        try:
            if int(y) > 2018:
                expiry = f"{d}-{m}-{y}"
        except ValueError:
            continue
    if expiry:
        out["Berlaku Sampai"] = expiry

    for line in rows:
        if any(w in line.upper() for w in _ISSUER_WORDS):
            issuer = re.sub(r"\b\d{2}-\d{2}-20\d{2}\b", "", line).strip()
            if issuer:
                out["Penerbit"] = issuer
            break

    tagged = [{"type": identify_field(line), "text": line, "index": i}
              for i, line in enumerate(rows)]

    nama_idx = _anchor_index(tagged, "NAMA")
    if nama_idx is not None:
        val = _value_forward(tagged, nama_idx + 1, 2, ["TTL", "ALAMAT"])
        if val and not re.search(r"\d", val):
            out["Nama"] = val
    elif "Nomor SIM" in out:
        sim_row = next(
            (i for i, line in enumerate(rows)
             if out["Nomor SIM"] in line.replace("-", "").replace(" ", "")),
            -1)
        if sim_row != -1:
            val = _value_forward(tagged, sim_row + 1, 3,
                                 ["TTL", "ALAMAT"])
            if val and not re.search(r"\d", val):
                out["Nama"] = val

    ttl_idx = _anchor_index(tagged, "TTL")
    if ttl_idx is not None:
        raw = _value_forward(tagged, ttl_idx + 1, 5,
                             ["GOL_DARAH", "JK", "ALAMAT"])
        if raw:
            _parse_ttl(raw, out)
    else:
        for line in rows:
            if _ANY_DATE_RX.search(line):
                if line != out.get("Berlaku Sampai"):
                    _parse_ttl(line, out)
                    break

    gd_idx = _anchor_index(tagged, "GOL_DARAH")
    jk_idx = _anchor_index(tagged, "JK")
    # reference quirk preserved: `idx or -1` treats an anchor at row 0
    # as absent
    start = max(gd_idx or -1, jk_idx or -1) + 1
    if start > 0:
        for i in range(start, min(start + 4, len(rows))):
            line = rows[i]
            if is_garbage(line):
                continue
            if identify_field(line) == "ALAMAT":
                break
            blood = line.replace("-", "").strip().upper()
            if blood in ("A", "B", "AB", "O") and "Gol. Darah" not in out:
                out["Gol. Darah"] = blood
            lu = line.upper()
            if "PRIA" in lu or "LAKI" in lu:
                out["Jenis Kelamin"] = "LAKI-LAKI"
            elif "WANITA" in lu or "PEREMPUAN" in lu:
                out["Jenis Kelamin"] = "PEREMPUAN"

    job_idx = _anchor_index(tagged, "PEKERJAAN")
    if job_idx is not None:
        val = _value_forward(tagged, job_idx + 1, 3, ["PENERBIT"])
        if val and not re.search(r"\b\d{2}-\d{2}-20\d{2}\b", val):
            out["Pekerjaan"] = val
    else:
        for line in rows:
            if is_job(line) and not is_garbage(line):
                if "Pekerjaan" not in out:
                    out["Pekerjaan"] = line
                    break

    addr_idx = _anchor_index(tagged, "ALAMAT")
    if addr_idx is not None:
        begin = addr_idx + 1
        # reference quirk preserved: a PEKERJAAN anchor at row 0 is
        # treated as absent for the stop bound
        stop = job_idx if job_idx else len(rows)
        if stop == len(rows):
            for k in range(begin, len(rows)):
                if is_job(rows[k]):
                    stop = k
                    break
        lines: list[str] = []
        for i in range(begin, stop):
            line = rows[i]
            if identify_field(line) in ("PEKERJAAN", "PENERBIT"):
                break
            if any(w in line.upper() for w in
                   ("SATPAS", "POLRES", "POLDA", "KORLANTAS",
                    "METRO JAYA")):
                continue
            if re.search(r"\b\d{2}-\d{2}-20\d{2}\b", line):
                continue
            if not is_garbage(line):
                lines.append(line)
        out["raw_address_lines"] = lines

    return out


# ---------------------------------------------------------------------------
# M12 — address block parser (sim_extractor.py:786-929)
# ---------------------------------------------------------------------------

_RT_PIVOT_RX = re.compile(r"(?:RT|RW|R\.T|R\.W)[\s\.\:]*(\d{1,4})",
                          re.IGNORECASE)
_RT_SEP_RX = re.compile(r"^[\s\/\-\|lI1]+(\d{1,4})", re.IGNORECASE)
_RW_RESIDUE_RX = re.compile(r"^\s*(?:RW|RW\.|W\.|RW:)[\s\.\:]*(\d{1,4})",
                            re.IGNORECASE)
_STREET_STARTS = ("JL", "JALAN", "GG", "GANG", "KP", "KMP", "KOMP",
                  "DUSUN", "DSN", "BLK", "BLOK", "NO", "PERUM", "GRIYA",
                  "PERUMAHAN")


def parse_address_block(address_lines: list[str]) -> dict:
    addr = {"name": None, "rt_rw": None, "kel_desa": None,
            "kecamatan": None, "kabupaten": None, "provinsi": None}
    if not address_lines:
        return addr

    cleaned: list[str] = []
    for line in address_lines:
        line = re.sub(r"^(Alamat|Address)[\s\:\.]*", "", line,
                      flags=re.IGNORECASE).strip()
        line = re.sub(r"^[4]\.\s*", "", line).strip()
        if not line or is_job(line):
            continue
        cleaned.append(line)
    if not cleaned:
        return addr

    city_at = len(cleaned)
    for i in range(len(cleaned) - 1, -1, -1):
        if _is_region_line(cleaned[i].upper()):
            if not addr["kabupaten"]:
                addr["kabupaten"] = clean_sim_kabupaten(cleaned[i])
            city_at = i
            break

    street: list[str] = []
    seen_locality = False

    for i, line in enumerate(cleaned):
        if i >= city_at:
            break
        lu = line.upper()

        if "KEC" in lu and "KECIL" not in lu:
            addr["kecamatan"] = re.sub(
                r"\b(KEC|KECAMATAN)\b\.?", "", line,
                flags=re.IGNORECASE).strip()
            seen_locality = True
            continue

        kel_prefixed = any(
            re.match(rf"^{p}\b", lu) or re.match(rf"^{p}\.", lu)
            for p in ("KEL", "DESA", "DS"))

        pivot = _RT_PIVOT_RX.search(line)
        if pivot:
            seen_locality = True
            prefix = line[:pivot.start()].strip()
            rt_val = pivot.group(1)
            rest = line[pivot.end():]

            rw_val = None
            sep = _RT_SEP_RX.match(rest)
            if sep:
                rw_val = sep.group(1)
                rest = rest[sep.end():]
            else:
                rw = _RW_RESIDUE_RX.search(rest)
                if rw:
                    rw_val = rw.group(1)
                    rest = rest[rw.end():]
            if rw_val is None:
                fixed = split_rtrw_ocr(rt_val, rest)
                if fixed:
                    rt_val, rw_val, rest = fixed

            addr["rt_rw"] = f"{rt_val}/{rw_val}" if rw_val else rt_val

            if kel_prefixed:
                addr["kel_desa"] = re.sub(
                    r"\b(KEL|DESA|DS)\b\.?", "", prefix,
                    flags=re.IGNORECASE).strip()
            elif prefix:
                street.append(prefix)

            rest = rest.strip()
            if len(rest) > 2:
                rest = re.sub(r"^[\-\,\.]+", "", rest).strip()
                if not addr["kel_desa"]:
                    addr["kel_desa"] = rest
                elif not addr["kecamatan"]:
                    addr["kecamatan"] = rest
            continue

        if kel_prefixed:
            addr["kel_desa"] = re.sub(
                r"\b(KEL|DESA|DS)\b\.?", "", line,
                flags=re.IGNORECASE).strip()
            seen_locality = True
            continue

        if not seen_locality:
            if "," in line and not any(
                    lu.startswith(p) for p in _STREET_STARTS):
                first, second = line.split(",", 1)
                if not addr["kel_desa"]:
                    addr["kel_desa"] = first.strip()
                if not addr["kecamatan"]:
                    addr["kecamatan"] = second.strip()
                seen_locality = True
            else:
                street.append(line)
        else:
            if not addr["kel_desa"]:
                addr["kel_desa"] = line
            elif not addr["kecamatan"]:
                addr["kecamatan"] = line
            else:
                addr["kecamatan"] += " " + line

    if street:
        addr["name"] = " ".join(street)
    return addr

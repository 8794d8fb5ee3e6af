"""Synthetic interleaved text+media span corpus (FIXTURES.md §1).

Generates documents with the exact input shape mandated by
BASELINE.json's ``input_hint``:

    documents(doc_id string,
              spans array<struct<kind:string, text:string,
                                 media_ref:string, offset:int>>)

plus a sidecar geometry column (``span_geom``, aligned by index with
``spans``) carrying the synthetic line geometry the spatial operators
need — in production this geometry comes out of the OCR stage; here the
corpus IS the post-OCR view (FIXTURES.md: "text spans carry synthetic
line geometry ... encoded in generator sidecar columns").

Determinism: every document is generated from its own
``random.Random(seed * 1_000_003 + index)`` — independent of partitioning,
order, or scale, so the driver-side test corpus and the distributed
bench corpus are bit-identical per doc_id.

Document grammar mirrors the reference's two card layouts:
- KTP-like (~60%): canonical lines per /root/reference/ktp_extractor.py
  (16 fields), NIK per nik_fuzzy.py:1-16 (valid province code, +40
  female day encoding).
- SIM-like (~30%): LEGACY numbered sections or SMART anchor layout
  (sim_extractor.py:369-477 / 484-616).
- UNKNOWN/noise (~10%).

Noise injection (seeded, bounded): reverse char-substitution from the
confusion tables, NIK digit drops (15-digit repair cases), date
separator corruption ("23 3 1392" style), truncated key labels
(ktp_extractor.py:162-194), known misreads (CEL UM, HARIANCEPAS,
IAKARTA, B0GOR, WNl), split vs inline key/value spans, media-heavy skew
docs (~1% carry 50-100× the median media spans).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from ..dictionaries import (
    KOTA,
    PROVINCES,
    TO_DIGIT,
    TRUNCATED_KEY_MAP,
    VALID_PROVINCE_CODES,
)

SEED = 42

# inverse confusion map: digit -> plausible OCR letter misreads
_DIGIT_TO_LETTERS: dict[str, list[str]] = {}
for letter, digit in TO_DIGIT.items():
    _DIGIT_TO_LETTERS.setdefault(digit, []).append(letter)
for d in _DIGIT_TO_LETTERS:
    _DIGIT_TO_LETTERS[d].sort()

_FIRST_NAMES = [
    "BUDI", "SITI", "AGUS", "DEWI", "ANDI", "RINA", "JOKO", "LESTARI",
    "BAMBANG", "FITRI", "HENDRA", "MAYA", "DIAN", "RUDI", "SARI", "EKO",
    "INDAH", "TONO", "WATI", "YUSUF", "NURUL", "ADI", "RATNA", "IRFAN",
]
_LAST_NAMES = [
    "SANTOSO", "WIJAYA", "SAPUTRA", "HIDAYAT", "KUSUMA", "PRATAMA",
    "SUSANTO", "HARTONO", "NUGROHO", "SETIAWAN", "RAHAYU", "UTAMI",
    "SIREGAR", "NASUTION", "GUNAWAN", "FIRMANSYAH", "MAULANA", "PUTRI",
]
_STREETS = [
    "JL. MERDEKA", "JL. SUDIRMAN", "JL. GATOT SUBROTO", "JL. DIPONEGORO",
    "JL. AHMAD YANI", "JL. PAHLAWAN", "KP. BARU", "DSN. KRAJAN",
    "JL. RAYA BOGOR", "GG. MAWAR",
]
_VILLAGES = [
    "SUKAMAJU", "MEKARSARI", "CIBADAK", "KARANGANYAR", "SUMBEREJO",
    "TANJUNG", "WONOREJO", "SIDOMULYO", "BANJARSARI", "KERTAJAYA",
]
_KECAMATAN = [
    "CILEUNGSI", "GUNUNG PUTRI", "CIBINONG", "BABAKAN MADANG", "CITEUREUP",
    "TAMBUN SELATAN", "SERPONG", "PAMULANG", "BEKASI UTARA", "COBLONG",
]
_AGAMA = ["ISLAM", "KRISTEN", "KATOLIK", "HINDU", "BUDDHA", "KONGHUCU"]
_STATUS = ["BELUM KAWIN", "KAWIN", "CERAI HIDUP", "CERAI MATI"]
_PEKERJAAN = [
    "WIRASWASTA", "PELAJAR/MAHASISWA", "KARYAWAN SWASTA", "PNS", "PETANI",
    "BURUH HARIAN LEPAS", "IBU RUMAH TANGGA", "PEDAGANG", "GURU", "NELAYAN",
]
_GOLDAR = ["A", "B", "AB", "O", "-"]
_PROV_LIST = sorted(PROVINCES)
_KOTA_LIST = sorted(KOTA)
_PROV_CODES = sorted(VALID_PROVINCE_CODES)

SPAN_STRUCT_DDL = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
GEOM_STRUCT_DDL = "array<struct<y:int,x0:int,x1:int,h:int>>"

SPAN_SCHEMA_DDL = (
    "doc_id string, "
    f"spans {SPAN_STRUCT_DDL}, "
    f"span_geom {GEOM_STRUCT_DDL}, "
    "span_conf array<double>, "
    f"spans_alt {SPAN_STRUCT_DDL}, "
    f"alt_geom {GEOM_STRUCT_DDL}"
)


@dataclass
class _Doc:
    """Primary OCR view (spans/geom/conf) plus an optional alternative
    view (alt_*) modelling the reference's re-OCR of the raw image (the
    C3 UNKNOWN retry and the C6 SmartSIM second pass). ``begin_alt()``
    redirects subsequent add_* calls into the alternative view."""

    doc_id: str
    spans: list = field(default_factory=list)   # (kind, text, media_ref, offset)
    geom: list = field(default_factory=list)    # (y, x0, x1, h)
    conf: list = field(default_factory=list)    # per-span OCR confidence
    alt_spans: list = field(default_factory=list)
    alt_geom: list = field(default_factory=list)
    truth: dict = field(default_factory=dict)
    doc_class: str = "KTP"
    conf_range: tuple = (0.88, 0.99)
    _alt: bool = False

    def begin_alt(self) -> None:
        self._alt = True

    def _target(self):
        if self._alt:
            return self.alt_spans, self.alt_geom, None
        return self.spans, self.geom, self.conf

    def add_text(self, text: str, y: int, x0: int, rng: random.Random,
                 h: int = 22, conf: float = None) -> None:
        spans, geom, confs = self._target()
        i = len(spans)
        x1 = x0 + 9 * max(len(text), 1)
        spans.append(("text", text, "", i))
        geom.append((y + rng.randint(0, 4), x0, x1, h))
        if confs is not None:
            confs.append(round(
                rng.uniform(*self.conf_range) if conf is None else conf, 4))

    def add_media(self, tag: str, y: int) -> None:
        spans, geom, confs = self._target()
        i = len(spans)
        spans.append(
            ("media", "", f"media://{self.doc_id}/{tag}/{i}", i)
        )
        geom.append((y, 820, 980, 160))
        if confs is not None:
            confs.append(0.0)


def _noise_digits_to_letters(s: str, rng: random.Random, n: int = 1) -> str:
    """Replace up to n digits with their OCR letter confusions."""
    out = list(s)
    idxs = [i for i, c in enumerate(out) if c in _DIGIT_TO_LETTERS]
    rng.shuffle(idxs)
    for i in idxs[:n]:
        out[i] = rng.choice(_DIGIT_TO_LETTERS[out[i]])
    return "".join(out)


def _make_nik(rng: random.Random) -> tuple[str, str, int, int, int]:
    """Structurally-valid NIK + its encoded (gender, day, month, year)."""
    prov = rng.choice(_PROV_CODES)
    kk = rng.randint(1, 99)
    dd = rng.randint(1, 99)
    day = rng.randint(1, 28)
    month = rng.randint(1, 12)
    year = rng.randint(1940, 2008)
    female = rng.random() < 0.5
    ob = day + 40 if female else day
    seq = rng.randint(1, 9999)
    nik = f"{prov:02d}{kk:02d}{dd:02d}{ob:02d}{month:02d}{year % 100:02d}{seq:04d}"
    return nik, ("PEREMPUAN" if female else "LAKI-LAKI"), day, month, year


def _corrupt_date(date_str: str, rng: random.Random) -> str:
    """DD-MM-YYYY → OCR-ish corruption."""
    roll = rng.random()
    d, m, y = date_str.split("-")
    if roll < 0.3:
        # separator corruption + year century digit misread: 23 3 1392
        y2 = list(y)
        y2[0] = rng.choice("013")
        return f"{d} {int(m)} {''.join(y2)}"
    if roll < 0.5:
        return _noise_digits_to_letters(date_str, rng, 2)
    if roll < 0.7:
        return f"{d}-{m}-{y[1:]}"      # 3-digit year truncation
    if roll < 0.85:
        return date_str.replace("-", " ")
    return f"{d}.{m}.{y}"


def _key_label(canonical: str, rng: random.Random, noise: bool) -> str:
    """Emit the printed key label, optionally garbled to a
    TRUNCATED_KEY_MAP-repairable form."""
    if not noise:
        return canonical
    bads = [b for b, good in TRUNCATED_KEY_MAP.items() if good == canonical]
    if bads and rng.random() < 0.7:
        return rng.choice(bads).title() if rng.random() < 0.3 else rng.choice(bads)
    return canonical


def _gen_ktp(doc: _Doc, rng: random.Random) -> None:
    nik, gender, day, month, year = _make_nik(rng)
    name = f"{rng.choice(_FIRST_NAMES)} {rng.choice(_LAST_NAMES)}"
    prov = rng.choice(_PROV_LIST)
    kab_kind = rng.choice(["KABUPATEN", "KOTA"])
    kab = rng.choice(_KOTA_LIST)
    birth_place = rng.choice(_KOTA_LIST)
    date_str = f"{day:02d}-{month:02d}-{year:04d}"
    goldar = rng.choice(_GOLDAR)
    street = f"{rng.choice(_STREETS)} NO. {rng.randint(1, 99)}"
    rt, rw = rng.randint(1, 20), rng.randint(1, 15)
    village = rng.choice(_VILLAGES)
    kec = rng.choice(_KECAMATAN)
    agama = rng.choice(_AGAMA)
    status = rng.choice(_STATUS)
    job = rng.choice(_PEKERJAAN)

    doc.truth = {
        "document_type": "KTP", "nomor": nik, "nama": name,
        "tempat_lahir": birth_place, "tgl_lahir": date_str,
        "jenis_kelamin": gender, "agama": agama,
        "status_perkawinan": status, "pekerjaan": job,
        "kewarganegaraan": "WNI",
        "alamat.name": street, "alamat.rt_rw": f"{rt:03d}/{rw:03d}",
        "alamat.kel_desa": village, "alamat.kecamatan": kec,
        # header_strip removes the key word itself (ktp_extractor.py:326-331)
        "alamat.kabupaten": kab, "alamat.provinsi": prov,
    }

    noisy = rng.random() < 0.55          # this doc carries noise at all
    split = rng.random() < 0.6           # key/value as separate spans

    y = 10
    doc.add_media("photo", y)

    # headers: key+value in one span (header_strip path K3)
    prov_label = "PROVINSI" if not (noisy and rng.random() < 0.15) else "PRCVINSI"
    doc.add_text(f"{prov_label} {prov}", y, 260, rng)
    y += 30
    kab_txt = f"{kab_kind} {kab}"
    if noisy and rng.random() < 0.12:
        kab_txt = "IAKARTA" if kab == "JAKARTA" else (
            "B0GOR" if kab == "BOGOR" else kab_txt)
        kab_txt = f"{kab_kind} {kab_txt}" if " " not in kab_txt else kab_txt
    doc.add_text(kab_txt, y, 300, rng)
    y += 34

    nik_print = nik
    if noisy:
        r = rng.random()
        if r < 0.25:
            nik_print = _noise_digits_to_letters(nik, rng, rng.randint(1, 2))
        elif r < 0.40:
            nik_print = nik[1:] if rng.random() < 0.5 else nik[:-1]  # 15d
        elif r < 0.50:
            nik_print = f"{nik[:4]} {nik[4:8]} {nik[8:12]} {nik[12:]}"

    def emit(label: str, value: str, y: int, inline_sep: str = " : ") -> None:
        if split:
            doc.add_text(label, y, 20, rng)
            doc.add_text(value, y, 260 + rng.randint(0, 20), rng)
        else:
            doc.add_text(f"{label}{inline_sep}{value}", y, 20, rng)

    emit(_key_label("NIK", rng, noisy), nik_print, y)
    y += 30
    emit(_key_label("Nama", rng, noisy), name, y)
    y += 30

    ttl_val = f"{birth_place}, {date_str}"
    if noisy and rng.random() < 0.45:
        ttl_val = f"{birth_place}, {_corrupt_date(date_str, rng)}"
    emit(_key_label("Tempat/Tgl Lahir", rng, noisy), ttl_val, y)
    y += 30
    emit(_key_label("Jenis Kelamin", rng, noisy), gender, y)
    if rng.random() < 0.8:
        doc.add_text("Gol. Darah", y, 600, rng)
        doc.add_text(goldar, y, 760, rng)
    y += 30

    emit(_key_label("Alamat", rng, noisy), street, y)
    y += 30
    emit(_key_label("RT/RW", rng, noisy),
         f"{rt:03d}/{rw:03d}" if rng.random() < 0.7
         else f"{rt} / {rw}", y)
    y += 30
    emit(_key_label("Kel/Desa", rng, noisy), village, y)
    y += 30
    emit(_key_label("Kecamatan", rng, noisy), kec, y)
    y += 30
    emit(_key_label("Agama", rng, noisy), agama, y)
    y += 30

    status_val = status
    if noisy and status == "BELUM KAWIN" and rng.random() < 0.35:
        status_val = rng.choice(["CEL UM KAWIN", "SEL UM KAWIN",
                                 "BELUIERAWIN"])
    emit(_key_label("Status Perkawinan", rng, noisy), status_val, y)
    y += 30

    job_val = job
    if noisy and job == "BURUH HARIAN LEPAS" and rng.random() < 0.5:
        job_val = rng.choice(["BURUH HARIANCEPAS", "DURUH HARIAN LEPAS",
                              "CURLH HARIAN LEPAS", "BURUHHARIAN LEPAS"])
    emit(_key_label("Pekerjaan", rng, noisy), job_val, y)
    y += 30

    wni = "WNI" if not (noisy and rng.random() < 0.3) else rng.choice(
        ["WNl", "WN1", "WN"])
    emit(_key_label("Kewarganegaraan", rng, noisy), wni, y)
    y += 30
    emit("Berlaku Hingga", "SEUMUR HIDUP", y)
    y += 30

    # media skew tail
    n_extra = 1 if rng.random() < 0.3 else 0
    if rng.random() < 0.01:  # media-heavy skew doc
        n_extra = rng.randint(50, 100)
    for k in range(n_extra):
        doc.add_media("sig", y + 30 * k)


def _emit_sim_layout(doc: _Doc, rng: random.Random, v: dict,
                     legacy: bool, drop: frozenset = frozenset(),
                     media: bool = True) -> None:
    """Emit one OCR view of a SIM card into the doc's current target.
    ``drop`` removes value lines to model a weaker OCR pass (drives the
    C6 completeness gate)."""
    y = 10
    if media:
        doc.add_media("photo", y)
    doc.add_text("INDONESIA", y, 300, rng)
    y += 28
    doc.add_text("SURAT IZIN MENGEMUDI", y, 220, rng)
    y += 28
    doc.add_text(f"SIM A {v['simno']}", y, 240, rng)
    y += 30
    if legacy:
        if "name" not in drop:
            doc.add_text(f"1. {v['name']}", y, 30, rng); y += 28
        if "ttl" not in drop:
            doc.add_text(f"2. {v['birth_place']}, {v['date_str']}",
                         y, 30, rng); y += 28
        if "jk" not in drop:
            doc.add_text(f"3. {v['goldar']} - {v['jk_word']}",
                         y, 30, rng); y += 28
        if "addr" not in drop:
            doc.add_text(f"4. {v['street']}", y, 30, rng); y += 26
            doc.add_text(
                f"RT {v['rt']:02d} RW {v['rw']:02d} {v['village']}",
                y, 40, rng); y += 26
            doc.add_text(f"KEC. {v['kec']} KOTA {v['kab']}",
                         y, 40, rng); y += 28
        if "job" not in drop:
            doc.add_text(f"5. {v['job']}", y, 30, rng); y += 28
        if "city6" not in drop:
            doc.add_text(f"6. {v['city6']}", y, 30, rng); y += 28
    else:
        if "name" not in drop:
            doc.add_text("Nama", y, 30, rng)
            doc.add_text(v["name"], y, 200, rng); y += 28
        if "ttl" not in drop:
            doc.add_text("Tempat & Tgl. Lahir", y, 30, rng)
            doc.add_text(f"{v['birth_place']}, {v['date_str']}",
                         y, 240, rng); y += 28
        if "jk" not in drop:
            doc.add_text("Gol. Darah - Jenis Kelamin", y, 30, rng)
            doc.add_text(f"{v['goldar']} - {v['jk_word']}",
                         y, 300, rng); y += 28
        if "addr" not in drop:
            doc.add_text("Alamat", y, 30, rng)
            doc.add_text(v["street"], y, 200, rng); y += 26
            doc.add_text(
                f"RT. {v['rt']:02d} RW. {v['rw']:02d} "
                f"KEL. {v['village']}", y, 200, rng)
            y += 26
            doc.add_text(f"KEC. {v['kec']} KOTA {v['kab']}",
                         y, 200, rng); y += 28
        if "job" not in drop:
            doc.add_text("Pekerjaan", y, 30, rng)
            doc.add_text(v["job"], y, 200, rng); y += 28
    if "expiry" not in drop:
        doc.add_text(f"BERLAKU SAMPAI {v['expiry']}", y, 30, rng)
        y += 28
    doc.add_text("POLDA METRO JAYA", y, 30, rng)
    y += 28
    if media and rng.random() < 0.2:
        doc.add_media("sig", y)


def _gen_sim(doc: _Doc, rng: random.Random) -> None:
    nik, gender, day, month, year = _make_nik(rng)
    v = {
        "name": f"{rng.choice(_FIRST_NAMES)} {rng.choice(_LAST_NAMES)}",
        "birth_place": rng.choice(_KOTA_LIST),
        "date_str": f"{day:02d}-{month:02d}-{year:04d}",
        "simno": (f"{rng.randint(1000, 9999)}-{rng.randint(1000, 9999)}-"
                  f"{rng.randint(10000, 999999)}"),
        "expiry": (f"{rng.randint(1, 28):02d}-{rng.randint(1, 12):02d}-"
                   f"{rng.randint(2022, 2029)}"),
        "street": f"{rng.choice(_STREETS)} NO. {rng.randint(1, 99)}",
        "rt": rng.randint(1, 20), "rw": rng.randint(1, 15),
        "village": rng.choice(_VILLAGES),
        "kec": rng.choice(_KECAMATAN),
        "kab": rng.choice(_KOTA_LIST),
        "job": rng.choice(_PEKERJAAN),
        "goldar": rng.choice(["A", "B", "AB", "O"]),
        "jk_word": "PRIA" if gender == "LAKI-LAKI" else "WANITA",
        "city6": rng.choice(_KOTA_LIST),
    }
    legacy = rng.random() < 0.5

    truth_full = {
        "document_type": "SIM", "nomor": v["simno"], "nama": v["name"],
        "tempat_lahir": v["birth_place"], "tgl_lahir": v["date_str"],
        "jenis_kelamin": v["jk_word"], "pekerjaan": v["job"],
        "berlaku_sampai": v["expiry"],
        "alamat.name": v["street"],
        "alamat.rt_rw": f"{v['rt']:02d}/{v['rw']:02d}",
        "alamat.kel_desa": v["village"], "alamat.kecamatan": v["kec"],
        "alamat.kabupaten": f"KOTA {v['kab']}",
    }
    doc.truth = truth_full
    doc.doc_class = "SIM"

    # C6 two-pass scenarios (document_processor.py:421-440)
    scenario = rng.random()
    if not legacy:
        # SMART version — the gate always fires; the second (SmartSIM-
        # preprocessed) view is the cleaner one, sometimes recovering a
        # value line the standard pass missed
        drop_std = frozenset({"job"}) if scenario < 0.4 else frozenset()
        _emit_sim_layout(doc, rng, v, legacy=False, drop=drop_std)
        doc.begin_alt()
        _emit_sim_layout(doc, rng, v, legacy=False, media=False)
    elif scenario < 0.55:
        # plain legacy card, single view
        _emit_sim_layout(doc, rng, v, legacy=True)
    elif scenario < 0.75:
        # weak std pass (completeness 3.0 < 4.0: name + address lines
        # lost) + good raw re-pass — the gate keeps the second pass and
        # back-fills from the first
        _emit_sim_layout(doc, rng, v, legacy=True,
                         drop=frozenset({"name", "addr"}))
        doc.begin_alt()
        _emit_sim_layout(doc, rng, v, legacy=True, media=False)
    elif scenario < 0.88:
        # weak std pass (3.0) but the re-pass is even worse (1.0) —
        # gate runs the second pass and keeps std
        _emit_sim_layout(doc, rng, v, legacy=True,
                         drop=frozenset({"name", "addr"}))
        doc.begin_alt()
        _emit_sim_layout(doc, rng, v, legacy=True, media=False,
                         drop=frozenset({"ttl", "job", "expiry",
                                         "city6"}))
        doc.truth = {k: val for k, val in truth_full.items()
                     if k in ("document_type", "nomor", "tempat_lahir",
                              "tgl_lahir", "jenis_kelamin",
                              "pekerjaan", "berlaku_sampai")}
    else:
        # full std pass but low OCR confidence (C2 mean < 0.70) — the
        # conf term of the gate fires; both views complete → merge
        doc.conf_range = (0.40, 0.65)
        _emit_sim_layout(doc, rng, v, legacy=True)
        doc.begin_alt()
        _emit_sim_layout(doc, rng, v, legacy=True, media=False)


def _gen_unknown(doc: _Doc, rng: random.Random) -> None:
    doc.truth = {"document_type": "UNKNOWN"}
    doc.doc_class = "UNKNOWN"
    y = 10
    if rng.random() < 0.5:
        doc.add_media("img", y)
    lines = rng.randint(2, 6)
    words = ["STRUK", "BELANJA", "TOKO", "TOTAL", "TERIMA", "KASIH",
             "KASIR", "DISKON", "HARGA", "NOTA", "MEMBER", "POIN"]
    for k in range(lines):
        n = rng.randint(2, 5)
        doc.add_text(" ".join(rng.choice(words) for _ in range(n)),
                     y + 30 * (k + 1), 30, rng)
    # C3 UNKNOWN retry (document_processor.py:279-287): the quick pass
    # saw only junk, but re-OCR of the raw image reveals a real KTP —
    # the retry reclassifies and processes the raw view
    if rng.random() < 0.35:
        doc.begin_alt()
        _gen_ktp(doc, rng)            # emits into the alt view
        doc.doc_class = "KTP_VIA_RETRY"


def generate_doc(index: int, seed: int = SEED,
                 fractions: tuple[float, float, float] = (0.6, 0.3, 0.1)
                 ) -> _Doc:
    """Build one document deterministically from (seed, index)."""
    rng = random.Random(seed * 1_000_003 + index)
    doc = _Doc(doc_id=f"doc-{index:08d}")
    roll = rng.random()
    ktp_f, sim_f, _ = fractions
    if roll < ktp_f:
        _gen_ktp(doc, rng)
    elif roll < ktp_f + sim_f:
        _gen_sim(doc, rng)
    else:
        _gen_unknown(doc, rng)
    return doc


def _span_dicts(spans):
    return [{"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in spans]


def _geom_dicts(geom):
    return [{"y": y, "x0": x0, "x1": x1, "h": h}
            for (y, x0, x1, h) in geom]


def doc_rows(n_docs: int, seed: int = SEED,
             fractions: tuple[float, float, float] = (0.6, 0.3, 0.1),
             start: int = 0):
    """Yield (doc_id, spans, span_geom, span_conf, spans_alt, alt_geom)
    tuples for Spark createDataFrame or pandas construction."""
    for i in range(start, start + n_docs):
        d = generate_doc(i, seed=seed, fractions=fractions)
        yield (d.doc_id, _span_dicts(d.spans), _geom_dicts(d.geom),
               list(d.conf), _span_dicts(d.alt_spans),
               _geom_dicts(d.alt_geom))


def corpus_df(spark, n_docs: int, seed: int = SEED,
              fractions: tuple[float, float, float] = (0.6, 0.3, 0.1),
              partitions: int | None = None):
    """Distributed corpus: one row per doc, generated on executors via
    mapInPandas over an index range — scales to any n_docs without
    driver materialization."""
    import pandas as pd

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    idx = spark.range(0, n_docs, 1, parts)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                d = generate_doc(int(i), seed=seed, fractions=fractions)
                rows.append((
                    d.doc_id, _span_dicts(d.spans), _geom_dicts(d.geom),
                    list(d.conf), _span_dicts(d.alt_spans),
                    _geom_dicts(d.alt_geom),
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "spans", "span_geom",
                               "span_conf", "spans_alt", "alt_geom"])

    return idx.mapInPandas(gen, schema=SPAN_SCHEMA_DDL)

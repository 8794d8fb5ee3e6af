"""Golden tests for the two-pass machinery: C6 std↔smart SIM merge
(document_processor.py:421-440), C5 completeness gate weights (:208-219),
merge_sim_data (:221-236), C2 OCR confidence (:67-71) and the C3 UNKNOWN
retry (:279-287). Pure-kernel tests — no Spark session needed."""

from __future__ import annotations

import random

from indonesian_id_ocr_service_spark.corpus.generator import (
    _Doc,
    _emit_sim_layout,
)
from indonesian_id_ocr_service_spark.operators import sim_core
from indonesian_id_ocr_service_spark.oracle import ktp as ktp_oracle

_V = {
    "name": "BUDI SANTOSO", "birth_place": "MEDAN",
    "date_str": "01-02-1990", "simno": "1234-5678-901234",
    "expiry": "01-01-2025", "street": "JL. MAWAR NO. 1",
    "rt": 1, "rw": 2, "village": "SUKAMAJU", "kec": "CIBINONG",
    "kab": "BOGOR", "job": "KARYAWAN SWASTA", "goldar": "A",
    "jk_word": "PRIA", "city6": "DEPOK",
}


def _view(v=None, legacy=True, drop=()):
    doc = _Doc(doc_id="t")
    _emit_sim_layout(doc, random.Random(7), v or _V, legacy=legacy,
                     drop=frozenset(drop), media=False)
    texts = [t for (k, t, m, o) in doc.spans if k == "text"]
    items = [
        {"text": t, "x0": g[1], "h": g[3], "y_center": (2 * g[0] + g[3]) / 2}
        for (k, t, m, o), g in zip(doc.spans, doc.geom) if k == "text"
    ]
    return texts, items


def test_sim_completeness_weights():
    full = {"Nama": "X", "Nomor SIM": "1", "Tanggal Lahir": "01-01-2000",
            "Pekerjaan": "P", "Berlaku Sampai": "01-01-2030",
            "alamat": {"kabupaten": "K", "kel_desa": "D", "name": "J"}}
    assert sim_core.sim_completeness(full) == 6.0
    assert sim_core.sim_completeness({}) == 0.0
    assert sim_core.sim_completeness({"Nama": "X"}) == 1.5
    # kabupaten OR street name → a single 1.0
    assert sim_core.sim_completeness({"alamat": {"name": "J"}}) == 1.0
    assert sim_core.sim_completeness(
        {"alamat": {"name": "J", "kabupaten": "K"}}) == 1.0


def test_merge_sim_data_coalesce():
    prim = {"Nama": "A", "Nomor SIM": None,
            "alamat": {"name": "JL. A", "rt_rw": None}}
    fall = {"Nama": "B", "Nomor SIM": "123", "Pekerjaan": "P",
            "alamat": {"name": "JL. B", "rt_rw": "01/02",
                       "kel_desa": "D"}}
    m = sim_core.merge_sim_data(prim, fall)
    assert m["Nama"] == "A"                 # primary wins
    assert m["Nomor SIM"] == "123"          # gap filled
    assert m["Pekerjaan"] == "P"
    assert m["alamat"]["name"] == "JL. A"   # address key-wise
    assert m["alamat"]["rt_rw"] == "01/02"
    assert m["alamat"]["kel_desa"] == "D"
    assert sim_core.merge_sim_data({}, fall) == fall
    assert sim_core.merge_sim_data(prim, {}) == prim


def _alt_v():
    v2 = dict(_V)
    v2["name"] = "RINA WATI"
    return v2


def test_gate_not_fired_on_complete_confident_std():
    texts, items = _view()
    alt_t, alt_i = _view(_alt_v())
    out = sim_core.process_sim_doc(texts, items, alt_t, alt_i,
                                   ocr_conf=0.95)
    assert out["nama"] == "BUDI SANTOSO"    # second pass never ran


def test_gate_low_completeness_merges_better_alt():
    texts, items = _view(drop={"name", "addr"})       # score 3.0
    alt_t, alt_i = _view(_alt_v())                    # full
    out = sim_core.process_sim_doc(texts, items, alt_t, alt_i,
                                   ocr_conf=0.95)
    assert out["nama"] == "RINA WATI"                 # alt won
    assert out["alamat.name"] == "JL. MAWAR NO. 1"    # alt's address
    assert out["alamat.rt_rw"] == "01/02"


def test_gate_low_completeness_keeps_std_over_worse_alt():
    texts, items = _view(drop={"name", "addr"})               # 3.0
    alt_t, alt_i = _view(_alt_v(),
                         drop={"ttl", "job", "expiry", "city6"})  # 1.0
    out = sim_core.process_sim_doc(texts, items, alt_t, alt_i,
                                   ocr_conf=0.95)
    assert out["nama"] is None            # std kept; its name was lost
    assert out["alamat.name"] is None


def test_gate_conf_below_070_fires_with_full_std():
    texts, items = _view()
    alt_t, alt_i = _view(_alt_v())
    out = sim_core.process_sim_doc(texts, items, alt_t, alt_i,
                                   ocr_conf=0.69)
    assert out["nama"] == "RINA WATI"     # conf term fired the gate


def test_gate_smart_version_always_fires():
    texts, items = _view(legacy=False)
    alt_t, alt_i = _view(_alt_v(), legacy=False)
    out = sim_core.process_sim_doc(texts, items, alt_t, alt_i,
                                   ocr_conf=0.95)
    out_alt_only = sim_core.process_sim_doc(alt_t, alt_i)
    # SMART ⇒ the second pass ran; primary-wins means every non-null
    # field of the alt-only extraction must appear verbatim
    for k, val in out_alt_only.items():
        if val:
            assert out[k] == val


def _junk_spans():
    spans = [{"kind": "text", "text": "STRUK BELANJA TOKO", "media_ref": "",
              "offset": 0},
             {"kind": "media", "text": "", "media_ref": "media://x/img/1",
              "offset": 1}]
    geom = [{"y": 10, "x0": 0, "x1": 100, "h": 22},
            {"y": 40, "x0": 0, "x1": 100, "h": 160}]
    return spans, geom


def _ktp_spans():
    lines = ["PROVINSI DKI JAKARTA", "KARTU TANDA PENDUDUK",
             "NIK : 3171014502900001", "Nama : SITI AMINAH",
             "Kewarganegaraan : WNI"]
    spans = [{"kind": "text", "text": t, "media_ref": "", "offset": i}
             for i, t in enumerate(lines)]
    geom = [{"y": 10 + 30 * i, "x0": 0, "x1": 9 * len(t), "h": 22}
            for i, t in enumerate(lines)]
    return spans, geom


def test_c3_unknown_retry_recovers_ktp():
    spans, geom = _junk_spans()
    alt, alt_geom = _ktp_spans()
    out = ktp_oracle.process_document("d1", spans, geom, alt, alt_geom)
    fields = {s["kind"]: s["text"] for s in out}
    assert "error" not in {s["kind"] for s in out}
    assert fields["field:document_type"] == "KTP"
    assert fields["field:nomor"] == "3171014502900001"
    # media pass-through comes from the consumed (raw) view
    assert not any(s["media_ref"] == "media://x/img/1" for s in out)


def test_c3_unknown_stays_unknown_without_alt():
    spans, geom = _junk_spans()
    out = ktp_oracle.process_document("d2", spans, geom)
    assert out[0]["kind"] == "error"
    assert out[-1]["media_ref"] == "media://x/img/1"


def test_c2_conf_mean_over_text_spans_only():
    # SIM std view + a media span; conf list parallels ALL spans but the
    # mean must ignore the media entry (rec_scores are per text box)
    texts, items = _view()
    spans = [{"kind": "text", "text": t, "media_ref": "", "offset": i}
             for i, t in enumerate(texts)]
    geom = [{"y": 10 + 28 * i, "x0": 30, "x1": 300, "h": 22}
            for i in range(len(texts))]
    spans.append({"kind": "media", "text": "",
                  "media_ref": "media://d/photo/99",
                  "offset": len(spans)})
    geom.append({"y": 900, "x0": 820, "x1": 980, "h": 160})
    alt, alt_geom = _view(_alt_v())
    alt_spans = [{"kind": "text", "text": t, "media_ref": "", "offset": i}
                 for i, t in enumerate(alt)]
    ag = [{"y": 10 + 28 * i, "x0": 30, "x1": 300, "h": 22}
          for i in range(len(alt_spans))]
    # text confs all 0.70 (gate must NOT fire: mean == 0.70, not < 0.70);
    # the media span's 0.0 would drag the mean to fire it if counted
    conf = [0.70] * (len(spans) - 1) + [0.0]
    out = ktp_oracle.process_document("d3", spans, geom, alt_spans, ag,
                                      conf)
    nama = [s["text"] for s in out if s["kind"] == "field:nama"]
    assert nama == ["BUDI SANTOSO"]

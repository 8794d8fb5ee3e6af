"""Unit tests for the pure-numpy P1-P13 image ops (operators/image_ops)
against hand-derived values and reference-semantics properties
(/root/reference/image_preprocessor.py)."""

from __future__ import annotations

import numpy as np

from indonesian_id_ocr_service_spark.operators import image_ops as I


def test_p1_laplacian_exact_hand_values():
    img = np.zeros((3, 3), dtype=np.uint8)
    img[1, 1] = 255
    # reflect-101 border: responses are center -1020, edge-mids +510,
    # corners 0 → variance = (1020² + 4·510²)/9 − ((−1020+4·510)/9)²
    assert abs(I.laplacian_variance(img) - 218355.5555555556) < 1e-6
    assert I.laplacian_variance(np.full((10, 10), 77, np.uint8)) == 0.0


def test_p2_p3_assessment():
    img = np.full((4, 4), 50, np.uint8)
    mean, std = I.brightness_contrast(img)
    assert (mean, std) == (50.0, 0.0)
    fl = I.quality_flags(0.0, 50.0, 0.0)
    assert fl == {"is_blurry": True, "is_very_blurry": True,
                  "is_dark": True, "is_overexposed": False,
                  "is_low_contrast": True}
    assert I.quality_flags(100.0, 120.0, 40.0) == {
        "is_blurry": False, "is_very_blurry": False, "is_dark": False,
        "is_overexposed": False, "is_low_contrast": False}


def test_p4_unsharp_identity_on_flat_and_sharpens_edges():
    flat = np.full((16, 16), 90, np.uint8)
    assert np.array_equal(I.unsharp_mask(flat), flat)
    card = I.synth_card(bg=120, n_stripes=4, blur_k=3)
    sharp = I.unsharp_mask(card)
    assert I.laplacian_variance(sharp) > I.laplacian_variance(card)


def test_p5_clahe_near_identity_on_flat_and_stretches_contrast():
    # tiles need realistic pixel counts for the clip limit to bite the
    # way cv2's does (clipLimit·tile_px/256); 256² → 32×32-px tiles
    flat = np.full((256, 256), 120, np.uint8)
    out = I.clahe_gray(flat)
    assert np.abs(out.astype(int) - 120).max() <= 3
    low = I.synth_card(bg=120, n_stripes=8, fg=100,
                       h=256, w=256)                  # weak contrast
    eq = I.clahe_gray(low)
    assert eq.std() > low.std()


def test_p6_resize_dims_and_flat_preservation():
    img = np.full((64, 96), 137, np.uint8)
    up = I.resize_keep_aspect(img, 192)
    assert up.shape == (128, 192)
    assert np.all(up == 137)
    down = I.resize_keep_aspect(img, 48)
    assert down.shape == (32, 48)
    assert np.all(down == 137)
    assert I.resize_keep_aspect(img, 96) .shape == (64, 96)


def test_p7_pad_border_values():
    img = np.full((3, 3), 9, np.uint8)
    out = I.pad_border(img, px=2)
    assert out.shape == (7, 7)
    assert out[0, 0] == 255 and out[-1, -1] == 255
    assert np.all(out[2:5, 2:5] == 9)


def test_p9_rotate90_directions():
    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    assert np.array_equal(I.rotate90(img, 90),
                          np.array([[3, 1], [4, 2]]))       # clockwise
    assert np.array_equal(I.rotate90(img, 180),
                          np.array([[4, 3], [2, 1]]))
    assert np.array_equal(I.rotate90(img, 270),
                          np.array([[2, 4], [1, 3]]))
    assert np.array_equal(I.rotate90(img, 0), img)


def test_p8_orientation_heuristic():
    portrait = np.zeros((40, 20), np.uint8)
    assert I.orient_landscape(portrait).shape == (20, 40)
    landscape = np.zeros((20, 40), np.uint8)
    assert I.orient_landscape(landscape).shape == (20, 40)


def test_p11_deskew_recovers_known_skew():
    skewed = I.synth_card(bg=200, n_stripes=6, h=128, w=192,
                          skew_deg=3.0)
    est = I.estimate_skew(skewed)
    assert abs(est - 3.0) <= 0.75
    fixed = I.deskew(skewed)
    assert abs(I.estimate_skew(fixed)) <= 1.0
    straight = I.synth_card(bg=200, n_stripes=6, h=128, w=192)
    # |angle| < 0.5° → returned unchanged (same object contract not
    # required; content must be identical)
    assert np.array_equal(I.deskew(straight), straight)


def test_p12_p13_composed_shapes():
    portrait = I.synth_card(bg=120, n_stripes=6, h=96, w=48)
    out = I.minimal_ktp(portrait)
    # orient → 48×96 → resize to w=1000 → 500×1000 → pad 20 each side
    assert out.shape == (540, 1040)
    assert out[0, 0] == 255
    sim = I.smart_sim(I.synth_card(bg=120, n_stripes=6, h=64, w=96))
    assert sim.shape[1] == 1640          # 1600 + 2·20
    assert sim.shape[0] > 40


def test_img1_roundtrip_and_rejects():
    img = I.synth_card(bg=120, n_stripes=3)
    assert np.array_equal(I.decode_img1(I.encode_img1(img)), img)
    assert I.decode_img1(b"not an image") is None
    assert I.decode_img1(None) is None
    assert I.decode_img1(I.encode_img1(img)[:-5]) is None  # truncated


def test_p10_perspective_recovers_tilted_card():
    # bright card quad embedded in a dark frame with real perspective
    card = I.synth_card(bg=200, n_stripes=5, h=60, w=100)
    frame = np.full((160, 200), 10, np.uint8)
    src_quad = np.array([[0, 0], [99, 0], [99, 59], [0, 59]], float)
    # strongly trapezoidal (top edge ≪ bottom edge → w_ratio < 0.85)
    # with a card-like average aspect, so the reference's should_warp
    # gate fires
    dst_quad = np.array([[60, 30], [140, 34], [166, 118], [30, 112]],
                        float)
    m = I._homography(dst_quad, src_quad)
    yy, xx = np.mgrid[0:160, 0:200].astype(float)
    den = m[2, 0] * xx + m[2, 1] * yy + 1.0
    sx = (m[0, 0] * xx + m[0, 1] * yy + m[0, 2]) / den
    sy = (m[1, 0] * xx + m[1, 1] * yy + m[1, 2]) / den
    inside = (sx >= 0) & (sx <= 99) & (sy >= 0) & (sy <= 59)
    ix = np.clip(np.rint(sx).astype(int), 0, 99)
    iy = np.clip(np.rint(sy).astype(int), 0, 59)
    frame[inside] = card[iy[inside], ix[inside]]

    quad = I.find_card_quad(frame)
    assert quad is not None
    out = I.perspective_correct(frame)
    # upright again: no dark frame corners, card-like aspect, stripes
    # horizontal (deskew estimate ~0)
    assert out.shape != frame.shape
    assert out[2, 2] > 150 and out[-3, -3] > 150
    assert 1.2 < out.shape[1] / out.shape[0] < 2.2
    assert abs(I.estimate_skew(out)) <= 1.0


def test_p10_passthrough_when_full_frame_or_no_card():
    full = I.synth_card(bg=200, n_stripes=5, h=64, w=96)
    assert np.array_equal(I.perspective_correct(full), full)
    dark = np.full((64, 96), 12, np.uint8)
    assert np.array_equal(I.perspective_correct(dark), dark)


def test_p10_gate_skips_near_rectangular_quads():
    # a merely translated (rectangular) card must NOT be warped —
    # should_warp requires >15% opposite-edge disparity
    frame = np.full((160, 200), 10, np.uint8)
    frame[40:100, 50:150] = 200
    assert I.find_card_quad(frame) is not None
    assert not I.should_warp(I.find_card_quad(frame))
    assert np.array_equal(I.perspective_correct(frame), frame)

"""Pure-numpy image preprocessing ops (SURVEY §2.2 P1-P13).

Real implementations of the reference's quality assessment and
preprocessing math (/root/reference/image_preprocessor.py) for the ops
that don't require cv2-only machinery:

- P1 Laplacian-variance blur score      (:14-18)
- P2 brightness / contrast              (:20-30)
- P3 quality flags                      (:32-46)
- P4 unsharp mask                       (:53-57)
- P5 CLAHE (grayscale)                  (:60-69)
- P6 resize keep-aspect (bilinear)      (:93-99)
- P7 constant-border padding            (:143-149)
- P8 orientation (text-direction heuristic; the reference's face
  cascade needs cv2 data files)         (:177-201)
- P9 90° rotations                      (:204-209)
- P10 perspective correction: intensity-segmented corner quad →
  four-point homography warp (the reference walks Canny contours;
  same decision contract incl. the ≥95%-frame and min-area guards)
  (:212-242)
- P11 deskew: dominant text-line angle within ±15°, rotate when the
  weighted estimate ≥0.5° (projection-profile estimator standing in
  for HoughLinesP — same decision semantics)  (:268-308)
- P12 minimal KTP path: orient → resize(1000) → pad(20)   (:152-174)
- P13 SmartSIM path: perspective → deskew → CLAHE → unsharp →
  resize(1600) → pad  (:344-488)

Images are grayscale uint8 ndarrays. The wire format for payload
columns is IMG1: b"IMG1" + uint16be h + uint16be w + h·w uint8 pixels —
a deterministic synthetic stand-in for JPEG (decoders aren't in this
container), so the full decode → assess → preprocess chain runs on real
pixel math end-to-end.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = [
    "encode_img1", "decode_img1", "synth_card",
    "laplacian_variance", "brightness_contrast", "quality_flags",
    "unsharp_mask", "clahe_gray", "resize_keep_aspect", "pad_border",
    "orient_landscape", "rotate90", "estimate_skew", "rotate",
    "deskew", "minimal_ktp", "smart_sim",
    "find_card_quad", "four_point_transform", "perspective_correct",
]

_MAGIC = b"IMG1"


# ---------------------------------------------------------------------------
# wire format + deterministic synthesis
# ---------------------------------------------------------------------------


def encode_img1(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    return _MAGIC + struct.pack(">HH", h, w) + img.tobytes()


def decode_img1(payload: bytes):
    """→ ndarray, or None when the payload isn't IMG1."""
    if payload is None or len(payload) < 8 or payload[:4] != _MAGIC:
        return None
    h, w = struct.unpack(">HH", payload[4:8])
    if len(payload) != 8 + h * w:
        return None
    return np.frombuffer(payload, dtype=np.uint8, offset=8).reshape(h, w)


def box_blur(img: np.ndarray, k: int) -> np.ndarray:
    """k×k box filter with reflect-101 borders (separable, integral)."""
    if k <= 1:
        return img.copy()
    r = k // 2
    x = np.pad(img.astype(np.float64), r, mode="reflect")
    x = np.cumsum(x, axis=0)
    x = (np.vstack([x[k - 1:k], x[k:] - x[:-k]])) / k
    x = np.cumsum(x, axis=1)
    x = (np.hstack([x[:, k - 1:k], x[:, k:] - x[:, :-k]])) / k
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def synth_card(bg: int, n_stripes: int, h: int = 64, w: int = 96,
               fg: int = 20, blur_k: int = 0,
               skew_deg: float = 0.0) -> np.ndarray:
    """Deterministic card-like test image: uniform background with
    ``n_stripes`` 2-px dark text lines; optional box blur and skew."""
    img = np.full((h, w), bg, dtype=np.uint8)
    for i in range(n_stripes):
        y = int((i + 1) * h / (n_stripes + 1))
        img[y:y + 2, 4:w - 4] = fg
    if abs(skew_deg) > 1e-9:
        img = rotate(img, skew_deg)
    if blur_k > 1:
        img = box_blur(img, blur_k)
    return img


# ---------------------------------------------------------------------------
# P1-P3: quality assessment
# ---------------------------------------------------------------------------


def laplacian_variance(img: np.ndarray) -> float:
    """P1: variance of the 4-neighbour Laplacian (cv2.Laplacian's
    default 3×3 kernel [[0,1,0],[1,-4,1],[0,1,0]], reflect-101)."""
    x = np.pad(img.astype(np.float64), 1, mode="reflect")
    lap = (x[:-2, 1:-1] + x[2:, 1:-1] + x[1:-1, :-2] + x[1:-1, 2:]
           - 4.0 * x[1:-1, 1:-1])
    return float(lap.var())


def brightness_contrast(img: np.ndarray) -> tuple:
    """P2: (mean, std) of gray pixels."""
    f = img.astype(np.float64)
    return float(f.mean()), float(f.std())


def quality_flags(blur: float, brightness: float, contrast: float) -> dict:
    """P3 thresholds (image_preprocessor.py:32-46)."""
    return {
        "is_blurry": blur < 80,
        "is_very_blurry": blur < 30,
        "is_dark": brightness < 60,
        "is_overexposed": brightness > 210,
        "is_low_contrast": contrast < 30,
    }


# ---------------------------------------------------------------------------
# P4-P5: enhancement
# ---------------------------------------------------------------------------


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    r = max(1, int(math.ceil(3.0 * sigma)))
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    k /= k.sum()
    f = img.astype(np.float64)
    p = np.pad(f, ((r, r), (0, 0)), mode="reflect")
    f = sum(k[i] * p[i:i + img.shape[0], :] for i in range(2 * r + 1))
    p = np.pad(f, ((0, 0), (r, r)), mode="reflect")
    f = sum(k[i] * p[:, i:i + img.shape[1]] for i in range(2 * r + 1))
    return f


def unsharp_mask(img: np.ndarray, sigma: float = 1.0,
                 strength: float = 1.5) -> np.ndarray:
    """P4 (image_preprocessor.py:53-57): img·(1+s) − blur·s, clipped."""
    blurred = _gaussian_blur(img, sigma)
    sharp = img.astype(np.float64) * (1.0 + strength) - blurred * strength
    return np.clip(np.rint(sharp), 0, 255).astype(np.uint8)


def clahe_gray(img: np.ndarray, clip_limit: float = 3.0,
               grid: int = 8) -> np.ndarray:
    """P5: contrast-limited adaptive histogram equalization on gray
    (the reference applies it to LAB-L; single-channel here). Tile
    histograms clipped at clip_limit×(tile_px/256), excess
    redistributed, per-tile CDF mappings bilinearly interpolated."""
    h, w = img.shape
    gh = gw = grid
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    luts = np.zeros((gh, gw, 256), dtype=np.float64)
    for i in range(gh):
        for j in range(gw):
            tile = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            n = max(tile.size, 1)
            hist = np.bincount(tile.ravel(), minlength=256).astype(
                np.float64)
            limit = max(1.0, clip_limit * n / 256.0)
            excess = np.clip(hist - limit, 0, None).sum()
            hist = np.minimum(hist, limit) + excess / 256.0
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(np.rint(cdf * 255.0 / n), 0, 255)
    cy = (ys[:-1] + ys[1:]) / 2.0
    cx = (xs[:-1] + xs[1:]) / 2.0
    yy = np.arange(h, dtype=np.float64)[:, None]
    xx = np.arange(w, dtype=np.float64)[None, :]
    iy = np.clip(np.searchsorted(cy, yy.ravel()) - 1, 0, gh - 2)
    ix = np.clip(np.searchsorted(cx, xx.ravel()) - 1, 0, gw - 2)
    iy = iy.reshape(h, 1)
    ix = ix.reshape(1, w)
    fy = np.clip((yy - cy[iy]) / np.maximum(cy[iy + 1] - cy[iy], 1e-9),
                 0, 1)
    fx = np.clip((xx - cx[ix]) / np.maximum(cx[ix + 1] - cx[ix], 1e-9),
                 0, 1)
    v = img.astype(np.intp)
    t00 = luts[iy, ix, v]
    t01 = luts[iy, ix + 1, v]
    t10 = luts[iy + 1, ix, v]
    t11 = luts[iy + 1, ix + 1, v]
    out = ((1 - fy) * ((1 - fx) * t00 + fx * t01)
           + fy * ((1 - fx) * t10 + fx * t11))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# P6-P9: geometry
# ---------------------------------------------------------------------------


def resize_keep_aspect(img: np.ndarray, target_width: int) -> np.ndarray:
    """P6 (image_preprocessor.py:93-99): bilinear resample to the target
    width, preserving aspect (the reference picks Lanczos4 for
    downscale; bilinear keeps the math dependency-free)."""
    h, w = img.shape
    if w == target_width:
        return img.copy()
    scale = target_width / w
    nh, nw = max(1, int(round(h * scale))), target_width
    ys = (np.arange(nh) + 0.5) / scale - 0.5
    xs = (np.arange(nw) + 0.5) / scale - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    f = img.astype(np.float64)
    out = ((1 - fy) * ((1 - fx) * f[np.ix_(y0, x0)]
                       + fx * f[np.ix_(y0, x1)])
           + fy * ((1 - fx) * f[np.ix_(y1, x0)]
                   + fx * f[np.ix_(y1, x1)]))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def pad_border(img: np.ndarray, px: int = 20, value: int = 255
               ) -> np.ndarray:
    """P7 (image_preprocessor.py:143-149): constant white border."""
    return np.pad(img, px, mode="constant", constant_values=value)


def rotate90(img: np.ndarray, angle: int) -> np.ndarray:
    """P9 (image_preprocessor.py:204-209): exact 90° rotations.
    angle ∈ {0, 90, 180, 270}, clockwise like cv2.ROTATE_*."""
    if angle == 90:
        return np.rot90(img, k=-1).copy()
    if angle == 180:
        return np.rot90(img, k=2).copy()
    if angle == 270:
        return np.rot90(img, k=1).copy()
    return img


def orient_landscape(img: np.ndarray) -> np.ndarray:
    """P8: portrait → landscape. The reference picks among 0/90/180/270
    by face detection (cv2 cascade data); without it, cards are
    landscape documents — rotate when taller than wide."""
    h, w = img.shape
    return rotate90(img, 90) if h > w else img


def rotate(img: np.ndarray, deg: float) -> np.ndarray:
    """Arbitrary-angle rotation around the center, bilinear sampling,
    replicate borders (cv2.warpAffine BORDER_REPLICATE equivalent)."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rad = math.radians(deg)
    c, s = math.cos(rad), math.sin(rad)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # inverse map: output → input
    sy = cy + (yy - cy) * c - (xx - cx) * s
    sx = cx + (yy - cy) * s + (xx - cx) * c
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(sy - y0, 0, 1)
    fx = np.clip(sx - x0, 0, 1)
    f = img.astype(np.float64)
    out = ((1 - fy) * ((1 - fx) * f[y0, x0] + fx * f[y0, x1])
           + fy * ((1 - fx) * f[y1, x0] + fx * f[y1, x1]))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# P11: deskew
# ---------------------------------------------------------------------------


def estimate_skew(img: np.ndarray, max_deg: float = 15.0,
                  step: float = 0.25) -> float:
    """Dominant text-line angle via projection profiles: the reference
    (image_preprocessor.py:268-308) averages HoughP segment angles
    within ±15°; rotating the text-pixel coordinates and maximizing the
    variance of the row-projection finds the same dominant direction.
    Works on the central 60% ROI like the reference."""
    h, w = img.shape
    my, mx = int(h * 0.2), int(w * 0.2)
    roi = img[my:h - my, mx:w - mx]
    if roi.size == 0:
        return 0.0
    f = roi.astype(np.float64)
    thr = f.mean() - 0.5 * f.std()
    ys, xs = np.nonzero(f < thr)
    if ys.size < 8:
        return 0.0
    ysf = ys.astype(np.float64)
    xsf = xs.astype(np.float64) - (roi.shape[1] - 1) / 2.0
    best_a, best_v = 0.0, -1.0
    for a in np.arange(-max_deg, max_deg + 1e-9, step):
        rad = math.radians(a)
        ry = ysf * math.cos(rad) - xsf * math.sin(rad)
        rows = np.bincount(np.rint(ry - ry.min()).astype(int))
        v = float((rows.astype(np.float64) ** 2).sum())
        if v > best_v:
            best_v, best_a = v, float(a)
    return best_a


def deskew(img: np.ndarray) -> np.ndarray:
    """P11: correct by the estimated angle when |angle| ≥ 0.5° (the
    reference's decision threshold, image_preprocessor.py:303-308).
    estimate_skew(rotate(x, α)) == α, so the correction is −α."""
    a = estimate_skew(img)
    if abs(a) < 0.5:
        return img
    return rotate(img, -a)


# ---------------------------------------------------------------------------
# P12 / P13: composed paths
# ---------------------------------------------------------------------------


def minimal_ktp(img: np.ndarray) -> np.ndarray:
    """P12 (image_preprocessor.py:152-174): orient → resize(1000) →
    pad(20) — the authoritative non-destructive KTP path."""
    return pad_border(resize_keep_aspect(orient_landscape(img), 1000), 20)


def smart_sim(img: np.ndarray) -> np.ndarray:
    """P13 (image_preprocessor.py:344-488) minus the P10 perspective
    warp: orient → deskew → CLAHE → unsharp → resize(1600) → pad."""
    x = orient_landscape(img)
    x = deskew(x)
    x = clahe_gray(x)
    x = unsharp_mask(x, sigma=1.0, strength=1.5)
    x = resize_keep_aspect(x, 1600)
    return pad_border(x, 20)


# ---------------------------------------------------------------------------
# P10: perspective (geometric) correction
# ---------------------------------------------------------------------------


def find_card_quad(img: np.ndarray, min_area_ratio: float = 0.05):
    """Locate the card's corner quad (image_preprocessor.py:212-242).
    The reference walks Canny+dilate contours for a 4-point polygon;
    here the card is segmented by intensity (documents are bright on a
    darker background) and the corners are the foreground points
    extremal in (x+y) and (x−y) — the classic order_points corners.
    Returns 4×2 float array (TL, TR, BR, BL) or None (no quad, too
    small, or already near-full-frame — the reference's ≥95% guard)."""
    h, w = img.shape
    f = img.astype(np.float64)
    thr = f.mean() + 0.25 * f.std()
    ys, xs = np.nonzero(f > thr)
    if ys.size < h * w * min_area_ratio:
        return None
    bw = xs.max() - xs.min() + 1
    bh = ys.max() - ys.min() + 1
    if bw > 0.95 * w and bh > 0.95 * h:
        return None
    s = xs + ys
    d = xs - ys
    tl = (xs[s.argmin()], ys[s.argmin()])
    br = (xs[s.argmax()], ys[s.argmax()])
    tr = (xs[d.argmax()], ys[d.argmax()])
    bl = (xs[d.argmin()], ys[d.argmin()])
    return np.array([tl, tr, br, bl], dtype=np.float64)


def _homography(dst_pts: np.ndarray, src_pts: np.ndarray) -> np.ndarray:
    """DLT solve of the 8-parameter projective map dst → src."""
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i, ((x, y), (xs, ys)) in enumerate(zip(dst_pts, src_pts)):
        a[2 * i] = [x, y, 1, 0, 0, 0, -x * xs, -y * xs]
        b[2 * i] = xs
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -x * ys, -y * ys]
        b[2 * i + 1] = ys
    p = np.linalg.solve(a, b)
    return np.array([[p[0], p[1], p[2]],
                     [p[3], p[4], p[5]],
                     [p[6], p[7], 1.0]])


def four_point_transform(img: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Warp the quad (TL, TR, BR, BL) to an axis-aligned rectangle sized
    by the longer opposite edges, bilinear sampling with clamp borders
    (the cv2 four_point_transform recipe in numpy)."""
    tl, tr, br, bl = pts
    wa = np.hypot(*(br - bl))
    wb = np.hypot(*(tr - tl))
    ha = np.hypot(*(tr - br))
    hb = np.hypot(*(tl - bl))
    out_w = max(2, int(round(max(wa, wb))))
    out_h = max(2, int(round(max(ha, hb))))
    dst = np.array([[0, 0], [out_w - 1, 0],
                    [out_w - 1, out_h - 1], [0, out_h - 1]], float)
    m = _homography(dst, pts)
    yy, xx = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    den = m[2, 0] * xx + m[2, 1] * yy + 1.0
    sx = (m[0, 0] * xx + m[0, 1] * yy + m[0, 2]) / den
    sy = (m[1, 0] * xx + m[1, 1] * yy + m[1, 2]) / den
    h, w = img.shape
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    f = img.astype(np.float64)
    out = ((1 - fy) * ((1 - fx) * f[y0, x0] + fx * f[y0, x1])
           + fy * ((1 - fx) * f[y1, x0] + fx * f[y1, x1]))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def should_warp(pts: np.ndarray) -> bool:
    """The reference's plausibility gate (image_preprocessor.py:245-265):
    warp only when the quad is materially non-rectangular (opposite
    edges differ >15%) AND its average aspect ratio is card-like
    (1.2 < w/h < 2.0). Near-rectangular quads pass through untouched."""
    tl, tr, br, bl = pts
    top_w = np.linalg.norm(tr - tl)
    bot_w = np.linalg.norm(br - bl)
    left_h = np.linalg.norm(bl - tl)
    right_h = np.linalg.norm(br - tr)
    w_ratio = min(top_w, bot_w) / (max(top_w, bot_w) + 1e-6)
    h_ratio = min(left_h, right_h) / (max(left_h, right_h) + 1e-6)
    if w_ratio < 0.85 or h_ratio < 0.85:
        avg_w = (top_w + bot_w) / 2
        avg_h = (left_h + right_h) / 2
        if avg_h == 0:
            return False
        ar = avg_w / avg_h
        if 1.2 < ar < 2.0:
            return True
    return False


def perspective_correct(img: np.ndarray) -> np.ndarray:
    """P10: find the card quad and warp it upright when the reference's
    gate says so; pass the image through unchanged otherwise — the
    geometric_correction contract (image_preprocessor.py:212-242)."""
    pts = find_card_quad(img)
    if pts is None or not should_warp(pts):
        return img
    return four_point_transform(img, pts)

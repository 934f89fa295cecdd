"""Pure-numpy pixel-domain figure operators (SURVEY.md F1-F5, F8).

The reference implements these with OpenCV at 300-dpi page renders
(``/root/reference/scripts/extract_images.py:27-42`` constants,
``:208-230`` contour crop, ``:45-55`` IoU, ``:84-205`` bbox expansion,
``:264-274`` duplicate suppression, ``:300-330`` keep/skip
heuristics). This container has no cv2/PIL, so each operator is
re-derived deterministically on uint8 numpy arrays:

- Canny+dilate+findContours  →  gradient-magnitude threshold + binary
  dilation (shifted ORs) + flood-fill connected components. Same
  downstream contract: candidate bounding boxes filtered by
  MIN_CONTOUR_AREA / MIN_CONTOUR_HEIGHT.
- cv2.matchTemplate(TM_CCOEFF_NORMED) at equal sizes  →  Pearson
  correlation after nearest-neighbour resize (mathematically the same
  statistic at the single alignment the reference evaluates).
- The LLM ``code_bool`` screen is replaced by the deterministic code
  detector (``core.classify``), consistent with the engine-wide A2
  substitution.

All thresholds keep the reference's names and defaults, scaled where
they are resolution-bound (the reference assumes 300-dpi pages; the
``scale`` parameter maps them to thumbnail-sized fixtures).
"""

from __future__ import annotations

import numpy as np

# extract_images.py:27-42 (reference defaults, 300-dpi page space)
MIN_CONTOUR_AREA = 15_000
MIN_CONTOUR_HEIGHT = 120
OVERLAP_IOU_THRESHOLD = 0.3
EDGE_THRESHOLD = 50          # CANNY_LOW — single-threshold analogue
DILATE_KERNEL_SIZE = 5
DILATE_ITER = 2
STEP_PIXELS = 2
MAX_EXPANSION_PIXELS = 400
OPEN_AREA_CONTRAST_THRESHOLD = 2
OPEN_AREA_PIXEL_STREAK = 60
DUP_SIMILARITY = 0.8         # _make_saver: matchTemplate > 0.8 skips

# _process_image heuristics (extract_images.py:300-316)
TEXT_LEN_MAX = 250
LINE_RATIO_MAX = 20
AVG_WORD_LEN_MAX = 3
ADMIN_WORDS = ("format", "words:", "maks poeng:")
SMALL_SUM = 800
SMALL_SIDE = 280
LARGE_SIDE = 2800
MIN_SAMPLED_COLORS = 10


def to_gray(px: np.ndarray) -> np.ndarray:
    """(h, w[, ch]) u8 -> (h, w) u8 luminance. ch ∈ {1, 2, 3, 4}:
    2 = gray+alpha (alpha dropped), 4 = RGBA (alpha dropped)."""
    if px.ndim == 2:
        return px
    if px.shape[2] in (1, 2):
        return px[:, :, 0]
    rgb = px[:, :, :3].astype(np.float64)
    return (rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)


def edge_mask(gray: np.ndarray, threshold: int = EDGE_THRESHOLD) -> np.ndarray:
    """Gradient-magnitude edge detection (Canny analogue: single
    threshold on max(|dx|, |dy|), no hysteresis — deterministic and
    sufficient for box-shaped figure regions)."""
    g = gray.astype(np.int16)
    dy = np.abs(np.diff(g, axis=0, prepend=g[:1]))
    dx = np.abs(np.diff(g, axis=1, prepend=g[:, :1]))
    return np.maximum(dx, dy) >= threshold


def dilate(mask: np.ndarray, k: int = DILATE_KERNEL_SIZE, iters: int = DILATE_ITER) -> np.ndarray:
    """Binary dilation with a k×k kernel via shifted ORs."""
    r = k // 2
    out = mask.copy()
    for _ in range(iters):
        acc = out.copy()
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy == 0 and dx == 0:
                    continue
                shifted = np.zeros_like(out)
                ys = slice(max(dy, 0), out.shape[0] + min(dy, 0))
                yd = slice(max(-dy, 0), out.shape[0] + min(-dy, 0))
                xs = slice(max(dx, 0), out.shape[1] + min(dx, 0))
                xd = slice(max(-dx, 0), out.shape[1] + min(-dx, 0))
                shifted[yd, xd] = out[ys, xs]
                acc |= shifted
        out = acc
    return out


def connected_components(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components of a bool mask -> bounding boxes
    (x, y, w, h), in deterministic scan order (top-left first).
    Iterative flood fill — fine at figure-fixture scale."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    boxes: list[tuple[int, int, int, int]] = []
    for sy in range(h):
        row = mask[sy] & ~seen[sy]
        for sx in np.flatnonzero(row):
            if seen[sy, sx]:
                continue
            stack = [(sy, int(sx))]
            seen[sy, sx] = True
            y0 = y1 = sy
            x0 = x1 = int(sx)
            while stack:
                cy, cx = stack.pop()
                y0, y1 = min(y0, cy), max(y1, cy)
                x0, x1 = min(x0, cx), max(x1, cx)
                for ny in range(max(cy - 1, 0), min(cy + 2, h)):
                    for nx in range(max(cx - 1, 0), min(cx + 2, w)):
                        if mask[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
            boxes.append((x0, y0, x1 - x0 + 1, y1 - y0 + 1))
    return boxes


def bbox_iou(b1, b2) -> float:
    """Intersection-over-union of (x, y, w, h) boxes
    (extract_images.py:45-55, same arithmetic)."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    xa, ya = max(x1, x2), max(y1, y2)
    xb = min(x1 + w1, x2 + w2)
    yb = min(y1 + h1, y2 + h2)
    inter = max(0, xb - xa) * max(0, yb - ya)
    if inter == 0:
        return 0.0
    union = w1 * h1 + w2 * h2 - inter
    return inter / union


def iou_filter(boxes, threshold: float = OVERLAP_IOU_THRESHOLD):
    """Largest-first overlap suppression (extract_images.py:220-227):
    keep a box only if its IoU with every already-kept box ≤ threshold."""
    filtered: list = []
    for b in sorted(boxes, key=lambda b: (-(b[2] * b[3]), b)):
        if any(bbox_iou(b, fb) > threshold for fb in filtered):
            continue
        filtered.append(b)
    return filtered


def _band_colors(region: np.ndarray) -> int:
    """Distinct color count of a band (``_contrast_value``,
    extract_images.py:64-67): 0 for uniform bands."""
    flat = region.reshape(-1, region.shape[-1]) if region.ndim == 3 else region.reshape(-1, 1)
    if flat.size == 0:
        return 0
    uniq = np.unique(flat, axis=0)
    return 0 if len(uniq) <= 1 else len(uniq)


def expand_bbox(
    px: np.ndarray,
    bbox: tuple[int, int, int, int],
    *,
    step: int = STEP_PIXELS,
    max_expand: int = MAX_EXPANSION_PIXELS,
    open_threshold: int = OPEN_AREA_CONTRAST_THRESHOLD,
    open_streak: int = OPEN_AREA_PIXEL_STREAK,
) -> tuple[int, int, int, int]:
    """Grow a crop box outward until it hits open page area
    (extract_images.py:84-205, the OPEN-AREA rule: a streak of
    low-contrast bands ≥ ``open_streak`` px stops expansion at the
    last contentful edge; the reference's color-type secondary rule is
    subsumed — uniform color bands are exactly contrast < threshold).
    bbox/returns are (x, y, w, h)."""
    h, w = px.shape[:2]
    x0, y0 = bbox[0], bbox[1]
    x1, y1 = bbox[0] + bbox[2], bbox[1] + bbox[3]

    for direction in ("left", "right", "top", "bottom"):
        streak = 0
        last_solid = (x0, y0, x1, y1)
        cur = (x0, y0, x1, y1)
        for i in range(step, max_expand + step, step):
            if direction == "left":
                n = max(0, x0 - i)
                if n == cur[0]:
                    break
                band = px[y0:y1, n : n + step]
                cur = (n, y0, x1, y1)
            elif direction == "right":
                n = min(w, x1 + i)
                if n == cur[2]:
                    break
                band = px[y0:y1, n - step : n]
                cur = (x0, y0, n, y1)
            elif direction == "top":
                n = max(0, y0 - i)
                if n == cur[1]:
                    break
                band = px[n : n + step, x0:x1]
                cur = (x0, n, x1, y1)
            else:
                n = min(h, y1 + i)
                if n == cur[3]:
                    break
                band = px[n - step : n, x0:x1]
                cur = (x0, y0, x1, n)
            if _band_colors(band) < open_threshold:
                if streak == 0:
                    last_solid = prev if i > step else (x0, y0, x1, y1)
                streak += step
                if streak >= open_streak:
                    cur = last_solid
                    break
            else:
                streak = 0
            prev = cur
        x0, y0, x1, y1 = cur
    return (x0, y0, x1 - x0, y1 - y0)


def detect_crops(
    px: np.ndarray,
    *,
    scale: float = 1.0,
    expand: bool = True,
) -> list[tuple[int, int, int, int]]:
    """F1 contour crop (extract_images.py:208-230): edge mask → dilate
    → components → area/height screen → IoU suppression → expansion.
    ``scale`` maps the 300-dpi thresholds to smaller fixtures
    (area scales with scale², lengths with scale)."""
    gray = to_gray(px)
    mask = dilate(edge_mask(gray))
    boxes = connected_components(mask)
    min_area = MIN_CONTOUR_AREA * scale * scale
    min_height = MIN_CONTOUR_HEIGHT * scale
    boxes = [b for b in boxes if b[2] * b[3] >= min_area and b[3] >= min_height]
    boxes = iou_filter(boxes)
    if expand:
        streak = max(2, int(OPEN_AREA_PIXEL_STREAK * scale))
        max_exp = max(2, int(MAX_EXPANSION_PIXELS * scale))
        boxes = [
            expand_bbox(px, b, open_streak=streak, max_expand=max_exp) for b in boxes
        ]
        boxes = iou_filter(boxes)
    return boxes


def resize_nearest(px: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = np.linspace(0, px.shape[0] - 1, h).round().astype(int)
    xs = np.linspace(0, px.shape[1] - 1, w).round().astype(int)
    return px[np.ix_(ys, xs)]


def image_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of grayscales after resizing ``a`` to ``b``'s
    shape — cv2.matchTemplate(TM_CCOEFF_NORMED) at the single equal-size
    alignment the reference evaluates (extract_images.py:264-274)."""
    ga = to_gray(a).astype(np.float64)
    gb = to_gray(b).astype(np.float64)
    ga = resize_nearest(ga, gb.shape[0], gb.shape[1])
    ga -= ga.mean()
    gb = gb - gb.mean()
    denom = np.sqrt((ga * ga).sum() * (gb * gb).sum())
    if denom == 0:
        return 1.0 if np.allclose(ga, gb) else 0.0
    return float((ga * gb).sum() / denom)


def keep_skip_decision(
    text: str,
    px: np.ndarray,
    *,
    attempt: int = 0,
    scale: float = 1.0,
) -> tuple[str, str]:
    """F4 keep/skip heuristics (extract_images.py:296-330): returns
    (action, reason) with action in {"keep", "crop", "skip"}.

    ``text`` plays the OCR-text role (here: the figure's span/alt
    text); the LLM code screen is the deterministic ``looks_like_code``
    detector. Size bounds scale with the fixture resolution."""
    from .classify import looks_like_code

    h, w = px.shape[:2]
    ratio = len(text) / (text.count("\n") + 1)
    import re as _re

    words = _re.findall(r"\b[a-zA-ZæøåÆØÅ0-9]+\b", text)
    words = [_re.sub(r"(.)\1{2,}", r"\1", x) for x in words]
    avg_word_len = sum(len(x) for x in words) / len(words) if words else 0

    len_bool = len(text) > TEXT_LEN_MAX
    ratio_bool = ratio > LINE_RATIO_MAX
    avg_bool = avg_word_len > AVG_WORD_LEN_MAX
    admin_bool = any(wd in text.lower() for wd in ADMIN_WORDS)
    small = (h + w) < SMALL_SUM * scale or h < SMALL_SIDE * scale or w < SMALL_SIDE * scale
    large = h > LARGE_SIDE * scale or w > LARGE_SIDE * scale
    sampled = px[:: max(1, h // 100), :: max(1, w // 100)]
    color_poor = _band_colors(sampled) < MIN_SAMPLED_COLORS
    code = looks_like_code(text)

    if small or color_poor or code or attempt >= 5:
        reason = (
            "small_size" if small
            else "color" if color_poor
            else "code" if code
            else "attempt_limit"
        )
        return "skip", reason
    if (avg_bool and (len_bool or ratio_bool)) or admin_bool or large:
        reason = (
            "text_contents" if avg_bool and (len_bool or ratio_bool)
            else "admin_text" if admin_bool
            else "large_size"
        )
        return "crop", reason
    return "keep", ""

"""Pixel-domain figure extraction stage (SURVEY.md F1-F5, F8 — the
cv2-free re-expression of ``/root/reference/scripts/extract_images.py``).

``FigureCrops`` is an actor-pool ``map_batches`` stage over rows with a
PNG/IMG1 ``payload`` column:

1. decode (stdlib ``core.png``; IMG1 synthetic header)       [decode]
2. top-level keep/skip heuristics on the alt/span text       [F4]
3. "crop" verdicts run the contour pass: edge → dilate →
   components → area/height screen → IoU suppression →
   open-area bbox expansion                                   [F1-F3]
4. kept crops are near-dup-suppressed within the source image
   (Pearson ≥ 0.8 after resize — matchTemplate analogue)      [F5]
5. survivors are rendered back to real PNG bytes              [F8]

Batches stay small (wide binary rows); per-actor state is just the
compiled code-detector tables touched in ``__init__``. Partitioning
assumption: one page image decodes in one worker (they are page-sized,
not dataset-sized).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..core import imageops as ops
from ..core.jpeg import decode_jpeg, is_jpeg
from ..core.png import decode_png, is_png

CROPS_SCHEMA = pa.schema(
    [
        ("fig_id", pa.int64()),
        ("crop_index", pa.int32()),
        ("action", pa.string()),   # keep | crop | skip
        ("reason", pa.string()),   # skip/crop cause ("" for keep)
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("saved", pa.bool_()),     # False = suppressed as near-dup / skipped
        ("crop_png", pa.large_binary()),  # b"" when not saved
    ]
)


def _decode(payload: bytes) -> np.ndarray | None:
    """payload -> gray (h, w) or RGB (h, w, 3) u8, or None when the
    bytes cannot be decoded (unsupported PNG flavor, truncated data,
    unknown format) — the caller maps None to a 'skip/undecodable' row
    rather than failing the whole actor batch (review finding r2)."""
    if is_png(payload):
        try:
            _w, _h, ch, px = decode_png(payload)
        except Exception:  # any undecodable flavor -> skip row, not a crash
            return None
        if px.ndim == 3:
            if px.shape[2] == 1:
                return px[:, :, 0]
            if px.shape[2] == 2:  # gray+alpha: drop alpha
                return px[:, :, 0]
            if px.shape[2] == 4:  # RGBA: drop alpha
                return np.ascontiguousarray(px[:, :, :3])
        return px
    if is_jpeg(payload):
        try:
            _w, _h, ch, px = decode_jpeg(payload)
        except Exception:  # progressive/damaged -> skip row, not a crash
            return None
        return px  # (h, w) gray or (h, w, 3) RGB, u8 — caller-ready
    if payload[:4] == b"IMG1":
        if len(payload) < 8:  # truncated header -> skip row, not a crash
            return None
        w, h = struct.unpack("<HH", payload[4:8])
        body = payload[8 : 8 + w * h]
        if len(body) < w * h:
            return None
        return np.frombuffer(body, np.uint8).reshape(h, w)
    return None


class FigureCrops:
    """Actor-pool figure extraction; ``scale`` maps the reference's
    300-dpi thresholds to the fixture resolution (see core.imageops)."""

    def __init__(self, scale: float = 0.1):
        from ..core import classify  # compile detector tables once per actor

        del classify
        self.scale = scale

    def _rows_for(self, fid: int, alt: str, payload: bytes):
        px = _decode(payload)
        if px is None:
            return [(fid, 0, "skip", "undecodable", 0, 0, 0, 0, False, b"")]
        h, w = px.shape[:2]
        action, reason = ops.keep_skip_decision(alt, px, scale=self.scale)
        if action == "keep":
            from ..core.png import encode_png

            return [(fid, 0, "keep", "", 0, 0, w, h, True, encode_png(px))]
        if action == "skip":
            return [(fid, 0, "skip", reason, 0, 0, w, h, False, b"")]
        # action == "crop": contour pass, then per-crop screen + dedup
        from ..core.png import encode_png

        rows = []
        kept_pixels: list[np.ndarray] = []
        for ci, (x, y, cw, ch) in enumerate(ops.detect_crops(px, scale=self.scale)):
            sub = px[y : y + ch, x : x + cw]
            sub_action, sub_reason = ops.keep_skip_decision(
                "", sub, attempt=1, scale=self.scale
            )
            if sub_action != "keep":
                rows.append((fid, ci, "skip", sub_reason or "sub_crop", x, y, cw, ch, False, b""))
                continue
            if any(
                ops.image_similarity(sub, prev) > ops.DUP_SIMILARITY
                for prev in kept_pixels
            ):
                rows.append((fid, ci, "skip", "duplicate", x, y, cw, ch, False, b""))
                continue
            kept_pixels.append(sub)
            rows.append((fid, ci, "keep", reason, x, y, cw, ch, True, encode_png(sub)))
        if not rows:
            rows.append((fid, 0, "skip", "no_crops", 0, 0, w, h, False, b""))
        return rows

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for fid, alt, payload in zip(
            t["fig_id"].to_pylist(),
            t["alt_text"].to_pylist() if "alt_text" in t.column_names else [""] * t.num_rows,
            t["payload"].to_pylist(),
        ):
            rows.extend(self._rows_for(fid, alt or "", payload))
        cols = list(zip(*rows)) if rows else [[] for _ in CROPS_SCHEMA]
        arrays = [pa.array(list(c), type=f.type) for c, f in zip(cols, CROPS_SCHEMA)]
        return pa.Table.from_arrays(arrays, schema=CROPS_SCHEMA)


def figure_crops(ds, *, scale: float = 0.1, batch_size: int = 16, concurrency=2):
    """figures Dataset -> crops Dataset (small batches: wide rows)."""
    return ds.map_batches(
        FigureCrops,
        fn_constructor_kwargs=dict(scale=scale),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

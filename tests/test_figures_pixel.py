"""Pixel-domain figure operators (core/imageops.py, stages/figures.py):
contour crop recovery, IoU suppression, bbox expansion, keep/skip
heuristics, near-dup suppression, PNG crop render."""

import numpy as np
import pytest

from ocracle_ray.core import imageops as ops
from ocracle_ray.core.png import decode_png
from ocracle_ray.sources.figures import synth_figure_image, synth_figures_table
from ocracle_ray.stages.figures import FigureCrops, figure_crops


def test_bbox_iou_reference_arithmetic():
    assert ops.bbox_iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert ops.bbox_iou((0, 0, 10, 10), (20, 20, 5, 5)) == 0.0
    # half overlap: inter 50, union 150
    assert ops.bbox_iou((0, 0, 10, 10), (5, 0, 10, 10)) == pytest.approx(50 / 150)


def test_iou_filter_keeps_largest_first():
    big = (0, 0, 100, 100)
    inside = (10, 10, 50, 50)  # IoU 2500/10000 = 0.25 <= 0.3: kept
    overlapping = (5, 5, 95, 95)  # high IoU with big: dropped
    out = ops.iou_filter([inside, overlapping, big])
    assert big in out and inside in out and overlapping not in out


def test_detect_crops_recovers_synthetic_figures():
    for i in range(8):
        px, truth = synth_figure_image(i)
        crops = ops.detect_crops(px, scale=0.1)
        assert len(crops) == len(truth)
        for t in truth:
            assert any(ops.bbox_iou(t, c) > 0.5 for c in crops)


def test_expand_bbox_stops_at_open_area():
    # a dark block on a uniform page: expansion must not swallow the page
    px = np.full((120, 120), 245, np.uint8)
    px[40:70, 40:80] = 90
    out = ops.expand_bbox(px, (45, 45, 30, 20), open_streak=6, max_expand=60)
    x, y, w, h = out
    assert 30 <= x <= 45 and 30 <= y <= 45
    assert x + w <= 90 and y + h <= 80  # stopped near the block edge


def test_keep_skip_small_and_color():
    tiny = np.full((10, 10), 100, np.uint8)
    assert ops.keep_skip_decision("tekst", tiny, scale=0.1) == ("skip", "small_size")
    flat = np.full((60, 60), 100, np.uint8)  # big enough but 1 color
    assert ops.keep_skip_decision("tekst", flat, scale=0.1) == ("skip", "color")


def test_keep_skip_code_and_admin_and_text():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 255, (60, 60), dtype=np.uint8)
    code = "def main() { int x = 0; if (x == 0) { return x; } } // kommentar"
    assert ops.keep_skip_decision(code, px, scale=0.1)[1] == "code"
    admin = "Maks poeng: 10\nformat\nwords: 120"
    assert ops.keep_skip_decision(admin, px, scale=0.1) == ("crop", "admin_text")
    long_line = "ordene " * 60  # one long line: high ratio + avg len
    assert ops.keep_skip_decision(long_line, px, scale=0.1) == ("crop", "text_contents")
    assert ops.keep_skip_decision("Figur 1\nkort\ntekst", px, scale=0.1) == ("keep", "")


def test_attempt_limit_skips():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 255, (60, 60), dtype=np.uint8)
    assert ops.keep_skip_decision("x", px, attempt=5, scale=0.1) == (
        "skip",
        "attempt_limit",
    )


def test_image_similarity_dup_vs_distinct():
    px, _ = synth_figure_image(0)
    assert ops.image_similarity(px, px) == pytest.approx(1.0)
    assert ops.image_similarity(px, px[::-1].copy()) < ops.DUP_SIMILARITY
    other, _ = synth_figure_image(3)
    assert ops.image_similarity(px, other) < ops.DUP_SIMILARITY


def test_figure_crops_stage_actions_and_png_roundtrip():
    out = FigureCrops()(synth_figures_table(8)).to_pandas()
    acts = set(zip(out["action"], out["reason"]))
    assert ("skip", "code") in acts
    assert ("keep", "") in acts  # full-image keep
    assert ("keep", "text_contents") in acts  # contour-crop keeps
    # every saved crop is a decodable PNG whose size matches its bbox
    saved = out[out["saved"]]
    assert len(saved) > 0
    for _, r in saved.iterrows():
        w, h, _ch, _px = decode_png(r["crop_png"])
        assert (w, h) == (r["w"], r["h"])
    # unsaved rows carry no payload
    assert (out.loc[~out["saved"], "crop_png"].map(len) == 0).all()


def test_figure_crops_alpha_png_and_undecodable():
    """Review r2: gray+alpha / RGBA PNGs decode (alpha dropped); PNGs
    the stdlib decoder rejects become 'skip/undecodable' rows instead
    of crashing the actor batch."""
    import pyarrow as pa

    from ocracle_ray.core.png import encode_png

    rng = np.random.RandomState(3)
    ga = rng.randint(0, 255, (60, 60, 4), dtype=np.uint8)  # RGBA
    gray_alpha = np.dstack(
        [rng.randint(0, 255, (60, 60), dtype=np.uint8)] * 1
        + [np.full((60, 60), 255, np.uint8)]
    )
    # hand-build a gray+alpha (ctype 4) PNG via the encoder's ctype map
    # is not possible (it maps ch=2 to nothing), so craft it directly
    import struct as _struct
    import zlib as _zlib

    h, w = 60, 60
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0)
    rows = b"".join(b"\x00" + gray_alpha[r].tobytes() for r in range(h))

    def chunk(name, body):
        return (
            _struct.pack(">I", len(body)) + name + body
            + _struct.pack(">I", _zlib.crc32(name + body) & 0xFFFFFFFF)
        )

    from ocracle_ray.core.png import PNG_SIGNATURE

    ga_png = (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(rows)) + chunk(b"IEND", b"")
    )
    bad = bytearray(encode_png(rng.randint(0, 255, (8, 8), dtype=np.uint8)))
    bad[8 + 8 + 8] = 16  # depth byte -> 16-bit: stdlib decoder rejects

    t = pa.table(
        {
            "fig_id": pa.array([1, 2, 3], pa.int64()),
            "alt_text": pa.array(["Figur\nx\ny"] * 3, pa.string()),
            "payload": pa.array(
                [encode_png(ga), ga_png, bytes(bad)], pa.large_binary()
            ),
        }
    )
    out = FigureCrops()(t).to_pandas()
    by_id = out.set_index("fig_id")
    assert by_id.loc[1, "action"] in ("keep", "crop", "skip")  # no crash
    assert by_id.loc[2, "action"] in ("keep", "crop", "skip")
    assert by_id.loc[3, "action"] == "skip"
    assert by_id.loc[3, "reason"] == "undecodable"


def test_figure_crops_deterministic_across_parallelism():
    import ray.data as rd

    t = synth_figures_table(12)
    a = (
        figure_crops(rd.from_arrow(t), batch_size=4, concurrency=2)
        .to_pandas()
        .sort_values(["fig_id", "crop_index"])
        .reset_index(drop=True)
    )
    b = (
        figure_crops(rd.from_arrow(t).repartition(6), batch_size=2, concurrency=1)
        .to_pandas()
        .sort_values(["fig_id", "crop_index"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_figure_pixel_crops_query_stable():
    from ocracle_ray.pipelines.queries import QUERIES

    a = QUERIES["figure_pixel_crops"]("/root/testdata/sf0.001")
    b = QUERIES["figure_pixel_crops"]("/root/testdata/sf0.001")
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert a["n_crops"].sum() >= 24

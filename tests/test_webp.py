"""Stdlib WebP lossless (VP8L) codec tests.

Roundtrips cover the encoder's fixture profile (literals, greedy
distance-1 LZ77, subtract-green, palette with and without bundling);
the decoder-only paths — predictor and color transforms, the color
cache, the 2-D distance neighborhood map — are exercised by white-box
streams built from the module's own bit-writer primitives with the
expected pixels computed by an independent forward model in the test.
"""

import struct

import numpy as np
import pytest

from ocracle_ray.core.webp import (
    _BitWriter,
    _code_for,
    _color_cache_hash,
    _emit,
    _encode_image_body,
    _prefix_encode,
    decode_webp,
    encode_webp,
    is_webp,
)


def _wrap(payload: bytes) -> bytes:
    riff_size = 4 + 8 + len(payload) + (len(payload) & 1)
    out = b"RIFF" + struct.pack("<I", riff_size) + b"WEBP"
    out += b"VP8L" + struct.pack("<I", len(payload)) + payload
    return out + (b"\x00" if len(payload) & 1 else b"")


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _argb(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) u8 -> flat uint64 ARGB with alpha 255."""
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    return (
        (np.uint64(0xFF) << np.uint64(24))
        | (r.astype(np.uint64) << np.uint64(16))
        | (g.astype(np.uint64) << np.uint64(8))
        | b.astype(np.uint64)
    ).reshape(-1)


def test_roundtrip_matrix():
    rng = np.random.RandomState(11)
    for shape in ((13, 17, 3), (8, 8), (20, 5, 4), (1, 1, 3), (2, 33, 3)):
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        for lz in (False, True):
            for sg in (False, True):
                wb = encode_webp(img, lz77=lz, subtract_green=sg)
                assert is_webp(wb)
                w, h, ch, px = decode_webp(wb)
                exp = np.stack([img] * 3, axis=2) if img.ndim == 2 else img
                assert (w, h) == (shape[1], shape[0])
                assert np.array_equal(px, exp), (shape, lz, sg)


def test_alpha_channel_detection():
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., :3] = 100
    rgba[..., 3] = 255
    assert decode_webp(encode_webp(rgba))[2] == 3  # uniform alpha folds
    rgba[1, 1, 3] = 7
    w, h, ch, px = decode_webp(encode_webp(rgba))
    assert ch == 4 and px[1, 1, 3] == 7 and px[0, 0, 3] == 255


def test_lz77_run_compresses():
    rng = np.random.RandomState(2)
    img = np.repeat(rng.randint(0, 256, (16, 8, 3), dtype=np.uint8), 8, axis=1)
    small = encode_webp(img, lz77=True)
    big = encode_webp(img, lz77=False)
    assert len(small) < len(big) // 2
    assert np.array_equal(decode_webp(small)[3], img)


@pytest.mark.parametrize("n_colors,bundled", [(20, False), (3, True), (13, True)])
def test_palette_roundtrip(n_colors, bundled):
    rng = np.random.RandomState(n_colors)
    lut = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.randint(0, n_colors, (11, 23))
    img = lut[idx]
    wb = encode_webp(img, palette=True)
    assert np.array_equal(decode_webp(wb)[3], img)
    # bundling shrinks the coded width
    if bundled:
        assert len(wb) < len(encode_webp(img, lz77=False))


def test_error_contracts():
    ok = encode_webp(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_webp(ok[:20])
    lossy = bytearray(ok)
    lossy[12:16] = b"VP8 "
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(bytes(lossy))
    # a bare ANIM chunk with no ANMF frames is malformed, not gated
    anim = bytearray(ok)
    anim[12:16] = b"ANIM"
    with pytest.raises(ValueError, match="no VP8L"):
        decode_webp(bytes(anim))
    assert not is_webp(b"")


# ----------------------- white-box decoder-only paths


def _predict_forward(px: np.ndarray, mode: int) -> np.ndarray:
    """Forward predictor residuals for a UNIFORM mode image —
    independent model of the decode rules (first pixel black, first
    row L, first col T)."""
    h, w, _ = px.shape
    res = np.zeros_like(px)
    out = px  # prediction reads RECONSTRUCTED pixels == source
    black = np.array([255, 0, 0, 0], np.int16)

    def avg2(a, b):
        return (a.astype(np.int16) + b) // 2

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = out[0, x - 1].astype(np.int16)
            elif x == 0:
                pred = out[y - 1, 0].astype(np.int16)
            else:
                L = out[y, x - 1].astype(np.int16)
                T = out[y - 1, x].astype(np.int16)
                TL = out[y - 1, x - 1].astype(np.int16)
                TR = (out[y - 1, x + 1] if x + 1 < w else out[y, 0]).astype(
                    np.int16
                )
                if mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 3:
                    pred = TR
                else:
                    raise AssertionError("test model only covers 1/2/3/7/12")
            res[y, x] = (px[y, x].astype(np.int16) - pred) % 256
    return res


@pytest.mark.parametrize("mode", [1, 2, 3, 7, 12])
def test_predictor_transform_decode(mode):
    rng = np.random.RandomState(mode)
    src = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    # channel layout (a, r, g, b) for the forward model
    px4 = np.zeros((9, 11, 4), np.uint8)
    px4[:, :, 0] = 255
    px4[:, :, 1:] = src
    res = _predict_forward(px4, mode)
    res_argb = (
        (res[:, :, 0].astype(np.uint64) << np.uint64(24))
        | (res[:, :, 1].astype(np.uint64) << np.uint64(16))
        | (res[:, :, 2].astype(np.uint64) << np.uint64(8))
        | res[:, :, 3].astype(np.uint64)
    ).reshape(-1)
    bw = _BitWriter()
    _header(bw, 11, 9)
    bw.write(1, 1)  # a transform follows
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # block bits = 2 (4x4 blocks)
    mode_img = np.full(3 * 3, (0xFF << 24) | (mode << 8), np.uint64)
    _encode_image_body(bw, mode_img, lz77=False, level0=False)
    bw.write(0, 1)  # no more transforms
    _encode_image_body(bw, res_argb, lz77=False, level0=True)
    w, h, ch, out = decode_webp(_wrap(bw.bytes()))
    assert (w, h, ch) == (11, 9, 3)
    assert np.array_equal(out, src)


def test_color_transform_decode():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 256, (8, 10, 3), dtype=np.uint8)
    g2r, g2b, r2b = 23, -17 & 0xFF, 5

    def delta(t, c):
        return (np.int8(t).astype(np.int32) * np.int8(c).astype(np.int32)) >> 5

    r = src[:, :, 0].astype(np.int32)
    g = src[:, :, 1].astype(np.int32)
    b = src[:, :, 2].astype(np.int32)
    tr = np.zeros_like(r)
    tb = np.zeros_like(b)
    for y in range(8):
        for x in range(10):
            tr[y, x] = (r[y, x] - delta(g2r, g[y, x])) & 0xFF
            # the blue delta uses the RECONSTRUCTED red (== original),
            # not the transformed value — mirrors the decoder's order
            tb[y, x] = (
                b[y, x] - delta(g2b, g[y, x]) - delta(r2b, r[y, x])
            ) & 0xFF
    coded = np.stack(
        [tr.astype(np.uint8), src[:, :, 1], tb.astype(np.uint8)], axis=2
    )
    bw = _BitWriter()
    _header(bw, 10, 8)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(2, 3)  # block bits = 4 (16x16): one block
    t_img = np.array([(0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r], np.uint64)
    _encode_image_body(bw, t_img, lz77=False, level0=False)
    bw.write(0, 1)
    _encode_image_body(bw, _argb(coded), lz77=False, level0=True)
    w, h, ch, out = decode_webp(_wrap(bw.bytes()))
    assert np.array_equal(out, src)


def test_color_cache_and_distance_map_decode():
    """Hand-written stream: 2 literals, a cache hit, and 2-D map
    copies — dist code 1 = pixel above, dist code 2 = pixel left."""
    w, h = 4, 3
    cache_bits = 4
    p1 = (0xFF << 24) | (10 << 16) | (20 << 8) | 30
    p2 = (0xFF << 24) | (40 << 16) | (50 << 8) | 60
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta groups
    cache_size = 1 << cache_bits
    idx1 = _color_cache_hash(np.uint32(p1), cache_bits)
    # greens: 20, 50; length codes for lengths 2/3/4; cache sym idx1
    g_used = {20, 50, 256 + _prefix_encode(2)[0], 256 + _prefix_encode(3)[0],
              256 + _prefix_encode(4)[0], 280 + idx1}
    cg = _code_for(bw, g_used, 256 + 24 + cache_size)
    cr = _code_for(bw, {10, 40}, 256)
    cb = _code_for(bw, {30, 60}, 256)
    ca = _code_for(bw, {255}, 256)
    # distance VALUES 1 and 2 (2-D map entries) -> prefix codes 0 / 1
    cd = _code_for(bw, {_prefix_encode(1)[0], _prefix_encode(2)[0]}, 40)

    def lit(argb):
        _emit(bw, cg, (argb >> 8) & 0xFF)
        _emit(bw, cr, (argb >> 16) & 0xFF)
        _emit(bw, cb, argb & 0xFF)
        _emit(bw, ca, (argb >> 24) & 0xFF)

    def copy(length, dist_value):
        lcode, lex, lbits = _prefix_encode(length)
        _emit(bw, cg, 256 + lcode)
        bw.write(lex, lbits)
        dcode, dex, dbits = _prefix_encode(dist_value)
        _emit(bw, cd, dcode)
        bw.write(dex, dbits)

    # row 0: p1, p2, then copy(2, dist_value=2 -> map (1,0) -> d=1):
    # repeats p2 twice
    lit(p1)
    lit(p2)
    copy(2, 2)
    # row 1: copy(4, dist_value=1 -> map (0,1) -> d=w): copies row 0
    copy(4, 1)
    # row 2: cache hit for p1, then copy(3, d=1) repeats it
    _emit(bw, cg, 280 + idx1)
    copy(3, 2)
    out = decode_webp(_wrap(bw.bytes()))[3]
    exp = np.array(
        [
            [[10, 20, 30], [40, 50, 60], [40, 50, 60], [40, 50, 60]],
            [[10, 20, 30], [40, 50, 60], [40, 50, 60], [40, 50, 60]],
            [[10, 20, 30], [10, 20, 30], [10, 20, 30], [10, 20, 30]],
        ],
        np.uint8,
    )
    assert np.array_equal(out, exp)


# ----------------------- animation (ANIM / ANMF)


def _compose_reference(canvas_wh, frames, offsets, blend, dispose, bg):
    """Independent compositor model: overwrite / alpha-blend / dispose
    per the container spec, float64 round-half-up."""
    cw, ch = canvas_wh
    canvas = np.zeros((ch, cw, 4), np.float64)
    canvas[:] = np.asarray(bg, np.float64)
    out = []
    for f, (x, y), bl, dp in zip(frames, offsets, blend, dispose):
        f = np.asarray(f, np.float64)
        if f.shape[2] == 3:
            f = np.dstack([f, np.full(f.shape[:2], 255.0)])
        fh, fw = f.shape[:2]
        rect = canvas[y : y + fh, x : x + fw]
        if bl:
            af = f[:, :, 3:4] / 255.0
            ac = rect[:, :, 3:4] / 255.0
            ao = af + ac * (1 - af)
            rgb = f[:, :, :3] / 255.0 * af + rect[:, :, :3] / 255.0 * ac * (1 - af)
            rgb = np.where(ao > 0, rgb / np.where(ao > 0, ao, 1.0), 0.0)
            # quantize to u8 exactly like the decoder does
            q = np.floor(np.concatenate([rgb, ao], axis=2) * 255.0 + 0.5)
            canvas[y : y + fh, x : x + fw] = q
        else:
            canvas[y : y + fh, x : x + fw] = f
        out.append(np.floor(canvas[:, :, :3] + 0.5).astype(np.uint8))
        if dp:
            canvas[y : y + fh, x : x + fw] = np.asarray(bg, np.float64)
    return out


def test_animation_overwrite_and_dispose():
    from ocracle_ray.core.webp import decode_webp_frames, encode_webp_animated

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (10, 12, 3), dtype=np.uint8)
    patch = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    patch2 = rng.randint(0, 256, (3, 4, 3), dtype=np.uint8)
    frames = [base, patch, patch2]
    offsets = [(0, 0), (4, 2), (6, 4)]
    blend = [False, False, False]
    dispose = [False, True, False]  # frame 1's rect reverts to bg
    bg = (9, 17, 33, 255)
    wb = encode_webp_animated(
        frames, offsets=offsets, blend=blend, dispose=dispose, bg=bg
    )
    w, h, got = decode_webp_frames(wb)
    assert (w, h) == (12, 10) and len(got) == 3
    exp = _compose_reference((12, 10), frames, offsets, blend, dispose, bg)
    for i, (g, e) in enumerate(zip(got, exp)):
        assert np.array_equal(g, e), f"frame {i}"
    # decode_webp on an animated file = first composited canvas
    from ocracle_ray.core.webp import decode_webp as dw

    assert np.array_equal(dw(wb)[3], exp[0])


def test_animation_alpha_blend():
    from ocracle_ray.core.webp import decode_webp_frames, encode_webp_animated

    rng = np.random.RandomState(8)
    base = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    overlay = rng.randint(0, 256, (4, 4, 4), dtype=np.uint8)
    overlay[:, :, 3] = rng.randint(0, 256, (4, 4), dtype=np.uint8)
    frames = [base, overlay]
    offsets = [(0, 0), (2, 2)]
    blend = [False, True]
    dispose = [False, False]
    bg = (0, 0, 0, 255)
    wb = encode_webp_animated(
        frames, offsets=offsets, blend=blend, dispose=dispose, bg=bg
    )
    _w, _h, got = decode_webp_frames(wb)
    exp = _compose_reference((8, 8), frames, offsets, blend, dispose, bg)
    assert np.array_equal(got[1], exp[1])


def test_animation_error_contracts():
    from ocracle_ray.core.webp import decode_webp_frames, encode_webp_animated

    f = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="even"):
        encode_webp_animated([f, f], offsets=[(0, 0), (1, 0)])
    with pytest.raises(ValueError, match="canvas"):
        encode_webp_animated([f], canvas=(2, 2))
    # lossy animation frames gate loud: splice a VP8 fourcc into the
    # frame's sub-chunk
    wb = bytearray(encode_webp_animated([f, f], offsets=[(0, 0), (0, 0)]))
    i = wb.find(b"VP8L", 30)  # first frame's sub-chunk
    wb[i : i + 4] = b"VP8 "
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_frames(bytes(wb))
    # a still file decodes as a single frame
    still = encode_webp(np.full((3, 3, 3), 7, np.uint8))
    w, h, frames = decode_webp_frames(still)
    assert (w, h, len(frames)) == (3, 3, 1)
    assert np.array_equal(frames[0], np.full((3, 3, 3), 7, np.uint8))


def test_vp8x_container_walks_to_vp8l():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    wb = encode_webp(img)
    vp8l = wb[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    payload = vp8x + vp8l
    full = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
    assert np.array_equal(decode_webp(full)[3], img)

"""GIF / BMP / G.711-WAV stdlib codecs (round 4, late) + their
multimodal-stage integration. Reference analogue: OpenCV's
unconditional decode in `scripts/extract_images.py` and the audio the
reference never restricted to PCM."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from ocracle_ray.core.bmp import decode_bmp, encode_bmp, is_bmp
from ocracle_ray.core.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    is_gif,
)
from ocracle_ray.core.wav import decode_wav, encode_wav_g711, is_wav

# --------------------------------------------------------------- GIF


def _pal(n, seed=7):
    return np.random.RandomState(seed).randint(0, 256, (n, 3), dtype=np.uint8)


def test_gif_roundtrip_plain():
    rng = np.random.RandomState(1)
    pal = _pal(16)
    fr = rng.randint(0, 16, (23, 17), dtype=np.uint8)
    g = encode_gif(fr, pal)
    assert is_gif(g)
    w, h, ch, px = decode_gif(g)
    assert (w, h, ch) == (17, 23, 3)
    assert np.array_equal(px, pal[fr])


def test_gif_roundtrip_interlaced():
    rng = np.random.RandomState(2)
    pal = _pal(16)
    fr = rng.randint(0, 16, (40, 9), dtype=np.uint8)  # >4 rows/pass
    assert np.array_equal(decode_gif(encode_gif(fr, pal, interlace=True))[3], pal[fr])


def test_gif_transparency_shows_background():
    rng = np.random.RandomState(3)
    pal = _pal(16)
    fr = rng.randint(0, 16, (8, 8), dtype=np.uint8)
    fr[0:3, 0:3] = 5
    px = decode_gif(encode_gif(fr, pal, transparent=5))[3]
    exp = pal[fr].copy()
    exp[fr == 5] = pal[0]  # background index 0
    assert np.array_equal(px, exp)


def test_gif_animation_frames():
    rng = np.random.RandomState(4)
    pal = _pal(16)
    frames = [rng.randint(0, 16, (11, 13), dtype=np.uint8) for _ in range(5)]
    w, h, decoded = decode_gif_frames(encode_gif(frames, pal))
    assert (w, h) == (13, 11) and len(decoded) == 5
    for d, f in zip(decoded, frames):
        assert np.array_equal(d, pal[f])


def test_gif_lzw_12bit_growth_and_reset():
    """Random 256-color noise at 60k px forces code width up to 12 bits
    and past a 4096-entry table reset — the encoder/decoder width sync
    is the classic off-by-one trap."""
    rng = np.random.RandomState(5)
    pal = _pal(256)
    big = rng.randint(0, 256, (200, 300), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(big, pal))[3], pal[big])


def test_gif_kwkwk_and_long_matches():
    pal = _pal(16)
    rep = np.zeros((50, 80), np.uint8)
    rep[:, ::2] = 5  # periodic -> KwKwK codes
    assert np.array_equal(decode_gif(encode_gif(rep, pal))[3], pal[rep])
    grad = ((np.arange(64)[:, None] + np.arange(64)[None, :]) % 16).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(grad, pal))[3], pal[grad])


def test_gif_two_color_min_code_clamp():
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    bw = np.random.RandomState(6).randint(0, 2, (9, 31), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(bw, pal2))[3], pal2[bw])


def test_gif_error_contract():
    pal = _pal(16)
    ok = encode_gif(np.zeros((4, 4), np.uint8), pal)
    for bad in (b"", b"GIF89a", b"NOTGIF" + bytes(20), ok[:30], ok[:-10]):
        with pytest.raises(ValueError):
            decode_gif(bad)
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4, 4), np.uint8), _pal(3))  # not a power of two


# --------------------------------------------------------------- BMP


def test_bmp_roundtrip_24bit():
    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, (19, 13, 3), dtype=np.uint8)
    b = encode_bmp(px)
    assert is_bmp(b)
    w, h, ch, out = decode_bmp(b)
    assert (w, h, ch) == (13, 19, 3)
    assert np.array_equal(out, px)


def test_bmp_gray_input_and_padding():
    # w=21 -> 63-byte rows padded to 64: exercises the stride logic
    g = np.random.RandomState(9).randint(0, 256, (8, 21), dtype=np.uint8)
    out = decode_bmp(encode_bmp(g))[3]
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_bmp_8bit_palette_topdown():
    rng = np.random.RandomState(10)
    pal = rng.randint(0, 256, (256, 4), dtype=np.uint8)
    pal[:, 3] = 0
    idx = rng.randint(0, 256, (6, 5), dtype=np.uint8)
    stride = (5 + 3) & ~3
    body = np.zeros((6, stride), np.uint8)
    body[:, :5] = idx
    data = (
        b"BM"
        + struct.pack("<IHHI", 54 + 1024 + body.size, 0, 0, 54 + 1024)
        + struct.pack("<IiiHHIIiiII", 40, 5, -6, 1, 8, 0, body.size, 0, 0, 256, 0)
        + pal.tobytes()
        + body.tobytes()
    )
    w, h, ch, out = decode_bmp(data)
    assert (w, h) == (5, 6)
    assert np.array_equal(out, pal[:, 2::-1][idx])


def test_bmp_error_contract():
    ok = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    for bad in (b"", b"BM", b"XX" + bytes(60), ok[:40]):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_bmp(bad)
    # RLE8 compression is honestly gated
    rle = bytearray(ok)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))


# --------------------------------------------------------------- TIFF


def test_tiff_roundtrip_gray_and_rgb_strips():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff, is_tiff

    rng = np.random.RandomState(13)
    g = rng.randint(0, 256, (21, 17), dtype=np.uint8)
    t = encode_tiff(g)
    assert is_tiff(t)
    w, h, ch, px = decode_tiff(t)
    assert (w, h, ch) == (17, 21, 1) and np.array_equal(px, g)
    c = rng.randint(0, 256, (30, 11, 3), dtype=np.uint8)
    w, h, ch, px = decode_tiff(encode_tiff(c, rows_per_strip=7))
    assert (w, h, ch) == (11, 30, 3) and np.array_equal(px, c)


@pytest.mark.parametrize("pred", [False, True])
def test_tiff_lzw_roundtrip(pred):
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(14)
    for src in (
        rng.randint(0, 256, (40, 33, 3), dtype=np.uint8),  # noise
        np.tile(np.arange(33, dtype=np.uint8) * 3, (40, 1))[:, :, None]
        .repeat(3, axis=2),  # structured: long LZW matches
        rng.randint(0, 256, (150, 300), dtype=np.uint8),  # width growth+reset
    ):
        out = decode_tiff(
            encode_tiff(src, compression="lzw", predictor=pred, rows_per_strip=13)
        )[3]
        assert np.array_equal(out, src)


def test_tiff_big_endian_and_white_is_zero():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    gg = np.arange(8, dtype=np.uint8).reshape(2, 4)
    ifd = struct.pack(">H", 8)

    def ent(tag, typ, cnt, val4):
        return struct.pack(">HHI", tag, typ, cnt) + val4

    ifd += ent(256, 3, 1, struct.pack(">HH", 4, 0))
    ifd += ent(257, 3, 1, struct.pack(">HH", 2, 0))
    ifd += ent(258, 3, 1, struct.pack(">HH", 8, 0))
    ifd += ent(259, 3, 1, struct.pack(">HH", 1, 0))
    ifd += ent(262, 3, 1, struct.pack(">HH", 1, 0))
    ifd += ent(273, 4, 1, struct.pack(">I", 8 + 2 + 8 * 12 + 4))
    ifd += ent(278, 3, 1, struct.pack(">HH", 2, 0))
    ifd += ent(279, 4, 1, struct.pack(">I", 8))
    ifd += struct.pack(">I", 0)
    be = b"MM\x00*" + struct.pack(">I", 8) + ifd + gg.tobytes()
    w, h, ch, px = decode_tiff(be)
    assert (w, h, ch) == (4, 2, 1) and np.array_equal(px, gg)

    g = np.random.RandomState(15).randint(0, 256, (5, 5), dtype=np.uint8)
    wz = bytearray(encode_tiff(g))
    i = wz.find(struct.pack("<HHI", 262, 3, 1))
    wz[i + 8 : i + 10] = struct.pack("<H", 0)  # WhiteIsZero
    assert np.array_equal(decode_tiff(bytes(wz))[3], 255 - g)


def test_tiff_tiled_roundtrip():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(21)
    # tile sizes deliberately NOT dividing the image dims: edge tiles
    # are written padded and must come back cropped
    g = rng.randint(0, 256, (37, 29), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(g, tile=(16, 16)))[3], g)
    c = rng.randint(0, 256, (25, 41, 3), dtype=np.uint8)
    w, h, ch, px = decode_tiff(encode_tiff(c, tile=(8, 32)))
    assert (w, h, ch) == (41, 25, 3) and np.array_equal(px, c)
    # tiled + LZW + predictor compose
    out = decode_tiff(
        encode_tiff(c, compression="lzw", predictor=True, tile=(16, 16))
    )[3]
    assert np.array_equal(out, c)


@pytest.mark.parametrize("pred", [False, True])
def test_tiff_deflate_roundtrip(pred):
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(22)
    src = rng.randint(0, 256, (40, 33, 3), dtype=np.uint8)
    t = encode_tiff(src, compression="deflate", predictor=pred, rows_per_strip=13)
    assert np.array_equal(decode_tiff(t)[3], src)
    # deflate also decodes under the legacy 32946 code
    legacy = bytearray(t)
    i = legacy.find(struct.pack("<HHI", 259, 3, 1))
    legacy[i + 8 : i + 10] = struct.pack("<H", 32946 & 0xFFFF)
    assert np.array_equal(decode_tiff(bytes(legacy))[3], src)


def _smooth(h, w, rgb=False):
    """Gradient fixture: smooth enough that q85 JPEG error is tiny."""
    y, x = np.mgrid[0:h, 0:w]
    g = ((x * 3 + y * 2) % 256).astype(np.uint8)
    if not rgb:
        return g
    return np.stack([g, np.roll(g, 7, axis=1), 255 - g], axis=2)


def test_tiff_jpeg_strips_match_standalone_jpeg():
    from ocracle_ray.core.jpeg import decode_jpeg, encode_jpeg
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    for src, spp in ((_smooth(21, 40), 1), (_smooth(24, 17, rgb=True), 3)):
        t = encode_tiff(src, compression="jpeg", rows_per_strip=8)
        got = decode_tiff(t)[3]
        # exactness vs the SAME codec run standalone per strip — no
        # lossiness assumption, pins the strip plumbing bit-for-bit
        parts = []
        for r0 in range(0, src.shape[0], 8):
            chunk = src[r0 : r0 + 8]
            parts.append(decode_jpeg(encode_jpeg(chunk, quality=85))[3])
        ref = np.concatenate(parts, axis=0)
        assert np.array_equal(got, ref)
        assert int(np.abs(got.astype(np.int16) - src.astype(np.int16)).max()) <= 16


def test_tiff_jpeg_tables_tag_and_tiles():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    src = _smooth(37, 29, rgb=True)
    plain = encode_tiff(src, compression="jpeg", tile=(16, 16))
    shared = encode_tiff(src, compression="jpeg", tile=(16, 16), jpeg_tables=True)
    # tag-347 splice reproduces the exact same decode, in fewer bytes
    a, b = decode_tiff(plain)[3], decode_tiff(shared)[3]
    assert np.array_equal(a, b)
    assert len(shared) < len(plain)
    # edge tiles are zero-padded before DCT, so ringing near the crop
    # boundary is expected — gate on mean error, not max
    assert float(np.abs(a.astype(np.int16) - src.astype(np.int16)).mean()) <= 4.0


def test_tiff_old_style_jpeg():
    from ocracle_ray.core.jpeg import decode_jpeg, encode_jpeg
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    for src, spp in ((_smooth(21, 40), 1), (_smooth(24, 17, rgb=True), 3)):
        t = encode_tiff(src, compression="jpeg", old_style_jpeg=True)
        jw, jh, jch, jexp = decode_jpeg(encode_jpeg(src, quality=85))
        w, h, ch, got = decode_tiff(t)
        # exactness vs the SAME codec standalone: pins the tag-513
        # plumbing bit-for-bit, no lossiness assumption
        assert (w, h, ch) == (src.shape[1], src.shape[0], spp if spp == 3 else 1)
        assert np.array_equal(got, jexp)
        assert struct.pack("<HHI", 259, 3, 1) in t  # compression tag…
        i = t.find(struct.pack("<HHI", 259, 3, 1))
        assert struct.unpack("<H", t[i + 8 : i + 10])[0] == 6  # …says 6
    # per-strip old JPEG (no tag 513) stays honestly gated
    bad = bytearray(encode_tiff(_smooth(8, 8), compression="jpeg",
                                old_style_jpeg=True))
    i = bad.find(struct.pack("<HHI", 513, 4, 1))
    bad[i : i + 2] = struct.pack("<H", 273)  # rename 513 -> strip tag
    with pytest.raises(NotImplementedError, match="per-strip"):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError, match="old_style"):
        encode_tiff(_smooth(8, 8), compression="lzw", old_style_jpeg=True)
    with pytest.raises(ValueError, match="old_style"):
        encode_tiff(_smooth(8, 8), compression="jpeg", old_style_jpeg=True,
                    tile=(4, 4))


def test_tiff_16bit_roundtrip():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(23)
    g16 = rng.randint(0, 65536, (19, 23), dtype=np.uint16)
    for kw in (
        dict(),
        dict(compression="lzw", predictor=True, rows_per_strip=7),
        dict(compression="deflate", tile=(8, 8)),
    ):
        w, h, ch, px = decode_tiff(encode_tiff(g16, bit_depth=16, **kw))
        # 16-bit downscales to the high byte (the decode_png rule)
        assert (w, h, ch) == (23, 19, 1)
        assert np.array_equal(px, (g16 >> 8).astype(np.uint8))
    c16 = rng.randint(0, 65536, (10, 12, 3), dtype=np.uint16)
    px = decode_tiff(
        encode_tiff(c16, bit_depth=16, compression="deflate", predictor=True)
    )[3]
    assert np.array_equal(px, (c16 >> 8).astype(np.uint8))
    with pytest.raises(ValueError, match="16-bit"):
        encode_tiff(g16, bit_depth=16, compression="jpeg")


def test_tiff_new_error_contracts():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    g = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="jpeg_tables"):
        encode_tiff(g, compression="lzw", jpeg_tables=True)
    # predictor alongside JPEG compression is malformed: flip the
    # compression tag on an LZW+predictor file
    t2 = bytearray(encode_tiff(g, compression="lzw", predictor=True))
    j = t2.find(struct.pack("<HHI", 259, 3, 1))
    t2[j + 8 : j + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="predictor"):
        decode_tiff(bytes(t2))
    # truncated tile payload raises loud
    tiled = encode_tiff(np.zeros((20, 20), np.uint8), tile=(16, 16))
    with pytest.raises(ValueError):
        decode_tiff(tiled[:-5])


def test_ccitt_g4_mh_roundtrips():
    from ocracle_ray.core.ccitt import g4_decode, g4_encode, mh_decode, mh_encode

    rng = np.random.RandomState(21)
    cases = [
        np.zeros((5, 40), np.uint8),            # all white
        np.ones((5, 40), np.uint8),             # all black
        (rng.rand(30, 57) < 0.3).astype(np.uint8),
        (np.add.outer(np.arange(16), np.arange(16)) % 2).astype(np.uint8),
    ]
    wide = np.zeros((4, 6000), np.uint8)
    wide[:, 2000:4100] = 1                       # >2560 runs: makeup chains
    cases.append(wide)
    sb = np.zeros((3, 33), np.uint8)
    sb[:, 0:5] = 1                               # zero-length first white run
    cases.append(sb)
    for img in cases:
        for enc, dec in ((g4_encode, g4_decode), (mh_encode, mh_decode)):
            out = dec(enc(img), img.shape[1], img.shape[0])
            assert np.array_equal(out, img)


def test_ccitt_truncated_raises():
    from ocracle_ray.core.ccitt import g4_decode, mh_decode

    with pytest.raises(ValueError):
        g4_decode(b"\x00\x00", 10, 10)
    with pytest.raises(ValueError):
        mh_decode(b"\x00\x00", 10, 10)


def test_tiff_g4_fax_roundtrip():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    page = np.full((40, 100), 255, np.uint8)  # text-like scanned page
    for r0 in range(4, 36, 7):
        page[r0 : r0 + 3, 8:92:5] = 0
    for comp in ("g4", "mh"):
        for rps in (40, 13):  # single and multi strip
            t = encode_tiff(page, compression=comp, rows_per_strip=rps)
            w, h, ch, px = decode_tiff(t)
            assert (w, h, ch) == (100, 40, 1)
            assert np.array_equal(px, page)
    # G4 earns its keep on scanned content
    assert len(encode_tiff(page, compression="g4")) < page.size // 8


def test_tiff_tiled_bilevel_roundtrip():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    page = np.full((37, 53), 255, np.uint8)  # text-like scanned page
    for r0 in range(3, 34, 6):
        page[r0 : r0 + 2, 4:50:5] = 0
    page[0, 0] = page[36, 52] = 0  # corners pin tile placement
    # tile sizes deliberately NOT dividing the page: edge tiles are
    # written padded and must come back cropped (spec §15)
    for comp in ("g4", "mh"):
        for tile in ((16, 16), (8, 24)):
            t = encode_tiff(page, compression=comp, tile=tile)
            w, h, ch, px = decode_tiff(t)
            assert (w, h, ch) == (53, 37, 1)
            assert np.array_equal(px, page)
    # tile-count mismatch raises loud, not garbage
    t = bytearray(encode_tiff(page, compression="g4", tile=(16, 16)))
    i = t.find(struct.pack("<HHI", 322, 3, 1))
    t[i + 8 : i + 10] = struct.pack("<H", 32)  # lie about TileWidth
    with pytest.raises(ValueError, match="tiles"):
        decode_tiff(bytes(t))


def test_tiff_1bit_uncompressed_fillorder2_photo1():
    from ocracle_ray.core.tiff import _BITREV, decode_tiff

    rng = np.random.RandomState(22)
    bits = (rng.rand(6, 10) < 0.5).astype(np.uint8)
    stride = (10 + 7) // 8
    rows = np.zeros((6, stride), np.uint8)
    packed = np.packbits(bits, axis=1)
    rows[:, : packed.shape[1]] = packed
    raw = _BITREV[rows.reshape(-1)].tobytes()  # LSB-first fill

    def ent(tag, typ, cnt, val4):
        return struct.pack("<HHI", tag, typ, cnt) + val4

    n = 10
    off = 8 + 2 + n * 12 + 4
    b = struct.pack("<H", n)
    b += ent(256, 3, 1, struct.pack("<HH", 10, 0))
    b += ent(257, 3, 1, struct.pack("<HH", 6, 0))
    b += ent(258, 3, 1, struct.pack("<HH", 1, 0))
    b += ent(259, 3, 1, struct.pack("<HH", 1, 0))
    b += ent(262, 3, 1, struct.pack("<HH", 1, 0))  # BlackIsZero
    b += ent(266, 3, 1, struct.pack("<HH", 2, 0))  # FillOrder 2
    b += ent(273, 4, 1, struct.pack("<I", off))
    b += ent(277, 3, 1, struct.pack("<HH", 1, 0))
    b += ent(278, 3, 1, struct.pack("<HH", 6, 0))
    b += ent(279, 4, 1, struct.pack("<I", len(raw)))
    b += struct.pack("<I", 0)
    t = b"II*\x00" + struct.pack("<I", 8) + b + raw
    w, h, ch, px = decode_tiff(t)
    assert np.array_equal(px, bits * 255)


def test_tiff_error_contract():
    from ocracle_ray.core.tiff import decode_tiff, encode_tiff

    ok = encode_tiff(np.zeros((4, 4), np.uint8))
    for bad in (b"", b"II*\x00", b"XX*\x00" + bytes(20), ok[:40]):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_tiff(bad)
    # tiled organization is honestly gated: inject a TileWidth tag
    fax = bytearray(ok)
    i = fax.find(struct.pack("<HHI", 259, 3, 1))
    fax[i + 8 : i + 10] = struct.pack("<H", 4)  # CCITT fax compression
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_tiff(bytes(fax))


# ------------------------------------------------------------- G.711


def _tone(n=4000, f=440.0, amp=0.25, rate=8000):
    return amp * np.sin(2 * np.pi * f * np.arange(n) / rate)


@pytest.mark.parametrize("law", ["mu", "a"])
def test_g711_roundtrip(law):
    tone = _tone()
    w = encode_wav_g711(tone, 8000, law=law)
    assert is_wav(w)
    rate, ch, s = decode_wav(w)
    assert (rate, ch) == (8000, 1)
    # companded 8-bit: ~1% worst-case error at 0.25 amplitude
    assert np.abs(s[:, 0] - tone).max() < 0.01


def test_g711_stereo():
    st = np.stack([_tone(), -_tone()], axis=1)
    rate, ch, s = decode_wav(encode_wav_g711(st, 16000, law="a"))
    assert (rate, ch) == (16000, 2) and s.shape == (4000, 2)


def test_g711_encode_is_nearest_level():
    """decode(encode(x)) must be the nearest representable level —
    re-encoding the decoded signal is then a fixed point."""
    tone = _tone(500)
    w1 = encode_wav_g711(tone, 8000, law="mu")
    _, _, s1 = decode_wav(w1)
    w2 = encode_wav_g711(s1[:, 0], 8000, law="mu")
    assert w1[-500:] == w2[-500:]  # same data chunk bytes


def test_wav_24bit_and_extensible():
    tone = _tone()
    v = np.round(tone * 8388607).astype(np.int64) & 0xFFFFFF
    b = np.zeros((len(v), 3), np.uint8)
    b[:, 0], b[:, 1], b[:, 2] = v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", b.size) + b.tobytes()
    )
    _, _, s = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(s[:, 0], tone, atol=2 / 8388607)

    guid = struct.pack("<H", 1) + bytes(14)  # KSDATAFORMAT_SUBTYPE_PCM
    ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<H", 22) + struct.pack("<HI", 16, 1) + guid
    )
    pcm = np.clip(np.round(tone * 32767), -32768, 32767).astype("<i2").tobytes()
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rate, ch, s = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (8000, 1)
    assert np.allclose(s[:, 0], tone, atol=1 / 32767)


def test_ima_adpcm_roundtrip_mono_stereo_partial():
    from ocracle_ray.core.wav import encode_wav_ima_adpcm

    tone = _tone(5000, amp=0.4)
    rate, ch, s = decode_wav(encode_wav_ima_adpcm(tone, 8000))
    assert (rate, ch) == (8000, 1) and s.shape == (5000, 1)
    assert np.abs(s[:, 0] - tone).max() < 0.03  # 4-bit companding

    st = np.stack([tone, 0.3 * np.cos(2 * np.pi * 220 * np.arange(5000) / 8000)], axis=1)
    rate, ch, s2 = decode_wav(encode_wav_ima_adpcm(st, 16000, block_align=512))
    assert (rate, ch) == (16000, 2) and s2.shape == (5000, 2)
    assert np.abs(s2 - st).max() < 0.03

    # partial final block: the fact chunk trims the zero padding
    rate, ch, s3 = decode_wav(encode_wav_ima_adpcm(tone[:37], 8000, block_align=36))
    assert s3.shape == (37, 1) and np.abs(s3[:, 0] - tone[:37]).max() < 0.03


def test_ima_adpcm_compression_ratio():
    from ocracle_ray.core.wav import encode_wav_ima_adpcm

    tone = _tone(8000)
    w = encode_wav_ima_adpcm(tone, 8000)
    assert len(w) < 8000 * 2 * 0.3  # ~4:1 vs 16-bit PCM


def test_ima_adpcm_error_contract():
    from ocracle_ray.core.wav import encode_wav_ima_adpcm

    with pytest.raises(ValueError, match="block_align"):
        encode_wav_ima_adpcm(_tone(100), 8000, block_align=30)  # not 4-aligned
    ok = encode_wav_ima_adpcm(_tone(600), 8000)
    bad = bytearray(ok)
    i = ok.find(b"data")
    bad[i + 8 + 2] = 120  # step index > 88 in the first block header
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))


def test_wav_unknown_tag_honestly_gated():
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)  # 85 = mp3
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + bytes(4)
    )
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# -------------------------------------------------- stage integration


def _media_table(rows):
    ids, kinds, payloads = zip(*rows)
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([0] * len(ids), pa.int32()),
            "height": pa.array([0] * len(ids), pa.int32()),
        }
    )


def test_image_features_decodes_gif_and_bmp():
    from ocracle_ray.stages.multimodal import ImageFeatures

    rng = np.random.RandomState(11)
    pal = _pal(16)
    fr = rng.randint(0, 16, (18, 22), dtype=np.uint8)
    bmp_px = rng.randint(0, 256, (14, 26, 3), dtype=np.uint8)
    t = _media_table(
        [
            (0, "image", encode_gif(fr, pal, interlace=True)),
            (1, "image", encode_bmp(bmp_px)),
        ]
    )
    out = ImageFeatures()(t).to_pandas().set_index("media_id")
    assert (out.loc[0, "width"], out.loc[0, "height"]) == (22, 18)
    assert out.loc[0, "mean_intensity"] == round(float(pal[fr].mean()), 4)
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (26, 14)
    assert out.loc[1, "mean_intensity"] == round(float(bmp_px.mean()), 4)


def test_image_features_decodes_tiff():
    from ocracle_ray.core.tiff import encode_tiff
    from ocracle_ray.stages.multimodal import ImageFeatures

    rng = np.random.RandomState(16)
    gray = rng.randint(0, 256, (16, 19), dtype=np.uint8)
    rgb = rng.randint(0, 256, (16, 19, 3), dtype=np.uint8)
    t = _media_table(
        [
            (0, "image", encode_tiff(gray, compression="lzw", predictor=True)),
            (1, "image", encode_tiff(rgb, rows_per_strip=5)),
        ]
    )
    out = ImageFeatures()(t).to_pandas().set_index("media_id")
    assert (out.loc[0, "width"], out.loc[0, "height"]) == (19, 16)
    assert out.loc[0, "mean_intensity"] == round(float(gray.mean()), 4)
    assert out.loc[1, "mean_intensity"] == round(float(rgb.mean()), 4)


def test_audio_features_decodes_g711():
    from ocracle_ray.stages.multimodal import AudioFeatures

    tone = _tone(1600, f=330)
    t = _media_table(
        [
            (0, "audio", encode_wav_g711(tone, 8000, law="mu")),
            (1, "audio", encode_wav_g711(tone, 8000, law="a")),
        ]
    )
    out = AudioFeatures()(t).to_pandas()
    assert list(out["n_samples"]) == [1600, 1600]
    ref_rms = float(np.sqrt(np.mean(tone**2)))
    assert np.allclose(out["rms"], ref_rms, atol=0.005)


def test_resize_handles_real_codecs():
    from ocracle_ray.core.png import decode_png, encode_png
    from ocracle_ray.core.tiff import encode_tiff
    from ocracle_ray.stages.multimodal import Resize

    rng = np.random.RandomState(17)
    pal = _pal(16)
    fr = rng.randint(0, 16, (18, 22), dtype=np.uint8)
    rgb = rng.randint(0, 256, (14, 26, 3), dtype=np.uint8)
    t = _media_table(
        [
            (0, "image", encode_gif(fr, pal)),
            (1, "image", encode_bmp(rgb)),
            (2, "image", encode_tiff(rgb, compression="lzw")),
            (3, "image", encode_png(rgb)),
        ]
    )
    out = Resize(target=8)(t).to_pandas().set_index("media_id")
    assert len(out) == 4

    def nn(px, k=8):
        ty = np.linspace(0, px.shape[0] - 1, k).round().astype(int)
        tx = np.linspace(0, px.shape[1] - 1, k).round().astype(int)
        return px[np.ix_(ty, tx)]

    for mid, src in ((0, pal[fr]), (1, rgb), (2, rgb), (3, rgb)):
        w, h, ch, px = decode_png(out.loc[mid, "payload"])
        assert (w, h) == (8, 8)
        assert np.array_equal(px, nn(src))


def test_frame_sample_animated_gif():
    from ocracle_ray.stages.multimodal import FrameSample

    rng = np.random.RandomState(12)
    pal = _pal(16)
    frames = [rng.randint(0, 16, (10, 12), dtype=np.uint8) for _ in range(6)]
    t = _media_table([(0, "video", encode_gif(frames, pal))])
    out = FrameSample(every=2)(t).to_pandas()
    assert list(out["frame_index"]) == [0, 2, 4]
    for _, row in out.iterrows():
        assert row["frame"] == pal[frames[row["frame_index"]]].tobytes()


def test_frame_sample_animated_webp():
    from ocracle_ray.core.webp import encode_webp_animated
    from ocracle_ray.stages.multimodal import FrameSample

    rng = np.random.RandomState(13)
    frames = [rng.randint(0, 256, (9, 11, 3), dtype=np.uint8) for _ in range(5)]
    t = _media_table([(0, "video", encode_webp_animated(frames))])
    out = FrameSample(every=2)(t).to_pandas()
    assert list(out["frame_index"]) == [0, 2, 4]
    for _, row in out.iterrows():
        # full-canvas overwrite frames: each canvas == the raw frame
        assert row["frame"] == frames[row["frame_index"]].tobytes()

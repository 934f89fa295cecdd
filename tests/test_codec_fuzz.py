"""Codec fuzz contracts: the multimodal stages skip-row ONLY on
``(NotImplementedError, ValueError)`` (stages/multimodal.py), so every
stdlib decoder must map arbitrary malformed bytes to exactly those —
an ``IndexError``/``struct.error`` escaping a decoder would crash a
production pipeline instead of skipping the row.

Three corruption families per codec, all seeded/deterministic:
truncations of a valid file, single-byte flips, and valid-magic +
random tails. JPEG is exempt from the strict rule (its stage contract
is a deliberate broad ``except Exception`` for truncated-header
shapes) — for it the test only asserts termination.
"""

import zlib

import numpy as np
import pytest

from ocracle_ray.core.bmp import encode_bmp
from ocracle_ray.core.gif import encode_gif
from ocracle_ray.core.jpeg import encode_jpeg
from ocracle_ray.core.png import encode_png
from ocracle_ray.core.tiff import encode_tiff
from ocracle_ray.core.flac import encode_flac
from ocracle_ray.core.vorbis import encode_vorbis
from ocracle_ray.core.wav import encode_wav
from ocracle_ray.core.webp import encode_webp, encode_webp_animated
from ocracle_ray.sources.warc import encode_warc

STRICT = (NotImplementedError, ValueError)


def _img(seed=5, shape=(12, 14, 3)):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


def _valid_files():
    g = _img()
    frames = [_img(i, (6, 8, 3)) for i in range(3)]
    tone = 0.3 * np.sin(2 * np.pi * 440 * np.arange(500) / 8000.0)
    pal = np.random.RandomState(3).randint(0, 256, (8, 3), dtype=np.uint8)
    idx = np.random.RandomState(4).randint(0, 8, (10, 12)).astype(np.uint8)
    return {
        "png": encode_png(g),
        "gif": encode_gif(idx, pal),
        "bmp": encode_bmp(g),
        "tiff": encode_tiff(g, compression="lzw", predictor=True,
                            rows_per_strip=5),
        "webp": encode_webp(g),
        "webp_anim": encode_webp_animated(frames),
        "wav": encode_wav(tone, 8000),
        "flac": encode_flac(tone, 8000, subframe="fixed"),
        "ogg": encode_vorbis(tone, 8000),
        "jpeg": encode_jpeg(g, quality=85),
        # not a codec, but the same hostile-bytes contract: the WARC
        # parser must map arbitrary corruption to ValueError
        "warc": encode_warc(
            [("http://t.test/a", "2024-01-01T00:00:00Z", b"<p>x</p>")]
        ),
        "avro": _avro_bytes(),
        "tfrecord": _tfrecord_bytes(),
    }


def _avro_bytes():
    import os
    import tempfile

    from ocracle_ray.sources.avro import PAGES_AVRO_SCHEMA, write_avro

    rows = [{"url": f"http://t.test/{i}", "warc_ts": 1000 + i,
             "html": b"<p>x</p>" * (i + 1), "lang": "nb"}
            for i in range(4)]
    with tempfile.TemporaryDirectory() as d:
        p = write_avro(os.path.join(d, "f.avro"), PAGES_AVRO_SCHEMA,
                       rows, codec="deflate", block_records=2)
        with open(p, "rb") as f:
            return f.read()


def _tfrecord_bytes():
    import os
    import tempfile

    from ocracle_ray.sources.tfrecord import write_tfrecord

    rows = [{"url": f"http://t.test/{i}", "warc_ts": 1000 + i,
             "html": b"<p>x</p>" * (i + 1), "lang": "nb"}
            for i in range(4)]
    with tempfile.TemporaryDirectory() as d:
        p = write_tfrecord(os.path.join(d, "f.tfrecord"), rows)
        with open(p, "rb") as f:
            return f.read()


def _decoder(name):
    from ocracle_ray.core import bmp, flac, gif, jpeg, png, tiff, vorbis, wav, webp
    from ocracle_ray.sources import warc

    return {
        "png": png.decode_png,
        "gif": gif.decode_gif,
        "bmp": bmp.decode_bmp,
        "tiff": tiff.decode_tiff,
        "webp": webp.decode_webp,
        "webp_anim": webp.decode_webp_frames,
        "wav": wav.decode_wav,
        "flac": flac.decode_flac,
        "ogg": vorbis.decode_vorbis,
        "jpeg": jpeg.decode_jpeg,
        "warc": warc.warc_pages_table,
        "avro": __import__(
            "ocracle_ray.sources.avro", fromlist=["parse_avro"]
        ).parse_avro,
        "tfrecord": __import__(
            "ocracle_ray.sources.tfrecord",
            fromlist=["parse_tfrecord_pages"]
        ).parse_tfrecord_pages,
    }[name]


def _mutations(data: bytes, rng):
    # every truncation length for small files, sampled for larger
    lengths = range(len(data)) if len(data) <= 160 else sorted(
        rng.choice(len(data), 128, replace=False)
    )
    for ln in lengths:
        yield data[:ln]
    # single-byte flips across the whole file (full sweep when small)
    positions = range(len(data)) if len(data) <= 300 else sorted(
        rng.choice(len(data), 256, replace=False)
    )
    for pos in positions:
        b = bytearray(data)
        b[pos] ^= 1 << int(rng.randint(8))
        yield bytes(b)
    # multi-byte scrambles of the header region
    for _ in range(32):
        b = bytearray(data)
        start = int(rng.randint(max(1, len(b) - 8)))
        b[start : start + 8] = rng.bytes(min(8, len(b) - start))
        yield bytes(b)
    # valid magic + random tail
    for n in (4, 16, 128, 512):
        yield data[:12] + rng.bytes(n)


@pytest.mark.parametrize("stage", ["dhash", "audio", "video"])
def test_fuzz_near_dup_stages_skip_rows(stage):
    """End-to-end stage contract for the near-dup key trio: a batch of
    corrupted payloads must produce SKIPPED rows (possibly zero
    output), never an exception — the stages catch exactly STRICT, so
    this also re-checks the decoders through the stage plumbing."""
    import pyarrow as pa

    from ocracle_ray.stages.multimodal import (AudioFingerprint,
                                               ImageDHash,
                                               VideoFrameHash)

    files = _valid_files()
    sources = {
        "dhash": ("png", "gif", "bmp", "tiff", "webp"),
        "audio": ("wav", "flac", "ogg"),
        "video": ("gif", "webp_anim"),
    }[stage]
    make = {"dhash": ImageDHash, "audio": AudioFingerprint,
            "video": VideoFrameHash}[stage]()
    payloads = []
    for name in sources:
        rng = np.random.RandomState(zlib.crc32(b"stage" + name.encode()))
        muts = list(_mutations(files[name], rng))
        payloads.extend(muts[:: max(1, len(muts) // 64)])
    t = pa.table({
        "media_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    })
    out = make(t)  # must not raise
    assert out.num_rows <= len(payloads)


@pytest.mark.parametrize("name", sorted(_valid_files()))
def test_fuzz_decoder_error_contract(name):
    data = _valid_files()[name]
    decode = _decoder(name)
    rng = np.random.RandomState(zlib.crc32(name.encode()))
    strict = name != "jpeg"  # jpeg's stage contract is broad by design
    for i, mut in enumerate(_mutations(data, rng)):
        try:
            decode(mut)
        except STRICT:
            continue
        except Exception as exc:  # noqa: BLE001 — the fuzz assertion
            if strict:
                raise AssertionError(
                    f"{name} mutation {i}: {type(exc).__name__} escaped "
                    f"the (NotImplementedError, ValueError) skip contract: "
                    f"{exc}"
                ) from exc
        # decoding to a (possibly wrong) image is acceptable: a flipped
        # pixel byte is still a valid file

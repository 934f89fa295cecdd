"""Multimodal columns: opaque binary payloads + typed metadata stages.

Design (SURVEY.md multimodal addendum): image/audio/video payloads ride
as ``large_binary`` columns with a ``kind`` tag; decode / feature
extraction / resize / frame-sampling run as actor-pool ``map_batches``
stages with SMALL batch sizes (payloads are wide). The actual codec work
is STUBBED — this container has no PIL/OpenCV/ffmpeg — behind an
import-try: when a real decoder is importable it is used, otherwise a
clearly-marked deterministic fake parses the synthetic payload headers,
so all Ray-side plumbing (schema, actor signature, batch sizing, output
layout) is real and tested.

Synthetic payload formats (produced by ``synth_media_table``):

    image: b"IMG1" + width:uint16 + height:uint16 + pixel bytes
    audio: b"AUD1" + rate:uint16  + n_samples:uint32 + sample bytes
    video: b"VID1" + n_frames:uint16 + frame_len:uint16 + frames bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

try:  # pragma: no cover — not installed in this container
    from PIL import Image  # type: ignore
except ImportError:
    Image = None

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows (counter-based RNG)."""
    import random

    from ..core.textstats import fnv1a64

    ids, kinds, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        rng = random.Random(fnv1a64(f"media-{seed}:{i}".encode()))
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = rng.randint(4, 64), rng.randint(4, 64)
            body = bytes(rng.getrandbits(8) for _ in range(w * h))
            payload = b"IMG1" + struct.pack("<HH", w, h) + body
        elif kind == "audio":
            rate, ns = 8000, rng.randint(16, 256)
            body = bytes(rng.getrandbits(8) for _ in range(ns))
            payload = b"AUD1" + struct.pack("<HI", rate, ns) + body
            w = h = 0
        else:
            nf, fl = rng.randint(2, 12), rng.randint(8, 32)
            body = bytes(rng.getrandbits(8) for _ in range(nf * fl))
            payload = b"VID1" + struct.pack("<HH", nf, fl) + body
            w, h = fl, nf
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        ws.append(w if kind == "image" else 0)
        hs.append(h if kind == "image" else 0)
    return pa.Table.from_pydict(
        {"media_id": ids, "kind": kinds, "payload": payloads, "width": ws, "height": hs},
        schema=MEDIA_SCHEMA,
    )


class _ImageDecoder:
    """Shared payload sniff+decode for the image stages (bound once per
    actor in each stage's ``__init__``). ``decode`` returns
    ``(w, h, pixels)`` with pixels ``(h, w)`` u8 gray (IMG1) or
    ``(h, w, ch)`` u8 (real codecs), ``None`` for a malformed payload
    of a KNOWN container (skip-row contract), and raises the honest
    PIL-gate ``NotImplementedError`` for unknown containers."""

    def __init__(self):
        from ..core.bmp import decode_bmp, is_bmp
        from ..core.gif import decode_gif, is_gif
        from ..core.jpeg import decode_jpeg, is_jpeg
        from ..core.png import decode_png, is_png
        from ..core.tiff import decode_tiff, is_tiff
        from ..core.webp import decode_webp, is_webp

        # (sniff, decode, exceptions-that-mean-skip-row)
        self._codecs = (
            (is_png, decode_png, (NotImplementedError, ValueError)),
            (is_gif, decode_gif, (NotImplementedError, ValueError)),
            (is_bmp, decode_bmp, (NotImplementedError, ValueError)),
            (is_tiff, decode_tiff, (NotImplementedError, ValueError)),
            # lossless VP8L decodes; lossy VP8 raises the honest
            # NotImplementedError -> skip-row, like arithmetic JPEG
            (is_webp, decode_webp, (NotImplementedError, ValueError)),
            # broad on purpose: truncated JPEG headers raise
            # struct.error / IndexError, not just ValueError (same
            # contract as figures._decode)
            (is_jpeg, decode_jpeg, (Exception,)),
        )

    def decode(self, payload: bytes):
        if payload[:4] == b"IMG1":
            w, h = struct.unpack("<HH", payload[4:8])
            px = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
            if len(px) != w * h:
                return None
            return w, h, px.reshape(h, w)
        for sniff, dec, skip_on in self._codecs:
            if sniff(payload):
                try:
                    w, h, _ch, px = dec(payload)
                    return w, h, px
                except skip_on:
                    return None
        raise NotImplementedError(
            "image decode requires PIL, which is not installed in this "
            "container; IMG1 synthetic and stdlib PNG/JPEG/GIF/BMP/TIFF/"
            "WebP-lossless payloads are supported"
        )


class ImageFeatures:
    """Actor-pool image decode + feature extraction.

    Three decode paths, same output schema:

    - IMG1 synthetic header (byte statistics),
    - real PNG via the stdlib decoder (``core.png`` — zlib inflate +
      scanline unfilter, no PIL needed),
    - real baseline AND progressive JPEG via the stdlib decoder
      (``core.jpeg``; progressive added round 4 — spectral selection,
      successive approximation, EOB runs),
    - real GIF via the stdlib decoder (``core.gif`` — LZW, interlace,
      transparency; first frame),
    - real BMP via the stdlib decoder (``core.bmp`` — 8/24-bit BI_RGB),
    - real lossless WebP via the stdlib decoder (``core.webp`` —
      VP8L prefix codes, LZ77, color cache, all four transforms),
    - real TIFF via the stdlib decoder (``core.tiff`` — strips,
      none/LZW/PackBits, predictor, palette/gray/RGB),
    - anything else (arithmetic JPEG, webp, CCITT-fax TIFF) needs PIL;
      absent in this container, so a clearly-marked
      ``NotImplementedError``.
    """

    def __init__(self):
        self.real = Image is not None
        self._dec = _ImageDecoder()  # binds the codecs once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, w_out, h_out, means = [], [], [], []
        for mid, kind, payload in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(), t["payload"].to_pylist()
        ):
            if kind != "image":
                continue
            res = self._dec.decode(payload)  # unknown container raises
            if res is None:  # known container, damaged/gated content
                if not self.real:
                    raise NotImplementedError(
                        "image decode requires PIL, which is not "
                        "installed in this container; the payload's "
                        "container is known but its content did not "
                        "decode with the stdlib codecs"
                    )
                continue  # pragma: no cover — PIL path not exercised here
            w, h, px = res
            ids.append(mid)
            w_out.append(w)
            h_out.append(h)
            means.append(round(float(px.mean()) if px.size else 0.0, 4))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(w_out, pa.int32()),
                "height": pa.array(h_out, pa.int32()),
                "mean_intensity": pa.array(means, pa.float64()),
            }
        )


class AudioFeatures:
    """Actor-pool audio decode + feature extraction: duration, RMS and
    peak amplitude per clip. Decode paths: AUD1 synthetic header (raw
    u8 samples), real WAV via the stdlib codec (``core.wav`` — PCM
    8/16/24/32-bit, G.711 mu-law/A-law, IMA ADPCM,
    WAVE_FORMAT_EXTENSIBLE), real FLAC via ``core.flac`` (all subframe
    types, Rice partitions, stereo decorrelation modes), real Ogg
    Vorbis via ``core.vorbis`` (self-describing codebooks, floor1,
    residue 1/2, MDCT), real MPEG-1 Layer I/II via ``core.mpeg1audio``
    (round 5 — spec-exact subband decode, PCM via the documented
    substitute prototype; see that module's exactness notes); mp3
    (Layer III)/aac still honestly raise — their Huffman spec tables
    are absent in this sandbox."""

    def __init__(self):
        # bind once per actor
        from ..core.flac import decode_flac, is_flac
        from ..core.mpeg1audio import decode_mpeg1_audio, is_mpeg_audio
        from ..core.vorbis import decode_vorbis, is_ogg
        from ..core.wav import decode_wav, is_wav

        self._decode_wav = decode_wav
        self._is_wav = is_wav
        self._decode_flac = decode_flac
        self._is_flac = is_flac
        self._decode_vorbis = decode_vorbis
        self._is_ogg = is_ogg
        self._decode_mpeg = decode_mpeg1_audio
        self._is_mpeg = is_mpeg_audio

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, rates, ns, durs, rms_out, peaks = [], [], [], [], [], []
        for mid, kind, payload in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(), t["payload"].to_pylist()
        ):
            if kind != "audio":
                continue
            if payload[:4] == b"AUD1":
                rate, n = struct.unpack("<HI", payload[4:10])
                raw = np.frombuffer(payload[10 : 10 + n], np.uint8).astype(np.float64)
                samples = ((raw - 128.0) / 128.0).reshape(-1, 1)
            elif self._is_wav(payload):
                rate, _ch, samples = self._decode_wav(payload)
            elif self._is_flac(payload):
                rate, _ch, samples = self._decode_flac(payload)
            elif self._is_ogg(payload):
                rate, _ch, samples = self._decode_vorbis(payload)
            elif self._is_mpeg(payload):
                rate, _ch, samples = self._decode_mpeg(payload)
            else:
                raise NotImplementedError(
                    "mp3 (Layer III)/aac decode requires codec Huffman "
                    "spec tables absent in this sandbox; AUD1 synthetic, "
                    "WAV, FLAC, Ogg-Vorbis and MPEG-1 Layer I/II payloads "
                    "are supported"
                )
            mono = samples.mean(axis=1)
            ids.append(mid)
            rates.append(int(rate))
            ns.append(len(mono))
            durs.append(round(len(mono) / rate, 6) if rate else 0.0)
            rms_out.append(round(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0, 6))
            peaks.append(round(float(np.max(np.abs(mono))) if len(mono) else 0.0, 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "rms": pa.array(rms_out, pa.float64()),
                "peak": pa.array(peaks, pa.float64()),
            }
        )


class Resize:
    """Deterministic nearest-neighbour resize over ANY supported image
    payload (round 4: real codecs, not just the IMG1 fake). IMG1 input
    stays IMG1 (the synthetic container round-trips); real-codec input
    (PNG/JPEG/GIF/BMP/TIFF) decodes via the shared ``_ImageDecoder``
    and re-encodes as PNG (the repo's real encoder). Nearest-neighbour
    is chosen over area-average for bit-exact determinism across
    numpy versions; damaged known-container payloads are skipped
    (feature stages own the loud-gate contract)."""

    def __init__(self, target: int = 16):
        from ..core.png import encode_png  # bind once per actor

        self.target = target
        self._dec = _ImageDecoder()
        self._encode_png = encode_png

    def _nn(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape[:2]
        ty = np.linspace(0, h - 1, self.target).round().astype(int)
        tx = np.linspace(0, w - 1, self.target).round().astype(int)
        return px[np.ix_(ty, tx)]

    def __call__(self, t: pa.Table) -> pa.Table:
        out_ids, out_payloads = [], []
        for mid, kind, payload in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(), t["payload"].to_pylist()
        ):
            if kind != "image":
                continue
            res = self._dec.decode(payload)  # unknown container raises
            if res is None:
                continue  # damaged content: skip-row
            _w, _h, px = res
            small = self._nn(px)
            if payload[:4] == b"IMG1":
                out_payloads.append(
                    b"IMG1"
                    + struct.pack("<HH", self.target, self.target)
                    + small.tobytes()
                )
            else:
                out_payloads.append(self._encode_png(small))
            out_ids.append(mid)
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.int64()),
                "payload": pa.array(out_payloads, pa.large_binary()),
            }
        )


class FrameSample:
    """Video frame sampling: every k-th frame -> one row per frame.

    Three payload formats: the VID1 synthetic container (opaque frame
    bytes) and REAL animated GIF / animated WebP via ``core.gif`` /
    ``core.webp`` (each sampled frame is the composited RGB canvas at
    that point of the animation, as raw ``h*w*3`` bytes)."""

    def __init__(self, every: int = 2):
        # once per actor
        from ..core.gif import decode_gif_frames, is_gif
        from ..core.webp import decode_webp_frames, is_webp

        self.every = every
        self._decode_gif_frames = decode_gif_frames
        self._is_gif = is_gif
        self._decode_webp_frames = decode_webp_frames
        self._is_webp = is_webp

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, kind, payload in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(), t["payload"].to_pylist()
        ):
            if kind != "video":
                continue
            if self._is_gif(payload) or self._is_webp(payload):
                if self._is_gif(payload):
                    _w, _h, canvases = self._decode_gif_frames(payload)
                else:
                    _w, _h, canvases = self._decode_webp_frames(payload)
                for f in range(0, len(canvases), self.every):
                    ids.append(mid)
                    fidx.append(f)
                    frames.append(canvases[f].tobytes())
                continue
            if payload[:4] != b"VID1":
                continue
            nf, fl = struct.unpack("<HH", payload[4:8])
            body = payload[8:]
            for f in range(0, nf, self.every):
                ids.append(mid)
                fidx.append(f)
                frames.append(body[f * fl : (f + 1) * fl])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def media_pipeline(ds, *, batch_size: int = 32, concurrency=2):
    """image features over a media Dataset (small batches: wide rows)."""
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageDHash:
    """Actor-pool perceptual image hashing — dHash (difference hash),
    the image-side near-dup key a multimodal corpus dedups on (the
    text side's simhash analogue): decode → integer luma → 9×8
    nearest-neighbour downsample (the Resize index rule,
    ``(i·src)//dst``) → 64 adjacent-column comparisons packed MSB-first
    into a signed int64. Integer end to end after the decode, so a
    written (media_id, gray[72]) artifact lets SQL re-derive every
    bit, the packed hash, and every hamming pair independently — only
    the codec decode is trusted (unit-tested separately).

    Returns one row per DECODABLE image: (media_id, dhash,
    gray list<int64> of the 72 luma samples, row-major 8×9).
    Malformed payloads of known containers skip (the stage contract).
    """

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self._decoder = _ImageDecoder()

    @staticmethod
    def _dhash_gray(px: np.ndarray) -> tuple[int, np.ndarray]:
        if px.ndim == 3 and px.shape[2] >= 3:
            p = px[:, :, :3].astype(np.int64)
            # integer Rec.601 luma — exact, floor division
            g = (299 * p[:, :, 0] + 587 * p[:, :, 1]
                 + 114 * p[:, :, 2]) // 1000
        elif px.ndim == 3:  # (h, w, 1) single-channel decode
            g = px[:, :, 0].astype(np.int64)
        else:
            g = px.astype(np.int64)
        h, w = g.shape
        ri = (np.arange(8, dtype=np.int64) * h) // 8
        ci = (np.arange(9, dtype=np.int64) * w) // 9
        small = g[np.ix_(ri, ci)]  # (8, 9)
        bits = (small[:, :8] < small[:, 1:]).reshape(64)
        packed = int.from_bytes(np.packbits(bits).tobytes(), "big")
        if packed >= 1 << 63:
            packed -= 1 << 64
        return packed, small.reshape(72)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, hashes, grays = [], [], []
        for mid, payload in zip(t[self.id_col].to_pylist(),
                                t[self.payload_col].to_pylist()):
            try:
                px = self._decoder.decode(payload)
            except (NotImplementedError, ValueError):
                # unrecognized container (the decoder raises its
                # no-PIL gate) or malformed known container → skip
                # row, the stage contract (found by the stage fuzz)
                px = None
            if px is None:
                continue
            _w, _h, arr = px
            dh, gray = self._dhash_gray(arr)
            ids.append(mid)
            hashes.append(dh)
            grays.append(gray.tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "dhash": pa.array(hashes, pa.int64()),
            "gray": pa.array(grays, pa.list_(pa.int64())),
        })


class VideoFrameHash:
    """Actor-pool video perceptual hashing — the video member of the
    near-dup key trio (ImageDHash / AudioFingerprint / this): decode
    the animation (animated GIF or animated lossless WebP — the repo's
    two real video branches), sample every k-th composited canvas
    (FrameSample's rule), dHash each sampled frame. A video's
    fingerprint is the ORDERED frame-hash sequence; two videos match
    when the total hamming over their common sampled frame indices is
    small. Per-frame luma samples are the written artifact, so SQL
    re-derives every frame hash and every pair — only the codec
    decode is trusted.

    Returns one row per (decodable video, sampled frame):
    (media_id, frame_index, dhash, gray[72]). Undecodable or
    non-animation payloads skip (the stage contract)."""

    def __init__(self, every: int = 2, payload_col: str = "payload",
                 id_col: str = "media_id"):
        from ..core.gif import decode_gif_frames, is_gif
        from ..core.webp import decode_webp_frames, is_webp

        self.every = every
        self.payload_col = payload_col
        self.id_col = id_col
        self._gif = (is_gif, decode_gif_frames)
        self._webp = (is_webp, decode_webp_frames)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, hashes, grays = [], [], [], []
        for mid, payload in zip(t[self.id_col].to_pylist(),
                                t[self.payload_col].to_pylist()):
            canvases = None
            for sniff, dec in (self._gif, self._webp):
                if sniff(payload):
                    try:
                        _w, _h, canvases = dec(payload)
                    except (NotImplementedError, ValueError):
                        canvases = None
                    break
            if not canvases:
                continue
            for f in range(0, len(canvases), self.every):
                dh, gray = ImageDHash._dhash_gray(canvases[f])
                ids.append(mid)
                fidx.append(f)
                hashes.append(dh)
                grays.append(gray.tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int64()),
            "dhash": pa.array(hashes, pa.int64()),
            "gray": pa.array(grays, pa.list_(pa.int64())),
        })


class AudioFingerprint:
    """Actor-pool spectral audio fingerprinting — the Haitsma–Kalker
    (2002) scheme, the audio-side near-dup key next to ImageDHash:
    decode → mono mean → 17 equal segments → per-segment rfft band
    energies (9 equal bins-1..K bands, rounded to int64 milli-units) →
    128 sign bits of the time×band second difference
    (ΔE[t,b] − ΔE[t,b+1] > 0), packed MSB-first into two signed
    int64s. The energy matrix is the written artifact, so SQL
    re-derives every bit, both packed halves and every hamming pair —
    only the decode + rfft are trusted (codecs unit-tested; the bit
    rule is integer on both sides).

    Clips shorter than 17·64 mono samples skip (the stage contract);
    the fingerprint survives lossless re-encoding exactly (FLAC ≡
    PCM), G.711 companding and small additive noise (asserted by the
    query's fixture families)."""

    N_SEG = 17
    N_BANDS = 9

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id"):
        from ..core.flac import decode_flac, is_flac
        from ..core.mpeg1audio import decode_mpeg1_audio, is_mpeg_audio
        from ..core.vorbis import decode_vorbis, is_ogg
        from ..core.wav import decode_wav, is_wav

        self.payload_col = payload_col
        self.id_col = id_col
        self._codecs = ((is_wav, decode_wav), (is_flac, decode_flac),
                        (is_ogg, decode_vorbis),
                        (is_mpeg_audio, decode_mpeg1_audio))

    @classmethod
    def _energies(cls, mono: np.ndarray) -> np.ndarray | None:
        L = len(mono) // cls.N_SEG
        if L < 64:
            return None
        segs = mono[: L * cls.N_SEG].reshape(cls.N_SEG, L)
        mag2 = np.abs(np.fft.rfft(segs, axis=1)) ** 2
        K = L // 2  # bins 1..K (DC excluded)
        per = K // cls.N_BANDS
        e = np.zeros((cls.N_SEG, cls.N_BANDS), np.float64)
        for b in range(cls.N_BANDS):
            e[:, b] = mag2[:, 1 + b * per: 1 + (b + 1) * per].sum(axis=1)
        return np.floor(e * 1000.0 + 0.5).astype(np.int64)

    @classmethod
    def _pack_bits(cls, ei: np.ndarray) -> tuple[int, int]:
        d = ei[1:, :] - ei[:-1, :]             # (16, 9)
        bits = (d[:, :-1] - d[:, 1:]) > 0      # (16, 8)
        flat = bits.reshape(128)
        raw = int.from_bytes(np.packbits(flat).tobytes(), "big")
        hi, lo = raw >> 64, raw & ((1 << 64) - 1)
        return (hi - (1 << 64) if hi >= 1 << 63 else hi,
                lo - (1 << 64) if lo >= 1 << 63 else lo)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, his, los, es = [], [], [], []
        for mid, payload in zip(t[self.id_col].to_pylist(),
                                t[self.payload_col].to_pylist()):
            samples = None
            for sniff, dec in self._codecs:
                if sniff(payload):
                    try:
                        _rate, _ch, samples = dec(payload)
                    except (NotImplementedError, ValueError):
                        samples = None
                    break
            if samples is None:
                continue
            mono = samples.mean(axis=1) if samples.ndim == 2 else samples
            ei = self._energies(np.asarray(mono, np.float64))
            if ei is None:
                continue
            hi, lo = self._pack_bits(ei)
            ids.append(mid)
            his.append(hi)
            los.append(lo)
            es.append(ei.reshape(-1).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "hash_hi": pa.array(his, pa.int64()),
            "hash_lo": pa.array(los, pa.int64()),
            "e": pa.array(es, pa.list_(pa.int64())),
        })

"""AES-encrypted PDFs (core/aes.py + core/pdfcrypt.py V4/AESV2 and
V5-R6/AESV3) — FIPS-197 known answers, text parity with unencrypted
twins, and the locked-file loud-raise contract."""

import numpy as np
import pytest

from ocracle_ray.core.aes import (
    cbc_decrypt,
    cbc_encrypt,
    ecb_decrypt_blocks,
    ecb_encrypt_blocks,
    expand_key,
)
from ocracle_ray.core.pdf import parse_pdf_blocks
from ocracle_ray.core.pdfcrypt import alg2b, compute_r6_user
from ocracle_ray.sources.realpdf import build_exam_pdf, build_exam_pdf_encrypted

# FIPS-197 Appendix C: one plaintext, all three key sizes
_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_VECTORS = [
    ("000102030405060708090a0b0c0d0e0f",
     "69c4e0d86a7b0430d8cdb78070b4c55a"),
    ("000102030405060708090a0b0c0d0e0f1011121314151617",
     "dda97ca4864cdfe06eaf70a0ec0d7191"),
    ("000102030405060708090a0b0c0d0e0f"
     "101112131415161718191a1b1c1d1e1f",
     "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.mark.parametrize("key_hex,ct_hex", _VECTORS)
def test_fips197_known_answers(key_hex, ct_hex):
    rk = expand_key(bytes.fromhex(key_hex))
    blocks = np.frombuffer(_PT, np.uint8).reshape(1, 16)
    ct = ecb_encrypt_blocks(rk, blocks)
    assert ct.tobytes().hex() == ct_hex
    assert ecb_decrypt_blocks(rk, ct).tobytes() == _PT


def test_cbc_round_trip_and_padding():
    key = bytes.fromhex(_VECTORS[0][0])
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 1000):
        data = bytes((i * 7 + 3) & 0xFF for i in range(n))
        ct = cbc_encrypt(key, iv, data)
        assert len(ct) % 16 == 0 and len(ct) > len(data)
        assert cbc_decrypt(key, iv, ct) == data
    with pytest.raises(ValueError, match="padding"):
        cbc_decrypt(key, iv, bytes(16))


def test_cbc_decrypt_is_blockwise_parallel_consistent():
    """Multi-block CBC decrypt (the vectorized path) equals
    block-at-a-time decryption."""
    key = bytes.fromhex(_VECTORS[2][0])
    iv = bytes(16)
    data = bytes(range(256)) * 2
    ct = cbc_encrypt(key, iv, data, pad=False)
    serial = b""
    prev = iv
    rk = expand_key(key)
    for i in range(0, len(ct), 16):
        blk = ecb_decrypt_blocks(
            rk, np.frombuffer(ct[i: i + 16], np.uint8).reshape(1, 16)
        ).tobytes()
        serial += bytes(a ^ b for a, b in zip(blk, prev))
        prev = ct[i: i + 16]
    assert cbc_decrypt(key, iv, ct, unpad=False) == serial == data


def test_alg2b_properties():
    """Algorithm 2.B is deterministic, salt-sensitive and 32 bytes."""
    a = alg2b(b"", b"saltsalt")
    assert len(a) == 32
    assert alg2b(b"", b"saltsalt") == a
    assert alg2b(b"", b"SALTSALT") != a
    assert alg2b(b"pw", b"saltsalt") != a


def test_r6_user_unwrap_round_trip():
    fk = bytes(range(32))
    u, ue = compute_r6_user(b"", fk, b"seed")
    assert len(u) == 48 and len(ue) == 32
    assert alg2b(b"", u[32:40]) == u[:32]
    ik = alg2b(b"", u[40:48])
    assert cbc_decrypt(ik, b"\x00" * 16, ue, unpad=False) == fk


@pytest.mark.parametrize("mode", ["aesv2", "aesv3"])
@pytest.mark.parametrize("i", [0, 1, 6, 7])  # plain + Flate streams
def test_aes_text_parity_with_unencrypted_twin(mode, i):
    plain = [b.text for b in parse_pdf_blocks(build_exam_pdf(i))]
    enc = [b.text for b in parse_pdf_blocks(
        build_exam_pdf_encrypted(i, mode=mode))]
    assert plain == enc and plain


@pytest.mark.parametrize("mode", ["aesv2", "aesv3"])
def test_aes_locked_file_raises(mode):
    locked = build_exam_pdf_encrypted(3, mode=mode, user_pw=b"hunter2")
    with pytest.raises(NotImplementedError, match="password-locked"):
        parse_pdf_blocks(locked)


def test_mode_cycle_covers_all_four():
    """The fixture dispatch exercises every scheme across the ids the
    realpdf table marks encrypted (i%5==4, i%3!=2)."""
    ids = [i for i in range(60) if i % 5 == 4 and i % 3 != 2]
    modes = {("rc4-40", "rc4-128", "aesv2", "aesv3")[(i // 5) % 4]
             for i in ids}
    assert modes == {"rc4-40", "rc4-128", "aesv2", "aesv3"}
    for i in ids[:8]:
        plain = [b.text for b in parse_pdf_blocks(build_exam_pdf(i))]
        enc = [b.text for b in parse_pdf_blocks(build_exam_pdf_encrypted(i))]
        assert plain == enc and plain

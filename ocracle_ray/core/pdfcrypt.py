"""Standard-security-handler RC4 decryption for the stdlib PDF parser.

Scope (VERDICT r3 #7): the EMPTY-user-password case — the overwhelming
share of "encrypted" PDFs in a web crawl are owner-locked files any
viewer opens transparently (the reference gets this for free from
PyMuPDF, ``scripts/task_boundaries.py:51``). Pure stdlib (hashlib.md5
+ a python RC4): Standard handler, ``/V`` 1-2 / ``/R`` 2-3 (RC4-40
and RC4-128). ``/V`` 4+ (AES) and files whose ``/U`` check fails under
the empty password still raise the clearly-marked
``NotImplementedError`` — genuinely locked files stay loud error rows.

Spec references: PDF 1.7 §7.6.3.3 algorithms 2 (key), 3 (/O),
4/5 (/U). Only STREAM data is decrypted here: the parser reads text
exclusively from content/ObjStm streams, and strings inside a stream
are enciphered as part of the stream, not individually.
"""

from __future__ import annotations

import hashlib
import re
import struct

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9a-fA-F]*)>")
_INT_RE = {
    k: re.compile(rb"/" + k.encode() + rb"\s+(-?\d+)")
    for k in ("V", "R", "P", "Length")
}
_FILTER_RE = re.compile(rb"/Filter\s*/(\w+)")
_STR_RE = {
    k: re.compile(rb"/" + k.encode() + rb"\s*(<[0-9a-fA-F\s]*>|\()")
    for k in ("O", "U")
}
_OCT_RE = re.compile(rb"\\([0-7]{1,3})")


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (python loop — streams here are fixture/KB scale; a
    100-TB crawl would run this inside the Extract actor pool where the
    per-doc cost is already dominated by parsing)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pdf_string_at(body: bytes, m: re.Match) -> bytes:
    """Decode the PDF string starting at m.end()-1 (hex or literal)."""
    tok = m.group(1)
    if tok.startswith(b"<"):
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode())
    # literal string: scan from the '(' for the balanced close, honoring
    # backslash escapes; then unescape \\ \( \) and octal
    start = m.end()  # byte AFTER the '('
    depth, i, out = 1, start, bytearray()
    while i < len(body) and depth:
        c = body[i : i + 1]
        if c == b"\\":
            nxt = body[i + 1 : i + 2]
            om = _OCT_RE.match(body, i)
            if om:
                out.append(int(om.group(1), 8))
                i = om.end()
                continue
            out.extend({b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\f"}.get(nxt, nxt))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                break
        out.extend(c)
        i += 1
    return bytes(out)


def _derive_key(o: bytes, p: int, id0: bytes, n: int, r: int,
                user_pw: bytes = b"") -> bytes:
    """Algorithm 2: the file encryption key for ``user_pw``."""
    padded = (user_pw + PAD)[:32]
    h = hashlib.md5(
        padded + o[:32] + struct.pack("<i", p) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O value (fixture-side encryptor)."""
    padded_owner = ((owner_pw or user_pw) + PAD)[:32]
    h = hashlib.md5(padded_owner).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = rc4(key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (r=2) / 5 (r=3): the /U value."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # arbitrary 16-byte pad per spec


def object_key(key: bytes, objnum: int, gennum: int = 0) -> bytes:
    """Per-object RC4 key (Algorithm 1 step b-c)."""
    h = hashlib.md5(
        key + struct.pack("<I", objnum)[:3] + struct.pack("<I", gennum)[:2]
    ).digest()
    return h[: min(len(key) + 5, 16)]


def decrypt_objects(objects: dict[int, bytes], payload: bytes) -> dict[int, bytes]:
    """Return a copy of ``objects`` with every stream's raw bytes
    RC4-decrypted under the EMPTY user password. Raises
    ``NotImplementedError`` when the handler/version is unsupported or
    the /U check fails (a genuinely password-locked file)."""
    ref = _ENCRYPT_REF_RE.search(payload)
    if not ref:
        return objects
    enc_id = int(ref.group(1))
    enc = objects.get(enc_id)
    if enc is None:
        raise NotImplementedError("encrypted PDF: /Encrypt object missing")
    fm = _FILTER_RE.search(enc)
    v = int(_INT_RE["V"].search(enc).group(1)) if _INT_RE["V"].search(enc) else 0
    r = int(_INT_RE["R"].search(enc).group(1)) if _INT_RE["R"].search(enc) else 2
    if not fm or fm.group(1) != b"Standard" or v not in (1, 2) or r not in (2, 3):
        raise NotImplementedError(
            f"encrypted PDF: unsupported security handler "
            f"(Filter={fm.group(1).decode() if fm else '?'}, V={v}, R={r}); "
            f"stdlib decrypt covers Standard RC4 V1-2/R2-3 only"
        )
    pm = _INT_RE["P"].search(enc)
    lm = _INT_RE["Length"].search(enc)
    p = int(pm.group(1)) if pm else -1
    n = (int(lm.group(1)) // 8) if lm else 5
    om = _STR_RE["O"].search(enc)
    um = _STR_RE["U"].search(enc)
    if not om or not um:
        raise NotImplementedError("encrypted PDF: /O or /U missing")
    o_val = _pdf_string_at(enc, om)
    u_val = _pdf_string_at(enc, um)
    idm = _ID_RE.search(payload)
    id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""

    key = _derive_key(o_val, p, id0, n, r)
    expect_u = compute_u(key, id0, r)
    ok = (expect_u[:16] == u_val[:16]) if r >= 3 else (expect_u == u_val[:32])
    if not ok:
        raise NotImplementedError(
            "encrypted PDF: /U check failed under the empty user password "
            "— password-locked file; stdlib decrypt cannot open it"
        )

    from .pdf import _raw_stream_span  # lazy: avoids an import cycle

    out: dict[int, bytes] = {}
    for oid, body in objects.items():
        if oid == enc_id:
            out[oid] = body
            continue
        span = _raw_stream_span(body)
        if span is None:
            out[oid] = body
            continue
        s, e = span
        out[oid] = body[:s] + rc4(object_key(key, oid), body[s:e]) + body[e:]
    return out

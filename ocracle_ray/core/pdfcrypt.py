"""Standard-security-handler decryption for the stdlib PDF parser.

Scope (VERDICT r3 #7, completed round 4): the EMPTY-user-password case
— the overwhelming share of "encrypted" PDFs in a web crawl are
owner-locked files any viewer opens transparently (the reference gets
this for free from PyMuPDF, ``scripts/task_boundaries.py:51``). Pure
stdlib + the in-repo AES (core/aes.py):

- Standard handler ``/V`` 1-2 / ``/R`` 2-3 — RC4-40 / RC4-128.
- ``/V`` 4 / ``/R`` 4 crypt filters — ``/CFM /V2`` (RC4) and
  ``/CFM /AESV2`` (AES-128-CBC, 16-byte IV stream prefix, PKCS#7),
  including the ``/EncryptMetadata false`` key-derivation variant.
- ``/V`` 5 / ``/R`` 6 — ``/CFM /AESV3`` (AES-256): the ISO 32000-2
  Algorithm 2.B hardened hash validates ``/U`` and unwraps the file
  key from ``/UE``; the file key IS the object key (no per-object
  derivation at R6).

Files whose ``/U`` check fails under the empty password, and handlers
outside the list above, still raise the clearly-marked
``NotImplementedError`` — genuinely locked files stay loud error rows.

Spec references: PDF 1.7 §7.6.3.3 algorithms 2 (key), 3 (/O), 4/5
(/U); PDF 2.0 §7.6.4.3.3/4 algorithms 2.A/2.B (R6). Only STREAM data
is decrypted here: the parser reads text exclusively from
content/ObjStm streams, and strings inside a stream are enciphered as
part of the stream, not individually.
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
_CFM_RE = re.compile(rb"/CFM\s*/(\w+)")
_ENCMETA_RE = re.compile(rb"/EncryptMetadata\s+(true|false)")
_STR_RE = {
    k: re.compile(rb"/" + k.encode() + rb"\s*(<[0-9a-fA-F\s]*>|\()")
    for k in ("OE", "UE", "O", "U")  # longest first: /UE must not match /U
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
                user_pw: bytes = b"", *,
                encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key for ``user_pw``. At R4 an
    ``/EncryptMetadata false`` dictionary appends ``FF FF FF FF`` to
    the hash input (PDF 1.7 §7.6.3.3 step f)."""
    padded = (user_pw + PAD)[:32]
    tail = b"" if encrypt_metadata or r < 4 else b"\xff\xff\xff\xff"
    h = hashlib.md5(
        padded + o[:32] + struct.pack("<i", p) + id0 + tail
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


import functools


@functools.lru_cache(maxsize=256)
def alg2b(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 hardened password hash:
    SHA-256 seed, then rounds of AES-128-CBC over 64 copies of
    (pw || K || udata) with the digest choice steered by the
    ciphertext; at least 64 rounds, stop when the last ciphertext byte
    is <= round - 32."""
    from .aes import cbc_encrypt

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def compute_r6_user(user_pw: bytes, file_key: bytes,
                    salt_seed: bytes) -> tuple[bytes, bytes]:
    """Fixture-side Algorithm 8: the 48-byte /U (hash + validation
    salt + key salt, salts derived deterministically from
    ``salt_seed``) and the 32-byte /UE wrapping ``file_key``."""
    from .aes import cbc_encrypt

    salts = hashlib.sha256(b"r6-salts:" + salt_seed).digest()
    vsalt, ksalt = salts[:8], salts[8:16]
    u = alg2b(user_pw, vsalt) + vsalt + ksalt
    ik = alg2b(user_pw, ksalt)
    ue = cbc_encrypt(ik, b"\x00" * 16, file_key, pad=False)
    return u, ue


def compute_r6_owner(owner_pw: bytes, file_key: bytes, u48: bytes,
                     salt_seed: bytes) -> tuple[bytes, bytes]:
    """Fixture-side Algorithm 9: /O and /OE (udata = the full /U)."""
    from .aes import cbc_encrypt

    salts = hashlib.sha256(b"r6-osalts:" + salt_seed).digest()
    vsalt, ksalt = salts[:8], salts[8:16]
    o = alg2b(owner_pw, vsalt, u48) + vsalt + ksalt
    ik = alg2b(owner_pw, ksalt, u48)
    oe = cbc_encrypt(ik, b"\x00" * 16, file_key, pad=False)
    return o, oe


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


def object_key(key: bytes, objnum: int, gennum: int = 0,
               *, aes: bool = False) -> bytes:
    """Per-object key (Algorithm 1 step b-c); AESV2 appends the
    ``sAlT`` constant to the MD5 input."""
    h = hashlib.md5(
        key + struct.pack("<I", objnum)[:3] + struct.pack("<I", gennum)[:2]
        + (b"sAlT" if aes else b"")
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
    cfm_m = _CFM_RE.search(enc)
    cfm = cfm_m.group(1) if cfm_m else None
    supported = (
        (fm is not None and fm.group(1) == b"Standard")
        and (
            (v in (1, 2) and r in (2, 3))
            or (v == 4 and r == 4 and cfm in (b"V2", b"AESV2"))
            or (v == 5 and r == 6 and cfm == b"AESV3")
        )
    )
    if not supported:
        raise NotImplementedError(
            f"encrypted PDF: unsupported security handler "
            f"(Filter={fm.group(1).decode() if fm else '?'}, V={v}, R={r}, "
            f"CFM={cfm.decode() if cfm else '?'}); stdlib decrypt covers "
            f"Standard RC4 V1-2/R2-3, V4/R4 V2+AESV2 and V5/R6 AESV3 only"
        )
    um = _STR_RE["U"].search(enc)
    if not um:
        raise NotImplementedError("encrypted PDF: /U missing")
    u_val = _pdf_string_at(enc, um)

    if v == 5:
        # R6 (ISO 32000-2): validate /U under the empty password, then
        # unwrap the 32-byte file key from /UE; the file key IS the
        # per-object key at R6
        from .aes import cbc_decrypt

        uem = _STR_RE["UE"].search(enc)
        if not uem or len(u_val) < 48:
            raise NotImplementedError("encrypted PDF: R6 /UE or 48-byte /U missing")
        if alg2b(b"", u_val[32:40]) != u_val[:32]:
            raise NotImplementedError(
                "encrypted PDF: R6 /U check failed under the empty user "
                "password — password-locked file; stdlib decrypt cannot open it"
            )
        ik = alg2b(b"", u_val[40:48])
        key = cbc_decrypt(ik, b"\x00" * 16, _pdf_string_at(enc, uem)[:32],
                          unpad=False)
        use_aes = True
        per_object = False
    else:
        pm = _INT_RE["P"].search(enc)
        lm = _INT_RE["Length"].search(enc)
        p = int(pm.group(1)) if pm else -1
        n = (int(lm.group(1)) // 8) if lm else (16 if v == 4 else 5)
        om = _STR_RE["O"].search(enc)
        if not om:
            raise NotImplementedError("encrypted PDF: /O missing")
        o_val = _pdf_string_at(enc, om)
        idm = _ID_RE.search(payload)
        id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""
        em = _ENCMETA_RE.search(enc)
        encrypt_metadata = not (em and em.group(1) == b"false")

        key = _derive_key(o_val, p, id0, n, r,
                          encrypt_metadata=encrypt_metadata)
        expect_u = compute_u(key, id0, r)
        ok = (expect_u[:16] == u_val[:16]) if r >= 3 else (expect_u == u_val[:32])
        if not ok:
            raise NotImplementedError(
                "encrypted PDF: /U check failed under the empty user password "
                "— password-locked file; stdlib decrypt cannot open it"
            )
        use_aes = cfm == b"AESV2"
        per_object = True

    def _decrypt(data: bytes, oid: int) -> bytes:
        if use_aes:
            from .aes import cbc_decrypt

            k = object_key(key, oid, aes=True) if per_object else key
            if len(data) < 16 or (len(data) - 16) % 16:
                raise NotImplementedError(
                    "encrypted PDF: AES stream not IV + whole blocks"
                )
            return cbc_decrypt(k, data[:16], data[16:], unpad=True)
        return rc4(object_key(key, oid), data)

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
        plain = _decrypt(body[s:e], oid)
        head = body[:s]
        if len(plain) != e - s:
            # AES strips IV + padding: the dict's /Length must track
            # the spliced bytes or the parser's /Length-honoring span
            # would over-read into `endstream`
            head = re.sub(rb"/Length\s+\d+(?!\s+\d+\s+R)",
                          b"/Length %d" % len(plain), head, count=1)
        out[oid] = head + plain + body[e:]
    return out

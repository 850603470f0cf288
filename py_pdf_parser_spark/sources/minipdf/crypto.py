"""Standard security handler (ISO 32000-1 §7.6) — pure stdlib.

Implements the public algorithms 2 (key derivation), 4/5 (/U entry),
and the RC4 / AES-128-CBC (/CFM AESV2) content ciphers, enough to open
password-protected PDFs with revision 2-4 standard encryption (the
reference's tests/data/pdfs/test_protected.pdf is R4 + AESV2).

RC4 is the textbook stream cipher; the AES implementation below is the
standard FIPS-197 decryption path (inverse cipher, 128-bit key),
written for clarity not speed — encrypted PDFs at 100 TB would arrive
pre-decrypted; this exists for correctness parity with the reference's
password tests.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

PAD = (
    b"\x28\xbf\x4e\x5e\x4e\x75\x8a\x41\x64\x00\x4e\x56\xff\xfa\x01\x08"
    b"\x2e\x2e\x00\xb6\xd0\x68\x3e\x80\x2f\x0c\xa9\xfe\x64\x53\x69\x7a"
)


class PDFPasswordIncorrect(Exception):
    """Wrong (or missing) password for an encrypted document.

    Named identically to pdfminer's exception so error-status rows and
    the reference's test_loaders assertions line up by type name.
    """


class PDFEncryptionError(Exception):
    """Unsupported encryption variant."""


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------- AES-128
_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = b"\x01\x02\x04\x08\x10\x20\x40\x80\x1b\x36"


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


_MUL9 = bytes(_gmul(i, 9) for i in range(256))
_MUL11 = bytes(_gmul(i, 11) for i in range(256))
_MUL13 = bytes(_gmul(i, 13) for i in range(256))
_MUL14 = bytes(_gmul(i, 14) for i in range(256))


def _expand_key(key: bytes) -> list:
    """128-bit key schedule: 11 round keys of 16 bytes."""
    words = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        temp = list(words[i - 1])
        if i % 4 == 0:
            temp = temp[1:] + temp[:1]
            temp = [_SBOX[b] for b in temp]
            temp[0] ^= _RCON[i // 4 - 1]
        words.append([words[i - 4][j] ^ temp[j] for j in range(4)])
    return [
        bytes(b for w in words[i : i + 4] for b in w) for i in range(0, 44, 4)
    ]


def _decrypt_block(block: bytes, round_keys: list) -> bytes:
    s = bytearray(b ^ k for b, k in zip(block, round_keys[10]))
    for rnd in range(9, 0, -1):
        # InvShiftRows
        s = bytearray(
            (
                s[0], s[13], s[10], s[7],
                s[4], s[1], s[14], s[11],
                s[8], s[5], s[2], s[15],
                s[12], s[9], s[6], s[3],
            )
        )
        # InvSubBytes + AddRoundKey
        rk = round_keys[rnd]
        s = bytearray(_INV_SBOX[b] ^ k for b, k in zip(s, rk))
        # InvMixColumns
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c : c + 4]
            s[c] = _MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3]
            s[c + 1] = _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3]
            s[c + 2] = _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3]
            s[c + 3] = _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3]
    s = bytearray(
        (
            s[0], s[13], s[10], s[7],
            s[4], s[1], s[14], s[11],
            s[8], s[5], s[2], s[15],
            s[12], s[9], s[6], s[3],
        )
    )
    rk = round_keys[0]
    return bytes(_INV_SBOX[b] ^ k for b, k in zip(s, rk))


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-128-CBC: data = IV || ciphertext; strips PKCS#5 padding."""
    if len(data) < 32 or len(data) % 16:
        return b""  # malformed/empty payloads decrypt to nothing
    round_keys = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        plain = _decrypt_block(block, round_keys)
        out += bytes(p ^ v for p, v in zip(plain, prev))
        prev = block
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


class StandardSecurityHandler:
    """Revision 2-4 standard security handler.

    Verifies the user password against /U (algorithm 4/5 of the spec)
    and produces per-object keys for RC4 (V1/V2) or AES-128 (V4 +
    /CFM AESV2).
    """

    def __init__(self, encrypt: dict, doc_id0: bytes, password: str) -> None:
        self.v = int(encrypt.get("V", 0))
        self.r = int(encrypt.get("R", 2))
        self.length = int(encrypt.get("Length", 40))
        self.o = bytes(encrypt["O"])[:32]
        self.u = bytes(encrypt["U"])[:32]
        self.p = int(encrypt["P"])
        self.doc_id0 = doc_id0
        self.encrypt_metadata = bool(encrypt.get("EncryptMetadata", True))
        self.cfm = "V2"  # RC4 by default
        if self.v == 4:
            cf = encrypt.get("CF", {}) or {}
            stmf = encrypt.get("StmF")
            stmf_name = getattr(stmf, "value", "Identity")
            spec = cf.get(stmf_name, {}) if isinstance(cf, dict) else {}
            cfm = spec.get("CFM") if isinstance(spec, dict) else None
            self.cfm = getattr(cfm, "value", "V2")
            if "Length" in (spec or {}):
                # CF /Length is in BYTES (16), /Encrypt /Length in bits
                ln = int(spec["Length"])
                self.length = ln * 8 if ln <= 40 else ln
        if self.v not in (1, 2, 4) or self.r not in (2, 3, 4):
            raise PDFEncryptionError(
                f"unsupported encryption V={self.v} R={self.r}"
            )
        if self.cfm not in ("V2", "AESV2"):
            raise PDFEncryptionError(f"unsupported CFM {self.cfm}")
        self.key = self._authenticate(password or "")

    def _compute_key(self, password: str) -> bytes:
        """Algorithm 2: encryption key from the (user) password."""
        pw = password.encode("latin-1", "replace")[:32]
        pw = pw + PAD[: 32 - len(pw)]
        h = hashlib.md5()
        h.update(pw)
        h.update(self.o)
        h.update(struct.pack("<i", self.p))
        h.update(self.doc_id0)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        n = self.length // 8
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _compute_u(self, key: bytes) -> bytes:
        """Algorithm 4 (R2) / 5 (R3+): the /U verification value."""
        if self.r == 2:
            return rc4(key, PAD)
        h = hashlib.md5()
        h.update(PAD)
        h.update(self.doc_id0)
        u = rc4(key, h.digest())
        for i in range(1, 20):
            step = bytes(b ^ i for b in key)
            u = rc4(step, u)
        return u

    def _authenticate(self, password: str) -> bytes:
        key = self._compute_key(password)
        u = self._compute_u(key)
        ok = u == self.u if self.r == 2 else u[:16] == self.u[:16]
        if not ok:
            raise PDFPasswordIncorrect("user password does not match /U")
        return key

    def decrypt(self, objid: int, genno: int, data: bytes) -> bytes:
        """Algorithm 1: per-object key, then RC4 or AES-CBC."""
        base = self.key + struct.pack("<L", objid)[:3] + struct.pack(
            "<L", genno
        )[:2]
        if self.cfm == "AESV2":
            base += b"sAlT"
        objkey = hashlib.md5(base).digest()[: min(len(self.key) + 5, 16)]
        if self.cfm == "AESV2":
            return aes_cbc_decrypt(objkey, data)
        return rc4(objkey, data)

"""Config-secret decoding: permissive base64 + DES-ECB password decrypt.

Re-expresses the reference's F8 surface (/root/reference/util.cc:27-141,
used by /root/reference/mysqlProcess.cc:23-37): when the ini carries
``password_need_decode != 0``, the stored password is
``base64(DES_ECB(plaintext, key))`` and is decoded at config-load time
with the reference's fixed key ``"WorkECJol"`` (OpenSSL ``EVP_des_ecb``
uses only the first 8 key bytes).

Everything here is driver-side, tiny-input, load-time work — it never
appears in a Spark plan — so a plain-Python implementation of the public
FIPS 46-3 DES algorithm is the right tool (no OpenSSL binding needed,
and the container ships no ``pycryptodome``). The base64 decoder mirrors
``Base64Decode`` (util.cc:27-95) exactly: any character outside the
64-char alphabet — including ``=`` padding and whitespace — is skipped,
and trailing sub-byte bit groups are dropped.

DES is single-DES and is used here ONLY because the reference's on-disk
config format requires it for compatibility; it is obfuscation, not
security, and the docstrings say so rather than pretending otherwise.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Permissive base64 (util.cc:12-95 semantics)
# ---------------------------------------------------------------------------

_B64_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)
_B64_VAL = {c: i for i, c in enumerate(_B64_ALPHABET)}


def base64_decode_permissive(src: str | bytes) -> bytes:
    """Decode base64, silently skipping every non-alphabet character.

    Mirrors the reference's ``Base64Decode`` (util.cc:27-95): characters
    with no alphabet value (``=``, newlines, junk) are skipped rather than
    rejected, accumulated 6-bit groups are flushed 3 bytes at a time, and
    a trailing group of fewer than 8 bits is discarded.
    """
    if isinstance(src, bytes):
        src = src.decode("ascii", errors="replace")
    out = bytearray()
    acc = 0
    nbits = 0
    for ch in src:
        v = _B64_VAL.get(ch)
        if v is None:
            continue  # skip, like DecodeBase64Char() == -1
        acc = (acc << 6) | v
        nbits += 6
        if nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
    return bytes(out)


# ---------------------------------------------------------------------------
# DES (FIPS 46-3) — permutation tables are the published standard's,
# 1-based bit positions counted from the MSB.
# ---------------------------------------------------------------------------

_IP = (
    58, 50, 42, 34, 26, 18, 10, 2, 60, 52, 44, 36, 28, 20, 12, 4,
    62, 54, 46, 38, 30, 22, 14, 6, 64, 56, 48, 40, 32, 24, 16, 8,
    57, 49, 41, 33, 25, 17, 9, 1, 59, 51, 43, 35, 27, 19, 11, 3,
    61, 53, 45, 37, 29, 21, 13, 5, 63, 55, 47, 39, 31, 23, 15, 7,
)
_FP = (
    40, 8, 48, 16, 56, 24, 64, 32, 39, 7, 47, 15, 55, 23, 63, 31,
    38, 6, 46, 14, 54, 22, 62, 30, 37, 5, 45, 13, 53, 21, 61, 29,
    36, 4, 44, 12, 52, 20, 60, 28, 35, 3, 43, 11, 51, 19, 59, 27,
    34, 2, 42, 10, 50, 18, 58, 26, 33, 1, 41, 9, 49, 17, 57, 25,
)
_E = (
    32, 1, 2, 3, 4, 5, 4, 5, 6, 7, 8, 9,
    8, 9, 10, 11, 12, 13, 12, 13, 14, 15, 16, 17,
    16, 17, 18, 19, 20, 21, 20, 21, 22, 23, 24, 25,
    24, 25, 26, 27, 28, 29, 28, 29, 30, 31, 32, 1,
)
_P = (
    16, 7, 20, 21, 29, 12, 28, 17, 1, 15, 23, 26, 5, 18, 31, 10,
    2, 8, 24, 14, 32, 27, 3, 9, 19, 13, 30, 6, 22, 11, 4, 25,
)
_PC1 = (
    57, 49, 41, 33, 25, 17, 9, 1, 58, 50, 42, 34, 26, 18,
    10, 2, 59, 51, 43, 35, 27, 19, 11, 3, 60, 52, 44, 36,
    63, 55, 47, 39, 31, 23, 15, 7, 62, 54, 46, 38, 30, 22,
    14, 6, 61, 53, 45, 37, 29, 21, 13, 5, 28, 20, 12, 4,
)
_PC2 = (
    14, 17, 11, 24, 1, 5, 3, 28, 15, 6, 21, 10,
    23, 19, 12, 4, 26, 8, 16, 7, 27, 20, 13, 2,
    41, 52, 31, 37, 47, 55, 30, 40, 51, 45, 33, 48,
    44, 49, 39, 56, 34, 53, 46, 42, 50, 36, 29, 32,
)
_SHIFTS = (1, 1, 2, 2, 2, 2, 2, 2, 1, 2, 2, 2, 2, 2, 2, 1)
_SBOX = (
    (
        14, 4, 13, 1, 2, 15, 11, 8, 3, 10, 6, 12, 5, 9, 0, 7,
        0, 15, 7, 4, 14, 2, 13, 1, 10, 6, 12, 11, 9, 5, 3, 8,
        4, 1, 14, 8, 13, 6, 2, 11, 15, 12, 9, 7, 3, 10, 5, 0,
        15, 12, 8, 2, 4, 9, 1, 7, 5, 11, 3, 14, 10, 0, 6, 13,
    ),
    (
        15, 1, 8, 14, 6, 11, 3, 4, 9, 7, 2, 13, 12, 0, 5, 10,
        3, 13, 4, 7, 15, 2, 8, 14, 12, 0, 1, 10, 6, 9, 11, 5,
        0, 14, 7, 11, 10, 4, 13, 1, 5, 8, 12, 6, 9, 3, 2, 15,
        13, 8, 10, 1, 3, 15, 4, 2, 11, 6, 7, 12, 0, 5, 14, 9,
    ),
    (
        10, 0, 9, 14, 6, 3, 15, 5, 1, 13, 12, 7, 11, 4, 2, 8,
        13, 7, 0, 9, 3, 4, 6, 10, 2, 8, 5, 14, 12, 11, 15, 1,
        13, 6, 4, 9, 8, 15, 3, 0, 11, 1, 2, 12, 5, 10, 14, 7,
        1, 10, 13, 0, 6, 9, 8, 7, 4, 15, 14, 3, 11, 5, 2, 12,
    ),
    (
        7, 13, 14, 3, 0, 6, 9, 10, 1, 2, 8, 5, 11, 12, 4, 15,
        13, 8, 11, 5, 6, 15, 0, 3, 4, 7, 2, 12, 1, 10, 14, 9,
        10, 6, 9, 0, 12, 11, 7, 13, 15, 1, 3, 14, 5, 2, 8, 4,
        3, 15, 0, 6, 10, 1, 13, 8, 9, 4, 5, 11, 12, 7, 2, 14,
    ),
    (
        2, 12, 4, 1, 7, 10, 11, 6, 8, 5, 3, 15, 13, 0, 14, 9,
        14, 11, 2, 12, 4, 7, 13, 1, 5, 0, 15, 10, 3, 9, 8, 6,
        4, 2, 1, 11, 10, 13, 7, 8, 15, 9, 12, 5, 6, 3, 0, 14,
        11, 8, 12, 7, 1, 14, 2, 13, 6, 15, 0, 9, 10, 4, 5, 3,
    ),
    (
        12, 1, 10, 15, 9, 2, 6, 8, 0, 13, 3, 4, 14, 7, 5, 11,
        10, 15, 4, 2, 7, 12, 9, 5, 6, 1, 13, 14, 0, 11, 3, 8,
        9, 14, 15, 5, 2, 8, 12, 3, 7, 0, 4, 10, 1, 13, 11, 6,
        4, 3, 2, 12, 9, 5, 15, 10, 11, 14, 1, 7, 6, 0, 8, 13,
    ),
    (
        4, 11, 2, 14, 15, 0, 8, 13, 3, 12, 9, 7, 5, 10, 6, 1,
        13, 0, 11, 7, 4, 9, 1, 10, 14, 3, 5, 12, 2, 15, 8, 6,
        1, 4, 11, 13, 12, 3, 7, 14, 10, 15, 6, 8, 0, 5, 9, 2,
        6, 11, 13, 8, 1, 4, 10, 7, 9, 5, 0, 15, 14, 2, 3, 12,
    ),
    (
        13, 2, 8, 4, 6, 15, 11, 1, 10, 9, 3, 14, 5, 0, 12, 7,
        1, 15, 13, 8, 10, 3, 7, 4, 12, 5, 6, 11, 0, 14, 9, 2,
        7, 11, 4, 1, 9, 12, 14, 2, 0, 6, 10, 13, 15, 3, 5, 8,
        2, 1, 14, 7, 4, 10, 8, 13, 15, 12, 9, 0, 3, 5, 6, 11,
    ),
)


def _permute(value: int, table: tuple, in_width: int) -> int:
    out = 0
    for pos in table:
        out = (out << 1) | ((value >> (in_width - pos)) & 1)
    return out


def _subkeys(key8: bytes) -> list[int]:
    k = int.from_bytes(key8, "big")
    cd = _permute(k, _PC1, 64)
    c, d = cd >> 28, cd & 0x0FFFFFFF
    keys = []
    for shift in _SHIFTS:
        c = ((c << shift) | (c >> (28 - shift))) & 0x0FFFFFFF
        d = ((d << shift) | (d >> (28 - shift))) & 0x0FFFFFFF
        keys.append(_permute((c << 28) | d, _PC2, 56))
    return keys


def _feistel(r: int, k: int) -> int:
    x = _permute(r, _E, 32) ^ k
    out = 0
    for i in range(8):
        six = (x >> (42 - 6 * i)) & 0x3F
        row = ((six >> 4) & 0b10) | (six & 1)
        col = (six >> 1) & 0xF
        out = (out << 4) | _SBOX[i][row * 16 + col]
    return _permute(out, _P, 32)


def _des_block(block8: bytes, keys: list[int]) -> bytes:
    v = _permute(int.from_bytes(block8, "big"), _IP, 64)
    left, right = v >> 32, v & 0xFFFFFFFF
    for k in keys:
        left, right = right, left ^ _feistel(right, k)
    return _permute((right << 32) | left, _FP, 64).to_bytes(8, "big")


def _evp_key(key: bytes) -> bytes:
    """EVP_des_ecb key-length semantics: exactly 8 bytes are used.

    The reference passes the 9-char literal ``"WorkECJol"``
    (mysqlProcess.cc:31); OpenSSL reads ``EVP_CIPHER_key_length`` = 8, so
    the trailing ``l`` never participates. Short keys are NUL-padded.
    """
    return key[:8].ljust(8, b"\x00")


def des_ecb_encrypt(data: bytes, key: bytes, pad: bool = True) -> bytes:
    """DES-ECB encrypt with PKCS#7 padding (OpenSSL EVP default).

    Provided for fixture generation and round-trip tests — the engine
    itself only ever decrypts.
    """
    keys = _subkeys(_evp_key(key))
    if pad:
        n = 8 - (len(data) % 8)
        data = data + bytes([n]) * n
    elif len(data) % 8:
        raise ValueError("unpadded DES input must be a multiple of 8 bytes")
    return b"".join(
        _des_block(data[i : i + 8], keys) for i in range(0, len(data), 8)
    )


def des_ecb_decrypt(data: bytes, key: bytes, unpad: bool = True) -> bytes:
    """DES-ECB decrypt, stripping PKCS#7 padding (EVP_DecryptFinal
    semantics: invalid padding is an error, mirrored here as ValueError —
    the reference surfaces it as DesEcDncrypt() == false)."""
    if not data or len(data) % 8:
        raise ValueError("DES ciphertext length must be a positive multiple of 8")
    keys = list(reversed(_subkeys(_evp_key(key))))
    plain = b"".join(
        _des_block(data[i : i + 8], keys) for i in range(0, len(data), 8)
    )
    if unpad:
        n = plain[-1]
        if not 1 <= n <= 8 or plain[-n:] != bytes([n]) * n:
            raise ValueError("bad PKCS#7 padding")
        plain = plain[:-n]
    return plain


# The reference's compiled-in key (mysqlProcess.cc:31).
REFERENCE_KEY = b"WorkECJol"


def decode_password(value: str, key: bytes = REFERENCE_KEY) -> str:
    """``base64(DES_ECB(password))`` → password, the mysqlProcess.cc:23-37
    path. Raises ValueError on undecodable input (the reference logs and
    refuses to connect)."""
    raw = base64_decode_permissive(value)
    return des_ecb_decrypt(raw, key).decode("utf-8")

"""Pure-stdlib WinZip-AES (AE-2) encrypted zip writer/reader.

Closes the AES leg of E20 (reference: dbccore/dbccore.py:781-826 uses
pyzipper's WZ_AES) without any third-party dependency: the container
follows the public WinZip AE-2 specification ("AES Encryption
Information Extra Field", WinZip/Gladman) and the cipher is AES-256
implemented from FIPS-197 — every primitive besides the block cipher
(PBKDF2-HMAC-SHA1, HMAC, CRC32, DEFLATE) is Python stdlib.

Format recap (AE-2):
- per-file payload = salt(16) || password_verifier(2) || ciphertext || hmac(10)
- keys = PBKDF2-HMAC-SHA1(password, salt, 1000 iters, 32+32+2 bytes):
  AES-256 key, HMAC-SHA1 key, 2-byte password verifier
- cipher = AES-256 in CTR mode with a 16-byte LITTLE-ENDIAN counter
  starting at 1 (no nonce)
- auth = first 10 bytes of HMAC-SHA1 over the CIPHERTEXT
- zip method 99, extra field 0x9901 (AE-2, vendor "AE", strength 3,
  real method inside), CRC-32 field = 0 (AE-2 omits it)

Throughput is pure-Python-AES-bound (~100 KB/s): correct for the
export sizes the packet corpus produces; when pyzipper is installed the
export path prefers it (plans/export.py) and an interop test validates
this writer against it.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import struct
import zlib
from pathlib import Path

# --- AES-256 block cipher (FIPS-197), encryption direction only -----------
# CTR mode needs only the forward cipher for both encrypt and decrypt.

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]

_XTIME = [((x << 1) ^ 0x1B) & 0xFF if x & 0x80 else x << 1 for x in range(256)]


def _expand_key_256(key: bytes) -> list[list[int]]:
    """FIPS-197 key expansion for Nk=8/Nr=14 → 15 round keys of 16 bytes,
    each as a 16-int list in column-major state order."""
    assert len(key) == 32
    w = [list(key[4 * i : 4 * i + 4]) for i in range(8)]
    rcon = 1
    for i in range(8, 4 * 15):
        t = list(w[i - 1])
        if i % 8 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _XTIME[rcon]
        elif i % 8 == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - 8][j] ^ t[j] for j in range(4)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(15)]


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [block[i] ^ rk[0][i] for i in range(16)]
    for rnd in range(1, 14):
        # SubBytes + ShiftRows (state is column-major: byte r,c at 4c+r)
        s = [
            _SBOX[s[0]], _SBOX[s[5]], _SBOX[s[10]], _SBOX[s[15]],
            _SBOX[s[4]], _SBOX[s[9]], _SBOX[s[14]], _SBOX[s[3]],
            _SBOX[s[8]], _SBOX[s[13]], _SBOX[s[2]], _SBOX[s[7]],
            _SBOX[s[12]], _SBOX[s[1]], _SBOX[s[6]], _SBOX[s[11]],
        ]
        # MixColumns + AddRoundKey
        k = rk[rnd]
        ns = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            x = a0 ^ a1 ^ a2 ^ a3
            ns[c] = a0 ^ x ^ _XTIME[a0 ^ a1] ^ k[c]
            ns[c + 1] = a1 ^ x ^ _XTIME[a1 ^ a2] ^ k[c + 1]
            ns[c + 2] = a2 ^ x ^ _XTIME[a2 ^ a3] ^ k[c + 2]
            ns[c + 3] = a3 ^ x ^ _XTIME[a3 ^ a0] ^ k[c + 3]
        s = ns
    # final round: no MixColumns
    k = rk[14]
    out = [
        _SBOX[s[0]], _SBOX[s[5]], _SBOX[s[10]], _SBOX[s[15]],
        _SBOX[s[4]], _SBOX[s[9]], _SBOX[s[14]], _SBOX[s[3]],
        _SBOX[s[8]], _SBOX[s[13]], _SBOX[s[2]], _SBOX[s[7]],
        _SBOX[s[12]], _SBOX[s[1]], _SBOX[s[6]], _SBOX[s[11]],
    ]
    return bytes(out[i] ^ k[i] for i in range(16))


def _ctr_xor(key: bytes, data: bytes) -> bytes:
    """WinZip-AES CTR: 16-byte LITTLE-ENDIAN counter starting at 1."""
    rk = _expand_key_256(key)
    out = bytearray(len(data))
    ctr = 1
    for off in range(0, len(data), 16):
        ks = _encrypt_block(rk, ctr.to_bytes(16, "little"))
        chunk = data[off : off + 16]
        for j, b in enumerate(chunk):
            out[off + j] = b ^ ks[j]
        ctr += 1
    return bytes(out)


# --- AE-2 payload ----------------------------------------------------------

_SALT_LEN = 32 // 2  # 16 bytes for AES-256 (salt = keylen/2)
_PBKDF2_ITERS = 1000


def _derive(password: bytes, salt: bytes) -> tuple[bytes, bytes, bytes]:
    dk = hashlib.pbkdf2_hmac("sha1", password, salt, _PBKDF2_ITERS, 32 + 32 + 2)
    return dk[:32], dk[32:64], dk[64:66]


def _seal(compressed: bytes, password: bytes, salt: bytes) -> bytes:
    aes_key, mac_key, verifier = _derive(password, salt)
    ct = _ctr_xor(aes_key, compressed)
    tag = hmac_mod.new(mac_key, ct, hashlib.sha1).digest()[:10]
    return salt + verifier + ct + tag


def _open_sealed(payload: bytes, password: bytes) -> bytes:
    salt, verifier, body = payload[:_SALT_LEN], payload[_SALT_LEN:_SALT_LEN + 2], payload[_SALT_LEN + 2:]
    ct, tag = body[:-10], body[-10:]
    aes_key, mac_key, want_ver = _derive(password, salt)
    if verifier != want_ver:
        raise ValueError("bad password (verifier mismatch)")
    calc = hmac_mod.new(mac_key, ct, hashlib.sha1).digest()[:10]
    if not hmac_mod.compare_digest(calc, tag):
        raise ValueError("authentication failed (HMAC mismatch)")
    return _ctr_xor(aes_key, ct)


# --- zip container ---------------------------------------------------------

_METHOD_AES = 99
_METHOD_DEFLATE = 8
_AE2_EXTRA = struct.pack("<HHH2sBH", 0x9901, 7, 2, b"AE", 3, _METHOD_DEFLATE)


def write_aes_zip(
    zip_path: str | Path,
    files: list[tuple[str, bytes]],
    password: str,
    salt_fn=None,
) -> None:
    """Write an AE-2 encrypted zip of ``(name, content)`` entries.

    ``salt_fn(name) -> bytes16`` injects deterministic salts for tests;
    default salts derive from ``os.urandom``."""
    import os

    password_b = password.encode()
    out = bytearray()
    central = bytearray()
    records: list[tuple[str, int, int, int]] = []  # name, usize, payload_len, offset
    for name, content in files:
        nb = name.encode()
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        deflated = comp.compress(content) + comp.flush()
        salt = salt_fn(name) if salt_fn else os.urandom(_SALT_LEN)
        payload = _seal(deflated, password_b, salt)
        records.append((name, len(content), len(payload), len(out)))
        # local file header: version-needed 51 (AES per APPNOTE), bit 0 set
        # (encrypted), method 99, CRC 0 (AE-2 omits it)
        lfh = struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 51, 0x0001, _METHOD_AES, 0, 0,
            0, len(payload), len(content), len(nb), len(_AE2_EXTRA),
        )
        out += lfh + nb + _AE2_EXTRA + payload
    for name, usize, payload_len, off in records:
        nb = name.encode()
        cdh = struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 51, 51, 0x0001, _METHOD_AES, 0, 0,
            0, payload_len, usize, len(nb), len(_AE2_EXTRA), 0,
            0, 0, 0, off,
        )
        central += cdh + nb + _AE2_EXTRA
    eocd = struct.pack(
        "<IHHHHIIH",
        0x06054B50, 0, 0, len(files), len(files), len(central), len(out), 0,
    )
    Path(zip_path).write_bytes(bytes(out) + bytes(central) + eocd)


def read_aes_zip(zip_path: str | Path, password: str) -> dict[str, bytes]:
    """Read back an AE-2 zip written by :func:`write_aes_zip` (also reads
    single-disk AE-2 archives from other writers, e.g. pyzipper, as long
    as they use DEFLATE inside)."""
    data = Path(zip_path).read_bytes()
    password_b = password.encode()
    result: dict[str, bytes] = {}
    pos = 0
    while pos + 4 <= len(data) and data[pos : pos + 4] == b"PK\x03\x04":
        (_, _, flags, method, _, _, _, csize, usize, nlen, xlen) = struct.unpack(
            "<IHHHHHIIIHH", data[pos : pos + 30]
        )
        name = data[pos + 30 : pos + 30 + nlen].decode()
        xstart = pos + 30 + nlen
        extra = data[xstart : xstart + xlen]
        body = data[xstart + xlen : xstart + xlen + csize]
        pos = xstart + xlen + csize
        if method != _METHOD_AES:
            raise ValueError(f"{name}: not an AES entry (method {method})")
        # find the 0x9901 extra to learn the real method
        real_method = _METHOD_DEFLATE
        e = 0
        while e + 4 <= len(extra):
            hid, hsz = struct.unpack("<HH", extra[e : e + 4])
            if hid == 0x9901:
                real_method = struct.unpack("<H", extra[e + 9 : e + 11])[0]
            e += 4 + hsz
        plain = _open_sealed(body, password_b)
        if real_method == _METHOD_DEFLATE:
            plain = zlib.decompress(plain, -15)
        elif real_method != 0:
            raise ValueError(f"{name}: unsupported inner method {real_method}")
        if usize not in (0, len(plain)):
            raise ValueError(f"{name}: size mismatch after decrypt")
        result[name] = plain
    return result


# FIPS-197 appendix C.3 known-answer (AES-256), asserted at import so a
# broken table/expansion can never silently mis-encrypt an export:
_KAT_KEY = bytes(range(32))
_KAT_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_KAT_CT = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
assert _encrypt_block(_expand_key_256(_KAT_KEY), _KAT_PT) == _KAT_CT, (
    "AES-256 self-test failed"
)

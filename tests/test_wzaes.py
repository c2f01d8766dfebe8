"""Pure-stdlib WinZip-AES (AE-2) writer/reader (functions/wzaes.py) —
the AES leg of E20 without pyzipper. The AES core is pinned to FIPS-197
at import; these tests cover the container, key derivation, CTR mode,
authentication, and (when pyzipper is present) cross-implementation
interop."""

from __future__ import annotations

import zipfile

import pytest

from db_converter_spark.functions.wzaes import (
    _ctr_xor,
    _encrypt_block,
    _expand_key_256,
    read_aes_zip,
    write_aes_zip,
)


def test_aes256_fips197_kat():
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _encrypt_block(_expand_key_256(key), pt).hex() == (
        "8ea2b7ca516745bfeafc49904b496089"
    )


def test_ctr_is_an_involution_and_position_dependent():
    key = bytes(range(32))
    data = bytes(range(256)) * 3
    ct = _ctr_xor(key, data)
    assert ct != data
    assert _ctr_xor(key, ct) == data  # XOR stream: decrypt == encrypt
    # keystream must differ across blocks (counter actually increments)
    ks = bytes(a ^ b for a, b in zip(ct, data))
    assert ks[:16] != ks[16:32]


def test_zip_roundtrip_and_auth(tmp_path):
    files = [
        ("one.csv", b"id\tval\n1\ta\n2\tb\n" * 200),
        ("two.csv", b""),  # empty member
        ("three.bin", bytes(range(256)) * 41),
    ]
    p = tmp_path / "t.zip"
    write_aes_zip(p, files, "pa55word")
    assert read_aes_zip(p, "pa55word") == dict(files)
    # stdlib zipfile parses the container structure (names + sizes)
    with zipfile.ZipFile(p) as zf:
        assert zf.namelist() == [n for n, _ in files]
        for (n, content), info in zip(files, zf.infolist()):
            assert info.file_size == len(content)
    with pytest.raises(ValueError, match="verifier"):
        read_aes_zip(p, "wrong")
    # bit-flip in the ciphertext must fail the HMAC, not decrypt garbage
    raw = bytearray(p.read_bytes())
    # flip a byte inside the first member's ciphertext (after the 30-byte
    # header + name + 11-byte extra + 16-byte salt + 2-byte verifier)
    ofs = 30 + len("one.csv") + 11 + 16 + 2 + 5
    raw[ofs] ^= 0xFF
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="authentication|verifier"):
        read_aes_zip(p, "pa55word")


def test_deterministic_salts_give_deterministic_archives(tmp_path):
    files = [("a.txt", b"hello")]
    salt_fn = lambda name: bytes(16)  # noqa: E731
    p1, p2 = tmp_path / "1.zip", tmp_path / "2.zip"
    write_aes_zip(p1, files, "pw", salt_fn=salt_fn)
    write_aes_zip(p2, files, "pw", salt_fn=salt_fn)
    assert p1.read_bytes() == p2.read_bytes()


def test_pyzipper_interop(tmp_path):
    pz = pytest.importorskip("pyzipper")
    files = [("x.csv", b"col\n1\n2\n")]
    p = tmp_path / "ours.zip"
    write_aes_zip(p, files, "s3cret")
    with pz.AESZipFile(p) as zf:
        zf.setpassword(b"s3cret")
        assert zf.read("x.csv") == files[0][1]

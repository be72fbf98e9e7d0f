"""Golden vectors for the binary decode kernels — the analog of the
reference's per-type corpora (/root/reference/tests/type_*_test.go) and the
hand-captured decimal vectors (/root/reference/mysql/decimal_test.go:19-231)."""

from __future__ import annotations

import numpy as np
import pytest

from bocadillo_spark.functions import binary as B


def test_fixed_ints_roundtrip():
    for width in (1, 2, 3, 4, 6, 8):
        for v in (0, 1, (1 << (8 * width)) - 1, (1 << (8 * width)) // 2):
            assert B.decode_uint_le(B.encode_uint_le(v, width), width) == v
    with pytest.raises(ValueError):
        B.decode_uint_le(b"\x00" * 8, 5)
    with pytest.raises(ValueError):
        B.decode_uint_le(b"\x01", 2)


def test_fixed_ints_vectorized():
    buf = np.frombuffer(b"".join(B.encode_uint_le(v, 4) for v in [0, 7, 2**31, 2**32 - 1]), dtype=np.uint8)
    offs = np.arange(4) * 4
    assert B.decode_uint_le_array(buf, offs, 4).tolist() == [0, 7, 2**31, 2**32 - 1]


def test_lenenc_int_scheme():
    # tag boundaries from mysql/binary.go:100-152
    cases = [0, 0xFA, 0xFB, 0xFFFF, 0x10000, 0xFFFFFF, 0x1000000, 2**63]
    for v in cases:
        enc = B.encode_lenenc_int(v)
        dec, used = B.decode_lenenc_int(enc)
        assert (dec, used) == (v, len(enc))
    assert B.decode_lenenc_int(b"\xfb") == (None, 1)
    with pytest.raises(ValueError):
        B.decode_lenenc_int(b"\xff")


def test_strings():
    assert B.decode_nullterm_string(b"abc\x00rest") == (b"abc", 4)
    with pytest.raises(ValueError):
        B.decode_nullterm_string(b"abc")
    data = B.encode_lenenc_int(3) + b"xyz"
    assert B.decode_lenenc_string(data) == (b"xyz", 4)
    assert B.decode_lenenc_string(b"\xfb") == (None, 1)


def test_floats():
    import struct

    for v in (0.0, 1.5, -3.25e10, 2**-40):
        assert B.decode_float64(struct.pack("<d", v)) == v
        assert B.decode_float32(struct.pack("<f", v)) == struct.unpack("<f", struct.pack("<f", v))[0]


def test_bit_and_sign():
    assert B.decode_bit(b"\x01\x02", 16) == 0x0102
    # 24-bit sign extension (mysql/signing.go:21-24)
    assert B.sign_int(0xFFFFFF, 3) == -1
    assert B.sign_int(0x7FFFFF, 3) == 0x7FFFFF
    assert B.sign_int(0xFF, 1) == -1
    assert B.sign_int(2**64 - 1, 8) == -1
    assert B.sign_int_array(np.array([0xFFFFFF, 1]), 3).tolist() == [-1, 1]


def _enc_dec(digits: str, precision: int, scale: int) -> bytes:
    """Encoder used only by tests (the reference ships captured bytes; we
    synthesize them with the inverse transform)."""
    neg = digits.startswith("-")
    if neg:
        digits = digits[1:]
    if "." in digits:
        ip, fp = digits.split(".")
    else:
        ip, fp = digits, ""
    ip = ip.rjust(precision - scale, "0")
    fp = fp.ljust(scale, "0")
    out = bytearray()
    intg, rem = divmod(precision - scale, 9)
    lead = ip[: rem] if rem else ""
    if rem:
        out += int(lead or "0").to_bytes(B._DIG_BYTES[rem], "big")
    for i in range(intg):
        out += int(ip[rem + 9 * i : rem + 9 * (i + 1)]).to_bytes(4, "big")
    frac, frem = divmod(scale, 9)
    for i in range(frac):
        out += int(fp[9 * i : 9 * (i + 1)]).to_bytes(4, "big")
    if frem:
        out += int(fp[frac * 9 :]).to_bytes(B._DIG_BYTES[frem], "big")
    if neg:
        out = bytearray(b ^ 0xFF for b in out)
    out[0] ^= 0x80
    return bytes(out)


@pytest.mark.parametrize(
    "s,p,sc",
    [
        ("0", 1, 0),
        ("1", 1, 0),
        ("-1", 1, 0),
        ("123456789", 9, 0),
        ("-987654321", 9, 0),
        ("1234567890123", 13, 0),
        ("0.5", 2, 1),
        ("-0.05", 3, 2),
        ("123.456", 6, 3),
        ("-123456789012345678901.234567890123456789", 39, 18),
        ("0.000000000000000000000001", 25, 24),
    ],
)
def test_packed_decimal_golden(s, p, sc):
    raw = _enc_dec(s, p, sc)
    want = s
    if "." in s:
        ip, fp = s.lstrip("-").split(".")
        want = ("-" if s.startswith("-") else "") + (ip.lstrip("0") or "0") + "." + fp.ljust(sc, "0")
    assert B.decode_packed_decimal(raw, p, sc) == want


def test_zero_date_sentinel():
    assert B.decode_date(0) is None
    # 2024-01-15: year<<9 | month<<5 | day
    assert B.decode_date((2024 << 9) | (1 << 5) | 15) == "2024-01-15"

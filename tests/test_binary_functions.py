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


# ---- F8 full family: encoders live here (inverse transforms; the reference
# ships captured bytes, we synthesize) -- mysql/time.go:12-199 edge cases.


def _enc_time2(hour, minute, sec, usec, fsp, neg=False):
    """Inverse of decode_time2. The stored frac field is in units of
    10^(6-2*ceil(fsp/2)) microseconds; negatives borrow one from the int
    part when the frac is nonzero (mirrors the decode's un-borrow)."""
    hms = (hour << 12) | (minute << 6) | sec
    if fsp in (5, 6):
        tmp = (hms << 24) + usec
        return ((-tmp if neg else tmp) + B._TIME2_FULL_OFFSET).to_bytes(6, "big")
    unit, width, wrap = (10000, 1, 0x100) if fsp in (1, 2) else (100, 2, 0x10000)
    frac = usec // unit
    if fsp == 0:
        ip = -hms if neg else hms
        return (ip + B._TIME2_INT_OFFSET).to_bytes(3, "big")
    if neg and frac > 0:
        ip, f0 = -hms - 1, wrap - frac
    else:
        ip, f0 = (-hms if neg else hms), frac
    return (ip + B._TIME2_INT_OFFSET).to_bytes(3, "big") + f0.to_bytes(width, "big")


def test_time2_golden():
    assert B.decode_time2(_enc_time2(13, 22, 33, 0, 0), 0) == ("13:22:33", 3)
    assert B.decode_time2(B._TIME2_INT_OFFSET.to_bytes(3, "big"), 0) == ("00:00:00", 3)
    assert B.decode_time2(_enc_time2(0, 0, 1, 500000, 2, neg=True), 2) == ("-00:00:01.500000", 4)
    assert B.decode_time2(_enc_time2(1, 2, 3, 123400, 4), 4) == ("01:02:03.123400", 5)
    # max TIME range with full microseconds
    assert B.decode_time2(_enc_time2(838, 59, 59, 999999, 6), 6) == ("838:59:59.999999", 6)
    assert B.decode_time2(_enc_time2(838, 59, 59, 999999, 6, neg=True), 6) == (
        "-838:59:59.999999",
        6,
    )
    with pytest.raises(ValueError):
        B.decode_time2(b"\x80\x00", 0)  # short buffer
    with pytest.raises(ValueError):
        B.decode_time2(b"\x80\x00\x00", 7)  # fsp out of range


def test_timestamp2_golden():
    def enc(sec, frac_bytes=b""):
        return sec.to_bytes(4, "big") + frac_bytes

    assert B.decode_timestamp2(enc(0), 0) == (None, 4)  # zero sentinel
    assert B.decode_timestamp2(enc(1704067200), 0) == (1704067200_000000, 4)
    # fsp 3: 2 BE bytes, units of 100us
    assert B.decode_timestamp2(enc(1704067200, (1234).to_bytes(2, "big")), 3) == (
        1704067200_123400,
        6,
    )
    # 2038 epoch edge: unsigned seconds past 2^31 decode fine
    post2038 = 2**31 + 10
    assert B.decode_timestamp2(enc(post2038, (999999).to_bytes(3, "big")), 6) == (
        post2038 * 1_000_000 + 999999,
        7,
    )


def test_datetime2_golden():
    def enc(year, month, day, hour, minute, sec, usec, fsp):
        ym = year * 13 + month
        ymd = (ym << 5) | day
        hms = (hour << 12) | (minute << 6) | sec
        ip = (ymd << 17) | hms
        out = (ip + B._DT2_OFFSET).to_bytes(5, "big")
        if fsp in (1, 2):
            out += bytes([usec // 10000])
        elif fsp in (3, 4):
            out += (usec // 100).to_bytes(2, "big")
        elif fsp in (5, 6):
            out += usec.to_bytes(3, "big")
        return out

    assert B.decode_datetime2(enc(2024, 1, 1, 0, 0, 0, 0, 0), 0) == ("2024-01-01 00:00:00", 5)
    assert B.decode_datetime2(B._DT2_OFFSET.to_bytes(5, "big"), 0) == (None, 5)  # zero
    assert B.decode_datetime2(enc(1999, 12, 31, 23, 59, 59, 1, 6), 6) == (
        "1999-12-31 23:59:59.000001",
        8,
    )
    assert B.decode_datetime2(enc(2038, 1, 19, 3, 14, 8, 500000, 3), 3) == (
        "2038-01-19 03:14:08.500000",
        7,
    )


def test_time_datetime_v1_and_year():
    assert B.decode_time_v1(0) == "00:00:00"
    assert B.decode_time_v1(8385959) == "838:59:59"
    assert B.decode_time_v1(-10203) == "-01:02:03"
    assert B.decode_datetime_v1(0) is None
    assert B.decode_datetime_v1(20240102030405) == "2024-01-02 03:04:05"
    assert B.decode_timestamp_v1(B.encode_uint_le(1704067200, 4)) == 1704067200
    assert B.decode_year(0) == 1900
    assert B.decode_year(124) == 2024
    assert B.decode_year(255) == 2155


# ---- property tests: encode∘decode = id across the whole input domain ------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1), st.sampled_from([1, 2, 3, 4, 6, 8]))
def test_prop_uint_le_roundtrip(v, width):
    v %= 1 << (8 * width)
    assert B.decode_uint_le(B.encode_uint_le(v, width), width) == v


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), st.integers(min_value=0, max_value=2**64 - 1)))
def test_prop_lenenc_roundtrip(v):
    enc = B.encode_lenenc_int(v)
    dec, used = B.decode_lenenc_int(enc)
    assert (dec, used) == (v, len(enc))


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=838),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=999999),
    st.sampled_from([0, 2, 4, 6]),
    st.booleans(),
)
def test_prop_time2_roundtrip(hour, minute, sec, usec, fsp, neg):
    unit = {0: 1000000, 2: 10000, 4: 100, 6: 1}[fsp]
    usec = (usec // unit) * unit  # representable at this fsp
    if hour == 0 and minute == 0 and sec == 0 and usec == 0:
        neg = False  # no negative zero
    s, n = B.decode_time2(_enc_time2(hour, minute, sec, usec, fsp, neg=neg), fsp)
    want = f"{hour:02d}:{minute:02d}:{sec:02d}"
    if usec:
        want += f".{usec:06d}"
    if neg and (hour or minute or sec or usec):
        want = "-" + want
    assert s == want and n == 3 + (fsp + 1) // 2


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=9999),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=28),
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=999999),
    st.sampled_from([0, 3, 6]),
)
def test_prop_datetime2_roundtrip(y, mo, d, h, mi, s, usec, fsp):
    unit = {0: 1000000, 3: 100, 6: 1}[fsp]
    usec = (usec // unit) * unit
    ym = y * 13 + mo
    ip = (((ym << 5) | d) << 17) | (h << 12) | (mi << 6) | s
    data = (ip + B._DT2_OFFSET).to_bytes(5, "big")
    if fsp == 3:
        data += (usec // 100).to_bytes(2, "big")
    elif fsp == 6:
        data += usec.to_bytes(3, "big")
    out, n = B.decode_datetime2(data, fsp)
    want = f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
    if usec:
        want += f".{usec:06d}"
    assert out == want and n == 5 + (fsp + 1) // 2


@settings(max_examples=150, deadline=None)
@given(st.decimals(allow_nan=False, allow_infinity=False, places=4,
                   min_value=-10**12, max_value=10**12))
def test_prop_packed_decimal_roundtrip(d):
    s = f"{d:.4f}"
    raw = _enc_dec(s, 20, 4)
    want = s
    neg = s.startswith("-")
    ip, fp = s.lstrip("-").split(".")
    ip = ip.lstrip("0") or "0"
    want = ("-" if neg and not (ip == "0" and fp == "0000") else "") + ip + "." + fp
    assert B.decode_packed_decimal(raw, 20, 4) == want


def test_parse_version_number():
    # mysql_get_server_version canonicalization (event_format_description.go:109-134)
    assert B.parse_version_number("5.7.19-log") == 50719
    assert B.parse_version_number("8.0.33") == 80033
    assert B.parse_version_number("10.11.2-MariaDB") == 101102
    assert B.parse_version_number("5.7.x") == 50700
    assert B.parse_version_number("9.0.0") == 90000

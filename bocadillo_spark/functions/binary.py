"""Binary decode kernels — the reference's scalar expression library
(SURVEY.md §2.6 F1-F8) rebuilt vectorized.

The reference decodes MySQL wire values one at a time off a byte cursor;
these kernels do the same transforms over numpy arrays / Python bytes, for
use inside Arrow-batched UDFs when a pipeline carries packed binary
payloads. Each function cites its scalar original in /root/reference.

All decoders are pure and total: malformed input raises ValueError, which
callers convert to dead-letter rows (never an executor crash —
/root/reference/binlog/event_rows.go:43-59 precedent).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- F1: fixed-width little-endian ints (mysql/binary.go:16-85) -----------

_FIXED_WIDTHS = {1, 2, 3, 4, 6, 8}


def decode_uint_le(data: bytes, width: int) -> int:
    """uint of 1/2/3/4/6/8 bytes LE (mysql/binary.go:16-85)."""
    if width not in _FIXED_WIDTHS:
        raise ValueError(f"unsupported width {width}")
    if len(data) < width:
        raise ValueError("short buffer")
    return int.from_bytes(data[:width], "little", signed=False)


def encode_uint_le(value: int, width: int) -> bytes:
    if width not in _FIXED_WIDTHS:
        raise ValueError(f"unsupported width {width}")
    return int(value).to_bytes(width, "little", signed=False)


def decode_uint_le_array(buf: np.ndarray, offsets: np.ndarray, width: int) -> np.ndarray:
    """Vectorized F1: gather `width`-byte LE uints at `offsets` from a uint8
    buffer — the numpy shape used inside mapInPandas."""
    out = np.zeros(len(offsets), dtype=np.uint64)
    for b in range(width):
        out |= buf[offsets + b].astype(np.uint64) << np.uint64(8 * b)
    return out


# ---- F2: length-encoded int, 0xFB/FC/FD/FE scheme (mysql/binary.go:100-152)


def decode_lenenc_int(data: bytes, pos: int = 0) -> tuple[int | None, int]:
    """Returns (value, bytes_consumed). 0xFB → NULL (None). Mirrors
    mysql/binary.go:100-152."""
    if pos >= len(data):
        raise ValueError("short buffer")
    tag = data[pos]
    if tag < 0xFB:
        return tag, 1
    if tag == 0xFB:
        return None, 1
    if tag == 0xFC:
        return decode_uint_le(data[pos + 1 :], 2), 3
    if tag == 0xFD:
        return decode_uint_le(data[pos + 1 :], 3), 4
    if tag == 0xFE:
        return decode_uint_le(data[pos + 1 :], 8), 9
    raise ValueError(f"invalid lenenc tag 0x{tag:02x}")


def encode_lenenc_int(value: int | None) -> bytes:
    if value is None:
        return b"\xfb"
    if value < 0xFB:
        return bytes([value])
    if value < 1 << 16:
        return b"\xfc" + encode_uint_le(value, 2)
    if value < 1 << 24:
        return b"\xfd" + encode_uint_le(value, 3)
    return b"\xfe" + encode_uint_le(value, 8)


# ---- F3: string decodes (mysql/binary.go:190-249) --------------------------


def decode_nullterm_string(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    end = data.find(b"\x00", pos)
    if end < 0:
        raise ValueError("unterminated string")
    return data[pos:end], end - pos + 1


def decode_lenenc_string(data: bytes, pos: int = 0) -> tuple[bytes | None, int]:
    n, used = decode_lenenc_int(data, pos)
    if n is None:
        return None, used
    end = pos + used + n
    if end > len(data):
        raise ValueError("short buffer")
    return data[pos + used : end], used + n


# ---- F4: IEEE floats from bits (mysql/binary.go:251-259) -------------------


def decode_float32(data: bytes) -> float:
    return struct.unpack_from("<f", data)[0]


def decode_float64(data: bytes) -> float:
    return struct.unpack_from("<d", data)[0]


def decode_float64_array(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    out = decode_uint_le_array(buf, offsets, 8)
    return out.view(np.float64) if out.flags["C_CONTIGUOUS"] else out.copy().view(np.float64)


# ---- F5: BIT decode (mysql/binary.go:261-267) ------------------------------


def decode_bit(data: bytes, nbits: int) -> int:
    """n-bit big-endian bitfield → uint (mysql/binary.go:261-267)."""
    nbytes = (nbits + 7) // 8
    if len(data) < nbytes:
        raise ValueError("short buffer")
    return int.from_bytes(data[:nbytes], "big", signed=False)


# ---- F6: signed reinterpretation incl. 24-bit (mysql/signing.go:7-33) ------


def sign_int(value: int, width: int) -> int:
    """Reinterpret a width-byte unsigned value as signed, including the
    3-byte (INT24) sign-extension case (mysql/signing.go:7-33)."""
    bits = width * 8
    if value >= 1 << (bits - 1):
        return value - (1 << bits)
    return value


def sign_int_array(values: np.ndarray, width: int) -> np.ndarray:
    bits = width * 8
    v = values.astype(np.int64)
    return np.where(v >= (1 << (bits - 1)), v - (1 << bits), v)


# ---- F7: packed-decimal canonical string (mysql/decimal.go:21-132) ---------

_DIG_PER_4B = 9
_DIG_BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]  # bytes for n leading digits


def decode_packed_decimal(data: bytes, precision: int, scale: int) -> str:
    """MySQL packed decimal → canonical exact string. 9 digits per 4 bytes,
    big-endian groups, negatives XOR-masked, sign in the high bit of the
    first byte (mysql/decimal.go:21-88). Canonicalization mirrors
    NewDecimal (mysql/decimal.go:91-132): strip leading zeros ('0.x' kept),
    no trailing-zero stripping of the fraction (fixed scale)."""
    intg = precision - scale
    intg_groups, intg_rem = divmod(intg, _DIG_PER_4B)
    frac_groups, frac_rem = divmod(scale, _DIG_PER_4B)
    total = _DIG_BYTES[intg_rem] + intg_groups * 4 + frac_groups * 4 + _DIG_BYTES[frac_rem]
    if len(data) < total:
        raise ValueError("short buffer")
    buf = bytearray(data[:total])
    negative = (buf[0] & 0x80) == 0
    buf[0] ^= 0x80
    if negative:
        for i in range(total):
            buf[i] ^= 0xFF

    pos = 0

    def take(nbytes: int) -> int:
        nonlocal pos
        v = int.from_bytes(buf[pos : pos + nbytes], "big")
        pos += nbytes
        return v

    digits = ""
    if intg_rem:
        digits += str(take(_DIG_BYTES[intg_rem]))
    for _ in range(intg_groups):
        chunk = str(take(4))
        digits += chunk.rjust(9, "0") if digits else chunk
    int_part = digits.lstrip("0") or "0" if digits else "0"

    frac = ""
    for _ in range(frac_groups):
        frac += str(take(4)).rjust(9, "0")
    if frac_rem:
        frac += str(take(_DIG_BYTES[frac_rem])).rjust(frac_rem, "0")

    out = int_part + ("." + frac if frac else "")
    if negative and (int_part != "0" or any(c != "0" for c in frac)):
        out = "-" + out
    return out


# ---- F8: bit-packed time decode (mysql/time.go:12-199, full family) --------
#
# Formats per the public MySQL binary date/time layout
# (https://dev.mysql.com/doc/refman/8.0/en/datetime.html). Fractional
# seconds (fsp 0-6) are stored BIG-endian in 0-3 extra bytes; the v2 packed
# integers carry a sign-offset so unsigned byte compare equals value compare.
# Note: the reference's DecodeTime2 switch (mysql/time.go:40-104) has empty
# `case 1:`/`case 3:`/`case 5:` arms (Go switch does not fall through), so
# odd fsp decodes to zero there; these kernels implement the spec'd grouping
# (1-2, 3-4, 5-6) instead of mirroring that bug.

ZERO_DATE = "0000-00-00"
ZERO_TIME = "00:00:00"

_TIME2_INT_OFFSET = 0x800000
_TIME2_FULL_OFFSET = 0x800000000000
_DT2_OFFSET = 0x8000000000


def decode_date(value: int) -> str | None:
    """3-byte DATE: day 5 bits, month 4 bits, rest year. Zero date → None
    (sentinel, not crash — mysql/time.go:20-24)."""
    day = value & 0x1F
    month = (value >> 5) & 0x0F
    year = value >> 9
    if year == 0 and month == 0 and day == 0:
        return None
    return f"{year:04d}-{month:02d}-{day:02d}"


def decode_year(value: int) -> int:
    """1-byte YEAR: stored as year-1900 (mysql/time.go:14-16)."""
    return value + 1900


def decode_time_v1(value: int) -> str:
    """TIME v1: decimal-packed HHMMSS integer (mysql/time.go:28-37)."""
    if value == 0:
        return ZERO_TIME
    sign = "-" if value < 0 else ""
    v = abs(value)
    return f"{sign}{v // 10000:02d}:{(v % 10000) // 100:02d}:{v % 100:02d}"


def _frac_usec(data: bytes, pos: int, fsp: int) -> int:
    """Big-endian fractional-seconds tail → microseconds."""
    if fsp in (1, 2):
        return data[pos] * 10000
    if fsp in (3, 4):
        return int.from_bytes(data[pos : pos + 2], "big") * 100
    if fsp in (5, 6):
        return int.from_bytes(data[pos : pos + 3], "big")
    return 0


def decode_time2(data: bytes, fsp: int = 0) -> tuple[str, int]:
    """TIME v2: 3-byte sign-offset int part (hour 10 bits @12, minute 6 @6,
    second 6 @0) + fsp tail; negative values borrow from the int part when
    the fraction is positive (mysql/time.go:40-104). Returns (canonical
    string, bytes consumed)."""
    if not 0 <= fsp <= 6:
        raise ValueError(f"fsp {fsp} out of range")
    n = 3 + (fsp + 1) // 2
    if len(data) < n:
        raise ValueError("short buffer")
    if fsp in (5, 6):
        tmp = int.from_bytes(data[0:6], "big") - _TIME2_FULL_OFFSET
    else:
        int_part = int.from_bytes(data[0:3], "big") - _TIME2_INT_OFFSET
        if fsp in (1, 2):
            frac = data[3]
            if int_part < 0 and frac > 0:
                int_part += 1
                frac -= 0x100
            tmp = (int_part << 24) + frac * 10000
        elif fsp in (3, 4):
            frac = int.from_bytes(data[3:5], "big")
            if int_part < 0 and frac > 0:
                int_part += 1
                frac -= 0x10000
            tmp = (int_part << 24) + frac * 100
        else:  # fsp 0
            tmp = int_part << 24
    if tmp == 0:
        return ZERO_TIME, n
    sign = ""
    if tmp < 0:
        tmp = -tmp
        sign = "-"
    hms = tmp >> 24
    hour = (hms >> 12) % (1 << 10)
    minute = (hms >> 6) % (1 << 6)
    second = hms % (1 << 6)
    sec_part = tmp % (1 << 24)
    if sec_part:
        return f"{sign}{hour:02d}:{minute:02d}:{second:02d}.{sec_part:06d}", n
    return f"{sign}{hour:02d}:{minute:02d}:{second:02d}", n


def decode_timestamp_v1(data: bytes) -> int:
    """TIMESTAMP v1: 4-byte LE epoch seconds (mysql/time.go:107-112)."""
    return decode_uint_le(data, 4)


def decode_timestamp2(data: bytes, fsp: int = 0) -> tuple[int | None, int]:
    """TIMESTAMP v2: 4-byte BIG-endian epoch seconds + fsp tail
    (mysql/time.go:115-133). Returns (epoch micros, consumed); zero
    seconds → None (the zero-timestamp sentinel). Handles the 2038 edge:
    seconds is unsigned, so values past 2^31 decode fine."""
    if not 0 <= fsp <= 6:
        raise ValueError(f"fsp {fsp} out of range")
    n = 4 + (fsp + 1) // 2
    if len(data) < n:
        raise ValueError("short buffer")
    sec = int.from_bytes(data[0:4], "big")
    usec = _frac_usec(data, 4, fsp)
    if sec == 0:
        return None, n
    return sec * 1_000_000 + usec, n


def decode_datetime_v1(value: int) -> str | None:
    """DATETIME v1: decimal-packed YYYYMMDDHHMMSS uint64
    (mysql/time.go:136-149). Zero → None."""
    if value == 0:
        return None
    d = value // 1_000_000
    t = value % 1_000_000
    return (
        f"{d // 10000:04d}-{(d % 10000) // 100:02d}-{d % 100:02d} "
        f"{t // 10000:02d}:{(t % 10000) // 100:02d}:{t % 100:02d}"
    )


def decode_datetime2(data: bytes, fsp: int = 0) -> tuple[str | None, int]:
    """DATETIME v2: 5-byte sign-offset packed (year*13+month 17 bits up,
    day 5 bits, hour/minute/second 17 bits down) + fsp tail
    (mysql/time.go:152-199). Returns (canonical string, consumed); zero
    int part → None."""
    if not 0 <= fsp <= 6:
        raise ValueError(f"fsp {fsp} out of range")
    n = 5 + (fsp + 1) // 2
    if len(data) < n:
        raise ValueError("short buffer")
    int_part = int.from_bytes(data[0:5], "big") - _DT2_OFFSET
    frac = _frac_usec(data, 5, fsp)
    if int_part == 0:
        return None, n
    tmp = abs((int_part << 24) + frac)
    ymdhms = tmp >> 24
    ymd = ymdhms >> 17
    ym = ymd >> 5
    hms = ymdhms % (1 << 17)
    day = ymd % (1 << 5)
    month = ym % 13
    year = ym // 13
    second = hms % (1 << 6)
    minute = (hms >> 6) % (1 << 6)
    hour = hms >> 12
    s = f"{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}"
    if frac:
        s += f".{frac:06d}"
    return s, n


# ---- F10: server-version string → number (event_format_description.go:109-134)


def parse_version_number(v: str) -> int:
    """'5.7.19-log' → 50719: major*10000 + minor*100 + leading digits of the
    patch token (the mysql_get_server_version canonicalization)."""
    tokens = v.split(".")
    major = int(tokens[0])
    minor = int(tokens[1]) if len(tokens) > 1 else 0
    patch = 0
    if len(tokens) > 2:
        digits = ""
        for c in tokens[2]:
            if not c.isdigit():
                break
            digits += c
        patch = int(digits) if digits else 0
    return major * 10000 + minor * 100 + patch

"""Exact C-integer helpers shared by every FFV1 path.

Behavioral parity references: libavcodec/ffv1.h:148-190 (fold, predict,
get_context), libavcodec/mathops.h (mid_pred), libavutil/common.h
(av_mod_uintp2), libavutil/intmath.h (av_log2).
"""
from __future__ import annotations


def av_log2(v: int) -> int:
    """Index of the highest set bit; av_log2(0) == 0."""
    return v.bit_length() - 1 if v > 0 else 0


def av_mod_uintp2(a: int, p: int) -> int:
    return a & ((1 << p) - 1)


def mid_pred(a: int, b: int, c: int) -> int:
    """Median of three (mathops.h:97-120)."""
    if a > b:
        if c > b:
            b = a if c > a else c
    else:
        if b > c:
            b = c if c > a else a
    return b


def fold(diff: int, bits: int) -> int:
    """Wrap a prediction residual into the signed bits-wide range
    (ffv1.h:148-159; note the int8 cast fast path for 8-bit)."""
    if bits == 8:
        diff &= 0xFF
        return diff - 256 if diff >= 128 else diff
    diff += 1 << (bits - 1)
    diff = av_mod_uintp2(diff, bits)
    return diff - (1 << (bits - 1))


def int16_wrap(v: int) -> int:
    """Emulate storing into the reference's int16_t sample buffers."""
    v &= 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


def predict(l: int, t: int, lt: int) -> int:  # noqa: E741
    """Median predictor (ffv1.h:161-168)."""
    return mid_pred(l, l + t - lt, t)


def ceil_rshift(a: int, s: int) -> int:
    """AV_CEIL_RSHIFT."""
    return -((-a) >> s)

"""MSB-first bit I/O and Golomb-Rice codes (FFV1 "coder=rice" path).

Behavioral parity references (reference tree, read-only):
  - bit writer/reader:  libavcodec/put_bits.h, libavcodec/get_bits.h
  - golomb-rice codes:  libavcodec/golomb.h:268-300 (get_ur_golomb),
                        :365-370 (get_sr_golomb), :506-521 (set_ur_golomb),
                        :552-561 (set_sr_golomb)
  - adaptive VLC state: libavcodec/ffv1.h:61-66, :192-224
"""
from __future__ import annotations

import numpy as np


class BitWriter:
    """MSB-first bit writer; flush pads the final byte with zero bits."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0       # bit accumulator, MSB-first semantics
        self._nacc = 0      # bits currently in accumulator

    def put_bits(self, n: int, value: int):
        assert 0 <= n <= 31
        assert 0 <= value < (1 << n) if n else value == 0
        self._acc = (self._acc << n) | value
        self._nacc += n
        while self._nacc >= 8:
            self._nacc -= 8
            self.out.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def bit_count(self) -> int:
        """Total bits written so far (== put_bits_count)."""
        return len(self.out) * 8 + self._nacc

    def flush(self) -> bytes:
        """Zero-pad to a byte boundary and return the bytes."""
        if self._nacc:
            self.out.append((self._acc << (8 - self._nacc)) & 0xFF)
            self._acc = 0
            self._nacc = 0
        return bytes(self.out)


class BitReader:
    """MSB-first bit reader; reads past the end return zero bits."""

    def __init__(self, buf: bytes, start_byte: int = 0):
        self.buf = bytes(buf)
        self.pos = start_byte * 8  # bit position

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bits1()
        return v

    def get_bits1(self) -> int:
        byte_i = self.pos >> 3
        if byte_i < len(self.buf):
            bit = (self.buf[byte_i] >> (7 - (self.pos & 7))) & 1
        else:
            bit = 0
        self.pos += 1
        return bit

    def peek_bits1_at(self, offset: int) -> int:
        p = self.pos + offset
        byte_i = p >> 3
        if byte_i < len(self.buf):
            return (self.buf[byte_i] >> (7 - (p & 7))) & 1
        return 0

    def bit_count(self) -> int:
        return self.pos


def set_ur_golomb(pb: BitWriter, i: int, k: int, limit: int, esc_len: int):
    """Unsigned Golomb-Rice write (golomb.h:506-521)."""
    assert i >= 0
    e = i >> k
    if e < limit:
        pb.put_bits(e + k + 1, (1 << k) + (i & ((1 << k) - 1)))
    else:
        pb.put_bits(limit + esc_len, i - limit + 1)


def set_sr_golomb(pb: BitWriter, i: int, k: int, limit: int, esc_len: int):
    """Signed Golomb-Rice write (golomb.h:552-561): n>=0 -> 2n, n<0 -> -2n-1."""
    v = 2 * i if i >= 0 else -2 * i - 1
    set_ur_golomb(pb, v, k, limit, esc_len)


def get_ur_golomb(gb: BitReader, k: int, limit: int, esc_len: int) -> int:
    """Unsigned Golomb-Rice read (golomb.h:268-300).

    Semantics: count leading zeros e in the next ``limit`` bits.  If a 1
    appears within them, consume e+1 bits then k mantissa bits ->
    (e<<k)|mantissa; otherwise consume ``limit`` bits then ``esc_len`` bits
    of escape value -> esc + limit - 1.
    """
    e = 0
    while e < limit and gb.peek_bits1_at(e) == 0:
        e += 1
    if e < limit:
        gb.pos += e + 1
        m = gb.get_bits(k) if k else 0
        return (e << k) | m
    else:
        gb.pos += limit
        return gb.get_bits(esc_len) + limit - 1


def get_sr_golomb(gb: BitReader, k: int, limit: int, esc_len: int) -> int:
    v = get_ur_golomb(gb, k, limit, esc_len)
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------------------
# Adaptive per-context VLC state (JPEG-LS-style bias/error tracking)
# ---------------------------------------------------------------------------

VLC_STATE_DTYPE = np.dtype([
    ("drift", np.int16),
    ("error_sum", np.uint16),
    ("bias", np.int8),
    ("count", np.uint8),
])


def new_vlc_states(n: int) -> np.ndarray:
    """Fresh VLC states (ffv1.c:179-200): drift 0, error_sum 4, bias 0, count 1."""
    st = np.zeros(n, dtype=VLC_STATE_DTYPE)
    st["error_sum"] = 4
    st["count"] = 1
    return st


def update_vlc_state(states: np.ndarray, i: int, v: int):
    """Adapt one VLC context after coding mapped residual v.

    Exact mirror of ffv1.h:192-224 (Python's ``>>`` on negative ints is an
    arithmetic shift, same as C here).
    """
    drift = int(states["drift"][i])
    count = int(states["count"][i])
    error_sum = (int(states["error_sum"][i]) + abs(v)) & 0xFFFF
    bias = int(states["bias"][i])
    drift += v
    if count == 128:
        count >>= 1
        drift >>= 1  # arithmetic shift, matches C int >> 1
        error_sum >>= 1
    count += 1
    if drift <= -count:
        if bias > -128:
            bias -= 1
        drift += count
        if drift <= -count:
            drift = -count + 1
    elif drift > 0:
        if bias < 127:
            bias += 1
        drift -= count
        if drift > 0:
            drift = 0
    states["drift"][i] = drift
    states["error_sum"][i] = error_sum
    states["count"][i] = count
    states["bias"][i] = bias


def vlc_k(states: np.ndarray, i: int) -> int:
    """Adaptive Rice parameter (ffv1enc.c:246-251 / ffv1dec.c:75-79)."""
    cnt = int(states["count"][i])
    es = int(states["error_sum"][i])
    k = 0
    while cnt < es:
        k += 1
        cnt += cnt
    return k

"""CRC-32 (IEEE poly, FFmpeg av_crc bit order) used for FFV1 error
detection (global-header CRC and per-slice CRCs).

Behavioral parity reference: libavutil/crc.c:310-341 (table build, le=0,
bits=32, poly 0x04C11DB7, byte-swapped entries) and :357-378 (update loop).
The resulting checksum has the property that appending the little-endian
32-bit CRC makes the CRC of the whole buffer zero — which is exactly how
the FFV1 decoder validates (ffv1dec.c:609-618, :963-980).
"""
from __future__ import annotations

import numpy as np

_POLY = 0x04C11DB7


def _build_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = (i << 24) & 0xFFFFFFFF
        for _ in range(8):
            mask = 0xFFFFFFFF if (c & 0x80000000) else 0
            c = ((c << 1) & 0xFFFFFFFF) ^ (_POLY & mask)
        # byte-swap (crc.c:328) so the LE-style update loop can be used
        tab[i] = int.from_bytes(int(c).to_bytes(4, "big"), "little")
    return tab


_TABLE = _build_table()


def crc32_ieee(data: bytes, crc: int = 0) -> int:
    """av_crc(AV_CRC_32_IEEE) — returns the 32-bit checksum."""
    c = crc & 0xFFFFFFFF
    for b in data:
        c = int(_TABLE[(c ^ b) & 0xFF]) ^ (c >> 8)
    return c


def crc32_ieee_np(data: bytes, crc: int = 0) -> int:
    """Vectorized-ish fallback; identical result (still a serial chain)."""
    return crc32_ieee(data, crc)

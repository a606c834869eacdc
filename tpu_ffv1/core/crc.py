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


def _crc32_py(data: bytes, crc: int = 0) -> int:
    c = crc & 0xFFFFFFFF
    for b in data:
        c = int(_TABLE[(c ^ b) & 0xFF]) ^ (c >> 8)
    return c


def _load_native():
    try:
        from .. import native as _n
        lib = _n.get_lib()
        import ctypes as _ct
        lib.ffv1n_crc32.restype = _ct.c_uint32
        lib.ffv1n_crc32.argtypes = [_ct.c_char_p, _ct.c_int64, _ct.c_uint32]
        return lib
    except Exception:
        return None


_NATIVE = None
_NATIVE_TRIED = False


def crc32_ieee(data: bytes, crc: int = 0) -> int:
    """av_crc(AV_CRC_32_IEEE) — returns the 32-bit checksum."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE = _load_native()
        _NATIVE_TRIED = True
    if _NATIVE is not None:
        return int(_NATIVE.ffv1n_crc32(bytes(data), len(data),
                                       crc & 0xFFFFFFFF))
    return _crc32_py(data, crc)

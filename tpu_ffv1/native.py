"""ctypes bindings for the C host runtime (native/ffv1_native.c).

The native engine is the production host path: same bit-exact semantics
as the Python spec layer, ~100x faster.  The library is built on demand
with the in-tree Makefile (gcc only; no external deps).
"""
from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
# FFV1_NATIVE_LIB selects an alternate build of the same runtime —
# the sanitizer harness points it at libffv1native_san.so (the
# configure *-asan/-usan toolchain analog, reference configure:3473-3494)
_LIB_PATH = (os.environ.get("FFV1_NATIVE_LIB")
             or os.path.join(_DIR, "libffv1native.so"))
_lib = None


def _build():
    subprocess.run(["make", "-s", "-C", _DIR], check=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ct.CDLL(_LIB_PATH)
    i32, i64 = ct.c_int32, ct.c_int64
    p = ct.c_void_p
    lib.ffv1n_encode_plane.restype = i64
    lib.ffv1n_encode_plane.argtypes = [
        p, i32, i32, i32, i64, i32, i32, i32, i32,
        p, p, p, p, p, i32, i32, p, p, p, i64, p, i64, p]
    lib.ffv1n_decode_plane.restype = i64
    lib.ffv1n_decode_plane.argtypes = [
        p, i32, i32, i32, i64, i32, i32, i32,
        p, p, p, p, p, i32, i32, p, p, p, i64, p]
    lib.ffv1n_encode_rgb.restype = i64
    lib.ffv1n_encode_rgb.argtypes = [
        p, p, p, i32, i32, i32, i64, i32, i32, i32,
        p, p, p, p, p, p, p, p, p, p, p, i32, i32, i32, i32,
        p, p, p, i64, p, i64, p]
    lib.ffv1n_compact_groups.restype = None
    lib.ffv1n_compact_groups.argtypes = [
        p, i64, p, i64, p, p, i32, i32, i32, i32, p, i64]
    lib.ffv1n_decode_rgb.restype = i64
    lib.ffv1n_decode_rgb.argtypes = [
        p, p, p, i32, i32, i32, i64, i32, i32,
        p, p, p, p, p, p, p, p, p, p, p, i32, i32, i32, i32,
        p, p, p, i64, p]
    _lib = lib
    return lib


def compact_groups(resolved: np.ndarray, gcounts: np.ndarray,
                   plens: np.ndarray, counts: np.ndarray,
                   pcap: int, groupc: int) -> np.ndarray:
    """Segment-copy compaction of the device's host-compact finalize
    slab (see native ffv1n_compact_groups).  resolved: uint8 (L, T)
    C-contiguous; gcounts: uint8 (L, NG); returns uint8 (L, max_count)
    with counts[l] valid bytes per lane."""
    lib = get_lib()
    L, T = resolved.shape
    ng = gcounts.shape[1]
    counts64 = np.ascontiguousarray(counts, np.int64)
    plens32 = np.ascontiguousarray(plens, np.int32)
    resolved = np.ascontiguousarray(resolved)
    gcounts = np.ascontiguousarray(gcounts)
    cap = int(counts64.max()) if L else 0
    out = np.empty((L, max(cap, 1)), np.uint8)
    lib.ffv1n_compact_groups(
        resolved.ctypes.data_as(ct.c_void_p), resolved.strides[0],
        gcounts.ctypes.data_as(ct.c_void_p), gcounts.strides[0],
        plens32.ctypes.data_as(ct.c_void_p),
        counts64.ctypes.data_as(ct.c_void_p),
        L, pcap, ng, groupc,
        out.ctypes.data_as(ct.c_void_p), out.strides[0])
    return out


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _ptr(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ct.c_void_p)


class NativeSliceCoder:
    """Bridges the Python RangeEncoder/BitWriter state to the C runtime
    for the duration of a slice's plane coding."""

    BUF_EXTRA = 1 << 16

    def __init__(self, rp, est_bytes: int):
        self.rp = rp
        self.rc_buf = np.zeros(est_bytes + self.BUF_EXTRA, dtype=np.uint8)
        self.pb_buf = np.zeros(est_bytes + self.BUF_EXTRA, dtype=np.uint8)
        self.rcf = np.zeros(4, dtype=np.int32)
        self.rc_pos = np.zeros(1, dtype=np.int64)
        self.bw_state = np.zeros(4, dtype=np.int64)
        self.one_tab = None
        self.zero_tab = None

    def load_rc(self, rc):
        """Import a Python RangeEncoder's state."""
        self.rcf[:] = [rc.low, rc.range, rc.outstanding_count,
                       rc.outstanding_byte]
        n = len(rc.out)
        self.rc_buf[:n] = np.frombuffer(bytes(rc.out), dtype=np.uint8)
        self.rc_pos[0] = n
        self.one_tab = np.ascontiguousarray(rc.one_state)
        self.zero_tab = np.ascontiguousarray(rc.zero_state)

    def store_rc(self, rc):
        """Export state back into the Python RangeEncoder."""
        rc.low = int(self.rcf[0])
        rc.range = int(self.rcf[1])
        rc.outstanding_count = int(self.rcf[2])
        rc.outstanding_byte = int(self.rcf[3])
        rc.out = bytearray(self.rc_buf[:int(self.rc_pos[0])].tobytes())

    def load_bw(self, bw):
        n = len(bw.out)
        self.pb_buf[:n] = np.frombuffer(bytes(bw.out), dtype=np.uint8)
        self.bw_state[0] = n * 8
        self.bw_state[1] = bw._acc
        self.bw_state[2] = bw._nacc

    def store_bw(self, bw):
        nbytes = int(self.bw_state[0]) // 8
        bw.out = bytearray(self.pb_buf[:nbytes].tobytes())
        bw._acc = int(self.bw_state[1])
        bw._nacc = int(self.bw_state[2])


def encode_plane(rp, ss, nsc: NativeSliceCoder, coder, src: np.ndarray,
                 w: int, h: int, plane_index: int, bits: int):
    """Native mirror of slice_codec.encode_plane."""
    lib = get_lib()
    rc, pb = coder
    ps = ss.planes[plane_index]
    src = np.ascontiguousarray(src)
    sample_size = src.dtype.itemsize
    qt = np.ascontiguousarray(ps.quant_table, dtype=np.int16)
    nsc.load_rc(rc)
    nsc.load_bw(pb)
    ret = lib.ffv1n_encode_plane(
        _ptr(src), sample_size, w, h, src.strides[0], 1, bits,
        1 if rp.packed_at_lsb else 0, 3 if rp.context_model else 2,
        _ptr(qt), _ptr(ps.states), _ptr(ps.vlc_states),
        _ptr(nsc.one_tab), _ptr(nsc.zero_tab),
        0 if rp.ac == 0 else 1, ss.slice_coding_mode,
        _ptr(nsc.rcf), _ptr(nsc.rc_pos),
        _ptr(nsc.rc_buf), len(nsc.rc_buf),
        _ptr(nsc.pb_buf), len(nsc.pb_buf),
        _ptr(nsc.bw_state))
    if ret < 0:
        raise RuntimeError(f"native encode_plane failed: {ret}")
    nsc.store_rc(rc)
    nsc.store_bw(pb)


def decode_plane(rp, ss, nsc: NativeSliceCoder, coder, dst: np.ndarray,
                 w: int, h: int, plane_index: int, bits: int, buf: bytes,
                 ps=None):
    """Native mirror of slice_codec.decode_plane."""
    lib = get_lib()
    rc, gb = coder
    ps = ps if ps is not None else ss.planes[plane_index]
    assert dst.flags.c_contiguous or dst.base is not None
    sample_size = dst.dtype.itemsize
    qt = np.ascontiguousarray(ps.quant_table, dtype=np.int16)
    src_buf = np.frombuffer(buf, dtype=np.uint8)
    rcf = np.array([rc.low, rc.range, 0, -1], dtype=np.int32)
    rc_pos = np.array([rc.pos], dtype=np.int64)
    br_pos = np.array([gb.pos if gb is not None else 0], dtype=np.int64)
    one = np.ascontiguousarray(rc.one_state)
    zero = np.ascontiguousarray(rc.zero_state)
    ret = lib.ffv1n_decode_plane(
        _ptr(dst), sample_size, w, h, dst.strides[0],
        dst.strides[1] // sample_size, bits,
        1 if rp.packed_at_lsb else 0,
        _ptr(qt), _ptr(ps.states), _ptr(ps.vlc_states),
        _ptr(one), _ptr(zero),
        0 if rp.ac == 0 else 1, ss.slice_coding_mode,
        _ptr(rcf), _ptr(rc_pos), _ptr(src_buf), len(src_buf),
        _ptr(br_pos))
    if ret < 0:
        raise RuntimeError(f"native decode_plane failed: {ret}")
    rc.low, rc.range = int(rcf[0]), int(rcf[1])
    rc.pos = int(rc_pos[0])
    if gb is not None:
        gb.pos = int(br_pos[0])


def encode_rgb(rp, ss, nsc: NativeSliceCoder, coder, planes, w, h):
    lib = get_lib()
    rc, pb = coder
    lbd = rp.bits_per_raw_sample <= 8
    bits = rp.bits_per_raw_sample or 8
    if lbd:
        arr = np.ascontiguousarray(planes)
        p0 = p1 = p2 = arr
        mode, stride = 0, arr.strides[0]
    else:
        p0, p1, p2 = [np.ascontiguousarray(p) for p in planes]
        mode, stride = 1, p0.strides[0]
    np_ = len(ss.planes)
    qts = [np.ascontiguousarray(ss.planes[min(i, np_ - 1)].quant_table,
                                dtype=np.int16) for i in range(3)]
    nsc.load_rc(rc)
    nsc.load_bw(pb)
    nsc.bw_state[3] = 0  # run_index, slice-global for RGB
    ret = lib.ffv1n_encode_rgb(
        _ptr(p0), _ptr(p1) if mode else None, _ptr(p2) if mode else None,
        mode, w, h, stride, bits, 1 if rp.transparency else 0,
        3 if rp.context_model else 2,
        _ptr(qts[0]), _ptr(qts[1]), _ptr(qts[2]),
        _ptr(ss.planes[0].states), _ptr(ss.planes[1].states),
        _ptr(ss.planes[2].states) if len(ss.planes) > 2 else None,
        _ptr(ss.planes[0].vlc_states), _ptr(ss.planes[1].vlc_states),
        _ptr(ss.planes[2].vlc_states) if len(ss.planes) > 2 else None,
        _ptr(nsc.one_tab), _ptr(nsc.zero_tab),
        0 if rp.ac == 0 else 1, ss.slice_coding_mode,
        ss.slice_rct_by_coef, ss.slice_rct_ry_coef,
        _ptr(nsc.rcf), _ptr(nsc.rc_pos), _ptr(nsc.rc_buf),
        len(nsc.rc_buf), _ptr(nsc.pb_buf), len(nsc.pb_buf),
        _ptr(nsc.bw_state))
    if ret < 0:
        raise RuntimeError(f"native encode_rgb failed: {ret}")
    nsc.store_rc(rc)
    nsc.store_bw(pb)


def decode_rgb(f, ss, coder, planes, w, h, buf):
    lib = get_lib()
    rc, gb = coder
    lbd = f.bits_per_raw_sample <= 8
    bits = f.bits_per_raw_sample or 8
    if lbd:
        arr = planes
        p0 = p1 = p2 = arr
        mode, stride = 0, arr.strides[0]
    else:
        p0, p1, p2 = planes
        mode, stride = 1, p0.strides[0]
    np_ = len(ss.planes)
    qts = [np.ascontiguousarray(ss.planes[min(i, np_ - 1)].quant_table,
                                dtype=np.int16) for i in range(3)]
    src_buf = np.frombuffer(buf, dtype=np.uint8)
    rcf = np.array([rc.low, rc.range, 0, -1], dtype=np.int32)
    rc_pos = np.array([rc.pos], dtype=np.int64)
    br_state = np.array([gb.pos if gb is not None else 0, 0],
                        dtype=np.int64)
    one = np.ascontiguousarray(rc.one_state)
    zero = np.ascontiguousarray(rc.zero_state)
    ret = lib.ffv1n_decode_rgb(
        _ptr(p0), _ptr(p1) if mode else None, _ptr(p2) if mode else None,
        mode, w, h, stride, bits, 1 if f.transparency else 0,
        _ptr(qts[0]), _ptr(qts[1]), _ptr(qts[2]),
        _ptr(ss.planes[0].states), _ptr(ss.planes[1].states),
        _ptr(ss.planes[2].states) if len(ss.planes) > 2 else None,
        _ptr(ss.planes[0].vlc_states), _ptr(ss.planes[1].vlc_states),
        _ptr(ss.planes[2].vlc_states) if len(ss.planes) > 2 else None,
        _ptr(one), _ptr(zero),
        0 if f.ac == 0 else 1, ss.slice_coding_mode,
        ss.slice_rct_by_coef, ss.slice_rct_ry_coef,
        _ptr(rcf), _ptr(rc_pos), _ptr(src_buf), len(src_buf),
        _ptr(br_state))
    if ret < 0:
        raise RuntimeError(f"native decode_rgb failed: {ret}")
    rc.low, rc.range = int(rcf[0]), int(rcf[1])
    rc.pos = int(rc_pos[0])
    if gb is not None:
        gb.pos = int(br_state[0])

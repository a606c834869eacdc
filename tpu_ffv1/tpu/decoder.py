"""TPU-path FFV1 decoder driver (version 3+, range coder, planar YUV).

Host parses the packet structure (keyframe bit, footer chain, CRCs,
slice headers — a few dozen symbols); the per-pixel work runs as device
scans (dec_scan.py).  Adaptive states stay device-resident across frames
for GOP/P-frame inheritance (ffv1dec.c:376-403 — in-process the state
arrays simply persist, which is the semantic the thread-copy code
implements).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bitstream.headers import read_extra_header, read_slice_header
from ..core import tables as T
from ..core.crc import crc32_ieee
from ..core.rac import RangeDecoder, custom_state_tables, default_state_tables
from ..core.intmath import ceil_rshift
from ..codec.context import SliceState, slice_grid
from .dec_scan import rc_decode_plane


class TPUFFV1Decoder:
    def __init__(self, width: int, height: int, extradata: bytes):
        g = read_extra_header(extradata)
        if g.ac == T.AC_GOLOMB_RICE:
            raise NotImplementedError("TPU decode requires the range coder")
        if g.colorspace != 0:
            raise NotImplementedError("TPU decode supports planar YUV/gray")
        self.g = g
        self.width = width
        self.height = height
        # mirror FFV1Decoder attribute surface used by read_slice_header
        self.version = g.version
        self.num_h_slices = g.num_h_slices
        self.num_v_slices = g.num_v_slices
        self.plane_count = g.plane_count
        self.quant_table_count = g.quant_table_count
        self.ec = g.ec
        self.bits = 8 if g.bits_per_raw_sample <= 8 else g.bits_per_raw_sample
        if g.ac == T.AC_RANGE_CUSTOM_TAB:
            one, zero = custom_state_tables(g.state_transition)
        else:
            one, zero = default_state_tables()
        self.tables = (one, zero)
        self.one_tab = jnp.asarray(one)
        self.zero_tab = jnp.asarray(zero)

        self.geoms = slice_grid(width, height, g.num_h_slices, g.num_v_slices)
        self.key_frame_ok = False
        # per-slice: device states + quant table index (from slice header)
        self.slice_states: list = [None] * len(self.geoms)
        self.qts = [jnp.asarray(q, dtype=jnp.int32) for q in g.quant_tables]
        # damage tracking: per-slice CRC / decode failures are concealed
        # from the previous picture and stay concealed until the next
        # keyframe (ffv1dec.c:963-980 CRC, :1001-1021 concealment,
        # damage persists through inherited contexts :383)
        self.slice_damaged = [False] * len(self.geoms)
        self.last_planes = None

    def _split_slices(self, pkt: bytes):
        trailer = 3 + 5 * (1 if self.ec else 0)
        count = 0
        p = len(pkt)
        bounds = []
        while count < T.MAX_SLICES and p > 3:
            size = int.from_bytes(pkt[p - trailer:p - trailer + 3], "big")
            if size + trailer > p:
                break
            bounds.append((p - size - trailer, p))
            p -= size + trailer
            count += 1
        bounds.reverse()
        return bounds

    def decode_frame(self, pkt: bytes):
        g = self.g
        rc = RangeDecoder(pkt, *default_state_tables())
        keystate = np.array([128], dtype=np.uint8)
        keyframe = bool(rc.get_rac(keystate, 0))
        if not keyframe and not self.key_frame_ok:
            raise ValueError("cannot decode non-keyframe without keyframe")

        bounds = self._split_slices(pkt)
        if len(bounds) != len(self.geoms):
            raise ValueError("slice count mismatch")

        h, w = self.height, self.width
        dt = np.uint8 if self.bits <= 8 else np.uint16
        planes = [np.zeros((h, w), dtype=dt)]
        hs, vs = g.chroma_h_shift, g.chroma_v_shift
        if g.chroma_planes:
            planes += [np.zeros((ceil_rshift(h, vs), ceil_rshift(w, hs)),
                                dtype=dt) for _ in range(2)]
        if g.transparency:
            planes.append(np.zeros((h, w), dtype=dt))

        for si, (start, end) in enumerate(bounds):
            if keyframe:
                self.slice_damaged[si] = False
            if self.ec and crc32_ieee(pkt[start:end]) != 0:
                self.slice_damaged[si] = True
            buf = pkt[start:end] if si else pkt[:end]
            src = RangeDecoder(buf)
            src.set_tables(*self.tables)
            if si == 0:
                # continue after the keyframe bit
                src.low, src.range, src.pos = rc.low, rc.range, rc.pos
            try:
                self._decode_slice(si, buf, src, planes, keyframe)
            except (ValueError, IndexError):
                self.slice_damaged[si] = True

        # conceal damaged rects from the previous picture
        if self.last_planes is not None:
            for si, damaged in enumerate(self.slice_damaged):
                if not damaged:
                    continue
                geom = self.geoms[si]
                hs, vs = g.chroma_h_shift, g.chroma_v_shift
                for j, (dst, src_p) in enumerate(zip(planes,
                                                     self.last_planes)):
                    sh = hs if j in (1, 2) and g.chroma_planes else 0
                    sv = vs if j in (1, 2) and g.chroma_planes else 0
                    ys, xs = geom.y >> sv, geom.x >> sh
                    he = ceil_rshift(geom.y + geom.height, sv)
                    we = ceil_rshift(geom.x + geom.width, sh)
                    dst[ys:he, xs:we] = src_p[ys:he, xs:we]

        self.last_planes = planes
        self.key_frame_ok = True
        return planes, keyframe

    def _decode_slice(self, si, buf, src, planes, keyframe):
        g = self.g
        geom = self.geoms[si]
        ss = SliceState(geom=geom)
        qidxs, _ = read_slice_header(self, ss, src)
        qidx = qidxs[0]
        cc = g.context_counts[qidx]
        qt = self.qts[qidx]
        five = bool(g.quant_tables[qidx][3][127])

        n_state_planes = 1 + (1 if g.chroma_planes else 0) + \
            (1 if g.transparency else 0)
        total_cc = n_state_planes * cc
        if keyframe or self.slice_states[si] is None:
            init = g.initial_states[qidx]
            if init is not None:
                states = jnp.asarray(
                    np.tile(np.asarray(init[:cc]), (n_state_planes, 1)))
            else:
                states = jnp.full((total_cc, 32), 128, dtype=jnp.uint8)
        else:
            states = self.slice_states[si]

        dbuf = jnp.asarray(np.frombuffer(buf, dtype=np.uint8))
        low, rng, pos = (jnp.int32(src.low), jnp.int32(src.range),
                         jnp.int32(src.pos))

        x, y, sw, sh = geom.x, geom.y, geom.width, geom.height
        hs, vs = g.chroma_h_shift, g.chroma_v_shift
        jobs = [(0, sw, sh, x, y, planes[0])]
        if g.chroma_planes:
            cw, ch = ceil_rshift(sw, hs), ceil_rshift(sh, vs)
            jobs.append((1, cw, ch, x >> hs, y >> vs, planes[1]))
            jobs.append((1, cw, ch, x >> hs, y >> vs, planes[2]))
        if g.transparency:
            jobs.append((2 if g.chroma_planes else 1, sw, sh, x, y,
                         planes[-1]))

        for sp, pw, ph, px, py, dst in jobs:
            plane, states, low, rng, pos = rc_decode_plane(
                dbuf, states, self.one_tab, self.zero_tab, qt,
                jnp.int32(sp * cc), low, rng, pos, pw, ph, self.bits, five)
            out = np.asarray(plane)
            if self.bits <= 8:
                dst[py:py + ph, px:px + pw] = out & 0xFF
            elif g.version >= 0 and self._packed_at_lsb():
                dst[py:py + ph, px:px + pw] = out
            else:
                dst[py:py + ph, px:px + pw] = (out << (16 - self.bits)) \
                    & 0xFFFF
        self.slice_states[si] = states

        # sentinel + byte-count check (ffv1dec.c:459-467)
        src.low, src.range, src.pos = int(low), int(rng), int(pos)
        sentinel = np.array([129], dtype=np.uint8)
        src.get_rac(sentinel, 0)
        v = (len(buf) - src.pos) - 2 - 5 * (1 if self.ec else 0)
        if v:
            raise ValueError(f"slice {si} bytestream end mismatch by {v}")

    def _packed_at_lsb(self):
        return self.g.bits_per_raw_sample in (9, 10) or \
            (self.g.bits_per_raw_sample <= 8)

"""Frame-level FFV1 decoder (host/spec path).

Decodes streams from the reference encoder and from this framework,
including GOP/inter frames (per-slice context inheritance), per-slice CRC
validation, damaged-slice concealment, and v0..v4 headers.

Behavioral parity reference: libavcodec/ffv1dec.c:282-1035.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.headers import (GlobalHeader, read_extra_header,
                                 read_quant_tables, read_slice_header)
from ..bitstream.symbols import get_symbol
from ..core import tables as T
from ..core.crc import crc32_ieee
from ..core.golomb import BitReader, new_vlc_states
from ..core.rac import RangeDecoder, custom_state_tables, default_state_tables
from ..core.intmath import ceil_rshift
from .context import PlaneState, SliceState, slice_grid
from .pixfmt import get_pix_fmt, reconstruct_pix_fmt
from .slice_codec import decode_plane, decode_rgb_frame


class _DecParams:
    """Just enough of ResolvedParams for the slice codec."""

    def __init__(self):
        self.ac = 0
        self.packed_at_lsb = False
        self.bits_per_raw_sample = 8
        self.transparency = False
        self.context_model = 0


class FFV1Decoder:
    """Host FFV1 decoder.  ``engine``: "spec" | "native" | "auto"."""

    def __init__(self, width: int, height: int,
                 extradata: bytes | None = None, engine: str = "auto"):
        if engine == "auto":
            from .. import native as _native
            engine = "native" if _native.available() else "spec"
        self.engine = engine
        self.width = width
        self.height = height
        self.version = 0
        self.micro_version = 0
        self.ac = 0
        self.state_transition = None
        self.colorspace = 0
        self.bits_per_raw_sample = 8
        self.chroma_planes = False
        self.chroma_h_shift = 0
        self.chroma_v_shift = 0
        self.transparency = False
        self.plane_count = 0
        self.num_h_slices = 1
        self.num_v_slices = 1
        self.quant_table_count = 0
        self.quant_tables = None          # (n, 5, 256)
        self.context_counts = ()
        self.initial_states = []
        self.quant_table = None           # v<2 single table
        self.context_count_v01 = 0
        self.ec = 0
        self.intra = 0
        self.packed_at_lsb = False
        self.pix_fmt: str | None = None
        self.key_frame_ok = False
        self.picture_number = 0
        self.slices: list[SliceState] = []
        self.slice_count = 0
        self.last_planes = None
        self._v2_qidxs: list = []

        if extradata:
            g = read_extra_header(extradata)
            self._apply_global(g)

    # ------------------------------------------------------------------

    def _apply_global(self, g: GlobalHeader):
        self.version = g.version
        self.micro_version = g.micro_version
        self.ac = g.ac
        self.state_transition = g.state_transition
        self.colorspace = g.colorspace
        self.bits_per_raw_sample = g.bits_per_raw_sample or 8
        self.chroma_planes = g.chroma_planes
        self.chroma_h_shift = g.chroma_h_shift
        self.chroma_v_shift = g.chroma_v_shift
        self.transparency = g.transparency
        self.plane_count = g.plane_count
        self.num_h_slices = g.num_h_slices
        self.num_v_slices = g.num_v_slices
        self.quant_table_count = g.quant_table_count
        self.quant_tables = g.quant_tables
        self.context_counts = g.context_counts
        self.initial_states = g.initial_states
        self.ec = g.ec
        self.intra = g.intra
        self._init_slices()
        self._resolve_pix_fmt()
        from ..log import INFO, debug_enabled, log
        if debug_enabled("pict"):
            # FF_DEBUG_PICT_INFO global-header dump (ffv1dec.c:620-634)
            log(INFO, "ffv1-dec",
                f"global: ver:{self.version}.{self.micro_version}, "
                f"coder:{self.ac}, colorspace: {self.colorspace} "
                f"bpr:{self.bits_per_raw_sample} "
                f"chroma:{int(self.chroma_planes)}"
                f"({self.chroma_h_shift}:{self.chroma_v_shift}), "
                f"alpha:{int(self.transparency)} "
                f"slices:{self.num_h_slices}x{self.num_v_slices} "
                f"qtabs:{self.quant_table_count} ec:{self.ec} "
                f"intra:{self.intra} -> {self.pix_fmt}")

    def _resolve_pix_fmt(self):
        self.pix_fmt = reconstruct_pix_fmt(
            self.colorspace, self.bits_per_raw_sample, self.chroma_planes,
            self.chroma_h_shift, self.chroma_v_shift, self.transparency)
        fmt = get_pix_fmt(self.pix_fmt)
        self.packed_at_lsb = fmt.packed_at_lsb

    def _init_slices(self):
        geoms = slice_grid(self.width, self.height,
                           self.num_h_slices, self.num_v_slices)
        self.slices = [SliceState(geom=g) for g in geoms]

    def _dec_rp(self):
        rp = _DecParams()
        rp.ac = self.ac
        rp.packed_at_lsb = self.packed_at_lsb
        rp.bits_per_raw_sample = self.bits_per_raw_sample
        rp.transparency = self.transparency
        return rp

    def _alloc_frame(self):
        h, w = self.height, self.width
        bits = self.bits_per_raw_sample
        dt = np.uint8 if bits <= 8 else np.uint16
        if self.colorspace == 1:
            if bits <= 8:
                return [np.zeros((h, w, 4), dtype=np.uint8)]
            return [np.zeros((h, w), dtype=np.uint16) for _ in range(3)]
        if self.transparency and not self.chroma_planes:  # ya8
            return [np.zeros((h, w, 2), dtype=np.uint8)]
        planes = [np.zeros((h, w), dtype=dt)]
        if self.chroma_planes:
            ch = ceil_rshift(h, self.chroma_v_shift)
            cw = ceil_rshift(w, self.chroma_h_shift)
            planes += [np.zeros((ch, cw), dtype=dt) for _ in range(2)]
        if self.transparency and self.chroma_planes:
            planes.append(np.zeros((h, w), dtype=dt))
        return planes

    # ------------------------------------------------------------------

    def _read_header_v01(self, c: RangeDecoder):
        """ffv1dec.c:646-800 for version < 2 keyframe headers."""
        states = np.full(T.CONTEXT_SIZE, 128, dtype=np.uint8)
        v = get_symbol(c, states, False)
        if v >= 2:
            raise ValueError("invalid version in v01 header")
        self.version = v
        self.ac = get_symbol(c, states, False)
        if self.ac == T.AC_RANGE_CUSTOM_TAB:
            one, _ = default_state_tables()
            st = np.zeros(256, dtype=np.uint8)
            for i in range(1, 256):
                st[i] = (get_symbol(c, states, True) + int(one[i])) & 0xFF
            self.state_transition = st
        self.colorspace = get_symbol(c, states, False)
        if self.version > 0:
            self.bits_per_raw_sample = get_symbol(c, states, False) or 8
        else:
            self.bits_per_raw_sample = self.bits_per_raw_sample or 8
        self.chroma_planes = bool(c.get_rac(states, 0))
        self.chroma_h_shift = get_symbol(c, states, False)
        self.chroma_v_shift = get_symbol(c, states, False)
        self.transparency = bool(c.get_rac(states, 0))
        self.plane_count = 2 + (1 if self.transparency else 0)
        self.quant_table, self.context_count_v01 = read_quant_tables(c)
        self._resolve_pix_fmt()
        if not self.slices:
            self.num_h_slices = self.num_v_slices = 1
            self._init_slices()
        self.slice_count = 1

    def _read_header_v2(self, c: RangeDecoder):
        """Version-2 keyframe header: in-band slice list
        (ffv1dec.c:801-871)."""
        states = np.full(T.CONTEXT_SIZE, 128, dtype=np.uint8)
        count = get_symbol(c, states, False)
        if not (0 < count <= len(self.slices)):
            raise ValueError("invalid v2 slice count")
        self.slice_count = count
        self._v2_qidxs = []
        for j in range(count):
            ss = self.slices[j]
            g = ss.geom
            sx = get_symbol(c, states, False) * self.width
            sy = get_symbol(c, states, False) * self.height
            sw = (get_symbol(c, states, False) + 1) * self.width + sx
            sh = (get_symbol(c, states, False) + 1) * self.height + sy
            g.x = sx // self.num_h_slices
            g.y = sy // self.num_v_slices
            g.width = sw // self.num_h_slices - g.x
            g.height = sh // self.num_v_slices - g.y
            if not (0 < g.width <= self.width and
                    0 < g.height <= self.height and
                    g.x + g.width <= self.width and
                    g.y + g.height <= self.height):
                raise ValueError("bad v2 slice geometry")
            qidxs = []
            for _ in range(self.plane_count):
                idx = get_symbol(c, states, False)
                if idx > self.quant_table_count:
                    raise ValueError("v2 quant_table_index out of range")
                qidxs.append(idx)
            self._v2_qidxs.append(qidxs)

    def _discover_slices_v3(self, buf: bytes, start_offset: int):
        """Footer-chain walk (ffv1dec.c:803-814)."""
        trailer = 3 + 5 * (1 if self.ec else 0)
        count = 0
        p = len(buf)
        while count < T.MAX_SLICES and p - start_offset > 3:
            size = int.from_bytes(buf[p - trailer:p - trailer + 3], "big")
            if size + trailer > p - start_offset:
                break
            p -= size + trailer
            count += 1
        return count

    def _ensure_plane_states(self, ss: SliceState, qidxs):
        """(Re)allocate per-plane adaptive state for given quant tables."""
        if not ss.planes:
            ss.planes = [None] * self.plane_count
        for i in range(self.plane_count):
            if self.version < 2:
                cc = self.context_count_v01
                qt = self.quant_table
                qidx = 0
            else:
                qidx = qidxs[i] if qidxs else 0
                cc = self.context_counts[qidx]
                qt = self.quant_tables[qidx]
            ps = ss.planes[i]
            if ps is None or ps.context_count != cc:
                ps = PlaneState(quant_table_index=qidx, context_count=cc)
                ss.planes[i] = ps
            ps.quant_table_index = qidx
            ps.quant_table = np.array(qt)
            if self.ac != T.AC_GOLOMB_RICE:
                if ps.states is None:
                    ps.states = np.full((cc, T.CONTEXT_SIZE), 128,
                                        dtype=np.uint8)
            else:
                if ps.vlc_states is None:
                    ps.vlc_states = new_vlc_states(cc)

    def _clear_slice(self, ss: SliceState):
        for ps in ss.planes:
            if ps.states is not None:
                init = None
                if self.initial_states:
                    init = self.initial_states[ps.quant_table_index]
                if init is not None:
                    ps.states[:] = init[:ps.context_count]
                else:
                    ps.states[:] = 128
            if ps.vlc_states is not None:
                ps.vlc_states[:] = new_vlc_states(ps.context_count)

    # ------------------------------------------------------------------

    def _decode_slice(self, si: int, buf: bytes, rc: RangeDecoder,
                      planes, keyframe: bool):
        ss = self.slices[si]
        ss.slice_rct_by_coef = 1
        ss.slice_rct_ry_coef = 1
        ss.slice_reset_contexts = 0
        ss.slice_coding_mode = 0

        qidxs = None
        if self.version > 2:
            qidxs, _info = read_slice_header(self, ss, rc)
        elif self.version == 2:
            qidxs = self._v2_qidxs[si]
        self._ensure_plane_states(ss, qidxs)
        if keyframe or ss.slice_reset_contexts:
            self._clear_slice(ss)

        rp = self._dec_rp()
        gb = None
        if self.ac == T.AC_GOLOMB_RICE:
            if (self.version == 3 and self.micro_version > 1) or \
                    self.version > 3:
                sentinel = np.array([129], dtype=np.uint8)
                rc.get_rac(sentinel, 0)
            if self.version > 2 or (ss.geom.x == 0 and ss.geom.y == 0):
                ac_byte_count = rc.bytes_consumed() - 1
            else:
                ac_byte_count = 0
            gb = BitReader(buf, ac_byte_count)
        coder = (rc, gb)

        g = ss.geom
        w, h, x, y = g.width, g.height, g.x, g.y
        bits = self.bits_per_raw_sample
        use_native = self.engine == "native"
        if use_native:
            from .. import native as N

            def dec_plane(dst, pw, ph, pi, pbits):
                N.decode_plane(rp, ss, None, coder, dst, pw, ph, pi,
                               pbits, buf)

            def dec_rgb(dstp, pw, ph):
                N.decode_rgb(self, ss, coder, dstp, pw, ph, buf)
        else:
            def dec_plane(dst, pw, ph, pi, pbits):
                decode_plane(rp, ss, coder, dst, pw, ph, pi, pbits)

            def dec_rgb(dstp, pw, ph):
                rp.context_model = 0
                decode_rgb_frame(rp, ss, coder, dstp, pw, ph)

        if self.colorspace == 0 and (self.chroma_planes or
                                     not self.transparency):
            dec_plane(planes[0][y:y + h, x:x + w], w, h, 0,
                      8 if bits <= 8 else bits)
            if self.chroma_planes:
                hs, vs = self.chroma_h_shift, self.chroma_v_shift
                cw, ch = ceil_rshift(w, hs), ceil_rshift(h, vs)
                cx, cy = x >> hs, y >> vs
                dec_plane(planes[1][cy:cy + ch, cx:cx + cw], cw, ch, 1,
                          8 if bits <= 8 else bits)
                dec_plane(planes[2][cy:cy + ch, cx:cx + cw], cw, ch, 1,
                          8 if bits <= 8 else bits)
            if self.transparency:
                pidx = 1 if (self.version >= 4 and not self.chroma_planes) \
                    else 2
                dec_plane(planes[-1][y:y + h, x:x + w], w, h, pidx,
                          8 if bits <= 8 else bits)
        elif self.colorspace == 0:  # ya8 (interleaved luma+alpha)
            # both engines decode straight into the channel-strided
            # views (the native runtime takes a pixel stride, exactly
            # like the reference's pixel_stride arg, ffv1dec.c:185)
            sp = planes[0][y:y + h, x:x + w]
            dec_plane(sp[..., 0], w, h, 0, 8)
            dec_plane(sp[..., 1], w, h, 1, 8)
        else:
            if self.bits_per_raw_sample <= 8:
                sp = planes[0][y:y + h, x:x + w]
            else:
                sp = [p[y:y + h, x:x + w] for p in planes]
            dec_rgb(sp, w, h)

        if self.ac != T.AC_GOLOMB_RICE and self.version > 2:
            sentinel = np.array([129], dtype=np.uint8)
            rc.get_rac(sentinel, 0)
            v = (rc.end - rc.bytes_consumed()) - 2 - \
                5 * (1 if self.ec else 0)
            if v:
                ss.slice_damaged = True

    # ------------------------------------------------------------------

    def reset(self):
        """Flush analog (avcodec_flush_buffers): the seek entry point.
        Forgets the concealment reference and keyframe gate; the next
        packet must be a keyframe (ffv1dec.c:931), which clears slice
        contexts on entry (ffv1dec.c:419-420)."""
        self.key_frame_ok = False
        self.last_planes = None
        self.picture_number = 0

    def decode_frame(self, pkt: bytes):
        """Decode one packet -> (planes, is_keyframe)."""
        rc = RangeDecoder(pkt, *default_state_tables())
        keystate = np.array([128], dtype=np.uint8)
        keyframe = bool(rc.get_rac(keystate, 0))
        from ..log import INFO, debug_enabled, log
        if debug_enabled("pict"):
            # per-frame FF_DEBUG_PICT_INFO line (ffv1dec.c:942-944)
            log(INFO, "ffv1-dec",
                f"frame {self.picture_number}: keyframe:{int(keyframe)} "
                f"coder:{self.ac} bytes:{len(pkt)}")

        if keyframe:
            self.key_frame_ok = False
            if self.version < 2:
                self._read_header_v01(rc)
            elif self.version == 2:
                self._read_header_v2(rc)
            else:
                self.slice_count = self._discover_slices_v3(pkt, 0)
            self.key_frame_ok = True
        else:
            if not self.key_frame_ok:
                raise ValueError(
                    "cannot decode non-keyframe without valid keyframe")
            if self.version < 2:
                self.slice_count = 1
            elif self.version > 2:
                self.slice_count = self._discover_slices_v3(pkt, 0)
            # version == 2: slice list persists from the keyframe header

        if not (0 < self.slice_count <= len(self.slices)):
            raise ValueError("invalid slice count")

        # custom table applies to slice payload decoding
        if self.ac == T.AC_RANGE_CUSTOM_TAB:
            tables = custom_state_tables(self.state_transition)
        else:
            tables = default_state_tables()

        planes = self._alloc_frame()

        # split the footer chain from the end (ffv1dec.c:948-989)
        trailer = 3 + 5 * (1 if self.ec else 0)
        end = len(pkt)
        slice_bufs: list = [None] * self.slice_count
        for i in range(self.slice_count - 1, -1, -1):
            if i or self.version > 2:
                v = int.from_bytes(pkt[end - trailer:end - trailer + 3],
                                   "big") + trailer
            else:
                v = end
            if end < v:
                raise ValueError("slice pointer chain broken")
            start = end - v
            if self.ec:
                if crc32_ieee(pkt[start:end]) != 0:
                    self.slices[i].slice_damaged = True
            slice_bufs[i] = (start, end)
            end = start

        def run_slice(i):
            ss = self.slices[i]
            if keyframe:
                ss.slice_damaged = False
            start, sl_end = slice_bufs[i]
            try:
                if i == 0:
                    rc.end = sl_end
                    src = rc
                    buf = pkt[:sl_end]
                else:
                    buf = pkt[start:sl_end]
                    src = RangeDecoder(buf)
                src.set_tables(*tables)
                self._decode_slice(i, buf, src, planes, keyframe)
            except (ValueError, IndexError):
                ss.slice_damaged = True

        if self.engine == "native" and self.slice_count > 1:
            # slice-thread pool (pthread_slice.c analog); slices write
            # disjoint plane rects and own their states
            import concurrent.futures
            if not hasattr(self, "_pool") or self._pool is None:
                import os as _os
                self._pool = concurrent.futures.ThreadPoolExecutor(
                    max_workers=min(self.slice_count,
                                    _os.cpu_count() or 1))
            list(self._pool.map(run_slice, range(self.slice_count)))
        else:
            for i in range(self.slice_count):
                run_slice(i)

        # concealment: copy damaged rects from the previous picture
        # (ffv1dec.c:998-1021)
        if self.last_planes is not None:
            for ss in self.slices[:self.slice_count]:
                if not ss.slice_damaged:
                    continue
                g = ss.geom
                for j, (dst, src_p) in enumerate(zip(planes,
                                                     self.last_planes)):
                    if dst.ndim == 3:
                        dst[g.y:g.y + g.height, g.x:g.x + g.width] = \
                            src_p[g.y:g.y + g.height, g.x:g.x + g.width]
                        continue
                    sh = self.chroma_h_shift if j in (1, 2) else 0
                    sv = self.chroma_v_shift if j in (1, 2) else 0
                    ys, xs = g.y >> sv, g.x >> sh
                    he = ceil_rshift(g.y + g.height, sv)
                    we = ceil_rshift(g.x + g.width, sh)
                    dst[ys:he, xs:we] = src_p[ys:he, xs:we]

        self.last_planes = planes
        self.picture_number += 1
        return planes, keyframe

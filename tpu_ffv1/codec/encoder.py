"""Frame-level FFV1 encoder (host/spec path).

Produces packets byte-identical to the reference encoder
(libavcodec/ffv1enc.c:1146-1373) for the same inputs and parameters.

Usage:
    enc = FFV1Encoder(EncoderParams(width=..., height=..., pix_fmt=...))
    pkt, key = enc.encode_frame(frame_planes)
    enc.extradata  # container global header (None for version < 2)
"""
from __future__ import annotations

import os

import numpy as np

from ..bitstream.headers import (write_extradata, write_frame_header_v01,
                                 write_frame_header_v2, write_slice_header)
from ..core import tables as T
from ..core.crc import crc32_ieee
from ..core.golomb import BitWriter
from ..core.rac import RangeEncoder, custom_state_tables, default_state_tables
from ..core.intmath import ceil_rshift
from .context import alloc_slice_state, clear_slice_state, slice_grid
from .params import EncoderParams, ResolvedParams, resolve
from .slice_codec import encode_plane, encode_rgb_frame


class FFV1Encoder:
    """Host FFV1 encoder.

    ``engine``: "spec" (pure-Python oracle), "native" (C runtime), or
    "auto" (native when the library builds, else spec).  Both engines are
    byte-identical; two-pass statistics (pass1) force the spec engine.
    """

    def __init__(self, params: EncoderParams, engine: str = "auto"):
        self.params = params
        self.rp: ResolvedParams = resolve(params)
        rp = self.rp
        if engine == "auto":
            from .. import native as _native
            engine = "native" if (_native.available() and not rp.pass1) \
                else "spec"
        self.engine = engine

        # two-pass (SURVEY §3.5): pass 1 statistics / pass 2 tuning
        self.stats = None
        if rp.pass1:
            from .twopass import Pass1Stats
            self.stats = Pass1Stats(rp.quant_table_count,
                                    rp.context_counts)
        if params.stats_in:
            from .twopass import (build_initial_states, find_best_state,
                                  parse_stats, sort_stt)
            rc_stat, rc_stat2, gob = parse_stats(
                params.stats_in, rp.quant_table_count, rp.context_counts)
            if rp.ac == T.AC_RANGE_CUSTOM_TAB:
                sort_stt(rc_stat, rp.state_transition)
            best = find_best_state(rp.state_transition)
            rp.initial_states = build_initial_states(
                rc_stat2, gob, best, rp.context_counts)
        self.extradata = write_extradata(rp) if rp.version > 1 else None
        self.geoms = slice_grid(rp.width, rp.height,
                                rp.num_h_slices, rp.num_v_slices)
        self.slices = [alloc_slice_state(rp, g) for g in self.geoms]
        self.picture_number = 0
        self.key_frame = False
        if rp.ac == T.AC_RANGE_CUSTOM_TAB:
            self._slice_tables = custom_state_tables(rp.state_transition)
        else:
            self._slice_tables = default_state_tables()
        self._pool = None
        if self.engine == "native" and rp.slice_count > 1:
            import concurrent.futures
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=min(rp.slice_count, os.cpu_count() or 1))

    # -- helpers ----------------------------------------------------------

    def _slice_planes(self, planes, geom):
        """Crop input planes to one slice's rectangle."""
        rp = self.rp
        fmt = rp.fmt
        x, y, w, h = geom.x, geom.y, geom.width, geom.height
        if rp.colorspace == 1:
            if rp.bits_per_raw_sample <= 8:
                return planes[0][y:y + h, x:x + w]  # (h, w, 4) view
            return [p[y:y + h, x:x + w] for p in planes]
        if fmt.interleaved:  # ya8
            return planes[0][y:y + h, x:x + w]      # (h, w, 2) view
        out = [planes[0][y:y + h, x:x + w]]
        if rp.chroma_planes:
            hs, vs = rp.chroma_h_shift, rp.chroma_v_shift
            cx, cy = x >> hs, y >> vs
            cw, ch = ceil_rshift(w, hs), ceil_rshift(h, vs)
            out.append(planes[1][cy:cy + ch, cx:cx + cw])
            out.append(planes[2][cy:cy + ch, cx:cx + cw])
        if rp.transparency:
            out.append(planes[-1][y:y + h, x:x + w])
        return out

    def _encode_slice(self, si: int, planes, keyframe: bool,
                      rc: RangeEncoder, stat_hook=None) -> bytes:
        """ffv1enc.c:1146-1220 (no PCM retry: host buffers are unbounded)."""
        rp = self.rp
        ss = self.slices[si]
        geom = ss.geom
        ss.slice_coding_mode = 0
        ss.slice_rct_by_coef = 1
        ss.slice_rct_ry_coef = 1
        if rp.version > 3 and rp.colorspace == 1:
            # per-slice RCT search (ffv1enc.c:1163-1168; see codec/rct.py
            # for why subsampled/8-bit YUV keeps the defaults)
            from .rct import choose_rct_params
            sp0 = self._slice_planes(planes, geom)
            ss.slice_rct_by_coef, ss.slice_rct_ry_coef = \
                choose_rct_params(sp0, rp.bits_per_raw_sample <= 8)
        elif (rp.version > 3 and rp.colorspace == 0 and
              rp.chroma_planes and rp.bits_per_raw_sample > 8 and
              rp.chroma_h_shift == 0 and rp.chroma_v_shift == 0):
            # the reference runs the RCT search on YUV too
            # (ffv1enc.c:1163-1164 has no colorspace guard), reading
            # Y/U/V as its b/g/r planes.  For full-res >8-bit chroma the
            # reads are in-bounds and a pure function of the pixels, so
            # parity is exact; subsampled or 8-bit layouts would read
            # stride-dependent garbage (see codec/rct.py) and keep (1,1)
            from .rct import choose_rct_params
            sp0 = self._slice_planes(planes, geom)
            ss.slice_rct_by_coef, ss.slice_rct_ry_coef = \
                choose_rct_params(sp0[:3], False)

        if keyframe:
            clear_slice_state(rp, ss)
        if rp.version > 2:
            write_slice_header(rp, ss, rc)

        pb = BitWriter()
        ac_bytes = b""
        if rp.ac == T.AC_GOLOMB_RICE:
            if rp.version > 2:
                sentinel = np.array([129], dtype=np.uint8)
                rc.put_rac(sentinel, 0, 0)
            if rp.version > 2 or (geom.x == 0 and geom.y == 0):
                ac_bytes = rc.terminate()
            # else: coder output discarded (cannot happen: v<=2 is 1 slice)
        coder = (rc, pb)

        sp = self._slice_planes(planes, geom)
        w, h = geom.width, geom.height
        bits = 8 if rp.bits_per_raw_sample <= 8 else rp.bits_per_raw_sample

        use_native = self.engine == "native" and stat_hook is None
        if use_native:
            from .. import native as N
            nsc = N.NativeSliceCoder(
                rp, w * h * (1 + rp.bits_per_raw_sample // 8) * 4 + 4096)

            def enc_plane(src, pw, ph, pi, pbits):
                N.encode_plane(rp, ss, nsc, coder, np.asarray(src),
                               pw, ph, pi, pbits)

            def enc_rgb(srcp, pw, ph):
                N.encode_rgb(rp, ss, nsc, coder, srcp, pw, ph)
        else:
            def enc_plane(src, pw, ph, pi, pbits):
                encode_plane(rp, ss, coder, src, pw, ph, pi, pbits,
                             stat_hook)

            def enc_rgb(srcp, pw, ph):
                encode_rgb_frame(rp, ss, coder, srcp, pw, ph, stat_hook)

        if rp.colorspace == 0 and not rp.fmt.interleaved:
            enc_plane(sp[0], w, h, 0, bits)
            if rp.chroma_planes:
                cw, ch = ceil_rshift(w, rp.chroma_h_shift), \
                    ceil_rshift(h, rp.chroma_v_shift)
                enc_plane(sp[1], cw, ch, 1, bits)
                enc_plane(sp[2], cw, ch, 1, bits)
            if rp.transparency:
                enc_plane(sp[-1], w, h, 2, bits)
        elif rp.colorspace == 0 and rp.fmt.interleaved:  # ya8
            enc_plane(np.ascontiguousarray(sp[..., 0]), w, h, 0, 8)
            enc_plane(np.ascontiguousarray(sp[..., 1]), w, h, 1, 8)
        else:
            enc_rgb(sp, w, h)

        if rp.ac != T.AC_GOLOMB_RICE:
            sentinel = np.array([129], dtype=np.uint8)
            rc.put_rac(sentinel, 0, 0)
            return rc.terminate()
        return ac_bytes + pb.flush()

    # -- public API -------------------------------------------------------

    def reset(self):
        """Flush analog (avcodec_flush_buffers): restart the GOP
        cadence.  The next frame is a keyframe, which clears all slice
        contexts on entry (ffv1enc.c:1171-1172); accumulated two-pass
        statistics are kept, as in the reference."""
        self.picture_number = 0

    def encode_frame(self, planes) -> tuple[bytes, bool]:
        """Encode one frame; returns (packet bytes, is_keyframe).

        ``planes``: see codec/pixfmt.py frame data convention.
        """
        rp = self.rp
        if not isinstance(planes, (list, tuple)):
            planes = [planes]
        planes = [np.asarray(p) for p in planes]

        keyframe = (rp.gop_size == 0 or
                    self.picture_number % rp.gop_size == 0)
        self.key_frame = keyframe

        # Slice 0's coder starts with the default tables: the keyframe bit
        # (and the v<3 in-band header) are coded before the custom-table
        # switch (ffv1enc.c:1287-1315).
        rc0 = RangeEncoder(*default_state_tables())
        keystate = np.array([128], dtype=np.uint8)
        rc0.put_rac(keystate, 0, 1 if keyframe else 0)
        if keyframe:
            if rp.version < 2:
                write_frame_header_v01(rp, rc0)
            elif rp.version == 2:
                write_frame_header_v2(rp, self.slices, rc0)
        if rp.ac == T.AC_RANGE_CUSTOM_TAB:
            rc0.set_tables(*self._slice_tables)

        if keyframe and self.stats is not None:
            self.stats.gob_count += 1

        hook = self.stats.hook if self.stats is not None else None
        rcs = [rc0 if si == 0 else RangeEncoder(*self._slice_tables)
               for si in range(len(self.slices))]
        if self._pool is not None and hook is None:
            # slice-thread pool (pthread_slice.c analog): slices are
            # independent; the native engine releases the GIL in C
            payloads = list(self._pool.map(
                lambda si: self._encode_slice(si, planes, keyframe,
                                              rcs[si], None),
                range(len(self.slices))))
        else:
            payloads = [self._encode_slice(si, planes, keyframe, rcs[si],
                                           hook)
                        for si in range(len(self.slices))]

        out = bytearray()
        for si, payload in enumerate(payloads):
            chunk = bytearray(payload)
            if si > 0 or rp.version > 2:
                # 3-byte big-endian length footer (ffv1enc.c:1339-1345)
                chunk += len(payload).to_bytes(3, "big")
            if rp.ec:
                chunk.append(0)
                crc = crc32_ieee(bytes(chunk))
                chunk += int(crc).to_bytes(4, "little")
            out += chunk

        self.picture_number += 1
        return bytes(out), keyframe

    def get_stats(self) -> str:
        """Serialize PASS1 statistics (the flush-time stats_out of
        ffv1enc.c:1235-1279); feed into a pass-2 EncoderParams.stats_in."""
        if self.stats is None:
            raise RuntimeError("encoder was not created with pass1=True")
        return self.stats.serialize()

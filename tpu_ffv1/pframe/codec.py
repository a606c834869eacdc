"""Experimental motion-compensated FFV1-P codec (framework extension).

Stream layout (NOT interoperable with stock FFV1 — this is the fork's
unfinished direction, shipped here behind experimental=True):

  packet := keyframe_flag_rac | [mv_section] | ffv1_residual_payload

  * Keyframes are plain FFV1 intra packets (byte-identical to the base
    encoder) — they remain the seek/recovery points (SURVEY §5
    checkpoint semantics).
  * P-frame packets start with a range-coded motion-vector section: per
    plane, per 16x16 block, (dy, dx) as signed symbols under a fresh
    32-state context; then the standard FFV1 slice machinery codes the
    residual (cur - mc_pred) folded to bits+1 width (the RGB-plane
    trick, ffv1enc.c:464-467).

Motion search runs on device (pframe/motion.py); residual coding uses
the host engine (native/spec) or can be routed to the TPU path.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.symbols import get_symbol, put_symbol
from ..codec.decoder import FFV1Decoder
from ..codec.encoder import FFV1Encoder
from ..codec.params import EncoderParams
from ..core.rac import RangeDecoder, RangeEncoder, default_state_tables
from .motion import (block_motion_search, motion_compensate, pad_to_block)

BLOCK = 16


class FFV1PEncoder:
    """Inter-frame FFV1 with block motion compensation (experimental)."""

    def __init__(self, params: EncoderParams, radius: int = 7,
                 experimental: bool = False):
        if not experimental:
            raise ValueError(
                "FFV1-P motion coding is experimental; pass "
                "experimental=True (mirrors the reference's strict -2 "
                "gate, ffv1enc.c:703-706)")
        if params.gop_size < 2:
            raise ValueError("FFV1-P needs gop_size >= 2")
        self.params = params
        self.radius = radius
        self.intra_enc = FFV1Encoder(params)
        # residuals span bits+1 (offset-shifted, the RGB-plane trick);
        # code them through a 9-bit planar variant of the same layout
        if self.intra_enc.rp.bits_per_raw_sample > 8 or \
                self.intra_enc.rp.colorspace != 0 or \
                self.intra_enc.rp.fmt.interleaved:
            raise NotImplementedError(
                "FFV1-P currently supports 8-bit planar YUV/gray input")
        base = params.pix_fmt
        sub = {(0, 0): "444", (0, 1): "440", (1, 0): "422",
               (1, 1): "420"}.get((self.intra_enc.rp.chroma_h_shift,
                                   self.intra_enc.rp.chroma_v_shift),
                                  "444")
        a = "a" if self.intra_enc.rp.transparency else ""
        res_fmt = (f"yuv{a}{sub}p9le"
                   if self.intra_enc.rp.chroma_planes or a else "gray16le")
        res_params = EncoderParams(**{**params.__dict__,
                                      "pix_fmt": res_fmt, "gop_size": 1})
        self.res_enc = FFV1Encoder(res_params)
        self.rp = self.intra_enc.rp
        self.extradata = self.intra_enc.extradata
        self.res_extradata = self.res_enc.extradata
        self.picture_number = 0
        self.ref_planes = None

    def _code_mvs(self, mvs_list) -> bytes:
        c = RangeEncoder(*default_state_tables())
        states = np.full(32, 128, dtype=np.uint8)
        for mvs in mvs_list:
            arr = np.asarray(mvs)
            for v in arr.reshape(-1):
                put_symbol(c, states, int(v), True)
        return c.terminate()

    def encode_frame(self, planes):
        planes = [np.asarray(p) for p in planes]
        keyframe = self.picture_number % self.params.gop_size == 0
        self.picture_number += 1

        if keyframe:
            # plain FFV1 intra packet
            self.intra_enc.picture_number = 0  # force keyframe
            pkt, _ = self.intra_enc.encode_frame(planes)
            self.ref_planes = [p.copy() for p in planes]
            return b"K" + pkt, True

        # motion search + residuals per plane
        mvs_list = []
        residuals = []
        bits = self.rp.bits_per_raw_sample
        offset = 1 << bits
        for cur, ref in zip(planes, self.ref_planes):
            cur_p = pad_to_block(cur, BLOCK)
            ref_p = pad_to_block(ref, BLOCK)
            mvs, _sad = block_motion_search(cur_p, ref_p, BLOCK,
                                            self.radius)
            pred = np.asarray(motion_compensate(ref_p, mvs, BLOCK))
            pred = pred[:cur.shape[0], :cur.shape[1]]
            res = cur.astype(np.int32) - pred + offset  # bits+1 range
            residuals.append(res.astype(np.uint16))
            mvs_list.append(np.asarray(mvs))
        mv_bytes = self._code_mvs(mvs_list)

        # residuals ride the standard FFV1 machinery at bits+1 width
        self.res_enc.picture_number = 0
        res_pkt, _ = self.res_enc.encode_frame(
            self._residual_view(residuals))
        self.ref_planes = [p.copy() for p in planes]
        return (b"P" + len(mv_bytes).to_bytes(3, "big") + mv_bytes +
                res_pkt), False

    def _residual_view(self, residuals):
        # residual planes are coded as (bits+1)-deep planar data through a
        # dedicated encoder whose pix_fmt matches dims; we reuse the same
        # subsampling so plane shapes line up
        return residuals


class FFV1PDecoder:
    def __init__(self, width: int, height: int, extradata: bytes,
                 res_extradata: bytes):
        self.base = FFV1Decoder(width, height, extradata)
        self.res = FFV1Decoder(width, height, res_extradata)
        self.width = width
        self.height = height
        self.ref_planes = None

    def decode_frame(self, pkt: bytes):
        tag, body = pkt[:1], pkt[1:]
        if tag == b"K":
            planes, _ = self.base.decode_frame(body)
            self.ref_planes = [np.asarray(p).copy() for p in planes]
            return planes, True
        assert tag == b"P", "bad FFV1-P packet tag"
        mv_len = int.from_bytes(body[:3], "big")
        mv_bytes = body[3:3 + mv_len]
        res_pkt = body[3 + mv_len:]

        res_planes, _ = self.res.decode_frame(res_pkt)

        c = RangeDecoder(mv_bytes, *default_state_tables())
        states = np.full(32, 128, dtype=np.uint8)
        bits = self.base.bits_per_raw_sample
        offset = 1 << bits
        out = []
        for ref, res in zip(self.ref_planes, res_planes):
            ref_p = pad_to_block(np.asarray(ref), BLOCK)
            bh = ref_p.shape[0] // BLOCK
            bw = ref_p.shape[1] // BLOCK
            mvs = np.zeros((bh, bw, 2), np.int32)
            for v in range(bh * bw * 2):
                mvs.reshape(-1)[v] = get_symbol(c, states, True)
            pred = np.asarray(motion_compensate(ref_p, mvs, BLOCK))
            pred = pred[:ref.shape[0], :ref.shape[1]]
            rec = (pred + np.asarray(res).astype(np.int32) - offset)
            rec = np.clip(rec, 0, (1 << bits) - 1)
            out.append(rec.astype(np.asarray(ref).dtype))
        self.ref_planes = [p.copy() for p in out]
        return out, False

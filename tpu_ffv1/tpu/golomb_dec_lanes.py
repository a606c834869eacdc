"""Lane-major device Golomb-Rice DECODE scan (FFV1 coder=0).

The decode mirror of golomb_scan.py: L slice lanes (slices x stream
batch) advance one pixel per step through one two-level lax.scan per
plane, with per-lane MSB-first bit readers over the slice buffers and
per-context adaptive VlcState rows (drift, error_sum, bias, count).

Behavioral parity: ffv1dec.c:139-170 (run mode), :70-98
(get_vlc_symbol), golomb.h:268-300 (get_ur_golomb with limit=12 and
esc_len=bits), ffv1.h:192-224 (update_vlc_state) — mirrored from the
host implementation (codec/slice_codec.py decode_line coder=0 path,
core/golomb.py).

Bit reads assemble a 32-bit big-endian window from a 5-byte
take_along_axis gather at bitpos >> 3; reads past the buffer end return
zero bits (BitReader semantics).  Worst case per read is 28 bits
(escape: 12 + esc_len <= 12 + 16).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dec_scan_lanes import _tree_lookup
from .golomb_scan import LOG2_RUN


@functools.partial(jax.jit,
                   static_argnames=("plane_specs", "bits", "five_input"))
def golomb_decode_planes_lanes(bufs, vlc0, qt, pos0,
                               plane_specs: tuple, bits: int,
                               five_input: bool):
    """Decode all planes of L parallel Golomb-Rice slice streams.

    Args:
      bufs: uint8[L, cap] per-lane slice byte buffers (padded)
      vlc0: int32[L, CC, 4] VlcState rows (drift, error_sum, bias,
        count), carried across frames like the range-coder states
      qt: int32[5, 256] quant table
      pos0: int32[L] BYTE offset where the bit reader starts
        (ac_byte_count — the range-coded slice header's length,
        ffv1dec.c:427-434)
      plane_specs: static tuple of (w, h, plane_base) in coding order
        with plane_base = state_plane_index * cc
    Returns:
      (planes tuple of int32[L, h, w], vlc_out int32[L, CC, 4],
       bitpos int32[L] — final bit position)
    """
    L, CC = vlc0.shape[0], vlc0.shape[1]
    cap = bufs.shape[1]
    lane_base = jnp.arange(L, dtype=jnp.int32) * CC
    S0 = vlc0.reshape(L * CC, 4)
    bufs_i32 = bufs.astype(jnp.int32)
    mask_v = (1 << bits) - 1
    half = 1 << (bits - 1)
    qtabs = [qt[k] for k in range(5)]
    l2run = jnp.asarray(LOG2_RUN)
    iota41 = jnp.arange(41, dtype=jnp.int32)
    iota5 = jnp.arange(5, dtype=jnp.int32)

    def l2run_at(ri):
        oh = (iota41[None, :] == ri[:, None]).astype(jnp.int32)
        return jnp.sum(oh * l2run[None, :], axis=1)

    def peek32(bitpos):
        """32-bit big-endian window at ``bitpos`` (zero past the end)."""
        byte = bitpos >> 3
        idx = byte[:, None] + iota5[None, :]
        b = jnp.take_along_axis(bufs_i32, jnp.minimum(idx, cap - 1),
                                axis=1)
        b = jnp.where(idx < cap, b, 0)                     # (L, 5)
        hi = ((b[:, 0] << 24) | (b[:, 1] << 16) |
              (b[:, 2] << 8) | b[:, 3]).astype(jnp.uint32)
        o = (bitpos & 7).astype(jnp.uint32)
        lo = b[:, 4].astype(jnp.uint32)
        # (hi:lo) is a 40-bit window; take 32 bits at offset o
        w32 = jnp.where(o == 0, hi, (hi << o) | (lo >> (8 - o)))
        return w32

    def get_bits(bitpos, n, act):
        """Read (L,) dynamic n <= 28 bits; n == 0 reads nothing."""
        w32 = peek32(bitpos)
        v = jnp.where(
            n > 0,
            (w32 >> (32 - jnp.maximum(n, 1)).astype(jnp.uint32))
            .astype(jnp.int32) &
            ((jnp.int32(1) << n) - 1), 0)
        bitpos = jnp.where(act, bitpos + n, bitpos)
        return jnp.where(act, v, 0), bitpos

    def vlc_k(count, esum):
        k = jnp.zeros_like(count)
        i = count
        for _ in range(17):
            go = i < esum
            k = k + go.astype(jnp.int32)
            i = jnp.where(go, i + i, i)
        return k

    def fold(v):
        if bits == 8:
            return ((v + 128) & 0xFF) - 128
        return ((v + half) & mask_v) - half

    def vlc_symbol(S, bitpos, c_abs, act):
        """get_vlc_symbol (ffv1dec.c:70-98) for active lanes: returns
        (diff, S, bitpos)."""
        row = S[c_abs]                                     # (L, 4)
        drift, esum, bias, count = (row[:, 0], row[:, 1], row[:, 2],
                                    row[:, 3])
        k = vlc_k(count, esum)
        # get_ur_golomb(limit=12, esc_len=bits): e = leading zeros
        w32 = peek32(bitpos)
        e = jax.lax.clz(jnp.maximum(w32, 1).astype(jnp.uint32)) \
            .astype(jnp.int32)
        e = jnp.where(w32 == 0, 32, e)
        esc = e >= 12
        # normal: consume e+1 bits, then k mantissa bits
        nbits_n = e + 1 + k
        mant = (w32 >> (32 - jnp.minimum(nbits_n, 32)).astype(jnp.uint32)) \
            .astype(jnp.int32) & ((jnp.int32(1) << k) - 1)
        v_n = (e << k) | mant
        # escape: consume 12 bits, then esc_len=bits bits of value
        v_e = (w32 >> jnp.uint32(32 - 12 - bits)).astype(jnp.int32) & \
            ((1 << bits) - 1)
        v_e = v_e + 12 - 1
        v = jnp.where(esc, v_e, v_n)
        nb = jnp.where(esc, 12 + bits, nbits_n)
        bitpos = jnp.where(act, bitpos + nb, bitpos)
        # sr: zigzag decode
        sv = (v >> 1) ^ -(v & 1)
        mask = ((2 * drift + count) >> 31)                 # 0 or -1
        sv = sv ^ mask
        diff = fold(sv + bias)
        # update_vlc_state(sv) — ffv1.h:192-224
        nesum = (esum + jnp.abs(sv)) & 0xFFFF
        ndrift = drift + sv
        at128 = count == 128
        ncount = jnp.where(at128, 64, count)
        ndrift = jnp.where(at128, ndrift >> 1, ndrift)
        nesum = jnp.where(at128, nesum >> 1, nesum)
        ncount = ncount + 1
        negb = ndrift <= -ncount
        nbias = jnp.where(negb & (bias > -128), bias - 1, bias)
        nd = ndrift + ncount
        nd = jnp.where(nd <= -ncount, -ncount + 1, nd)
        posb = ~negb & (ndrift > 0)
        nbias = jnp.where(posb & (bias < 127), bias + 1, nbias)
        nd2 = ndrift - ncount
        nd2 = jnp.where(nd2 > 0, 0, nd2)
        ndrift = jnp.where(negb, nd, jnp.where(posb, nd2, ndrift))
        new_row = jnp.stack([ndrift, nesum, nbias, ncount], axis=1)
        S = S.at[c_abs].set(jnp.where(act[:, None], new_row, row))
        return diff, S, bitpos

    def make_pixel(w, plane_base):
        def pixel(carry, x):
            (cur, prev, cl, plft, S, bitpos, run_index, run_mode,
             run_count) = carry
            xm1 = jnp.maximum(x - 1, 0)
            xm2 = jnp.maximum(x - 2, 0)
            T = prev[:, x]
            RT = prev[:, jnp.minimum(x + 1, w - 1)]
            Lv = jnp.where(x > 0, cur[:, xm1], cl)
            LT = jnp.where(x > 0, prev[:, xm1], plft)

            ctx = (_tree_lookup(qtabs[0], (Lv - LT) & 0xFF) +
                   _tree_lookup(qtabs[1], (LT - T) & 0xFF) +
                   _tree_lookup(qtabs[2], (T - RT) & 0xFF))
            if five_input:
                TT = cur[:, x]
                LL = jnp.where(x > 1, cur[:, xm2],
                               jnp.where(x == 1, cl, 0))
                ctx = ctx + _tree_lookup(qtabs[3], (LL - Lv) & 0xFF) + \
                    _tree_lookup(qtabs[4], (TT - T) & 0xFF)
            sign = ctx < 0
            ctx = jnp.where(sign, -ctx, ctx)
            c_abs = lane_base + plane_base + ctx

            # --- run mode state machine (ffv1dec.c:139-170) ---
            run_mode = jnp.where((ctx == 0) & (run_mode == 0), 1,
                                 run_mode)
            in_run = run_mode > 0
            refill = in_run & (run_count == 0) & (run_mode == 1)
            b1, bitpos = get_bits(bitpos, jnp.where(refill, 1, 0), refill)
            long_run = refill & (b1 == 1)
            lr = l2run_at(run_index)
            rc_long = jnp.int32(1) << lr
            run_index = jnp.where(long_run & (x + rc_long <= w),
                                  run_index + 1, run_index)
            short = refill & (b1 == 0)
            nread = jnp.where(short, lr, 0)
            rc_short, bitpos = get_bits(bitpos, nread, short)
            run_count = jnp.where(long_run, rc_long,
                                  jnp.where(short, rc_short, run_count))
            run_index = jnp.where(short & (run_index > 0),
                                  run_index - 1, run_index)
            run_mode = jnp.where(short, 2, run_mode)

            run_count = jnp.where(in_run, run_count - 1, run_count)
            ended = in_run & (run_count < 0)
            run_mode = jnp.where(ended, 0, run_mode)
            run_count = jnp.where(ended, 0, run_count)
            need_vlc = ended | ~in_run

            diff_v, S, bitpos = vlc_symbol(S, bitpos, c_abs, need_vlc)
            diff_v = jnp.where(ended & (diff_v >= 0), diff_v + 1, diff_v)
            diff = jnp.where(need_vlc, diff_v, 0)
            diff = jnp.where(sign, -diff, diff)

            m = Lv + T - LT
            pred = (Lv + m + T) - jnp.minimum(jnp.minimum(Lv, m), T) \
                - jnp.maximum(jnp.maximum(Lv, m), T)
            val = (pred + diff) & mask_v
            if bits == 16:
                # int16_t ring-row storage wrap (see dec_scan_lanes):
                # 16-bit samples compare SIGNED in the median predictor
                val = ((val + 0x8000) & 0xFFFF) - 0x8000
            cur = cur.at[:, x].set(val)
            return (cur, prev, cl, plft, S, bitpos, run_index, run_mode,
                    run_count), val
        return pixel

    def decode_plane(S, bitpos, w, h, plane_base):
        pixel = make_pixel(w, plane_base)

        def row_step(carry, y):
            rowA, rowB, S, bitpos, run_index = carry
            parity = (y % 2) == 0
            cur = jnp.where(parity, rowA, rowB)
            prev = jnp.where(parity, rowB, rowA)
            cl = prev[:, 0]
            plft = cur[:, 0]
            rm0 = jnp.zeros((L,), jnp.int32)
            (cur, prev, cl, plft, S, bitpos, run_index, _, _), _ = \
                jax.lax.scan(
                    pixel,
                    (cur, prev, cl, plft, S, bitpos, run_index, rm0, rm0),
                    jnp.arange(w))
            rowA = jnp.where(parity, cur, rowA)
            rowB = jnp.where(parity, rowB, cur)
            return (rowA, rowB, S, bitpos, run_index), cur

        ri0 = jnp.zeros((L,), jnp.int32)    # run_index resets per plane
        init = (jnp.zeros((L, w), jnp.int32),
                jnp.zeros((L, w), jnp.int32), S, bitpos, ri0)
        (_, _, S, bitpos, _), rows = jax.lax.scan(
            row_step, init, jnp.arange(h))
        return jnp.moveaxis(rows, 0, 1), S, bitpos

    planes = []
    S = S0
    bitpos = pos0 * 8
    for (w, h, pbase) in plane_specs:
        pl_out, S, bitpos = decode_plane(S, bitpos, w, h,
                                         jnp.int32(pbase))
        planes.append(pl_out)
    return tuple(planes), S.reshape(L, CC, 4), bitpos

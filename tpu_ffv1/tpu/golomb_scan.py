"""Lane-major device Golomb-Rice encode scan (FFV1 coder=0).

The VLC/run-mode coder is the reference's *default* coder
(ffv1enc.c:326-367, golomb.h:506-561, ffv1.h:192-224).  Like the range
coder it is sequential per slice with per-context adaptive state
(VlcState {drift, error_sum, bias, count}) plus a per-line run-mode
state machine, so it maps onto the same lane-major lax.scan: L lanes
(slices x stream batch) advance one pixel per step, VlcState rows are
one gather + one scatter per step, and all decision math is (L,)-vector
arithmetic.

Run-bit emission is EAGER: the reference drains full run chunks lazily
at the break pixel (`while (run_count >= 1 << log2_run[run_index])`,
ffv1enc.c:332-338), but since run_count grows by one per pixel and
log2_run is non-decreasing, a chunk completes exactly when run_count
reaches it — emitting the '1' at that pixel produces the identical bit
sequence (nothing else writes to the slice's bit writer in between).
This bounds emissions to TWO per pixel:
  slot A: run-chunk completion '1' OR the break code
          ('0' + run_count in log2_run bits)
  slot B: the VLC symbol (sr_golomb, <= 12 + esc_len bits) OR the
          line-end run flush '1' (mutually exclusive by run_mode)

Bit packing happens IN the scan: a per-lane bit accumulator flushes
full bytes into 9 packed output slots per pixel (prov-value format,
valid flag in bit 20), which feed the same sort-based device compaction
as the range-coder path (finalize_bytes) — so only the compacted
payloads cross the host link.  Each emission is split into <= 16-bit
halves so the accumulator never exceeds 23 bits (int32-safe).
Line/plane geometry arrives as a static per-pixel flag stream (line
start/end, plane start, stream end) shared by all lanes (uniform slice
grids).  pack_bits is the host-side reference packer used by tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ff_log2_run (bitstream.c:40) — normative constant table
LOG2_RUN = np.array([
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 17, 18, 19, 20, 21, 22, 23, 24], dtype=np.int32)

FLAG_LINE_START = 1
FLAG_LINE_END = 2
FLAG_PLANE_START = 4
FLAG_STREAM_END = 8
FLAG_SPLANE_SHIFT = 4         # bits 4.. : state-plane index of the pixel

VLC_FRESH = (0, 4, 0, 1)      # drift, error_sum, bias, count (ffv1.c:179)


def make_flags(plane_dims) -> np.ndarray:
    """Static per-pixel flag stream for a slice's coding order.

    plane_dims: sequence of (w, h, state_plane) per coded plane in
    order.  state_plane (0 luma, 1 chroma, 2 transparency) rides in the
    high flag bits so the scan can recover the plane-relative context
    (run mode triggers on quantized context 0, ffv1enc.c:331, while the
    stencil's ctx ids carry the state_plane * cc offset).
    """
    parts = []
    for (w, h, sp) in plane_dims:
        f = np.full((h, w), sp << FLAG_SPLANE_SHIFT, np.int32)
        f[:, 0] |= FLAG_LINE_START
        f[:, w - 1] |= FLAG_LINE_END
        f[0, 0] |= FLAG_PLANE_START | FLAG_LINE_START
        parts.append(f.reshape(-1))
    out = np.concatenate(parts)
    out[-1] |= FLAG_STREAM_END
    return out


def _fold(diff, bits):
    if bits == 8:
        return ((diff + 128) & 0xFF) - 128
    half = 1 << (bits - 1)
    return ((diff + half) & ((1 << bits) - 1)) - half


@functools.partial(jax.jit, static_argnames=("bits", "cc"))
def golomb_encode_scan_lanes(ctx, diff, active, flags, vlc0, run_index0,
                             bits: int, cc: int = 1 << 30):
    """Encode L parallel Golomb-Rice streams.

    Args:
      ctx, diff: int32[L, N] (sign-folded context ids / residuals from
        the stencil — identical inputs to the range-coder scan)
      active: bool[L, N] lane validity
      flags: int32[N] line/plane flag stream (shared across lanes)
      vlc0: int32[L, CC, 4] VlcState (drift, error_sum, bias, count),
        carried across frames (GOP) like the range-coder states
      run_index0: int32[L] (reset per plane by FLAG_PLANE_START;
        carried for API symmetry)
    Returns:
      (packed int32[N, 9, L] byte slots — value bits 0..7, valid flag
       bit 20, finalize_bytes-compatible — vlc_out int32[L, CC, 4],
       run_index int32[L])
    """
    L, CC = vlc0.shape[0], vlc0.shape[1]
    lane_base = jnp.arange(L, dtype=jnp.int32) * CC
    S0 = vlc0.reshape(L * CC, 4)
    l2run = jnp.asarray(LOG2_RUN)
    iota41 = jnp.arange(41, dtype=jnp.int32)

    def l2run_at(ri):
        # 41-entry lookup as an arithmetic one-hot (no gather)
        oh = (iota41[None, :] == ri[:, None]).astype(jnp.int32)
        return jnp.sum(oh * l2run[None, :], axis=1)

    def vlc_k(count, esum):
        k = jnp.zeros_like(count)
        i = count
        for _ in range(17):          # error_sum <= 0xFFFF, count >= 1
            go = i < esum
            k = k + go.astype(jnp.int32)
            i = jnp.where(go, i + i, i)
        return k

    def emit_halves(nb, val):
        """Split an emission (<= 28 bits) into <= 16-bit halves."""
        hi = jnp.maximum(nb - 16, 0)
        return ((hi, (val >> 16) & 0xFFFF), (nb - hi, val & 0xFFFF))

    def step(carry, xs):
        st, run_index, run_mode, run_count, bitbuf, bitcnt = carry
        c, v, act, fl = xs
        line_start = (fl & FLAG_LINE_START) != 0
        plane_start = (fl & FLAG_PLANE_START) != 0
        line_end = (fl & FLAG_LINE_END) != 0

        run_index = jnp.where(plane_start, 0, run_index)
        run_mode = jnp.where(line_start, 0, run_mode)
        run_count = jnp.where(line_start, 0, run_count)

        plane_base = (fl >> FLAG_SPLANE_SHIFT) * cc
        run_mode = jnp.where(act & (c == plane_base), 1, run_mode)
        in_run = (run_mode == 1) & act
        zero = v == 0

        lr = l2run_at(run_index)
        chunk = jnp.int32(1) << lr
        rc1 = run_count + 1
        complete = in_run & zero & (rc1 == chunk)
        nbitsA = jnp.where(complete, 1, 0)
        valA = jnp.where(complete, 1, 0)
        run_count = jnp.where(in_run & zero,
                              jnp.where(complete, 0, rc1), run_count)
        run_index = jnp.where(complete, run_index + 1, run_index)

        brk = in_run & ~zero
        lr2 = l2run_at(run_index)
        nbitsA = jnp.where(brk, 1 + lr2, nbitsA)
        valA = jnp.where(brk, run_count, valA)
        run_index = jnp.where(brk & (run_index > 0), run_index - 1,
                              run_index)
        run_count = jnp.where(brk, 0, run_count)
        run_mode = jnp.where(brk, 0, run_mode)
        vd = jnp.where(brk & (v > 0), v - 1, v)

        emit_vlc = act & (run_mode == 0)

        fi = lane_base + c
        row = st[fi]                              # (L, 4) gather
        drift, esum, bias, count = (row[:, 0], row[:, 1], row[:, 2],
                                    row[:, 3])
        vf = _fold(vd - bias, bits)
        k = vlc_k(count, esum)
        code = vf ^ ((2 * drift + count) >> 31)
        code2 = jnp.where(code >= 0, 2 * code, -2 * code - 1)
        e = code2 >> k
        esc = e >= 12                              # limit = 12
        nbitsB = jnp.where(esc, 12 + bits, e + k + 1)
        valB = jnp.where(esc, code2 - 12 + 1,
                         (jnp.int32(1) << k) + (code2 & ((1 << k) - 1)))
        nbitsB = jnp.where(emit_vlc, nbitsB, 0)
        valB = jnp.where(emit_vlc, valB, 0)

        # update_vlc_state(vf) — ffv1.h:192-224
        nesum = (esum + jnp.abs(vf)) & 0xFFFF
        ndrift = drift + vf
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
        st = st.at[fi].set(jnp.where(emit_vlc[:, None], new_row, row))

        flush = line_end & (run_mode == 1) & (run_count > 0) & act
        nbitsB = jnp.where(flush, 1, nbitsB)
        valB = jnp.where(flush, 1, valB)

        # ---- in-scan bit packing: 4 sub-emissions + stream-end pad ----
        slots = []
        for nb, val in (*emit_halves(nbitsA, valA),
                        *emit_halves(nbitsB, valB)):
            total = bitcnt + nb               # <= 7 + 16 = 23 bits
            bitbuf = ((bitbuf << nb) | val) & ((1 << 24) - 1)
            nby = total >> 3                  # 0..2 full bytes
            for j in range(2):
                sh = jnp.clip(total - 8 * (j + 1), 0, 23)
                byte = (bitbuf >> sh) & 0xFF
                valid = j < nby
                slots.append(byte + (valid.astype(jnp.int32) << 20))
            bitcnt = total & 7
            bitbuf = bitbuf & ((jnp.int32(1) << bitcnt) - 1)
        # stream end: pad the remaining bits with zeros into one byte
        send = ((fl & FLAG_STREAM_END) != 0) & act & (bitcnt > 0)
        pad_byte = (bitbuf << (8 - bitcnt)) & 0xFF
        slots.append(pad_byte + (send.astype(jnp.int32) << 20))
        bitcnt = jnp.where(send, 0, bitcnt)
        bitbuf = jnp.where(send, 0, bitbuf)

        return (st, run_index, run_mode, run_count, bitbuf, bitcnt), \
            jnp.stack(slots, 0)               # (9, L)

    # derive from an operand so the carry is 'varying' under shard_map
    # (a literal zeros carry trips the scan-vma type check)
    rm0 = jnp.zeros_like(run_index0)
    (st, run_index, _, _, _, _), packed = jax.lax.scan(
        step, (S0, run_index0, rm0, rm0, rm0, rm0),
        (ctx.T, diff.T, active.T,
         jnp.broadcast_to(flags[:, None], (flags.shape[0], L))))
    return packed, st.reshape(L, CC, 4), run_index


@jax.jit
def finalize_bytes(packed, prefix, prefix_len):
    """Device compaction of packed byte slots (no range-coder tail).

    packed: int32[N, S, L] with bit 20 = valid, bits 0..7 the byte.
    prefix: int32[L, PCAP] per-lane header bytes (values 0..255);
    prefix_len: int32[L].  Returns (bytes uint8[L, T], count int32[L]).
    The key|byte single-operand sort mirrors _resolve_compact
    (rc_scan_lanes.py) minus carry resolution — Golomb bytes are final.
    """
    N, S, L = packed.shape
    pcap = prefix.shape[1]
    valid = ((packed >> 20) & 1).astype(bool)
    bytes_ = packed & 0xFF
    flat_b = jnp.moveaxis(bytes_, 2, 0).reshape(L, N * S)
    flat_v = jnp.moveaxis(valid, 2, 0).reshape(L, N * S)
    pvld = jnp.arange(pcap, dtype=jnp.int32)[None, :] < \
        prefix_len[:, None]
    vals = jnp.concatenate([prefix & 0xFF, flat_b], axis=1)
    vld = jnp.concatenate([pvld, flat_v], axis=1)
    T = vals.shape[1]
    rank = jnp.cumsum(vld.astype(jnp.int32), axis=1) - 1
    key = jnp.where(vld, rank, T) * 256 + vals
    skey = jax.lax.sort(key, dimension=1)
    out = (skey & 0xFF).astype(jnp.uint8)
    count = prefix_len + jnp.sum(flat_v, axis=1)
    return out, count


def pack_bits(nbits: np.ndarray, vals: np.ndarray) -> bytes:
    """MSB-first bit packing of (nbits, value) emissions (host side).

    nbits/vals: int arrays of equal shape, processed in flat order;
    entries with nbits == 0 are skipped.  Matches core.golomb.BitWriter
    (put_bits.h semantics) including zero-padding of the final byte.
    """
    nb = np.asarray(nbits, np.int64).reshape(-1)
    va = np.asarray(vals, np.int64).reshape(-1)
    keep = nb > 0
    nb = nb[keep]
    va = va[keep]
    total = int(nb.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nb)
    starts = ends - nb
    # per-bit source emission index and in-emission bit position
    src = np.repeat(np.arange(len(nb)), nb)
    pos_in = np.arange(total) - np.repeat(starts, nb)
    shift = np.repeat(nb, nb) - 1 - pos_in
    bits = (va[src] >> shift) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.int64)])
    return np.packbits(bits.astype(np.uint8)).tobytes()

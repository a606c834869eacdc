"""Device-side FFV1 decode: fused per-slice scan (range coder).

Decoding is inherently pixel-serial per slice — each reconstructed sample
feeds the next pixel's context (SURVEY §7 "decode cannot precompute
contexts") — so the decoder is one lax.scan per (slice, plane) carrying:
  * the two-row reconstruction window (the reference's 2-row ring with
    the TT-via-stale-current-row trick, ffv1dec.c:127,183-224)
  * the range-decoder state (low, range, byte position)
  * the adaptive context states
Slices decode concurrently (independent bitstreams); planes chain
sequentially within a slice through the carried coder state.

Behavioral parity: ffv1dec.c:42-63 (get_symbol), :100-181 (decode_line),
rangecoder.h:104-145 (get_rac/refill).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("w", "h", "bits", "five_input"))
def rc_decode_plane(buf, states, one_tab, zero_tab, qt, plane_base,
                    low0, range0, pos0, w: int, h: int, bits: int,
                    five_input: bool):
    """Decode one plane of one slice; returns (plane, states, low, rng, pos).

    ``buf``: slice byte buffer (uint8[cap]).  ``plane_base``: context-id
    offset of this coded plane into the flattened state table.  Coder
    state (low0, range0, pos0) enters from the previous plane or from the
    host-parsed slice header.
    """
    S0 = states.reshape(-1)
    cap = buf.shape[0]
    e_max = bits + 1  # |folded residual| <= 1 << bits (RGB path headroom)
    mask_v = (1 << bits) - 1

    def get_rac(S, gi, low, rng, pos, active):
        s = S[gi].astype(jnp.int32)
        r1 = (rng * s) >> 8
        r0 = rng - r1
        bit = low >= r0
        new_low = jnp.where(bit, low - r0, low)
        new_rng = jnp.where(bit, r1, r0)
        ns = jnp.where(bit, one_tab[s], zero_tab[s])
        S = S.at[gi].set(jnp.where(active, ns.astype(jnp.uint8), S[gi]))
        need = new_rng < 0x100
        nxt = jnp.where(pos < cap, buf[jnp.minimum(pos, cap - 1)],
                        0).astype(jnp.int32)
        new_low = jnp.where(need, (new_low << 8) + nxt, new_low)
        new_rng = jnp.where(need, new_rng << 8, new_rng)
        new_pos = pos + need.astype(jnp.int32)
        return (bit & active,
                S,
                jnp.where(active, new_low, low),
                jnp.where(active, new_rng, rng),
                jnp.where(active, new_pos, pos))

    def pixel(carry, x):
        (cur, prev, cur_left, prev_left, S, low, rng, pos) = carry
        xm1 = jnp.maximum(x - 1, 0)
        xm2 = jnp.maximum(x - 2, 0)
        T = prev[x]
        RT = prev[jnp.minimum(x + 1, w - 1)]
        L = jnp.where(x > 0, cur[xm1], cur_left)  # noqa: E741
        LT = jnp.where(x > 0, prev[xm1], prev_left)

        ctx = (qt[0][(L - LT) & 0xFF] + qt[1][(LT - T) & 0xFF] +
               qt[2][(T - RT) & 0xFF])
        if five_input:
            TT = cur[x]  # stale value from two rows ago (2-row ring trick)
            LL = jnp.where(x > 1, cur[xm2], jnp.where(x == 1, cur_left, 0))
            ctx = ctx + qt[3][(LL - L) & 0xFF] + qt[4][(TT - T) & 0xFF]
        sign = ctx < 0
        ctx = jnp.where(sign, -ctx, ctx)
        gidx = (plane_base + ctx) * 32

        # --- get_symbol (signed), masked fixed slots ---
        b0, S, low, rng, pos = get_rac(S, gidx + 0, low, rng, pos,
                                       jnp.bool_(True))
        nz = ~b0
        e = jnp.int32(0)
        done = b0

        def exp_slot(j, st):
            e, done, S, low, rng, pos = st
            idx = 1 + jnp.minimum(e, 9)
            bit, S, low, rng, pos = get_rac(S, gidx + idx, low, rng, pos,
                                            ~done)
            e = e + (bit & ~done).astype(jnp.int32)
            done = done | ~bit
            return e, done, S, low, rng, pos

        e, done, S, low, rng, pos = jax.lax.fori_loop(
            0, e_max + 1, exp_slot, (e, done, S, low, rng, pos))

        a = jnp.int32(1)

        def man_slot(j, st):
            a, S, low, rng, pos = st
            act = nz & (j < e)
            i = jnp.maximum(e - 1 - j, 0)
            bit, S, low, rng, pos = get_rac(
                S, gidx + 22 + jnp.minimum(i, 9), low, rng, pos, act)
            a = jnp.where(act, a + a + bit.astype(jnp.int32), a)
            return a, S, low, rng, pos

        a, S, low, rng, pos = jax.lax.fori_loop(
            0, e_max, man_slot, (a, S, low, rng, pos))
        sbit, S, low, rng, pos = get_rac(
            S, gidx + 11 + jnp.minimum(e, 10), low, rng, pos, nz)
        diff = jnp.where(nz, jnp.where(sbit, -a, a), 0)
        diff = jnp.where(sign, -diff, diff)

        m = L + T - LT
        pred = (L + m + T) - jnp.minimum(jnp.minimum(L, m), T) \
            - jnp.maximum(jnp.maximum(L, m), T)
        val = (pred + diff) & mask_v
        val16 = ((val + 0x8000) & 0xFFFF) - 0x8000  # int16 storage wrap
        cur = cur.at[x].set(val16)
        return (cur, prev, cur_left, prev_left, S, low, rng, pos), val

    def row_step(carry, y):
        rowA, rowB, a_left, b_left, S, low, rng, pos = carry
        parity = (y % 2) == 0
        cur = jnp.where(parity, rowA, rowB)
        prev = jnp.where(parity, rowB, rowA)
        prev_left = jnp.where(parity, b_left, a_left)
        cur_left = prev[0]
        (cur, prev, cur_left, prev_left, S, low, rng, pos), vals = \
            jax.lax.scan(pixel,
                         (cur, prev, cur_left, prev_left, S, low, rng, pos),
                         jnp.arange(w))
        rowA = jnp.where(parity, cur, rowA)
        rowB = jnp.where(parity, rowB, cur)
        a_left = jnp.where(parity, cur_left, a_left)
        b_left = jnp.where(parity, b_left, cur_left)
        return (rowA, rowB, a_left, b_left, S, low, rng, pos), vals

    init = (jnp.zeros((w,), jnp.int32), jnp.zeros((w,), jnp.int32),
            jnp.int32(0), jnp.int32(0), S0, low0, range0, pos0)
    (_ra, _rb, _a, _b, S, low, rng, pos), plane = jax.lax.scan(
        row_step, init, jnp.arange(h))
    return plane, S.reshape(states.shape), low, rng, pos

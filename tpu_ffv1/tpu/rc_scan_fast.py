"""Fast device range-coder scan (8/9/10-bit path).

Optimization over rc_scan.py's naive formulation, keyed on structural
facts of put_symbol (ffv1enc.c:185-231):

1. Every binary decision of one pixel lands in the SAME 32-byte context
   row (state layout ffv1.h: [0] zero flag, [1..10] exponent chain,
   [11..21] sign, [22..31] mantissa).  So adaptive-state traffic per
   pixel is one 32-byte dynamic gather + one scatter.

2. For residuals with exponent e <= 9 (always true for bit depths <= 10)
   the state indices touched within a pixel are pairwise distinct, AND
   the decision for each *position* p is a closed-form function of
   (v, a, e):
       p = 0:      bit = (v == 0)
       1..10:      active iff p-1 <= e;   bit = (p-1) < e   (unary+stop)
       22..31:     active iff p-22 < e;   bit = (a >> (p-22)) & 1
       11..21:     active iff p == 11+e;  bit = v < 0
   and the CODING order is the static position sequence
       [0, 1, 2, .., 10, 31, 30, .., 22, 11, .., 21]
   (exponent ascending, mantissa MSB->LSB i.e. position descending,
   sign last).  The whole per-pixel step is therefore straight-line
   vector arithmetic with static indexing — no gathers/scatters beyond
   the context-row slice.

Lanes (slices x frames in a batch) are vmapped; slices are independent
bitstreams (SURVEY §2.3) so throughput scales with lane count up to the
VPU width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def chain_order(bits: int):
    """Static coding-order position list for bit depth <= 10."""
    e_max = bits - 1
    assert e_max <= 9, "fast path requires bit depth <= 10"
    order = [0]
    order += list(range(1, e_max + 2))                 # exponent + stop
    order += list(range(22 + e_max - 1, 21, -1))       # mantissa desc
    order += list(range(11, 11 + e_max + 1))           # sign candidates
    return order


def slot_count(bits: int) -> int:
    return len(chain_order(bits))


def ext_slots(bits: int):
    """Static decision list for coded widths 11..17 bits (e_max 10..16),
    where put_symbol's state-row caps (1+min(j,9), 22+min(i,9),
    ffv1enc.c:185-231 FFMIN) make rows 10 and 31 carry SEVERAL
    decisions per pixel — the property break that kept the fast kernels
    at bits <= 10 (VERDICT round 2, missing #3).

    Returns a list of slot descriptors in coding order:
      ("zero",)            row 0,   act always,        bit = (v == 0)
      ("exp", j)           row 1+min(j,9), act j <= e, bit = j < e
                           (j >= 9 repeats row 10: apply transitions
                           sequentially through a running state)
      ("man31", r)         row 31,  act e >= 10 + r,   bit = a>>(e-1-r)
                           (repeats row 31, running state)
      ("man", i)           row 22+i (i <= 8), act i < e, bit = a >> i
      ("sign",)            row 11+min(e,10), dynamic select
    """
    e_max = bits - 1
    assert 10 <= e_max <= 16
    slots = [("zero",)]
    slots += [("exp", j) for j in range(e_max + 1)]
    slots += [("man31", r) for r in range(e_max - 9)]
    slots += [("man", i) for i in range(8, -1, -1)]
    slots.append(("sign",))
    return slots


def chain_order_nosign(bits: int):
    """chain_order without the sign-candidate positions (11..11+e_max).

    Exactly one sign position is active per nonzero pixel (p == 11+e),
    so kernels can fold all of them into ONE dynamic chain step (state
    row selected by a (posT == 11+e) masked reduction) instead of
    e_max+1 static steps — ~30% fewer chain slots and transitions for
    8-bit.  The sign step comes last, matching put_symbol coding order
    (ffv1enc.c:185-231)."""
    e_max = bits - 1
    assert e_max <= 9
    return [0] + list(range(1, e_max + 2)) + \
        list(range(22 + e_max - 1, 21, -1))


@functools.partial(jax.jit, static_argnames=("bits",))
def rc_encode_scan_fast(ctx, diff, active, states0, one_tab, zero_tab,
                        low0, range0, bits: int):
    """Drop-in fast replacement for rc_scan.rc_encode_scan (bits <= 10).

    Identical outputs modulo the ys slot layout: (prov int32[N,S],
    valid bool[N,S], low, range, states_out) with S = slot_count(bits);
    flattened (prov, valid) compact to the same byte stream.
    """
    order = chain_order(bits)
    one_i = one_tab.astype(jnp.int32)
    zero_i = zero_tab.astype(jnp.int32)
    pos32 = jnp.arange(32, dtype=jnp.int32)

    def step(carry, xs):
        states, low, rng = carry
        c, v, act_px = xs
        row = jax.lax.dynamic_slice(states, (c, 0), (1, 32))[0] \
            .astype(jnp.int32)
        a = jnp.abs(v)
        e = 31 - jax.lax.clz(jnp.maximum(a, 1).astype(jnp.uint32)) \
            .astype(jnp.int32)
        nz = v != 0

        # per-position activity and bit (closed form)
        is_exp = (pos32 >= 1) & (pos32 <= 10)
        is_sign = (pos32 >= 11) & (pos32 <= 21)
        is_man = pos32 >= 22
        act32 = ((pos32 == 0) |
                 (is_exp & nz & (pos32 - 1 <= e)) |
                 (is_sign & nz & (pos32 == 11 + e)) |
                 (is_man & nz & (pos32 - 22 < e))) & act_px
        bit32 = jnp.where(
            pos32 == 0, (~nz).astype(jnp.int32),
            jnp.where(is_exp, (pos32 - 1 < e).astype(jnp.int32),
                      jnp.where(is_man,
                                (a >> jnp.clip(pos32 - 22, 0, 30)) & 1,
                                (v < 0).astype(jnp.int32))))

        # vectorized state adaptation (indices distinct within the pixel)
        new_row = jnp.where(act32,
                            jnp.where(bit32 == 1, one_i[row], zero_i[row]),
                            row)
        states = jax.lax.dynamic_update_slice(
            states, new_row.astype(jnp.uint8)[None], (c, 0))

        # low/range/renorm chain in static coding order; state values and
        # bits are static extracts of the pre-update row
        out_b = []
        out_v = []
        for p in order:
            aj = act32[p]
            s = row[p]
            b = bit32[p]
            r1 = (rng * s) >> 8
            nr = jnp.where(b == 1, r1, rng - r1)
            nl = low + jnp.where(b == 1, rng - r1, 0)
            emit = aj & (nr < 0x100)
            out_b.append((nl >> 8) |
                         jnp.where((nl & 0xFF) != 0, 1 << 16, 0))
            out_v.append(emit)
            nl = jnp.where(emit, (nl & 0xFF) << 8, nl)
            nr = jnp.where(emit, nr << 8, nr)
            low = jnp.where(aj, nl, low)
            rng = jnp.where(aj, nr, rng)
        return (states, low, rng), (jnp.stack(out_b), jnp.stack(out_v))

    (states, low, rng), (prov, valid) = jax.lax.scan(
        step, (states0, low0, range0), (ctx, diff, active))
    return prov, valid, low, rng, states

"""Device-side adaptive range coding as a per-slice lax.scan.

The sequential part of FFV1 encoding — adaptive context states + range
coder renormalization — runs as one fused scan over the slice's
(context, residual) stream (precomputed in parallel by residual.py).
Slices are independent bitstreams, so many scans run concurrently
(vmap over same-shaped slices; shard_map over mesh axes for multi-chip).

Key reformulation vs the reference (rangecoder.h:52-102): instead of the
outstanding-byte carry scheme (data-dependent 0xFF runs => unbounded work
per step), each renorm emits one *provisional* 9-bit value low>>8 and a
single final carry-propagation pass — an associative suffix scan —
resolves the bytes.  Equivalence is proven in tests/test_core.py
(test_carry_resolve_matches_outstanding).

Per-symbol decision schedule (put_symbol, ffv1enc.c:185-231) is unrolled
into a static masked slot list: zero flag, <=e_max+1 exponent-unary
bits, <=e_max mantissa bits, sign.  All slots execute predicated; XLA
fuses the whole step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def n_slots(bits: int) -> int:
    """Static slot count for residuals folded to ``bits`` width."""
    e_max = bits - 1 if bits <= 16 else bits - 1  # |v| <= 2**(bits-1)
    return 2 * e_max + 3


def _decisions(v, bits: int):
    """Static-shape decision list for one symbol (signed put_symbol).

    Returns (active, state_idx, bit) each of shape (n_slots(bits),).
    """
    e_max = bits - 1
    a = jnp.abs(v)
    # e = floor(log2(a)) for a>0 (a <= 2**e_max)
    e = 31 - jax.lax.clz(jnp.maximum(a, 1).astype(jnp.uint32)).astype(
        jnp.int32)
    nz = v != 0

    act, idx, bit = [], [], []
    # zero flag
    act.append(jnp.ones_like(nz))
    idx.append(jnp.zeros_like(v))
    bit.append(jnp.where(nz, 0, 1))
    # exponent unary chain + terminator (slots j = 0..e_max)
    for j in range(e_max + 1):
        act.append(nz & (j <= e))
        idx.append(jnp.full_like(v, 1 + min(j, 9)))
        bit.append((j < e).astype(jnp.int32))
    # mantissa bitplanes, MSB-1 first (slots j = 0..e_max-1; i = e-1-j)
    for j in range(e_max):
        i = e - 1 - j
        act.append(nz & (j < e))
        idx.append(jnp.full_like(v, 22) + jnp.minimum(jnp.maximum(i, 0), 9))
        bit.append((a >> jnp.maximum(i, 0)) & 1)
    # sign
    act.append(nz)
    idx.append(jnp.full_like(v, 11) + jnp.minimum(e, 10))
    bit.append((v < 0).astype(jnp.int32))

    return (jnp.stack(act), jnp.stack(idx).astype(jnp.int32),
            jnp.stack(bit).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("bits",))
def rc_encode_scan(ctx, diff, active, states0, one_tab, zero_tab,
                   low0, range0, bits: int):
    """Scan the (ctx, diff) stream through the adaptive range coder.

    Args:
      ctx: int32[N] global context ids (plane-base already added)
      diff: int32[N] folded residuals
      active: bool[N] validity mask (padding lanes are no-ops)
      states0: uint8[total_cc, 32] adaptive states (carried across frames
        for GOP/P-frame coding)
      one_tab/zero_tab: uint8[256] state transition tables
      low0/range0: coder state handed over from the host-coded prefix
    Returns:
      (prov int32[N, S], valid bool[N, S], low, range, states_out)
    """
    S = states0.reshape(-1)
    slots = n_slots(bits)

    def step(carry, xs):
        S, low, rng = carry
        c, v, act_px = xs
        sact, sidx, sbit = _decisions(v, bits)
        sact = sact & act_px

        def slot_body(j, inner):
            S, low, rng, out_b, out_v = inner
            a = sact[j]
            gi = c * 32 + sidx[j]
            s = S[gi].astype(jnp.int32)
            r1 = (rng * s) >> 8
            b = sbit[j]
            new_rng = jnp.where(b == 1, r1, rng - r1)
            new_low = low + jnp.where(b == 1, rng - r1, 0)
            ns = jnp.where(b == 1, one_tab[s], zero_tab[s]).astype(jnp.uint8)
            S = S.at[gi].set(jnp.where(a, ns, S[gi]))
            # renorm: at most one byte per decision; provisional value
            # carries the low-byte flag in bit 16 (see core.rac.prov_value)
            emit = a & (new_rng < 0x100)
            pv = (new_low >> 8) | jnp.where((new_low & 0xFF) != 0,
                                            1 << 16, 0)
            out_b = out_b.at[j].set(pv)
            out_v = out_v.at[j].set(emit)
            new_low = jnp.where(emit, (new_low & 0xFF) << 8, new_low)
            new_rng = jnp.where(emit, new_rng << 8, new_rng)
            low = jnp.where(a, new_low, low)
            rng = jnp.where(a, new_rng, rng)
            return S, low, rng, out_b, out_v

        out_b = jnp.zeros((slots,), dtype=jnp.int32)
        out_v = jnp.zeros((slots,), dtype=jnp.bool_)
        S, low, rng, out_b, out_v = jax.lax.fori_loop(
            0, slots, slot_body, (S, low, rng, out_b, out_v))
        return (S, low, rng), (out_b, out_v)

    (S, low, rng), (prov, valid) = jax.lax.scan(
        step, (S, low0, range0), (ctx, diff, active))
    return prov, valid, low, rng, S.reshape(states0.shape)


@jax.jit
def finalize_slice(prov, valid, low, rng, prefix, prefix_len):
    """Sentinel + terminate + compact + carry-resolve, fully on device.

    Mirrors ffv1enc.c:1331-1334 (state-129 sentinel) and
    rangecoder.c:104-116 (terminate), in provisional form.  ``prefix`` is
    the host-coded provisional values (keyframe bit / slice header) that
    precede the scan output — carry out of the slice data can propagate
    into them, so they resolve jointly here.
    Returns (bytes uint8[cap], count) — final coded slice payload bytes.
    """
    def _pv(lw):
        return (lw >> 8) | jnp.where((lw & 0xFF) != 0, 1 << 16, 0)

    # sentinel put_rac(state=129, bit=0); state update discarded
    r1 = (rng * 129) >> 8
    rng = rng - r1
    s_emit = rng < 0x100
    prov_extra0 = _pv(low)
    low = jnp.where(s_emit, (low & 0xFF) << 8, low)
    rng = jnp.where(s_emit, rng << 8, rng)
    # terminate: two renorm emissions; the second is the dropped tail byte
    t1 = _pv(low + 0xFF)
    t2 = (low + 0xFF) & 0xFF  # low2 >> 8 with zero low byte (flag 0)

    flat_b = prov.reshape(-1)
    flat_v = valid.reshape(-1)
    n = flat_b.shape[0]
    pcap = prefix.shape[0]
    cap = n + pcap + 3
    stream = jnp.full((cap,), 0, dtype=jnp.int32)
    pmask = jnp.arange(pcap) < prefix_len
    stream = stream.at[:pcap].set(jnp.where(pmask, prefix, 0))
    # data lanes land after the prefix
    pos = prefix_len + jnp.cumsum(flat_v) - 1
    stream = stream.at[jnp.where(flat_v, pos, cap - 1)].set(
        jnp.where(flat_v, flat_b, 0), mode="drop")
    count = prefix_len + jnp.sum(flat_v)
    # append sentinel byte (maybe) + t1 + t2
    stream = stream.at[count].set(jnp.where(s_emit, prov_extra0, t1))
    stream = stream.at[count + 1].set(jnp.where(s_emit, t1, t2))
    stream = stream.at[count + 2].set(jnp.where(s_emit, t2, 0))
    total = count + 2 + s_emit.astype(jnp.int32)

    # Carry propagation (suffix scan): carry_out_k = g_k | (p_k &
    # carry_out_{k+1}) with generate g = v>=0x100, propagate p =
    # (v&0xFF)==0xFF — binary-adder carry lookahead over the byte stream.
    in_range = jnp.arange(cap) < total
    vals = jnp.where(in_range, stream, 0)
    g = ((vals >> 8) & 1).astype(jnp.int32)
    p = (((vals & 0x1FF) == 0xFF) & ((vals >> 16) == 1)).astype(jnp.int32) \
        * in_range.astype(jnp.int32)

    def compose(a, b):
        ga, pa = a
        gb, pb = b
        return gb | (pb & ga), pa & pb

    go, _po = jax.lax.associative_scan(compose, (g, p), reverse=True)
    carry_in = jnp.concatenate([go[1:], jnp.zeros((1,), jnp.int32)])
    resolved = ((vals & 0x1FF) + carry_in) & 0xFF
    out = jnp.where(in_range, resolved, 0).astype(jnp.uint8)
    return out, total - 1  # last provisional value is never flushed

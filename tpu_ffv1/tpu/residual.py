"""Device-side residual + context precompute (encode).

FFV1's encoder-side median predictor and quantized-gradient context depend
only on *source* samples (lossless coding: decoded == original), so unlike
the decoder there is no wavefront recurrence at encode time: the whole
plane is a pure stencil, computed in one fused XLA pass over the image.
This is where the encoder's parallel work lives; the remaining sequential
work (adaptive entropy coding) is a per-slice scan in rc_scan.py.

Neighbor/border semantics mirror ffv1enc.c:373-411 (ring buffer with
zero-initialized rows, cur[-1] = last[0], last[w] = last[w-1]) and
ffv1.h:161-190 (predict/get_context).  Derivation of the border values in
array form:

    T [y,x] = s[y-1,x]          (0 for y=0)
    RT[y,x] = s[y-1,x+1]        (x=w-1 -> s[y-1,w-1]; 0 for y=0)
    L [y,x] = s[y,x-1]          (x=0   -> s[y-1,0] = T[y,0])
    LT[y,x] = s[y-1,x-1]        (x=0   -> s[y-2,0]; 0 for y<2)
    LL[y,x] = s[y,x-2]          (x=1   -> s[y-1,0]; x=0 -> 0)
    TT[y,x] = s[y-2,x]          (0 for y<2)
"""
from __future__ import annotations

import jax.numpy as jnp


def neighbors(s: jnp.ndarray):
    """All predictor/context neighbors with FFV1 border extension.

    ``s`` is an int32 (H, W) plane (int16-wrapped sample values).
    Returns dict of int32 (H, W) arrays.
    """
    H, W = s.shape
    zrow = jnp.zeros((1, W), dtype=s.dtype)
    T = jnp.concatenate([zrow, s[:-1, :]], axis=0)
    TT = jnp.concatenate([zrow, zrow, s[:-2, :]], axis=0) if H >= 2 else \
        jnp.zeros_like(s)
    RT = jnp.concatenate([T[:, 1:], T[:, -1:]], axis=1)
    L = jnp.concatenate([T[:, :1], s[:, :-1]], axis=1)
    LT = jnp.concatenate([TT[:, :1], T[:, :-1]], axis=1)
    if W >= 2:
        LL = jnp.concatenate([jnp.zeros_like(s[:, :1]), T[:, :1],
                              s[:, :-2]], axis=1)
    else:
        LL = jnp.zeros_like(s)
    return {"L": L, "T": T, "LT": LT, "RT": RT, "LL": LL, "TT": TT}


def _fold(diff, bits):
    if bits == 8:
        return ((diff + 128) & 0xFF) - 128
    half = 1 << (bits - 1)
    return ((diff + half) & ((1 << bits) - 1)) - half


def residuals_and_contexts(s: jnp.ndarray, quant_table: jnp.ndarray,
                           bits: int, five_input: bool):
    """Fused stencil: per-pixel (context_id, folded_residual).

    ``quant_table``: (5, 256) int32.  ``five_input``: static flag for the
    5-gradient model (quant_table[3][127] != 0, ffv1.h:178).
    Returns (ctx >= 0 int32 (H,W), diff int32 (H,W)) after the sign fold
    (ffv1enc.c:312-317).
    """
    n = neighbors(s.astype(jnp.int32))
    L, T, LT, RT = n["L"], n["T"], n["LT"], n["RT"]

    ctx = (quant_table[0][(L - LT) & 0xFF] +
           quant_table[1][(LT - T) & 0xFF] +
           quant_table[2][(T - RT) & 0xFF])
    if five_input:
        ctx = ctx + (quant_table[3][(n["LL"] - L) & 0xFF] +
                     quant_table[4][(n["TT"] - T) & 0xFF])

    # integer median of (L, L+T-LT, T): sum - min - max
    b = L + T - LT
    pred = (L + b + T) - jnp.minimum(jnp.minimum(L, b), T) \
        - jnp.maximum(jnp.maximum(L, b), T)
    diff = s.astype(jnp.int32) - pred

    neg = ctx < 0
    ctx = jnp.where(neg, -ctx, ctx)
    diff = jnp.where(neg, -diff, diff)
    diff = _fold(diff, bits)
    return ctx, diff


def wrap_int16(v):
    """int16_t storage wrap (sample buffers are int16 in the reference)."""
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def load_plane(src: jnp.ndarray, bits: int, packed_at_lsb: bool):
    """Sample load semantics (ffv1enc.c:390-404) as a device op."""
    v = src.astype(jnp.int32)
    if bits > 8 and not packed_at_lsb:
        v = v >> (16 - bits)
    if bits > 8:
        v = wrap_int16(v)
    return v

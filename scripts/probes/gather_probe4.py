"""Probe 4: is the gather-form lookup's Mosaic failure a SUBLANE-TILE
shape issue?  gather_probe3 swept dim-1 only at R=8; the kernels'
lookup_one issues take_along_axis on (1, 128) operands.  Hypothesis:
(1, 128) dim-1 dynamic_gather fails lowering ("Shape mismatch in
input, indices and output") while the same lookup padded/broadcast to
8 sublanes compiles — which would un-break the cheap lookup form on
the non-mesh encode path (HWCHECK round 4: all encode cases 'tree').

Run on the real chip: python scripts/probes/gather_probe4.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

REPS = 512


def k_row(R, x_ref, idx_ref, o_ref):
    """R-sublane dim-1 gather in a serial loop (table reuse pattern)."""
    def body(i, acc):
        idx = (idx_ref[...] + acc[0, 0]) % 128
        g = jnp.take_along_axis(x_ref[...], idx, axis=1)
        return (acc + g[0:1, 0:1].astype(jnp.int32) + 1) % 7

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((1, 1), jnp.int32))
    o_ref[...] = acc


def k_pad8(x_ref, idx_ref, o_ref):
    """(1,128) logical lookup executed as an 8-sublane broadcast gather
    — the padded form the kernels would use."""
    def body(i, acc):
        idx1 = (idx_ref[...] + acc[0, 0]) % 128          # (1, 128)
        idx8 = jnp.broadcast_to(idx1, (8, 128))
        x8 = jnp.broadcast_to(x_ref[...], (8, 128))
        g = jnp.take_along_axis(x8, idx8, axis=1)[0:1]
        return (acc + g[0:1, 0:1].astype(jnp.int32) + 1) % 7

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((1, 1), jnp.int32))
    o_ref[...] = acc


def run(name, kern, R):
    x = jnp.asarray(np.random.randint(0, 100, (R, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32)))
        r = f(x, idx)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(x, idx))
            ts.append(time.time() - t0)
        print(f"{name}: OK {min(ts)/REPS*1e9:8.0f} ns/op", flush=True)
    except Exception as e:
        s = (str(e).splitlines() or ["?"])[0][:160]
        print(f"{name}: FAILED {type(e).__name__}: {s}", flush=True)


print("platform:", jax.devices()[0].platform, flush=True)
for R in (1, 2, 8, 16, 32):
    run(f"dim1 serial ({R:2d},128) int32", functools.partial(k_row, R), R)
run("dim1 pad8 (1->8,128) int32  ", k_pad8, 1)

# the production kernel itself, gather form, non-mesh, L=120
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed
from tpu_ffv1.core.rac import default_state_tables

one, zero = default_state_tables()
L, N, CC = 120, 256, 40
rng = np.random.RandomState(3)
ctx = jnp.asarray(rng.randint(0, CC, (L, N)), jnp.int32)
diff = jnp.asarray(rng.randint(-80, 80, (L, N)), jnp.int32)
act = jnp.ones((L, N), jnp.int32)
st0 = jnp.full((L, CC, 32), 128, jnp.uint8)
low0 = jnp.zeros((L,), jnp.int32)
rg0 = jnp.full((L,), 0xFF00, jnp.int32)
for g in (True, False):
    try:
        r = rc_encode_pallas_packed(ctx, diff, act, st0,
                                    jnp.asarray(one), jnp.asarray(zero),
                                    low0, rg0, 9, 64, gather=g)
        jax.block_until_ready(r)
        print(f"rc_encode_pallas_packed gather={g}: OK", flush=True)
    except Exception as e:
        s = (str(e).splitlines() or ["?"])[0][:200]
        print(f"rc_encode_pallas_packed gather={g}: FAILED "
              f"{type(e).__name__}: {s}", flush=True)

"""Probe 3: tpu.dynamic_gather shape/dim support matrix on real HW.

dim-0 form: y[s,j] = x[idx[s,j], j]   (per-lane sublane gather)
dim-1 form: y[s,j] = x[s, idx[s,j]]   (per-sublane lane gather)

take_along_axis with full-shape indices lowers to these (lowering.py:2493).
Sweep R (sublane count) and dtype; report compile ok + ns/op.
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


def k_g(axis, R, L, x_ref, idx_ref, o_ref):
    def body(i, acc):
        lim = R if axis == 0 else L
        idx = (idx_ref[...] + acc[0, 0]) % lim
        g = jnp.take_along_axis(x_ref[...], idx, axis=axis)
        return (acc + g[0:1, 0:1].astype(jnp.int32) + 1) % 7

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((1, 1), jnp.int32))
    o_ref[...] = acc


def run(axis, R, L, dtype):
    x = jnp.asarray(np.random.randint(0, 100, (R, L)), dtype)
    lim = R if axis == 0 else L
    idx = jnp.asarray(np.random.randint(0, lim, (R, L)), jnp.int32)
    name = f"dim{axis} ({R:4d},{L}) {np.dtype(dtype).name:5s}"
    try:
        f = jax.jit(pl.pallas_call(
            functools.partial(k_g, axis, R, L),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32)))
        r = f(x, idx)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(x, idx))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)/REPS*1e9:8.0f} ns/op", flush=True)
    except Exception as e:
        s = (str(e).splitlines() or ["?"])[0][:160]
        print(f"{name}: FAILED {type(e).__name__}: {s}", flush=True)


for dt in (jnp.int32, jnp.int8):
    for R in (8, 16, 32, 64, 128, 256, 672):
        run(0, R, 128, dt)
for dt in (jnp.int32, jnp.int8):
    run(1, 8, 128, dt)
    run(1, 32, 128, dt)

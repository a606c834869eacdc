"""Microbench: Mosaic tpu.dynamic_gather (take_along_axis in Pallas)
vs the per-lane masked-reduction idiom, on real hardware.

Measures per-op cost of:
  A. take_along_axis axis=0 on (CC, L) int32     [sublane gather]
  B. take_along_axis axis=0 on (CC, L) int8
  C. per-lane loop: L x (aligned ds + sublane-select + roll)  [current]

Each kernel runs REPS ops inside a fori_loop with a data dependence so
nothing is hoisted.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CC, L, REPS = 672, 96, 512


def k_gather(dtype, x_ref, idx_ref, o_ref):
    def body(i, acc):
        idx = (idx_ref[...] + acc) % CC
        g = jnp.take_along_axis(x_ref[...], idx, axis=0)
        return acc + g[0:1, :].astype(jnp.int32)

    acc = jax.lax.fori_loop(0, REPS, body,
                            jnp.zeros((1, L), jnp.int32))
    o_ref[...] = acc


def k_lanes(x_ref, idx_ref, o_ref):
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(i, acc):
        outs = []
        for lane in range(L):
            ci = (idx_ref[0, lane] + acc[0, lane]) % CC
            base = pl.multiple_of((ci >> 3) * 8, 8)
            block = x_ref[pl.ds(base, 8), :]
            sub = ci & 7
            row = jnp.sum(jnp.where(iota8 == sub, block, 0), axis=0,
                          keepdims=True)            # (1, L)
            outs.append(row[:, :1])
        return acc + jnp.concatenate(outs, 1)

    acc = jax.lax.fori_loop(0, REPS, body,
                            jnp.zeros((1, L), jnp.int32))
    o_ref[...] = acc


def run(name, kernel, x, idx, smem_idx=False):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
    )
    fj = jax.jit(f)
    try:
        r = fj(x, idx)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fj(x, idx))
            ts.append(time.time() - t0)
        per = min(ts) / REPS * 1e9
        print(f"{name}: {per:.0f} ns/op  (total {min(ts)*1e3:.1f} ms)",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)


x32 = jnp.asarray(np.random.randint(0, 256, (CC, L), np.int32))
x8 = x32.astype(jnp.int8)
idx = jnp.asarray(np.random.randint(0, CC, (CC, L), np.int32))

run("A gather int32 (672,96) ax0", functools.partial(k_gather, jnp.int32),
    x32, idx)
run("B gather int8  (672,96) ax0", functools.partial(k_gather, jnp.int8),
    x8, idx)

# C: current idiom — idx via SMEM scalars
f = pl.pallas_call(
    k_lanes,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
)
fj = jax.jit(f)
try:
    idx1 = jnp.asarray(np.random.randint(0, CC, (1, L), np.int32))
    r = fj(x32, idx1)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fj(x32, idx1))
        ts.append(time.time() - t0)
    print(f"C per-lane loop: {min(ts)/REPS*1e9:.0f} ns/op "
          f"(total {min(ts)*1e3:.1f} ms)", flush=True)
except Exception as e:
    print(f"C per-lane loop: FAILED {type(e).__name__}: "
          f"{str(e).split(chr(10))[0][:300]}", flush=True)

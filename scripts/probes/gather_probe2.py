"""Probe 2: narrow sublane-gather in Pallas TPU (jax 0.9.0 / Mosaic).

The real op the encode kernel needs per pixel:
    row[lane] = T[idx[lane], lane]     T: (CC, L) in VMEM, idx: (1, L)

Variants:
  A. take_along_axis(T, idx(1,L), axis=0) int32
  B. same, int8 table
  C. take_along_axis(T, idx(8,L), axis=0) int32  (8 rows at once)
  D. jnp.take along axis 0 with scalar... skipped (per-lane differs)
  E. current per-lane loop idiom at L lanes for comparison

Each runs REPS times inside fori_loop with a data dependence.
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

CC, L, REPS = 672, 128, 512


def k_gather_narrow(nrows, dtype, x_ref, idx_ref, o_ref):
    def body(i, acc):
        idx = (idx_ref[...] + acc[0:1, :]) % CC           # (1, L)
        idxN = jnp.broadcast_to(idx, (nrows, L))
        g = jnp.take_along_axis(x_ref[...], idxN, axis=0)  # (nrows, L)
        return acc + g[0:1, :].astype(jnp.int32)

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((1, L), jnp.int32))
    o_ref[...] = acc


def k_lanes(x_ref, idx_ref, o_ref):
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(i, acc):
        outs = []
        for lane in range(L):
            ci = (idx_ref[0, lane] + i) % CC
            base = pl.multiple_of((ci >> 3) * 8, 8)
            block = x_ref[pl.ds(base, 8), :]
            sub = ci & 7
            row = jnp.sum(jnp.where(iota8 == sub, block, 0), axis=0,
                          keepdims=True)
            outs.append(row[:, :1])
        return acc + jnp.concatenate(outs, 1)

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((1, L), jnp.int32))
    o_ref[...] = acc


def timeit(fj, *a):
    r = fj(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fj(*a))
        ts.append(time.time() - t0)
    return min(ts), r


x32 = jnp.asarray(np.random.randint(0, 200, (CC, L), np.int32))
x8 = x32.astype(jnp.int8)
idx1 = jnp.asarray(np.random.randint(0, CC, (1, L), np.int32))

for name, nrows, x in [("A narrow(1,L) int32", 1, x32),
                       ("B narrow(1,L) int8 ", 1, x8),
                       ("C rows8 (8,L) int32", 8, x32)]:
    try:
        f = pl.pallas_call(
            functools.partial(k_gather_narrow, nrows, x.dtype),
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32))
        t, r = timeit(jax.jit(f), x, idx1)
        print(f"{name}: {t/REPS*1e9:7.0f} ns/op (total {t*1e3:.2f} ms) "
              f"sum={int(jnp.sum(r))}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)

try:
    f = pl.pallas_call(
        k_lanes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32))
    t, r = timeit(jax.jit(f), x32, idx1)
    print(f"E per-lane loop L={L}: {t/REPS*1e9:7.0f} ns/op "
          f"(total {t*1e3:.2f} ms)", flush=True)
except Exception as e:
    print(f"E per-lane loop: FAILED {type(e).__name__}: "
          f"{str(e).splitlines()[0][:200]}", flush=True)

"""Microbench: per-lane dynamic-slice state-row read vs MXU one-hot
matmul read, isolated, on real hardware.

A. current idiom: L x (aligned ds load (8,128) int8 + sublane select +
   lane roll) + concat -> (L, 32)
B. one-hot matmul: onehot (L, CC) int8 @ S3 (CC, 32L) int8 -> extract
   lane-diagonal 32-blocks via blockdiag mask + second matmul

Both accumulate into a (1, L) carry so no step is dead code.
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

L, NB, REPS = 96, 21, 256
CC = NB * 32          # 672


def k_lanes(ctx_ref, s_ref, o_ref, states):
    @pl.when(pl.program_id(0) == 0)
    def _():
        states[...] = s_ref[...]

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(step, acc):
        rows = []
        for lane in range(L):
            ci = (ctx_ref[0, lane] + step) % CC
            base = pl.multiple_of((ci >> 5) * 8, 8)
            block = states[lane, pl.ds(base, 8), :]
            rowfull = jnp.sum(jnp.where(iota8 == ((ci >> 2) & 7),
                                        block, 0), axis=0, keepdims=True)
            rolled = pltpu.roll(rowfull, -(ci & 3) * 32, 1)
            rows.append(rolled[:, :32])
        rows8 = jnp.concatenate(rows, 0)              # (L, 32) int8
        return acc + jnp.sum(rows8.astype(jnp.int32), axis=1,
                             keepdims=True).T[0:1, :]

    o_ref[...] = jax.lax.fori_loop(0, REPS, body,
                                   jnp.zeros((1, L), jnp.int32))


def k_mm(ctxv_ref, s3_ref, o_ref):
    iotaCC = jax.lax.broadcasted_iota(jnp.int32, (1, CC), 1)
    lane_of_col = jax.lax.broadcasted_iota(jnp.int32, (1, 32 * L), 1) // 32
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    bd = (lane_row == lane_of_col).astype(jnp.bfloat16)   # (L, 32L)
    # second-stage basis: (32L, 32) tiled identity
    r32 = jax.lax.broadcasted_iota(jnp.int32, (32 * L, 1), 0) % 32
    c32 = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    tid = (r32 == c32).astype(jnp.bfloat16)               # (32L, 32)

    def body(step, acc):
        ctx = (ctxv_ref[0:1, :] + step) % CC              # (1, L)
        onehot = (jnp.transpose(ctx) == iotaCC).astype(jnp.int8)  # (L, CC)
        wide = jax.lax.dot_general(
            onehot, s3_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (L, 32L)
        masked = wide.astype(jnp.bfloat16) * bd
        rows = jax.lax.dot_general(
            masked, tid, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)  # (L,32)
        return acc + jnp.sum(rows, axis=1, keepdims=True).T[0:1, :]

    o_ref[...] = jax.lax.fori_loop(0, REPS, body,
                                   jnp.zeros((1, L), jnp.int32))


def run(name, f, *args):
    fj = jax.jit(f)
    try:
        r = fj(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fj(*args))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)/REPS*1e9:.0f} ns/step "
              f"(total {min(ts)*1e3:.1f} ms)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).split(chr(10))[0][:300]}", flush=True)


ctx = np.random.randint(0, CC, (1, L)).astype(np.int32)
states = np.random.randint(-128, 128, (L, NB * 8, 128)).astype(np.int8)
s3 = np.random.randint(-128, 128, (CC, 32 * L)).astype(np.int8)

run("A per-lane ds read", pl.pallas_call(
    k_lanes,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
    scratch_shapes=[pltpu.VMEM((L, NB * 8, 128), jnp.int8)],
), jnp.asarray(ctx), jnp.asarray(states))

run("B one-hot matmul read", pl.pallas_call(
    k_mm,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
), jnp.asarray(ctx), jnp.asarray(s3))

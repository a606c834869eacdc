"""Bisect the gap between the fused-pipeline probe (124 ms/step) and
the scan-only bench (228 ms/step): same pipelined methodology, but
through the PRODUCTION _frame_fn, then with the big outputs dropped.

  D production _frame_fn (returns out2 47MB + packed 1.18GB + ...)
  E same pipeline, no packed output
  F same pipeline, counts/states/low/rng only (no out2, no packed)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder, PREFIX_CAP


def synth(n=4, seed=0):
    rng = np.random.RandomState(seed)
    base = (np.add.outer(np.arange(1080), np.arange(1920)) % 256)
    out = []
    for t in range(n):
        y = ((base + t * 3) + rng.randint(0, 16, (1080, 1920))) \
            .astype(np.uint8)
        u = (rng.randint(0, 8, (540, 960)) + 100).astype(np.uint8)
        v = (rng.randint(0, 8, (540, 960)) + 160).astype(np.uint8)
        out.append([y, u, v])
    return out


def pipelined(label, fn, reps=10):
    np.asarray(fn())
    ts = []
    prev = fn()
    t0 = time.time()
    for _ in range(reps):
        cur = fn()
        np.asarray(prev)
        ts.append(time.time() - t0)
        t0 = time.time()
        prev = cur
    np.asarray(prev)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{label}: median {med * 1000:.1f} ms  (min {ts[0]*1e3:.1f} "
          f"max {ts[-1]*1e3:.1f})", flush=True)
    return med


def main():
    batch = int(os.environ.get("SP_BATCH", "5"))
    frames = synth()
    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=batch)
    streams_np = [frames[i % 4] for i in range(batch)]
    stacked = tuple(jnp.asarray(
        np.stack([np.asarray(s[k]) for s in streams_np]))
        for k in range(3))
    jax.block_until_ready(stacked)

    states0 = jnp.full_like(enc.states, 128)
    lows = jnp.zeros(enc.L, jnp.int32)
    ranges = jnp.full((enc.L,), 0xFF00, jnp.int32)
    prefixes = jnp.zeros((enc.L, PREFIX_CAP), jnp.int32)
    plens = jnp.full((enc.L,), 4, jnp.int32)

    def fD():
        r = enc._dispatch_staged(stacked, states0, lows, ranges,
                                 prefixes, plens)
        return r[1]                         # counts

    fE_j = jax.jit(lambda s, st, lo, rg, pf, pl: tuple(
        x for i, x in enumerate(enc._frame_pipeline(
            s, st, lo, rg, pf, pl, use_pallas=True)) if i != 4),
        static_argnums=())

    def fE():
        return fE_j(stacked, states0, lows, ranges, prefixes, plens)[1]

    fF_j = jax.jit(lambda s, st, lo, rg, pf, pl: tuple(
        x for i, x in enumerate(enc._frame_pipeline(
            s, st, lo, rg, pf, pl, use_pallas=True))
        if i in (1, 2, 5, 6)))

    def fF():
        return fF_j(stacked, states0, lows, ranges, prefixes, plens)[0]

    pipelined("D production _frame_fn", fD)
    pipelined("E no packed output", fE)
    pipelined("F counts/states/low/rng only", fF)


if __name__ == "__main__":
    main()

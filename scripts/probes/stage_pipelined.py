"""Differential stage costs of the fused encode pipeline, measured the
way the bench measures: pipelined depth-2 dispatch, tiny scalar fetch
per step (axon RPC ~27 ms hides under the next step's compute).

Variants (each a single jit):
  A stencil only            -> sum of ctx/diff
  B stencil + pallas scan   -> low.sum()
  C stencil + scan + finalize -> counts.sum()

C-B = finalize cost, B-A = scan cost, A = stencil (+fixed overhead).
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
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed
from tpu_ffv1.tpu.rc_scan_lanes import finalize_packed


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


def pipelined(label, fn, args, reps=10):
    r = fn(*args)
    np.asarray(r)                      # compile + first
    ts = []
    prev = fn(*args)                   # in flight
    t0 = time.time()
    for _ in range(reps):
        cur = fn(*args)                # dispatch next
        np.asarray(prev)               # sync previous (RPC overlaps)
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

    @jax.jit
    def fA(streams):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        return ctxs.sum() + diffs.sum()

    @jax.jit
    def fB(streams, states0, lows, ranges):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        packed, low, rng, so = rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        return low.sum() + packed.ravel()[0]

    @jax.jit
    def fC(streams, states0, lows, ranges, prefixes, plens):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        packed, low, rng, so = rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        out, counts, ovf = finalize_packed(packed, low, rng,
                                           prefixes, plens)
        return counts.sum()

    a = pipelined("A stencil", fA, (stacked,))
    b = pipelined("B stencil+scan", fB, (stacked, states0, lows, ranges))
    c = pipelined("C full", fC,
                  (stacked, states0, lows, ranges, prefixes, plens))
    print(f"-> stencil {a*1e3:.0f} ms, scan {(b-a)*1e3:.0f} ms, "
          f"finalize {(c-b)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

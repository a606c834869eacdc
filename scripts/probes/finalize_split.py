"""Decompose the production finalize cost on real HW.

G production fn, hostcompact form (no device sort), slab resident
H lax.sort single-operand (L, T) int32 at the production T
I finalize_packed in isolation from a precomputed packed array
J level-1+2 compaction only (no sort, no carry) from packed

Run: python scripts/probes/finalize_split.py
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
from tpu_ffv1.tpu.rc_scan_lanes import (
    finalize_packed, finalize_packed_hostcompact)


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


def pipelined(label, fn, args=(), reps=10):
    r = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[0]), r)
    ts = []
    prev = fn(*args)
    t0 = time.time()
    for _ in range(reps):
        cur = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[0]), prev)
        ts.append(time.time() - t0)
        t0 = time.time()
        prev = cur
    jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[0]), prev)
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

    # precompute the packed kernel output once (input for I/J)
    @jax.jit
    def mk_packed(streams, states0, lows, ranges):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        packed, low, rng, so = rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        return packed, low, rng

    packed, low, rng = mk_packed(stacked, states0, lows, ranges)
    jax.block_until_ready(packed)
    N, S, L = packed.shape
    print(f"packed: {packed.shape} ({packed.nbytes/1e6:.0f} MB)")

    # G: full production pipeline but hostcompact finalize (no sort)
    @jax.jit
    def fG(streams, states0, lows, ranges, prefixes, plens):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        packed, lo, rg, so = rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        slab, counts, ovf = finalize_packed_hostcompact(
            packed, lo, rg, prefixes, plens)
        return slab, counts

    pipelined("G scan+hostcompact (no sort), resident", fG,
              (stacked, states0, lows, ranges, prefixes, plens))

    # H: single-operand sort at production T
    NG = N // 16
    T = PREFIX_CAP + NG * 24 + 3
    key = jnp.asarray(
        np.random.RandomState(1).randint(0, 2**30, (L, T), np.int64),
        jnp.int32)

    @jax.jit
    def fH(key):
        return jax.lax.sort(key, dimension=1)
    pipelined(f"H lax.sort (L,{T}) int32", fH, (key,))

    # I: full finalize from packed
    @jax.jit
    def fI(packed, low, rng, prefixes, plens):
        return finalize_packed(packed, low, rng, prefixes, plens)
    pipelined("I finalize_packed", fI, (packed, low, rng, prefixes, plens))

    # J: compaction levels only (no sort/carry): counts + slots
    @jax.jit
    def fJ(packed):
        valid = (packed >> 20) & 1
        pv = packed & 0x1FFFF
        cnt_inc = jnp.cumsum(valid, axis=1)
        cnt_exc = cnt_inc - valid
        total_pix = cnt_inc[:, -1, :]
        slots = jnp.stack(
            [jnp.sum(pv * valid * (cnt_exc == k), axis=1)
             for k in range(4)], axis=1)
        vld = (jnp.arange(4, dtype=jnp.int32)[None, :, None]
               < total_pix[:, None, :])
        gs = slots.reshape(N // 16, 64, L)
        gv = vld.reshape(N // 16, 64, L).astype(jnp.int32)
        ginc = jnp.cumsum(gv, axis=1)
        gexc = ginc - gv
        gslots = jnp.stack(
            [jnp.sum(gs * gv * (gexc == k), axis=1) for k in range(24)],
            axis=1)
        return gslots, ginc[:, -1, :]
    pipelined("J compaction L1+L2 only", fJ, (packed,))


if __name__ == "__main__":
    main()

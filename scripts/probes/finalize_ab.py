"""A/B the finalize strategies end-to-end on HW (round-5 task 1).

  P1 production: raw kernel + finalize_packed (L1+L2 masked reductions
     + sort) -- the current default
  P2 in-kernel L1: rc_encode_pallas_compact + finalize_compact (L2 +
     sort only)
  P3 split timing of P1's finalize: L1 only from packed
  P4 L2+sort+carry only, from precomputed L1 slots

All variants return (out[:1], counts) so the byte-slab really
materializes (the pipelined helper fetches one element per output).
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
from tpu_ffv1.tpu.rc_pallas import (rc_encode_pallas_packed,
                                    rc_encode_pallas_compact)
from tpu_ffv1.tpu.rc_scan_lanes import (
    finalize_packed, finalize_compact, _resolve_compact)


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


def pipelined(label, fn, args=(), reps=8):
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

    @jax.jit
    def p1(streams, states0, lows, ranges, prefixes, plens):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        packed, lo, rg, so = rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        out, counts, ovf = finalize_packed(packed, lo, rg,
                                           prefixes, plens)
        return out, counts

    @jax.jit
    def p2(streams, states0, lows, ranges, prefixes, plens):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        cm, lo, rg, so = rc_encode_pallas_compact(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        out, counts, ovf = finalize_compact(cm, lo, rg, prefixes, plens)
        return out, counts

    pipelined("P1 raw kernel + finalize_packed (prod)", p1,
              (stacked, states0, lows, ranges, prefixes, plens))
    pipelined("P2 compact kernel + finalize_compact", p2,
              (stacked, states0, lows, ranges, prefixes, plens))

    # P3/P4: split L1 vs L2+sort from a precomputed packed
    @jax.jit
    def mk_packed(streams, states0, lows, ranges):
        ctxs, diffs, acts = enc._streams_uniform(streams)
        return rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)

    packed, lo, rg, so = mk_packed(stacked, states0, lows, ranges)
    jax.block_until_ready(packed)
    N, S, L = packed.shape

    @jax.jit
    def p3(packed):
        valid = (packed >> 20) & 1
        pv = packed & 0x1FFFF
        cnt_inc = jnp.cumsum(valid, axis=1)
        cnt_exc = cnt_inc - valid
        total_pix = cnt_inc[:, -1, :]
        slots = jnp.stack(
            [jnp.sum(pv * valid * (cnt_exc == k), axis=1)
             for k in range(4)], axis=1)
        return slots, total_pix

    slots, total_pix = p3(packed)
    jax.block_until_ready(slots)

    @jax.jit
    def p4(slots, total_pix, lo, rg, prefixes, plens):
        vld = (jnp.arange(4, dtype=jnp.int32)[None, :, None]
               < total_pix[:, None, :])
        gs = slots.reshape(N // 16, 64, L)
        gv = vld.reshape(N // 16, 64, L).astype(jnp.int32)
        ginc = jnp.cumsum(gv, axis=1)
        gexc = ginc - gv
        gcount = ginc[:, -1, :]
        gslots = jnp.stack(
            [jnp.sum(gs * gv * (gexc == k), axis=1) for k in range(24)],
            axis=1)
        gvld = (jnp.arange(24, dtype=jnp.int32)[None, :, None]
                < gcount[:, None, :])
        flat_b = jnp.transpose(gslots, (2, 0, 1)).reshape(L, -1)
        flat_v = jnp.transpose(gvld, (2, 0, 1)).reshape(L, -1)
        out, count = _resolve_compact(flat_b, flat_v, lo, rg,
                                      prefixes, plens)
        return out, count

    pipelined("P3 L1 only (from packed)", p3, (packed,))
    pipelined("P4 L2+sort+carry (from slots)", p4,
              (slots, total_pix, lo, rg, prefixes, plens))


if __name__ == "__main__":
    main()

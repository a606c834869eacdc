"""Per-phase split of the 720p P-frame device pipeline (VERDICT r4 #3).

Same geometry as bench_pframe_720p (1280x720 yuv420p, 12 slices,
batch 5 -> 60 lanes), device-resident inputs, pipelined timing.

  S  search only (full grid, radius 7)
  R  S + OBMC + residual + stencil streams
  V  R + MV stream + concat/pad
  K  V + Pallas range-coder scan
  F  full production _frame_pipeline_p (K + finalize sort + slab)

Differences are the phase costs; compare F to the bench's step median
to get the upload share.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.pframe.tpu import TPUFFV1PEncoder
from tpu_ffv1.tpu.encoder import PREFIX_CAP
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed

W, H = 1280, 720


def synth():
    rng = np.random.RandomState(1)
    base = (np.add.outer(np.arange(H + 64), np.arange(W + 64)) % 256)
    frames = []
    for t in range(8):
        y = (base[2 * t:2 * t + H, 3 * t:3 * t + W] +
             rng.randint(0, 8, (H, W))).astype(np.uint8)
        u = (rng.randint(0, 8, (H // 2, W // 2)) + 100).astype(np.uint8)
        v = (rng.randint(0, 8, (H // 2, W // 2)) + 160).astype(np.uint8)
        frames.append([y, u, v])
    return frames


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
    enc = TPUFFV1PEncoder(EncoderParams(
        width=W, height=H, pix_fmt="yuv420p", level=3, coder=2,
        slices=12, gop_size=12), batch=batch, experimental=True)

    cur_np = [frames[1 + i % 7] for i in range(batch)]
    ref_np = [frames[i % 7] for i in range(batch)]
    cur = tuple(jnp.asarray(np.stack([np.asarray(s[k]) for s in cur_np]))
                for k in range(3))
    refs = tuple(jnp.asarray(np.stack([np.asarray(s[k]) for s in ref_np]))
                 for k in range(3))
    jax.block_until_ready((cur, refs))

    prev_mvs = jnp.zeros((enc.L, enc.bh, enc.bw, 2), jnp.int32)
    states0 = jnp.full_like(enc.states, 128)
    lows = jnp.zeros(enc.L, jnp.int32)
    ranges = jnp.full((enc.L,), 0xFF00, jnp.int32)
    prefixes = jnp.zeros((enc.L, PREFIX_CAP), jnp.int32)
    plens = jnp.full((enc.L,), 4, jnp.int32)

    from tpu_ffv1.pframe.tpu import _pad_edge

    def search_part(streams, rf, pmv):
        cur_l = enc._crops(streams[0].astype(jnp.int32))
        ref_l = enc._crops(rf[0].astype(jnp.int32))
        cur_pad = _pad_edge(cur_l, enc.pad_h, enc.pad_w)
        ref_pad = _pad_edge(ref_l, enc.pad_h, enc.pad_w)
        return enc._search(cur_pad, ref_pad, pmv)

    fS = jax.jit(lambda s, r, p: search_part(s, r, p)[0].sum())

    def upto_res(streams, rf, pmv):
        mvs, intra = search_part(streams, rf, pmv)
        res_ctx, res_diff = enc._residual_streams(streams, rf, mvs,
                                                  intra)
        return mvs, intra, res_ctx, res_diff

    fR = jax.jit(lambda s, r, p: (lambda o: o[2].sum() + o[3].sum())(
        upto_res(s, r, p)))

    def upto_streams(streams, rf, pmv):
        mvs, intra, res_ctx, res_diff = upto_res(streams, rf, pmv)
        mv_ctx, mv_diff, mv_act = enc._mv_stream(mvs, intra, pmv)
        n = enc.mv_cap + res_ctx.shape[1]
        ctxs = jnp.pad(jnp.concatenate([mv_ctx, res_ctx], 1),
                       ((0, 0), (0, enc.p_n_max - n)))
        diffs = jnp.pad(jnp.concatenate([mv_diff, res_diff], 1),
                        ((0, 0), (0, enc.p_n_max - n)))
        acts = jnp.pad(jnp.concatenate(
            [mv_act.astype(bool), jnp.ones(res_ctx.shape, bool)], 1),
            ((0, 0), (0, enc.p_n_max - n)))
        return ctxs, diffs, acts

    fV = jax.jit(lambda s, r, p: (lambda o: o[0].sum() + o[1].sum())(
        upto_streams(s, r, p)))

    def upto_scan(streams, rf, pmv, st, lo, rg):
        ctxs, diffs, acts = upto_streams(streams, rf, pmv)
        packed, low, rng, so = rc_encode_pallas_packed(
            ctxs, diffs, acts, st, enc.one_tab, enc.zero_tab, lo, rg,
            enc.p_bits, enc.pallas_chunk, gather=enc.pallas_gather)
        return low.sum() + packed.ravel()[0]

    fK = jax.jit(upto_scan)

    fF = jax.jit(lambda s, r, p, st, lo, rg, pf, pl:
                 enc._frame_pipeline_p(s, r, p, st, lo, rg, pf, pl)[1])

    print(f"L={enc.L} p_n_max={enc.p_n_max} mv_cap={enc.mv_cap} "
          f"p_bits={enc.p_bits}", flush=True)
    s = pipelined("S search", fS, (cur, refs, prev_mvs))
    r = pipelined("R +obmc/residual/stencil", fR, (cur, refs, prev_mvs))
    v = pipelined("V +mv stream/concat", fV, (cur, refs, prev_mvs))
    k = pipelined("K +pallas scan", fK,
                  (cur, refs, prev_mvs, states0, lows, ranges))
    f = pipelined("F full pipeline", fF,
                  (cur, refs, prev_mvs, states0, lows, ranges,
                   prefixes, plens))
    print(f"-> search {s*1e3:.0f} | obmc/res {max(r-s,0)*1e3:.0f} | "
          f"mv/concat {max(v-r,0)*1e3:.0f} | scan {max(k-v,0)*1e3:.0f} | "
          f"finalize {max(f-k,0)*1e3:.0f} | total {f*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()

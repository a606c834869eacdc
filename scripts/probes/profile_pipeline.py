"""Measure the encode pipeline's stage breakdown on the real chip.

Stages (bench config: 1080p yuv420p, 24 slices, batch 4 -> L=96):
  A. Pallas scan kernel alone (prov (N,S,L) stays on device)
  B. pre-compaction sort S->4
  C. finalize_lanes (big sort + carry resolve)
  D. device->host transfer of the trimmed output

Run:  python scripts/profile_pipeline.py [batch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder, PREFIX_CAP
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas
from tpu_ffv1.tpu.rc_scan_lanes import finalize_lanes

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
W, H = 1920, 1080
params = EncoderParams(width=W, height=H, pix_fmt="yuv420p", level=3,
                       coder=2, slices=24, slicecrc=1, gop_size=1)
enc = TPUFFV1Encoder(params, batch=batch)
rng = np.random.default_rng(3)
planes = [rng.integers(0, 256, (H, W), np.uint8),
          rng.integers(0, 256, (H // 2, W // 2), np.uint8),
          rng.integers(0, 256, (H // 2, W // 2), np.uint8)]
streams = tuple(tuple(jnp.asarray(p) for p in planes)
                for _ in range(batch))

# host-side stream build (ctx/diff/act) once
ctxs = np.zeros((enc.L, enc.n_max), np.int32)
diffs = np.zeros((enc.L, enc.n_max), np.int32)
acts = np.zeros((enc.L, enc.n_max), bool)
print("building streams (host stencil)...", flush=True)
t0 = time.time()
import jax.numpy as _j
for bi in range(batch):
    for si, geom in enumerate(enc.geoms):
        lane = bi * enc.n_slices + si
        c, d = enc._slice_stream(streams[bi], geom)
        n = enc.stream_lens[si]
        ctxs[lane, :n] = np.asarray(c)
        diffs[lane, :n] = np.asarray(d)
        acts[lane, :n] = True
print(f"  stream build: {time.time()-t0:.2f}s (host+device mixed)")

ctxs_d = jnp.asarray(ctxs)
diffs_d = jnp.asarray(diffs)
acts_d = jnp.asarray(acts)
states0 = jnp.full_like(enc.states, 128)
lows = jnp.zeros(enc.L, jnp.int32)
ranges = jnp.full(enc.L, 0xFF00, jnp.int32)
prefixes = jnp.zeros((enc.L, PREFIX_CAP), jnp.int32)
plens = jnp.zeros(enc.L, jnp.int32)

S2 = 4


@jax.jit
def stage_a(ctxs, diffs, acts, states0, lows, ranges):
    prov, valid, low, rng_, st = rc_encode_pallas(
        ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
        lows, ranges, enc.bits, enc.pallas_chunk)
    # tiny reduction so we don't transfer (N,S,L)
    return jnp.sum(valid), low, rng_, prov, valid


@jax.jit
def stage_b(prov, valid):
    key = jnp.where(valid,
                    jnp.arange(prov.shape[2], dtype=jnp.int32)[None, None, :],
                    jnp.int32(1 << 20))
    _, prov_s, valid_s = jax.lax.sort(
        (key, prov, valid.astype(jnp.int32)), dimension=2, num_keys=1)
    return prov_s[:, :, :S2], valid_s[:, :, :S2].astype(bool)


@jax.jit
def stage_c(prov4, valid4, low, rng_, prefixes, plens):
    out, counts = finalize_lanes(prov4, valid4, low, rng_, prefixes, plens)
    return out[:, :enc.out_cap], counts


def tm(name, fn, *a, n=3):
    r = fn(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*a)
        jax.block_until_ready(r)
        ts.append(time.time() - t0)
    print(f"  {name}: {min(ts)*1000:.0f} ms  (runs: "
          f"{[f'{t*1000:.0f}' for t in ts]})", flush=True)
    return r


print("compiling+timing stage A (pallas scan)...", flush=True)
nval, low, rng_, prov, valid = tm("A scan", stage_a, ctxs_d, diffs_d,
                                  acts_d, states0, lows, ranges)
print("  emitted bytes total:", int(nval))
print("compiling+timing stage B (pre-compaction sort)...", flush=True)
prov4, valid4 = tm("B presort", stage_b, prov, valid)
print("compiling+timing stage C (finalize)...", flush=True)
out, counts = tm("C finalize", stage_c, prov4, valid4, low, rng_,
                 prefixes, plens)
counts_np = np.asarray(counts)
cap2 = min(enc.out_cap, (int(counts_np.max()) + 511) // 512 * 512)
t0 = time.time()
out_np = np.asarray(out[:, :cap2])
print(f"  D transfer ({out_np.nbytes/1e6:.1f} MB): "
      f"{(time.time()-t0)*1000:.0f} ms")
print("counts max:", counts_np.max(), " out_cap:", enc.out_cap,
      " n_max:", enc.n_max, " S:", prov.shape[2])

"""Time each device stage of the production encode pipeline separately
on real hardware: upload bandwidth, stencil, Pallas scan, finalize.
"""
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
        y = ((base + t * 3) + rng.randint(0, 16, (1080, 1920))).astype(np.uint8)
        u = (rng.randint(0, 8, (540, 960)) + 100).astype(np.uint8)
        v = (rng.randint(0, 8, (540, 960)) + 160).astype(np.uint8)
        out.append([y, u, v])
    return out


def _sync(r):
    # block_until_ready is a no-op on the axon remote backend; force
    # completion by fetching one element of every output
    import jax
    jax.tree_util.tree_map(
        lambda a: np.asarray(a.ravel()[0]) if hasattr(a, "ravel") else a,
        r)
    return r


def timed(label, fn, reps=3):
    _sync(fn())  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        r = _sync(fn())
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.0f} ms", flush=True)
    return r, dt


def main():
    batch = int(__import__("os").environ.get("SP_BATCH", "4"))
    frames = synth()
    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=batch)
    streams_np = [frames[i % 4] for i in range(batch)]
    nplanes = 3
    stacked = [np.stack([np.asarray(s[k]) for s in streams_np])
               for k in range(nplanes)]

    # raw upload bandwidth: single big buffer vs 3 plane buffers
    big = np.concatenate([a.reshape(-1) for a in stacked])
    print(f"upload payload: {big.nbytes/1e6:.1f} MB", flush=True)

    def up3():
        devs = tuple(jnp.asarray(a) for a in stacked)
        jax.block_until_ready(devs)
        return devs

    def up1():
        d = jnp.asarray(big)
        jax.block_until_ready(d)
        return d

    devs, dt3 = timed("upload 3 plane buffers", up3)
    _, dt1 = timed("upload 1 contiguous buffer", up1)
    print(f"  -> {big.nbytes/1e6/dt1:.0f} MB/s single", flush=True)

    # stencil alone
    stencil = jax.jit(lambda s: enc._streams_uniform(s))

    def run_stencil():
        r = stencil(devs)
        jax.block_until_ready(r)
        return r

    (ctxs, diffs, acts), _ = timed("stencil (streams_uniform)", run_stencil)

    states0 = jnp.full_like(enc.states, 128)
    lows = jnp.zeros(enc.L, jnp.int32)
    ranges = jnp.full((enc.L,), 0xFF00, jnp.int32)

    def run_kernel():
        r = rc_encode_pallas_packed(
            ctxs, diffs, acts, states0, enc.one_tab, enc.zero_tab,
            lows, ranges, enc.bits, enc.pallas_chunk)
        jax.block_until_ready(r)
        return r

    (packed, low, rng, so), _ = timed("pallas scan", run_kernel)

    prefixes = jnp.zeros((enc.L, PREFIX_CAP), jnp.int32)
    plens = jnp.full((enc.L,), 4, jnp.int32)

    def run_fin():
        r = finalize_packed(packed, low, rng, prefixes, plens)
        jax.block_until_ready(r)
        return r

    (out, counts, ovf), _ = timed("finalize_packed", run_fin)
    cnp = np.asarray(counts)
    print(f"counts max {cnp.max()}", flush=True)

    def dl():
        o = np.asarray(out[:, : (int(cnp.max()) + 511) // 512 * 512])
        return o

    _, dtd = timed("download payloads", dl)


if __name__ == "__main__":
    main()

"""Probe 2: shape of the device->host transfer cost on axon.

Q1: flat 1D fetch vs 2D fetch vs 2D-lazy-slice fetch (same bytes).
Q2: does chunked-parallel fetching raise aggregate bandwidth?
Q3: does an in-flight transfer block the NEXT device program?
All buffers are freshly produced per rep (a device add of a step-
dependent scalar) so the host-side cache never hits.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


MB = 1024 * 1024


def main():
    log(f"devices: {jax.devices()}")
    SZ = 8 * MB
    base1 = jax.device_put(np.zeros(SZ, np.uint8))
    base2 = jax.device_put(np.zeros((96, SZ // 96), np.uint8))

    @jax.jit
    def fresh1(i):
        return base1 + i.astype(jnp.uint8)

    @jax.jit
    def fresh2(i):
        return base2 + i.astype(jnp.uint8)

    @jax.jit
    def heavy(x):
        def body(c, _):
            return jnp.tanh(c @ c), None
        y, _ = jax.lax.scan(body, x, None, length=120)
        return y

    x = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    heavy(x).block_until_ready()
    fresh1(jnp.int32(0)).block_until_ready()
    fresh2(jnp.int32(0)).block_until_ready()

    # Q1a flat 1D
    for i in range(1, 4):
        b = fresh1(jnp.int32(i)); b.block_until_ready()
        t0 = time.time(); np.asarray(b); dt = time.time() - t0
        log(f"flat1d rep{i}: {dt*1000:.0f} ms -> {SZ/MB/dt:.1f} MB/s")

    # Q1b full 2D
    for i in range(1, 4):
        b = fresh2(jnp.int32(10 + i)); b.block_until_ready()
        t0 = time.time(); np.asarray(b); dt = time.time() - t0
        log(f"full2d rep{i}: {dt*1000:.0f} ms -> {SZ/MB/dt:.1f} MB/s")

    # Q1c lazy 2D slice (the encoder slab pattern)
    K = (SZ // 96) * 3 // 4
    for i in range(1, 4):
        b = fresh2(jnp.int32(20 + i)); b.block_until_ready()
        t0 = time.time(); np.asarray(b[:, :K]); dt = time.time() - t0
        log(f"slice2d rep{i}: {dt*1000:.0f} ms -> {96*K/MB/dt:.1f} MB/s")

    # Q1d lazy flatten+slice fused on device then fetch
    @jax.jit
    def fresh_flatcut(i):
        return (base2 + i.astype(jnp.uint8))[:, :K].reshape(-1)
    fresh_flatcut(jnp.int32(0)).block_until_ready()
    for i in range(1, 4):
        b = fresh_flatcut(jnp.int32(30 + i)); b.block_until_ready()
        t0 = time.time(); np.asarray(b); dt = time.time() - t0
        log(f"flatcut rep{i}: {dt*1000:.0f} ms -> {96*K/MB/dt:.1f} MB/s")

    # Q2: chunked parallel fetch of one flat buffer (4 ranges)
    pool = ThreadPoolExecutor(8)
    for nch in (2, 4, 8):
        for i in range(1, 3):
            b = fresh1(jnp.int32(100 * nch + i)); b.block_until_ready()
            bounds = np.linspace(0, SZ, nch + 1).astype(int)
            t0 = time.time()
            futs = [pool.submit(lambda lo=lo, hi=hi: np.asarray(b[lo:hi]))
                    for lo, hi in zip(bounds[:-1], bounds[1:])]
            for f in futs:
                f.result()
            dt = time.time() - t0
            log(f"par{nch} rep{i}: {dt*1000:.0f} ms -> {SZ/MB/dt:.1f} MB/s")

    # Q3: transfer in flight; does the next program run behind it?
    for i in range(1, 4):
        b = fresh1(jnp.int32(200 + i)); b.block_until_ready()
        t0 = time.time()
        fut = pool.submit(lambda: (np.asarray(b), time.time()))
        time.sleep(0.02)         # let the RPC leave first
        y = heavy(x)
        y.block_until_ready()
        t_prog = time.time() - t0
        _, t_fetch = fut.result()
        log(f"xferblock rep{i}: fetch {((t_fetch-t0))*1000:.0f} ms, "
            f"program-behind-it done {t_prog*1000:.0f} ms "
            f"(alone ~80 ms)")


if __name__ == "__main__":
    main()

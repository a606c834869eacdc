"""Probe: can a device->host fetch of a READY buffer proceed while an
unrelated device program is in flight on the axon backend?

Three measurements:
  1. fetch alone            -- baseline download time for SZ bytes
  2. long program alone     -- device busy time
  3. dispatch program, then immediately fetch the ready buffer
     (fetch issued from a worker thread, like the encoder's xfer pool)

If (3)'s fetch completes in ~(1)'s time while the program is still
running, downloads overlap compute and the encode pipeline can hide
them behind the next frame's dispatch.  If the fetch takes
~(program + fetch), RPCs serialize and the only lever is fewer bytes.
Also checks whether fetching a LAZY slice (out[:, :k]) behaves
differently from a pre-materialized buffer (the fetch-behind-queue
trap: the slice op must execute on device first).
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


def main():
    log(f"devices: {jax.devices()}")
    SZ = 8 * 1024 * 1024
    buf = jax.device_put(np.random.randint(0, 255, SZ, np.uint8))
    buf.block_until_ready()

    @jax.jit
    def heavy(x):
        def body(c, _):
            return jnp.tanh(c @ c), None
        y, _ = jax.lax.scan(body, x, None, length=60)
        return y

    x = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    heavy(x).block_until_ready()  # compile

    # 1. fetch alone
    for i in range(3):
        t0 = time.time()
        np.asarray(buf)
        log(f"fetch alone rep{i}: {(time.time()-t0)*1000:.0f} ms "
            f"({SZ/1e6:.1f} MB)")

    # 2. program alone
    for i in range(2):
        t0 = time.time()
        heavy(x).block_until_ready()
        log(f"program alone rep{i}: {(time.time()-t0)*1000:.0f} ms")

    pool = ThreadPoolExecutor(2)

    # 3. dispatch program, then fetch ready buffer from a thread
    for i in range(3):
        t0 = time.time()
        y = heavy(x)
        t_disp = time.time()
        fut = pool.submit(lambda: (np.asarray(buf), time.time()))
        _, t_fetch_done = fut.result()
        y.block_until_ready()
        t_all = time.time()
        log(f"overlap rep{i}: dispatch {(t_disp-t0)*1000:.0f} ms, "
            f"fetch done at +{(t_fetch_done-t0)*1000:.0f} ms, "
            f"program done at +{(t_all-t0)*1000:.0f} ms")

    # 4. same but fetching a lazy slice of a ready 2D buffer
    buf2 = jax.device_put(
        np.random.randint(0, 255, (96, 256 * 1024), np.uint8))
    buf2.block_until_ready()
    np.asarray(buf2[:, :1024])   # compile the slice
    for i in range(3):
        t0 = time.time()
        y = heavy(x)
        fut = pool.submit(lambda: (np.asarray(buf2[:, :87 * 1024 + i]),
                                   time.time()))
        _, t_fetch_done = fut.result()
        y.block_until_ready()
        t_all = time.time()
        log(f"lazy-slice rep{i}: fetch done at "
            f"+{(t_fetch_done-t0)*1000:.0f} ms, program done at "
            f"+{(t_all-t0)*1000:.0f} ms")

    # 5. two parallel fetches of ready buffers (does bandwidth scale?)
    buf3 = jax.device_put(np.random.randint(0, 255, SZ, np.uint8))
    buf3.block_until_ready()
    for i in range(3):
        t0 = time.time()
        f1 = pool.submit(lambda: np.asarray(buf))
        f2 = pool.submit(lambda: np.asarray(buf3))
        f1.result(); f2.result()
        log(f"parallel 2x fetch rep{i}: {(time.time()-t0)*1000:.0f} ms "
            f"({2*SZ/1e6:.1f} MB total)")


if __name__ == "__main__":
    main()

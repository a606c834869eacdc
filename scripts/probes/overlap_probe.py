"""Can transfers overlap device compute on the axon backend?

Times: (a) a ~300ms dummy kernel alone, (b) a 12 MB upload alone,
(c) kernel dispatched async then upload issued immediately (from the
main thread and from a second thread).  If (c) ~= max(a, b), overlap
works and the encode pipeline should hide transfers; if (c) ~= a + b,
the tunnel serializes RPCs and the steady-state floor is the sum.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def heavy(x):
    def body(i, v):
        return jnp.tanh(v @ v) + 1e-6
    return jax.lax.fori_loop(0, 60, body, x)


def main():
    hj = jax.jit(heavy)
    x = jnp.asarray(np.random.rand(2048, 2048).astype(np.float32))
    big = np.random.randint(0, 255, 12 << 20).astype(np.uint8)

    r = hj(x); np.asarray(r)          # compile
    t0 = time.time(); r = hj(x); _ = np.asarray(r)
    ta = time.time() - t0
    print(f"kernel alone: {ta*1000:.0f} ms", flush=True)

    d = jnp.asarray(big); _ = np.asarray(d[:8])   # warm path
    t0 = time.time(); d = jnp.asarray(big); _ = np.asarray(d[:8])
    tb = time.time() - t0
    print(f"upload alone (12 MB, forced): {tb*1000:.0f} ms", flush=True)

    # (c1) same thread: dispatch kernel, then upload, then force both
    t0 = time.time()
    r = hj(x)
    d = jnp.asarray(big)
    _ = np.asarray(d[:8]); _ = np.asarray(r[:2, :2])
    tc = time.time() - t0
    print(f"kernel + upload, same thread: {tc*1000:.0f} ms "
          f"(sum={1000*(ta+tb):.0f}, max={1000*max(ta,tb):.0f})",
          flush=True)

    # (c2) upload from a second thread while kernel runs
    pool = ThreadPoolExecutor(max_workers=1)
    t0 = time.time()
    r = hj(x)
    fut = pool.submit(lambda: np.asarray(jnp.asarray(big)[:8]))
    fut.result(); _ = np.asarray(r[:2, :2])
    td = time.time() - t0
    print(f"kernel + upload, two threads: {td*1000:.0f} ms", flush=True)

    # (c3) download overlap: big device->host while kernel runs
    dev = jnp.asarray(big)
    _ = np.asarray(dev)
    t0 = time.time(); _ = np.asarray(dev)
    te = time.time() - t0
    print(f"download alone (12 MB): {te*1000:.0f} ms", flush=True)
    t0 = time.time()
    r = hj(x)
    _ = np.asarray(dev)
    _ = np.asarray(r[:2, :2])
    tf = time.time() - t0
    print(f"kernel + download: {tf*1000:.0f} ms "
          f"(sum={1000*(ta+te):.0f})", flush=True)


if __name__ == "__main__":
    main()

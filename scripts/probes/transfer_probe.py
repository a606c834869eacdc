"""Probe axon tunnel host->device transfer scaling: size sweep and
concurrent multi-threaded transfers."""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

rng = np.random.RandomState(0)


def xfer(a):
    d = jnp.asarray(a)
    d.block_until_ready()
    return d


def bench(label, fn, reps=3):
    fn()
    t0 = time.time()
    for _ in range(reps):
        fn()
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.0f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for mb in (1, 2, 4, 8):
        a = rng.randint(0, 255, mb << 20).astype(np.uint8)
        dt = bench(f"single {mb} MB", lambda a=a: xfer(a))
        print(f"  -> {mb / dt:.1f} MB/s", flush=True)

    total = 12
    for nth in (1, 2, 4, 8):
        nchunks = 12
        chunks = [rng.randint(0, 255, (total << 20) // nchunks)
                  .astype(np.uint8) for _ in range(nchunks)]
        pool = ThreadPoolExecutor(max_workers=nth)

        def run():
            futs = [pool.submit(xfer, c) for c in chunks]
            return [f.result() for f in futs]

        dt = bench(f"{total} MB in {nchunks} chunks, {nth} threads", run)
        print(f"  -> {total / dt:.1f} MB/s", flush=True)

    # device_put variant
    a = rng.randint(0, 255, 4 << 20).astype(np.uint8)
    bench("device_put 4 MB", lambda: jax.device_put(a).block_until_ready())
    # int32 vs uint8 width (does the tunnel send the full words?)
    a32 = rng.randint(0, 255, 1 << 20).astype(np.int32)  # 4 MB payload
    bench("int32 1M elems (4 MB)", lambda: xfer(a32))


if __name__ == "__main__":
    main()

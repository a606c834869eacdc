"""Probe: encode steady-state vs stream batch (4/5/6) + clean upload
bandwidth.  Lanes = batch x 24 slices; the VPU lane axis is 128 wide,
so batch 5 (120 lanes) should cost ~the same compute as batch 4 (96)
while moving 25% more pixels per step."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def upload_bw():
    import jax
    import jax.numpy as jnp
    x = np.random.randint(0, 255, 16 * 1024 * 1024, np.uint8)
    for i in range(3):
        x[0] = i
        t0 = time.time()
        jnp.asarray(x).block_until_ready()
        dt = time.time() - t0
        log(f"upload 16MB rep{i}: {dt*1000:.0f} ms -> {16/dt:.0f} MB/s")


def bench_batch(batch, budget_s=240.0):
    import bench as B
    frames = B.synth_1080p()
    import os
    os.environ["FFV1_BENCH_BATCH"] = str(batch)
    t0 = time.time()
    try:
        mpix, stats = B.bench_tpu(frames, budget_s=budget_s)
        log(f"batch={batch}: {mpix:.2f} Mpix/s {stats}")
    except Exception as e:
        log(f"batch={batch} failed: {e}")


def main():
    import jax
    log(f"devices: {jax.devices()}")
    upload_bw()
    for b in (int(a) for a in sys.argv[1:] or ["4", "5", "6"]):
        bench_batch(b)


if __name__ == "__main__":
    main()

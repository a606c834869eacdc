"""Device-resident compute scaling probe: _frame_fn step time vs batch.

Usage: python scripts/compute_probe.py [batches...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
from bench import synth_1080p

batches = [int(a) for a in sys.argv[1:]] or [4, 5]
frames = synth_1080p()
for batch in batches:
    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=batch)
    streams_np = tuple(
        tuple(np.asarray(p) for p in frames[i % len(frames)])
        for i in range(batch))
    dev = tuple(jnp.asarray(np.stack([s[k] for s in streams_np]))
                for k in range(3))
    lows, ranges, prefixes, plens = enc._prefix_arrays(True)
    args = (dev, jnp.full_like(enc.states, 128), jnp.asarray(lows),
            jnp.asarray(ranges), jnp.asarray(prefixes),
            jnp.asarray(plens))
    t0 = time.time()
    jax.block_until_ready(enc._frame_fn(*args))
    compile_s = time.time() - t0
    reps = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(enc._frame_fn(*args))
        reps.append((time.time() - t0) * 1000)
    med = sorted(reps)[len(reps) // 2]
    mpix = batch * 1920 * 1080 / med / 1000
    print(f"batch {batch} ({enc.L} lanes): compile {compile_s:.0f}s, "
          f"median {med:.0f} ms/step (min {min(reps):.0f}) = "
          f"{mpix:.1f} Mpix/s", flush=True)

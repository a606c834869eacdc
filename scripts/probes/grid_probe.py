"""Bisect the 371ns-vs-4800ns/pixel gap: run the PRODUCTION
rc_encode_pallas_packed at (a) single-chunk (no grid iteration),
(b) multi-chunk, for CC=666 and CC=1332, N small.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed
from tpu_ffv1.core.rac import default_state_tables

L = 96
one_tab, zero_tab = default_state_tables()
ot, zt = jnp.asarray(one_tab), jnp.asarray(zero_tab)
rng = np.random.default_rng(0)

for CCr in (666, 1332):
    for N, chunk in ((3456, 3456), (3456, 1728), (3456, 432), (3456, 48)):
        ctx = jnp.asarray(rng.integers(0, CCr, (L, N)).astype(np.int32))
        diff = jnp.asarray(rng.integers(-20, 21, (L, N)).astype(np.int32))
        act = jnp.asarray(np.ones((L, N), bool))
        states0 = jnp.full((L, CCr, 32), 128, jnp.uint8)
        low0 = jnp.zeros(L, jnp.int32)
        range0 = jnp.full(L, 0xFF00, jnp.int32)
        try:
            f = jax.jit(lambda c, d, a, s: rc_encode_pallas_packed(
                c, d, a, s, ot, zt, low0, range0, 8, chunk)[0])
            r = f(ctx, diff, act, states0)
            jax.block_until_ready(r)
            ts = []
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(ctx, diff, act, states0))
                ts.append(time.time() - t0)
            tt = min(ts)
            print(f"CC={CCr:5d} N={N} chunk={chunk:5d} "
                  f"({N//chunk:3d} steps): {tt*1e3:7.1f} ms "
                  f"({tt/N*1e9:5.0f} ns/pixel)", flush=True)
        except Exception as e:
            print(f"CC={CCr} chunk={chunk}: FAILED "
                  f"{str(e).split(chr(10))[0][:160]}", flush=True)

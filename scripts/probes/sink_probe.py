"""Find the real production-step sink.

1. grid-chunked kernel harness (production-style BlockSpecs) at
   several chunk sizes -> per-chunk overhead
2. finalize_packed alone at production shape (129600, 24, 96)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed
from tpu_ffv1.tpu.rc_scan_lanes import finalize_packed
from tpu_ffv1.core.rac import default_state_tables
from tpu_ffv1.tpu.encoder import PREFIX_CAP

L, CCr, N = 96, 666, 129600
one_tab, zero_tab = default_state_tables()
rng = np.random.default_rng(0)
ctx = jnp.asarray(rng.integers(0, CCr, (L, N)).astype(np.int32))
diff = jnp.asarray(rng.integers(-20, 21, (L, N)).astype(np.int32))
act = jnp.asarray(np.ones((L, N), bool))
states0 = jnp.full((L, CCr, 32), 128, jnp.uint8)
low0 = jnp.zeros(L, jnp.int32)
range0 = jnp.full(L, 0xFF00, jnp.int32)
ot = jnp.asarray(one_tab)
zt = jnp.asarray(zero_tab)

for chunk in (48, 144, 432):
    if N % chunk:
        continue
    f = jax.jit(lambda c, d, a, s: rc_encode_pallas_packed(
        c, d, a, s, ot, zt, low0, range0, 8, chunk)[0].sum(),
        static_argnums=())
    try:
        r = f(ctx, diff, act, states0)
        jax.block_until_ready(r)
        ts = []
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(f(ctx, diff, act, states0))
            ts.append(time.time() - t0)
        tt = min(ts)
        print(f"kernel chunk={chunk:4d}: {tt*1e3:7.0f} ms "
              f"({tt/N*1e9:.0f} ns/pixel, {tt/(N//chunk)*1e6:.0f} "
              f"us/chunk)", flush=True)
    except Exception as e:
        print(f"kernel chunk={chunk}: FAILED "
              f"{str(e).split(chr(10))[0][:200]}", flush=True)

# finalize alone at production shape
S = 24
packed = jnp.asarray(
    (rng.integers(0, 1 << 17, (N, S, L)) +
     (rng.random((N, S, L)) < 0.04) * (1 << 20)).astype(np.int32))
prefixes = jnp.zeros((L, PREFIX_CAP), jnp.int32)
plens = jnp.full((L,), 8, jnp.int32)
lowv = jnp.zeros(L, jnp.int32)
rngv = jnp.full(L, 0xFF00, jnp.int32)
fin = jax.jit(lambda p: finalize_packed(p, lowv, rngv, prefixes, plens))
try:
    r = fin(packed)
    jax.block_until_ready(r)
    ts = []
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fin(packed))
        ts.append(time.time() - t0)
    print(f"finalize_packed (129600,24,96): {min(ts)*1e3:.0f} ms",
          flush=True)
except Exception as e:
    print(f"finalize: FAILED {str(e).split(chr(10))[0][:300]}", flush=True)

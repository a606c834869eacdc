"""Ablation timing of the PRODUCTION encode kernel via the
FFV1_PALLAS_ABLATE env knob (rc_pallas._kernel): times the raw
rc_encode_pallas_packed scan at the bench shape (L=120 lanes, 1080p
stream length) with one pixel-body stage stubbed per run.

One variant per process (the knob is read at trace time):
  for v in full no_trans no_chain no_write no_loops static_base; do
      FFV1_PALLAS_ABLATE=${v#full} python scripts/probes/ablate4.py $v
  done
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.core.rac import default_state_tables
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed

name = sys.argv[1] if len(sys.argv) > 1 else \
    (os.environ.get("FFV1_PALLAS_ABLATE") or "full")
L = int(os.environ.get("ABL_L", "120"))
N = int(os.environ.get("ABL_N", "196608"))
CHUNK = int(os.environ.get("ABL_CHUNK", "48"))
CC = 733                     # 2 state planes x 366 + 1 (yuv420p model 0)
one, zero = default_state_tables()
rng = np.random.RandomState(5)
ctx = jnp.asarray(rng.randint(0, CC, (L, N)), jnp.int32)
mag = rng.geometric(0.35, (L, N)) - 1
diff = jnp.asarray(mag * rng.choice([-1, 1], (L, N)), jnp.int32)
act = jnp.ones((L, N), jnp.int32)
st0 = jnp.full((L, CC, 32), 128, jnp.uint8)
low0 = jnp.zeros((L,), jnp.int32)
rg0 = jnp.full((L,), 0xFF00, jnp.int32)
args = (ctx, diff, act, st0, jnp.asarray(one), jnp.asarray(zero),
        low0, rg0)

t0 = time.time()
out = rc_encode_pallas_packed(*args, 8, CHUNK)
np.asarray(out[1])          # axon: block_until_ready does not force
print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
ts = []
for _ in range(6):
    t0 = time.time()
    out = rc_encode_pallas_packed(*args, 8, CHUNK)
    np.asarray(out[1])      # tiny (L,) fetch forces the step
    ts.append(time.time() - t0)
ts.sort()
med = ts[len(ts) // 2]
print(f"{name}: median {med*1000:.1f} ms  ({med/N*1e9:.0f} ns/pixel, "
      f"L={L} N={N} chunk={CHUNK})", flush=True)

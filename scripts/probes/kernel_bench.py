"""Time the production Pallas kernel at production shape on real HW,
with forced transfers (block_until_ready does not block under axon).
Also byte-checks a small case against the XLA scan on the same device.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.core.rac import default_state_tables
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_packed
from tpu_ffv1.tpu.rc_scan_lanes import (finalize_packed,
                                        rc_encode_scan_lanes)

print("platform:", jax.devices()[0].platform, flush=True)

one_tab, zero_tab = default_state_tables()
ot, zt = jnp.asarray(one_tab), jnp.asarray(zero_tab)

if "--check" in sys.argv:
    # byte-exactness on real HW vs the XLA scan (small case)
    CCr, L, N = 1332, 8, 1024
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(rng.integers(0, CCr, (L, N)).astype(np.int32))
    diff = jnp.asarray(rng.integers(-128, 128, (L, N)).astype(np.int32))
    act = jnp.asarray(rng.random((L, N)) < 0.95)
    states0 = jnp.full((L, CCr, 32), 128, jnp.uint8)
    low0 = jnp.zeros(L, jnp.int32)
    range0 = jnp.full(L, 0xFF00, jnp.int32)
    prefix = jnp.zeros((L, 8), jnp.int32)
    plen = jnp.zeros(L, jnp.int32)

    pk1, l1, r1, S1 = rc_encode_pallas_packed(
        ctx, diff, act, states0, ot, zt, low0, range0, 8, 128)
    o1, c1, _ = finalize_packed(pk1, l1, r1, prefix, plen)
    p0, v0, l0, r0, S0 = rc_encode_scan_lanes(
        ctx, diff, act, states0, ot, zt, low0, range0, 8)
    pk0 = jnp.moveaxis(p0 + (v0.astype(jnp.int32) << 20), 1, 2)
    o0, c0, _ = finalize_packed(pk0, l0, r0, prefix, plen)
    c0n, c1n = np.asarray(c0), np.asarray(c1)
    assert (c0n == c1n).all(), (c0n, c1n)
    o0n, o1n = np.asarray(o0), np.asarray(o1)
    for li in range(L):
        assert np.array_equal(o0n[li, :c0n[li]], o1n[li, :c1n[li]]), li
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    assert np.array_equal(np.asarray(S0), np.asarray(S1))
    print("REAL-HW BYTE-EXACT: PASS", flush=True)

L = int(sys.argv[sys.argv.index("--lanes") + 1]) if "--lanes" in sys.argv \
    else 96
chunk = int(sys.argv[sys.argv.index("--chunk") + 1]) if "--chunk" in \
    sys.argv else 144
CCr, N = 1332, 129600
rng = np.random.default_rng(0)
ctx = jnp.asarray(rng.integers(0, CCr, (L, N)).astype(np.int32))
diff = jnp.asarray(rng.integers(-20, 21, (L, N)).astype(np.int32))
act = jnp.asarray(np.ones((L, N), bool))
states0 = jnp.full((L, CCr, 32), 128, jnp.uint8)
low0 = jnp.zeros(L, jnp.int32)
range0 = jnp.full(L, 0xFF00, jnp.int32)

f = jax.jit(lambda c, d, a, s: rc_encode_pallas_packed(
    c, d, a, s, ot, zt, low0, range0, 8, chunk)[0][0, 0, 0])
t0 = time.time()
np.asarray(f(ctx, diff, act, states0))
print(f"compile+first: {time.time()-t0:.1f} s", flush=True)
ts = []
for _ in range(3):
    t0 = time.time()
    np.asarray(f(ctx, diff, act, states0))
    ts.append(time.time() - t0)
print(f"kernel L={L} chunk={chunk}: {min(ts)*1e3:6.0f} ms "
      f"({min(ts)/N*1e9:5.0f} ns/px-step, "
      f"{L/4*N/min(ts)/1e6:.2f} Mpix/s-equiv at batch4)", flush=True)

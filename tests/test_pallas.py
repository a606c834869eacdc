"""Pallas kernel equivalence (interpret mode).

The Pallas encode scan (tpu/rc_pallas.py) is validated against the XLA
lane-major kernel here via the TPU interpreter.  On real hardware the
kernel currently trips a Mosaic VectorLayout-inference crash (see the
module docstring) — this test pins the semantics so the kernel is ready
when the compiler path clears.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tpu_ffv1.core import tables as T  # noqa: E402
from tpu_ffv1.core.rac import default_state_tables  # noqa: E402
from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas  # noqa: E402
from tpu_ffv1.tpu.rc_scan_lanes import rc_encode_scan_lanes  # noqa: E402


def test_pallas_kernel_matches_xla_interpret():
    CC = T.CONTEXT_COUNTS[0]
    one, zero = default_state_tables()
    one_t, zero_t = jnp.asarray(one), jnp.asarray(zero)
    rng0 = np.random.RandomState(0)
    L, N = 3, 512
    ctx = jnp.asarray(rng0.randint(0, CC, (L, N)), jnp.int32)
    diff = jnp.asarray(rng0.randint(-30, 30, (L, N)), jnp.int32)
    act = jnp.ones((L, N), bool)
    states = jnp.full((L, CC, 32), 128, jnp.uint8)
    lows = jnp.zeros(L, jnp.int32)
    ranges = jnp.full(L, 0xFF00, jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        p1, v1, l1, r1, S1 = rc_encode_pallas(
            ctx, diff, act, states, one_t, zero_t, lows, ranges, 8, 128)
    p0, v0, l0, r0, S0 = rc_encode_scan_lanes(
        ctx, diff, act, states, one_t, zero_t, lows, ranges, 8)

    for lane in range(L):
        b0 = np.asarray(p0[:, lane, :])[np.asarray(v0[:, lane, :])]
        b1 = np.asarray(p1[:, lane, :])[np.asarray(v1[:, lane, :])]
        assert np.array_equal(b0 & 0x1FFFF, b1), f"lane {lane}"
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    assert np.array_equal(np.asarray(S0), np.asarray(S1))

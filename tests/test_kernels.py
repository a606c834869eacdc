"""Kernel-equivalence tests (the checkasm analog, SURVEY §4): randomized
inputs through every device-kernel variant must match the reference
formulation exactly — here the naive per-slice scan is the reference and
the optimized lane-major / unrolled kernels are the "asm"."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tpu_ffv1.core import tables as T
from tpu_ffv1.core.rac import default_state_tables
from tpu_ffv1.tpu.rc_scan import rc_encode_scan
from tpu_ffv1.tpu.rc_scan_lanes import (rc_encode_scan_lanes,
                                        rc_encode_scan_lanes_unrolled)

CC = T.CONTEXT_COUNTS[0]
L, N = 3, 4096


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    ctx = rng.randint(0, CC, (L, N)).astype(np.int32)
    diff = rng.randint(-128, 128, (L, N)).astype(np.int32)
    # bias toward zero (run-like content) to vary decision counts
    diff[rng.rand(L, N) < 0.5] = 0
    act = np.ones((L, N), bool)
    act[:, -13:] = False
    return ctx, diff, act


def _ref_lane(ctx, diff, act, states, one_t, zero_t, lane):
    p, v, lo, rv, S = rc_encode_scan(
        jnp.asarray(ctx[lane]), jnp.asarray(diff[lane]),
        jnp.asarray(act[lane]), states, one_t, zero_t,
        jnp.int32(0), jnp.int32(0xFF00), 8)
    return (np.asarray(p)[np.asarray(v)], int(lo), int(rv), np.asarray(S))


@pytest.mark.parametrize("variant", ["lanes", "unroll2", "unroll4"])
def test_scan_kernels_equivalent(variant):
    one, zero = default_state_tables()
    one_t, zero_t = jnp.asarray(one), jnp.asarray(zero)
    ctx, diff, act = _inputs()
    states = jnp.full((CC, 32), 128, jnp.uint8)
    statesL = jnp.full((L, CC, 32), 128, jnp.uint8)
    lows = jnp.zeros(L, jnp.int32)
    ranges = jnp.full(L, 0xFF00, jnp.int32)

    if variant == "lanes":
        p, v, lo, rv, S = rc_encode_scan_lanes(
            jnp.asarray(ctx), jnp.asarray(diff), jnp.asarray(act),
            statesL, one_t, zero_t, lows, ranges, 8)
    else:
        u = int(variant[-1])
        p, v, lo, rv, S = rc_encode_scan_lanes_unrolled(
            jnp.asarray(ctx), jnp.asarray(diff), jnp.asarray(act),
            statesL, one_t, zero_t, lows, ranges, 8, u)

    for lane in range(L):
        rb, rlo, rrv, rS = _ref_lane(ctx, diff, act, states, one_t,
                                     zero_t, lane)
        gb = np.asarray(p[:, lane, :])[np.asarray(v[:, lane, :])]
        assert np.array_equal(rb, gb), f"{variant} lane {lane} bytes"
        assert rlo == int(lo[lane]) and rrv == int(rv[lane])
        assert np.array_equal(rS, np.asarray(S[lane]))

"""Pallas kernel equivalence (interpret mode).

The Pallas encode scan (tpu/rc_pallas.py) is validated against the XLA
lane-major kernel here via the TPU interpreter.  On real hardware the
kernel currently trips a Mosaic VectorLayout-inference crash (see the
module docstring) — this test pins the semantics so the kernel is ready
when the compiler path clears.
"""
import os

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


def test_pallas_compact_matches_xla_interpret():
    """In-kernel per-pixel compaction: cm[N, 8, L] finalized bytes must
    match the XLA scan + finalize_packed pipeline exactly."""
    from tpu_ffv1.tpu.rc_pallas import rc_encode_pallas_compact
    from tpu_ffv1.tpu.rc_scan_lanes import finalize_compact, finalize_packed

    CC = T.CONTEXT_COUNTS[0]
    one, zero = default_state_tables()
    one_t, zero_t = jnp.asarray(one), jnp.asarray(zero)
    rng0 = np.random.RandomState(7)
    L, N = 3, 512
    ctx = jnp.asarray(rng0.randint(0, CC, (L, N)), jnp.int32)
    # codec-realistic residuals: mostly small, ~6% large.  Uniform
    # [-120, 120) noise emits >24 bytes per 16-pixel group, which now
    # (correctly) raises the finalize overflow flag and diverts the
    # frame to the full-width fallback — that path has its own test;
    # this one pins the compacted fast path.
    diff_np = rng0.randint(-6, 7, (L, N))
    big = rng0.rand(L, N) < 0.06
    diff_np = np.where(big, rng0.randint(-120, 120, (L, N)), diff_np)
    diff = jnp.asarray(diff_np, jnp.int32)
    act = jnp.asarray(rng0.rand(L, N) < 0.9)
    states = jnp.full((L, CC, 32), 128, jnp.uint8)
    lows = jnp.zeros(L, jnp.int32)
    ranges = jnp.full(L, 0xFF00, jnp.int32)
    prefix = jnp.zeros((L, 8), jnp.int32)
    plen = jnp.zeros(L, jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        cm, l1, r1, S1 = rc_encode_pallas_compact(
            ctx, diff, act, states, one_t, zero_t, lows, ranges, 8, 128)
    out1, cnt1, ovf1 = finalize_compact(cm, l1, r1, prefix, plen)

    p0, v0, l0, r0, S0 = rc_encode_scan_lanes(
        ctx, diff, act, states, one_t, zero_t, lows, ranges, 8)
    packed = jnp.moveaxis(p0 + (v0.astype(jnp.int32) << 20), 1, 2)
    out0, cnt0, ovf0 = finalize_packed(packed, l0, r0, prefix, plen)

    # both paths must agree on the overflow verdict, and the fixture is
    # chosen to exercise the no-overflow fast path
    assert np.array_equal(np.asarray(ovf0), np.asarray(ovf1))
    assert not np.asarray(ovf0).any()
    assert np.array_equal(np.asarray(cnt0), np.asarray(cnt1))
    c = np.asarray(cnt0)
    for lane in range(L):
        assert np.array_equal(np.asarray(out0)[lane, :c[lane]],
                              np.asarray(out1)[lane, :c[lane]]), f"lane {lane}"
    assert np.array_equal(np.asarray(S0), np.asarray(S1))


@pytest.mark.skipif(os.environ.get("FFV1_SLOW_TESTS") != "1",
                    reason="Mosaic interpreter needs hours for the "
                           "pixel-serial decode kernel (even an 8x8 "
                           "single-lane case exceeds 280s).  Runs in "
                           "the FFV1_SLOW_TESTS=1 pass (scripts/"
                           "slow_suite.sh) and on real hardware via "
                           "bench.py --check (decode_range_ctx1)")
def test_pallas_decode_five_input_interpret():
    """Decode kernel, 5-input context model (TT/LL ring row) — pinned
    against the XLA lane decoder under the TPU interpreter."""
    from tpu_ffv1.tpu.dec_scan_lanes import rc_decode_planes_lanes
    from tpu_ffv1.tpu.rc_dec_pallas import rc_decode_planes_pallas
    from tpu_ffv1 import EncoderParams, FFV1Encoder
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder

    W2, H2 = 24, 16
    rng0 = np.random.RandomState(5)
    frames = [[rng0.randint(0, 256, (H2, W2)).astype(np.uint8),
               rng0.randint(90, 120, (H2 // 2, W2 // 2)).astype(np.uint8),
               rng0.randint(140, 180, (H2 // 2, W2 // 2)).astype(np.uint8)]
              for _ in range(2)]
    enc = FFV1Encoder(EncoderParams(width=W2, height=H2,
                                    pix_fmt="yuv420p", level=3, coder=2,
                                    slices=4, context_model=1))
    pkts = [enc.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W2, H2, enc.extradata)
    dec.use_pallas = True

    class _Inline:
        """The interpret-mode flag is thread-local; run the decode
        worker inline instead of on the executor threads."""

        def submit(self, fn, *a, **kw):
            from concurrent.futures import Future
            f = Future()
            f.set_result(fn(*a, **kw))
            return f

    dec._executor = _Inline()
    dec._xfer_pool = _Inline()
    with pltpu.force_tpu_interpret_mode():
        for fi, pkt in enumerate(pkts):
            planes, _ = dec.decode_frame(pkt)
            for a, b in zip(planes, frames[fi]):
                assert np.array_equal(np.asarray(a), b), fi


@pytest.mark.skipif(os.environ.get("FFV1_SLOW_TESTS") != "1",
                    reason="Mosaic interpreter: ~minutes per plane "
                           "call for the pixel-serial decode kernel. "
                           "Runs in the FFV1_SLOW_TESTS=1 pass "
                           "(scripts/slow_suite.sh) and on real "
                           "hardware via bench.py --check "
                           "(decode_444p16 + decode_444p16_pallas_"
                           "active)")
def test_pallas_decode_ext_interpret():
    """Ext decode schedule (coded widths 11..17, running rows 10/31):
    the Pallas decode kernel must reconstruct host-encoded 16-bit
    streams exactly, including the int16 sample-row wrap and the
    cross-frame state chain (gop_size=2)."""
    from tpu_ffv1 import EncoderParams, FFV1Encoder
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder

    W2, H2 = 8, 2
    rng0 = np.random.RandomState(3)
    frames = [[rng0.randint(0, 65536, (H2, W2)).astype(np.uint16)]
              for _ in range(2)]
    enc = FFV1Encoder(EncoderParams(width=W2, height=H2,
                                    pix_fmt="gray16le", level=3,
                                    coder=2, gop_size=2))
    pkts = [enc.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W2, H2, enc.extradata)
    dec.use_pallas = True

    class _Inline:
        def submit(self, fn, *a, **kw):
            from concurrent.futures import Future
            f = Future()
            f.set_result(fn(*a, **kw))
            return f

    dec._executor = _Inline()
    dec._xfer_pool = _Inline()
    with pltpu.force_tpu_interpret_mode():
        for fi, pkt in enumerate(pkts):
            planes, _ = dec.decode_frame(pkt)
            for a, b in zip(planes, frames[fi]):
                assert np.array_equal(np.asarray(a), b), fi


@pytest.mark.parametrize("bits", [11, 16, 17])
def test_pallas_ext_kernel_matches_xla_interpret(bits):
    """Extended schedule (coded widths 11..17): the Pallas ext branch
    (running rows 10/31) must match rc_encode_scan_lanes_ext exactly —
    emitted provisional bytes, final coder state and adaptive states.
    11 = the smallest ext width (one row-10 repeat), 17 = RGB48's
    bits+1 (the widest the format produces)."""
    from tpu_ffv1.tpu.rc_scan_lanes import rc_encode_scan_lanes_ext

    CC = T.CONTEXT_COUNTS[0]
    one, zero = default_state_tables()
    one_t, zero_t = jnp.asarray(one), jnp.asarray(zero)
    rng0 = np.random.RandomState(11)
    L, N = 3, 256
    half = 1 << (bits - 1)
    ctx = jnp.asarray(rng0.randint(0, CC, (L, N)), jnp.int32)
    # full folded range incl. the extremes that exercise rows 10/31
    # repeatedly (e up to 15)
    diff_np = rng0.randint(-40, 41, (L, N))
    big = rng0.rand(L, N) < 0.3
    diff_np = np.where(big, rng0.randint(-half, half, (L, N)), diff_np)
    diff_np[:, :4] = [[-half, half - 1, -half + 1, 0]] * L
    diff = jnp.asarray(diff_np, jnp.int32)
    act = jnp.asarray(rng0.rand(L, N) < 0.95)
    states = jnp.full((L, CC, 32), 128, jnp.uint8)
    lows = jnp.zeros(L, jnp.int32)
    ranges = jnp.full(L, 0xFF00, jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        p1, v1, l1, r1, S1 = rc_encode_pallas(
            ctx, diff, act, states, one_t, zero_t, lows, ranges,
            bits, 64)
    p0, v0, l0, r0, S0 = rc_encode_scan_lanes_ext(
        ctx, diff, act, states, one_t, zero_t, lows, ranges, bits)

    for lane in range(L):
        b0 = np.asarray(p0[:, lane, :])[np.asarray(v0[:, lane, :])]
        b1 = np.asarray(p1[:, lane, :])[np.asarray(v1[:, lane, :])]
        assert np.array_equal(b0 & 0x1FFFF, b1), f"lane {lane}"
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    assert np.array_equal(np.asarray(S0), np.asarray(S1))


def test_pallas_ext_full_pipeline_interpret():
    """The 16-bit encoder with the Pallas ext kernel forced on (as on
    real hardware) produces byte-identical packets to the host
    encoder — validates the dispatch glue (s2=6 finalize) around the
    ext kernel, not just the kernel body."""
    from tpu_ffv1.codec.encoder import FFV1Encoder
    from tpu_ffv1.codec.params import EncoderParams
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder

    W, H = 16, 8
    rng0 = np.random.RandomState(2)
    frames = [[rng0.randint(0, 65536, (H, W)).astype(np.uint16)
               for _ in range(3)] for _ in range(2)]
    params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                           level=3, coder=2, gop_size=2)
    host = FFV1Encoder(params)
    ref = [host.encode_frame(f) for f in frames]
    dev = TPUFFV1Encoder(params)
    assert dev.ext
    dev.use_pallas = True

    class _Sync:          # run worker closures on THIS thread so the
        def submit(self, fn, *a, **k):   # interpret context applies
            from concurrent.futures import Future
            fut = Future()
            fut.set_result(fn(*a, **k))
            return fut

    dev._executor = _Sync()
    dev._upload_pool = _Sync()
    with pltpu.force_tpu_interpret_mode():
        for fi, f in enumerate(frames):
            pkt, kf = dev.encode_frames([f])[0]
            assert (pkt, kf) == ref[fi], f"frame {fi}"

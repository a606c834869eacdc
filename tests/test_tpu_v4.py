"""Device v4 per-slice RCT parameter search (tpu/rct_search.py).

The host engine runs choose_rct_params (ffv1enc.c:1064-1144) wherever
version > 3 applies it — RGB, and full-resolution >8-bit-chroma YUV —
and is itself parity-tested against the reference binary.  These tests
pin the device tier byte-identical to the host engine across those
configurations, including the coefficient-dependent slice headers and
the per-slice RCT application on the RGB pipeline.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpu_ffv1 import EncoderParams, FFV1Encoder  # noqa: E402
from tpu_ffv1.tpu.decoder import TPUFFV1Decoder  # noqa: E402
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder  # noqa: E402

W, H = 64, 32


def _textured(rng, shape, lo, hi, tilt):
    """Mild gradient + noise: searchable structure without tripping the
    v4 PCM budget retry (which would skip the coefficient headers)."""
    grad = (np.add.outer(np.arange(shape[0]), np.arange(shape[1]))
            * tilt) % (hi - lo)
    return (lo + grad + rng.randint(0, max((hi - lo) // 8, 2),
                                    shape)).astype(
        np.uint16 if hi > 256 else np.uint8)


def _rgb_packed_frames(n=3):
    rng = np.random.RandomState(11)
    out = []
    for t in range(n):
        a = np.zeros((H, W, 4), np.uint8)
        a[..., 0] = _textured(rng, (H, W), 0, 250, 3 + t)
        a[..., 1] = _textured(rng, (H, W), 0, 250, 5)
        a[..., 2] = _textured(rng, (H, W), 0, 250, 2)
        out.append(a)
    return out


def _planar_frames(n, bits, nplanes=3):
    rng = np.random.RandomState(12)
    hi = (1 << bits) - 6
    return [[_textured(rng, (H, W), 0, hi, 3 + t + p)
             for p in range(nplanes)] for t in range(n)]


def _parity(params, frames):
    host = FFV1Encoder(params)
    dev = TPUFFV1Encoder(params)
    assert dev.rct_search, "fixture must exercise the v4 search"
    assert host.extradata == dev.extradata
    for i, f in enumerate(frames):
        hp, hk = host.encode_frame(f)
        dp, dk = dev.encode_frame(f)
        assert hk == dk
        assert hp == dp, f"frame {i}: device bytes differ from host"
    return host


def test_v4_rct_search_bgr0():
    """Packed 8-bit RGB (9-bit coded, fast kernel): searched
    coefficients steer both the slice headers and the device RCT."""
    params = EncoderParams(width=W, height=H, pix_fmt="bgr0", level=4,
                           strict=-2, coder=2, slices=4, gop_size=2)
    frames = _rgb_packed_frames()
    host = _parity(params, frames)
    # the fixture must actually exercise a non-default coefficient pair
    # somewhere, or the test proves nothing
    assert any(
        (s.slice_rct_by_coef, s.slice_rct_ry_coef) != (1, 1)
        for s in host.slices)


def test_v4_rct_search_gbrp14():
    """Planar deep-bit RGB (15-bit coded, extended schedule)."""
    params = EncoderParams(width=W, height=H, pix_fmt="gbrp14le",
                           level=4, strict=-2, coder=2, slices=4)
    _parity(params, _planar_frames(2, 14))


def test_v4_rct_search_yuv444p16():
    """Full-res 16-bit YUV: the reference's unguarded search applies
    (codec/encoder.py guard) — coefficients land in the headers only
    (no RCT on colorspace 0), still a byte-level parity requirement."""
    params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                           level=4, strict=-2, coder=2, slices=4,
                           gop_size=2)
    _parity(params, _planar_frames(3, 16))


def test_v4_rct_search_nonuniform_grid():
    """Odd geometry forces the non-uniform lane path: the search falls
    back to the host pixels (identical choose_rct_params call)."""
    params = EncoderParams(width=101, height=34, pix_fmt="yuv444p16le",
                           level=4, strict=-2, coder=2, slices=4)
    rng = np.random.RandomState(13)
    frames = [[_textured(rng, (34, 101), 0, 65000, 7 + p)
               for p in range(3)] for _ in range(2)]
    host = FFV1Encoder(params)
    dev = TPUFFV1Encoder(params)
    assert not dev.uniform
    for i, f in enumerate(frames):
        assert host.encode_frame(f) == dev.encode_frame(f), i


def test_v4_rct_search_golomb():
    """coder=0: searched headers ride the range-coded prefix ahead of
    the Golomb bitstream (ffv1enc.c:1176-1183 framing)."""
    params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                           level=4, strict=-2, coder=0, slices=4)
    _parity(params, _planar_frames(2, 16))


def test_v4_rct_roundtrip_device_decode():
    """Device-encoded v4 RGB streams with searched coefficients must
    reconstruct losslessly on the device decoder (its per-lane inverse
    RCT reads the header coefficients, tpu/decoder.py _submit_rgb)."""
    params = EncoderParams(width=W, height=H, pix_fmt="bgr0", level=4,
                           strict=-2, coder=2, slices=4, gop_size=2)
    frames = _rgb_packed_frames()
    enc = TPUFFV1Encoder(params)
    dec = TPUFFV1Decoder(W, H, enc.extradata)
    for i, f in enumerate(frames):
        pkt, _ = enc.encode_frame(f)
        out, _ = dec.decode_frame(pkt)
        # bgr0 decodes to one (h, w, 4) BGRA array; the pad channel is
        # not coded (transparency=0) so compare the three color planes
        got = np.asarray(out[0])
        for ch in range(3):
            assert np.array_equal(got[..., ch], f[..., ch]), (i, ch)


def test_v4_device_source_submit():
    """v4 on the device-source path: planes staged in HBM, searched
    RCT headers built from the on-device search, bytes identical to
    the host engine (submit_device_frames no longer gates v4)."""
    import jax.numpy as jnp

    params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                           level=4, strict=-2, coder=2, slices=4,
                           gop_size=2)
    frames = _planar_frames(3, 16)
    host = FFV1Encoder(params)
    ref = [host.encode_frame(f) for f in frames]
    dev = TPUFFV1Encoder(params)
    for fi, f in enumerate(frames):
        staged = tuple(jnp.asarray(np.stack([p])) for p in f)
        dev.submit_device_frames(staged)
        (pkt, kf), = dev.collect_frames()
        assert (pkt, kf) == ref[fi], fi


def test_v4_device_source_pcm_retry():
    """Device-source v4 overflow: 16-bit noise trips the reference's
    per-line budget check and every slice retries as PCM — the retry
    must fetch the stream's planes back from HBM and stay decodable
    (ffv1enc.c:1207-1217; decoder context reset ffv1dec.c:419-420)."""
    import jax.numpy as jnp
    from tpu_ffv1.codec.decoder import FFV1Decoder as HostDecoder

    Wd, Hd = 1024, 4
    rng = np.random.RandomState(2)
    frames = [[rng.randint(0, 65536, (Hd, Wd)).astype(np.uint16)
               for _ in range(3)] for _ in range(2)]
    enc = TPUFFV1Encoder(EncoderParams(
        width=Wd, height=Hd, pix_fmt="yuv444p16le", level=4, strict=-2,
        coder=2, slices=4, gop_size=2))
    dec = HostDecoder(Wd, Hd, enc.extradata)
    for fi, f in enumerate(frames):
        staged = tuple(jnp.asarray(np.stack([p])) for p in f)
        enc.submit_device_frames(staged)
        (pkt, _kf), = enc.collect_frames()
        out, _ = dec.decode_frame(pkt)
        for a, b in zip(out, f):
            assert np.array_equal(np.asarray(a), b), fi


def test_rct_search_device_matches_host_picker():
    """The split-accumulator device sums must reproduce the host
    search bit-for-bit on adversarial content (large second
    differences push the per-pixel costs toward their 2^19 bound)."""
    from tpu_ffv1.codec.rct import choose_rct_params
    from tpu_ffv1.tpu.rct_search import (pick_rct_coefs,
                                         rct_cost_pairs_lanes)
    rng = np.random.RandomState(3)
    crops = rng.randint(0, 65536, (5, 3, 24, 40)).astype(np.int64)
    pairs = np.asarray(rct_cost_pairs_lanes(
        crops[:, 0].astype(np.int32), crops[:, 1].astype(np.int32),
        crops[:, 2].astype(np.int32)))
    got = pick_rct_coefs(pairs)
    for lane in range(5):
        want = choose_rct_params([crops[lane, 0], crops[lane, 1],
                                  crops[lane, 2]], False)
        assert got[lane] == want, lane

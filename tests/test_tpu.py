"""TPU-path parity: the device stencil + scan kernels must produce the
same bytes as the spec path (and hence as the reference binary)."""
import numpy as np
import pytest

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
from tpu_ffv1.tpu.decoder import TPUFFV1Decoder

W, H, N = 48, 40, 4


def _frames(bits, seed=3):
    rng = np.random.RandomState(seed)
    hi = 1 << bits
    dt = np.uint8 if bits <= 8 else np.uint16
    frames = []
    for t in range(N):
        y = ((np.add.outer(np.arange(H), np.arange(W)) * max(hi // 64, 1)
              + t * 7 + rng.randint(0, max(hi // 32, 2), (H, W))) % hi)
        u = rng.randint(0, hi, (H // 2, W // 2))
        v = np.full((H // 2, W // 2), hi // 2)
        frames.append([y.astype(dt), u.astype(dt), v.astype(dt)])
    return frames


CONFIGS = [
    ("420_range_custom", "yuv420p", 8, dict(coder=2, slices=4)),
    ("420_range_default", "yuv420p", 8, dict(coder=-2, slices=4)),
    ("420_ctx1", "yuv420p", 8, dict(coder=2, slices=4, context_model=1)),
    ("420p10", "yuv420p10le", 10, dict(coder=2, slices=4)),
    ("420p16", "yuv420p16le", 16, dict(coder=2, slices=4)),
    ("420_gop2", "yuv420p", 8, dict(coder=2, slices=4, gop_size=2)),
]


@pytest.mark.parametrize("label,pix,bits,kw", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_tpu_encoder_byte_exact(label, pix, bits, kw):
    frames = _frames(bits)
    params = EncoderParams(width=W, height=H, pix_fmt=pix, level=3, **kw)
    spec = FFV1Encoder(params)
    tpu = TPUFFV1Encoder(params)
    assert spec.extradata == tpu.extradata
    for i, f in enumerate(frames):
        sp, sk = spec.encode_frame(f)
        tp, tk = tpu.encode_frame(f)
        assert sk == tk
        assert sp == tp, f"frame {i}: TPU bytes differ from spec"


@pytest.mark.parametrize("label,pix,bits,kw", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_tpu_decoder_lossless(label, pix, bits, kw):
    frames = _frames(bits)
    params = EncoderParams(width=W, height=H, pix_fmt=pix, level=3, **kw)
    enc = FFV1Encoder(params)
    dec = TPUFFV1Decoder(W, H, enc.extradata)
    for i, f in enumerate(frames):
        pkt, _ = enc.encode_frame(f)
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(a, b), f"frame {i} plane mismatch"


def test_tpu_end_to_end_with_spec_decoder():
    """TPU encoder's stream must decode on the spec decoder (and thus on
    the reference binary, by test_vs_reference transitivity)."""
    frames = _frames(8, seed=9)
    params = EncoderParams(width=W, height=H, pix_fmt="yuv420p", level=3,
                           coder=2, slices=4, gop_size=3)
    enc = TPUFFV1Encoder(params)
    dec = FFV1Decoder(W, H, enc.extradata)
    for f in frames:
        pkt, _ = enc.encode_frame(f)
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(a, b)


def test_tpu_batch_streams_byte_exact():
    """batch>1: independent streams in lockstep must each match the
    per-stream spec encoder bytes."""
    B = 2
    streams = [_frames(8, seed=20 + b) for b in range(B)]
    params = EncoderParams(width=W, height=H, pix_fmt="yuv420p", level=3,
                           coder=2, slices=4, gop_size=2)
    tpu = TPUFFV1Encoder(params, batch=B)
    specs = [FFV1Encoder(params) for _ in range(B)]
    for t in range(3):
        results = tpu.encode_frames([streams[b][t] for b in range(B)])
        for b in range(B):
            sp, sk = specs[b].encode_frame(streams[b][t])
            tp, tk = results[b]
            assert sk == tk and sp == tp, f"stream {b} frame {t}"

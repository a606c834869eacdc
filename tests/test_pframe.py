"""Experimental motion-compensated FFV1-P extension (pframe/)."""
import numpy as np
import pytest

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.pframe.codec import FFV1PDecoder, FFV1PEncoder

W, H = 96, 80


def _panning_texture(n=6, dx=5, dy=3):
    """Random texture translating per frame: ideal for MC, worst case for
    pure context carry-over (texture must be re-coded intra)."""
    rng = np.random.RandomState(9)
    big = rng.randint(0, 256, (H + n * abs(dy) + 8,
                               W + n * abs(dx) + 8)).astype(np.uint8)
    frames = []
    for t in range(n):
        y = big[t * dy:t * dy + H, t * dx:t * dx + W].copy()
        u = np.full((H // 2, W // 2), 100, np.uint8)
        v = np.full((H // 2, W // 2), 160, np.uint8)
        frames.append([y, u, v])
    return frames


def test_requires_experimental_gate():
    with pytest.raises(ValueError):
        FFV1PEncoder(EncoderParams(width=W, height=H, pix_fmt="yuv420p",
                                   level=3, coder=2, gop_size=8))


def test_pframe_lossless_and_beats_intra_on_panning():
    frames = _panning_texture()
    params = EncoderParams(width=W, height=H, pix_fmt="yuv420p", level=3,
                           coder=2, slices=4, gop_size=len(frames))
    enc = FFV1PEncoder(params, radius=7, experimental=True)
    dec = FFV1PDecoder(W, H, enc.extradata, enc.res_extradata)
    total_mc = 0
    for f in frames:
        pkt, key = enc.encode_frame(f)
        total_mc += len(pkt)
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(np.asarray(a, np.int64),
                                  np.asarray(b, np.int64))

    base = FFV1Encoder(params)
    total_base = sum(len(base.encode_frame(f)[0]) for f in frames)
    # motion compensation must clearly win on panning random texture
    assert total_mc < total_base * 0.75, (total_mc, total_base)

"""Pallas -> XLA one-shot fallback paths.

On the CPU backend a non-interpret pallas_call raises at first
dispatch — the same failure shape as a Mosaic compile error on an
unsupported TPU toolchain — so forcing use_pallas=True here exercises
the real fallback machinery end-to-end: the first frame must still
come out byte-exact via the XLA scan and the flag must flip off.
"""
import numpy as np

from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams

W, H = 64, 48


def _frames(n=3, seed=12):
    rng = np.random.RandomState(seed)
    return [[rng.randint(0, 255, (H, W)).astype(np.uint8),
             rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
             rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)]
            for _ in range(n)]


def _params(**kw):
    d = dict(width=W, height=H, pix_fmt="yuv420p", level=3, coder=2,
             slices=4, gop_size=2)
    d.update(kw)
    return EncoderParams(**d)


def test_encoder_pallas_fallback_byte_exact():
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    frames = _frames()
    host = FFV1Encoder(_params())
    ref = [host.encode_frame(f) for f in frames]
    enc = TPUFFV1Encoder(_params())
    enc.use_pallas = True          # doomed on CPU -> fallback fires
    for fi, f in enumerate(frames):
        assert enc.encode_frames([f])[0] == ref[fi], fi
    assert enc.use_pallas is False


def test_decoder_pallas_fallback_lossless():
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    frames = _frames(seed=13)
    enc = FFV1Encoder(_params())
    pkts = [enc.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W, H, enc.extradata)
    dec.use_pallas = True
    for fi, pkt in enumerate(pkts):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, frames[fi]):
            assert np.array_equal(np.asarray(a), b), fi
    assert dec.use_pallas is False


def test_pframe_pallas_fallback_byte_exact():
    from tpu_ffv1.pframe.codec import FFV1PEncoder
    from tpu_ffv1.pframe.tpu import TPUFFV1PEncoder
    frames = _frames(n=4, seed=14)
    host = FFV1PEncoder(_params(gop_size=3), experimental=True)
    ref = [host.encode_frame(f) for f in frames]
    dev = TPUFFV1PEncoder(_params(gop_size=3), experimental=True)
    dev.use_pallas = True
    for fi, f in enumerate(frames):
        assert dev.encode_frames([f])[0] == ref[fi], fi
    assert dev.use_pallas is False

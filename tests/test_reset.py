"""reset() — the avcodec_flush_buffers analog (libavcodec/utils.c).

A reset codec instance must behave exactly like a fresh one (bit-exact
re-encode / re-decode) while keeping its compiled pipelines.
"""
import numpy as np

from tpu_ffv1.codec.decoder import FFV1Decoder
from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams

W, H = 64, 48


def _frames(n=4, seed=2):
    rng = np.random.RandomState(seed)
    return [[(np.add.outer(np.arange(H), np.arange(W)) + 9 * t)
             .astype(np.uint8) + rng.randint(0, 8, (H, W)).astype(np.uint8),
             rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
             rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)]
            for t in range(n)]


def _params(**kw):
    d = dict(width=W, height=H, pix_fmt="yuv420p", level=3, coder=2,
             slices=4, gop_size=2)
    d.update(kw)
    return EncoderParams(**d)


def test_host_encoder_reset_bit_exact():
    frames = _frames()
    enc = FFV1Encoder(_params())
    first = [enc.encode_frame(f) for f in frames]
    assert not first[1][1]          # GOP produced a P frame
    enc.reset()
    again = [enc.encode_frame(f) for f in frames]
    assert again == first


def test_host_decoder_reset_requires_keyframe():
    import pytest
    frames = _frames()
    enc = FFV1Encoder(_params())
    pkts = [enc.encode_frame(f) for f in frames]
    dec = FFV1Decoder(W, H, enc.extradata)
    out1 = [dec.decode_frame(p) for p, _ in pkts]
    dec.reset()
    # P packet right after a flush must be rejected (ffv1dec.c:931)
    with pytest.raises(ValueError):
        dec.decode_frame(pkts[1][0])
    dec.reset()
    out2 = [dec.decode_frame(p) for p, _ in pkts]
    for (a, _), (b, _) in zip(out1, out2):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_tpu_encoder_reset_bit_exact():
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    frames = _frames()
    enc = TPUFFV1Encoder(_params())
    first = [enc.encode_frame(f) for f in frames]
    enc.reset()
    again = [enc.encode_frame(f) for f in frames]
    assert again == first


def test_tpu_decoder_reset_bit_exact():
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    frames = _frames()
    enc = FFV1Encoder(_params())
    pkts = [enc.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W, H, enc.extradata)
    out1 = [dec.decode_frame(p) for p in pkts]
    dec.reset()
    out2 = [dec.decode_frame(p) for p in pkts]
    for (a, _), (b, _) in zip(out1, out2):
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pframe_reset_bit_exact():
    from tpu_ffv1.pframe.codec import FFV1PDecoder, FFV1PEncoder
    frames = _frames()
    enc = FFV1PEncoder(_params(gop_size=3), experimental=True)
    first = [enc.encode_frame(f) for f in frames]
    enc.reset()
    again = [enc.encode_frame(f) for f in frames]
    assert again == first
    dec = FFV1PDecoder(W, H, enc.extradata)
    out1 = [dec.decode_frame(p) for p, _ in first]
    dec.reset()
    out2 = [dec.decode_frame(p) for p, _ in first]
    for (a, _), (b, _) in zip(out1, out2):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)

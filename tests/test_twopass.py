"""Two-pass statistics/tuning subsystem (ffv1enc.c:898-986, :1235-1279)."""
import numpy as np
import pytest

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder


def _frames(n=6, w=64, h=48):
    rng = np.random.RandomState(5)
    out = []
    for t in range(n):
        y = ((np.add.outer(np.arange(h), np.arange(w)) * 3 + t * 5 +
              rng.randint(0, 6, (h, w))) % 256).astype(np.uint8)
        u = rng.randint(100, 130, (h // 2, w // 2)).astype(np.uint8)
        v = rng.randint(120, 140, (h // 2, w // 2)).astype(np.uint8)
        out.append([y, u, v])
    return out


def test_two_pass_roundtrip_and_gain():
    frames = _frames()
    p1 = FFV1Encoder(EncoderParams(width=64, height=48, pix_fmt="yuv420p",
                                   level=3, coder=2, slices=4, pass1=True))
    size1 = sum(len(p1.encode_frame(f)[0]) for f in frames)
    stats = p1.get_stats()
    assert stats.strip().endswith("1")  # gob count for one keyframe group

    p2 = FFV1Encoder(EncoderParams(width=64, height=48, pix_fmt="yuv420p",
                                   level=3, coder=2, slices=4,
                                   stats_in=stats))
    dec = FFV1Decoder(64, 48, p2.extradata)
    size2 = 0
    for f in frames:
        pkt, _ = p2.encode_frame(f)
        size2 += len(pkt)
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(a, b)
    # tuned initial states should not hurt (and usually help)
    assert size2 <= size1 * 1.01


def test_stats_serialization_roundtrip():
    from tpu_ffv1.codec.twopass import Pass1Stats, parse_stats
    st = Pass1Stats(2, (666, 8282))
    st.rc_stat[10][1] = 42
    st.rc_stat2[0][5][3][0] = 7
    st.gob_count = 3
    text = st.serialize()
    rc, rc2, gob = parse_stats(text, 2, (666, 8282))
    assert rc[10][1] == 42 and rc2[0][5][3][0] == 7 and gob == 3

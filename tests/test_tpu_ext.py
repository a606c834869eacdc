"""Extended-schedule TPU encode (coded widths 11..17 bits): byte
exactness vs the host encoder for deep YUV and deep RGB content.

The put_symbol row caps (1+min(j,9) / 22+min(i,9), ffv1enc.c:185-231)
make rows 10 and 31 carry several decisions per pixel at these widths;
the ext scan chains them sequentially (rc_scan_lanes_ext)."""
import numpy as np
import pytest

from tpu_ffv1.codec.decoder import FFV1Decoder
from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams


def _deep_frames(w, h, bits, nplanes, chroma_div=1, n=3, seed=3):
    rng = np.random.RandomState(seed)
    mx = (1 << bits) - 1
    frames = []
    for t in range(n):
        planes = []
        for pi in range(nplanes):
            d = chroma_div if pi in (1, 2) else 1
            base = (np.add.outer(np.arange(h // d), np.arange(w // d))
                    * (257 + t * 37 + pi * 101)) % (mx + 1)
            p = (base + rng.randint(0, 1 << max(1, bits - 6),
                                    (h // d, w // d))) & mx
            planes.append(p.astype(np.uint16))
        frames.append(planes)
    return frames


@pytest.mark.parametrize("pix_fmt,bits,nplanes,cdiv,kw", [
    ("yuv444p16le", 16, 3, 1, dict()),
    ("yuv420p16le", 16, 3, 2, dict(gop_size=2)),
    ("yuv422p12le", 12, 3, 2, dict()) if False else
    ("gray16le", 16, 1, 1, dict()),
    ("gbrp14le", 14, 3, 1, dict()),
    ("gbrp12le", 12, 3, 1, dict()),
])
def test_tpu_ext_byte_exact(pix_fmt, bits, nplanes, cdiv, kw):
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    W, H = 48, 32
    params = dict(width=W, height=H, pix_fmt=pix_fmt, level=3, coder=2,
                  slices=4, slicecrc=1)
    params.update(kw)
    frames = _deep_frames(W, H, bits, nplanes, cdiv)
    host = FFV1Encoder(EncoderParams(**params))
    ref = [host.encode_frame(f) for f in frames]
    dev = TPUFFV1Encoder(EncoderParams(**params))
    assert dev.ext, "expected the extended schedule path"
    for fi, f in enumerate(frames):
        pkt, kf = dev.encode_frames([f])[0]
        assert kf == ref[fi][1]
        assert pkt == ref[fi][0], f"{pix_fmt} frame {fi} differs"
    # host decoder roundtrip of the device stream
    dec = FFV1Decoder(W, H, dev.extradata)
    for fi, (pkt, _) in enumerate(ref):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, frames[fi]):
            ex = b if bits > 8 else b.astype(np.uint8)
            if host.rp.colorspace == 0 and bits in (9, 10):
                pass
            assert np.array_equal(np.asarray(a), ex), fi


def test_tpu_ext_batch_streams():
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    W, H = 48, 32
    params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                           level=3, coder=2, slices=4, gop_size=3)
    streams = [_deep_frames(W, H, 16, 3, 1, seed=s) for s in (1, 9)]
    hosts = [FFV1Encoder(params) for _ in range(2)]
    refs = [[h.encode_frame(f) for f in s] for h, s in zip(hosts, streams)]
    dev = TPUFFV1Encoder(params, batch=2)
    for fi in range(3):
        res = dev.encode_frames([streams[0][fi], streams[1][fi]])
        for bi in range(2):
            assert res[bi][0] == refs[bi][fi][0], (bi, fi)


def test_tpu_alpha_yuva420p_byte_exact():
    """4-plane YUV+alpha through both device paths (the alpha plane is
    coded like luma with its own context plane, ffv1enc.c:1196-1201)."""
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    W, H = 48, 32
    rng = np.random.RandomState(3)
    frames = [[rng.randint(0, 255, (H, W)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
               rng.randint(0, 255, (H, W)).astype(np.uint8)]
              for _ in range(3)]
    kw = dict(width=W, height=H, pix_fmt="yuva420p", level=3, coder=2,
              slices=4, gop_size=2)
    host = FFV1Encoder(EncoderParams(**kw))
    ref = [host.encode_frame(f) for f in frames]
    dev = TPUFFV1Encoder(EncoderParams(**kw))
    for fi, f in enumerate(frames):
        pkt, kf = dev.encode_frames([f])[0]
        assert (pkt, kf) == ref[fi], fi
    dec = TPUFFV1Decoder(W, H, host.extradata)
    for fi, (pkt, _) in enumerate(ref):
        planes, _ = dec.decode_frame(pkt)
        assert all(np.array_equal(np.asarray(a), b)
                   for a, b in zip(planes, frames[fi])), fi


@pytest.mark.parametrize("pix_fmt,bits,nplanes,cdiv,kw", [
    ("yuv444p16le", 16, 3, 1, dict()),
    ("yuv420p16le", 16, 3, 2, dict(gop_size=2)),
    ("gray16le", 16, 1, 1, dict()),
    ("gbrp12le", 12, 3, 1, dict()),       # coded width 13
    ("gbrp14le", 14, 3, 1, dict()),       # coded width 15
])
def test_tpu_ext_decode_exact(pix_fmt, bits, nplanes, cdiv, kw):
    """Deep-bit FUSED device decode (clipped-row schedule, coded widths
    11..17): the lane scan must reproduce the host decoder exactly,
    including GOP context carry-over."""
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    W, H = 48, 32
    params = dict(width=W, height=H, pix_fmt=pix_fmt, level=3, coder=2,
                  slices=4, slicecrc=1)
    params.update(kw)
    frames = _deep_frames(W, H, bits, nplanes, cdiv)
    host = FFV1Encoder(EncoderParams(**params))
    pkts = [host.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W, H, host.extradata)
    assert dec.uniform, "deep-bit stream must ride the fused path"
    for fi, pkt in enumerate(pkts):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, frames[fi]):
            assert np.array_equal(np.asarray(a), b), (pix_fmt, fi)


def test_tpu_ext_decode_batch_and_damage():
    """Deep-bit fused decode with batch=2 + CRC concealment."""
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    W, H = 48, 32
    params = dict(width=W, height=H, pix_fmt="yuv444p16le", level=3,
                  coder=2, slices=4, slicecrc=1)
    streams = [_deep_frames(W, H, 16, 3, 1, seed=s) for s in (2, 7)]
    hosts = [FFV1Encoder(EncoderParams(**params)) for _ in range(2)]
    pkts = [[h.encode_frame(f)[0] for f in s]
            for h, s in zip(hosts, streams)]
    dec = TPUFFV1Decoder(W, H, hosts[0].extradata, batch=2)
    good0 = dec.decode_frames([pkts[0][0], pkts[1][0]])
    # trash stream 0's second packet payload: conceal from frame 0
    bad = bytearray(pkts[0][1])
    s0, e0 = dec._split_slices(bytes(bad))[0]
    bad[(s0 + e0) // 2] ^= 0x3C
    res = dec.decode_frames([bytes(bad), pkts[1][1]])
    assert dec.slice_damaged[0].any()
    for si, flag in enumerate(dec.slice_damaged[0]):
        if not flag:
            continue
        gm = dec.geoms[si]
        got = np.asarray(res[0][0][0])[gm.y:gm.y + gm.height,
                                       gm.x:gm.x + gm.width]
        want = np.asarray(good0[0][0][0])[gm.y:gm.y + gm.height,
                                          gm.x:gm.x + gm.width]
        assert np.array_equal(got, want)
    for a, b in zip(res[1][0], streams[1][1]):
        assert np.array_equal(np.asarray(a), b)


@pytest.mark.parametrize("pix_fmt,bits,nplanes,cdiv", [
    ("yuv444p16le", 16, 3, 1),
    ("gray16le", 16, 1, 1),
    ("yuv420p16le", 16, 3, 2),
])
def test_tpu_ext_golomb_decode_exact(pix_fmt, bits, nplanes, cdiv):
    """Deep-bit fused Golomb-Rice device decode (esc_len = 16, int16
    ring-row wrap), incl. GOP VLC-state carry-over."""
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    W, H = 48, 32
    params = dict(width=W, height=H, pix_fmt=pix_fmt, level=3, coder=0,
                  slices=4, gop_size=2)
    frames = _deep_frames(W, H, bits, nplanes, cdiv)
    host = FFV1Encoder(EncoderParams(**params))
    pkts = [host.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W, H, host.extradata)
    for fi, pkt in enumerate(pkts):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, frames[fi]):
            assert np.array_equal(np.asarray(a), b), (pix_fmt, fi)


def test_tpu_ext_device_transcode_chain_16bit():
    """Deep-bit on-device transcode: 16-bit planes stay in HBM between
    TPUFFV1Decoder(device_out=True) and submit_device_frames; the
    re-encode must equal encoding the original frames."""
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    W, H = 48, 32
    frames = _deep_frames(W, H, 16, 3, 1, seed=9)
    src_params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                               level=3, coder=2, slices=4)
    src = FFV1Encoder(src_params)
    pkts = [src.encode_frame(f)[0] for f in frames]
    out_params = EncoderParams(width=W, height=H, pix_fmt="yuv444p16le",
                               level=3, coder=2, slices=4, gop_size=2)
    want = FFV1Encoder(out_params)
    wpk = [want.encode_frame(f) for f in frames]
    dec = TPUFFV1Decoder(W, H, src.extradata, device_out=True)
    enc = TPUFFV1Encoder(out_params)
    for t, pkt in enumerate(pkts):
        planes, _kf = dec.decode_frames([pkt])
        enc.submit_device_frames(planes)
        gp, gk = enc.collect_frames()[0]
        assert (gp, gk) == wpk[t], f"frame {t}"


def test_ya8_device_paths():
    """ya8 rides the device tier (round-3 gap): the TPU encoder
    de-interleaves the (H, W, 2) storage into the luma+alpha plane
    pair (alpha on state plane 1, ffv1enc.c:1196) and must be
    byte-identical to the host encoder; the TPU decoder reconstructs
    the interleaved array losslessly, for both coders."""
    import numpy as np
    from tpu_ffv1 import EncoderParams, FFV1Encoder
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder

    W, H = 48, 32
    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 255, (H, W, 2)).astype(np.uint8)
              for _ in range(3)]
    for coder in (2, 0):
        params = EncoderParams(width=W, height=H, pix_fmt="ya8",
                               level=3, coder=coder, slices=4,
                               gop_size=2, slicecrc=1)
        host = FFV1Encoder(params, engine="spec")
        ref = [host.encode_frame(f) for f in frames]
        dev = TPUFFV1Encoder(params)
        for fi, f in enumerate(frames):
            pkt, kf = dev.encode_frame(f)
            assert (pkt, kf) == ref[fi], (coder, fi)
        dec = TPUFFV1Decoder(W, H, host.extradata)
        assert dec.ya
        for fi, (pkt, _k) in enumerate(ref):
            out, _ = dec.decode_frame(pkt)
            arr = np.asarray(out[0] if isinstance(out, list) else out)
            assert np.array_equal(arr, frames[fi]), (coder, fi)

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


def test_two_pass_exact_vs_reference(tmp_path):
    """Exact parity with the reference's -pass machinery: pass-1 stats
    text and pass-2 streams must be byte-identical (ffv1enc.c:898-986,
    :1235-1279; find_best_state runs in the native tier to match the
    C double fold exactly)."""
    import os
    import subprocess
    from tests.util import REF_FFMPEG, have_reference
    from tpu_ffv1.io.avi import read_avi
    from tpu_ffv1.io.rawvideo import write_frames

    if not have_reference():
        pytest.skip("reference binary not built")
    frames = _frames()
    raw = str(tmp_path / "in.yuv")
    write_frames(raw, frames)
    plog = str(tmp_path / "pl")
    base = [REF_FFMPEG, "-hide_banner", "-loglevel", "error",
            "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", "64x48",
            "-i", raw, "-c:v", "ffv1", "-level", "3", "-coder", "2",
            "-slices", "4", "-passlogfile", plog]
    subprocess.run(base + ["-pass", "1", "-y", str(tmp_path / "p1.avi")],
                   check=True)
    subprocess.run(base + ["-pass", "2", "-y", str(tmp_path / "p2.avi")],
                   check=True)
    ref_stats = open(plog + "-0.log").read()

    p1 = FFV1Encoder(EncoderParams(width=64, height=48, pix_fmt="yuv420p",
                                   level=3, coder=2, slices=4, pass1=True))
    for f in frames:
        p1.encode_frame(f)
    stats = p1.get_stats()
    # plain == on ~1 MB strings: a mismatch would make pytest's
    # assertion-diff machinery crawl, so compare out-of-line
    same = stats == ref_stats
    if not same:
        i = next((k for k, (a, b) in enumerate(zip(ref_stats, stats))
                  if a != b), min(len(stats), len(ref_stats)))
        pytest.fail(f"pass-1 stats differ at byte {i}: "
                    f"ref {ref_stats[i:i+20]!r} ours {stats[i:i+20]!r} "
                    f"(lens {len(ref_stats)}/{len(stats)})")

    ref2 = read_avi(str(tmp_path / "p2.avi"))
    p2 = FFV1Encoder(EncoderParams(width=64, height=48, pix_fmt="yuv420p",
                                   level=3, coder=2, slices=4,
                                   stats_in=ref_stats))
    # ffmpeg pads AVI strf extradata to even length with a zero byte
    assert p2.extradata == ref2.extradata.rstrip(b"\x00") or \
        p2.extradata == ref2.extradata
    for fi, f in enumerate(frames):
        pkt, _ = p2.encode_frame(f)
        assert pkt == ref2.packets[fi], f"pass-2 frame {fi} differs"


def test_cli_two_pass_matches_reference(tmp_path):
    """CLI -pass 1/2 -passlogfile: stats file and pass-2 packets must be
    byte-identical to the reference binary's two-pass run."""
    import os
    import subprocess
    import sys
    from tests.util import REF_FFMPEG, have_reference
    from tpu_ffv1.io.avi import read_avi
    from tpu_ffv1.io.rawvideo import write_frames

    if not have_reference():
        pytest.skip("reference binary not built")
    td = str(tmp_path)
    frames = _frames()
    raw = os.path.join(td, "in.yuv")
    write_frames(raw, frames)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    rlog = os.path.join(td, "ref")
    base_ref = [REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", "64x48",
                "-i", raw, "-c:v", "ffv1", "-level", "3", "-coder", "2",
                "-slices", "4", "-passlogfile", rlog]
    subprocess.run(base_ref + ["-pass", "1", "-y",
                               os.path.join(td, "r1.avi")], check=True)
    subprocess.run(base_ref + ["-pass", "2", "-y",
                               os.path.join(td, "r2.avi")], check=True)

    mlog = os.path.join(td, "mine")
    base = [sys.executable, "-m", "tpu_ffv1", "-f", "rawvideo",
            "-pix_fmt", "yuv420p", "-s", "64x48", "-i", raw,
            "-level", "3", "-coder", "2", "-slices", "4",
            "-passlogfile", mlog]
    r = subprocess.run(base + ["-pass", "1", os.path.join(td, "m1.avi")],
                       capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    stats_equal = (open(mlog + "-0.log").read() ==
                   open(rlog + "-0.log").read())
    assert stats_equal, "pass-1 stats files differ"
    r = subprocess.run(base + ["-pass", "2", os.path.join(td, "m2.avi")],
                       capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    a = read_avi(os.path.join(td, "m2.avi"))
    b = read_avi(os.path.join(td, "r2.avi"))
    assert [bytes(p) for p in a.packets] == [bytes(p) for p in b.packets]

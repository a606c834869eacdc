"""Sanitizer harness for the native C runtime.

The reference validates its C tier with asan/ubsan toolchains and
valgrind FATE runs (configure:3473-3494, :426-444).  Analog here: build
the same ffv1_native.c with -fsanitize=address,undefined
(native/Makefile `sanitize` target), LD_PRELOAD the sanitizer
runtimes into a fresh interpreter, point FFV1_NATIVE_LIB at the
instrumented library, and drive encode+decode through the native
engine.  Any out-of-bounds access / UB aborts the subprocess.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")
SAN_LIB = os.path.join(NATIVE, "libffv1native_san.so")

_DRIVER = r"""
import numpy as np
from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.decoder import FFV1Decoder
from tpu_ffv1.codec.params import EncoderParams

rng = np.random.RandomState(11)
W, H = 70, 42
for kw in (
    dict(pix_fmt="yuv420p", level=3, coder=2, slices=4, gop_size=2),
    dict(pix_fmt="yuv420p", level=3, coder=0, slices=4),   # golomb
    dict(pix_fmt="yuv444p16", level=3, coder=2, slices=4),
    dict(pix_fmt="bgr0", level=3, coder=2, slices=4),
    dict(pix_fmt="ya8", level=3, coder=2, slices=4),  # strided decode
):
    enc = FFV1Encoder(EncoderParams(width=W, height=H, **kw),
                      engine="native")
    dec = FFV1Decoder(W, H, enc.extradata, engine="native")
    for t in range(3):
        if kw["pix_fmt"] == "bgr0":
            f = rng.randint(0, 255, (H, W, 4)).astype(np.uint8)
            f[..., 3] = 0
        elif kw["pix_fmt"] == "ya8":
            f = rng.randint(0, 255, (H, W, 2)).astype(np.uint8)
        else:
            hi = 65535 if "16" in kw["pix_fmt"] else 255
            dt = np.uint16 if hi > 255 else np.uint8
            sub = 2 if kw["pix_fmt"] == "yuv420p" else 1
            f = [rng.randint(0, hi, (H, W)).astype(dt),
                 rng.randint(0, hi, (H // sub, W // sub)).astype(dt),
                 rng.randint(0, hi, (H // sub, W // sub)).astype(dt)]
        pkt, _ = enc.encode_frame(f)
        out, _ = dec.decode_frame(pkt)
        if kw["pix_fmt"] in ("bgr0", "ya8"):
            arr = np.asarray(out if isinstance(out, np.ndarray) else out[0])
            assert np.array_equal(arr, f)
        else:
            assert all(np.array_equal(a, b) for a, b in zip(out, f))
print("SANITIZED-ROUNDTRIP-OK")
"""


def _gcc_lib(name):
    try:
        p = subprocess.run(["gcc", f"-print-file-name={name}"],
                           capture_output=True, text=True).stdout.strip()
        return p if os.path.sep in p and os.path.exists(p) else None
    except OSError:
        return None


asan = _gcc_lib("libasan.so")
ubsan = _gcc_lib("libubsan.so")


@pytest.mark.skipif(asan is None or ubsan is None,
                    reason="gcc sanitizer runtimes not found")
def test_native_runtime_under_asan_ubsan():
    r = subprocess.run(["make", "-s", "-C", NATIVE, "sanitize"])
    if r.returncode or not os.path.exists(SAN_LIB):
        pytest.skip("sanitized build unavailable")
    env = dict(os.environ,
               LD_PRELOAD=f"{asan}:{ubsan}",
               FFV1_NATIVE_LIB=SAN_LIB,
               # python itself is not leak-clean; UB/OOB still abort
               ASAN_OPTIONS="detect_leaks=0,abort_on_error=1",
               PYTHONPATH=ROOT)
    r = subprocess.run([sys.executable, "-c", _DRIVER], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"sanitizer abort:\n{r.stdout}\n{r.stderr}"
    assert "SANITIZED-ROUNDTRIP-OK" in r.stdout
    assert "AddressSanitizer" not in r.stderr
    assert "runtime error" not in r.stderr      # ubsan diagnostic marker

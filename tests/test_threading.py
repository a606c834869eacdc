"""Thread-correctness stress — the sanitizer/FATE-threading analog.

The reference validates its slice/frame thread pools by requiring
bit-exact output under every thread configuration (tests/fate-run.sh:
18-19 parameterizes THREADS x thread_type against the same goldens) and
by TSan/valgrind runs (configure:3473-3494).  The framework analog:

* engine/thread invariance: the pooled native engine, the serial spec
  engine, and a pool forced to 1 worker must produce identical bytes;
* hammering: many encoder/decoder instances running concurrently from a
  thread pool (shared C library, shared ctypes bindings) must each
  reproduce the single-threaded result byte-for-byte.
"""
import concurrent.futures
import os

import numpy as np

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder

W, H, N = 96, 64, 4


def _frames(seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for t in range(N):
        y = ((np.add.outer(np.arange(H), np.arange(W)) * 2 + t * 5 +
              rng.randint(0, 10, (H, W))) % 256).astype(np.uint8)
        u = rng.randint(80, 160, (H // 2, W // 2)).astype(np.uint8)
        v = rng.randint(100, 180, (H // 2, W // 2)).astype(np.uint8)
        out.append([y, u, v])
    return out


KW = dict(width=W, height=H, pix_fmt="yuv420p", level=3, coder=2,
          slices=4, gop_size=2)


def _encode_all(engine):
    enc = FFV1Encoder(EncoderParams(**KW), engine=engine)
    return [enc.encode_frame(f) for f in _frames()]


def test_engine_and_pool_invariance(monkeypatch):
    """Slice-pool parallelism must not change a single byte (the
    THREADS-matrix invariance the reference asserts via its goldens)."""
    pooled = _encode_all("native")
    serial = _encode_all("spec")
    assert [p for p, _ in pooled] == [p for p, _ in serial]
    # force a 1-worker pool through the same pooled code path
    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    one = _encode_all("native")
    assert [p for p, _ in one] == [p for p, _ in pooled]


def test_concurrent_instance_hammering():
    """16 concurrent encode+decode pipelines over the shared native
    library must each be byte-identical to the reference run (races in
    the C tier or the ctypes marshaling would diverge or crash)."""
    frames = _frames()
    golden = _encode_all("native")

    def one_run(i):
        enc = FFV1Encoder(EncoderParams(**KW), engine="native")
        pkts = [enc.encode_frame(f) for f in frames]
        dec = FFV1Decoder(W, H, enc.extradata)
        outs = [dec.decode_frame(p)[0] for p, _ in pkts]
        ok = all(np.array_equal(np.asarray(a), b)
                 for planes, f in zip(outs, frames)
                 for a, b in zip(planes, f))
        return pkts, ok

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one_run, range(16)))
    for pkts, ok in results:
        assert ok
        assert [p for p, _ in pkts] == [p for p, _ in golden]

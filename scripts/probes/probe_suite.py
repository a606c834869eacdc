"""Round-3 measurement suite: compile times, steady-state step times,
dispatch-only device times, for encode and decode at several batches.

Run detached:  nohup python scripts/probe_suite.py <stage> >> /tmp/probe.log 2>&1 &

Stages:
  cache1   — compile the batch-4 encode pipeline with the persistent
             cache enabled, print compile time, exit.
  cache2   — identical; if the persistent cache works the compile time
             collapses.
  enc4 / enc8 / enc16 — encode: compile + steady state + dispatch-only
             at stream batch N.
  dec4     — decode: compile + steady state + dispatch-only.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STAGE = sys.argv[1] if len(sys.argv) > 1 else "enc4"

import jax
if os.environ.get("FFV1_NO_CACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def synth(n=4, seed=0):
    rng = np.random.RandomState(seed)
    base = (np.add.outer(np.arange(1080), np.arange(1920)) % 256)
    out = []
    for t in range(n):
        y = ((base + t * 3) + rng.randint(0, 16, (1080, 1920))).astype(np.uint8)
        u = (rng.randint(0, 8, (540, 960)) + 100).astype(np.uint8)
        v = (rng.randint(0, 8, (540, 960)) + 160).astype(np.uint8)
        out.append([y, u, v])
    return out


def enc_stage(batch, steady=True):
    frames = synth()
    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=batch)
    streams = [frames[i % 4] for i in range(batch)]
    t0 = time.time()
    enc.encode_frames(streams)
    log(f"enc batch={batch} first step (compile): {time.time()-t0:.1f}s")
    if not steady:
        return
    # steady state, depth-2 pipeline
    t0 = time.time()
    n_steps = 8
    for d in range(2):
        enc.submit_frames([frames[(1 + d + i) % 4] for i in range(batch)])
    n = 0
    for k in range(3, n_steps + 3):
        enc.collect_frames()
        n += 1
        if k < n_steps + 1:
            enc.submit_frames([frames[(i + k) % 4] for i in range(batch)])
    dt = (time.time() - t0) / n
    log(f"enc batch={batch} steady: {dt*1000:.0f} ms/step "
        f"-> {batch*2.0736/dt:.2f} Mpix/s")

    # dispatch-only: inputs pre-uploaded, single repeated device step
    streams_np = tuple(tuple(np.asarray(p) for p in s) for s in
                       [[frames[i % 4][k] for k in range(3)]
                        for i in range(batch)])
    nplanes = 3
    dev = tuple(jnp.asarray(np.stack([s[k] for s in streams_np]))
                for k in range(nplanes))
    jax.block_until_ready(dev)
    from tpu_ffv1.tpu.encoder import PREFIX_CAP
    lows = np.zeros(enc.L, np.int32)
    ranges = np.zeros(enc.L, np.int32)
    prefixes = np.zeros((enc.L, PREFIX_CAP), np.int32)
    plens = np.zeros(enc.L, np.int32)
    for si in range(enc.n_slices):
        lo, ra, prov = enc._host_prefix(si, False)
        for bi in range(batch):
            lane = bi * enc.n_slices + si
            lows[lane], ranges[lane] = lo, ra
            prefixes[lane, :len(prov)] = prov
            plens[lane] = len(prov)
    args = (jnp.asarray(lows), jnp.asarray(ranges), jnp.asarray(prefixes),
            jnp.asarray(plens))
    jax.block_until_ready(args)
    res = enc._frame_fn(dev, enc.states, *args)
    np.asarray(res[1])
    for rep in range(3):
        t0 = time.time()
        res = enc._frame_fn(dev, enc.states, *args)
        np.asarray(res[1])      # counts fetch = device sync
        dt = time.time() - t0
        log(f"enc batch={batch} dispatch-only rep{rep}: {dt*1000:.0f} ms")


def encnu_stage(batch):
    """Steady state with UPLOADS REMOVED (device input arrays cached):
    isolates the host->device transfer share of the steady-state gap."""
    from concurrent.futures import Future
    frames = synth()
    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=batch)
    streams = [frames[i % 4] for i in range(batch)]
    t0 = time.time()
    enc.encode_frames(streams)
    log(f"encnu batch={batch} first step (compile): {time.time()-t0:.1f}s")
    import jax.numpy as jnp
    cached = tuple(
        jnp.asarray(np.stack([np.asarray(frames[i % 4][k])
                              for i in range(batch)]))
        for k in range(3))
    jax.block_until_ready(cached)

    def fake_submit(fn):
        f = Future()
        f.set_result(cached)
        return f

    enc._upload_pool.submit = fake_submit
    t0 = time.time()
    n_steps = 8
    for d in range(2):
        enc.submit_frames(streams)
    n = 0
    for k in range(3, n_steps + 3):
        enc.collect_frames()
        n += 1
        if k < n_steps + 1:
            enc.submit_frames(streams)
    dt = (time.time() - t0) / n
    log(f"encnu batch={batch} steady (no uploads): {dt*1000:.0f} ms/step")


def dec_stage(batch):
    from tpu_ffv1.codec.encoder import FFV1Encoder
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    streams = []
    for bi in range(batch):
        henc = FFV1Encoder(EncoderParams(
            width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
            slices=24))
        streams.append([henc.encode_frame(f)[0] for f in synth(seed=bi)])
    dec = TPUFFV1Decoder(1920, 1080, henc.extradata, batch=batch)

    def step_pkts(k):
        return [streams[i][k % 4] for i in range(batch)]

    t0 = time.time()
    dec.decode_frames(step_pkts(0))
    log(f"dec batch={batch} first step (compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    n_steps = 6
    for d in range(2):
        dec.submit_frames(step_pkts(1 + d))
    n = 0
    for k in range(3, n_steps + 3):
        dec.collect_frames()
        n += 1
        if k < n_steps + 1:
            dec.submit_frames(step_pkts(k))
    dt = (time.time() - t0) / n
    log(f"dec batch={batch} steady: {dt*1000:.0f} ms/step "
        f"-> {batch*2.0736/dt:.2f} Mpix/s")


log(f"stage={STAGE} devices={jax.devices()}")
if STAGE in ("cache1", "cache2"):
    enc_stage(4, steady=False)
elif STAGE.startswith("enct"):
    os.environ["FFV1_DEBUG"] = "timing"
    import tpu_ffv1.log as _l
    _l._debug.add("timing")
    enc_stage(int(STAGE[4:]))
elif STAGE.startswith("encnu"):
    encnu_stage(int(STAGE[5:]))
elif STAGE.startswith("enc"):
    enc_stage(int(STAGE[3:]))
elif STAGE == "dec4":
    dec_stage(4)
log(f"stage={STAGE} done")
